"""EM-planner, TPU-native.

A from-scratch, TPU-first rebuild of the capabilities of the reference
EM-planner-in-CARLA stack (6Lackiu/EMplanner_Carla): Frenet-frame geometry,
reference-line QP smoothing, S-L path planning (DP decision + piecewise-jerk QP),
S-T speed planning (DP + QP + densify/merge), lateral LQR / MPC control,
longitudinal PID, global routing, and a vectorized bicycle-model plant replacing
the CARLA simulator — all as pure, fixed-shape, jittable JAX functions that
``vmap`` across thousands of scenarios and ``shard_map`` across a TPU mesh.

Layout (mirrors SURVEY.md's layer map of the reference):
  ops/      — Frenet transforms, quintic polynomials, batched ADMM QP solver
  planner/  — reference line, S-L path DP+QP, S-T speed DP+QP, trajectory merge
  control/  — LQR (+feedforward), condensed MPC, longitudinal PID
  sim/      — kinematic/dynamic bicycle plants, scenarios, closed-loop scan
  routing/  — road-graph A* global planner on padded arrays
  parallel/ — fleet-scale vmap / shard_map wrappers + metric collectives
  oracle/   — NumPy reference implementations (the test oracle replacing
              "watch CARLA"; see SURVEY.md §4)
"""

__version__ = "0.1.0"
