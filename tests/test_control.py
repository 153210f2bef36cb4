"""Controllers: LQR vs scipy DARE, tracking convergence, PID semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emplanner_carla_tpu.config import ControlConfig, EMConfig, VehicleParams
from emplanner_carla_tpu.control import lateral, pid, vehicle
from emplanner_carla_tpu.ops import frenet
from emplanner_carla_tpu.sim import plant
from emplanner_carla_tpu.types import EgoState

CFG = EMConfig()
VP = CFG.vehicle
CC = CFG.control


def make_ego(x=0.0, y=0.0, phi=0.0, vx=13.9):
    z = jnp.zeros(())
    return EgoState(
        jnp.float32(x), jnp.float32(y), jnp.float32(phi), jnp.float32(vx),
        z, z, z, z, z,
    )


def test_riccati_matches_scipy_dare():
    from scipy.linalg import solve_discrete_are

    A, B, _ = lateral.error_state_model(jnp.float32(13.9), VP)
    Ad, Bd, _ = lateral.discretize(A, B, CC.ts_discretize)
    Q = np.diag(CC.lqr_q)
    R = np.array([[CC.lqr_r]])
    Ad_np, Bd_np = np.asarray(Ad, np.float64), np.asarray(Bd, np.float64)
    P = solve_discrete_are(Ad_np, Bd_np, Q, R)
    K_ref = np.linalg.inv(Bd_np.T @ P @ Bd_np + R) @ (Bd_np.T @ P @ Ad_np)
    K = lateral.riccati_gain(
        Ad, Bd, jnp.asarray(Q, jnp.float32), jnp.asarray(R, jnp.float32),
        CC.riccati_iters,
    )
    np.testing.assert_allclose(np.asarray(K), K_ref, rtol=2e-3, atol=1e-4)


def test_tracking_error_signs():
    """Ego left of a straight path -> e_d > 0; heading error -> e_phi."""
    n = 100
    target = frenet.path_from_xy(jnp.arange(n) * 2.0, jnp.zeros(n))
    e, kappa, idx = lateral.tracking_error(
        make_ego(x=40.0, y=2.0), target, CC
    )
    assert float(e[0]) == pytest.approx(2.0, abs=1e-3)
    assert float(kappa) == pytest.approx(0.0, abs=1e-6)
    e2, _, _ = lateral.tracking_error(
        make_ego(x=40.0, y=0.0, phi=0.1, vx=10.0), target, CC
    )
    assert float(e2[2]) == pytest.approx(np.sin(0.1), abs=1e-3)


def test_raw_heading_error_variant():
    """The ff-variant keeps e_phi = phi - theta_r un-approximated
    (controller.py:891) while the main path sin()s it (:555)."""
    import dataclasses

    from emplanner_carla_tpu.config import mpc_feedforward_variant
    from emplanner_carla_tpu.sim import closed_loop

    n = 100
    target = frenet.path_from_xy(jnp.arange(n) * 2.0, jnp.zeros(n))
    ego = make_ego(x=40.0, y=0.0, phi=0.7, vx=10.0)
    cc_raw = dataclasses.replace(CC, raw_heading_error=True)
    e_raw, _, _ = lateral.tracking_error(ego, target, cc_raw)
    e_sin, _, _ = lateral.tracking_error(ego, target, CC)
    assert float(e_raw[2]) == pytest.approx(0.7, abs=1e-3)
    assert float(e_sin[2]) == pytest.approx(np.sin(0.7), abs=1e-3)

    variant = mpc_feedforward_variant()
    assert variant.raw_heading_error and variant.kind == "MPC"
    # The Pallas tick kernel implements the sin convention only — the
    # variant must fall back to the XLA scan.
    cfg = dataclasses.replace(CFG, control=variant)
    assert not closed_loop._tick_kernel_eligible(cfg, None)
    assert closed_loop._tick_kernel_eligible(CFG, None)


@pytest.mark.parametrize("kind", ["LQR", "MPC"])
def test_lateral_steer_direction(kind):
    """Offset left => steer right (negative), and vice versa."""
    n = 100
    target = frenet.path_from_xy(jnp.arange(n) * 2.0, jnp.zeros(n))
    fn = lateral.lqr_steer if kind == "LQR" else lateral.mpc_steer
    s_left, _ = fn(make_ego(x=40.0, y=2.0), target, VP, CC)
    s_right, _ = fn(make_ego(x=40.0, y=-2.0), target, VP, CC)
    assert float(s_left) < -0.05
    assert float(s_right) > 0.05


@pytest.mark.parametrize("kind,plant_kind", [
    ("LQR", "kinematic"), ("LQR", "dynamic"),
    ("MPC", "kinematic"), ("MPC", "dynamic"),
])
def test_arc_tracking_converges(kind, plant_kind):
    """Track a R=200 m arc at 50 km/h: steady lateral error under 5 cm."""
    from dataclasses import replace

    ctrl_cfg = replace(CC, kind=kind)
    plant_cfg = replace(CFG.plant, kind=plant_kind)
    R = 200.0
    ang = np.linspace(0, 1.2, 300)
    target = frenet.path_from_xy(
        jnp.asarray(R * np.sin(ang), jnp.float32),
        jnp.asarray(R * (1 - np.cos(ang)), jnp.float32),
    )
    ego = make_ego(vx=13.9)
    cs = vehicle.ControllerState.init(ctrl_cfg)

    def tick(c, _):
        ego, cs = c
        steer, th, br, cs = vehicle.run_step(
            ego, target, cs, jnp.float32(50.0), VP, ctrl_cfg
        )
        ego = plant.step(ego, steer, th, br, VP, plant_cfg)
        idx = frenet.nearest_index(ego.x, ego.y, target)
        _, _, tr, _, _ = frenet.project_to_path(ego.x, ego.y, target, idx)
        lat = -(ego.x - target.x[idx]) * jnp.sin(tr) + (
            ego.y - target.y[idx]
        ) * jnp.cos(tr)
        return (ego, cs), (lat, idx)

    (_, _), (lats, idxs) = jax.lax.scan(tick, (ego, cs), None, length=1500)
    lats = np.asarray(lats)
    on_path = np.asarray(idxs) < 290
    steady = lats[on_path][-300:]
    assert np.abs(steady).max() < 0.05, f"steady error {np.abs(steady).max()}"


def test_pid_proportional_and_separation():
    st = pid.PIDState.init(CC)
    # large error: proportional only, integral separated
    cmd, st = pid.pid_step(st, jnp.float32(10.0), jnp.float32(50.0), CC)
    assert float(cmd) == pytest.approx(CC.kp * (50.0 - 36.0), rel=1e-5)
    assert int(st.count) == 0  # buffer cleared by separation
    # small error: buffer accumulates
    cmd2, st = pid.pid_step(st, jnp.float32(49.8 / 3.6), jnp.float32(50.0), CC)
    assert int(st.count) == 1
    th, br = pid.split_throttle_brake(jnp.float32(-0.4))
    assert float(th) == 0.0 and float(br) == pytest.approx(0.4)


def test_plant_straight_and_circle():
    from dataclasses import replace

    ego = make_ego(vx=10.0)
    s = plant.step(ego, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
                   VP, CFG.plant)
    assert float(s.y) == pytest.approx(0.0, abs=1e-6)
    assert float(s.x) == pytest.approx(0.1, abs=1e-3)
    # constant steer -> circular motion with kinematic yaw rate (after the
    # actuator settles)
    for _ in range(200):
        s = plant.step(s, jnp.float32(0.2), jnp.float32(0.0), jnp.float32(0.0),
                       VP, CFG.plant)
    expect_omega = 10.0 * np.tan(0.2 * VP.max_steer_rad) / (VP.a + VP.b)
    assert float(s.omega) == pytest.approx(expect_omega, rel=0.02)


@pytest.mark.parametrize("plant_kind", ["kinematic", "dynamic"])
def test_plant_substeps_golden(plant_kind):
    """``PlantConfig.substeps > 1`` (the CARLA substepping variant,
    reference ``simulation_1.py:106-109``) — round-4 verdict item 6: the
    substep loop had zero coverage although the plant defines ground
    truth.

    Two claims: (a) structural — ``substeps=4`` at dt equals 4 sequential
    ``substeps=1`` steps at dt/4 with the same held commands (the substep
    loop IS that composition: actuator, integrator, clamps all run per
    substep); (b) golden — both match a float64 NumPy substepped plant
    to f32 accumulation error over a 50-tick swerving drive."""
    from dataclasses import replace

    from emplanner_carla_tpu.oracle import closed_loop_np as oracle_np

    cfg4 = replace(CFG.plant, kind=plant_kind, substeps=4)
    cfg1 = replace(CFG.plant, kind=plant_kind, substeps=1,
                   dt=CFG.plant.dt / 4)
    step_o = (oracle_np.plant_step if plant_kind == "kinematic"
              else oracle_np.plant_step_dynamic)

    s4 = make_ego(vx=12.0)
    s1 = make_ego(vx=12.0)
    st = (0.0, 0.0, 0.0, 12.0, 0.0, 0.0)
    applied = 0.0
    for t in range(50):
        steer = jnp.float32(0.3 * np.sin(0.2 * t))
        th = jnp.float32(0.5 if t % 7 else 0.0)
        br = jnp.float32(0.0 if t % 7 else 0.3)
        accel = float(th) * VP.max_accel - float(br) * VP.max_brake_decel
        s4 = plant.step(s4, steer, th, br, VP, cfg4)
        for _ in range(4):
            s1 = plant.step(s1, steer, th, br, VP, cfg1)
            st, applied = step_o(st, applied, float(steer), accel, VP,
                                 cfg1.dt)
    # (a) substeps=4 == 4x substeps=1 at dt/4 (same f32 op sequence)
    for name in ("x", "y", "phi", "vx", "vy", "omega", "steer"):
        np.testing.assert_allclose(
            float(getattr(s4, name)), float(getattr(s1, name)),
            rtol=1e-5, atol=1e-5, err_msg=f"substep composition: {name}"
        )
    # (b) golden vs the float64 substepped oracle plant
    ox, oy, ophi, ovx, ovy, oom = st
    assert abs(float(s4.x) - ox) < 2e-3, f"x {float(s4.x)} vs {ox}"
    assert abs(float(s4.y) - oy) < 2e-3, f"y {float(s4.y)} vs {oy}"
    assert abs(float(s4.phi) - ophi) < 1e-4
    assert abs(float(s4.vx) - ovx) < 1e-3
    assert abs(float(s4.omega) - oom) < 1e-4
    assert abs(float(s4.steer) - applied) < 1e-5


def test_plant_substeps_refines_integration():
    """Substepping must CONVERGE toward the fine-dt trajectory: the
    substeps=10 coarse-tick plant lands closer to a dt/100 reference than
    the substeps=1 plant does (else the knob would be noise, not a finer
    integrator)."""
    from dataclasses import replace

    def drive(pcfg, n, steer=0.25, th=0.4):
        s = make_ego(vx=10.0)
        for _ in range(n):
            s = plant.step(s, jnp.float32(steer), jnp.float32(th),
                           jnp.float32(0.0), VP, pcfg)
        return float(s.x), float(s.y)

    n = 40
    coarse = drive(replace(CFG.plant, substeps=1), n)
    sub10 = drive(replace(CFG.plant, substeps=10), n)
    # reference: 100x finer explicit Euler over the same horizon
    fine = drive(replace(CFG.plant, substeps=1, dt=CFG.plant.dt / 100),
                 100 * n)
    err_c = np.hypot(coarse[0] - fine[0], coarse[1] - fine[1])
    err_s = np.hypot(sub10[0] - fine[0], sub10[1] - fine[1])
    assert err_s < err_c, f"substeps=10 err {err_s} !< substeps=1 {err_c}"
    assert err_s < 0.35 * err_c  # ~10x finer Euler: expect a big cut


def test_steer_actuator_lag():
    a0 = jnp.float32(0.0)
    a1 = plant.apply_steer_actuator(a0, jnp.float32(1.0), VP, 0.01)
    # rate-limited: at most steer_rate * dt per tick
    assert float(a1) <= VP.steer_rate * 0.01 + 1e-6
    a = a0
    for _ in range(500):
        a = plant.apply_steer_actuator(a, jnp.float32(1.0), VP, 0.01)
    assert float(a) == pytest.approx(1.0, abs=1e-3)


def test_mpc_table_matches_exact():
    """Table-driven MPC (vx-grid lerp) vs per-tick-constructed MPC."""
    n = 100
    ang = np.linspace(0, 0.8, n)
    R = 150.0
    target = frenet.path_from_xy(
        jnp.asarray(R * np.sin(ang), jnp.float32),
        jnp.asarray(R * (1 - np.cos(ang)), jnp.float32),
    )
    for vx, y_off in [(5.0, 1.0), (13.9, -1.5), (20.0, 0.3)]:
        ego = make_ego(x=20.0, y=y_off, vx=vx)
        s_fast, _ = lateral.mpc_steer(ego, target, VP, CC)
        s_exact, _ = lateral.mpc_steer_exact(ego, target, VP, CC)
        assert float(s_fast) == pytest.approx(float(s_exact), abs=0.02), (
            vx, y_off,
        )
