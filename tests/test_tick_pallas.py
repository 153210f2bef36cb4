"""Pallas whole-tick-loop kernel vs the XLA scan tick loop.

Runs through the Pallas interpreter on CPU at BLK scenarios and a short
tick horizon; TPU-hardware validation at batch 4096 is part of the verify
drives. The kernel must reproduce the scan's trajectories and metrics to
f32 round-off (ulp-level op-order differences compound over ticks, so the
bar is tight-but-not-bitwise).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from emplanner_carla_tpu.config import EMConfig
from emplanner_carla_tpu.ops import tick_pallas
from emplanner_carla_tpu.sim import closed_loop, scenario


import pytest


@pytest.mark.parametrize(
    "ctrl,plant_kind",
    [("LQR", "kinematic"), ("LQR", "dynamic"),
     ("MPC", "kinematic"), ("MPC", "dynamic")],
)
def test_tick_kernel_matches_scan(ctrl, plant_kind):
    base = EMConfig()
    cfg = EMConfig(
        loop=dataclasses.replace(base.loop, plan_every=25, n_plans=1),
        control=dataclasses.replace(base.control, kind=ctrl),
        plant=dataclasses.replace(base.plant, kind=plant_kind),
    )
    B = tick_pallas.BLK
    scs = scenario.batch_scenarios(jax.random.PRNGKey(2), B, cfg, n_path=96)

    # realistic per-cycle inputs: run one plan cycle to get target + traj
    from emplanner_carla_tpu.ops import frenet
    from emplanner_carla_tpu.planner import em_planner

    def plan(gp, ego, obstacles):
        mi = frenet.nearest_index(ego.x, ego.y, gp)
        res = em_planner.plan_full_cycle(gp, ego, obstacles, mi, cfg)
        return res.path.target, res.trajectory, res.path.feasible

    target, traj, feas = jax.jit(jax.vmap(plan))(
        scs.global_path, scs.ego0, scs.obstacles
    )

    n_buf = cfg.control.pid_buffer
    pid_buf = jnp.zeros((B, n_buf))
    pid_cnt = jnp.zeros((B,), jnp.int32)
    pid_last = jnp.zeros((B,))
    arrived = jnp.zeros((B,), bool)
    plan_ok = jnp.ones((B,), bool)
    dest_x = scs.global_path.x[:, -1]
    dest_y = scs.global_path.y[:, -1]
    args = (
        scs.ego0, pid_buf, pid_cnt, pid_last, scs.obstacles,
        jnp.nan_to_num(traj.speed), jnp.nan_to_num(traj.time), target,
        arrived, feas, plan_ok, dest_x, dest_y,
    )

    from emplanner_carla_tpu.sim import traffic_light as tl_mod

    lights_none = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape),
        tl_mod.TrafficLights.none(),
    )
    t0 = jnp.zeros((B,))
    ref = jax.vmap(
        lambda *a: closed_loop._full_ticks_base(*a, cfg)
    )(*args, lights_none, t0)

    tick_pallas.run_ticks_batched._interpret = True
    try:
        got = tick_pallas.run_ticks_batched(
            args[0], args[1], args[2], args[3], args[4], args[5], args[7],
            args[8], args[9], args[10], args[11], args[12], cfg,
        )
    finally:
        tick_pallas.run_ticks_batched._interpret = False

    (ego_r, buf_r, cnt_r, last_r, obs_r, arr_r, met_r) = ref
    (ego_g, buf_g, cnt_g, last_g, obs_g, arr_g, md) = got

    np.testing.assert_allclose(ego_g.x, ego_r.x, atol=1e-3)
    np.testing.assert_allclose(ego_g.y, ego_r.y, atol=1e-3)
    # phi drifts slightly more under MPC: lanes near the fast-path /
    # ADMM interior boundary compound f32 op-order differences
    np.testing.assert_allclose(ego_g.phi, ego_r.phi, atol=5e-4)
    np.testing.assert_allclose(ego_g.vx, ego_r.vx, atol=1e-3)
    np.testing.assert_allclose(buf_g, buf_r, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(cnt_g), np.asarray(cnt_r))
    np.testing.assert_allclose(obs_g.x, obs_r.x, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(arr_g), np.asarray(arr_r))
    np.testing.assert_allclose(
        md["x"], met_r.x, atol=1e-3
    )
    np.testing.assert_allclose(
        md["lateral_err"], met_r.lateral_err, atol=2e-3
    )
    np.testing.assert_array_equal(
        np.asarray(md["collided"]), np.asarray(met_r.collided)
    )
    np.testing.assert_array_equal(
        np.asarray(md["feasible"]), np.asarray(met_r.feasible)
    )


def test_tick_kernel_matches_scan_with_lights():
    """The kernel's in-kernel red-light cap vs the XLA base with an ACTIVE
    red light ahead (mod-phase gating + stop-line corridor math both
    in-kernel)."""
    from emplanner_carla_tpu.sim import traffic_light as tl_mod

    base = EMConfig()
    cfg = EMConfig(
        loop=dataclasses.replace(base.loop, plan_every=25, n_plans=1),
    )
    B = tick_pallas.BLK
    scs = scenario.batch_scenarios(jax.random.PRNGKey(5), B, cfg, n_path=96)

    from emplanner_carla_tpu.ops import frenet
    from emplanner_carla_tpu.planner import em_planner

    def plan(gp, ego, obstacles):
        mi = frenet.nearest_index(ego.x, ego.y, gp)
        res = em_planner.plan_full_cycle(gp, ego, obstacles, mi, cfg)
        return res.path.target, res.trajectory, res.path.feasible

    target, traj, feas = jax.jit(jax.vmap(plan))(
        scs.global_path, scs.ego0, scs.obstacles
    )
    # a red light 12 m ahead of each ego along its initial heading
    # (red for the whole 25-tick horizon: period 100, green_frac 0)
    lx = scs.ego0.x + 12.0 * jnp.cos(scs.ego0.phi)
    ly = scs.ego0.y + 12.0 * jnp.sin(scs.ego0.phi)
    zeros = jnp.zeros((B,))
    lights = tl_mod.TrafficLights(
        jnp.stack([lx, lx], 1), jnp.stack([ly, ly], 1),
        jnp.full((B, 2), 100.0), jnp.zeros((B, 2)),
        jnp.zeros((B, 2)),
        jnp.stack([jnp.ones((B,), bool), jnp.zeros((B,), bool)], 1),
    )
    t0 = zeros + 1.0

    n_buf = cfg.control.pid_buffer
    pid_buf = jnp.zeros((B, n_buf))
    pid_cnt = jnp.zeros((B,), jnp.int32)
    pid_last = jnp.zeros((B,))
    arrived = jnp.zeros((B,), bool)
    plan_ok = jnp.ones((B,), bool)
    dest_x = scs.global_path.x[:, -1]
    dest_y = scs.global_path.y[:, -1]
    args = (
        scs.ego0, pid_buf, pid_cnt, pid_last, scs.obstacles,
        jnp.nan_to_num(traj.speed), jnp.nan_to_num(traj.time), target,
        arrived, feas, plan_ok, dest_x, dest_y,
    )
    ref = jax.vmap(
        lambda *a: closed_loop._full_ticks_base(*a, cfg)
    )(*args, lights, t0)

    tick_pallas.run_ticks_batched._interpret = True
    try:
        got = tick_pallas.run_ticks_batched(
            args[0], args[1], args[2], args[3], args[4], args[5], args[7],
            args[8], args[9], args[10], args[11], args[12], cfg,
            lights=(lights, t0),
        )
    finally:
        tick_pallas.run_ticks_batched._interpret = False

    (ego_r, buf_r, cnt_r, last_r, obs_r, arr_r, met_r) = ref
    (ego_g, buf_g, cnt_g, last_g, obs_g, arr_g, md) = got
    # the light actually bit: egos brake below their no-light speeds
    assert float(jnp.mean(ego_r.vx)) < float(jnp.mean(scs.ego0.vx))
    np.testing.assert_allclose(ego_g.x, ego_r.x, atol=1e-3)
    np.testing.assert_allclose(ego_g.vx, ego_r.vx, atol=1e-3)
    np.testing.assert_allclose(buf_g, buf_r, atol=1e-3)
    np.testing.assert_allclose(md["x"], met_r.x, atol=1e-3)


def test_tick_kernel_holds_red_light_when_stopped():
    """Review-caught regression: a (near-)stopped ego's velocity direction
    is ~(0, 0), so without stop_distance's slow-speed heading fallback the
    kernel's red-light gate sees dl_long = 0 and the light vanishes — the
    ego then creeps past the line. Ego starts at crawl speed right at the
    standoff of a long red; the kernel must hold it there like the base."""
    from emplanner_carla_tpu.ops import frenet
    from emplanner_carla_tpu.sim import traffic_light as tl_mod
    from emplanner_carla_tpu.types import EgoState, Obstacles, Path

    base = EMConfig()
    cfg = EMConfig(
        loop=dataclasses.replace(base.loop, plan_every=100, n_plans=1),
    )
    B = tick_pallas.BLK
    n = 64
    gp1 = Path(jnp.arange(n) * 2.0, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n))
    z = jnp.zeros(())
    # crawling (0.3 m/s < the 0.5 slow gate) 4.5 m before the stop line
    ego1 = EgoState(jnp.float32(20.0), z, z, jnp.float32(0.3), z, z, z, z, z)
    K = cfg.n_static_obs + cfg.n_dynamic_obs
    obs1 = Obstacles(*(jnp.zeros(K),) * 4, jnp.zeros(K, bool))
    gp, ego0, obs = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), (gp1, ego1, obs1)
    )
    lights = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape),
        tl_mod.TrafficLights(
            jnp.asarray([24.5, 0.0]), jnp.asarray([0.0, 0.0]),
            jnp.asarray([1000.0, 1.0]), jnp.asarray([0.0, 0.0]),
            jnp.asarray([0.0, 1.0]), jnp.asarray([True, False]),
        ),
    )
    t0 = jnp.zeros((B,))
    target = gp
    tspeed = jnp.full((B, cfg.speed.n_dense), 50.0 / 3.6)
    tq = jnp.broadcast_to(
        jnp.arange(cfg.speed.n_dense, dtype=jnp.float32)
        * (cfg.speed.n_t * cfg.speed.t_step / (cfg.speed.n_dense - 1)),
        (B, cfg.speed.n_dense),
    )
    n_buf = cfg.control.pid_buffer
    args = (
        ego0, jnp.zeros((B, n_buf)), jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,)), obs, tspeed, tq, target,
        jnp.zeros((B,), bool), jnp.ones((B,), bool), jnp.ones((B,), bool),
        gp.x[:, -1], gp.y[:, -1],
    )
    ref = jax.vmap(
        lambda *a: closed_loop._full_ticks_base(*a, cfg)
    )(*args, lights, t0)

    tick_pallas.run_ticks_batched._interpret = True
    try:
        got = tick_pallas.run_ticks_batched(
            args[0], args[1], args[2], args[3], args[4], args[5], args[7],
            args[8], args[9], args[10], args[11], args[12], cfg,
            lights=(lights, t0),
        )
    finally:
        tick_pallas.run_ticks_batched._interpret = False

    ego_r, ego_g = ref[0], got[0]
    # base holds the ego short of the line... and so must the kernel
    assert float(jnp.max(ego_r.x)) < 24.5
    assert float(jnp.max(ego_g.x)) < 24.5, (
        f"kernel crept to x={float(jnp.max(ego_g.x)):.2f} past the hold"
    )
    np.testing.assert_allclose(ego_g.x, ego_r.x, atol=1e-3)
    np.testing.assert_allclose(ego_g.vx, ego_r.vx, atol=1e-3)


def test_traffic_tick_kernel_matches_scan():
    """The kernel's agent-traffic branch (in-register NPC agents: pure
    pursuit on the global path + IDM + lane decisions) vs the XLA scan base
    ``closed_loop._traffic_ticks_base``. NPC headings flow through the
    kernel's polynomial atan2, so the bars allow ~1e-4-grade drift on NPC
    channels over the 25-tick horizon."""
    base = EMConfig()
    cfg = EMConfig(
        loop=dataclasses.replace(base.loop, plan_every=25, n_plans=1),
    )
    B = tick_pallas.BLK
    scs = scenario.batch_scenarios(
        jax.random.PRNGKey(3), B, cfg, n_path=96, with_walker=True
    )

    from emplanner_carla_tpu.ops import frenet
    from emplanner_carla_tpu.planner import em_planner

    def plan(gp, ego, obstacles):
        mi = frenet.nearest_index(ego.x, ego.y, gp)
        res = em_planner.plan_full_cycle(gp, ego, obstacles, mi, cfg)
        return res.path.target, res.trajectory, res.path.feasible

    target, traj, feas = jax.jit(jax.vmap(plan))(
        scs.global_path, scs.ego0, scs.obstacles
    )

    K = scs.obstacles.x.shape[1]
    npc_idx0 = jax.vmap(
        lambda gp, o: jax.vmap(
            lambda k: jnp.argmin(
                (gp.x - o.x[k]) ** 2 + (gp.y - o.y[k]) ** 2
            ).astype(jnp.int32)
        )(jnp.arange(K))
    )(scs.global_path, scs.obstacles)
    speed0 = jnp.hypot(scs.obstacles.vx, scs.obstacles.vy)
    agent_slot = (jnp.arange(K) >= cfg.n_static_obs) & (speed0 > 2.5)
    lane0 = jnp.zeros((B, K))

    n_buf = cfg.control.pid_buffer
    pid_buf = jnp.zeros((B, n_buf))
    pid_cnt = jnp.zeros((B,), jnp.int32)
    pid_last = jnp.zeros((B,))
    arrived = jnp.zeros((B,), bool)
    plan_ok = jnp.ones((B,), bool)
    dest_x = scs.global_path.x[:, -1]
    dest_y = scs.global_path.y[:, -1]
    args = (
        scs.ego0, pid_buf, pid_cnt, pid_last, scs.obstacles, npc_idx0,
        lane0, lane0, agent_slot, jnp.nan_to_num(traj.speed),
        jnp.nan_to_num(traj.time), target, arrived, feas, plan_ok,
        dest_x, dest_y, scs.global_path,
    )

    from emplanner_carla_tpu.sim import traffic_light as tl_mod

    lights_none = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape),
        tl_mod.TrafficLights.none(),
    )
    t0 = jnp.zeros((B,))
    ref = jax.vmap(
        lambda *a: closed_loop._traffic_ticks_base(*a, cfg, "normal")
    )(*args, lights_none, t0)

    tick_pallas.run_ticks_batched._interpret = True
    try:
        got = tick_pallas.run_ticks_batched(
            scs.ego0, pid_buf, pid_cnt, pid_last, scs.obstacles,
            jnp.nan_to_num(traj.speed), target, arrived, feas, plan_ok,
            dest_x, dest_y, cfg,
            traffic=(scs.global_path, npc_idx0, lane0, lane0, agent_slot,
                     "normal"),
        )
    finally:
        tick_pallas.run_ticks_batched._interpret = False

    (ego_r, buf_r, cnt_r, last_r, obs_r, idx_r, off_r, tgt_r, arr_r,
     met_r) = ref
    (ego_g, buf_g, cnt_g, last_g, obs_g, idx_g, off_g, tgt_g, arr_g,
     md) = got

    np.testing.assert_allclose(ego_g.x, ego_r.x, atol=1e-3)
    np.testing.assert_allclose(ego_g.y, ego_r.y, atol=1e-3)
    np.testing.assert_allclose(ego_g.phi, ego_r.phi, atol=5e-4)
    np.testing.assert_allclose(buf_g, buf_r, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(cnt_g), np.asarray(cnt_r))
    # NPC world state: agent slots carry poly-atan2 headings
    np.testing.assert_allclose(obs_g.x, obs_r.x, atol=1e-3)
    np.testing.assert_allclose(obs_g.y, obs_r.y, atol=1e-3)
    np.testing.assert_allclose(obs_g.vx, obs_r.vx, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(idx_g), np.asarray(idx_r))
    np.testing.assert_allclose(off_g, off_r, atol=1e-5)
    np.testing.assert_allclose(tgt_g, tgt_r, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(arr_g), np.asarray(arr_r))
    np.testing.assert_allclose(md["x"], met_r.x, atol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(md["collided"]), np.asarray(met_r.collided)
    )


def test_traffic_window_fast_path_bit_identical():
    """The windowed agent fast path (96-row block-shared view of the
    global path, taken when the per-tick containment gate holds) is
    BIT-IDENTICAL to the full-path branch: same f32 ops on the same path
    rows — the window only removes rows whose reduction contribution is
    an exact zero (one-hot sums) or +inf (masked mins).

    Drives the kernel twice on a 256-point path with clustered agent
    indices (gate holds every tick) — once normally, once with the
    ``_force_full_path`` hook pinning the full-path branch — and requires
    exact equality on EVERY output. A second scenario with an agent
    placed far down the path (outside any shared window) exercises the
    fallback: it must still match the XLA scan base."""
    base = EMConfig()
    cfg = EMConfig(
        loop=dataclasses.replace(base.loop, plan_every=25, n_plans=1),
    )
    B = tick_pallas.BLK
    scs = scenario.batch_scenarios(
        jax.random.PRNGKey(5), B, cfg, n_path=256, with_walker=True
    )

    from emplanner_carla_tpu.ops import frenet
    from emplanner_carla_tpu.planner import em_planner

    def plan(gp, ego, obstacles):
        mi = frenet.nearest_index(ego.x, ego.y, gp)
        res = em_planner.plan_full_cycle(gp, ego, obstacles, mi, cfg)
        return res.path.target, res.trajectory, res.path.feasible

    target, traj, feas = jax.jit(jax.vmap(plan))(
        scs.global_path, scs.ego0, scs.obstacles
    )
    K = scs.obstacles.x.shape[1]
    npc_idx0 = jax.vmap(
        lambda gp, o: jax.vmap(
            lambda k: jnp.argmin(
                (gp.x - o.x[k]) ** 2 + (gp.y - o.y[k]) ** 2
            ).astype(jnp.int32)
        )(jnp.arange(K))
    )(scs.global_path, scs.obstacles)
    speed0 = jnp.hypot(scs.obstacles.vx, scs.obstacles.vy)
    agent_slot = (jnp.arange(K) >= cfg.n_static_obs) & (speed0 > 2.5)
    lane0 = jnp.zeros((B, K))
    n_buf = cfg.control.pid_buffer
    pid_buf = jnp.zeros((B, n_buf))
    pid_cnt = jnp.zeros((B,), jnp.int32)
    pid_last = jnp.zeros((B,))
    arrived = jnp.zeros((B,), bool)
    plan_ok = jnp.ones((B,), bool)
    dest_x = scs.global_path.x[:, -1]
    dest_y = scs.global_path.y[:, -1]

    def run_kernel(idx0, force_full):
        tick_pallas.run_ticks_batched._interpret = True
        tick_pallas.run_ticks_batched._force_full_path = force_full
        try:
            return tick_pallas.run_ticks_batched(
                scs.ego0, pid_buf, pid_cnt, pid_last, scs.obstacles,
                jnp.nan_to_num(traj.speed), target, arrived, feas,
                plan_ok, dest_x, dest_y, cfg,
                traffic=(scs.global_path, idx0, lane0, lane0, agent_slot,
                         "normal"),
            )
        finally:
            tick_pallas.run_ticks_batched._interpret = False
            tick_pallas.run_ticks_batched._force_full_path = False

    fast = run_kernel(npc_idx0, False)
    full = run_kernel(npc_idx0, True)
    for a, b in zip(jax.tree.leaves(fast), jax.tree.leaves(full)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # fallback: one lane's agent index forced far from the cluster so the
    # containment gate fails — kernel must still match the XLA base
    idx_spread = npc_idx0.at[0, cfg.n_static_obs].set(200)
    got = run_kernel(idx_spread, False)

    from emplanner_carla_tpu.sim import traffic_light as tl_mod

    lights_none = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape),
        tl_mod.TrafficLights.none(),
    )
    ref = jax.vmap(
        lambda *a: closed_loop._traffic_ticks_base(*a, cfg, "normal")
    )(scs.ego0, pid_buf, pid_cnt, pid_last, scs.obstacles, idx_spread,
      lane0, lane0, agent_slot, jnp.nan_to_num(traj.speed),
      jnp.nan_to_num(traj.time), target, arrived, feas, plan_ok,
      dest_x, dest_y, scs.global_path, lights_none, jnp.zeros((B,)))
    (ego_r, _, _, _, obs_r, idx_r, _, _, _, met_r) = ref
    (ego_g, _, _, _, obs_g, idx_g, _, _, _, md) = got
    np.testing.assert_allclose(ego_g.x, ego_r.x, atol=1e-3)
    np.testing.assert_allclose(obs_g.x, obs_r.x, atol=1e-3)
    np.testing.assert_allclose(obs_g.y, obs_r.y, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(idx_g), np.asarray(idx_r))
    np.testing.assert_array_equal(
        np.asarray(md["collided"]), np.asarray(met_r.collided)
    )
