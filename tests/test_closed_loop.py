"""Closed-loop EM plan-control-step integration tests (the rebuild's
replacement for the reference's watch-CARLA verification, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emplanner_carla_tpu.config import EMConfig
from emplanner_carla_tpu.sim import closed_loop, scenario

CFG = EMConfig()


@pytest.fixture(scope="module")
def run0():
    sc = scenario.make_scenario(jax.random.PRNGKey(0), CFG)
    carry, metrics = closed_loop.simulate(sc.global_path, sc.ego0, sc.obstacles, CFG)
    return sc, carry, metrics


def test_no_collision_and_tracks_speed(run0):
    sc, carry, metrics = run0
    s = closed_loop.summarize(metrics)
    assert not bool(s["collided"])
    assert float(s["mean_speed_kmh"]) > 35.0
    assert float(s["lateral_rmse"]) < 0.6


def test_makes_progress(run0):
    sc, carry, metrics = run0
    dist = np.hypot(
        float(carry.ego.x) - float(sc.ego0.x),
        float(carry.ego.y) - float(sc.ego0.y),
    )
    # 20 cycles x 1 s at up to 50 km/h
    assert dist > 150.0


def test_obstacles_cleared(run0):
    sc, carry, metrics = run0
    x = np.asarray(metrics.x).reshape(-1)
    y = np.asarray(metrics.y).reshape(-1)
    t = np.arange(x.size) * CFG.plant.dt
    for slot in np.where(np.asarray(sc.obstacles.valid))[0]:
        ox = float(sc.obstacles.x[slot]) + float(sc.obstacles.vx[slot]) * t
        oy = float(sc.obstacles.y[slot]) + float(sc.obstacles.vy[slot]) * t
        assert np.hypot(ox - x, oy - y).min() > closed_loop.COLLISION_RADIUS


def test_multi_seed_safety():
    for seed in [1, 2, 3]:
        sc = scenario.make_scenario(jax.random.PRNGKey(seed), CFG)
        _, metrics = closed_loop.simulate(sc.global_path, sc.ego0, sc.obstacles, CFG)
        assert not bool(closed_loop.summarize(metrics)["collided"]), f"seed {seed}"


def test_vmapped_fleet():
    """The whole closed loop must vmap over a scenario batch."""
    B = 4
    scs = scenario.batch_scenarios(jax.random.PRNGKey(42), B, CFG)
    sim = jax.vmap(
        lambda gp, e, o: closed_loop.simulate(gp, e, o, CFG),
        in_axes=(0, 0, 0),
    )
    carry, metrics = sim(scs.global_path, scs.ego0, scs.obstacles)
    assert metrics.x.shape == (B, CFG.loop.n_plans, CFG.loop.plan_every)
    speeds = np.asarray(metrics.speed_kmh)
    assert np.all(speeds.reshape(B, -1).mean(axis=1) > 30.0)
    assert np.all(np.isfinite(np.asarray(metrics.lateral_err)))


def test_emergency_brake_on_arrival():
    """A short path: the ego must arrive and stop."""
    from dataclasses import replace

    cfg = EMConfig(loop=replace(CFG.loop, n_plans=30))
    sc = scenario.make_scenario(
        jax.random.PRNGKey(5), cfg, n_path=100, n_active_static=0,
        with_dynamic=False,
    )
    carry, metrics = closed_loop.simulate(sc.global_path, sc.ego0, sc.obstacles, cfg)
    s = closed_loop.summarize(metrics)
    assert bool(s["arrived"])
    # stopped after arrival
    assert float(np.asarray(metrics.speed_kmh)[-1, -1]) < 5.0


def test_stopped_ego_keeps_seeing_its_lead():
    """The ACC twin of the stopped-at-red kernel bug: at exact standstill
    the world-velocity direction degenerates to (0, 0) and the lead gate
    re-opens for that tick (measured pre-fix: mm-scale creep pulses, then
    a denormal-speed equilibrium). With _motion_dir's heading fallback an
    ego at rest 5 m behind a stopped lead (inside the 7 m standoff ->
    cap 0) holds EXACTLY — zero drift over 300 ticks."""
    import dataclasses

    from emplanner_carla_tpu.sim import traffic_light as tl_mod
    from emplanner_carla_tpu.types import EgoState, Obstacles, Path

    cfg = EMConfig()
    n = 64
    gp = Path(jnp.arange(n) * 2.0, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n))
    z = jnp.zeros(())
    ego = EgoState(jnp.float32(25.0), z, z, z, z, z, z, z, z)  # at rest
    K = cfg.n_static_obs + cfg.n_dynamic_obs
    obs = Obstacles(
        jnp.zeros(K).at[0].set(30.0), jnp.zeros(K), jnp.zeros(K),
        jnp.zeros(K), jnp.zeros(K, bool).at[0].set(True),
    )
    nd = cfg.speed.n_dense
    tq = jnp.arange(nd, dtype=jnp.float32) * (
        cfg.speed.n_t * cfg.speed.t_step / (nd - 1)
    )
    tspeed = jnp.full((nd,), cfg.loop.target_speed_kmh / 3.6)
    lights = tl_mod.TrafficLights.none()
    buf = jnp.zeros(cfg.control.pid_buffer)
    cnt = jnp.zeros((), jnp.int32)
    last = jnp.zeros(())
    arrived = jnp.zeros((), bool)
    tru = jnp.ones((), bool)
    for _ in range(3):  # 300 ticks at rest behind the lead
        (ego, buf, cnt, last, obs, arrived, m) = closed_loop._full_ticks_base(
            ego, buf, cnt, last, obs, tspeed, tq, gp, arrived, tru, tru,
            gp.x[-1], gp.y[-1], lights, jnp.float32(0.0), cfg,
        )
    # held exactly: the gate saw the lead every tick, cap stayed 0
    assert float(ego.x) == pytest.approx(25.0, abs=1e-2), float(ego.x)
    assert float(ego.vx) < 0.05
    assert not bool(np.asarray(m.collided).any())


def test_substeps_closed_loop():
    """``PlantConfig.substeps=2`` closed-loop coverage (round-4 verdict
    item 6): the config knob must (a) surface its XLA-scan fallback with
    the trace-time warning, (b) drive the loop to the same qualitative
    outcome, and (c) stay near the substeps=1 trajectory over the first
    plan cycle (both cycles plan from the identical state; only the
    integrator differs, so divergence there is pure plant refinement)."""
    from dataclasses import replace

    cfg1 = EMConfig(loop=replace(CFG.loop, n_plans=3))
    cfg2 = EMConfig(loop=replace(CFG.loop, n_plans=3),
                    plant=replace(CFG.plant, substeps=2))
    sc = scenario.make_scenario(jax.random.PRNGKey(0), cfg1)
    _, m1 = closed_loop.simulate(sc.global_path, sc.ego0, sc.obstacles, cfg1)
    with pytest.warns(UserWarning, match="tick kernel ineligible"):
        _, m2 = closed_loop.simulate(
            sc.global_path, sc.ego0, sc.obstacles, cfg2
        )
    s2 = closed_loop.summarize(m2)
    assert not bool(s2["collided"])
    assert float(s2["mean_speed_kmh"]) > 25.0
    assert np.isfinite(float(s2["lateral_rmse"]))
    # first-cycle proximity: same plan, finer integrator
    d0 = np.hypot(
        np.asarray(m2.x)[0] - np.asarray(m1.x)[0],
        np.asarray(m2.y)[0] - np.asarray(m1.y)[0],
    )
    assert float(d0.max()) < 0.5, f"cycle-0 substep divergence {d0.max()}"


@pytest.mark.slow
def test_bitwise_deterministic_rerun():
    """Reproducibility: the whole compiled loop is a pure function — two
    executions on identical inputs must agree BITWISE (replay/debugging
    and fleet-result auditability depend on it)."""
    import dataclasses

    cfg = EMConfig(
        loop=dataclasses.replace(EMConfig().loop, n_plans=3)
    )
    sc = scenario.make_scenario(jax.random.PRNGKey(7), cfg)
    f = jax.jit(lambda: closed_loop.simulate_full(
        sc.global_path, sc.ego0, sc.obstacles, cfg
    ))
    _, m1 = f()
    _, m2 = f()
    for a, b in zip(jax.tree.leaves(m1), jax.tree.leaves(m2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_path_only_clearance_distribution():
    """Pin the perception-error -> safety-margin link (round-4 verdict
    item 8): the path-only loop's obstacle-clearance distribution itself,
    not just the collision flag. Measured on this batch-256 slice of the
    bench distribution: 8/256 collided (the documented ~3.4% path-only
    graze rate); non-collided per-scenario minimum clearances start at
    1.578 m with p1 = 1.679 m — cleanly separated from the 1.5 m
    collision radius. If the soft corridor's effective margin erodes by
    ~5 cm, scenarios now clearing at 1.55-1.65 m slide into the graze
    band and the collision count jumps first; the p1 floor pins the
    buffer itself. Also locks the post-hoc obstacle-advance convention
    (x0 + vx*dt*(n+1)) to the loop's collided flags bit-exactly, so the
    clearance numbers provably measure the same geometry the collision
    channel does."""
    B = 256
    scs = scenario.batch_scenarios(jax.random.PRNGKey(1), B, CFG)
    m = jax.jit(jax.vmap(
        lambda g, e, o: closed_loop.simulate(g, e, o, CFG)[1]
    ))(scs.global_path, scs.ego0, scs.obstacles)
    mx = np.asarray(m.x).reshape(B, -1)
    my = np.asarray(m.y).reshape(B, -1)
    coll = np.asarray(m.collided).reshape(B, -1)
    T = mx.shape[1]
    t = (np.arange(T) + 1.0) * CFG.plant.dt
    ox = np.asarray(scs.obstacles.x)
    oy = np.asarray(scs.obstacles.y)
    d = np.hypot(
        mx[:, None, :] - (ox[:, :, None]
                          + np.asarray(scs.obstacles.vx)[:, :, None] * t),
        my[:, None, :] - (oy[:, :, None]
                          + np.asarray(scs.obstacles.vy)[:, :, None] * t),
    )
    d = np.where(np.asarray(scs.obstacles.valid)[:, :, None], d, np.inf)
    dmin_t = d.min(axis=1)
    assert np.array_equal(dmin_t < 1.5, coll), "clearance convention drift"
    clearance = dmin_t.min(axis=1)
    hit = coll.any(axis=1)
    assert hit.sum() <= 12, f"path-only collisions {hit.sum()}/{B}"
    p1 = float(np.percentile(clearance[~hit], 1))
    assert p1 >= 1.60, f"non-collided p1 clearance {p1:.3f} m (corridor margin eroded)"
