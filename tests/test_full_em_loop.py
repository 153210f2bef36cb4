"""Full EM closed loop (path + speed planning): the loop test_10 intended."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emplanner_carla_tpu.config import EMConfig
from emplanner_carla_tpu.planner import em_planner
from emplanner_carla_tpu.sim import closed_loop, scenario

CFG = EMConfig()


@pytest.fixture(scope="module")
def full_run():
    sc = scenario.make_scenario(jax.random.PRNGKey(0), CFG)
    carry, metrics = closed_loop.simulate_full(
        sc.global_path, sc.ego0, sc.obstacles, CFG
    )
    return sc, carry, metrics


def test_full_loop_safe_and_smooth(full_run):
    sc, carry, metrics = full_run
    s = closed_loop.summarize(metrics)
    assert not bool(s["collided"])
    assert bool(np.isfinite(np.asarray(metrics.lateral_err)).all())
    # speed planning tracks the trajectory much tighter than raw 50 km/h
    assert float(s["lateral_rmse"]) < 0.3
    # moving, but respecting the 0.2 g curvature speed cap on bends
    assert float(s["mean_speed_kmh"]) > 15.0


def test_full_loop_respects_lateral_accel(full_run):
    """a_lat = v * omega must respect (roughly) the 0.2 g planning cap."""
    sc, carry, metrics = full_run
    v = np.asarray(metrics.speed_kmh).reshape(-1) / 3.6
    phi = np.asarray(metrics.heading).reshape(-1)
    omega = np.gradient(np.unwrap(phi)) / CFG.plant.dt
    a_lat = np.abs(v * omega)
    # sustained lateral accel (99th percentile) bounded with tracking margin
    assert np.quantile(a_lat, 0.99) < 2.5 * CFG.speed.max_lateral_accel


def test_plan_full_cycle_trajectory_contract():
    sc = scenario.make_scenario(jax.random.PRNGKey(2), CFG)
    ego = sc.ego0._replace(vx=jnp.float32(12.0))
    res = em_planner.plan_full_cycle(
        sc.global_path, ego, sc.obstacles, jnp.int32(0), CFG
    )
    tr = res.trajectory
    assert tr.x.shape == (CFG.speed.n_dense,)
    sp = np.asarray(tr.speed)
    t = np.asarray(tr.time)
    assert t[0] == 0.0 and t[-1] == pytest.approx(CFG.speed.horizon)
    # starts at the ego's current speed, stays non-negative and bounded
    assert sp[0] == pytest.approx(12.0, abs=0.2)
    assert np.all(sp >= -0.2) and np.all(sp < 30.0)
    # trajectory pose starts at the planned path start
    assert float(tr.x[0]) == pytest.approx(float(res.path.target.x[0]), abs=0.1)


def test_full_loop_slows_for_crossing_obstacle():
    """A laterally-crossing obstacle must produce an ST segment and a
    slower profile than free flow."""
    sc = scenario.make_scenario(
        jax.random.PRNGKey(3), CFG, n_active_static=0, with_dynamic=False
    )
    ego = sc.ego0._replace(vx=jnp.float32(13.9))
    free = em_planner.plan_full_cycle(
        sc.global_path, ego, sc.obstacles, jnp.int32(0), CFG
    )
    # place a crossing NPC 28 m ahead, 3 m off the path, entering the lane
    # band during t in [0.8, 4.2] s — the ego (reaching s=28 at ~1.9 s)
    # cannot beat it and must yield
    from emplanner_carla_tpu.sim.scenario import place_on_path

    ox, oy, oth = place_on_path(
        sc.global_path, jnp.asarray([28.0]), jnp.asarray([-3.0])
    )
    nx, ny = -jnp.sin(oth[0]), jnp.cos(oth[0])
    obs = sc.obstacles._replace(
        x=sc.obstacles.x.at[CFG.n_static_obs].set(ox[0]),
        y=sc.obstacles.y.at[CFG.n_static_obs].set(oy[0]),
        vx=sc.obstacles.vx.at[CFG.n_static_obs].set(1.2 * nx),
        vy=sc.obstacles.vy.at[CFG.n_static_obs].set(1.2 * ny),
        valid=sc.obstacles.valid.at[CFG.n_static_obs].set(True),
    )
    blocked = em_planner.plan_full_cycle(
        sc.global_path, ego, obs, jnp.int32(0), CFG
    )
    # the crossing obstacle slows the first seconds of the profile
    t_idx = slice(0, 150)  # first 3 s of the 401-point/8 s profile
    assert float(jnp.mean(blocked.trajectory.speed[t_idx])) < float(
        jnp.mean(free.trajectory.speed[t_idx])
    ) - 0.5


@pytest.mark.slow
def test_simulate_full_vmaps():
    B = 3
    scs = scenario.batch_scenarios(jax.random.PRNGKey(9), B, CFG)
    sim = jax.vmap(lambda g, e, o: closed_loop.simulate_full(g, e, o, CFG))
    carry, metrics = sim(scs.global_path, scs.ego0, scs.obstacles)
    assert metrics.x.shape == (B, CFG.loop.n_plans, CFG.loop.plan_every)
    assert bool(jnp.all(jnp.isfinite(metrics.lateral_err)))
