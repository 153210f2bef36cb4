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
