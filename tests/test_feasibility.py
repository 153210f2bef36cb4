"""Failure-state propagation through the closed loop (SURVEY §5).

The reference's DP prints "can't find a feasible path" and continues with
the min-cost *colliding* homotopy (``path_planning.py:351-353``). The
rebuild must surface the flag through TickMetrics/summarize/fleet
aggregates and degrade safely (round-1 verdict item 2).
"""

from dataclasses import replace

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from emplanner_carla_tpu.config import EMConfig
from emplanner_carla_tpu.parallel import fleet
from emplanner_carla_tpu.sim import closed_loop, scenario
from emplanner_carla_tpu.types import EgoState, Obstacles, Path


def _wall_scenario(cfg: EMConfig, wall_s: float = 25.0):
    """Straight road with a static obstacle wall spanning every DP row.

    The S-L grid is 12 rows x 1.5 m (l in [-8.25, 8.25]); 8 obstacles at
    2.5 m lateral spacing with the DP's 4 m collision radius cover it all,
    so no collision-free homotopy exists.
    """
    n = 160
    s = jnp.arange(n) * 2.0
    gp = Path(s, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n))
    K = cfg.n_static_obs + cfg.n_dynamic_obs
    slot = jnp.arange(K)
    is_wall = slot < cfg.n_static_obs
    wall_l = jnp.linspace(-8.75, 8.75, cfg.n_static_obs)
    ox = jnp.where(is_wall, wall_s, 0.0)
    oy = jnp.where(is_wall, jnp.pad(wall_l, (0, K - cfg.n_static_obs)), 0.0)
    obstacles = Obstacles(ox, oy, jnp.zeros(K), jnp.zeros(K), is_wall)
    z = jnp.zeros(())
    ego0 = EgoState(
        gp.x[0], gp.y[0], gp.theta[0], jnp.asarray(8.0, jnp.float32),
        z, z, z, z, z,
    )
    return scenario.Scenario(gp, ego0, obstacles)


CFG = EMConfig(
    loop=replace(
        EMConfig().loop, n_plans=8, lateral_gate=12.0
    )
)


def test_infeasible_wall_flag_and_safe_degradation():
    sc = _wall_scenario(CFG)
    carry, metrics = closed_loop.simulate(
        sc.global_path, sc.ego0, sc.obstacles, CFG
    )
    s = closed_loop.summarize(metrics)
    # the flag surfaces
    feas = np.asarray(metrics.feasible)
    assert feas.shape == (CFG.loop.n_plans, CFG.loop.plan_every)
    assert not feas.all(), "wall must make at least one cycle infeasible"
    assert float(s["infeasible_frac"]) > 0.0
    # feasible is constant within each plan cycle
    assert (feas == feas[:, :1]).all()
    # degrades safely: the ACC time-headway guard brakes before the wall
    assert not bool(s["collided"])
    speed = np.asarray(metrics.speed_kmh)
    assert float(speed[-1, -1]) < 5.0, "ego should be (nearly) stopped"
    # stops short of the wall
    assert float(np.asarray(metrics.x)[-1, -1]) < 25.0 - 1.5


def test_feasible_scenario_reports_feasible():
    cfg = EMConfig(loop=replace(EMConfig().loop, n_plans=4))
    sc = scenario.make_scenario(jax.random.PRNGKey(0), cfg)
    _, metrics = closed_loop.simulate(sc.global_path, sc.ego0, sc.obstacles, cfg)
    assert np.asarray(metrics.feasible).all()
    assert float(closed_loop.summarize(metrics)["infeasible_frac"]) == 0.0


@pytest.mark.slow
def test_fleet_aggregates_infeasible_count():
    mesh = fleet.make_mesh()
    n_dev = len(jax.devices())
    cfg = EMConfig(loop=replace(EMConfig().loop, n_plans=2))
    B = 2 * n_dev
    scs = scenario.batch_scenarios(jax.random.PRNGKey(7), B, cfg)
    scs = fleet.shard_scenarios(scs, mesh)
    _, agg = fleet.fleet_simulate(scs, cfg, mesh)
    assert "infeasible_cycles" in agg
    assert float(agg["infeasible_cycles"]) == 0.0  # benign scenarios

    # a batch of wall scenarios: every cycle that sees the wall is counted
    wall = _wall_scenario(CFG)
    wall_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), wall
    )
    wall_b = fleet.shard_scenarios(wall_b, mesh)
    _, agg_w = fleet.fleet_simulate(wall_b, CFG, mesh)
    assert float(agg_w["infeasible_cycles"]) > 0.0


def test_nan_obstacle_is_contained_and_survivors_respected():
    """Fault injection (SURVEY §5 failure detection): NaN-poisoned
    obstacle positions must not propagate — the perception gates mask a
    non-finite reading like an invalid slot (NaN comparisons are False),
    the planner routes through the gap the corrupted slots left, the
    SURVIVING obstacles are still avoided, and every metric channel stays
    finite through 800 ticks of carried state. (Measured behavior: the
    ego swerves ~7.7 m through the opened gap and clears the surviving
    wall slots by 3.9 m.)"""
    sc = _wall_scenario(CFG)
    bad = sc.obstacles._replace(
        x=sc.obstacles.x.at[0].set(jnp.nan),
        y=sc.obstacles.y.at[1].set(jnp.nan),
    )
    carry, metrics = closed_loop.simulate(
        sc.global_path, sc.ego0, bad, CFG
    )
    # no NaN escapes into observability or the carried state
    for leaf in jax.tree.leaves(metrics):
        assert bool(jnp.all(jnp.isfinite(leaf.astype(jnp.float32)))), leaf
    assert bool(jnp.isfinite(carry.ego.x))
    # the world's intact obstacles are still respected: the ego passed the
    # wall through the corrupted slots' gap with real clearance
    xs = np.asarray(metrics.x).reshape(-1)
    ys = np.asarray(metrics.y).reshape(-1)
    assert float(xs[-1]) > 40.0
    wall_l = np.linspace(-8.75, 8.75, CFG.n_static_obs)
    d_surv = min(
        float(np.hypot(xs - 25.0, ys - wall_l[k]).min())
        for k in range(2, CFG.n_static_obs)
    )
    assert d_surv > closed_loop.COLLISION_RADIUS, d_surv


def test_nan_ego_state_stays_contained_in_fleet():
    """One scenario's NaN ego must not poison its fleet neighbours
    (vmapped isolation) and its own run must stay finite-observable."""
    B = 4
    scs = scenario.batch_scenarios(jax.random.PRNGKey(5), B, CFG)
    ego_bad = scs.ego0._replace(
        vx=scs.ego0.vx.at[1].set(jnp.nan)
    )
    carry, metrics = jax.vmap(
        lambda g, e, o: closed_loop.simulate(g, e, o, CFG)
    )(scs.global_path, ego_bad, scs.obstacles)
    lat = np.asarray(metrics.lateral_err)
    # healthy lanes unaffected
    for i in (0, 2, 3):
        assert np.isfinite(lat[i]).all(), f"lane {i} poisoned"
    # the poisoned lane is flagged infeasible (its plans can't be finite)
    feas = np.asarray(metrics.feasible)
    assert not feas[1].any()
