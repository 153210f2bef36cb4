"""Failure-state propagation through the closed loop (SURVEY §5).

The reference's DP prints "can't find a feasible path" and continues with
the min-cost *colliding* homotopy (``path_planning.py:351-353``). The
rebuild must surface the flag through TickMetrics/summarize/fleet
aggregates and degrade safely (round-1 verdict item 2).
"""

from dataclasses import replace

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
