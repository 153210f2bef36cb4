"""Recorded Town05 fixture: scenario-identical parity with test_9.

The reference pins its headline scenario to CARLA Town05 (ego spawn 259 ->
spawn 48, three parked cars and a BehaviorAgent NPC at hard-coded world
coordinates, ``/root/reference/test_9.py:242,259-291``). Every other parity
claim in this repo is distribution-level (procedural scenarios); these tests
run the closed loop and the fidelity bar on the *recorded* geometry —
``routing.graph.town05_test9`` + ``scenario.test9_scenario`` — so at least
one claim is anchored to the reference's own coordinates.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emplanner_carla_tpu.config import EMConfig
from emplanner_carla_tpu.oracle import closed_loop_np
from emplanner_carla_tpu.routing import astar, graph as graph_mod
from emplanner_carla_tpu.sim import closed_loop, scenario

from tests.test_fidelity import lateral_rmse, unpack_scenario


def test_town05_route_is_scenario_identical():
    """A* on the recorded sub-network reproduces the test_9 route shape:
    it picks the junction-turn route (rejecting the longer decoy), passes
    through the NPC spawn, and runs within a lane-width of every parked
    car's pinned coordinate."""
    town = graph_mod.town05_test9()
    x, y, n, opts = astar.plan_route(
        town, graph_mod.TEST9_EGO_SPAWN, graph_mod.TEST9_DESTINATION,
        pad_to=256, with_options=True,
    )
    x, y = np.asarray(x)[:n], np.asarray(y)[:n]
    length = float(np.sum(np.hypot(np.diff(x), np.diff(y))))
    # main route ~327.7 m; the straight-north decoy is ~341.4 m
    assert 320.0 < length < 335.0, f"A* took the wrong branch ({length:.1f} m)"
    # junction turns present in the RoadOption stream
    opts = np.asarray(opts)[:n]
    assert (opts == int(graph_mod.RoadOption.LEFT)).any()
    assert (opts == int(graph_mod.RoadOption.RIGHT)).any()

    def min_dist(px, py):
        return float(np.min(np.hypot(x - px, y - py)))

    # the NPC spawns ON the ego's route (test_9.py:284-288 places it at the
    # ego spawn's rotation); path samples are 2 m apart
    nx, ny, _ = graph_mod.TEST9_NPC
    assert min_dist(nx, ny) <= 1.01
    # every parked car blocks the route within a lane-width
    for sx, sy, _yaw in graph_mod.TEST9_STATICS:
        assert min_dist(sx, sy) <= 1.01, (sx, sy)


def test_town05_traffic_fidelity_vs_oracle():
    """test_9's own configuration on the recorded geometry: MPC steering,
    dynamic bicycle plant, the BehaviorAgent-analogue NPC driving the ego's
    route at 30 km/h — the JAX f32 loop must track the float64 oracle to
    the BASELINE <= 5 cm lateral bar."""
    cfg = EMConfig(
        control=dataclasses.replace(EMConfig().control, kind="MPC"),
        plant=dataclasses.replace(EMConfig().plant, kind="dynamic"),
        loop=dataclasses.replace(EMConfig().loop, n_plans=5),
    )
    sc, n_valid = scenario.test9_scenario(cfg)
    carry, metrics = closed_loop.simulate_traffic(
        sc.global_path, sc.ego0, sc.obstacles, cfg, behavior="normal",
    )
    jx = np.asarray(metrics.x).reshape(-1)
    jy = np.asarray(metrics.y).reshape(-1)
    g, ego0, statics, dynamics = unpack_scenario(sc)
    assert len(statics) == 3 and len(dynamics) == 1
    ox, oy = closed_loop_np.simulate_traffic(
        g, ego0, statics, dynamics, cfg, behavior="normal", n_plans=5,
    )
    assert len(ox) == len(jx)
    rmse = lateral_rmse(jx, jy, ox, oy)
    assert rmse <= 0.05, f"town05 fixture RMSE vs oracle {rmse:.3f} m"
    assert not bool(closed_loop.summarize(metrics)["collided"])


@pytest.mark.slow
def test_town05_full_route_drive():
    """Drive the whole recorded route (both junction turns, the lead NPC,
    all three parked cars) with the FULL EM pipeline: collision-free and
    past the final parked car."""
    cfg = EMConfig(
        # ~50 s: the ego ACC-follows the 30 km/h lead NPC through the
        # junctions (~8 m/s average), so clearing parked car 3 at
        # s ~= 287 of the 328 m route needs ~45 cycles
        loop=dataclasses.replace(EMConfig().loop, n_plans=50),
    )
    sc, n_valid = scenario.test9_scenario(cfg)
    carry, metrics = closed_loop.simulate_traffic(
        sc.global_path, sc.ego0, sc.obstacles, cfg, behavior="normal",
        full=True,
    )
    s = closed_loop.summarize(metrics)
    assert not bool(s["collided"])
    assert bool(jnp.all(jnp.isfinite(metrics.x)))
    # ego must clear parked car 3 (s ~= 287 of ~328 m): nearest-path
    # progress measured against the final ego position
    x = np.asarray(sc.global_path.x)
    y = np.asarray(sc.global_path.y)
    ex = float(carry.loop.ego.x)
    ey = float(carry.loop.ego.y)
    i = int(np.argmin(np.hypot(x - ex, y - ey)))
    s_progress = 2.0 * i
    assert s_progress > 295.0, f"ego stalled at s={s_progress:.0f} m"
