"""Routing: graph construction, A* (host + device), path stitching."""

import numpy as np
import pytest

from emplanner_carla_tpu.routing import astar, graph


@pytest.fixture(scope="module")
def town():
    return graph.grid_town(blocks=3, block_size=80.0)


def test_grid_town_structure(town):
    assert town.n_nodes == 16
    assert town.n_edges == 2 * 2 * 3 * 4  # bidirectional H+V streets
    # every interior node has degree 4
    deg = (town.adj >= 0).sum(axis=1)
    assert deg.max() == 4 and deg.min() == 2


def test_astar_shortest_route(town):
    start = town.nearest_node(0.0, 0.0)
    goal = town.nearest_node(240.0, 240.0)
    route = astar.astar_host(town, start, goal)
    assert route is not None
    assert route[0] == start and route[-1] == goal
    # Manhattan-optimal: 6 edges of 80 m
    total = sum(
        town.edge_len[town.edge_between(a, b)]
        for a, b in zip(route[:-1], route[1:])
    )
    assert total == pytest.approx(480.0, rel=1e-6)


def test_stitched_path_contract(town):
    x, y, n = astar.plan_route(town, (5.0, 0.0), (240.0, 160.0), pad_to=512)
    assert x.shape == (512,)
    # starts/ends at graph nodes, monotone arc length, 2 m resolution
    seg = np.hypot(np.diff(x[:n]), np.diff(y[:n]))
    assert np.all(seg > 0.1) and np.all(seg < 4.0)
    assert np.hypot(x[n - 1] - 240.0, y[n - 1] - 160.0) < 1.0
    # padding repeats the final point
    assert np.all(x[n:] == x[n - 1])


def test_device_astar_matches_host(town):
    import jax

    start = town.nearest_node(0.0, 80.0)
    goal = town.nearest_node(160.0, 240.0)
    ref = astar.astar_host(town, start, goal)
    parent, found = jax.jit(
        lambda: astar.astar_device(town, start, goal)
    )()
    assert bool(found)
    # backtrack on host
    route = [goal]
    p = np.asarray(parent)
    while p[route[-1]] != -1:
        route.append(int(p[route[-1]]))
    route.reverse()
    assert route[0] == start and route[-1] == goal
    # same cost (possibly different equal-cost route)
    cost = lambda r: sum(
        town.edge_len[town.edge_between(a, b)] for a, b in zip(r[:-1], r[1:])
    )
    assert cost(route) == pytest.approx(cost(ref), rel=1e-6)


def test_ring_town_routes():
    g = graph.ring_town()
    x, y, n = astar.plan_route(
        g, (0.3 * 120.0, 0.0), (0.0, 0.3 * 120.0), pad_to=600
    )
    assert n > 50  # out a spoke, around the ring, in a spoke


def test_route_feeds_planner(town):
    """A routed global path must drive the EM planner end-to-end."""
    import jax
    import jax.numpy as jnp

    from emplanner_carla_tpu.config import EMConfig
    from emplanner_carla_tpu.ops import frenet
    from emplanner_carla_tpu.planner import em_planner
    from emplanner_carla_tpu.types import EgoState, Obstacles

    cfg = EMConfig()
    x, y, n = astar.plan_route(town, (5.0, 0.0), (240.0, 80.0), pad_to=256)
    gp = frenet.path_from_xy(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
    )
    z = jnp.zeros(())
    ego = EgoState(gp.x[0], gp.y[0], gp.theta[0], jnp.float32(8.0), z, z, z, z, z)
    K = cfg.n_static_obs + cfg.n_dynamic_obs
    obs = Obstacles(*(jnp.zeros(K) for _ in range(4)), jnp.zeros(K, bool))
    res = em_planner.plan_path_cycle(gp, ego, obs, jnp.int32(0), cfg)
    assert bool(res.feasible)
    assert bool(jnp.all(jnp.isfinite(res.target.x)))
