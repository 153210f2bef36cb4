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


def test_grid_town_curved_structure():
    g = graph.grid_town_curved(blocks=2, block_size=80.0, radius=15.0)
    opts = set(int(o) for o in g.edge_option)
    assert int(graph.RoadOption.LEFT) in opts
    assert int(graph.RoadOption.RIGHT) in opts
    assert int(graph.RoadOption.STRAIGHT) in opts
    # curvature bounded by the fillet radius on every edge
    for e in range(g.n_edges):
        p = g.edge_path[e, : g.edge_n[e]]
        if len(p) < 3:
            continue
        v = np.diff(p, axis=0)
        th = np.unwrap(np.arctan2(v[:, 1], v[:, 0]))
        ds = np.hypot(v[:, 0], v[:, 1])
        kappa = np.abs(np.diff(th)) / ds[1:]
        assert kappa.max() < 1.0 / 15.0 + 0.02, f"edge {e}"


def test_plan_route_surfaces_road_options():
    """plan_route must expose the [(waypoint, RoadOption)] contract
    (global_planning.py:234-272): a route through a curved-town corner
    carries LEFT/RIGHT tags at the junction arcs."""
    g = graph.grid_town_curved(blocks=2, block_size=80.0)
    x, y, n, opt = astar.plan_route(
        g, (0.0, 0.0), (160.0, 160.0), pad_to=400, with_options=True
    )
    assert opt.shape == x.shape
    kinds = set(int(v) for v in opt[:n])
    assert int(graph.RoadOption.LANE_FOLLOW) in kinds
    assert kinds & {int(graph.RoadOption.LEFT), int(graph.RoadOption.RIGHT),
                    int(graph.RoadOption.STRAIGHT)}
    # padding repeats the final tag
    assert np.all(opt[n:] == opt[n - 1])


def test_routed_fleet_closed_loop():
    """Routed global paths (A* over the curved town) must drive the whole
    closed loop: the fleet analogue of test_9.py:295-313's route-then-drive
    structure."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from emplanner_carla_tpu.config import EMConfig
    from emplanner_carla_tpu.sim import closed_loop, scenario

    cfg = EMConfig(
        loop=dataclasses.replace(EMConfig().loop, n_plans=6)
    )
    rs = scenario.routed_scenarios(
        jax.random.PRNGKey(3), 4, cfg, with_dynamic=False, n_active_static=2
    )
    assert rs.scenario.global_path.x.shape == (4, 256)
    sim = jax.vmap(lambda gp, e, o: closed_loop.simulate(gp, e, o, cfg))
    carry, metrics = sim(
        rs.scenario.global_path, rs.scenario.ego0, rs.scenario.obstacles
    )
    lat = np.asarray(metrics.lateral_err)
    assert np.all(np.isfinite(lat))
    assert np.sqrt((lat**2).mean()) < 0.6
    assert not np.asarray(metrics.collided).any()
    # every ego makes progress along its route
    dist = np.hypot(
        np.asarray(carry.ego.x) - np.asarray(rs.scenario.ego0.x),
        np.asarray(carry.ego.y) - np.asarray(rs.scenario.ego0.y),
    )
    assert np.all(dist > 40.0)


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


def test_multilane_highway_lane_change_links():
    """Multi-lane topology: lane-change edges exist and A* traverses them
    when origin and destination sit on different lanes — the capability of
    the upstream GlobalRoutePlanner's CHANGELANELEFT/RIGHT edges
    (agents/navigation/global_route_planner.py:185-229)."""
    g = graph.multilane_highway(n_lanes=3, lane_width=3.5, length=400.0)
    opts = set(int(o) for o in g.edge_option)
    assert int(graph.RoadOption.CHANGE_LANE_LEFT) in opts
    assert int(graph.RoadOption.CHANGE_LANE_RIGHT) in opts

    # lane 0 start -> lane 2 end: the route must carry two left changes
    x, y, n, opt = astar.plan_route(
        g, (0.0, 0.0), (400.0, 7.0), pad_to=512, with_options=True
    )
    tags = np.asarray(opt[:n])
    assert int(graph.RoadOption.CHANGE_LANE_LEFT) in set(tags.tolist())
    assert int(graph.RoadOption.CHANGE_LANE_RIGHT) not in set(tags.tolist())
    # ends on lane 2, starts on lane 0
    assert abs(y[0] - 0.0) < 0.5 and abs(y[n - 1] - 7.0) < 0.5
    # the stitched path is smooth enough for the Frenet planner: max
    # heading change per 2 m step stays well under the smoother's budget
    v = np.stack([np.diff(x[:n]), np.diff(y[:n])], 1)
    th = np.unwrap(np.arctan2(v[:, 1], v[:, 0]))
    assert np.abs(np.diff(th)).max() < 0.25

    # same-lane route never changes lanes (ramp length > seg_len penalty)
    _, _, n2, opt2 = astar.plan_route(
        g, (0.0, 3.5), (400.0, 3.5), pad_to=512, with_options=True
    )
    assert set(np.asarray(opt2[:n2]).tolist()) == {
        int(graph.RoadOption.LANE_FOLLOW)
    }


def test_multilane_route_feeds_planner():
    """A lane-change route must drive the EM path planner end-to-end."""
    import jax.numpy as jnp

    from emplanner_carla_tpu.config import EMConfig
    from emplanner_carla_tpu.ops import frenet
    from emplanner_carla_tpu.planner import em_planner
    from emplanner_carla_tpu.types import EgoState, Obstacles

    cfg = EMConfig()
    g = graph.multilane_highway(n_lanes=2, lane_width=3.5, length=450.0)
    x, y, n = astar.plan_route(g, (0.0, 0.0), (450.0, 3.5), pad_to=256)
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


def test_device_route_and_stitch_matches_host(town):
    """route_nodes_device + stitch_route_device (the batched on-device
    route engine behind scenario.routed_scenarios_device) must produce
    host-optimal costs and, for the device's own node route, EXACTLY the
    host stitcher's polyline/options/padding."""
    import jax
    import jax.numpy as jnp

    pairs = [(0, 15), (3, 12), (1, 14), (7, 8), (13, 2)]
    o = jnp.asarray([p[0] for p in pairs])
    d = jnp.asarray([p[1] for p in pairs])
    f = jax.jit(jax.vmap(
        lambda a, b: astar.route_nodes_device(town, a, b)
    ))
    routes, valids, reached = f(o, d)
    g = jax.jit(jax.vmap(
        lambda r, v: astar.stitch_route_device(town, r, v, 256)
    ))
    xs, ys, ns, opts = g(routes, valids)

    cost = lambda r: sum(
        town.edge_len[town.edge_between(a, b)]
        for a, b in zip(r[:-1], r[1:])
    )
    for i, (start, goal) in enumerate(pairs):
        assert bool(reached[i])
        L = int(np.asarray(valids[i]).sum())
        r = np.asarray(routes[i])[:L].tolist()
        assert r[0] == start and r[-1] == goal
        ref = astar.astar_host(town, start, goal)
        assert cost(r) == pytest.approx(cost(ref), rel=1e-6)
        # stitching: exact vs the host stitcher on the SAME node route
        path, opt_h = astar.stitch_route(town, r, with_options=True)
        n = min(len(path), 256)
        assert int(ns[i]) == n
        np.testing.assert_allclose(
            np.asarray(xs[i])[:n], path[:n, 0], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ys[i])[:n], path[:n, 1], atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(opts[i])[:n], opt_h[:n])
        # padded tail repeats the final point (plan_route's contract)
        assert np.all(np.asarray(xs[i])[n:] == path[n - 1, 0])


def test_routed_scenarios_device_fleet():
    """The device-routed fleet constructor: valid scenarios, finite paths,
    and the same downstream contract as routed_scenarios."""
    import jax
    import jax.numpy as jnp

    from emplanner_carla_tpu.config import EMConfig
    from emplanner_carla_tpu.sim import scenario

    cfg = EMConfig()
    rs = scenario.routed_scenarios_device(jax.random.PRNGKey(2), 16, cfg)
    sc = rs.scenario
    assert sc.global_path.x.shape == (16, 256)
    assert bool(jnp.all(jnp.isfinite(sc.global_path.x)))
    assert bool(jnp.all(jnp.isfinite(sc.global_path.theta)))
    assert bool(jnp.all(rs.n_valid >= 120))
    # ego starts on its route
    d0 = jnp.hypot(
        sc.ego0.x - sc.global_path.x[:, 0], sc.ego0.y - sc.global_path.y[:, 0]
    )
    assert bool(jnp.all(jnp.isfinite(d0)))
