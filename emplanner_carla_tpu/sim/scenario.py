"""Scenario construction: synthetic roads, ego spawns, obstacle layouts.

Replaces the reference's hand-placed CARLA Town05 scenario (ego spawn 259,
three parked cars at fixed coordinates, one NPC — ``test_9.py:238-291``)
with procedurally generated, seedable, fixed-shape scenarios that `vmap`
into fleets (BASELINE.md config 5).

A road is a curvature-profile centerline: kappa(s) as a sum of smooth random
bumps, integrated to heading and position and sampled every ``ds`` metres —
the same (x, y, theta, kappa) global-path contract the reference's routing
layer produces (``planning_utils.waypoint_list_2_target_path``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from emplanner_carla_tpu.config import EMConfig
from emplanner_carla_tpu.ops import frenet
from emplanner_carla_tpu.types import Array, EgoState, Obstacles, Path


class Scenario(NamedTuple):
    global_path: Path
    ego0: EgoState
    obstacles: Obstacles


def synthetic_centerline(
    key: Array, n: int = 256, ds: float = 2.0, max_kappa: float = 0.02
) -> Path:
    """Random smooth centerline of n nodes at ds spacing.

    kappa(s) = sum of M random raised-cosine bumps, clipped to |max_kappa|
    (r_min = 50 m keeps the Frenet transforms well inside the 1 - kappa*l > 0
    validity region for |l| <= 10).
    """
    M = 6
    k_amp, k_pos, k_width = jax.random.split(key, 3)
    s = jnp.arange(n) * ds
    total = n * ds
    amps = jax.random.uniform(k_amp, (M,), minval=-max_kappa, maxval=max_kappa)
    centers = jax.random.uniform(k_pos, (M,), minval=0.0, maxval=total)
    widths = jax.random.uniform(k_width, (M,), minval=40.0, maxval=120.0)
    arg = (s[:, None] - centers[None, :]) / widths[None, :]
    bump = jnp.where(jnp.abs(arg) < 1.0, 0.5 * (1.0 + jnp.cos(jnp.pi * arg)), 0.0)
    kappa = jnp.clip(jnp.sum(amps[None, :] * bump, axis=1), -max_kappa, max_kappa)
    theta = jnp.cumsum(kappa * ds) - kappa[0] * ds
    x = jnp.cumsum(jnp.cos(theta) * ds) - jnp.cos(theta[0]) * ds
    y = jnp.cumsum(jnp.sin(theta) * ds) - jnp.sin(theta[0]) * ds
    return Path(x, y, theta, kappa)


def place_on_path(path: Path, s: Array, l: Array):
    """World position of Frenet (s, l) relative to the path start."""
    s_map = frenet.arc_length(path)
    x, y, theta, _ = frenet.proj_point_at_s(s, path, s_map)
    return x - l * jnp.sin(theta), y + l * jnp.cos(theta), theta


WALKER_SPEED = 1.4  # m/s, typical crossing pedestrian


def make_scenario(
    key: Array,
    cfg: EMConfig,
    n_path: int = 256,
    path_ds: float = 2.0,
    v0: float = 8.0,
    n_active_static: int = 3,
    with_dynamic: bool = True,
    npc_speed: float = 30.0 / 3.6,
    with_walker: bool = False,
) -> Scenario:
    """One randomized scenario mirroring the test_9 layout: ego at the path
    start, a few parked cars near the line ahead, one slower lead NPC.
    ``with_walker`` adds a crossing pedestrian (the walker actors of
    ``simulation_2.py:391-494``) in the second dynamic slot."""
    # (4-way split kept for stream-compatibility with round-1 seeds)
    k_path, k_s, k_l, k_dyn = jax.random.split(key, 4)
    gp = synthetic_centerline(k_path, n_path, path_ds)
    return _place(
        k_s, k_l, k_dyn, cfg, gp, jnp.float32(n_path * path_ds), v0,
        n_active_static, with_dynamic, npc_speed, with_walker,
    )


def populate_scenario(
    key: Array,
    cfg: EMConfig,
    gp: Path,
    s_extent: Array,
    v0: float = 8.0,
    n_active_static: int = 3,
    with_dynamic: bool = True,
    npc_speed: float = 30.0 / 3.6,
    with_walker: bool = False,
) -> Scenario:
    """Place the ego and the obstacle layout along a given global path
    (synthetic or routed). ``s_extent``: usable arc length of the path."""
    k_s, k_l, k_dyn = jax.random.split(key, 3)
    return _place(
        k_s, k_l, k_dyn, cfg, gp, s_extent, v0, n_active_static,
        with_dynamic, npc_speed, with_walker,
    )


def _place(
    k_s, k_l, k_dyn, cfg, gp, s_extent, v0, n_active_static, with_dynamic,
    npc_speed, with_walker=False,
) -> Scenario:
    K = cfg.n_static_obs + cfg.n_dynamic_obs
    slot = jnp.arange(K)
    is_static_slot = slot < cfg.n_static_obs
    static_active = slot < n_active_static

    # spread static obstacles over disjoint s bands so they never stack on
    # the spawn point or each other
    s_max = jnp.minimum(300.0, s_extent - 100.0)
    band = (s_max - 60.0) / max(cfg.n_static_obs, 1)
    obs_s = (
        60.0
        + band * jnp.arange(K, dtype=jnp.float32)
        + jax.random.uniform(k_s, (K,), minval=0.1 * band, maxval=0.9 * band)
    )
    obs_l = jax.random.uniform(k_l, (K,), minval=-1.0, maxval=1.0)

    dyn_slot = slot == cfg.n_static_obs  # first dynamic slot
    dyn_s0 = jax.random.uniform(k_dyn, (), minval=30.0, maxval=45.0)
    obs_s = jnp.where(dyn_slot, dyn_s0, obs_s)
    obs_l = jnp.where(dyn_slot, 0.0, obs_l)

    # crossing pedestrian in the second dynamic slot: spawns off the road
    # and walks across it perpendicular to the path
    # (simulation_2.py:391-494 spawns walker actors; slots at walking speed
    # are stepped as constant-velocity crossers, not vehicle agents)
    walker_slot = slot == cfg.n_static_obs + 1
    k_walk = jax.random.fold_in(k_dyn, 1)
    walk_s = jax.random.uniform(k_walk, (), minval=65.0, maxval=85.0)
    obs_s = jnp.where(walker_slot, walk_s, obs_s)
    obs_l = jnp.where(walker_slot, -8.0, obs_l)

    ox, oy, oth = place_on_path(gp, obs_s, obs_l)
    dyn_active = dyn_slot & with_dynamic
    walker_active = walker_slot & with_walker
    ovx = jnp.where(dyn_active, npc_speed * jnp.cos(oth), 0.0)
    ovy = jnp.where(dyn_active, npc_speed * jnp.sin(oth), 0.0)
    # walker velocity: along the +l path normal (-sin, cos), crossing the road
    ovx = jnp.where(walker_active, -WALKER_SPEED * jnp.sin(oth), ovx)
    ovy = jnp.where(walker_active, WALKER_SPEED * jnp.cos(oth), ovy)
    valid = (is_static_slot & static_active) | dyn_active | walker_active
    obstacles = Obstacles(ox, oy, ovx, ovy, valid)

    z = jnp.zeros(())
    ego0 = EgoState(
        gp.x[0], gp.y[0], gp.theta[0], jnp.asarray(v0, jnp.float32), z, z, z, z, z
    )
    return Scenario(gp, ego0, obstacles)


def batch_scenarios(key: Array, batch: int, cfg: EMConfig, **kw) -> Scenario:
    """A vmapped batch of randomized scenarios (the fleet input)."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: make_scenario(k, cfg, **kw))(keys)


def lights_on_path(
    gp: Path,
    s_positions,
    period: float = 12.0,
    green_frac: float = 0.5,
    offsets=None,
):
    """Traffic lights at the given path stations (stop lines on the
    centerline). Returns a ``traffic_light.TrafficLights``; pass it to the
    closed loops' ``lights`` argument."""
    from emplanner_carla_tpu.sim.traffic_light import TrafficLights

    s = jnp.asarray(s_positions, jnp.float32)
    x, y, _ = place_on_path(gp, s, jnp.zeros_like(s))
    n = s.shape[0]
    off = jnp.zeros(n) if offsets is None else jnp.asarray(offsets, jnp.float32)
    return TrafficLights(
        x, y, jnp.full(n, period), off, jnp.full(n, green_frac),
        jnp.ones(n, bool),
    )


def test9_scenario(
    cfg: EMConfig, v0: float = 8.0, pad_to: int = 256
) -> tuple[Scenario, Array]:
    """The reference's headline scenario, scenario-identical: the recorded
    Town05 sub-network (``routing.graph.town05_test9``), ego routed from
    the spawn-259 stand-in to the spawn-48 stand-in, the three parked cars
    and the BehaviorAgent NPC at the reference's *pinned world coordinates*
    (``/root/reference/test_9.py:259-291``; NPC target 30 km/h on the
    ego's own route). Returns ``(scenario, n_valid_path_points)``.

    Drive it with ``closed_loop.simulate_traffic`` — the NPC slot runs the
    agent model on the ego's route exactly like the reference's
    ``BehaviorAgent`` (``test_9.py:288-291,344``).
    """
    import numpy as np

    from emplanner_carla_tpu.routing import astar, graph as graph_mod

    town = graph_mod.town05_test9()
    x, y, n_valid, _ = astar.plan_route(
        town, graph_mod.TEST9_EGO_SPAWN, graph_mod.TEST9_DESTINATION,
        pad_to=pad_to, with_options=True,
    )
    gp = frenet.path_from_xy(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
    )
    idx = jnp.minimum(jnp.arange(pad_to), n_valid - 1)
    gp = gp._replace(theta=gp.theta[idx], kappa=gp.kappa[idx])

    K = cfg.n_static_obs + cfg.n_dynamic_obs
    ox = np.zeros(K, np.float32)
    oy = np.zeros(K, np.float32)
    ovx = np.zeros(K, np.float32)
    ovy = np.zeros(K, np.float32)
    valid = np.zeros(K, bool)
    statics = graph_mod.TEST9_STATICS
    if len(statics) > cfg.n_static_obs:
        raise ValueError("cfg.n_static_obs too small for the fixture")
    for i, (sx, sy, _yaw) in enumerate(statics):
        ox[i], oy[i], valid[i] = sx, sy, True
    d0 = cfg.n_static_obs
    nx, ny, nspeed = graph_mod.TEST9_NPC
    ox[d0], oy[d0] = nx, ny
    ovy[d0] = nspeed                    # spawn road heads +y
    valid[d0] = True
    obstacles = Obstacles(*(jnp.asarray(a) for a in (ox, oy, ovx, ovy, valid)))

    z = jnp.zeros(())
    ego0 = EgoState(
        gp.x[0], gp.y[0], gp.theta[0], jnp.asarray(v0, jnp.float32),
        z, z, z, z, z,
    )
    return Scenario(gp, ego0, obstacles), jnp.asarray(n_valid, jnp.int32)


class RoutedScenarios(NamedTuple):
    """A fleet whose global paths come from A* routes over a road graph."""

    scenario: Scenario      # batched; global_path padded to a fixed length
    road_option: Array      # (B, pad_to) int32 RoadOption per path point
    n_valid: Array          # (B,) valid path-point counts


def routed_scenarios(
    key: Array,
    batch: int,
    cfg: EMConfig,
    town=None,
    pad_to: int = 256,
    min_points: int = 120,
    **kw,
) -> RoutedScenarios:
    """Fleet scenarios routed through a town with A* (the reference routes
    the town before every drive, ``test_9.py:295-313``: search_path_way ->
    waypoint path -> planner). Host-side route search + stitching (routing
    is per-scenario setup, SURVEY §7.1); obstacle placement and everything
    downstream is the same compiled path as ``batch_scenarios``.

    Surfaces the per-point RoadOption stream (``search_path_way``'s
    ``[(waypoint, RoadOption)]`` contract, ``global_planning.py:234-272``).
    """
    import numpy as np

    from emplanner_carla_tpu.ops import frenet
    from emplanner_carla_tpu.routing import astar, graph as graph_mod

    if town is None:
        town = graph_mod.grid_town_curved()
    k_route, k_pop = jax.random.split(key)
    rng = np.random.default_rng(int(jax.random.randint(k_route, (), 0, 2**31 - 1)))

    N = town.n_nodes
    route_cache: dict[tuple[int, int], tuple] = {}
    xs, ys, opts, ns = [], [], [], []
    while len(xs) < batch:
        o, d = rng.integers(0, N, 2)
        if o == d:
            continue
        pair = (int(o), int(d))
        if pair not in route_cache:
            try:
                route_cache[pair] = astar.plan_route(
                    town,
                    tuple(town.nodes_xy[o]),
                    tuple(town.nodes_xy[d]),
                    pad_to=pad_to,
                    with_options=True,
                )
            except ValueError:
                route_cache[pair] = None
        r = route_cache[pair]
        if r is None or r[2] < min_points:
            continue
        x, y, n, opt = r
        xs.append(x)
        ys.append(y)
        opts.append(opt)
        ns.append(n)

    x_all = jnp.asarray(np.stack(xs), jnp.float32)   # (B, pad_to)
    y_all = jnp.asarray(np.stack(ys), jnp.float32)
    n_valid = jnp.asarray(np.asarray(ns), jnp.int32)
    options = jnp.asarray(np.stack(opts), jnp.int32)

    gps = jax.vmap(frenet.path_from_xy)(x_all, y_all)
    # hold the last valid heading/curvature through the padded tail (the
    # repeated end point would otherwise yield theta = kappa = 0 there)
    idx = jnp.minimum(jnp.arange(pad_to)[None, :], n_valid[:, None] - 1)
    gps = gps._replace(
        theta=jnp.take_along_axis(gps.theta, idx, axis=1),
        kappa=jnp.take_along_axis(gps.kappa, idx, axis=1),
    )

    keys = jax.random.split(k_pop, batch)
    resolution = town.resolution  # graph resample spacing (point count -> m)
    sc = jax.vmap(
        lambda k, gp, n: populate_scenario(
            k, cfg, gp, n.astype(jnp.float32) * resolution, **kw
        )
    )(keys, gps, n_valid)
    return RoutedScenarios(sc, options, n_valid)


def routed_scenarios_device(
    key: Array,
    batch: int,
    cfg: EMConfig,
    town=None,
    pad_to: int = 256,
    min_points: int = 120,
    oversample: int = 8,
    **kw,
) -> RoutedScenarios:
    """``routed_scenarios`` with the route queries themselves ON DEVICE:
    batched ``routing.astar.astar_device`` + device backtracking +
    device polyline stitching (``route_nodes_device`` /
    ``stitch_route_device``), one vmapped XLA program for the whole
    fleet's routes — the production consumer of the device A* engine
    (the reference's ``search_path_way`` routes one pair on the host per
    drive, ``global_planning.py:153-272``).

    Candidate (origin, destination) node pairs are oversampled
    ``oversample`` x, routed in one batch, and the first ``batch`` routes
    meeting ``min_points`` are kept (only the tiny per-route length
    vector is pulled to the host for the selection; paths stay on
    device). Downstream population is identical to ``routed_scenarios``.
    """
    import numpy as np

    from emplanner_carla_tpu.ops import frenet
    from emplanner_carla_tpu.routing import astar, graph as graph_mod

    if town is None:
        town = graph_mod.grid_town_curved()
    k_route, k_pop = jax.random.split(key)
    N = town.n_nodes

    n_cand = oversample * batch
    k_o, k_d = jax.random.split(k_route)
    origins = jax.random.randint(k_o, (n_cand,), 0, N)
    dests = jax.random.randint(k_d, (n_cand,), 0, N)

    def one(o, d):
        route, valid, reached = astar.route_nodes_device(town, o, d)
        x, y, n, opt = astar.stitch_route_device(town, route, valid, pad_to)
        ok = reached & (o != d) & (n >= min_points)
        return x, y, n, opt, ok

    x_all, y_all, n_all, opt_all, ok = jax.jit(jax.vmap(one))(origins, dests)
    sel = np.flatnonzero(np.asarray(ok))
    if len(sel) < batch:
        raise ValueError(
            f"only {len(sel)}/{batch} routable pairs at oversample="
            f"{oversample}; raise oversample"
        )
    sel = jnp.asarray(sel[:batch])
    x_all, y_all = x_all[sel], y_all[sel]
    n_valid, options = n_all[sel], opt_all[sel]

    gps = jax.vmap(frenet.path_from_xy)(x_all, y_all)
    idx = jnp.minimum(jnp.arange(pad_to)[None, :], n_valid[:, None] - 1)
    gps = gps._replace(
        theta=jnp.take_along_axis(gps.theta, idx, axis=1),
        kappa=jnp.take_along_axis(gps.kappa, idx, axis=1),
    )
    keys = jax.random.split(k_pop, batch)
    resolution = town.resolution  # graph resample spacing (point count -> m)
    sc = jax.vmap(
        lambda k, gp, n: populate_scenario(
            k, cfg, gp, n.astype(jnp.float32) * resolution, **kw
        )
    )(keys, gps, n_valid)
    return RoutedScenarios(sc, options, n_valid)
