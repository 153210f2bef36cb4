"""A* route search + path stitching on the padded road graph.

Rebuild of ``_A_star`` / ``_route_search`` / ``search_path_way``
(``/root/reference/planner/global_planning.py:153-272``).

Two engines over the same RoadGraph:

* ``astar_host`` — NumPy, host-side, used at scenario-construction time
  (routing is setup, not the hot loop — SURVEY.md §7.1);
* ``astar_device`` — a branch-free JAX version for batched route queries:
  the open-set dict becomes fixed-size arrays and the data-dependent
  "until goal popped" loop a ``lax.while_loop`` (bounded by N iterations),
  so thousands of (start, goal) queries vmap on-device.

Both use the metric edge length as cost and the Euclidean heuristic
(``global_planning.py:180-184``).
"""

from __future__ import annotations

import numpy as np

from emplanner_carla_tpu.routing.graph import RoadGraph


def astar_host(g: RoadGraph, start: int, goal: int) -> list[int] | None:
    """Host A*: returns node-id route (or None if unreachable)."""
    xy = g.nodes_xy
    h = lambda n: float(np.hypot(*(xy[n] - xy[goal])))
    open_set = {start: (0.0, -1)}
    closed: dict[int, tuple[float, int]] = {}
    while open_set:
        c = min(open_set, key=lambda n: open_set[n][0] + h(n))
        if c == goal:
            closed[c] = open_set.pop(c)
            break
        g_c, parent = open_set.pop(c)
        closed[c] = (g_c, parent)
        for k in range(g.adj.shape[1]):
            suc = int(g.adj[c, k])
            if suc < 0 or suc in closed:
                continue
            cost = g_c + float(g.edge_len[g.adj_edge[c, k]])
            if suc not in open_set or cost < open_set[suc][0]:
                open_set[suc] = (cost, c)
    else:
        return None
    route = [goal]
    while closed[route[-1]][1] != -1:
        route.append(closed[route[-1]][1])
    return list(reversed(route))


def astar_device(g: RoadGraph, start, goal):
    """Device A* over fixed arrays; vmap over (start, goal) batches.

    Returns (parent, found): parent (N,) backtracking table and a success
    flag. Path extraction happens host-side (it is inherently sequential
    and tiny) or via ``route_nodes_device``.

    Shape discipline: a fixed N-iteration ``fori_loop`` (A* closes one
    node per pop, so N pops suffice; early exit buys nothing for
    lockstep vmap lanes on TPU) with every pop/relax step expressed as
    one-hot mask arithmetic over the (N,) state vectors — NO per-lane
    dynamic gathers or scatters and NO batched ``while_loop`` cond.
    The earlier scatter-based ``while_loop`` version was both ~50x
    slower under a 4096-lane vmap AND mis-executed by the TPU backend
    at batch >= ~1024 (lanes exited with it=0 / it=N garbage; identical
    program correct on the CPU backend) — the one-hot form is the same
    fix CLAUDE.md records for frenet/pixel-tracker gathers.
    """
    import jax.numpy as jnp
    from jax import lax

    n = g.n_nodes
    adj = jnp.asarray(g.adj)                       # (N, D) successor ids
    adj_edge = jnp.asarray(g.adj_edge)             # (N, D) edge ids
    edge_len = jnp.asarray(g.edge_len, jnp.float32)
    xy = jnp.asarray(g.nodes_xy, jnp.float32)
    # per-row successor costs, padded slots -> +inf (trace-time constant)
    step_cost = jnp.where(
        adj_edge >= 0, edge_len[jnp.maximum(adj_edge, 0)], jnp.float32(1e30)
    )                                              # (N, D)
    iota = jnp.arange(n, dtype=jnp.int32)

    # goal one-hot hoisted out of the loop: `closed[goal]` / `xy[goal]`
    # would be per-lane dynamic-index reads under the fleet vmap (TPU
    # poison — the very pattern this function exists to avoid)
    goal_oh = iota == goal
    gx = jnp.sum(jnp.where(goal_oh, xy[:, 0], 0.0))
    gy = jnp.sum(jnp.where(goal_oh, xy[:, 1], 0.0))
    heur = jnp.hypot(xy[:, 0] - gx, xy[:, 1] - gy)

    INF = jnp.float32(1e30)
    g_cost0 = jnp.where(iota == start, 0.0, INF)
    parent0 = jnp.full(n, -1, jnp.int32)
    in_open0 = iota == start
    closed0 = jnp.zeros(n, bool)

    def body(_, state):
        g_cost, parent, in_open, closed = state
        live = jnp.any(in_open) & ~jnp.any(closed & goal_oh)
        f = jnp.where(in_open & live, g_cost + heur, INF)
        # one-hot of the pop: first index attaining the min
        is_min = (f == jnp.min(f)) & in_open & live
        pop = is_min & (jnp.cumsum(is_min.astype(jnp.int32)) == 1)  # (N,)
        in_open = in_open & ~pop
        closed = closed | pop
        c = jnp.sum(jnp.where(pop, iota, 0))       # popped node id
        # row c of adj/step_cost via one-hot contraction (no gather)
        popf = pop.astype(jnp.float32)
        succ = jnp.sum(jnp.where(pop[:, None], adj, 0), axis=0)      # (D,)
        cost_c = jnp.sum(jnp.where(pop, g_cost, 0.0))
        cand = jnp.where(
            live, cost_c + jnp.sum(popf[:, None] * step_cost, axis=0), INF
        )                                          # (D,)
        # relax: scatter over columns as a (D, N) one-hot mask reduce
        hit = (iota[None, :] == succ[:, None]) & (succ >= 0)[:, None]
        relax = hit & (cand[:, None] < g_cost[None, :]) & ~closed[None, :]
        new_cost = jnp.min(
            jnp.where(relax, cand[:, None], INF), axis=0
        )                                          # (N,)
        improved = new_cost < g_cost
        g_cost = jnp.where(improved, new_cost, g_cost)
        parent = jnp.where(improved, c, parent)
        in_open = in_open | improved
        return g_cost, parent, in_open, closed

    g_cost, parent, in_open, closed = lax.fori_loop(
        0, n, body, (g_cost0, parent0, in_open0, closed0)
    )
    return parent, jnp.any(closed & goal_oh)


def route_nodes_device(g: RoadGraph, start, goal, max_route: int | None = None):
    """Device A* + device backtracking: (start, goal) -> fixed-shape route.

    Returns ``(route, valid, reached)``: ``route`` (max_route,) node ids
    ordered start->goal, ``valid`` the per-slot mask, ``reached`` the
    success flag. vmaps over (start, goal) batches — the batched
    route-query engine behind ``sim/scenario.routed_scenarios_device``
    (the reference plans one route per drive on the host,
    ``global_planning.py:153-233``; here thousands of queries run in one
    XLA program).
    """
    import jax.numpy as jnp
    from jax import lax

    n = g.n_nodes
    if max_route is None:
        max_route = n
    parent, found = astar_device(g, start, goal)
    iota = jnp.arange(n, dtype=jnp.int32)

    def step(node, _):
        # parent[node] as a one-hot multiply-sum (frenet._gather pattern —
        # per-lane gathers inside a vmapped scan are TPU poison)
        nxt = jnp.sum(jnp.where(iota == node, parent, 0))
        return jnp.where(nxt >= 0, nxt, node), node

    _, rev = lax.scan(step, jnp.asarray(goal, jnp.int32), None,
                      length=max_route)
    # rev = [goal, parent(goal), ...] and repeats `start` once reached
    # (parent[start] = -1 holds the node). Route length = first `start`
    # hit + 1; anything after is padding.
    is_start = rev == start
    reached = found & jnp.any(is_start)
    length = jnp.where(reached, jnp.argmax(is_start) + 1, 0)
    idx = jnp.clip(length - 1 - jnp.arange(max_route), 0, max_route - 1)
    route = jnp.sum(
        jnp.where(jnp.arange(max_route)[None, :] == idx[:, None], rev, 0),
        axis=1,
    )
    valid = jnp.arange(max_route) < length
    return route, valid, reached


def stitch_route_device(g: RoadGraph, route, valid, pad_to: int):
    """Device-side ``stitch_route``: a fixed-shape node route -> one
    (pad_to,) global polyline + per-point RoadOption stream.

    Edge lookup is a masked match over the padded adjacency rows; the
    polyline assembly is one one-hot position-mask reduction over
    (route edges x edge points) with cumsum offsets (junction duplicates
    dropped exactly as the host stitcher does). Rows past the route's
    true length repeat the final point — the same padding contract as
    ``plan_route(pad_to=...)``. Returns (x, y, n_valid, options).

    Everything is mask-multiply-sum — no per-lane gathers/scatters at
    all (under a 4096-lane vmap those are TPU poison, and the batched
    ``while_loop``+scatter A* this feeds was outright mis-executed by
    the TPU backend; see ``astar_device``).
    """
    import jax.numpy as jnp

    adj = jnp.asarray(g.adj)                         # (N, D)
    adj_edge = jnp.asarray(g.adj_edge)               # (N, D)
    edge_path = jnp.nan_to_num(                      # NaN pad -> 0 (masked)
        jnp.asarray(g.edge_path, jnp.float32)
    )                                                # (E, P, 2)
    edge_n = jnp.asarray(g.edge_n, jnp.int32)        # (E,)
    edge_option = jnp.asarray(g.edge_option, jnp.int32)
    E, P, _ = edge_path.shape
    N = g.n_nodes

    a, b = route[:-1], route[1:]                     # (R-1,)
    pair_ok = valid[:-1] & valid[1:]
    # rows adj[a], adj_edge[a] via one-hot over the N node rows
    oh_a = a[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :]  # (R-1, N)
    adj_a = jnp.sum(jnp.where(oh_a[:, :, None], adj[None], 0), axis=1)
    adje_a = jnp.sum(jnp.where(oh_a[:, :, None], adj_edge[None], 0), axis=1)
    hit = (adj_a == b[:, None]) & (adj_a >= 0)       # (R-1, D)
    # FIRST matching edge (min id), not the sum over matches: a graph with
    # two parallel edges between the same node pair would otherwise stitch
    # a garbage summed edge id (host `edge_between` also takes the first)
    eid = jnp.min(jnp.where(hit, adje_a, E), axis=1)
    has = pair_ok & jnp.any(hit, axis=1)

    # per-edge scalars/rows via one-hot over the E edges
    oh_e = eid[:, None] == jnp.arange(E, dtype=jnp.int32)[None, :]  # (R-1, E)
    en = jnp.sum(jnp.where(oh_e, edge_n[None, :], 0), axis=1)
    eopt = jnp.sum(jnp.where(oh_e, edge_option[None, :], 0), axis=1)
    pts = jnp.sum(
        jnp.where(oh_e[:, :, None, None], edge_path[None], 0.0), axis=1
    )                                                # (R-1, P, 2)

    # edge e contributes its points[1:] (the junction point is emitted by
    # the previous edge); the route's very first point is edge 0's point 0
    n_pts = jnp.where(has, en - 1, 0)
    off = jnp.cumsum(n_pts) - n_pts + 1              # output start per edge
    n_valid = jnp.minimum(1 + jnp.sum(n_pts), pad_to)

    p_idx = jnp.arange(1, P)
    pos = off[:, None] + (p_idx[None, :] - 1)        # (R-1, P-1)
    keep = has[:, None] & (p_idx[None, :] < en[:, None]) & (pos < pad_to)
    pos = jnp.where(keep, pos, -1)
    src_xy = jnp.where(keep[..., None], pts[:, 1:], 0.0).reshape(-1, 2)
    src_opt = jnp.where(keep, eopt[:, None], 0).reshape(-1)
    flat_pos = pos.reshape(-1)                       # (S,) with -1 = dropped
    # position one-hot: (pad_to, S) mask reduce replaces the scatter-add
    oh_p = flat_pos[None, :] == jnp.arange(pad_to, dtype=pos.dtype)[:, None]
    xy = jnp.sum(jnp.where(oh_p[:, :, None], src_xy[None], 0.0), axis=1)
    opt = jnp.sum(jnp.where(oh_p, src_opt[None, :], 0), axis=1)
    # first point: point 0 of the first valid edge
    first = jnp.argmax(has)
    oh_f = (jnp.arange(has.shape[0]) == first) & has
    pt0 = jnp.sum(jnp.where(oh_f[:, None], pts[:, 0], 0.0), axis=0)
    opt0 = jnp.sum(jnp.where(oh_f, eopt, 0))
    row0 = jnp.arange(pad_to) == 0
    xy = jnp.where(row0[:, None], pt0[None, :], xy)
    opt = jnp.where(row0, opt0, opt)
    # repeat the final valid point through the padded tail
    last = jnp.maximum(n_valid - 1, 0)
    oh_l = jnp.arange(pad_to) == last
    xy_l = jnp.sum(jnp.where(oh_l[:, None], xy, 0.0), axis=0)
    opt_l = jnp.sum(jnp.where(oh_l, opt, 0))
    in_route = jnp.arange(pad_to) < n_valid
    xy = jnp.where(in_route[:, None], xy, xy_l[None, :])
    opt = jnp.where(in_route, opt, opt_l)
    return xy[:, 0], xy[:, 1], n_valid, opt


def stitch_route(g: RoadGraph, route: list[int], with_options: bool = False):
    """Concatenate the edge polylines along a node route into one (M, 2)
    global path (= ``search_path_way``'s stitching,
    ``global_planning.py:246-272``), dropping duplicated junction points.

    With ``with_options`` also returns the per-point RoadOption tag
    (the reference's ``[(waypoint, RoadOption)]`` contract,
    ``global_planning.py:234-272``).
    """
    pts: list[np.ndarray] = []
    opts: list[np.ndarray] = []
    for a, b in zip(route[:-1], route[1:]):
        e = g.edge_between(a, b)
        if e < 0:
            raise ValueError(f"no edge {a}->{b}")
        path = g.edge_path[e, : g.edge_n[e]]
        if pts:
            path = path[1:]  # junction point already emitted
        pts.append(path)
        opts.append(np.full(len(path), g.edge_option[e], np.int32))
    path = np.concatenate(pts, axis=0)
    if with_options:
        return path, np.concatenate(opts, axis=0)
    return path


def plan_route(
    g: RoadGraph,
    origin_xy,
    destination_xy,
    pad_to: int | None = None,
    with_options: bool = False,
):
    """origin/destination positions -> (x, y) global path arrays.

    The full ``search_path_way`` contract: locate endpoints on the graph,
    A*, stitch. Optionally pad (by repeating the final point) to a fixed
    length for the compiled pipeline's static shapes; returns
    (x, y, n_valid) — or (x, y, n_valid, options) with ``with_options``,
    where options is the per-point RoadOption (padding repeats the final
    tag), mirroring ``search_path_way``'s ``[(waypoint, RoadOption)]``.
    """
    start = g.nearest_node(*origin_xy)
    goal = g.nearest_node(*destination_xy)
    route = astar_host(g, start, goal)
    if route is None:
        raise ValueError(f"node {goal} not reachable from {start}")
    if len(route) == 1:
        path = g.nodes_xy[route[0]][None, :]
        options = np.zeros(1, np.int32)
    else:
        path, options = stitch_route(g, route, with_options=True)
    n = len(path)
    if pad_to is not None:
        if n > pad_to:
            path = path[:pad_to]
            options = options[:pad_to]
            n = pad_to
        else:
            pad = np.repeat(path[-1:], pad_to - n, axis=0)
            path = np.concatenate([path, pad], axis=0)
            options = np.concatenate(
                [options, np.repeat(options[-1:], pad_to - n)], axis=0
            )
    if with_options:
        return path[:, 0], path[:, 1], n, options
    return path[:, 0], path[:, 1], n
