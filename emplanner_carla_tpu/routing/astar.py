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
    and tiny) or via ``route_nodes``.
    """
    import jax
    import jax.numpy as jnp

    n = g.n_nodes
    adj = jnp.asarray(g.adj)
    adj_edge = jnp.asarray(g.adj_edge)
    edge_len = jnp.asarray(g.edge_len, jnp.float32)
    xy = jnp.asarray(g.nodes_xy, jnp.float32)

    heur = jnp.hypot(xy[:, 0] - xy[goal, 0], xy[:, 1] - xy[goal, 1])

    INF = jnp.float32(1e30)
    g_cost0 = jnp.full(n, INF).at[start].set(0.0)
    parent0 = jnp.full(n, -1, jnp.int32)
    in_open0 = jnp.zeros(n, bool).at[start].set(True)
    closed0 = jnp.zeros(n, bool)

    def cond(state):
        g_cost, parent, in_open, closed, it = state
        return jnp.any(in_open) & ~closed[goal] & (it < n)

    def body(state):
        g_cost, parent, in_open, closed, it = state
        f = jnp.where(in_open, g_cost + heur, INF)
        c = jnp.argmin(f).astype(jnp.int32)
        in_open = in_open.at[c].set(False)
        closed = closed.at[c].set(True)
        succ = adj[c]                      # (max_deg,)
        e = adj_edge[c]
        cand = g_cost[c] + jnp.where(e >= 0, edge_len[jnp.maximum(e, 0)], INF)
        ok = (succ >= 0) & ~closed[jnp.maximum(succ, 0)]
        better = ok & (cand < g_cost[jnp.maximum(succ, 0)])
        idx = jnp.where(better, succ, n)   # scatter-drop invalid to row n
        g_cost = g_cost.at[idx].min(jnp.where(better, cand, INF), mode="drop")
        # parent/open update where improved
        upd = better & (cand <= g_cost[jnp.maximum(succ, 0)] + 1e-6)
        parent = parent.at[jnp.where(upd, succ, n)].set(c, mode="drop")
        in_open = in_open.at[jnp.where(upd, succ, n)].set(True, mode="drop")
        return g_cost, parent, in_open, closed, it + 1

    import jax.lax as lax

    g_cost, parent, in_open, closed, _ = lax.while_loop(
        cond, body, (g_cost0, parent0, in_open0, closed0, 0)
    )
    return parent, closed[goal]


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
