"""NumPy oracle for S-T speed planning (intended math, float64, loops).

Loop-based mirror of the *intended* algorithm of
``/root/reference/planner/speed_planning_test.py`` with the ledger quirks
fixed the same way as the JAX implementation it validates
(``planner/speed_planner.py``): Q5 edge samples span [t_start, t_end];
reverse edges hard-masked; only the true first column starts from the DP
origin (the reference's row_start == 0 sentinel, Q18).
"""

from __future__ import annotations

import math

import numpy as np

BIG = 1e8


def st_graph(obs_s, obs_l, obs_s_dot, obs_l_dot, lateral_gate=2.0,
             l_dot_gate=0.3, t_min_gate=1.0, t_max_gate=8.0):
    segs = []
    for s, l, sd, ld in zip(obs_s, obs_l, obs_s_dot, obs_l_dot):
        if abs(ld) < l_dot_gate:
            continue
        t_zero = -l / ld
        t_b1 = lateral_gate / ld + t_zero
        t_b2 = -lateral_gate / ld + t_zero
        t_max = max(t_b1, t_b2)
        t_min = min(t_b1, t_b2)
        if t_max < t_min_gate or t_min > t_max_gate:
            continue
        if t_min < 0 < t_max:
            segs.append((s, s + sd * t_max, 0.0, t_max))
        else:
            segs.append((s + sd * t_min, s + sd * t_max, t_min, t_max))
    return segs


def _seg_dist(s, t, seg):
    s_in, s_out, t_in, t_out = seg
    v1 = np.array([s_in - s, t_in - t])
    v2 = np.array([s_out - s, t_out - t])
    v3 = v2 - v1
    d1 = np.linalg.norm(v1)
    d2 = np.linalg.norm(v2)
    d3 = abs(v1[0] * v3[1] - v1[1] * v3[0]) / (np.linalg.norm(v3) + 1e-12)
    if (v1 @ v3 > 0) == (v2 @ v3 > 0):
        return min(d1, d2)
    return d3


def _collision_cost(d, w_obs=1e7, col=0.5, danger=1.5):
    if d < col:
        return w_obs
    if d < danger:
        return w_obs ** ((col - d) + 1.0)
    return 0.0


def _edge_cost(s0, t0, sd0, s1, t1, segs, v_ref, w_ref, w_acc, pen,
               a_lo=-6.0, a_hi=4.0, m=5):
    v = (s1 - s0) / (t1 - t0)
    if v < 0:
        return BIG
    a = (v - sd0) / (t1 - t0)
    cost = w_ref * (v - v_ref) ** 2
    if a_lo < a < a_hi:
        cost += w_acc * a * a
    else:
        cost += pen * w_acc * a * a
    for k in range(m):
        f = k / (m - 1)
        s = s0 + (s1 - s0) * f
        t = t0 + (t1 - t0) * f
        for seg in segs:
            cost += _collision_cost(_seg_dist(s, t, seg))
    return cost


def speed_dp(segs, start_s_dot, s_grid, n_t=16, t_step=0.5, v_ref=50 / 3.6,
             w_ref=4000.0, w_acc=100.0, pen=1e5):
    """Returns (s (n_t,), valid (n_t,), end_col). Rows ascend in s."""
    n_s = len(s_grid)
    t_grid = (np.arange(n_t) + 1) * t_step
    cost = np.full((n_t, n_s), np.inf)
    sdot = np.zeros((n_t, n_s))
    pre = np.zeros((n_t, n_s), dtype=int)
    for j in range(n_s):
        cost[0, j] = _edge_cost(0.0, 0.0, start_s_dot, s_grid[j], t_grid[0],
                                segs, v_ref, w_ref, w_acc, pen)
        sdot[0, j] = s_grid[j] / t_grid[0]
    for i in range(1, n_t):
        for j in range(n_s):
            for k in range(n_s):
                e = _edge_cost(s_grid[k], t_grid[i - 1], sdot[i - 1, k],
                               s_grid[j], t_grid[i], segs, v_ref, w_ref,
                               w_acc, pen)
                tot = cost[i - 1, k] + e
                if tot < cost[i, j]:
                    cost[i, j] = tot
                    pre[i, j] = k
                    sdot[i, j] = (s_grid[j] - s_grid[k]) / t_step
    # termination: right column vs s_max row, <= keeps later columns
    best_right = int(np.argmin(cost[-1]))
    best = (n_t - 1, best_right, cost[-1, best_right])
    for i in range(n_t):
        if cost[i, n_s - 1] <= best[2]:
            best = (i, n_s - 1, cost[i, n_s - 1])
    end_col, row, _ = best
    s_out = np.zeros(n_t)
    valid = np.zeros(n_t, bool)
    c = end_col
    while True:
        s_out[c] = s_grid[row]
        valid[c] = True
        if c == 0:
            break
        row = pre[c, row]
        c -= 1
    return s_out, valid, end_col
