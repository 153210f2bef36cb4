"""NumPy oracle for S-L path planning (intended math, float64, loops).

Mirrors the *algorithm* of ``/root/reference/planner/path_planning.py``
(DP over the lattice, corridor, densify) with the ledger quirks fixed
(Q2 dddl typo, Q3 dead break), written with explicit loops and the
absolute-s quintic solve so it cannot share bugs with the vectorized JAX
implementation it validates.
"""

from __future__ import annotations

import numpy as np

from emplanner_carla_tpu.oracle.frenet_np import quintic_coeffs_abs, quintic_eval_abs


def _edge_cost(
    c, s0, h, m, obs_s, obs_l, w_dl, w_ddl, w_dddl, w_ref, w_coll, danger, safe
):
    cost_smooth = 0.0
    cost_ref = 0.0
    samples = []
    for k in range(m):
        s = s0 + k * h / m
        l, dl, ddl, dddl = quintic_eval_abs(c, s)
        cost_smooth += w_dl * dl**2 + w_ddl * ddl**2 + w_dddl * dddl**2
        cost_ref += w_ref * l**2
        samples.append((s, l))
    cost_obs = 0.0
    for os, ol in zip(obs_s, obs_l):
        band = 0.0
        collided = False
        for s, l in samples:
            d2 = (os - s) ** 2 + (ol - l) ** 2
            if d2 <= danger**2:
                collided = True
            elif danger**2 < d2 < safe**2:
                band += 5000.0 / d2
        cost_obs += (1 if collided else 0) * w_coll + band
    return cost_smooth + cost_ref + cost_obs


def path_dp(
    obs_s,
    obs_l,
    start_s,
    start_l,
    start_dl,
    start_ddl,
    rows=12,
    cols=6,
    sample_s=15.0,
    sample_l=1.5,
    m=10,
    w_dl=300.0,
    w_ddl=1000.0,
    w_dddl=5000.0,
    w_ref=20.0,
    w_coll=1e12,
    penalty=10000.0,
    danger=4.0,
    safe=6.0,
):
    """Returns (dp_s, dp_l, feasible). Straight line when no obstacles."""
    l_of = lambda i: ((rows + 1) / 2 - 1 - i) * sample_l
    if len(obs_s) == 0:
        dp_s = np.array([start_s + (j + 1) * sample_s for j in range(cols)])
        return dp_s, np.zeros(cols), True

    cost = np.full((rows, cols), np.inf)
    pre = np.zeros((rows, cols), dtype=int)
    for i in range(rows):
        c = quintic_coeffs_abs(
            start_l, start_dl, start_ddl, l_of(i), 0, 0, start_s, start_s + sample_s
        )
        cost[i, 0] = _edge_cost(
            c, start_s, sample_s, m, obs_s, obs_l,
            w_dl, w_ddl, w_dddl, w_ref, w_coll, danger, safe,
        )
        if i < rows // 2:
            cost[i, 0] += penalty
    for j in range(1, cols):
        for i in range(rows):
            s0 = start_s + j * sample_s
            for k in range(rows):
                c = quintic_coeffs_abs(
                    l_of(k), 0, 0, l_of(i), 0, 0, s0, s0 + sample_s
                )
                e = _edge_cost(
                    c, s0, sample_s, m, obs_s, obs_l,
                    w_dl, w_ddl, w_dddl, w_ref, w_coll, danger, safe,
                )
                t = cost[k, j - 1] + e
                if i < rows // 2:
                    t += penalty
                if t < cost[i, j]:
                    cost[i, j] = t
                    pre[i, j] = k
    row = int(np.argmin(cost[:, -1]))
    feasible = cost[row, -1] <= w_coll
    rows_out = [row]
    for j in range(cols - 1, 0, -1):
        row = pre[row, j]
        rows_out.append(row)
    rows_out.reverse()
    dp_s = np.array([start_s + (j + 1) * sample_s for j in range(cols)])
    dp_l = np.array([l_of(r) for r in rows_out])
    return dp_s, dp_l, feasible


def corridor(
    dp_s, dp_l, obs_s, obs_l, obs_length=5.0, obs_width=5.0,
    halfwidth=10.0, offset=2,
):
    """Intended math of cal_lmin_lmax (path_planning.py:222-273), with quirk
    Q16 fixed to match planner/path_qp.py: the band covers the obstacle span
    and the offset only extends the exit side."""
    n = len(dp_s)
    lmin = -halfwidth * np.ones(n)
    lmax = halfwidth * np.ones(n)
    for os, ol in zip(obs_s, obs_l):
        i_min = int(np.argmin(np.abs(dp_s - (os - obs_length / 2))))
        i_max = int(np.argmin(np.abs(dp_s - (os + obs_length / 2)))) + offset
        i_ctr = int(np.argmin(np.abs(dp_s - os)))
        path_l = dp_l[i_ctr]
        for j in range(i_min, i_max + 1):
            if j >= n:
                continue
            if path_l < ol:
                lmax[j] = min(lmax[j], ol - obs_width / 2)
            else:
                lmin[j] = max(lmin[j], ol + obs_width / 2)
    return lmin, lmax


def path_qp_scipy(
    l_min, l_max, start_l, start_dl, start_ddl, ds,
    w_l=1000.0, w_dl=10000.0, w_ddl=3000.0, w_dddl=150.0, w_centre=250.0,
    w_end_l=40.0, w_end_dl=40.0, w_end_ddl=40.0,
    d1=3.0, d2=3.0, host_w=3.0, w_slack=1e4,
):
    """Float64 solution of the piecewise-jerk path QP via scipy trust-constr
    (intended math: true ds, active dl cost, soft corridor with penalized
    per-station slacks matching planner/path_qp.py — the hard-constrained
    variant goes infeasible mid-avoidance)."""
    from scipy.optimize import minimize

    n = len(l_min)
    nv = 3 * n

    P = np.zeros((nv, nv))
    for i in range(n):
        P[3 * i, 3 * i] += w_l + w_centre
        P[3 * i + 1, 3 * i + 1] += w_dl
        P[3 * i + 2, 3 * i + 2] += w_ddl
    for i in range(n - 1):
        a, b = 3 * i + 2, 3 * i + 5
        P[a, a] += w_dddl
        P[b, b] += w_dddl
        P[a, b] -= w_dddl
        P[b, a] -= w_dddl
    P[nv - 3, nv - 3] += w_end_l
    P[nv - 2, nv - 2] += w_end_dl
    P[nv - 1, nv - 1] += w_end_ddl
    P *= 2.0

    centre = 0.5 * (np.asarray(l_min) + np.asarray(l_max))
    q = np.zeros(nv)
    q[0::3] = -2.0 * w_centre * centre

    A_eq = np.zeros((2 * (n - 1) + 6, nv))
    b_eq = np.zeros(2 * (n - 1) + 6)
    for i in range(n - 1):
        A_eq[2 * i, 3 * i : 3 * i + 6] = [1, ds, ds**2 / 3, -1, 0, ds**2 / 6]
        A_eq[2 * i + 1, 3 * i : 3 * i + 6] = [0, 1, ds / 2, 0, -1, ds / 2]
    base = 2 * (n - 1)
    for k in range(3):
        A_eq[base + k, k] = 1.0
        A_eq[base + 3 + k, nv - 3 + k] = 1.0
    b_eq[base : base + 3] = [start_l, start_dl, start_ddl]

    rows_in = []
    b_in = []
    fi = int(np.ceil(d1 / ds))
    bi = int(np.ceil(d2 / ds))
    # 4 distinct corner rows/station (the reference's 8 come in pairs with
    # identical lhs and shared slack, differing -+hw in the bound — the
    # looser of each pair is implied; mirrored in planner/path_qp.py)
    sub = np.array(
        [
            [1, d1, 0], [1, -d2, 0], [-1, -d1, 0], [-1, d2, 0],
        ]
    )
    hw = host_w / 2
    for i in range(n):
        i1 = min(i + fi, n - 1)
        i2 = max(i - bi, 0)
        bs = [
            l_max[i1] - hw, l_max[i1] - hw,
            -l_min[i2] - hw, -l_min[i2] - hw,
        ]
        for r in range(4):
            row = np.zeros(nv)
            row[3 * i : 3 * i + 3] = sub[r]
            rows_in.append(row)
            b_in.append(bs[r])
    A_in = np.array(rows_in)
    b_in = np.array(b_in)

    # soft corridor: widen to [x; slack], corner rows get -slack_i, slack >= 0
    n_total = nv + n
    P2 = np.zeros((n_total, n_total))
    P2[:nv, :nv] = P
    for i in range(n):
        P2[nv + i, nv + i] = 2.0 * w_slack
    q2 = np.concatenate([q, np.zeros(n)])
    A_eq2 = np.zeros((A_eq.shape[0], n_total))
    A_eq2[:, :nv] = A_eq
    A_in2 = np.zeros((A_in.shape[0], n_total))
    A_in2[:, :nv] = A_in
    for i in range(n):
        A_in2[4 * i : 4 * i + 4, nv + i] = -1.0
    bounds = [(None, None)] * nv + [(0.0, None)] * n

    from scipy.optimize import Bounds, LinearConstraint

    res = minimize(
        lambda x: 0.5 * x @ P2 @ x + q2 @ x,
        np.zeros(n_total),
        jac=lambda x: P2 @ x + q2,
        hess=lambda x: P2,
        constraints=[
            LinearConstraint(A_eq2, b_eq, b_eq),
            LinearConstraint(A_in2, -np.inf, b_in),
        ],
        bounds=Bounds(
            np.array([-np.inf] * nv + [0.0] * n),
            np.array([np.inf] * n_total),
        ),
        method="trust-constr",
        options={"maxiter": 1000, "gtol": 1e-10, "xtol": 1e-12},
    )
    return res.x[0:nv:3], res.x[1:nv:3], res.x[2:nv:3], res.status in (1, 2)
