"""NumPy oracle for the Frenet core.

Independent, loop-based float64 implementations of the *intended* math of
``/root/reference/planner/planning_utils.py`` (quirks Q1/Q2 fixed — see
SURVEY.md §7.4). These are the golden references the JAX kernels are tested
against, replacing the reference's "watch CARLA debug draws" verification
strategy (SURVEY.md §4).

Deliberately written with explicit Python loops and scalar math so that a
vectorization bug in the JAX code cannot be mirrored here.
"""

from __future__ import annotations

import math

import numpy as np


def heading_kappa(xs, ys):
    """Midpoint-Euler theta/kappa (intended math of planning_utils.py:185)."""
    n = len(xs)
    dx_seg = [xs[i + 1] - xs[i] for i in range(n - 1)]
    dy_seg = [ys[i + 1] - ys[i] for i in range(n - 1)]
    theta = np.zeros(n)
    for i in range(n):
        dxp = dx_seg[max(i - 1, 0)]
        dxn = dx_seg[min(i, n - 2)]
        dyp = dy_seg[max(i - 1, 0)]
        dyn = dy_seg[min(i, n - 2)]
        theta[i] = math.atan2(0.5 * (dyp + dyn), 0.5 * (dxp + dxn))
    dth_seg = np.zeros(n - 1)
    for i in range(n - 1):
        d = theta[i + 1] - theta[i]
        dth_seg[i] = math.atan2(math.sin(d), math.cos(d))  # wrap
    kappa = np.zeros(n)
    for i in range(n):
        dthp = dth_seg[max(i - 1, 0)]
        dthn = dth_seg[min(i, n - 2)]
        dxp = dx_seg[max(i - 1, 0)]
        dxn = dx_seg[min(i, n - 2)]
        dyp = dy_seg[max(i - 1, 0)]
        dyn = dy_seg[min(i, n - 2)]
        ds = math.hypot(0.5 * (dxp + dxn), 0.5 * (dyp + dyn))
        kappa[i] = math.sin(0.5 * (dthp + dthn)) / (ds + 1e-12)
    return theta, kappa


def nearest_index(px, py, xs, ys):
    best, best_d = 0, float("inf")
    for i in range(len(xs)):
        d = (xs[i] - px) ** 2 + (ys[i] - py) ** 2
        if d < best_d:
            best_d = d
            best = i
    return best


def project(px, py, xs, ys, thetas, kappas, idx):
    xm, ym, tm, km = xs[idx], ys[idx], thetas[idx], kappas[idx]
    ds = (px - xm) * math.cos(tm) + (py - ym) * math.sin(tm)
    return (
        xm + ds * math.cos(tm),
        ym + ds * math.sin(tm),
        tm + km * ds,
        km,
        ds,
    )


def s_map_from_origin(xs, ys, thetas, kappas, ox, oy):
    n = len(xs)
    ref_s = np.zeros(n)
    for i in range(1, n):
        ref_s[i] = ref_s[i - 1] + math.hypot(xs[i] - xs[i - 1], ys[i] - ys[i - 1])
    idx = nearest_index(ox, oy, xs, ys)
    _, _, _, _, ds = project(ox, oy, xs, ys, thetas, kappas, idx)
    return ref_s - (ref_s[idx] + ds)


def cartesian_to_sl(pts, xs, ys, thetas, kappas, s_map):
    """Per-point match (quirk Q1 fixed)."""
    ss, ls = [], []
    for px, py in pts:
        idx = nearest_index(px, py, xs, ys)
        xr, yr, tr, _, ds = project(px, py, xs, ys, thetas, kappas, idx)
        ss.append(s_map[idx] + ds)
        ls.append(-(px - xr) * math.sin(tr) + (py - yr) * math.cos(tr))
    return np.array(ss), np.array(ls)


def frenet_state(px, py, vx, vy, ax, ay, xs, ys, thetas, kappas, s_map):
    """Intended math of cal_s_l_deri_fun (planning_utils.py:512-588)."""
    idx = nearest_index(px, py, xs, ys)
    xr, yr, tr, kr, ds = project(px, py, xs, ys, thetas, kappas, idx)
    s = s_map[idx] + ds
    nx, ny = -math.sin(tr), math.cos(tr)
    tx, ty = math.cos(tr), math.sin(tr)
    l = (px - xr) * nx + (py - yr) * ny
    l_dot = vx * nx + vy * ny
    s_dot = (vx * tx + vy * ty) / (1 - kr * l)
    l_ddot = ax * nx + ay * ny - kr * (1 - kr * l) * s_dot**2
    l_prime = 0.0 if abs(s_dot) < 1e-6 else l_dot / s_dot
    s_ddot = (ax * tx + ay * ty + 2 * s_dot**2 * kr * l_prime) / (1 - kr * l)
    l_pprime = 0.0 if abs(s_dot) < 1e-6 else (l_ddot - l_prime * s_ddot) / s_dot**2
    return s, l, s_dot, l_dot, s_ddot, l_ddot, l_prime, l_pprime


def quintic_coeffs_abs(l0, dl0, ddl0, l1, dl1, ddl1, s0, s1):
    """The reference's absolute-s 6x6 solve (planning_utils.py:671-703),
    in float64 — used to validate the normalized Hermite basis."""
    A = np.array(
        [
            [1, s0, s0**2, s0**3, s0**4, s0**5],
            [0, 1, 2 * s0, 3 * s0**2, 4 * s0**3, 5 * s0**4],
            [0, 0, 2, 6 * s0, 12 * s0**2, 20 * s0**3],
            [1, s1, s1**2, s1**3, s1**4, s1**5],
            [0, 1, 2 * s1, 3 * s1**2, 4 * s1**3, 5 * s1**4],
            [0, 0, 2, 6 * s1, 12 * s1**2, 20 * s1**3],
        ],
        dtype=np.float64,
    )
    b = np.array([l0, dl0, ddl0, l1, dl1, ddl1], dtype=np.float64)
    return np.linalg.solve(A, b)


def quintic_eval_abs(c, s):
    l = c[0] + c[1] * s + c[2] * s**2 + c[3] * s**3 + c[4] * s**4 + c[5] * s**5
    dl = c[1] + 2 * c[2] * s + 3 * c[3] * s**2 + 4 * c[4] * s**3 + 5 * c[5] * s**4
    ddl = 2 * c[2] + 6 * c[3] * s + 12 * c[4] * s**2 + 20 * c[5] * s**3
    dddl = 6 * c[3] + 24 * c[4] * s + 60 * c[5] * s**2  # Q2 fixed: s**2
    return l, dl, ddl, dddl
