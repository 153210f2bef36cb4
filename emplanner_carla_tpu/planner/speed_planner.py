"""S-T speed planning: ST graph -> DP -> convex space -> QP -> densify.

Rebuild of ``/root/reference/planner/speed_planning_test.py`` (the
reference's only CARLA-free module, SURVEY.md §4; its closed-loop driver
``test_10.py`` crashes before this pipeline ever runs — quirk Q10 — so the
standalone functions are the parity target and this module is the first
place the speed pipeline actually closes the loop).

TPU-native shape:
* the ST graph is a masked (K,) segment set, not NaN-padded arrays;
* the 40x16 speed DP is a 16-step ``lax.scan`` whose per-column work is a
  (40 prev x 40 cur) cost tensor: the obstacle term (5 edge samples x K
  segments) is precomputed for all columns in one tensor op, and only the
  acceleration term (which depends on the carried best-arrival-speed table,
  ``speed_planning_test.py:120``) lives inside the scan;
* the speed QP always solves the full 16-column horizon with dt = t_step,
  so every constraint/cost matrix is a trace-time constant (the reference
  re-sizes the QP to the DP's early-exit length, ``:414-433``, purely to
  truncate — here truncation is a bound: columns past the DP horizon keep
  s <= s_max).

Quirk handling (SURVEY.md §7.4): Q4 (dp_speed_t aliases dp_speed_s) is
structural nonsense that disappears; Q5 (edge samples offset one step
before the edge) fixed — samples span [t_start, t_end]; Q6 (speed QP bounds
computed but never passed to cvxopt) fixed — the convex-space bounds
actually constrain the QP.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from emplanner_carla_tpu.config import SpeedPlanConfig
from emplanner_carla_tpu.ops import interp as interp_ops
from emplanner_carla_tpu.ops import qp
from emplanner_carla_tpu.types import Array, STSegments

BIG = 1e8


def speed_plan_start(vx: Array, vy: Array, ax: Array, ay: Array, heading: Array):
    """Project world velocity/accel onto the path tangent
    (= ``calc_speed_planning_start_condition``, ``speed_planning_test.py:23``)."""
    tx, ty = jnp.cos(heading), jnp.sin(heading)
    return vx * tx + vy * ty, ax * tx + ay * ty


@partial(jax.jit, static_argnames=("cfg",))
def st_graph(
    obs_s: Array,
    obs_l: Array,
    obs_s_dot: Array,
    obs_l_dot: Array,
    valid: Array,
    cfg: SpeedPlanConfig,
) -> STSegments:
    """Dynamic obstacles -> S-T occupancy segments
    (= ``generate_st_graph``, ``speed_planning_test.py:38-98``).

    Obstacles moving laterally slower than l_dot_gate are skipped (virtual
    obstacles handle them on the path side); each crossing obstacle
    contributes the segment between entering and leaving the |l| <=
    lateral_gate band under constant velocity, gated to the [t_min_gate,
    t_max_gate] window.
    """
    crossing = jnp.abs(obs_l_dot) >= cfg.l_dot_gate
    l_dot_safe = jnp.where(crossing, obs_l_dot, 1.0)
    t_zero = -obs_l / l_dot_safe
    t_b1 = cfg.lateral_gate / l_dot_safe + t_zero
    t_b2 = -cfg.lateral_gate / l_dot_safe + t_zero
    t_max = jnp.maximum(t_b1, t_b2)
    t_min = jnp.minimum(t_b1, t_b2)
    in_window = (t_max >= cfg.t_min_gate) & (t_min <= cfg.t_max_gate)
    already_in = (t_min < 0.0) & (t_max > 0.0)
    t_in = jnp.where(already_in, 0.0, t_min)
    s_in = obs_s + obs_s_dot * t_in
    s_out = obs_s + obs_s_dot * t_max
    keep = valid & crossing & in_window
    return STSegments(s_in, s_out, t_in, t_max, keep)


def _seg_distance(s: Array, t: Array, seg: STSegments):
    """Min distance from (s, t) points to each obstacle segment
    (``speed_planning_test.py:256-268``). s, t: (...,); returns (..., K).

    Arranged so only ONE sqrt runs per (sample, segment): the endpoint /
    perpendicular selection happens on *squared* distances and the root is
    taken of the selected value (the original 3-sqrt form measured ~25% of
    the whole speed-DP cost — this tensor is the full-EM cycle's hottest
    elementwise op)."""
    v1s = seg.s_in - s[..., None]
    v1t = seg.t_in - t[..., None]
    v2s = seg.s_out - s[..., None]
    v2t = seg.t_out - t[..., None]
    v3s = v2s - v1s
    v3t = v2t - v1t
    d1_sq = v1s**2 + v1t**2
    d2_sq = v2s**2 + v2t**2
    nrm_sq = v3s**2 + v3t**2 + 1e-24
    cross = v1s * v3t - v1t * v3s
    # reciprocal-multiply: 1/nrm_sq has the (small) segment shape, so XLA
    # hoists it instead of dividing at the full sample-tensor shape
    d_perp_sq = cross * cross * (1.0 / nrm_sq)
    p1 = v1s * v3s + v1t * v3t
    p2 = v2s * v3s + v2t * v3t
    endpoint = (p1 > 0) == (p2 > 0)
    d_sq = jnp.where(endpoint, jnp.minimum(d1_sq, d2_sq), d_perp_sq)
    return jnp.sqrt(d_sq)


def _edge_obs_tensors(seg: STSegments, cfg: SpeedPlanConfig):
    """Obstacle cost of every DP edge: (obs0 (n_s,), obs_tr (n_t-1, n_s, n_s)).

    The dense form — m samples on each of (n_t-1) x n_s x n_s transition
    edges x K segments — is the full-EM cycle's single hottest tensor
    (~32 ms of a 69 ms cycle at batch 4096). Three exact reductions cut the
    distance-evaluation count to ~30%:

    * the q = 0 sample of edge (k, j) is (s_k, t_start) — identical for all
      j; the q = m-1 sample is (s_j, t_end) — identical for all k. Both
      collapse from n_s^2 to n_s evaluations per column and enter the edge
      tensor as rank-1 broadcasts (m sample tensors -> m-2);
    * interior samples stay DENSE over all (k, j) pairs: evaluating only
      the forward triangle (k <= j, 820 of 1600 pairs — reverse edges are
      priced BIG in the DP regardless) and scattering back measured
      *slower* (19.4 vs 16.0 ms/batch-4096) — the TPU scatter costs more
      than the spare evaluations it avoids.

    Shared by the unbatched XLA DP and the Pallas feeder
    (``ops/speed_dp_pallas.speed_dp_batched``) so both paths stay
    numerically identical.
    """
    n_s, n_t, m = cfg.n_s, cfg.n_t, cfg.n_edge_samples
    s_grid = jnp.asarray(cfg.s_grid, jnp.float32)
    t_grid = (jnp.arange(n_t, dtype=jnp.float32) + 1.0) * cfg.t_step
    dt = cfg.t_step
    frac = jnp.arange(m, dtype=jnp.float32) / (m - 1)  # [0, 1] (Q5 fixed)

    def masked_cost(d):
        return jnp.where(seg.valid, _collision_cost(d, cfg), 0.0)

    # NB: sample coordinates are broadcast to their full shapes explicitly —
    # measured FASTER (21.8 vs 32.4 ms/batch-4096 on v5e) than handing
    # _seg_distance pre-broadcast small shapes, which steers XLA into a
    # worse fusion/tiling choice for the same op count.

    # start edges (origin -> (s_j, t_0)): points (s_j*frac, t_0*frac)
    d0 = _seg_distance(
        s_grid[:, None] * frac[None, :],
        jnp.broadcast_to(t_grid[0] * frac[None, :], (n_s, m)),
        seg,
    )
    obs0 = jnp.sum(masked_cost(d0), axis=(-2, -1))  # (n_s,)

    t_start = t_grid[:-1]  # (n_t-1,)

    # piece A — q=0 samples (s_k, t_start_i): (n_t-1, n_s)
    dA = _seg_distance(
        jnp.broadcast_to(s_grid[None, :], (n_t - 1, n_s)),
        jnp.broadcast_to(t_start[:, None], (n_t - 1, n_s)),
        seg,
    )
    costA = jnp.sum(masked_cost(dA), axis=-1)
    # piece B — q=m-1 samples (s_j, t_start_i + dt): (n_t-1, n_s)
    dB = _seg_distance(
        jnp.broadcast_to(s_grid[None, :], (n_t - 1, n_s)),
        jnp.broadcast_to(t_start[:, None] + dt, (n_t - 1, n_s)),
        seg,
    )
    costB = jnp.sum(masked_cost(dB), axis=-1)
    obs_tr = costA[:, :, None] + costB[:, None, :]  # (n_t-1, k, j)

    if m > 2:
        # Interior samples, hand-hoisted: the sample time depends only on
        # (column, fraction) and the segment geometry only on K, so every
        # t-only / segment-only subexpression of the point-segment distance
        # is precomputed at (n_t-1, m-2, K) and enters the full-shape loop
        # as an explicit broadcast — 16 full-shape ops instead of ~25
        # (measured 14.1 -> 11.3 ms/batch-4096 vs calling _seg_distance on
        # broadcast coordinates).
        K = seg.valid.shape[-1]
        fm = frac[1:-1]  # (m-2,) interior fractions
        FULL = (n_t - 1, n_s, n_s, m - 2, K)
        t_p = t_start[:, None, None] + dt * fm[None, :, None]  # (col, q, 1)
        v1t = seg.t_in - t_p                                   # (col, q, K)
        v2t = seg.t_out - t_p
        v3s = seg.s_out - seg.s_in                             # (K,)
        v3t = seg.t_out - seg.t_in
        nrm = v3s**2 + v3t**2 + 1e-24
        inv = 1.0 / nrm
        c1 = v1t * v1t
        c2 = v2t * v2t
        c3 = v1t * v3s   # cross's t-term
        c4 = v1t * v3t   # p1's t-term
        s_mid = s_grid[:, None, None] + (
            s_grid[None, :, None] - s_grid[:, None, None]
        ) * fm[None, None, :]  # (k, j, m-2)
        v1s = jnp.broadcast_to(
            seg.s_in - s_mid[None, :, :, :, None], FULL
        )
        bc = lambda a: jnp.broadcast_to(a[:, None, None, :, :], FULL)
        d1_sq = v1s * v1s + bc(c1)
        v2s = v1s + v3s
        d2_sq = v2s * v2s + bc(c2)
        cross = v1s * v3t - bc(c3)
        d_perp_sq = cross * cross * inv
        p1 = v1s * v3s + bc(c4)
        p2 = p1 + nrm
        endpoint = (p1 > 0) == (p2 > 0)
        d_sq = jnp.where(endpoint, jnp.minimum(d1_sq, d2_sq), d_perp_sq)
        dC = jnp.sqrt(d_sq)
        costC = jnp.sum(masked_cost(dC), axis=(-2, -1))  # (n_t-1, k, j)
        obs_tr = obs_tr + costC
    return obs0, obs_tr


def _collision_cost(d: Array, cfg: SpeedPlanConfig) -> Array:
    """w_obs below collision_dist; w_obs^(1.5 - d) in the danger band
    (= ``CalcCollisionCost``, ``speed_planning_test.py:274-284``)."""
    log_w = jnp.log(cfg.w_obs)
    band = jnp.exp(log_w * (cfg.obs_collision_dist + 1.0 - d))
    return jnp.where(
        d < cfg.obs_collision_dist,
        cfg.w_obs,
        jnp.where(d < cfg.obs_danger_dist, band, 0.0),
    )


class SpeedDPResult(NamedTuple):
    s: Array        # (n_t,) chosen s per t column
    t: Array        # (n_t,) column times
    valid: Array    # (n_t,) columns up to the DP terminal column
    end_index: Array  # terminal column index (int32)


@partial(jax.jit, static_argnames=("cfg",))
def speed_dp(
    seg: STSegments, plan_start_s_dot: Array, cfg: SpeedPlanConfig
) -> SpeedDPResult:
    """Speed decision DP over the (40 s x 16 t) lattice
    (= ``speed_DP``, ``speed_planning_test.py:101-188``).

    Unbatched calls run the XLA scan below; under ``vmap`` a
    ``jax.custom_vmap`` rule dispatches TPU batches that fill whole lane
    registers to the Pallas batch-in-lanes kernel
    (``ops/speed_dp_pallas.py``) — this is how the kernel sits on the
    ``simulate_full`` hot path without changing any call site.
    """
    return _speed_dp_dispatch(cfg)(seg, plan_start_s_dot)


@lru_cache(maxsize=None)
def _speed_dp_dispatch(cfg: SpeedPlanConfig):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(seg, v0):
        return _speed_dp_xla(seg, v0, cfg)

    @f.def_vmap
    def rule(axis_size, in_batched, seg, v0):
        from emplanner_carla_tpu.ops import speed_dp_pallas

        seg_b, v0_b = in_batched

        def bcast(a, was):
            return a if was else jnp.broadcast_to(a, (axis_size,) + a.shape)

        seg = jax.tree.map(bcast, seg, seg_b)
        v0 = bcast(v0, v0_b)
        use_pallas = (
            jax.default_backend() == "tpu"
            and axis_size % speed_dp_pallas.BLK == 0
        )
        if use_pallas:
            out = speed_dp_pallas.speed_dp_batched(seg, v0, cfg)
        else:
            out = jax.vmap(lambda s, v: _speed_dp_xla(s, v, cfg))(seg, v0)
        return out, SpeedDPResult(True, True, True, True)

    return f


def _speed_dp_xla(
    seg: STSegments, plan_start_s_dot: Array, cfg: SpeedPlanConfig
) -> SpeedDPResult:
    """The unbatched XLA scan implementation.

    Internally rows are s ascending (the reference's row 0 = s_max
    convention, ``CalcSTCoordinate:287``, is an indexing detail its outputs
    undo). Termination picks the min cost over the last column and the
    s_max row of every column (``:162-172``); ties at equal cost resolve to
    the largest t (the reference's <= scans keep the last minimum).
    """
    s_grid = jnp.asarray(cfg.s_grid, jnp.float32)  # (n_s,) ascending
    n_s, n_t = cfg.n_s, cfg.n_t
    t_grid = (jnp.arange(n_t, dtype=jnp.float32) + 1.0) * cfg.t_step
    dt = cfg.t_step

    # --- edge-independent obstacle+speed cost, all columns at once ---
    # (endpoint/forward-triangle decomposition — see _edge_obs_tensors)
    obs0, obs_tr = _edge_obs_tensors(seg, cfg)
    v0 = s_grid / t_grid[0]
    ref0 = cfg.w_ref_speed * (v0 - cfg.reference_speed) ** 2
    a0 = (v0 - plan_start_s_dot) / t_grid[0]
    acc0 = jnp.where(
        (a0 < cfg.accel_max) & (a0 > cfg.accel_min),
        cfg.w_accel * a0**2,
        cfg.accel_penalty * cfg.w_accel * a0**2,
    )
    cost0 = obs0 + ref0 + acc0

    dv = (s_grid[None, :] - s_grid[:, None]) / dt  # (prev, cur) edge speed
    ref_tr = cfg.w_ref_speed * (dv - cfg.reference_speed) ** 2
    # reverse edges (s decreasing) are physically invalid; the reference
    # prices them via the huge accel penalty — mask them out directly
    forbidden = dv < 0.0
    static_tr = obs_tr + ref_tr[None, :, :] + jnp.where(forbidden, BIG, 0.0)

    def column(carry, inp):
        cost_prev, sdot_prev = carry
        col_static = inp  # (n_s, n_s)
        accel = (dv - sdot_prev[:, None]) / dt
        acc_cost = jnp.where(
            (accel < cfg.accel_max) & (accel > cfg.accel_min),
            cfg.w_accel * accel**2,
            cfg.accel_penalty * cfg.w_accel * accel**2,
        )
        total = cost_prev[:, None] + col_static + acc_cost
        best_prev = jnp.argmin(total, axis=0).astype(jnp.int32)
        cost_new = jnp.min(total, axis=0)
        sdot_new = dv[best_prev, jnp.arange(n_s)]
        return (cost_new, sdot_new), (cost_new, best_prev)

    (cost_last, _), (costs, argmins) = jax.lax.scan(
        column, (cost0, v0), static_tr
    )
    all_costs = jnp.concatenate([cost0[None], costs])  # (n_t, n_s)

    # --- termination: right column vs s_max row (<= keeps later/larger t) ---
    best_right = jnp.argmin(all_costs[-1]).astype(jnp.int32)
    right_cost = all_costs[-1, best_right]
    top_costs = all_costs[:, -1]  # s_max row per column
    best_top_col = (
        n_t - 1 - jnp.argmin(top_costs[::-1]).astype(jnp.int32)
    )  # last minimum
    top_cost = top_costs[best_top_col]
    use_top = top_cost <= right_cost
    end_col = jnp.where(use_top, best_top_col, n_t - 1)
    end_row = jnp.where(use_top, n_s - 1, best_right)

    # --- backtrack (argmins[c] maps column c+1 rows -> column c rows) ---
    # walk from end_col down to 0; for columns beyond end_col emit invalid
    def emit(carry, c):
        row = carry
        on = c <= end_col
        this_row = jnp.where(c == end_col, end_row, row)
        prev_row = jnp.where(
            (c > 0) & on, argmins[jnp.maximum(c - 1, 0)][this_row], this_row
        )
        return prev_row, jnp.where(on, this_row, -1)

    _, rows_rev = jax.lax.scan(
        emit, end_row, jnp.arange(n_t - 1, -1, -1, dtype=jnp.int32)
    )
    rows = rows_rev[::-1]
    valid = jnp.arange(n_t) <= end_col
    s_out = jnp.where(valid, s_grid[jnp.maximum(rows, 0)], 0.0)
    return SpeedDPResult(s_out, t_grid, valid, end_col)


@partial(jax.jit, static_argnames=("cfg",))
def convex_space(
    dp: SpeedDPResult,
    seg: STSegments,
    path_s: Array,
    path_kappa: Array,
    cfg: SpeedPlanConfig,
):
    """Bounds (s_lb, s_ub, s_dot_lb, s_dot_ub) for the speed QP
    (= ``generate_convex_space``, ``speed_planning_test.py:308-400``).

    s_dot_ub = sqrt(a_lat_max / |kappa(s)|) at the DP stations; per obstacle
    the DP decision (dp_s vs the obstacle line at its mid time) either caps
    s_ub (yield) or raises s_lb (overtake) along the segment's line over the
    buffered t-index window [t_lb-2 (floor 3), t_ub+2].
    """
    n_t = cfg.n_t
    s_lb = jnp.zeros(n_t)
    s_ub = jnp.full(n_t, BIG)
    kappa_at = interp_ops.interp(dp.s, path_s, jnp.abs(path_kappa))
    s_dot_ub = jnp.sqrt(cfg.max_lateral_accel / (kappa_at + 1e-10))
    s_dot_ub = jnp.where(dp.valid, s_dot_ub, BIG)
    s_dot_lb = jnp.zeros(n_t)
    # Columns past the DP end stay unconstrained: the DP only ends early by
    # reaching the top of its s grid (free flow beyond), and capping the
    # remaining horizon at the grid top would make the QP — a global
    # optimization — decelerate from t = 0 to satisfy s(T) <= s_grid_max
    # (observed: ~23 km/h mean instead of 50). The reference avoids the
    # issue by truncating the QP horizon to the DP's end time
    # (``speed_planning_test.py:428-433``); an unconstrained tail is the
    # fixed-shape equivalent, and the merge masks samples beyond the
    # physical path end.

    # per-obstacle decision at the segment's mid time
    obs_t = 0.5 * (seg.t_in + seg.t_out)
    obs_s = 0.5 * (seg.s_in + seg.s_out)
    denom = jnp.where(
        jnp.abs(seg.t_out - seg.t_in) < 1e-6, 1.0, seg.t_out - seg.t_in
    )
    obs_speed = (seg.s_out - seg.s_in) / denom
    # hold the last valid DP s for columns past the DP end so the interp
    # stays monotone (invalid slots carry 0)
    s_end_val = dp.s[dp.end_index]
    dp_s_clean = jnp.where(dp.valid, dp.s, s_end_val)
    dp_s_full = jnp.concatenate([jnp.zeros(1), dp_s_clean])
    # dp_t_full is the uniform grid i * t_step -> closed-form hat weights
    w_obs = interp_ops.uniform_hat(obs_t, 0.0, cfg.t_step, n_t + 1)
    dp_s_at_obs = jnp.sum(w_obs * dp_s_full, axis=-1)
    yield_to = obs_s > dp_s_at_obs  # (K,)

    # t-index window with the reference's +-2 buffer, floor 3, cap dp end
    col = jnp.arange(n_t)
    t_lb_idx = jnp.sum((dp.t[None, :] <= seg.t_in[:, None]), axis=1) - 1
    t_lb_idx = jnp.clip(t_lb_idx, 0, n_t - 1)
    t_ub_idx = jnp.sum((dp.t[None, :] <= seg.t_out[:, None]), axis=1) - 1
    t_ub_idx = jnp.clip(t_ub_idx, 0, n_t - 1)
    t_lb_idx = jnp.maximum(t_lb_idx - 2, 3)
    t_ub_idx = jnp.minimum(t_ub_idx + 2, dp.end_index)
    in_win = (col[None, :] >= t_lb_idx[:, None]) & (
        col[None, :] <= t_ub_idx[:, None]
    ) & seg.valid[:, None]

    line_s = seg.s_in[:, None] + obs_speed[:, None] * (
        dp.t[None, :] - seg.t_in[:, None]
    )  # (K, n_t)
    ub_cand = jnp.where(in_win & yield_to[:, None], line_s, BIG)
    lb_cand = jnp.where(in_win & ~yield_to[:, None], line_s, -BIG)
    s_ub = jnp.minimum(s_ub, jnp.min(ub_cand, axis=0))
    s_lb = jnp.maximum(s_lb, jnp.max(lb_cand, axis=0))
    return s_lb, s_ub, s_dot_lb, s_dot_ub


def _speed_qp_constants(cfg: SpeedPlanConfig):
    """Trace-time constant P and A for the full-horizon speed QP."""
    n = cfg.n_t + 1  # knots incl. the start
    nv = 3 * n
    dt = cfg.t_step

    P = np.zeros((nv, nv))
    for i in range(n):
        P[3 * i + 1, 3 * i + 1] += cfg.w_qp_v_ref
        P[3 * i + 2, 3 * i + 2] += cfg.w_qp_s_dot2
    for i in range(n - 1):
        a, b = 3 * i + 2, 3 * i + 5
        P[a, a] += cfg.w_qp_jerk
        P[b, b] += cfg.w_qp_jerk
        P[a, b] -= cfg.w_qp_jerk
        P[b, a] -= cfg.w_qp_jerk
    P *= 2.0

    # piecewise-jerk continuity (speed_planning_test.py:444-452)
    Aeq = np.zeros((2 * (n - 1), nv))
    for i in range(n - 1):
        Aeq[2 * i, 3 * i : 3 * i + 6] = [1, dt, dt**2 / 3, -1, 0, dt**2 / 6]
        Aeq[2 * i + 1, 3 * i : 3 * i + 6] = [0, 1, dt / 2, 0, -1, dt / 2]
    # no reverse: s_i - s_{i+1} <= 0 (speed_planning_test.py:455-461)
    A_mono = np.zeros((n - 1, nv))
    for i in range(n - 1):
        A_mono[i, 3 * i] = 1.0
        A_mono[i, 3 * i + 3] = -1.0
    # per-variable box rows (identity) — convex space, accel box, start pin
    A_box = np.eye(nv)
    A = np.concatenate([Aeq, A_mono, A_box])
    eq_mask = np.zeros(A.shape[0], bool)
    eq_mask[: 2 * (n - 1)] = True                    # continuity
    base = 2 * (n - 1) + (n - 1)
    eq_mask[base : base + 3] = True                  # start-state pin rows
    return P.astype(np.float32), A.astype(np.float32), eq_mask


@lru_cache(maxsize=None)
def _speed_solver(cfg: SpeedPlanConfig, warm: bool = False):
    P_np, A_np, eq_mask = _speed_qp_constants(cfg)
    n = cfg.n_t + 1
    q_typ = np.zeros(3 * n)
    q_typ[1::3] = -2.0 * cfg.w_qp_v_ref * cfg.reference_speed
    return qp.make_prefactored_qp(
        P_np, A_np, eq_mask, q_typical=q_typ,
        iters_per_phase=max(2 * cfg.admm_iters // 3, 60),
        warm=warm,
        warm_iters_per_phase=max(cfg.warm_admm_iters // 3, 1),
        kernel_matmul=cfg.warm_kernel_matmul,
    )


def warm_state_init(cfg: SpeedPlanConfig):
    """Zero ADMM state for the speed QP (seed for the first cycle)."""
    n = cfg.n_t + 1
    nv = 3 * n
    m = 2 * (n - 1) + (n - 1) + nv  # continuity + no-reverse + box rows
    return qp.warm_zero_state(nv, m)


@partial(jax.jit, static_argnames=("cfg",))
def speed_qp(
    plan_start_s_dot: Array,
    plan_start_s_dot2: Array,
    s_lb: Array,
    s_ub: Array,
    s_dot_lb: Array,
    s_dot_ub: Array,
    cfg: SpeedPlanConfig,
    warm_state=None,
):
    """Smooth s(t) inside the convex space (= ``speed_QP``,
    ``speed_planning_test.py:403-511``; quirk Q6 fixed — the bounds are
    real constraints here). Returns (s, s_dot, s_dot2, t) over the full
    horizon (n_t + 1 knots at dt = t_step).

    Feasibility guard: the curvature / yield caps can demand a harder brake
    than ``accel_min`` allows from the *pinned* start state (observed when
    entering a tight avoidance swerve fast), making the QP infeasible — and
    an infeasible QP turns every solver's output into an arbitrary
    least-infeasible point (the f32 ADMM and the f64 oracle then disagree
    by m/s). The caps are relaxed to the reachable max-braking envelope
    (and the floors to the max-acceleration envelope): brake-at-the-limit
    is the only physical answer to an unreachable cap, and it keeps the
    feasible set non-empty for both solvers.
    """
    n = cfg.n_t + 1
    nv = 3 * n
    warm = warm_state is not None
    solve = _speed_solver(cfg, warm)

    dt = cfg.t_step
    margin = 1e-2

    def envelope(a_limit):
        # exact discrete reachable extreme under the QP's own continuity
        # model: v_{i+1} = v_i + dt/2 (a_i + a_{i+1}),
        # s_{i+1} = s_i + dt v_i + dt^2/3 a_i + dt^2/6 a_{i+1},
        # with a chosen at the limit but keeping v >= 0 (braking side)
        def step(carry, _):
            s_i, v_i, a_i = carry
            a_next = a_limit
            if a_limit < 0.0:
                a_next = jnp.maximum(a_limit, -2.0 * v_i / dt - a_i)
            a_next = jnp.asarray(a_next, jnp.float32)
            v_next = jnp.maximum(v_i + dt * 0.5 * (a_i + a_next), 0.0)
            s_next = s_i + dt * v_i + dt * dt / 3.0 * a_i + dt * dt / 6.0 * a_next
            return (s_next, v_next, a_next), (s_next, v_next)

        init = (
            jnp.zeros((), jnp.float32),
            jnp.maximum(plan_start_s_dot, 0.0),
            plan_start_s_dot2,
        )
        (_, _, _), (s_env, v_env) = jax.lax.scan(step, init, None, length=cfg.n_t)
        return s_env, v_env

    s_min_env, v_min_env = envelope(cfg.accel_min)
    s_max_env, v_max_env = envelope(cfg.accel_max)
    s_ub = jnp.maximum(s_ub, s_min_env + margin)
    s_dot_ub = jnp.maximum(s_dot_ub, v_min_env + margin)
    s_lb = jnp.minimum(s_lb, jnp.maximum(s_max_env - margin, 0.0))
    s_dot_lb = jnp.minimum(s_dot_lb, jnp.maximum(v_max_env - margin, 0.0))

    q = jnp.zeros(nv).at[1::3].set(-2.0 * cfg.w_qp_v_ref * cfg.reference_speed)

    lb = jnp.zeros(nv)
    ub = jnp.zeros(nv)
    lb = lb.at[0::3].set(jnp.concatenate([jnp.zeros(1), s_lb]))
    ub = ub.at[0::3].set(jnp.concatenate([jnp.zeros(1), s_ub]))
    lb = lb.at[1::3].set(jnp.concatenate([plan_start_s_dot[None], s_dot_lb]))
    ub = ub.at[1::3].set(jnp.concatenate([plan_start_s_dot[None], s_dot_ub]))
    lb = lb.at[2::3].set(
        jnp.concatenate([plan_start_s_dot2[None], jnp.full(n - 1, cfg.accel_min)])
    )
    ub = ub.at[2::3].set(
        jnp.concatenate([plan_start_s_dot2[None], jnp.full(n - 1, cfg.accel_max)])
    )

    n_eq = 2 * (n - 1)
    n_mono = n - 1
    l = jnp.concatenate([jnp.zeros(n_eq), jnp.full(n_mono, -BIG), lb])
    u = jnp.concatenate([jnp.zeros(n_eq), jnp.zeros(n_mono), ub])

    t = jnp.arange(n, dtype=jnp.float32) * cfg.t_step
    if warm:
        x, new_state = solve(q, l, u, warm_state)
        return x[0::3], x[1::3], x[2::3], t, new_state
    x = solve(q, l, u)
    return x[0::3], x[1::3], x[2::3], t


@partial(jax.jit, static_argnames=("cfg",))
def densify_speed(
    s: Array, s_dot: Array, s_dot2: Array, t: Array, cfg: SpeedPlanConfig
):
    """Densify the QP knots to n_dense points by exact piecewise-constant-
    jerk interpolation (= ``increase_points``,
    ``speed_planning_test.py:514-562``, with the reference's x^2
    approximations replaced by the exact cubic; its off-by-one sample at
    (i-1)*dt is quirk-family Q5 and is fixed).

    The QP's knot grid is uniform by construction (t_i = i * t_step — the
    contract of :func:`speed_qp`), so the dense sample times, bracket
    indices, and in-segment offsets are all compile-time constants, and the
    cubic evaluation folds into three constant Hermite-selector matrices —
    batched matvecs on the MXU. The previous formulation's traced
    ``linspace`` + dynamic gathers measured ~68 ms/batch-4096 on v5e for
    the speed channel alone (see ``ops/interp.py``)."""
    n_knots = s.shape[-1]
    dt = cfg.t_step
    nd = cfg.n_dense
    tq = np.linspace(0.0, (n_knots - 1) * dt, nd).astype(np.float32)
    j = np.clip((tq / dt).astype(np.int32), 0, n_knots - 2)
    x = tq - j * dt
    S = np.zeros((nd, n_knots), np.float32)
    S[np.arange(nd), j] = 1.0
    S1 = np.zeros((nd, n_knots), np.float32)
    S1[np.arange(nd), j + 1] = 1.0
    D = (S1 - S) / dt  # jerk = D @ s_dot2
    A_v = x[:, None] * S
    A_a = (0.5 * x**2)[:, None] * S + (x**3 / 6.0)[:, None] * D
    B_a = x[:, None] * S + (0.5 * x**2)[:, None] * D
    C_a = S + x[:, None] * D
    with jax.default_matmul_precision("highest"):
        sel = S @ s
        v_sel = S @ s_dot
        s_d = sel + A_v @ s_dot + A_a @ s_dot2
        v_d = v_sel + B_a @ s_dot2
        a_d = C_a @ s_dot2
    return s_d, v_d, a_d, jnp.asarray(tq)
