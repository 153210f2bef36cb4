"""Convex corridor + piecewise-jerk path QP (the EM path optimization step).

Rebuild of ``cal_lmin_lmax`` + ``Quadratic_planning``
(``/root/reference/planner/path_planning.py:78-273``).

Constraint/cost structure follows the reference exactly; the constant
matrices (continuity coupling, corner inequality pattern, Hessian blocks)
are built once at trace time with NumPy and baked into the compiled program,
so the per-scenario work is a single batched ADMM solve.

Documented reference quirks fixed here (beyond SURVEY.md §7.4's ledger):

* Q13 (new): the reference passes ``dp_sampling_res=2`` into the QP although
  the stations it feeds have been downsampled ``::2`` to 4 m spacing
  (``test_9.py:187-198``), so its continuity constraints integrate over the
  wrong ds. We use the true station spacing.
* Q14 (new): ``path_planning.py:193`` forms ``w_cost_dl * (H_DL.T @ H_L)``
  which is the zero matrix (the two selectors hit different diagonal slots),
  silently disabling the dl cost. We use the intended ``H_DL.T @ H_DL``.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from emplanner_carla_tpu.config import PathPlanConfig
from emplanner_carla_tpu.ops import qp
from emplanner_carla_tpu.types import Array

BIG = 1e8  # stand-in for the reference's +-1e5 free bounds (path_planning.py:145)


@partial(jax.jit, static_argnames=("cfg", "n"))
def corridor(
    dp_s: Array,
    dp_l: Array,
    obs_s: Array,
    obs_l: Array,
    obs_valid: Array,
    cfg: PathPlanConfig,
    n: int | None = None,
):
    """l bounds per DP station (= ``cal_lmin_lmax``, ``path_planning.py:222``).

    For each obstacle, the stations covering [obs_s - L/2, obs_s + L/2] are
    clamped on the side opposite the DP decision: dp_l < obs_l => pass on
    the smaller-l side => cap lmax at obs_l - W/2; otherwise raise lmin to
    obs_l + W/2.

    Quirk Q16 (new, beyond SURVEY §7.4's ledger): the reference shifts BOTH
    band indices by +2 stations (``path_planning.py:240-241``, the author's
    asymmetry fudge) — at coarser station spacing this moves the whole
    occlusion band downstream of the obstacle, leaving the obstacle's own
    span unconstrained in the QP (observed as corner-cutting collisions in
    closed loop). Here the band covers the obstacle span exactly and the
    offset only *extends* the exit side, which is what the author's comment
    says the fudge was for.
    """
    if n is None:
        n = dp_s.shape[-1]
    off = cfg.corridor_index_offset
    idx_min = jnp.argmin(
        jnp.abs(dp_s[None, :] - (obs_s - cfg.obs_length / 2)[:, None]), axis=-1
    )  # (K,)
    idx_max = (
        jnp.argmin(
            jnp.abs(dp_s[None, :] - (obs_s + cfg.obs_length / 2)[:, None]), axis=-1
        )
        + off
    )
    idx_ctr = jnp.argmin(jnp.abs(dp_s[None, :] - obs_s[:, None]), axis=-1)
    # one-hot contraction, not a per-lane gather (gather fusion measured
    # 0.67 ms/cycle at batch 4096)
    oh_ctr = idx_ctr[:, None] == jnp.arange(dp_s.shape[-1])[None, :]
    path_l_at_obs = jnp.sum(jnp.where(oh_ctr, dp_l[None, :], 0.0), axis=1)
    pass_low = path_l_at_obs < obs_l  # ego passes on the smaller-l side

    station = jnp.arange(n)
    in_range = (
        (station[None, :] >= idx_min[:, None])
        & (station[None, :] <= idx_max[:, None])
        & obs_valid[:, None]
    )  # (K, n)

    ub_cand = jnp.where(
        in_range & pass_low[:, None], obs_l[:, None] - cfg.obs_width / 2, BIG
    )
    lb_cand = jnp.where(
        in_range & ~pass_low[:, None], obs_l[:, None] + cfg.obs_width / 2, -BIG
    )
    l_max = jnp.minimum(cfg.corridor_halfwidth, jnp.min(ub_cand, axis=0))
    l_min = jnp.maximum(-cfg.corridor_halfwidth, jnp.max(lb_cand, axis=0))
    return l_min, l_max


def _qp_constants(n: int, ds: float, cfg: PathPlanConfig):
    """Constant P and A for the piecewise-jerk QP.

    Variables: x = [l, dl, ddl] x n stations followed by n corridor slacks.
    The corner constraints are *soft*: row r of station i reads
    (l +- d dl) - slack_i <= b_r, slack_i >= 0, with a quadratic penalty on
    slack. The reference's hard corridor (path_planning.py:115-142 + cvxopt)
    goes infeasible mid-avoidance whenever the pinned start state conflicts
    with the obstacle bounds — cvxopt then returns an unconverged iterate
    that the reference never checks; observed here as solver-dependent
    ~1 m path scatter. Softening makes the QP always feasible and strictly
    convex (unique optimum), which also makes the float64-oracle fidelity
    comparison well-posed.
    """
    nv = 3 * n

    # Hessian (path_planning.py:169-197, with Q14 fixed)
    P = np.zeros((nv, nv))
    for i in range(n):
        P[3 * i, 3 * i] += cfg.w_qp_l + cfg.w_qp_centre
        P[3 * i + 1, 3 * i + 1] += cfg.w_qp_dl
        P[3 * i + 2, 3 * i + 2] += cfg.w_qp_ddl
    # jerk: (ddl_{i+1} - ddl_i)^2 (reference does not divide by ds;
    # w_qp_dddl absorbs the scale — kept identical, path_planning.py:181-184)
    for i in range(n - 1):
        a, b = 3 * i + 2, 3 * i + 5
        P[a, a] += cfg.w_qp_dddl
        P[b, b] += cfg.w_qp_dddl
        P[a, b] -= cfg.w_qp_dddl
        P[b, a] -= cfg.w_qp_dddl
    P[3 * n - 3, 3 * n - 3] += cfg.w_qp_end_l
    P[3 * n - 2, 3 * n - 2] += cfg.w_qp_end_dl
    P[3 * n - 1, 3 * n - 1] += cfg.w_qp_end_ddl
    P = 2.0 * P  # reference's H = 2H to match 0.5 x'Hx form

    # piecewise-jerk continuity equalities (path_planning.py:106-112)
    Aeq = np.zeros((2 * (n - 1), nv))
    for i in range(n - 1):
        Aeq[2 * i, 3 * i : 3 * i + 6] = [1, ds, ds**2 / 3, -1, 0, ds**2 / 6]
        Aeq[2 * i + 1, 3 * i : 3 * i + 6] = [0, 1, ds / 2, 0, -1, ds / 2]

    n_total = nv + n  # + corridor slacks

    def widen(M):
        out = np.zeros((M.shape[0], n_total))
        out[:, :nv] = M
        return out

    P = widen(widen(P).T)
    for i in range(n):
        P[nv + i, nv + i] = 2.0 * cfg.w_slack
    Aeq = widen(Aeq)

    # corner inequalities (path_planning.py:115-142), softened. The
    # reference enumerates 8 rows per station, but its pairs (the two
    # vehicle edges +-host_w/2 against the same corridor bound) share the
    # identical lhs AND the station's shared slack, differing only by
    # -+hw in the bound — the looser row of each pair is implied by the
    # tighter one, in the hard form and in this soft form alike, so 4
    # distinct rows per station carry the identical feasible set and
    # optimum. Round 5: dropping the implied rows takes m 257 -> 165,
    # whose 128-multiple MXU padding is 256 instead of 384 — a third off
    # the warm Pallas kernel's per-iteration A-dots (the call-site bounds
    # keep the TIGHTER bound of each original pair).
    d1, d2 = cfg.host_d1, cfg.host_d2
    A_in = np.zeros((4 * n, n_total))
    A_sub = np.array(
        [
            [1, d1, 0],
            [1, -d2, 0],
            [-1, -d1, 0],
            [-1, d2, 0],
        ]
    )
    for i in range(n):
        A_in[4 * i : 4 * i + 4, 3 * i : 3 * i + 3] = A_sub
        A_in[4 * i : 4 * i + 4, nv + i] = -1.0  # shared slack per station

    # endpoint pinning rows (start state + zero end state,
    # path_planning.py:144-160) as equality rows on the first/last blocks
    A_pin = np.zeros((6, n_total))
    for k in range(3):
        A_pin[k, k] = 1.0
        A_pin[3 + k, nv - 3 + k] = 1.0

    # slack non-negativity rows
    A_sl = np.zeros((n, n_total))
    for i in range(n):
        A_sl[i, nv + i] = 1.0

    A = np.concatenate([Aeq, A_in, A_pin, A_sl])
    eq_mask = np.zeros(A.shape[0], bool)
    eq_mask[: 2 * (n - 1)] = True                  # continuity rows
    eq_mask[2 * (n - 1) + 4 * n : 2 * (n - 1) + 4 * n + 6] = True  # pins
    front_index = int(np.ceil(d1 / ds))
    back_index = int(np.ceil(d2 / ds))
    return (
        P.astype(np.float32),
        A.astype(np.float32),
        eq_mask,
        front_index,
        back_index,
    )


@lru_cache(maxsize=None)
def _solver_for(n: int, ds: float, cfg: PathPlanConfig, warm: bool = False):
    """Prefactored constant-matrix solver for this (n, ds, cfg) family."""
    P_np, A_np, eq_mask, front_index, back_index = _qp_constants(n, ds, cfg)
    q_typ = np.zeros(3 * n + n)  # [l, dl, ddl] x n + corridor slacks
    q_typ[0 : 3 * n : 3] = -2.0 * cfg.w_qp_centre * 2.0  # centre offsets ~ 2 m
    solve = qp.make_prefactored_qp(
        P_np, A_np, eq_mask, q_typical=q_typ,
        iters_per_phase=max(2 * cfg.admm_iters // 3, 60),
        warm=warm,
        warm_iters_per_phase=max(cfg.warm_admm_iters // 3, 1),
        kernel_matmul=cfg.warm_kernel_matmul,
    )
    return solve, front_index, back_index


def warm_state_init(n: int):
    """Zero ADMM state for the n-station path QP (seed for the first
    cycle's warm-started solve)."""
    n_var = 4 * n                       # [l, dl, ddl] x n + n slacks
    m = 2 * (n - 1) + 4 * n + 6 + n     # continuity + corners + pins + slack
    return qp.warm_zero_state(n_var, m)


@partial(jax.jit, static_argnames=("cfg", "n", "ds"))
def path_qp(
    l_min: Array,
    l_max: Array,
    plan_start_l: Array,
    plan_start_dl: Array,
    plan_start_ddl: Array,
    cfg: PathPlanConfig,
    ds: float,
    n: int | None = None,
    warm_state=None,
):
    """Smooth l(s) inside the corridor (= ``Quadratic_planning``,
    ``path_planning.py:78-219``).

    ds is the true station spacing (quirk Q13 fixed). Returns
    (l, dl, ddl) each (n,) — plus the new ADMM state when ``warm_state``
    is given (successive replan cycles solve near-identical problems;
    carrying the state across cycles lets the warm solve run
    ``cfg.warm_admm_iters`` total iterations instead of the cold ladder).

    Note on the corridor slacks (x[3n:]): they are part of the solution
    but deliberately NOT surfaced as a "tightness" signal — the shared
    corner slack runs 5-8 m during every NORMAL swerve because the
    front/back lookahead rows conflict across stations mid-transition
    (measured at batch 4096; a slack-derived speed cap was investigated
    and rejected, see CLAUDE.md round-3 notes).
    """
    if n is None:
        n = l_min.shape[-1]
    warm = warm_state is not None
    solve, front_index, back_index = _solver_for(n, ds, cfg, warm)
    nv = 3 * n

    # linear cost: centre-line attraction (path_planning.py:198-205)
    centre = 0.5 * (l_min + l_max)
    q = jnp.zeros(nv + n).at[0 : nv : 3].set(-2.0 * cfg.w_qp_centre * centre)

    # corner bounds: the front/rear lookahead station indices
    # (path_planning.py:127-142)
    i = jnp.arange(n)
    i_front = jnp.minimum(i + front_index, n - 1)
    i_back = jnp.maximum(i - back_index, 0)
    hw = cfg.host_w / 2
    # tighter bound of each original 8-row pair (see _qp_constants)
    b_sub = jnp.stack(
        [
            l_max[i_front] - hw,
            l_max[i_front] - hw,
            -l_min[i_back] - hw,
            -l_min[i_back] - hw,
        ],
        axis=-1,
    ).reshape(-1)  # (4n,)

    start = jnp.stack([plan_start_l, plan_start_dl, plan_start_ddl])
    end = jnp.zeros(3)
    u = jnp.concatenate(
        [jnp.zeros(2 * (n - 1)), b_sub, start, end, jnp.full(n, BIG)]
    )
    l = jnp.concatenate(
        [jnp.zeros(2 * (n - 1)), jnp.full(4 * n, -BIG), start, end,
         jnp.zeros(n)]
    )

    if warm:
        x, new_state = solve(q, l, u, warm_state)
        return x[0:nv:3], x[1:nv:3], x[2:nv:3], new_state
    x = solve(q, l, u)
    return x[0:nv:3], x[1:nv:3], x[2:nv:3]
