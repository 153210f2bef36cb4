"""Batched fixed-iteration QP solvers (the cvxopt replacement).

The reference calls cvxopt's adaptive interior-point solver at five sites
(reference-line smoother ``planning_utils.py:353``, path QP
``path_planning.py:211``, speed QP ``speed_planning_test.py:502``, MPC QP
``controller.py:309,961``). An adaptive IPM is data-dependent control flow —
hostile to XLA and impossible to ``vmap``. We replace all of them with two
fixed-iteration ADMM solvers (OSQP-style splitting):

* ``solve_box_qp`` — min 1/2 x'Hx + f'x  s.t.  lb <= x <= ub
  (reference-line smoother, MPC). The x-update solve is prefactored once.

* ``solve_qp`` — min 1/2 x'Px + q'x  s.t.  l <= Ax <= u, equalities encoded
  as l == u rows with a boosted per-row rho (OSQP's rho scaling). Used by the
  path and speed piecewise-jerk QPs.

Fixed iteration counts keep shapes/trip counts static so the solvers compile
once and ``vmap`` across thousands of scenario instances. Accuracy targets
the <= 5 cm trajectory-level fidelity bound of BASELINE.md; tests check KKT
residuals and compare against scipy reference solutions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from emplanner_carla_tpu.types import Array

__all__ = ["solve_box_qp", "solve_qp"]


@partial(jax.jit, static_argnames=("iters",))
def solve_box_qp(
    H: Array,
    f: Array,
    lb: Array,
    ub: Array,
    iters: int = 80,
    rho: float = 1.0,
) -> Array:
    """Box-constrained QP via ADMM with a prefactored x-update.

    H: (n, n) PSD; f, lb, ub: (n,). Returns the box-feasible iterate z.

    Splitting: x-step solves (H + rho I) x = rho (z - u) - f; z-step clips;
    u accumulates the residual. For fixed H the inverse is computed once per
    solve (n <= ~128 here, a trivial batched inverse on the MXU).
    """
    # TPU matmuls default to bf16 passes for f32 inputs; the solver's
    # inverse/iteration chain needs true f32 (bf16 was observed to NaN the
    # closed loop on TPU hardware).
    with jax.default_matmul_precision("highest"):
        n = f.shape[-1]
        dtype = f.dtype
        M = jnp.linalg.inv(H + rho * jnp.eye(n, dtype=dtype))

        def body(_, state):
            x, z, u = state
            x = M @ (rho * (z - u) - f)
            z = jnp.clip(x + u, lb, ub)
            u = u + x - z
            return x, z, u

        z0 = jnp.clip(jnp.zeros_like(f), lb, ub)
        x, z, u = jax.lax.fori_loop(
            0, iters, body, (z0, z0, jnp.zeros_like(f))
        )
        return z


def _polish(P, q, A, l, u, x, y, z, sigma):
    """OSQP-style solution polish: one exact KKT solve on the active set.

    Active rows are detected from the dual y (y > 0: upper bound active,
    y < 0: lower) plus all equality rows. Inactive rows are *zeroed out* of
    the constraint block (not pushed away with a large diagonal), which keeps
    the KKT matrix well-conditioned in float32; their multipliers solve to 0
    exactly via a unit diagonal.
    """
    n = q.shape[-1]
    m = l.shape[-1]
    dtype = q.dtype
    is_eq = jnp.abs(u - l) < 1e-9
    tol = 1e-6
    act_u = (y > tol) | is_eq
    act_l = (y < -tol) & ~is_eq
    act = act_u | act_l
    b = jnp.where(act_u, u, l)
    A_m = A * act[:, None].astype(dtype)
    D = jnp.where(act, sigma, 1.0).astype(dtype)
    K = jnp.block(
        [
            [P + sigma * jnp.eye(n, dtype=dtype), A_m.T],
            [A_m, -jnp.diag(D)],
        ]
    )
    rhs = jnp.concatenate([-q, jnp.where(act, b, 0.0)])
    sol = jnp.linalg.solve(K, rhs)
    # one refinement pass for f32
    sol = sol + jnp.linalg.solve(K, rhs - K @ sol)
    x_pol = sol[:n]
    # fall back to the ADMM iterate if the polish went bad (singular K)
    ok = jnp.all(jnp.isfinite(x_pol))
    # polish must not violate constraints more than the ADMM point did
    viol = lambda xx: jnp.max(
        jnp.maximum(A @ xx - u, 0.0) + jnp.maximum(l - A @ xx, 0.0)
    )
    ok = ok & (viol(x_pol) <= viol(x) + 1e-4)
    return jnp.where(ok, x_pol, x)


@partial(jax.jit, static_argnames=("iters", "rho_updates", "polish"))
def solve_qp(
    P: Array,
    q: Array,
    A: Array,
    l: Array,
    u: Array,
    iters: int = 120,
    rho: float = 1.0,
    sigma: float = 1e-6,
    rho_eq_scale: float = 1e3,
    alpha: float = 1.6,
    rho_updates: int = 4,
    polish: bool = True,
) -> Array:
    """General QP (OSQP splitting):  min 1/2 x'Px + q'x,  l <= Ax <= u.

    P: (n, n) PSD; q: (n,); A: (m, n); l, u: (m,). Equality rows are those
    with l == u; they get rho * rho_eq_scale (OSQP's default equality
    scaling). Over-relaxation alpha = 1.6.

    Convergence: fixed-rho ADMM can creep on badly scaled problems, so we run
    OSQP's adaptive-rho scheme with *static* control flow: ``rho_updates``
    outer phases, each running ``iters / rho_updates`` ADMM steps, with rho
    rescaled by sqrt(||r_prim||/||r_dual||) (normalized) and the x-update
    matrix refactored between phases. Values are data-dependent; trip counts
    and shapes are not — the whole solve jits and vmaps.
    """
    # f32 matmul precision required on TPU — see solve_box_qp.
    with jax.default_matmul_precision("highest"):
        return _solve_qp_impl(
            P, q, A, l, u, iters, rho, sigma, rho_eq_scale, alpha,
            rho_updates, polish,
        )


def _solve_qp_impl(
    P, q, A, l, u, iters, rho, sigma, rho_eq_scale, alpha, rho_updates, polish
):
    n = q.shape[-1]
    m = l.shape[-1]
    dtype = q.dtype
    is_eq = jnp.abs(u - l) < 1e-9
    eye_n = jnp.eye(n, dtype=dtype)
    inner_iters = max(iters // max(rho_updates, 1), 1)

    # ---- Ruiz equilibration (OSQP sec. 5.1) ----
    # Iteratively scale variables (D) and constraint rows (E) toward unit
    # inf-norms, plus a scalar cost scaling c. Without this, the mixed
    # piecewise-jerk problems (P diag 3e2..2e4, rows spanning 1..ds^2) take
    # thousands of ADMM iterations; with it, ~100.
    P0, q0, A0, l0_, u0_ = P, q, A, l, u
    D = jnp.ones(n, dtype)
    E = jnp.ones(m, dtype)
    c_scale = jnp.asarray(1.0, dtype)
    for _ in range(10):
        Ps = c_scale * (D[:, None] * P0 * D[None, :])
        As = E[:, None] * A0 * D[None, :]
        col_norm = jnp.maximum(
            jnp.max(jnp.abs(Ps), axis=0), jnp.max(jnp.abs(As), axis=0)
        )
        D = D / jnp.sqrt(jnp.maximum(col_norm, 1e-8))
        row_norm = jnp.max(jnp.abs(E[:, None] * A0 * D[None, :]), axis=1)
        E = E / jnp.sqrt(jnp.maximum(row_norm, 1e-8))
        Ps = c_scale * (D[:, None] * P0 * D[None, :])
        cost_norm = jnp.maximum(
            jnp.mean(jnp.max(jnp.abs(Ps), axis=0)),
            jnp.max(jnp.abs(c_scale * D * q0)),
        )
        c_scale = c_scale / jnp.maximum(jnp.sqrt(jnp.maximum(cost_norm, 1e-8)), 1e-4)
    P = c_scale * (D[:, None] * P0 * D[None, :])
    q = c_scale * (D * q0)
    A = E[:, None] * A0 * D[None, :]
    l = E * l0_
    u = E * u0_

    def factor(rho_scalar):
        rho_vec = jnp.where(is_eq, rho_scalar * rho_eq_scale, rho_scalar)
        K = P + sigma * eye_n + (A.T * rho_vec) @ A
        return rho_vec, K, jnp.linalg.inv(K)

    def admm_phase(carry):
        x, z, y, rho_vec, K, Kinv = carry

        def body(_, state):
            x, z, y = state
            rhs = sigma * x - q + A.T @ (rho_vec * z - y)
            x_new = Kinv @ rhs
            # One step of iterative refinement: the f32 inverse of K (whose
            # equality rows carry rho_eq_scale ~ 1e3) has ~1e-3 relative
            # error which would otherwise bias the fixed point.
            x_new = x_new + Kinv @ (rhs - K @ x_new)
            Ax = A @ x_new
            Ax_rel = alpha * Ax + (1.0 - alpha) * z
            z_new = jnp.clip(Ax_rel + y / rho_vec, l, u)
            y_new = y + rho_vec * (Ax_rel - z_new)
            return x_new, z_new, y_new

        return jax.lax.fori_loop(0, inner_iters, body, (x, z, y))

    x = jnp.zeros_like(q)
    z = jnp.clip(jnp.zeros(m, dtype=dtype), l, u)
    y = jnp.zeros(m, dtype=dtype)
    rho_scalar = jnp.asarray(rho, dtype)

    for _ in range(max(rho_updates, 1)):
        rho_vec, K, Kinv = factor(rho_scalar)
        x, z, y = admm_phase((x, z, y, rho_vec, K, Kinv))
        # OSQP rho update: rho *= sqrt(prim_res_norm / dual_res_norm)
        Ax = A @ x
        r_prim = jnp.linalg.norm(Ax - z, jnp.inf)
        r_dual = jnp.linalg.norm(P @ x + q + A.T @ y, jnp.inf)
        prim_scale = jnp.maximum(
            jnp.maximum(jnp.linalg.norm(Ax, jnp.inf), jnp.linalg.norm(z, jnp.inf)),
            1e-6,
        )
        dual_scale = jnp.maximum(
            jnp.maximum(
                jnp.linalg.norm(P @ x, jnp.inf), jnp.linalg.norm(A.T @ y, jnp.inf)
            ),
            jnp.maximum(jnp.linalg.norm(q, jnp.inf), 1e-6),
        )
        ratio = (r_prim / prim_scale) / jnp.maximum(r_dual / dual_scale, 1e-12)
        rho_scalar = jnp.clip(rho_scalar * jnp.sqrt(ratio), 1e-4, 1e4)

    x = D * x  # un-scale the primal iterate
    if polish:
        # polish in the *original* problem space; duals map back as E*y/c
        y_orig = E * y / c_scale
        x = _polish(P0, q0, A0, l0_, u0_, x, y_orig, z, sigma)
    return x


def prefactor_constants(
    P_np,
    A_np,
    eq_mask_np,
    q_typical=None,
    rho_schedule=(0.1, 1.0, 6.0),
    sigma: float = 1e-6,
    rho_eq_scale: float = 1e3,
):
    """Float64 Ruiz equilibration + per-phase factorization of a constant
    (P, A) QP family. Returns (Pt, At, D, E, c, phases) as NumPy —
    shared by the jnp solver below and the Pallas kernel in qp_pallas.py."""
    import numpy as np

    P0 = np.asarray(P_np, np.float64)
    A0 = np.asarray(A_np, np.float64)
    eq = np.asarray(eq_mask_np, bool)
    n = P0.shape[0]

    D = np.ones(n)
    E = np.ones(A0.shape[0])
    c = 1.0
    for _ in range(15):
        Ps = c * (D[:, None] * P0 * D[None, :])
        As = E[:, None] * A0 * D[None, :]
        col = np.maximum(np.abs(Ps).max(axis=0), np.abs(As).max(axis=0))
        D /= np.sqrt(np.maximum(col, 1e-8))
        row = np.abs(E[:, None] * A0 * D[None, :]).max(axis=1)
        E /= np.sqrt(np.maximum(row, 1e-8))
        Ps = c * (D[:, None] * P0 * D[None, :])
        # cost scaling must see the *linear* term too: with |q| >> |P| the
        # scaled problem is cost-dominated and a fixed rho ladder stalls
        # (observed: 26 m bound violations on the speed QP whose q carries
        # -2 w_vref v_ref ~ -1.4e3). q varies per instance, so callers pass
        # a representative magnitude.
        cost_norm = np.mean(np.abs(Ps).max(axis=0))
        if q_typical is not None:
            cost_norm = max(
                cost_norm, np.abs(c * D * np.asarray(q_typical, np.float64)).max()
            )
        c /= max(np.sqrt(max(cost_norm, 1e-8)), 1e-4)
    Pt = c * (D[:, None] * P0 * D[None, :])
    At = E[:, None] * A0 * D[None, :]

    phases = []
    for rho in rho_schedule:
        rho_vec = np.where(eq, rho * rho_eq_scale, rho)
        K = Pt + sigma * np.eye(n) + (At.T * rho_vec) @ At
        phases.append(
            (rho_vec.astype(np.float32), np.linalg.inv(K).astype(np.float32))
        )
    return (
        Pt.astype(np.float32),
        At.astype(np.float32),
        D.astype(np.float32),
        E.astype(np.float32),
        float(c),
        phases,
    )


def make_prefactored_qp(
    P_np,
    A_np,
    eq_mask_np,
    q_typical=None,
    iters_per_phase: int = 100,
    rho_schedule=(0.1, 1.0, 6.0),
    sigma: float = 1e-6,
    rho_eq_scale: float = 1e3,
    alpha: float = 1.6,
    use_pallas: bool = False,
    pallas_block: int = 128,
    pallas_interpret: bool = False,
    warm: bool = False,
    warm_iters_per_phase: int | None = None,
    kernel_matmul: str = "highest",
):
    """Build a constant-matrix QP solver: min 1/2 x'Px + q'x, l <= Ax <= u.

    For the planner QPs the quadratic form P and constraint matrix A are
    *fixed* — only (q, l, u) vary per scenario. The generic ``solve_qp``
    still equilibrates and factors per instance, which on TPU means batched
    LU/inverse kernels (serializing, compile-heavy: the profiled closed
    loop spent ~1 s per batched cycle there). Here everything matrix-shaped
    happens once in float64 NumPy at trace time; the returned
    ``solve(q, l, u)`` contains only matmuls and clips.

    With ``use_pallas=True`` the returned solver instead expects *batched*
    inputs (B, n)/(B, m) and runs the fused VMEM-resident kernel of
    qp_pallas.py (B must be a multiple of ``pallas_block``).

    With ``warm=True`` the solver takes and returns the scaled-space ADMM
    state: ``solve(q, l, u, state) -> (x, state)`` with
    ``state = (x_s, z, y)``; seed the first call with ``warm_zero_state``.
    Successive planner cycles solve near-identical problems, so carrying
    the state lets ``warm_iters_per_phase`` (default ``iters_per_phase``)
    be far smaller at equal fidelity — the closed-loop warm-start lever.
    """
    import numpy as np

    Pt, At, D, E, c, phases = prefactor_constants(
        P_np, A_np, eq_mask_np, q_typical, rho_schedule, sigma, rho_eq_scale
    )

    _n_iters = (
        warm_iters_per_phase
        if (warm and warm_iters_per_phase is not None)
        else iters_per_phase
    )
    if use_pallas:
        from emplanner_carla_tpu.ops import qp_pallas

        return qp_pallas.make_pallas_qp(
            Pt, At, D, E, c, phases, _n_iters,
            sigma=sigma, alpha=alpha, block=pallas_block,
            interpret=pallas_interpret, warm=warm, matmul=kernel_matmul,
        )

    n = Pt.shape[0]
    m = At.shape[0]
    # keep factory outputs as NumPy: the factory result is memoized by the
    # callers' lru_caches, and jnp constants created inside a jit trace
    # would leak tracers into later traces
    At_np_c = At
    D_np_c = D
    E_np_c = E
    c_np_c = np.float32(c)
    n_iters = (
        warm_iters_per_phase
        if (warm and warm_iters_per_phase is not None)
        else iters_per_phase
    )

    def solve(q: Array, l: Array, u: Array, state=None):
        # "high" (bf16x3, ~f32 to ~2^-22 relative) rather than "highest"
        # (bf16x6): unlike the generic solver, every factorization here
        # happened in float64 NumPy at trace time — on-device work is only
        # the ADMM iteration matmuls, whose ~1e-7 pass error sits far below
        # the iteration's own convergence tolerance. Halves the matmul
        # passes (-1.3 ms/full-EM cycle at batch 4096). TPU fleet
        # validation (2 seeds x 512 scenarios x 20 cycles): collisions and
        # lateral RMSE unchanged; infeasible-cycle flags 0->0 and 1->9 of
        # 10240 (trajectory-level divergence surfacing different
        # tight-avoidance moments — the flag's designed degrade-to-brake
        # path, not solver blow-ups: RMSE is equal-or-better).
        with jax.default_matmul_precision("high"):
            return _solve(q, l, u, state)

    def _solve(q: Array, l: Array, u: Array, state):
        At32 = jnp.asarray(At_np_c)
        D32 = jnp.asarray(D_np_c)
        E32 = jnp.asarray(E_np_c)
        c32 = jnp.float32(c_np_c)
        phase_consts = [(jnp.asarray(rv), jnp.asarray(Ki)) for rv, Ki in phases]
        qs = c32 * (D32 * q)
        ls = E32 * l
        us = E32 * u
        if state is None:
            x = jnp.zeros(n, jnp.float32)
            z = jnp.clip(jnp.zeros(m, jnp.float32), ls, us)
            y = jnp.zeros(m, jnp.float32)
        else:
            x, z, y = state
            z = jnp.clip(z, ls, us)
        # NOTE: warm solves keep the full rho ladder. A single final-rho
        # phase was tried and measured much worse: the scan's FIRST cycle
        # starts from the zero state, and rho=6 from zero never converges —
        # the ladder is what rescues it (trip counts are static inside the
        # scan, so cycle 0 and cycle k share one solver configuration).

        for rho_vec, Kinv in phase_consts:
            def body(_, st, rho_vec=rho_vec, Kinv=Kinv):
                x, z, y = st
                rhs = sigma * x - qs + At32.T @ (rho_vec * z - y)
                x_new = Kinv @ rhs
                Ax = At32 @ x_new
                Ax_rel = alpha * Ax + (1.0 - alpha) * z
                z_new = jnp.clip(Ax_rel + y / rho_vec, ls, us)
                y_new = y + rho_vec * (Ax_rel - z_new)
                return x_new, z_new, y_new

            x, z, y = jax.lax.fori_loop(0, n_iters, body, (x, z, y))
        if warm:
            return D32 * x, (x, z, y)
        return D32 * x

    # ---- automatic fused-kernel dispatch under vmap ----
    # The qp_pallas kernel fuses the whole rho ladder into one pallas_call
    # with the constants resident in VMEM. Dot precision is selected by
    # ``kernel_matmul``: at "highest" (f32, 6 MXU passes) the kernel
    # measured the same wall clock as this XLA ladder at bf16x3 — the
    # fusion bought back full-f32 numerics for free (infeasible-flag count
    # at the bf16x6 baseline: 1 vs 9 of 10240 on the sensitive seed). The
    # planner QPs now default to "bf16x3" (explicit hi/lo split in-kernel,
    # 3 passes): 178.7k -> 192.6k full-EM cycles/s at batch 4096, with the
    # same fleet validation clean (collisions 0->0, infeasible flags
    # IDENTICAL per seed, RMSE equal-or-better) — unlike the XLA ladder's
    # "high", the kernel keeps the (x, z, y) state and all VPU arithmetic
    # in f32, only the dot operands are split. A jax.custom_vmap routes
    # full-lane TPU batches to the kernel; everything else (CPU tests, odd
    # batches, unbatched calls) keeps the XLA path.
    from jax.custom_batching import custom_vmap

    from emplanner_carla_tpu.ops import qp_pallas

    # lane-block variants, same math bit-for-bit (lanes are rows of
    # every kernel dot, accumulation runs along the shared k axis): wider
    # blocks keep the MXU pipeline full across the serial iteration loop
    # and cut the sequential grid steps at fleet batch sizes (128 -> 512
    # measured +16% on the standalone warm solve in round 4; 512 -> 1024
    # + the tick kernel's 1024 cap lifted measured headline 685.8k ->
    # 720.1k cycles/s combined in round 5, bit-identical per lane)
    pallas_solve = {
        blk: qp_pallas.make_pallas_qp(
            Pt, At, D, E, c, phases, n_iters,
            sigma=sigma, alpha=alpha, block=blk, warm=warm,
            matmul=kernel_matmul,
        )
        for blk in (1024, 512, 128)
    }

    def _eligible(axis_size):
        return jax.default_backend() == "tpu" and axis_size % 128 == 0

    def _bcast_all(axis_size, in_batched, args):
        def bcast(a, was):
            return a if was else jnp.broadcast_to(a, (axis_size,) + a.shape)

        return tuple(
            jax.tree.map(bcast, a, ab) for a, ab in zip(args, in_batched)
        )

    if not warm:
        # cold solves stay on the XLA ladder: at bf16x3 it beats the
        # 6-pass fused kernel on throughput (standalone-solve benchmarks
        # regressed ~15% when cold solves dispatched to the kernel), and
        # cold solves appear only in the open-loop/standalone paths where
        # the closed loops' precision-sensitivity argument doesn't apply
        return solve

    @custom_vmap
    def solve_cv(q, l, u, state):
        return solve(q, l, u, state)

    @solve_cv.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = _bcast_all(axis_size, in_batched, args)
        if _eligible(axis_size):
            blk = next(b for b in (1024, 512, 128) if axis_size % b == 0)
            out = pallas_solve[blk](*args)
        else:
            out = jax.vmap(solve)(*args)
        return out, jax.tree.map(lambda _: True, out)

    return solve_cv


def warm_zero_state(n: int, m: int):
    """Initial (scaled-space) ADMM state for a ``warm=True`` prefactored
    solver: the cold start of the plain solver, minus the box clip on z
    (applied inside the solve against the instance bounds)."""
    return (
        jnp.zeros(n, jnp.float32),
        jnp.zeros(m, jnp.float32),
        jnp.zeros(m, jnp.float32),
    )


def kkt_residuals(P, q, A, l, u, x):
    """Primal/dual feasibility diagnostics (for tests and NaN guards)."""
    Ax = A @ x
    prim = jnp.maximum(Ax - u, 0.0) + jnp.maximum(l - Ax, 0.0)
    grad = P @ x + q
    return jnp.max(jnp.abs(prim)), grad
