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


@partial(jax.jit, static_argnames=("iters", "rho_updates"))
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
    n = q.shape[-1]
    m = l.shape[-1]
    dtype = q.dtype
    is_eq = jnp.abs(u - l) < 1e-9
    eye_n = jnp.eye(n, dtype=dtype)
    inner_iters = max(iters // max(rho_updates, 1), 1)

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

    return x


def kkt_residuals(P, q, A, l, u, x):
    """Primal/dual feasibility diagnostics (for tests and NaN guards)."""
    Ax = A @ x
    prim = jnp.maximum(Ax - u, 0.0) + jnp.maximum(l - Ax, 0.0)
    grad = P @ x + q
    return jnp.max(jnp.abs(prim)), grad
