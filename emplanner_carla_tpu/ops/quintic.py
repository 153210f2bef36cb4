"""Quintic polynomials on a normalized parameter.

The reference solves a 6x6 linear system in *absolute* s for every DP edge
(``cal_quintic_coefficient``, ``planner/planning_utils.py:671-703``). With
s ~ 100 m that Vandermonde-style matrix has entries up to s^5 ~ 1e10 — fine
in float64 on CPU, catastrophically ill-conditioned in float32 on TPU.

We instead use the closed-form quintic Hermite basis on u = (s - s0)/h,
u in [0, 1]: exact, branch-free, no linear solve, float32-stable, and the
coefficients for the common zero-derivative boundary case reduce to the
smoothstep 10u^3 - 15u^4 + 6u^5. Derivatives w.r.t. s are recovered by
dividing by h^k.
"""

from __future__ import annotations

import jax.numpy as jnp

from emplanner_carla_tpu.types import Array

__all__ = ["hermite_coeffs", "eval_poly", "eval_with_derivs"]


def hermite_coeffs(
    l0: Array, dl0: Array, ddl0: Array, l1: Array, dl1: Array, ddl1: Array, h: Array
) -> Array:
    """Coefficients c[0..5] of l(u) = sum c_k u^k on u in [0, 1].

    Boundary conditions are given w.r.t. s: dl = dl/ds, ddl = d2l/ds2;
    h = s1 - s0 is the span. Stacked on the last axis: (..., 6).
    Equivalent to (but numerically unlike) ``cal_quintic_coefficient``
    (``planning_utils.py:671-703``).
    """
    v0 = dl0 * h
    a0 = ddl0 * h * h
    v1 = dl1 * h
    a1 = ddl1 * h * h
    c0 = l0
    c1 = v0
    c2 = 0.5 * a0
    c3 = -10.0 * l0 - 6.0 * v0 - 1.5 * a0 + 10.0 * l1 - 4.0 * v1 + 0.5 * a1
    c4 = 15.0 * l0 + 8.0 * v0 + 1.5 * a0 - 15.0 * l1 + 7.0 * v1 - a1
    c5 = -6.0 * l0 - 3.0 * v0 - 0.5 * a0 + 6.0 * l1 - 3.0 * v1 + 0.5 * a1
    return jnp.stack(jnp.broadcast_arrays(c0, c1, c2, c3, c4, c5), axis=-1)


def eval_poly(coeffs: Array, u: Array) -> Array:
    """Horner evaluation of l(u). coeffs (..., 6) broadcast against u."""
    c = jnp.moveaxis(coeffs, -1, 0)  # (6, ...)
    acc = c[5]
    for k in range(4, -1, -1):
        acc = acc * u + c[k]
    return acc


def eval_with_derivs(coeffs: Array, u: Array, h: Array):
    """(l, dl/ds, d2l/ds2, d3l/ds3) at u, for span h.

    Matches the derivative stack sampled on every DP edge
    (``path_planning.py:494-498``) — with quirk Q2 (the reference's
    ``(s * 2)`` typo in dddl, ``path_planning.py:498``) fixed: the third
    derivative here is the true d3l/ds3.
    """
    c = jnp.moveaxis(coeffs, -1, 0)
    l = ((((c[5] * u + c[4]) * u + c[3]) * u + c[2]) * u + c[1]) * u + c[0]
    dl = (((5.0 * c[5] * u + 4.0 * c[4]) * u + 3.0 * c[3]) * u + 2.0 * c[2]) * u + c[1]
    ddl = ((20.0 * c[5] * u + 12.0 * c[4]) * u + 6.0 * c[3]) * u + 2.0 * c[2]
    dddl = (60.0 * c[5] * u + 24.0 * c[4]) * u + 6.0 * c[3]
    h = jnp.asarray(h)
    return l, dl / h, ddl / (h * h), dddl / (h * h * h)
