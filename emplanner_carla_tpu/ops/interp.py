"""Gather-free linear interpolation for the TPU hot path.

``jnp.interp`` lowers to a searchsorted + two dynamic gathers per channel.
On TPU, dynamic gathers along the lane dimension serialize badly: the
densify/merge stage of the full-EM cycle measured ~68 ms/batch-4096 for the
speed channel alone and ~+50 ms per additional ``jnp.interp`` channel
(see ``control/lateral.py:212`` for the same lesson on the control tick).

The replacements here express interpolation as small dense contractions —
comparison masks + one-hot matmuls — which XLA tiles onto the MXU/VPU:

* :func:`weight_matrix` — (nq, n) linear-interpolation weights W for a
  monotone knot vector, so ``W @ fp == jnp.interp(xq, xp, fp)`` for ANY
  number of value channels at one matmul.
* :func:`uniform_hat` — weights for a *uniform* grid via closed-form hat
  functions: no comparisons, no one-hots, exact linear interp.

Both clamp outside the knot range (``jnp.interp``'s endpoint semantics).
Reference anchor: ``np.interp`` / ``scipy.interp1d`` call sites at
``/root/reference/planner/speed_planning_test.py:341-346,585-608``.
"""

from __future__ import annotations

import jax.numpy as jnp

from emplanner_carla_tpu.types import Array

__all__ = ["weight_matrix", "uniform_hat", "interp"]


def weight_matrix(xq: Array, xp: Array) -> Array:
    """(..., nq, n) weights W with ``W @ fp`` = linear interp of fp at xq.

    xp: (..., n) monotone non-decreasing knots; xq: (..., nq) queries.
    Queries outside [xp[0], xp[-1]] clamp to the endpoint values. Duplicate
    knots are guarded (the left value wins over a zero-length segment).
    """
    n = xp.shape[-1]
    # idx = last knot <= xq, clipped to a valid left-bracket index
    below = xp[..., None, :] <= xq[..., :, None]            # (..., nq, n)
    idx = jnp.clip(jnp.sum(below.astype(jnp.int32), -1) - 1, 0, n - 2)
    iota = jnp.arange(n, dtype=jnp.int32)
    left = (iota == idx[..., :, None]).astype(xp.dtype)     # one-hot (nq, n)
    right = (iota == (idx + 1)[..., :, None]).astype(xp.dtype)
    x0 = jnp.sum(left * xp[..., None, :], -1)
    x1 = jnp.sum(right * xp[..., None, :], -1)
    frac = jnp.clip((xq - x0) / jnp.maximum(x1 - x0, 1e-12), 0.0, 1.0)
    return left * (1.0 - frac)[..., :, None] + right * frac[..., :, None]


def uniform_hat(xq: Array, x0: Array, dx: Array, n: int) -> Array:
    """(..., nq, n) interp weights for the uniform grid x0 + i*dx, i<n.

    Closed-form hat functions w_i = max(0, 1 - |(xq - x0)/dx - i|) with the
    query clamped to the grid span — exact linear interpolation with zero
    comparisons or gathers (the speed profile / time grids are uniform by
    construction, so this is the common fast case).
    """
    u = jnp.clip((xq - x0) / dx, 0.0, n - 1.0)
    iota = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[..., :, None] - iota))


def interp(xq: Array, xp: Array, fp: Array) -> Array:
    """Drop-in ``jnp.interp`` (clamping) via :func:`weight_matrix`."""
    return weight_matrix(xq, xp) @ fp
