"""Cartesian <-> Frenet geometry, vectorized and branch-free.

TPU-native rebuild of the reference's Frenet machinery
(``/root/reference/planner/planning_utils.py``). Design notes:

* The reference's incremental nearest-point searches with early stopping
  (``find_match_points``, ``planning_utils.py:49-182``: scan with
  50-consecutive-increase early stop on first run, 5 afterwards, direction
  chosen by a tangent dot product) are data-dependent loops that do not map to
  XLA. At the sizes involved (51-point local line, ~1k-point global path) a
  full masked ``argmin`` is cheaper than the bookkeeping, exact, and
  branch-free; a windowed variant preserves the "search near the previous
  match" behavior for long global paths.

* Quirk Q1 of the reference (every projection after the first reuses point
  0's match point, ``planning_utils.py:103,169,413``) is fixed here: each
  query point uses its own match index.

* All functions take/return fixed-shape arrays and are safe under ``vmap``
  and ``jit``. Invalid/padded slots are handled with masks, not NaN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from emplanner_carla_tpu.types import Array, Path

__all__ = [
    "heading_kappa",
    "path_from_xy",
    "nearest_index",
    "nearest_index_windowed",
    "project_to_path",
    "arc_length",
    "s_map_from_origin",
    "cartesian_to_sl",
    "cartesian_to_frenet_full",
    "proj_point_at_s",
    "frenet_to_cartesian",
    "sample_window_indices",
]


def heading_kappa(x: Array, y: Array) -> tuple[Array, Array]:
    """Midpoint-Euler heading and curvature along a polyline.

    Port of ``cal_heading_kappa`` (``planning_utils.py:185-228``):
    theta = atan2 of the midpoint-averaged differences; curvature
    kappa = sin(d_theta)/ds with the sin() guarding angle multivaluedness.

    x, y: (..., N). Returns (theta, kappa) of the same shape.
    """
    dx_seg = jnp.diff(x, axis=-1)                      # (..., N-1)
    dy_seg = jnp.diff(y, axis=-1)
    # pad segment diffs front/back, then average -> per-node tangents
    dx = 0.5 * (
        jnp.concatenate([dx_seg[..., :1], dx_seg], axis=-1)
        + jnp.concatenate([dx_seg, dx_seg[..., -1:]], axis=-1)
    )
    dy = 0.5 * (
        jnp.concatenate([dy_seg[..., :1], dy_seg], axis=-1)
        + jnp.concatenate([dy_seg, dy_seg[..., -1:]], axis=-1)
    )
    theta = jnp.arctan2(dy, dx)
    dtheta_seg = jnp.diff(theta, axis=-1)
    # wrap segment heading changes into (-pi, pi] before averaging; the
    # reference relies on sin() alone, which flips sign for |dtheta| > pi/2
    # at path ends — wrapping first is the intended math.
    dtheta_seg = jnp.arctan2(jnp.sin(dtheta_seg), jnp.cos(dtheta_seg))
    dtheta = jnp.sin(
        0.5
        * (
            jnp.concatenate([dtheta_seg[..., :1], dtheta_seg], axis=-1)
            + jnp.concatenate([dtheta_seg, dtheta_seg[..., -1:]], axis=-1)
        )
    )
    ds = jnp.sqrt(dx * dx + dy * dy) + 1e-12
    return theta, dtheta / ds


def path_from_xy(x: Array, y: Array) -> Path:
    """Build a Path (x, y, theta, kappa) from raw coordinates
    (= ``waypoint_list_2_target_path``, ``planning_utils.py:29-46``)."""
    theta, kappa = heading_kappa(x, y)
    return Path(x, y, theta, kappa)


def nearest_index(px: Array, py: Array, path: Path, valid: Array | None = None) -> Array:
    """Index of the nearest path node to (px, py); full masked argmin.

    px, py: scalars or (...,) batches broadcast against path (..., N).
    Returns int32 indices. Ties resolve to the first minimum, matching the
    reference's strict-< scan (``planning_utils.py:84-87``).
    """
    d2 = (path.x - px[..., None]) ** 2 + (path.y - py[..., None]) ** 2
    if valid is not None:
        d2 = jnp.where(valid, d2, jnp.inf)
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)


def nearest_index_windowed(
    px: Array, py: Array, path: Path, center: Array, window: int
) -> Array:
    """Nearest node restricted to ``[center, center + window)``.

    Branch-free stand-in for the incremental forward search of
    ``find_match_points`` with ``pre_match_index`` (``planning_utils.py:116-167``)
    and the controller's 50-point window (``controller.py:198``): instead of a
    data-dependent early-stopped scan we mask a static window and argmin.
    The window is forward-only (the closed-loop ego only moves forward along
    its reference); it clips at the path end.
    """
    n = path.x.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    lo = jnp.clip(center, 0, max(n - window, 0))
    in_win = (idx >= lo[..., None]) & (idx < lo[..., None] + window)
    d2 = (path.x - px[..., None]) ** 2 + (path.y - py[..., None]) ** 2
    d2 = jnp.where(in_win, d2, jnp.inf)
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)


def _gather(a: Array, idx: Array) -> Array:
    """Gather along the node axis of an unbatched (N,) path array.

    All ops in this module operate on a single scenario (path arrays are
    1-D); batching comes from ``jax.vmap`` at the pipeline level — the
    idiomatic JAX layering, as opposed to hand-threading batch axes.

    Scalar- and vector-index lookups are lowered as one-hot contractions
    instead of dynamic gathers: under ``vmap`` a per-lane gather from a
    per-lane row becomes a TPU scatter/gather op that measured ~2x the cost
    of the whole plant step in the control tick (and ~2.4 ms/batch-4096 for
    the 12-obstacle S-L projection), while the one-hot multiply-sum is a
    handful of fused VPU ops at these path widths.
    """
    if idx.ndim <= 1 and a.ndim == 1 and a.shape[0] <= 1024:
        onehot = (
            jax.lax.iota(jnp.int32, a.shape[0]) == idx[..., None]
        ).astype(a.dtype)
        return jnp.sum(a * onehot, axis=-1)
    return a[idx]


def project_to_path(
    px: Array, py: Array, path: Path, match_idx: Array
) -> tuple[Array, Array, Array, Array, Array]:
    """First-order projection of (px, py) about the match node.

    The reference's projection formula (``planning_utils.py:94-114``):
    r_r = r_m + (d . tau) tau;  theta_r = theta_m + kappa_m * ds;
    kappa_r = kappa_m.  Returns (x_r, y_r, theta_r, kappa_r, ds) where ds is
    the signed tangential offset from the match node.
    """
    xm = _gather(path.x, match_idx)
    ym = _gather(path.y, match_idx)
    tm = _gather(path.theta, match_idx)
    km = _gather(path.kappa, match_idx)
    ct, st = jnp.cos(tm), jnp.sin(tm)
    ds = (px - xm) * ct + (py - ym) * st
    return xm + ds * ct, ym + ds * st, tm + km * ds, km, ds


def arc_length(path: Path) -> Array:
    """Cumulative polyline arc length from the first node (``ref_s_map``,
    ``planning_utils.py:461-466``)."""
    seg = jnp.sqrt(jnp.diff(path.x, axis=-1) ** 2 + jnp.diff(path.y, axis=-1) ** 2)
    zero = jnp.zeros_like(path.x[..., :1])
    return jnp.concatenate([zero, jnp.cumsum(seg, axis=-1)], axis=-1)


def s_map_from_origin(path: Path, origin_x: Array, origin_y: Array) -> Array:
    """Arc-length table re-origined at the projection of (origin_x, origin_y).

    Port of ``cal_s_map_fun`` (``planning_utils.py:448-472``): s = 0 at the
    ego's projection onto the line, negative behind it.
    """
    ref_s = arc_length(path)
    idx = nearest_index(origin_x, origin_y, path)
    _, _, _, _, ds = project_to_path(origin_x, origin_y, path, idx)
    s0 = _gather(ref_s, idx) + ds
    return ref_s - s0[..., None]


def cartesian_to_sl(
    px: Array, py: Array, path: Path, s_map: Array
) -> tuple[Array, Array]:
    """(x, y) -> (s, l) against a reference line.

    Port of ``cal_s_l_fun`` (``planning_utils.py:475-509``) with quirk Q1
    fixed (per-point match). l > 0 on the left of the tangent
    (n = (-sin, cos)); the reference's "left-handed UE4" caveat
    (``planning_utils.py:507``) is a rendering-frame artifact — the math is
    identical.

    px, py: (..., K) query points; path arrays (..., N); s_map (..., N).
    """
    idx = nearest_index(px, py, path)
    xr, yr, tr, _, ds = project_to_path(px, py, path, idx)
    s = _gather(s_map, idx) + ds
    l = -(px - xr) * jnp.sin(tr) + (py - yr) * jnp.cos(tr)
    return s, l


def cartesian_to_frenet_full(
    px: Array,
    py: Array,
    vx: Array,
    vy: Array,
    ax: Array,
    ay: Array,
    path: Path,
    s_map: Array,
):
    """Full state transform: (l, l_dot, s_dot, l_ddot, l', s_ddot, l'').

    Port of ``cal_s_l_deri_fun`` (``planning_utils.py:512-588``), vector
    method with the same s_dot ~ 0 guards, plus the s offset (the reference
    returns l-derivatives only; we also return s from the projection).
    """
    idx = nearest_index(px, py, path)
    xr, yr, tr, kr, ds = project_to_path(px, py, path, idx)
    s = _gather(s_map, idx) + ds
    nx, ny = -jnp.sin(tr), jnp.cos(tr)
    tx, ty = jnp.cos(tr), jnp.sin(tr)
    l = (px - xr) * nx + (py - yr) * ny
    l_dot = vx * nx + vy * ny
    one_kl = 1.0 - kr * l
    s_dot = (vx * tx + vy * ty) / one_kl
    l_ddot = ax * nx + ay * ny - kr * one_kl * s_dot**2
    small = jnp.abs(s_dot) < 1e-6
    l_prime = jnp.where(small, 0.0, l_dot / jnp.where(small, 1.0, s_dot))
    # dkappa/ds ~ 0 as in the reference (planning_utils.py:577)
    s_ddot = (ax * tx + ay * ty + 2.0 * s_dot**2 * kr * l_prime) / one_kl
    l_pprime = jnp.where(
        small, 0.0, (l_ddot - l_prime * s_ddot) / jnp.where(small, 1.0, s_dot**2)
    )
    return s, l, s_dot, l_dot, s_ddot, l_ddot, l_prime, l_pprime


def dynamic_obs_frenet(
    px: Array, py: Array, vx: Array, vy: Array, path: Path, s_map: Array
):
    """(s, l, s_dot, l_dot) of moving obstacles against a reference path.

    Port of the intended math of ``cal_dy_obs_deri``
    (``planning_utils.py:783-808``) fused with the position projection
    (no 128-slot NaN buffers; fixed-width masked arrays).
    """
    idx = nearest_index(px, py, path)
    xr, yr, tr, kr, ds = project_to_path(px, py, path, idx)
    s = _gather(s_map, idx) + ds
    nx, ny = -jnp.sin(tr), jnp.cos(tr)
    tx, ty = jnp.cos(tr), jnp.sin(tr)
    l = (px - xr) * nx + (py - yr) * ny
    l_dot = vx * nx + vy * ny
    s_dot = (vx * tx + vy * ty) / (1.0 - kr * l)
    return s, l, s_dot, l_dot


def proj_point_at_s(
    s: Array, path: Path, s_map: Array
) -> tuple[Array, Array, Array, Array]:
    """Pose of the reference-line point at arc coordinate s.

    Branch-free port of ``cal_proj_point`` / ``CalcProjPoint``
    (``path_planning.py:52-75``, ``planning_utils.py:736-755``): locate the
    bracketing node with searchsorted semantics and extrapolate along the
    tangent. s: (..., K); s_map: (..., N).
    """
    # vmapped searchsorted over leading axes: use broadcasting comparison.
    # idx = last node with s_map[idx] <= s (clipped to [0, N-2]).
    below = s_map[..., None, :] <= s[..., :, None]  # (..., K, N)
    idx = jnp.clip(
        jnp.sum(below.astype(jnp.int32), axis=-1) - 1, 0, s_map.shape[-1] - 2
    )
    xm = _gather(path.x, idx)
    ym = _gather(path.y, idx)
    tm = _gather(path.theta, idx)
    km = _gather(path.kappa, idx)
    ds = s - _gather(s_map, idx)
    return xm + ds * jnp.cos(tm), ym + ds * jnp.sin(tm), tm + km * ds, km


def frenet_to_cartesian(
    s: Array,
    l: Array,
    l_prime: Array,
    l_pprime: Array,
    path: Path,
    s_map: Array,
) -> Path:
    """(s, l(s)) profile -> Cartesian path with heading and curvature.

    Port of ``Frenet2Cartesian`` (``planning_utils.py:706-733``) without the
    600-slot NaN buffers: fixed-width inputs, caller masks invalid slots.
    Curvature recovery assumes kappa' ~ 0 (same approximation).
    """
    xr, yr, tr, kr = proj_point_at_s(s, path, s_map)
    nx, ny = -jnp.sin(tr), jnp.cos(tr)
    x = xr + l * nx
    y = yr + l * ny
    one_kl = 1.0 - kr * l
    heading = tr + jnp.arctan2(l_prime, one_kl)
    dth = heading - tr
    kappa = (
        (l_pprime + kr * l_prime * jnp.tan(dth)) * jnp.cos(dth) ** 2 / one_kl + kr
    ) * jnp.cos(dth) / one_kl
    return Path(x, y, heading, kappa)


def sample_window_indices(match_idx: Array, n_total: int, back: int, forward: int) -> Array:
    """Start index of the local window around a match point.

    Port of ``sampling`` (``planning_utils.py:231-259``): take ``back`` nodes
    behind and ``forward`` ahead (window length back+forward+1), shifting the
    window at the path ends to keep a constant length. Returns the window
    start index; slice with ``lax.dynamic_slice`` at the call site.
    """
    length = back + forward + 1
    start = match_idx - back
    return jnp.clip(start, 0, max(n_total - length, 0))


def slice_path(path: Path, start: Array, length: int) -> Path:
    """Dynamic fixed-length slice of a path (single, unbatched).

    One-hot contraction instead of ``lax.dynamic_slice``: under the fleet
    vmap a per-lane ``start`` makes XLA lower the batched dynamic-slice to
    a sequential while loop over the batch (profiled: 2 x 3.55 ms/cycle at
    batch 4096 — a third of the whole full-EM cycle); the one-hot
    multiply-reduce fuses into a few VPU ops. Exact in f32 (weights are
    0/1 — do NOT turn this into a dot/einsum: bf16 matmul passes would
    quantize world coordinates). ``start`` must already be clipped to
    [0, n - length] (sample_window_indices does), matching dynamic_slice's
    clamp semantics.
    """
    n = path.x.shape[-1]
    if n <= 1024:
        idx = start + jax.lax.iota(jnp.int32, length)          # (length,)
        onehot = (
            jax.lax.iota(jnp.int32, n)[None, :] == idx[:, None]
        ).astype(path.x.dtype)                                  # (length, n)
        take = lambda a: jnp.sum(a[..., None, :] * onehot, axis=-1)
    else:
        take = lambda a: jax.lax.dynamic_slice_in_dim(
            a, start, length, axis=-1
        )
    return Path(take(path.x), take(path.y), take(path.theta), take(path.kappa))
