"""Camera-space object detection (the YOLOv3 OpenCV-DNN demo replacement).

The reference feeds RGB camera frames through OpenCV's YOLOv3 DNN and draws
labeled boxes on the HUD (``/root/reference/simulation_2.py:159-233``) — a
host-side demo, disconnected from the planner. The TPU-native equivalent
detects objects *on device* from the synthetic camera's semantic + depth
channels (sim/camera.py) with fixed-shape, branch-free ops, and recovers
world-frame object positions — so the camera → detection → obstacle path
runs inside jit and can stand in for ground-truth perception.

Algorithm (per class, no data-dependent shapes):
  1. column presence mask = any pixel of the class in the column;
  2. connected column runs found by a cumulative-sum segment labeling
     (run id = cumsum of run-starts), padded to ``max_det`` slots;
  3. per run: pixel box, SUB-PIXEL centre bearing and near-face range from
     a 3-point parabola fit of the per-column depth profile (below), and
     the world (x, y) of the object centre (range + object radius along
     the bearing ray).

Sub-pixel localization (round-4 verdict item 3 — bearing quantization was
the pixel loop's measured accuracy floor, ~17 cm lateral at 10 m with the
96-px camera): for an upright cylinder, the along-ray depth converted to
the HORIZONTAL plane (d_h = depth * |d_xy| for unit ray d) is the same for
every row of a column — the 2-D ray/circle intersection depends only on
the column's azimuth. Around the object's centre azimuth b0 that profile
is locally quadratic, d_h(Δb) = (r0 - R) + Δb² · r0(r0 - R)/(2R), so the
vertex of a parabola through the min-depth column and its two neighbours
recovers BOTH the centre bearing (sub-pixel) and the true near-face range
(sub-quantization), limited only by the quartic term — measured ~1-3 cm
world-frame error at 10-25 m vs the ~17 cm pixel-grid floor. Runs too
narrow for the fit (< 3 columns, or the minimum on a run/frame edge) fall
back to the box-centre bearing with the horizontal-plane minimum depth.

This is the classic "column clustering" detector; at the camera's 96x64
it costs a few masked segment-reductions — noise on the VPU.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from emplanner_carla_tpu.sim import camera as camera_mod
from emplanner_carla_tpu.types import Array, EgoState

# adjacent-column near-face depth step above which a run is split into two
# objects (within one cylinder the step is bounded by ~VEHICLE_RADIUS at
# the silhouette edge; between a partially-occluding pair it is the
# inter-object range gap)
SPLIT_DEPTH = 1.6


class Detections(NamedTuple):
    """Fixed-width detection slots (per frame)."""

    u_min: Array    # (D,) leftmost pixel column of the box
    u_max: Array    # (D,) rightmost pixel column
    v_min: Array    # (D,) top pixel row
    v_max: Array    # (D,) bottom pixel row
    depth: Array    # (D,) near-face range in the horizontal plane (m)
    bearing: Array  # (D,) camera-frame azimuth of the object centre
    #                 (rad, left +; sub-pixel where the parabola fit holds)
    x: Array        # (D,) world-frame object centre estimate
    y: Array        # (D,)
    cls: Array      # (D,) semantic class id (camera.VEHICLE / camera.WALKER)
    valid: Array    # (D,) bool


def _runs_from_columns(
    col: Array, col_d: Array, max_det: int
) -> tuple[Array, ...]:
    """Column-run machinery shared by the frame and column-view paths.

    ``col`` (W,) bool class presence per column; ``col_d`` (W,) per-column
    near-face horizontal range (1e9 on empty columns). Returns per-slot
    ``(u_min, u_max, d_face, u_sub, valid, sel)`` where ``u_sub`` is the
    sub-pixel centre column, ``d_face`` the near-face horizontal range at
    that azimuth, and ``sel`` (D, W) the run's column membership.
    """
    (W,) = col.shape
    BIGF = jnp.float32(1e9)
    prev = jnp.concatenate([jnp.zeros(1, bool), col[:-1]])
    # split runs at depth discontinuities: two same-class objects that
    # overlap in column space (one partially occluding the other) used to
    # merge into ONE run whose box-centre/parabola landed between them —
    # a phantom mid-point detection metres from either object. Within one
    # upright cylinder the adjacent-column near-face step is bounded by
    # ~R (silhouette-edge chord, 1.0 m for vehicles), so a step above
    # SPLIT_DEPTH must be an object boundary.
    prev_d = jnp.concatenate([jnp.full(1, BIGF), col_d[:-1]])
    jump = jnp.abs(col_d - prev_d) > SPLIT_DEPTH
    start = col & (~prev | jump)
    run_id = jnp.cumsum(start) - 1                  # 0-based id on run columns
    run_id = jnp.where(col, run_id, -1)

    d = jnp.arange(max_det)
    sel = run_id[None, :] == d[:, None]             # (D, W) column membership
    u = jnp.arange(W)
    u_min = jnp.min(jnp.where(sel, u[None, :], W), axis=1)
    u_max = jnp.max(jnp.where(sel, u[None, :], -1), axis=1)
    valid = u_max >= u_min

    d_in = jnp.where(sel, col_d[None, :], BIGF)                  # (D, W)
    d_m = jnp.min(d_in, axis=1)                                  # (D,)
    is_min = (d_in == d_m[:, None]) & sel
    first_min = is_min & (jnp.cumsum(is_min, axis=1) == 1)       # one-hot
    u_star = jnp.sum(jnp.where(first_min, u[None, :], 0), axis=1)

    # neighbour columns via static rolls + the same one-hot contraction
    # (per-slot dynamic gathers are TPU poison under the fleet vmap)
    def at_min(a):
        return jnp.sum(jnp.where(first_min, a[None, :], 0.0), axis=1)

    d_l = at_min(jnp.roll(col_d, 1))
    d_r = at_min(jnp.roll(col_d, -1))
    sel_f = sel.astype(jnp.float32)
    in_l = jnp.sum(jnp.where(first_min, jnp.roll(sel_f, 1, axis=1), 0.0),
                   axis=1) > 0.5
    in_r = jnp.sum(jnp.where(first_min, jnp.roll(sel_f, -1, axis=1), 0.0),
                   axis=1) > 0.5
    curv = d_l - 2.0 * d_m + d_r
    fit_ok = (
        valid & in_l & in_r & (u_star > 0) & (u_star < W - 1)
        & (d_l < BIGF) & (d_r < BIGF) & (curv > 1e-4)
    )
    curv_s = jnp.maximum(curv, 1e-4)
    off = jnp.clip(0.5 * (d_l - d_r) / curv_s, -1.0, 1.0)
    u_sub = jnp.where(
        fit_ok, u_star.astype(jnp.float32) + off, 0.5 * (u_min + u_max)
    )
    # range at the CLIPPED offset — never the raw vertex value: with small
    # curvature (merged runs, occlusion edges) the unclipped vertex
    # d_m - (d_l-d_r)^2/(8c) dives metres below any measured depth
    # (observed 1.7 m perc_err spikes), while the parabola evaluated at
    # |off| <= 1 stays bounded by the neighbouring columns' real depths
    d_face = jnp.where(
        fit_ok,
        d_m + 0.5 * (d_r - d_l) * off + 0.5 * curv_s * off * off,
        d_m,
    )
    return u_min, u_max, d_face, u_sub, valid, sel


def _detect_class(
    sem: Array, depth_h: Array, cls: int, max_det: int
) -> tuple[Array, ...]:
    """Column-run detector for one class, from the rendered frame.

    ``depth_h`` is the horizontal-plane depth (see module docstring).
    Returns per-slot ``(u_min, u_max, v_min, v_max, d_face, u_sub, valid)``.
    """
    H, W = sem.shape
    BIGF = jnp.float32(1e9)
    mask = sem == cls                               # (H, W)
    col = jnp.any(mask, axis=0)                     # (W,)
    # per-column near-face horizontal range (row-invariant for cylinder
    # hits; the min collapses f32 rounding across rows)
    col_d = jnp.min(jnp.where(mask, depth_h, BIGF), axis=0)      # (W,)
    u_min, u_max, d_face, u_sub, valid, sel = _runs_from_columns(
        col, col_d, max_det
    )
    pix = sel[:, None, :] & mask[None, :, :]        # (D, H, W)
    v = jnp.arange(H)
    v_min = jnp.min(jnp.where(jnp.any(pix, 2), v[None, :], H), axis=1)
    v_max = jnp.max(jnp.where(jnp.any(pix, 2), v[None, :], -1), axis=1)
    return u_min, u_max, v_min, v_max, d_face, u_sub, valid


def detect(
    frame: camera_mod.CameraFrame,
    ego: EgoState,
    cfg: camera_mod.CameraConfig = camera_mod.CameraConfig(),
    max_det: int = 4,
) -> Detections:
    """Detect vehicles and walkers in one camera frame.

    Returns ``2 * max_det`` slots (vehicles first, then walkers). World
    positions assume the detected surface is the near face of a cylinder of
    the class's nominal radius (camera.VEHICLE_RADIUS / WALKER_RADIUS),
    with the centre azimuth and near-face range recovered sub-pixel from
    the depth-profile parabola (module docstring).
    """
    f = (cfg.width / 2.0) / math.tan(cfg.fov / 2.0)
    cx = (cfg.width - 1) / 2.0
    cy = (cfg.height - 1) / 2.0

    # along-ray depth -> horizontal-plane depth: d_h = t * |d_xy| for the
    # unit ray (1, a, b)/n with a = (cx-u)/f, b = (cy-v)/f
    a = (cx - jnp.arange(cfg.width, dtype=jnp.float32)) / f       # (W,)
    b = (cy - jnp.arange(cfg.height, dtype=jnp.float32)) / f      # (H,)
    hfrac = jnp.sqrt(1.0 + a * a)[None, :] / jnp.sqrt(
        1.0 + a[None, :] ** 2 + b[:, None] ** 2
    )                                                             # (H, W)
    depth_h = frame.depth * hfrac

    outs = []
    for cls, radius in (
        (camera_mod.VEHICLE, camera_mod.VEHICLE_RADIUS),
        (camera_mod.WALKER, camera_mod.WALKER_RADIUS),
    ):
        u_min, u_max, v_min, v_max, d_face, u_sub, valid = _detect_class(
            frame.semantic, depth_h, cls, max_det
        )
        outs.append(_project(
            ego, cfg, cls, radius, max_det,
            u_min, u_max, v_min, v_max, d_face, u_sub, valid,
        ))
    return Detections(*(jnp.concatenate(a) for a in zip(*outs)))


def _project(
    ego, cfg, cls, radius, max_det,
    u_min, u_max, v_min, v_max, d_face, u_sub, valid,
):
    """World-frame projection of per-run detections (shared by the frame
    and column-view paths)."""
    f = (cfg.width / 2.0) / math.tan(cfg.fov / 2.0)
    cx = (cfg.width - 1) / 2.0
    bearing = jnp.arctan((cx - u_sub) / f)          # camera frame, left +
    # object centre: one radius beyond the detected near face
    rng = d_face + radius
    az = ego.phi + bearing
    cphi, sphi = jnp.cos(ego.phi), jnp.sin(ego.phi)
    cam_x = ego.x + cfg.mount_forward * cphi
    cam_y = ego.y + cfg.mount_forward * sphi
    x = cam_x + rng * jnp.cos(az)
    y = cam_y + rng * jnp.sin(az)
    return Detections(
        u_min, u_max, v_min, v_max,
        jnp.where(valid, d_face, 0.0), bearing, x, y,
        jnp.full(max_det, cls, jnp.int32), valid,
    )


def detect_from_columns(
    cols: camera_mod.ColumnView,
    ego: EgoState,
    cfg: camera_mod.CameraConfig = camera_mod.CameraConfig(),
    max_det: int = 4,
) -> Detections:
    """``detect`` from the analytic column view (camera.render_columns) —
    the same column-run + sub-pixel parabola machinery without ever
    rendering the frame's rows.

    Row-extent fields ``v_min``/``v_max`` are not recoverable from the
    column view and are returned as zeros (no consumer of this path reads
    them — sim/pixel_loop's tracker uses only x/y/depth/valid; HUD
    overlays use the frame path). Everything else matches ``detect`` on
    the rendered frame to float tolerance (camera.render_columns
    docstring).
    """
    outs = []
    for i, (cls, radius) in enumerate((
        (camera_mod.VEHICLE, camera_mod.VEHICLE_RADIUS),
        (camera_mod.WALKER, camera_mod.WALKER_RADIUS),
    )):
        u_min, u_max, d_face, u_sub, valid, _ = _runs_from_columns(
            cols.col[i], cols.col_d[i], max_det
        )
        zi = jnp.zeros(max_det, u_min.dtype)
        outs.append(_project(
            ego, cfg, cls, radius, max_det,
            u_min, u_max, zi, zi, d_face, u_sub, valid,
        ))
    return Detections(*(jnp.concatenate(a) for a in zip(*outs)))
