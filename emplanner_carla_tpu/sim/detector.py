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
  3. per run: pixel box, nearest depth, centre bearing from the pinhole
     model, and the world (x, y) of the object centre
     (depth + object radius along the bearing ray).

This is the classic "column clustering" detector; at the camera's 96x64
it costs a few masked segment-reductions — noise on the VPU.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from emplanner_carla_tpu.sim import camera as camera_mod
from emplanner_carla_tpu.types import Array, EgoState


class Detections(NamedTuple):
    """Fixed-width detection slots (per frame)."""

    u_min: Array    # (D,) leftmost pixel column of the box
    u_max: Array    # (D,) rightmost pixel column
    v_min: Array    # (D,) top pixel row
    v_max: Array    # (D,) bottom pixel row
    depth: Array    # (D,) nearest depth inside the box (m)
    bearing: Array  # (D,) camera-frame azimuth of the box centre (rad, left +)
    x: Array        # (D,) world-frame object centre estimate
    y: Array        # (D,)
    cls: Array      # (D,) semantic class id (camera.VEHICLE / camera.WALKER)
    valid: Array    # (D,) bool


def _detect_class(
    sem: Array, depth: Array, cls: int, max_det: int
) -> tuple[Array, ...]:
    """Column-run detector for one class. Returns per-slot box stats."""
    H, W = sem.shape
    mask = sem == cls                               # (H, W)
    col = jnp.any(mask, axis=0)                     # (W,)
    prev = jnp.concatenate([jnp.zeros(1, bool), col[:-1]])
    start = col & ~prev
    run_id = jnp.cumsum(start) - 1                  # 0-based id on run columns
    run_id = jnp.where(col, run_id, -1)

    d = jnp.arange(max_det)
    sel = run_id[None, :] == d[:, None]             # (D, W) column membership
    BIGF = jnp.float32(1e9)
    u = jnp.arange(W)
    u_min = jnp.min(jnp.where(sel, u[None, :], W), axis=1)
    u_max = jnp.max(jnp.where(sel, u[None, :], -1), axis=1)
    valid = u_max >= u_min

    pix = sel[:, None, :] & mask[None, :, :]        # (D, H, W)
    v = jnp.arange(H)
    v_min = jnp.min(jnp.where(jnp.any(pix, 2), v[None, :], H), axis=1)
    v_max = jnp.max(jnp.where(jnp.any(pix, 2), v[None, :], -1), axis=1)
    dmin = jnp.min(jnp.where(pix, depth[None, :, :], BIGF), axis=(1, 2))
    return u_min, u_max, v_min, v_max, dmin, valid


def detect(
    frame: camera_mod.CameraFrame,
    ego: EgoState,
    cfg: camera_mod.CameraConfig = camera_mod.CameraConfig(),
    max_det: int = 4,
) -> Detections:
    """Detect vehicles and walkers in one camera frame.

    Returns ``2 * max_det`` slots (vehicles first, then walkers). World
    positions assume the detected surface is the near face of a cylinder of
    the class's nominal radius (camera.VEHICLE_RADIUS / WALKER_RADIUS).
    """
    f = (cfg.width / 2.0) / math.tan(cfg.fov / 2.0)
    cx = (cfg.width - 1) / 2.0

    outs = []
    for cls, radius in (
        (camera_mod.VEHICLE, camera_mod.VEHICLE_RADIUS),
        (camera_mod.WALKER, camera_mod.WALKER_RADIUS),
    ):
        u_min, u_max, v_min, v_max, dmin, valid = _detect_class(
            frame.semantic, frame.depth, cls, max_det
        )
        u_c = 0.5 * (u_min + u_max)
        bearing = jnp.arctan((cx - u_c) / f)        # camera frame, left +
        # object centre: one radius beyond the detected near face
        rng = dmin + radius
        az = ego.phi + bearing
        cphi, sphi = jnp.cos(ego.phi), jnp.sin(ego.phi)
        cam_x = ego.x + cfg.mount_forward * cphi
        cam_y = ego.y + cfg.mount_forward * sphi
        x = cam_x + rng * jnp.cos(az)
        y = cam_y + rng * jnp.sin(az)
        outs.append(
            Detections(
                u_min, u_max, v_min, v_max,
                jnp.where(valid, dmin, 0.0), bearing, x, y,
                jnp.full(max_det, cls, jnp.int32), valid,
            )
        )
    return Detections(*(jnp.concatenate(a) for a in zip(*outs)))
