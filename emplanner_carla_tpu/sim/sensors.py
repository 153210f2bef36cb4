"""Synthetic sensor models (the ``sensors/`` library replacement).

Rebuild of the reference's sensor scaffolding as pure functions over the
simulated world state:

* collision sensor — ``Sensors_detector_lib.Collision_sensor:13-43``
  (impulse history, 4000-event cap); here: per-tick instantaneous
  penetration depth against obstacle discs — the history lives in the
  scan's per-tick metrics stream rather than a mutable buffer.
* lane-invasion sensor — ``Sensors_detector_lib.Lane_invasion_sensor:44``;
  here: |l| vs the lane half-width against the global path.
* obstacle detector — ``Sensors_detector_lib.Obstacle_detector:95`` (30 m
  hit radius, dynamics only) and ``Obstacle_detector_sensor:64`` (6 m
  forward capsule); here: masked range queries.
* radar — ``Sensors_other_lib.Radar_sensor:14`` ([velocity, altitude,
  azimuth, depth] points); here: per-obstacle (radial velocity, azimuth,
  depth) tuples in the sensor frame within a field of view.
* GNSS — ``Sensors_other_lib.GNSS_sensor:48`` (zeroed noise model); here:
  position plus configurable Gaussian noise.
* IMU — ``Sensors_other_lib.IMU_sensor:78``; here: body-frame
  accelerations + yaw rate from the plant state.

The cameras (``Sensors_camera_lib``) live in sim/camera.py: a device-side
pinhole raycaster producing semantic/depth/optical-flow/RGB frames as pure
functions of world state (the HUD-feed role is covered there plus
utils/report.py's post-run rendering).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from emplanner_carla_tpu.ops import frenet
from emplanner_carla_tpu.types import Array, EgoState, Obstacles, Path


class RadarReturn(NamedTuple):
    depth: Array      # (K,) range (m)
    azimuth: Array    # (K,) bearing in the sensor frame (rad)
    velocity: Array   # (K,) radial closing speed (m/s, positive = closing)
    valid: Array      # (K,) inside range & field of view


def collision_depth(ego: EgoState, obs: Obstacles, radius: float = 1.5) -> Array:
    """Max penetration depth (m) into any obstacle disc; 0 when clear."""
    d = jnp.hypot(obs.x - ego.x, obs.y - ego.y)
    pen = jnp.where(obs.valid, jnp.maximum(radius - d, 0.0), 0.0)
    return jnp.max(pen)


def lane_invasion(
    ego: EgoState, lane_path: Path, s_map: Array, half_width: float = 1.75
) -> Array:
    """True when the ego centre leaves the lane band around its path."""
    _, l = frenet.cartesian_to_sl(
        ego.x[None], ego.y[None], lane_path, s_map
    )
    return jnp.abs(l[0]) > half_width


def obstacle_detector(
    ego: EgoState, obs: Obstacles, hit_radius: float = 30.0,
    dynamics_only: bool = True,
) -> Array:
    """Mask of detected obstacles (the 30 m ``Obstacle_detector`` contract;
    instantiated-then-disabled in the reference, ``test_9.py:252-254``)."""
    d = jnp.hypot(obs.x - ego.x, obs.y - ego.y)
    hit = obs.valid & (d < hit_radius)
    if dynamics_only:
        hit = hit & (jnp.hypot(obs.vx, obs.vy) > 0.1)
    return hit


def radar(
    ego: EgoState,
    obs: Obstacles,
    max_range: float = 100.0,
    fov: float = jnp.pi / 3,
) -> RadarReturn:
    """Forward radar: per-obstacle depth/azimuth/radial velocity."""
    dx = obs.x - ego.x
    dy = obs.y - ego.y
    depth = jnp.hypot(dx, dy)
    bearing = jnp.arctan2(dy, dx) - ego.phi
    bearing = jnp.arctan2(jnp.sin(bearing), jnp.cos(bearing))
    vx_w, vy_w = ego.v_world
    rel_vx = obs.vx - vx_w
    rel_vy = obs.vy - vy_w
    d_safe = jnp.maximum(depth, 1e-3)
    closing = -(rel_vx * dx + rel_vy * dy) / d_safe
    valid = obs.valid & (depth < max_range) & (jnp.abs(bearing) < fov / 2)
    return RadarReturn(depth, bearing, closing, valid)


def gnss(ego: EgoState, key=None, sigma: float = 0.0):
    """Position fix with optional Gaussian noise (the reference zeroes all
    its noise attributes, ``Sensors_other_lib.py:58-63``)."""
    if key is None or sigma == 0.0:
        return ego.x, ego.y
    import jax

    nx, ny = jax.random.normal(key, (2,)) * sigma
    return ego.x + nx, ego.y + ny


class GnssFix(NamedTuple):
    latitude: Array   # degrees
    longitude: Array  # degrees
    altitude: Array   # metres


# WGS84 equatorial radius — the sphere CARLA's GeoLocation conversion uses
_EARTH_RADIUS = 6378137.0


def gnss_geodetic(
    ego: EgoState,
    lat0: float = 0.0,
    lon0: float = 0.0,
    alt0: float = 0.0,
    key=None,
    sigma_deg: float = 0.0,
):
    """Geodetic fix (latitude, longitude, altitude) like the reference's
    ``carla.GnssMeasurement`` callback fields (``Sensors_other_lib.py:72-74``).

    CARLA converts world metres to degrees on a spherical earth anchored at
    the map's geo-reference; the same local-tangent inverse here: north (+y
    world) moves latitude, east (+x world) moves longitude scaled by
    cos(lat0). ``sigma_deg`` is the per-axis Gaussian noise the reference's
    blueprint attributes expose and zero (``Sensors_other_lib.py:58-63``)."""
    scale = 180.0 / (jnp.pi * _EARTH_RADIUS)
    lat = lat0 + ego.y * scale
    lon = lon0 + ego.x * scale / jnp.cos(jnp.deg2rad(lat0))
    alt = jnp.asarray(alt0, jnp.float32)
    if key is not None and sigma_deg > 0.0:
        import jax

        nlat, nlon = jax.random.normal(key, (2,)) * sigma_deg
        lat, lon = lat + nlat, lon + nlon
    return GnssFix(lat, lon, alt)


def imu(ego: EgoState):
    """Body-frame (ax, ay) + yaw rate."""
    c, s = jnp.cos(ego.phi), jnp.sin(ego.phi)
    ax_b = ego.ax * c + ego.ay * s
    ay_b = -ego.ax * s + ego.ay * c
    return ax_b, ay_b, ego.omega
