"""Path x speed merge: the final time-parameterized trajectory.

Rebuild of ``path_speed_merge`` + ``trajectory_index2s``
(``/root/reference/planner/speed_planning_test.py:565-611``,
``planning_utils.py:758-780``): interpolate the planned path's pose at the
densified s(t) profile and attach speed/accel/relative time. Fixed shapes +
a validity mask replace the reference's NaN-scan bookkeeping.
"""

from __future__ import annotations

import jax.numpy as jnp

from emplanner_carla_tpu.ops import frenet
from emplanner_carla_tpu.types import Array, Path, Trajectory


def path_arc_length(path: Path) -> Array:
    """Arc-length table of a planned path (= ``trajectory_index2s``)."""
    return frenet.arc_length(path)


def merge(
    path: Path,
    s_dense: Array,
    v_dense: Array,
    a_dense: Array,
    t_dense: Array,
) -> Trajectory:
    """Pose at s(t) along the path + speed profile -> Trajectory.

    s beyond the path's end clamps to the final pose (the reference patches
    the endpoint by hand after np.interp's NaN behavior,
    ``speed_planning_test.py:591-608``); those samples are masked invalid.
    """
    s_map = path_arc_length(path)
    x = jnp.interp(s_dense, s_map, path.x)
    y = jnp.interp(s_dense, s_map, path.y)
    theta = jnp.interp(s_dense, s_map, path.theta)
    kappa = jnp.interp(s_dense, s_map, path.kappa)
    valid = s_dense <= s_map[-1]
    return Trajectory(x, y, theta, kappa, v_dense, a_dense, t_dense, valid)


def speed_at(traj: Trajectory, t: Array) -> Array:
    """Planned speed (m/s) at relative time t (clamped to the horizon)."""
    return jnp.interp(t, traj.time, traj.speed)
