"""Core pytree data types.

Everything is a NamedTuple of fixed-shape arrays so that the whole planning /
control / simulation stack is a pure function over pytrees, mappable with
``jax.vmap`` and steppable with ``jax.lax.scan``.

Variable-length collections from the reference (obstacle lists, NaN-padded
buffers like the 600-slot Frenet2Cartesian output of
``planner/planning_utils.py:712`` or the 128-slot dynamic-obstacle buffers at
``planning_utils.py:787``) become fixed-width arrays with an explicit boolean
``valid`` mask instead of NaN sentinels.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

Array = jnp.ndarray


class Path(NamedTuple):
    """A discrete path/reference line: (x, y, heading theta, curvature kappa).

    Mirrors the reference's list-of-tuples ``[(x, y, theta, kappa), ...]``
    (e.g. ``planner/planning_utils.py:29-46``) as a struct of arrays, each of
    shape (..., N).
    """

    x: Array
    y: Array
    theta: Array
    kappa: Array

    @property
    def n(self) -> int:
        return self.x.shape[-1]

    def stack(self) -> Array:
        """(..., N, 4) view for compact storage."""
        return jnp.stack([self.x, self.y, self.theta, self.kappa], axis=-1)

    @classmethod
    def from_stack(cls, a: Array) -> "Path":
        return cls(a[..., 0], a[..., 1], a[..., 2], a[..., 3])


class EgoState(NamedTuple):
    """Cartesian ego state shared by planner and controllers.

    Matches the tuple the reference assembles from CARLA actor queries
    (``controller/controller.py:90-113``): position, yaw ``phi``, body-frame
    velocities, yaw rate, plus world-frame velocity/acceleration used as the
    planner's start condition (``test_9.py:357-359``).
    """

    x: Array
    y: Array
    phi: Array      # yaw (rad)
    vx: Array       # body-frame longitudinal speed (m/s)
    vy: Array       # body-frame lateral speed (m/s)
    omega: Array    # yaw rate (rad/s)
    ax: Array       # world-frame acceleration x (m/s^2)
    ay: Array       # world-frame acceleration y (m/s^2)
    steer: Array    # applied (post-actuator) normalized steer in [-1, 1]

    @property
    def speed(self) -> Array:
        return jnp.hypot(self.vx, self.vy)

    @property
    def v_world(self) -> tuple[Array, Array]:
        c, s = jnp.cos(self.phi), jnp.sin(self.phi)
        return self.vx * c - self.vy * s, self.vy * c + self.vx * s


class Obstacles(NamedTuple):
    """Fixed-width obstacle set (static or dynamic).

    Replaces the reference's ground-truth perception lists
    (``test_9.py:48-89``). ``valid`` masks the active slots.
    """

    x: Array        # (..., K)
    y: Array        # (..., K)
    vx: Array       # world-frame velocity (0 for static)
    vy: Array
    valid: Array    # bool (..., K)

    @property
    def k(self) -> int:
        return self.x.shape[-1]


class SLObstacles(NamedTuple):
    """Obstacles projected into the Frenet (s, l) frame of a reference line."""

    s: Array
    l: Array
    valid: Array


class STSegments(NamedTuple):
    """S-T graph occupancy line segments, one per dynamic obstacle.

    Mirrors ``generate_st_graph`` outputs
    (``planner/speed_planning_test.py:38-98``) with a mask instead of NaN.
    """

    s_in: Array
    s_out: Array
    t_in: Array
    t_out: Array
    valid: Array


class FrenetState(NamedTuple):
    """Full Frenet state (s, l and derivatives) of one point.

    The seven outputs of ``cal_s_l_deri_fun``
    (``planner/planning_utils.py:512-588``) plus s itself.
    """

    s: Array
    l: Array
    s_dot: Array    # ds/dt
    l_dot: Array    # dl/dt
    s_ddot: Array   # d2s/dt2
    l_ddot: Array   # d2l/dt2
    l_prime: Array  # dl/ds
    l_pprime: Array  # d2l/ds2


class Trajectory(NamedTuple):
    """Time-parameterized trajectory = path ⨉ speed profile.

    The output of ``path_speed_merge`` (``speed_planning_test.py:565-611``):
    401 points of pose + speed + accel + relative time in the reference; here
    any fixed N with a validity mask.
    """

    x: Array
    y: Array
    theta: Array
    kappa: Array
    speed: Array
    accel: Array
    time: Array
    valid: Array
