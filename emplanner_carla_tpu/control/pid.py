"""Longitudinal PID with integral separation, as carried scan state.

Rebuild of ``Longitudinal_PID_controller``
(``/root/reference/controller/controller.py:614-677``): error in km/h, a
60-deep error buffer for the integral/derivative terms, and integral
separation — |error| above 1 km/h zeroes the integral and clears the buffer.

The deque becomes a fixed ring buffer carried through ``lax.scan``; clearing
is a masked reset.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from emplanner_carla_tpu.config import ControlConfig
from emplanner_carla_tpu.types import Array


class PIDState(NamedTuple):
    buffer: Array   # (pid_buffer,) recent errors (km/h), newest last
    count: Array    # int32 number of valid entries
    last_error: Array

    @classmethod
    def init(cls, cfg: ControlConfig, dtype=jnp.float32):
        return cls(
            jnp.zeros(cfg.pid_buffer, dtype),
            jnp.zeros((), jnp.int32),
            jnp.zeros((), dtype),
        )


def pid_core(buffer, count, last_row, error_row, cfg: ControlConfig):
    """Shape-generic PID tick shared by the scalar scan path and the Pallas
    tick kernel (where every per-lane value is a ``(1, blk)`` row and the
    buffer is ``(n_buf, blk)`` — single-sourcing the integral-separation
    semantics across both, per the tick-loop equivalence contract).

    ``buffer``: (n_buf, *rest); ``error_row``/``last_row``: (1, *rest);
    ``count``: scalar or (1, *rest), int or float. Returns
    (cmd_row, buffer', count', error_row) with count' shaped like the
    ``jnp.where`` broadcast of count against the row shape."""
    buffer = jnp.concatenate([buffer[1:], error_row])
    count = jnp.minimum(count + 1, cfg.pid_buffer)

    have_two = count >= 2
    integral = jnp.where(
        have_two, jnp.sum(buffer, axis=0, keepdims=True) * cfg.pid_dt, 0.0
    )
    deriv = jnp.where(have_two, (error_row - last_row) / cfg.pid_dt, 0.0)

    # integral separation (controller.py:667-671)
    separate = jnp.abs(error_row) > cfg.integral_sep_threshold
    integral = jnp.where(separate, 0.0, integral)
    buffer = jnp.where(separate, jnp.zeros_like(buffer), buffer)
    count = jnp.where(separate, 0, count)

    cmd = cfg.kp * error_row + cfg.ki * integral + cfg.kd * deriv
    return cmd, buffer, count, error_row


def pid_step(
    state: PIDState, speed_mps: Array, target_kmh: Array, cfg: ControlConfig
):
    """One PID tick -> (command, new state). Command > 0 ~ throttle,
    < 0 ~ brake (``Vehicle_control.run_step`` splits it,
    ``controller.py:713-718``).

    The reference's error deque becomes a shift register (static slice +
    concat) rather than a head-indexed ring: a per-lane write index under
    ``vmap`` lowers to a TPU scatter, which measured as a dominant cost of
    the whole control tick; the shift is a free layout change. The window
    sum is unchanged (evicted slots are zero-filled on reset)."""
    error = target_kmh - 3.6 * speed_mps
    cmd, buffer, count, _ = pid_core(
        state.buffer, state.count, state.last_error[None], error[None], cfg
    )
    return cmd[0], PIDState(buffer, count[0], error)


def split_throttle_brake(cmd: Array):
    """Positive command -> throttle, negative -> proportional brake
    (quirk Q12 fixed: the reference's ``max(max_brake, accel)`` makes any
    negative command a full brake, ``controller.py:718``)."""
    throttle = jnp.clip(cmd, 0.0, 1.0)
    brake = jnp.clip(-cmd, 0.0, 1.0)
    return throttle, brake
