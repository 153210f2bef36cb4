"""Vehicle control facade: lateral (LQR/MPC) + longitudinal PID per tick.

Rebuild of ``Vehicle_control`` (``/root/reference/controller/controller.py:680-724``)
as a pure function over explicit state. The reference re-instantiates the
whole controller object on every replan (``test_9.py:415-417``); here the
equivalent is resetting the match index when a new target path arrives.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from emplanner_carla_tpu.config import ControlConfig, VehicleParams
from emplanner_carla_tpu.control import lateral, pid
from emplanner_carla_tpu.types import Array, EgoState, Path


class ControllerState(NamedTuple):
    """Carried controller state. The lateral side is stateless — the match
    search is a full branch-free argmin over the short local path (see
    ``lateral.tracking_error``) — so only the PID buffer persists."""

    pid: pid.PIDState

    @classmethod
    def init(cls, cfg: ControlConfig):
        return cls(pid.PIDState.init(cfg))

    def rebind(self):
        """Controller rebind on replan (``test_9.py:415-417`` builds a fresh
        Vehicle_control): reset the PID buffer (a fresh
        Longitudinal_PID_controller starts empty)."""
        p = self.pid
        zero = jnp.zeros((), jnp.int32)
        return ControllerState(
            pid.PIDState(
                jnp.zeros_like(p.buffer), zero, jnp.zeros_like(p.last_error)
            ),
        )


def run_step(
    ego: EgoState,
    target: Path,
    state: ControllerState,
    target_speed_kmh: Array,
    vp: VehicleParams,
    cfg: ControlConfig,
):
    """One control tick -> (steer, throttle, brake, new state)."""
    if cfg.kind == "MPC":
        steer, _ = lateral.mpc_steer(ego, target, vp, cfg)
    else:
        steer, _ = lateral.lqr_steer(ego, target, vp, cfg)
    cmd, pid_state = pid.pid_step(state.pid, ego.speed, target_speed_kmh, cfg)
    throttle, brake = pid.split_throttle_brake(cmd)
    return steer, throttle, brake, ControllerState(pid_state)
