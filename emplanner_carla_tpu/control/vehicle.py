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
    """Carried controller state. The LQR lateral side is stateless — the
    match search is a full branch-free argmin over the short local path
    (see ``lateral.tracking_error``) — so only the PID buffer persists.
    The MPC side additionally carries its box-ADMM state ``mpc = (z, u_d)``
    across ticks (None under LQR), the warm start that lets
    ``mpc_warm_admm_iters`` replace the cold iteration count."""

    pid: pid.PIDState
    mpc: object = None   # (z (nu,), u_d (nu,)) for kind == "MPC", else None

    @classmethod
    def init(cls, cfg: ControlConfig):
        mpc = None
        if cfg.kind == "MPC":
            nu = cfg.mpc_n * cfg.mpc_p
            mpc = (jnp.zeros(nu), jnp.zeros(nu))
        return cls(pid.PIDState.init(cfg), mpc)

    def rebind(self):
        """Controller rebind on replan (``test_9.py:415-417`` builds a fresh
        Vehicle_control): reset the PID buffer (a fresh
        Longitudinal_PID_controller starts empty) and the MPC ADMM warm
        state (each cycle's first tick solves cold in BOTH the XLA scan and
        the Pallas tick kernel — the both-paths equivalence contract)."""
        p = self.pid
        zero = jnp.zeros((), jnp.int32)
        mpc = None
        if self.mpc is not None:
            mpc = tuple(jnp.zeros_like(a) for a in self.mpc)
        return ControllerState(
            pid.PIDState(
                jnp.zeros_like(p.buffer), zero, jnp.zeros_like(p.last_error)
            ),
            mpc,
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
    mpc_state = state.mpc
    if cfg.kind == "MPC":
        if mpc_state is not None:
            steer, _, mpc_state = lateral.mpc_steer_warm(
                ego, target, vp, cfg, mpc_state
            )
        else:
            steer, _ = lateral.mpc_steer(ego, target, vp, cfg)
    else:
        steer, _ = lateral.lqr_steer(ego, target, vp, cfg)
    cmd, pid_state = pid.pid_step(state.pid, ego.speed, target_speed_kmh, cfg)
    throttle, brake = pid.split_throttle_brake(cmd)
    return steer, throttle, brake, ControllerState(pid_state, mpc_state)
