"""Vectorized vehicle plant models (the CARLA replacement).

CARLA's UE4 physics (tire model, throttle map, substeps — SURVEY.md §2.4) is
not reproducible and lives in another process; here the plant is a pure
fixed-step ODE integrated *inside* the compiled loop, so one `lax.scan`
carries planner + controller + plant together and `vmap` turns one ego into
a fleet.

Two models, selected by ``PlantConfig.kind``:

* kinematic bicycle (rear-axle reference): the default ground truth for the
  closed-loop benchmarks (BASELINE.md config 3);
* dynamic bicycle (linear tire model, same parameters the reference's
  controllers assume, ``controller.py:115-149``): for the MPC benchmark
  (BASELINE.md config 4).

Control inputs mirror ``carla.VehicleControl`` semantics
(``controller.py:694-724``): ``steer`` in [-1, 1] mapping to the max wheel
angle, ``throttle``/``brake`` in [0, 1] mapping to accel/decel limits.
Quirk Q12 (any negative PID output => full brake, ``controller.py:718``) is
fixed: brake is proportional.
"""

from __future__ import annotations

import jax.numpy as jnp

from emplanner_carla_tpu.config import PlantConfig, VehicleParams
from emplanner_carla_tpu.types import Array, EgoState


def control_to_accel(throttle: Array, brake: Array, vp: VehicleParams) -> Array:
    """Longitudinal acceleration from pedal commands."""
    return throttle * vp.max_accel - brake * vp.max_brake_decel


def steer_to_wheel(steer: Array, vp: VehicleParams) -> Array:
    """Normalized steer command -> front wheel angle (rad)."""
    return jnp.clip(steer, -1.0, 1.0) * vp.max_steer_rad


def apply_steer_actuator(
    applied: Array, cmd: Array, vp: VehicleParams, dt: float
) -> Array:
    """First-order-lag + rate-limited steering actuator.

    CARLA's UE4 vehicle applies steering with actuator dynamics; with an
    ideal zero-lag actuator the reference's LQR/MPC gains drive a 100 Hz
    loop into Nyquist-rate bang-bang oscillation on the kinematic plant.
    """
    desired = (cmd - applied) * dt / max(vp.steer_tau, dt)
    change = jnp.clip(desired, -vp.steer_rate * dt, vp.steer_rate * dt)
    return jnp.clip(applied + change, -1.0, 1.0)


def kinematic_step(
    s: EgoState, steer: Array, accel: Array, vp: VehicleParams, dt: float
) -> EgoState:
    """Rear-axle kinematic bicycle, explicit Euler at dt.

    State uses the shared EgoState layout; vy stays 0 and omega follows the
    kinematic yaw rate v·tan(delta)/L.
    """
    applied = apply_steer_actuator(s.steer, steer, vp, dt)
    delta = steer_to_wheel(applied, vp)
    L = vp.a + vp.b
    v = jnp.maximum(s.vx + accel * dt, 0.0)  # no reverse (reference gear=1)
    omega = v * jnp.tan(delta) / L
    phi = s.phi + omega * dt
    x = s.x + v * jnp.cos(phi) * dt
    y = s.y + v * jnp.sin(phi) * dt
    ax = accel * jnp.cos(phi)
    ay = accel * jnp.sin(phi)
    return EgoState(x, y, phi, v, jnp.zeros_like(v), omega, ax, ay, applied)


def dynamic_step(
    s: EgoState, steer: Array, accel: Array, vp: VehicleParams, dt: float
) -> EgoState:
    """Dynamic bicycle with linear tires.

    Lateral force F = C * alpha with the reference's negative-stiffness
    convention (Cf, Cr < 0, ``test_9.py:316``); slip angles guarded for
    vx ~ 0 like the controllers' min-Vx guard (``controller.py:103-109``).
    """
    applied = apply_steer_actuator(s.steer, steer, vp, dt)
    delta = steer_to_wheel(applied, vp)
    vx_safe = jnp.maximum(s.vx, 0.5)
    alpha_f = (s.vy + vp.a * s.omega) / vx_safe - delta
    alpha_r = (s.vy - vp.b * s.omega) / vx_safe
    # friction-limited tire forces: the unsaturated linear model lets
    # vy/omega blow up non-physically once a controller excites large slip
    # (observed: a spin-out integrating to 400+ km/h lateral speed). Cap
    # each axle at mu * static load.
    mu_g = 1.0 * 9.81
    fzf = vp.mass * mu_g * vp.b / (vp.a + vp.b)
    fzr = vp.mass * mu_g * vp.a / (vp.a + vp.b)
    fyf = jnp.clip(vp.cf * alpha_f, -fzf, fzf)
    fyr = jnp.clip(vp.cr * alpha_r, -fzr, fzr)
    vy_dot = (fyf + fyr) / vp.mass - s.vx * s.omega
    omega_dot = (vp.a * fyf - vp.b * fyr) / vp.iz
    vx = jnp.maximum(s.vx + accel * dt, 0.0)
    vy = jnp.where(vx > 0.1, s.vy + vy_dot * dt, 0.0)
    omega = jnp.where(vx > 0.1, s.omega + omega_dot * dt, 0.0)
    phi = s.phi + omega * dt
    c, sn = jnp.cos(phi), jnp.sin(phi)
    x = s.x + (vx * c - vy * sn) * dt
    y = s.y + (vy * c + vx * sn) * dt
    ax = accel * c  # world-frame longitudinal accel approximation
    ay = accel * sn
    return EgoState(x, y, phi, vx, vy, omega, ax, ay, applied)


def step(
    s: EgoState,
    steer: Array,
    throttle: Array,
    brake: Array,
    vp: VehicleParams,
    cfg: PlantConfig,
) -> EgoState:
    accel = control_to_accel(throttle, brake, vp)
    stepper = kinematic_step if cfg.kind == "kinematic" else dynamic_step
    dt = cfg.dt / cfg.substeps
    for _ in range(cfg.substeps):
        s = stepper(s, steer, accel, vp, dt)
    return s


def predict_forward(s: EgoState, ts: float) -> tuple[Array, Array, Array]:
    """Plan-start prediction: dead-reckon the pose ts seconds ahead
    (= ``predict_block``, ``planning_utils.py:591-614``)."""
    vx_w, vy_w = s.v_world
    x = s.x + vx_w * ts
    y = s.y + vy_w * ts
    phi = s.phi + s.omega * ts
    return x, y, phi
