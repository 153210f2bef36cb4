"""Traffic lights: fixed-cycle signals + red-light stop behavior.

Rebuild of the reference's traffic-light handling: ``BasicAgent``
brakes when ``_affected_by_traffic_light`` finds a red light ahead
(``/root/reference/agents/navigation/basic_agent.py:201-249``), and the
``BehaviorAgent`` inherits the same check (``behavior_agent.py:120-148``);
CARLA's lights themselves are world actors with fixed phase cycles.

TPU-native shape: a light is a fixed slot (position + phase parameters);
its state is a *pure function of time* (no carried state, no events), and
"brake for red" is a time-headway speed cap against the stop line — the
same mechanism as the closed loops' ACC guard, so it composes with lead
vehicles by a simple min.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from emplanner_carla_tpu.types import Array, EgoState

STOP_STANDOFF = 4.0   # metres kept to the stop line when stopped
STOP_HEADWAY = 1.2    # seconds of time headway on approach
STOP_LAT_GATE = 3.0   # |lateral offset| of a stop line that affects us
# (these are trace-time constants shared with the Pallas tick kernel —
# ops/tick_pallas.py imports them; edit here, both paths move together)


class TrafficLights(NamedTuple):
    """Fixed signal slots. Phase: green on [0, green_frac*period), red on
    the rest of the cycle (amber folded into red, conservatively)."""

    x: Array          # (L,) stop-line position
    y: Array          # (L,)
    period: Array     # (L,) full cycle length (s)
    offset: Array     # (L,) phase offset (s)
    green_frac: Array  # (L,) fraction of the cycle that is green
    valid: Array      # (L,) bool

    @classmethod
    def none(cls, n: int = 2):
        z = jnp.zeros(n)
        return cls(z, z, jnp.ones(n), z, jnp.ones(n), jnp.zeros(n, bool))


def is_green(lights: TrafficLights, t: Array) -> Array:
    """(L,) bool: light shows green at absolute time t."""
    phase = jnp.mod(t + lights.offset, jnp.maximum(lights.period, 1e-3))
    return phase < lights.green_frac * lights.period


def stop_distance(ego: EgoState, lights: TrafficLights, t: Array) -> Array:
    """Longitudinal distance to the nearest red stop line ahead in the
    vehicle's corridor; inf when unaffected (the affected-by-light gate of
    ``basic_agent.py:201-249``)."""
    vxw, vyw = ego.v_world
    spd = jnp.maximum(jnp.hypot(vxw, vyw), 1e-3)
    slow = spd < 0.5
    ux = jnp.where(slow, jnp.cos(ego.phi), vxw / jnp.where(slow, 1.0, spd))
    uy = jnp.where(slow, jnp.sin(ego.phi), vyw / jnp.where(slow, 1.0, spd))
    dx = lights.x - ego.x
    dy = lights.y - ego.y
    d_long = dx * ux + dy * uy
    d_lat = -dx * uy + dy * ux
    red = lights.valid & ~is_green(lights, t)
    gating = red & (d_long > 0.0) & (jnp.abs(d_lat) < STOP_LAT_GATE)
    return jnp.min(jnp.where(gating, d_long, jnp.inf))


def red_light_cap(
    ego: EgoState,
    lights: TrafficLights,
    t: Array,
    standoff: float = STOP_STANDOFF,
    headway: float = STOP_HEADWAY,
) -> Array:
    """Speed cap (m/s) to stop at the nearest red light ahead — the same
    time-headway form as the closed loops' ACC guard, so min() composes it
    with lead-vehicle caps."""
    d_stop = stop_distance(ego, lights, t)
    return jnp.maximum((d_stop - standoff) / headway, 0.0)
