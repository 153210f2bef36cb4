"""NPC traffic: behavior presets + waypoint-following agents.

Rebuild of the role of the vendored CARLA agent library (``/root/reference/
agents/navigation/``): ``BehaviorAgent`` with its cautious/normal/aggressive
presets (``behavior_types.py:8-37``), the ``LocalPlanner`` waypoint queue +
PID follower (``local_planner.py:208``), and ``BasicAgent``-style
car-following (``behavior_agent.py:150-294``) — as a vectorized, fixed-shape
agent model stepped inside the compiled loop.

Each NPC follows its own reference path (typically the scenario's global
path, laterally offset) with:
* pure-pursuit steering toward a speed-scaled lookahead point (the
  LocalPlanner's waypoint-queue-plus-PID role);
* IDM-style longitudinal control against the preset's target speed,
  safety time headway, and minimum spacing (the car-following /
  tailgating managers' role), yielding to the ego and other NPCs.

The reference drives its NPC via CARLA's vehicle plant; here NPCs use the
same kinematic bicycle as the ego.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from emplanner_carla_tpu.config import VehicleParams
from emplanner_carla_tpu.ops import frenet
from emplanner_carla_tpu.types import Array, EgoState, Path


class BehaviorPreset(NamedTuple):
    """Mirrors the fields of ``behavior_types.py`` (Cautious/Normal/
    Aggressive): max speed (m/s), safety time headway (s), min spacing (m),
    comfortable accel / decel (m/s^2)."""

    max_speed: Array
    safety_time: Array
    min_distance: Array
    accel: Array
    decel: Array


_PRESET_TABLE = {
    "cautious": (30.0 / 3.6, 3.0, 12.0, 1.5, 3.0),
    "normal": (40.0 / 3.6, 2.0, 10.0, 2.0, 4.0),
    "aggressive": (50.0 / 3.6, 1.0, 8.0, 3.0, 5.0),
}


def preset(name: str) -> BehaviorPreset:
    """Cautious / normal / aggressive, scaled from ``behavior_types.py:8-37``
    (speeds there are km/h deltas below the limit; we use absolute m/s)."""
    return BehaviorPreset(
        *(jnp.asarray(v, jnp.float32) for v in _PRESET_TABLE[name])
    )


def preset_floats(name: str) -> tuple:
    """The preset as plain Python floats — for trace-time constants (the
    Pallas tick kernel bakes them in; jnp scalars would leak tracers)."""
    return tuple(float(v) for v in _PRESET_TABLE[name])


class NPCState(NamedTuple):
    ego: EgoState        # NPC pose/velocity reuses the EgoState layout
    path_index: Array    # carried match index on its reference path
    active: Array        # bool


def idm_accel(
    v: Array, v_lead: Array, gap: Array, p: BehaviorPreset
) -> Array:
    """Intelligent-Driver-Model acceleration: free-road term + interaction
    term from the preset's headway/min-distance (the car-following manager's
    decision logic, ``behavior_agent.py:150-199``, as a standard IDM)."""
    s_star = p.min_distance + jnp.maximum(
        v * p.safety_time + v * (v - v_lead) / (2.0 * jnp.sqrt(p.accel * p.decel)),
        0.0,
    )
    gap = jnp.maximum(gap, 0.5)
    return p.accel * (
        1.0 - (v / jnp.maximum(p.max_speed, 0.1)) ** 4 - (s_star / gap) ** 2
    )


LANE_WIDTH = 3.5
LANE_CHANGE_RATE = 1.75  # lateral offset slew (m/s): one lane in ~2 s


class LaneState(NamedTuple):
    """Carried lane-change state per NPC: current lateral offset from its
    lane centre and the commanded target offset (the fixed-shape analogue
    of ``BehaviorAgent``'s overtake/tailgating lane reassignment,
    ``behavior_agent.py:150-199``)."""

    offset: Array
    target: Array

    @classmethod
    def init(cls, k: int):
        z = jnp.zeros(k, jnp.float32)
        return cls(z, z)


def lane_change_decision(
    lane: LaneState,
    gap_own: Array,
    v_lead_own: Array,
    v_self: Array,
    left_free: Array,
    right_free: Array,
    own_free: Array,
    p: BehaviorPreset,
) -> LaneState:
    """Overtake-pressure lane selection (``behavior_agent.py:150-199``:
    `_overtake` moves out when blocked behind a slower vehicle and the
    target lane is clear; `_tailgating`'s pressure threshold is the
    headway-scaled gap). Left lane preferred, as in the reference.

    ``gap_own``/``v_lead_own``: lead in the NPC's *own* lane corridor;
    ``own_free``: the own-lane corridor is clear enough to merge back.
    """
    press_gap = p.min_distance + v_self * p.safety_time
    blocked = (gap_own < 1.5 * press_gap) & (v_lead_own < 0.8 * p.max_speed)
    in_lane = jnp.abs(lane.target) < 0.1
    go_left = blocked & in_lane & left_free
    go_right = blocked & in_lane & ~left_free & right_free
    target = jnp.where(
        go_left,
        LANE_WIDTH,
        jnp.where(go_right, -LANE_WIDTH, lane.target),
    )
    # merge back once the own lane is clear again — AND the overtake
    # pressure has released. Without the ~blocked term the target flaps
    # every tick while the blocker is between the corridor gate (20 m) and
    # the pressure gate (~39 m at 8 m/s): own_free still true, blocked
    # still true -> change, merge, change... deferring the actual move
    # until the blocker is under 20 m (observed in the lane-change parity
    # test; the reference's BehaviorAgent can't flap — its lane change
    # rewrites the waypoint plan, behavior_agent.py:150-199).
    target = jnp.where(~in_lane & own_free & ~blocked, 0.0, target)
    return LaneState(lane.offset, target)


def lateral_offset_on_path(s: EgoState, path: Path, idx: Array) -> Array:
    """The NPC's current lateral offset from its path (+ = path-normal
    (-sin, cos) side), measured at node ``idx``.

    Node lookups go through ``frenet._gather``'s one-hot contraction: a
    direct ``path.theta[idx]`` with a per-lane index is a TPU gather under
    the fleet ``vmap`` (measured the dominant cost of the agent-traffic
    tick — bench config 7)."""
    th = frenet._gather(path.theta, idx)
    px = frenet._gather(path.x, idx)
    py = frenet._gather(path.y, idx)
    return -(s.x - px) * jnp.sin(th) + (s.y - py) * jnp.cos(th)


def slew_lane(lane: LaneState, dt: float) -> LaneState:
    """Move the actual offset toward the target at the lane-change rate."""
    d = jnp.clip(
        lane.target - lane.offset,
        -LANE_CHANGE_RATE * dt,
        LANE_CHANGE_RATE * dt,
    )
    return LaneState(lane.offset + d, lane.target)


def corridor_free(
    npc: EgoState,
    lateral_shift: Array,
    others_x: Array,
    others_y: Array,
    others_valid: Array,
    back: float = 8.0,
    ahead: float = 20.0,
    half_width: float = 1.8,
) -> Array:
    """Is the laterally shifted corridor clear of other actors? (the
    reference's `_vehicle_obstacle_detected` on the candidate lane,
    ``basic_agent.py:251``)."""
    ux, uy = jnp.cos(npc.phi), jnp.sin(npc.phi)
    nx, ny = -uy, ux
    cx = npc.x + lateral_shift * nx
    cy = npc.y + lateral_shift * ny
    dx = others_x - cx
    dy = others_y - cy
    d_long = dx * ux + dy * uy
    d_lat = -dx * uy + dy * ux
    occupied = others_valid & (d_long > -back) & (d_long < ahead) & (
        jnp.abs(d_lat) < half_width
    )
    return ~jnp.any(occupied)


def npc_step(
    state: NPCState,
    path: Path,
    lead_dist: Array,
    lead_speed: Array,
    p: BehaviorPreset,
    vp: VehicleParams,
    dt: float,
    lane_offset: Array = None,
) -> NPCState:
    """One NPC tick: pure-pursuit steering + IDM accel + kinematic plant.
    ``lane_offset`` shifts the pursuit point off the path centre along the
    path normal (lane-change support)."""
    s = state.ego
    # match + lookahead point (LocalPlanner's queue-popping role)
    idx = frenet.nearest_index_windowed(s.x, s.y, path, state.path_index, 32)
    look = jnp.clip(
        idx + 2 + (s.vx / 4.0).astype(jnp.int32), 0, path.n - 1
    )
    off = jnp.zeros(()) if lane_offset is None else lane_offset
    # one-hot node lookups (see lateral_offset_on_path): gathers with
    # per-lane indices are the TPU bottleneck of the vmapped traffic tick
    th_l = frenet._gather(path.theta, look)
    lx = frenet._gather(path.x, look)
    ly = frenet._gather(path.y, look)
    dx = lx - off * jnp.sin(th_l) - s.x
    dy = ly + off * jnp.cos(th_l) - s.y
    # pure pursuit: steer toward the lookahead point
    alpha = jnp.arctan2(dy, dx) - s.phi
    alpha = jnp.arctan2(jnp.sin(alpha), jnp.cos(alpha))
    L = vp.a + vp.b
    ld = jnp.maximum(jnp.hypot(dx, dy), 1.0)
    delta = jnp.arctan2(2.0 * L * jnp.sin(alpha), ld)
    steer = jnp.clip(delta / vp.max_steer_rad, -1.0, 1.0)

    accel = idm_accel(s.vx, lead_speed, lead_dist, p)
    accel = jnp.clip(accel, -p.decel, p.accel)

    # kinematic bicycle, no actuator lag for NPCs (they are scenery)
    v = jnp.maximum(s.vx + accel * dt, 0.0)
    omega = v * jnp.tan(steer * vp.max_steer_rad) / L
    phi = s.phi + omega * dt
    x = s.x + v * jnp.cos(phi) * dt
    y = s.y + v * jnp.sin(phi) * dt
    z = jnp.zeros_like(v)
    new = EgoState(x, y, phi, v, z, omega, accel * jnp.cos(phi),
                   accel * jnp.sin(phi), steer)
    keep = state.active
    ego_out = jax.tree.map(lambda a, b: jnp.where(keep, a, b), new, s)
    return NPCState(ego_out, jnp.where(keep, idx, state.path_index), state.active)


def lead_info(
    npc: EgoState, others_x: Array, others_y: Array, others_v: Array,
    others_valid: Array, lateral_shift: Array = 0.0,
):
    """Nearest vehicle ahead of the NPC within a lane corridor -> (gap,
    speed). Others include the ego and the rest of the fleet.
    ``lateral_shift`` recentres the corridor (e.g. onto the intended lane
    during a lane change)."""
    ux, uy = jnp.cos(npc.phi), jnp.sin(npc.phi)
    nx, ny = -uy, ux
    dx = others_x - (npc.x + lateral_shift * nx)
    dy = others_y - (npc.y + lateral_shift * ny)
    d_long = dx * ux + dy * uy
    d_lat = -dx * uy + dy * ux
    ahead = others_valid & (d_long > 0.5) & (jnp.abs(d_lat) < 2.0)
    gap = jnp.min(jnp.where(ahead, d_long, jnp.inf))
    lead_idx = jnp.argmin(jnp.where(ahead, d_long, jnp.inf))
    v = jnp.where(jnp.isfinite(gap), others_v[lead_idx], 100.0)
    gap = jnp.where(jnp.isfinite(gap), gap, 1e4)
    return gap, v
