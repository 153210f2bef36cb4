"""Float64 NumPy oracle of the NPC traffic agent (``sim/npc.py``).

Loop-based, scalar-math mirror of the vectorized JAX agent — pure-pursuit
steering toward a speed-scaled lookahead point, IDM longitudinal control,
overtake-pressure lane changes with corridor checks — used by
``closed_loop_np.simulate_traffic`` as the ground truth for
``sim/closed_loop.simulate_traffic`` (the analogue of the reference's
BehaviorAgent-driven NPC, ``/root/reference/test_9.py:288-291,344``,
``agents/navigation/behavior_agent.py:150-199``).

Deliberately shares no code with the JAX path (the golden-oracle
independence requirement); the *intended math* matches ``sim/npc.py``
term for term, including tie-breaking and guard constants.
"""

from __future__ import annotations

import math

import numpy as np

LANE_WIDTH = 3.5
LANE_CHANGE_RATE = 1.75

_PRESETS = {
    "cautious": (30.0 / 3.6, 3.0, 12.0, 1.5, 3.0),
    "normal": (40.0 / 3.6, 2.0, 10.0, 2.0, 4.0),
    "aggressive": (50.0 / 3.6, 1.0, 8.0, 3.0, 5.0),
}


def preset(name):
    """(max_speed, safety_time, min_distance, accel, decel) — float64."""
    return tuple(float(v) for v in _PRESETS[name])


def idm_accel(v, v_lead, gap, p):
    max_speed, safety_time, min_distance, accel, decel = p
    s_star = min_distance + max(
        v * safety_time + v * (v - v_lead) / (2.0 * math.sqrt(accel * decel)),
        0.0,
    )
    gap = max(gap, 0.5)
    return accel * (
        1.0 - (v / max(max_speed, 0.1)) ** 4 - (s_star / gap) ** 2
    )


def nearest_index_windowed(px, py, xs, ys, center, window=32):
    n = len(xs)
    lo = min(max(int(center), 0), max(n - window, 0))
    d2 = (xs[lo : lo + window] - px) ** 2 + (ys[lo : lo + window] - py) ** 2
    return lo + int(np.argmin(d2))


def lateral_offset_on_path(x, y, xs, ys, ths, idx):
    th = ths[idx]
    return -(x - xs[idx]) * math.sin(th) + (y - ys[idx]) * math.cos(th)


def lead_info(x, y, phi, others, lateral_shift=0.0):
    """others: list of (ox, oy, ov, valid). Returns (gap, lead_speed)."""
    ux, uy = math.cos(phi), math.sin(phi)
    nx, ny = -uy, ux
    cx = x + lateral_shift * nx
    cy = y + lateral_shift * ny
    gap, v = math.inf, 100.0
    for (ox, oy, ov, valid) in others:
        if not valid:
            continue
        dx, dy = ox - cx, oy - cy
        d_long = dx * ux + dy * uy
        d_lat = -dx * uy + dy * ux
        if d_long > 0.5 and abs(d_lat) < 2.0 and d_long < gap:
            gap, v = d_long, ov
    if math.isinf(gap):
        return 1e4, 100.0
    return gap, v


def corridor_free(x, y, phi, lateral_shift, others,
                  back=8.0, ahead=20.0, half_width=1.8):
    ux, uy = math.cos(phi), math.sin(phi)
    nx, ny = -uy, ux
    cx = x + lateral_shift * nx
    cy = y + lateral_shift * ny
    for (ox, oy, _ov, valid) in others:
        if not valid:
            continue
        dx, dy = ox - cx, oy - cy
        d_long = dx * ux + dy * uy
        d_lat = -dx * uy + dy * ux
        if -back < d_long < ahead and abs(d_lat) < half_width:
            return False
    return True


def lane_change_decision(offset, target, gap_own, v_lead_own, v_self,
                         left_free, right_free, own_free, p):
    max_speed, safety_time, min_distance, _accel, _decel = p
    press_gap = min_distance + v_self * safety_time
    blocked = (gap_own < 1.5 * press_gap) and (v_lead_own < 0.8 * max_speed)
    in_lane = abs(target) < 0.1
    if blocked and in_lane and left_free:
        target = LANE_WIDTH
    elif blocked and in_lane and right_free:
        target = -LANE_WIDTH
    if (not in_lane) and own_free and (not blocked):
        # anti-flap hysteresis: stay out until the pressure releases
        target = 0.0
    return offset, target


def slew_lane(offset, target, dt):
    d = min(max(target - offset, -LANE_CHANGE_RATE * dt),
            LANE_CHANGE_RATE * dt)
    return offset + d, target


def npc_step(x, y, phi, v, path_index, xs, ys, ths,
             lead_dist, lead_speed, p, vp, dt, lane_offset=0.0):
    """One agent tick — pure pursuit + IDM + kinematic bicycle (mirror of
    ``npc.npc_step``). Returns (x, y, phi, v, path_index)."""
    n = len(xs)
    idx = nearest_index_windowed(x, y, xs, ys, path_index, 32)
    look = min(max(idx + 2 + int(v / 4.0), 0), n - 1)
    th_l = ths[look]
    dx = xs[look] - lane_offset * math.sin(th_l) - x
    dy = ys[look] + lane_offset * math.cos(th_l) - y
    alpha = math.atan2(dy, dx) - phi
    alpha = math.atan2(math.sin(alpha), math.cos(alpha))
    L = vp.a + vp.b
    ld = max(math.hypot(dx, dy), 1.0)
    delta = math.atan2(2.0 * L * math.sin(alpha), ld)
    steer = min(max(delta / vp.max_steer_rad, -1.0), 1.0)

    _ms, _st, _md, p_accel, p_decel = p
    accel = min(max(idm_accel(v, lead_speed, lead_dist, p), -p_decel), p_accel)

    v2 = max(v + accel * dt, 0.0)
    omega = v2 * math.tan(steer * vp.max_steer_rad) / L
    phi2 = phi + omega * dt
    x2 = x + v2 * math.cos(phi2) * dt
    y2 = y + v2 * math.sin(phi2) * dt
    return x2, y2, phi2, v2, idx
