"""Driving from pixels: camera -> detector -> tracker -> planner, closed.

Beyond-reference: the reference's YOLO demo (simulation_2.py:159-233) never
feeds the planner — its loops always plan on simulator ground truth. These
tests close the sensing chain and check the ego still avoids what it can
only *see*.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from emplanner_carla_tpu.config import EMConfig
from emplanner_carla_tpu.sim import camera, closed_loop, pixel_loop
from emplanner_carla_tpu.types import EgoState, Obstacles, Path

CAM = camera.CameraConfig(width=96, height=64)


def straight_scenario(cfg, obs_list, v0=8.0):
    n = 256
    x = jnp.arange(n, dtype=jnp.float32) * 2.0
    z = jnp.zeros(n, jnp.float32)
    gp = Path(x, z, z, z)
    zz = jnp.zeros(())
    ego = EgoState(
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(v0), zz, zz, zz, zz, zz,
    )
    K = cfg.n_static_obs + cfg.n_dynamic_obs
    ox = np.zeros(K, np.float32)
    oy = np.zeros(K, np.float32)
    ovx = np.zeros(K, np.float32)
    ovy = np.zeros(K, np.float32)
    valid = np.zeros(K, bool)
    for i, (xi, yi, vxi) in enumerate(obs_list):
        ox[i], oy[i], ovx[i], valid[i] = xi, yi, vxi, True
    obs = Obstacles(*(jnp.asarray(a) for a in (ox, oy, ovx, ovy, valid)))
    return gp, ego, obs


def test_avoids_static_obstacle_seen_only_through_camera():
    cfg = EMConfig(
        loop=dataclasses.replace(EMConfig().loop, n_plans=10)
    )
    gp, ego, obs = straight_scenario(cfg, [(60.0, 0.3, 0.0)])
    carry, pm = pixel_loop.simulate_pixels(gp, ego, obs, cfg, CAM)

    ticks = pm.ticks
    assert not bool(np.asarray(ticks.collided).any())
    # the ego made it past the obstacle's station
    assert float(carry.loop.ego.x) > 75.0
    # it passed NEAR the obstacle (i.e. the swerve was a real avoidance,
    # not a trivially off-road obstacle): closest true approach in
    # (collision radius, 6 m)
    d = np.hypot(
        np.asarray(ticks.x) - 60.0, np.asarray(ticks.y) - 0.3
    ).min()
    assert closed_loop.COLLISION_RADIUS < d < 6.0, d
    # the camera saw it: a track existed from the first cycle and matched
    # the true position to sub-metre accuracy once within ~50 m
    n_tracked = np.asarray(pm.n_tracked)
    assert n_tracked[0] >= 1
    perc_err = np.asarray(pm.perc_err)
    assert perc_err[2:6].max() < 0.8, perc_err


def test_tracker_recovers_lead_velocity():
    """A 30 km/h lead seen only through the camera: after two cycles the
    tracker's velocity estimate is within 25% of truth, and the ego does
    not rear-end it."""
    cfg = EMConfig(
        loop=dataclasses.replace(EMConfig().loop, n_plans=6)
    )
    v_npc = 30.0 / 3.6
    gp, ego, obs = straight_scenario(cfg, [(35.0, 0.0, v_npc)])
    carry, pm = pixel_loop.simulate_pixels(gp, ego, obs, cfg, CAM)

    assert not bool(np.asarray(pm.ticks.collided).any())
    tr = carry.tracks
    valid = np.asarray(tr.valid)
    assert valid.any()
    vxs = np.asarray(tr.vx)[valid]
    best = vxs[np.argmax(vxs)]
    assert abs(best - v_npc) < 0.25 * v_npc, (vxs, v_npc)


def test_pixel_loop_vmaps():
    cfg = EMConfig(
        loop=dataclasses.replace(EMConfig().loop, n_plans=3)
    )
    gp, ego, obs = straight_scenario(cfg, [(50.0, -0.5, 0.0)])
    B = 2
    gps, egos, obss = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), (gp, ego, obs)
    )
    carry, pm = jax.vmap(
        lambda g, e, o: pixel_loop.simulate_pixels(g, e, o, cfg, CAM)
    )(gps, egos, obss)
    assert pm.ticks.x.shape[:2] == (B, 3)
    assert np.isfinite(np.asarray(pm.ticks.lateral_err)).all()
