"""Scenario construction: synthetic roads, ego spawns, obstacle layouts.

Replaces the reference's hand-placed CARLA Town05 scenario (ego spawn 259,
three parked cars at fixed coordinates, one NPC — ``test_9.py:238-291``)
with procedurally generated, seedable, fixed-shape scenarios that `vmap`
into fleets (BASELINE.md config 5).

A road is a curvature-profile centerline: kappa(s) as a sum of smooth random
bumps, integrated to heading and position and sampled every ``ds`` metres —
the same (x, y, theta, kappa) global-path contract the reference's routing
layer produces (``planning_utils.waypoint_list_2_target_path``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from emplanner_carla_tpu.config import EMConfig
from emplanner_carla_tpu.ops import frenet
from emplanner_carla_tpu.types import Array, EgoState, Obstacles, Path


class Scenario(NamedTuple):
    global_path: Path
    ego0: EgoState
    obstacles: Obstacles


def synthetic_centerline(
    key: Array, n: int = 256, ds: float = 2.0, max_kappa: float = 0.02
) -> Path:
    """Random smooth centerline of n nodes at ds spacing.

    kappa(s) = sum of M random raised-cosine bumps, clipped to |max_kappa|
    (r_min = 50 m keeps the Frenet transforms well inside the 1 - kappa*l > 0
    validity region for |l| <= 10).
    """
    M = 6
    k_amp, k_pos, k_width = jax.random.split(key, 3)
    s = jnp.arange(n) * ds
    total = n * ds
    amps = jax.random.uniform(k_amp, (M,), minval=-max_kappa, maxval=max_kappa)
    centers = jax.random.uniform(k_pos, (M,), minval=0.0, maxval=total)
    widths = jax.random.uniform(k_width, (M,), minval=40.0, maxval=120.0)
    arg = (s[:, None] - centers[None, :]) / widths[None, :]
    bump = jnp.where(jnp.abs(arg) < 1.0, 0.5 * (1.0 + jnp.cos(jnp.pi * arg)), 0.0)
    kappa = jnp.clip(jnp.sum(amps[None, :] * bump, axis=1), -max_kappa, max_kappa)
    theta = jnp.cumsum(kappa * ds) - kappa[0] * ds
    x = jnp.cumsum(jnp.cos(theta) * ds) - jnp.cos(theta[0]) * ds
    y = jnp.cumsum(jnp.sin(theta) * ds) - jnp.sin(theta[0]) * ds
    return Path(x, y, theta, kappa)


def place_on_path(path: Path, s: Array, l: Array):
    """World position of Frenet (s, l) relative to the path start."""
    s_map = frenet.arc_length(path)
    x, y, theta, _ = frenet.proj_point_at_s(s, path, s_map)
    return x - l * jnp.sin(theta), y + l * jnp.cos(theta), theta


def make_scenario(
    key: Array,
    cfg: EMConfig,
    n_path: int = 256,
    path_ds: float = 2.0,
    v0: float = 8.0,
    n_active_static: int = 3,
    with_dynamic: bool = True,
    npc_speed: float = 30.0 / 3.6,
) -> Scenario:
    """One randomized scenario mirroring the test_9 layout: ego at the path
    start, a few parked cars near the line ahead, one slower lead NPC."""
    k_path, k_s, k_l, k_dyn = jax.random.split(key, 4)
    gp = synthetic_centerline(k_path, n_path, path_ds)

    K = cfg.n_static_obs + cfg.n_dynamic_obs
    slot = jnp.arange(K)
    is_static_slot = slot < cfg.n_static_obs
    static_active = slot < n_active_static

    # spread static obstacles over disjoint s bands so they never stack on
    # the spawn point or each other
    s_max = min(300.0, n_path * path_ds - 100.0)
    band = (s_max - 60.0) / max(cfg.n_static_obs, 1)
    obs_s = (
        60.0
        + band * jnp.arange(K, dtype=jnp.float32)
        + jax.random.uniform(k_s, (K,), minval=0.1 * band, maxval=0.9 * band)
    )
    obs_l = jax.random.uniform(k_l, (K,), minval=-1.0, maxval=1.0)

    dyn_slot = slot == cfg.n_static_obs  # first dynamic slot
    dyn_s0 = jax.random.uniform(k_dyn, (), minval=30.0, maxval=45.0)
    obs_s = jnp.where(dyn_slot, dyn_s0, obs_s)
    obs_l = jnp.where(dyn_slot, 0.0, obs_l)

    ox, oy, oth = place_on_path(gp, obs_s, obs_l)
    dyn_active = dyn_slot & with_dynamic
    ovx = jnp.where(dyn_active, npc_speed * jnp.cos(oth), 0.0)
    ovy = jnp.where(dyn_active, npc_speed * jnp.sin(oth), 0.0)
    valid = (is_static_slot & static_active) | dyn_active
    obstacles = Obstacles(ox, oy, ovx, ovy, valid)

    z = jnp.zeros(())
    ego0 = EgoState(
        gp.x[0], gp.y[0], gp.theta[0], jnp.asarray(v0, jnp.float32), z, z, z, z, z
    )
    return Scenario(gp, ego0, obstacles)


def batch_scenarios(key: Array, batch: int, cfg: EMConfig, **kw) -> Scenario:
    """A vmapped batch of randomized scenarios (the fleet input)."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: make_scenario(k, cfg, **kw))(keys)
