"""Traffic lights: phase function, ego red-light stop, NPC compliance
(the reference's BasicAgent red-light brake, basic_agent.py:201-249)."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emplanner_carla_tpu.config import EMConfig
from emplanner_carla_tpu.sim import closed_loop, scenario, traffic_light as tl
from emplanner_carla_tpu.types import EgoState, Obstacles, Path


def test_phase_function():
    lights = tl.TrafficLights(
        jnp.zeros(1), jnp.zeros(1), jnp.asarray([10.0]), jnp.asarray([0.0]),
        jnp.asarray([0.4]), jnp.ones(1, bool),
    )
    assert bool(tl.is_green(lights, jnp.float32(0.1))[0])
    assert bool(tl.is_green(lights, jnp.float32(3.9))[0])
    assert not bool(tl.is_green(lights, jnp.float32(4.1))[0])
    assert not bool(tl.is_green(lights, jnp.float32(9.9))[0])
    assert bool(tl.is_green(lights, jnp.float32(10.1))[0])  # wraps


def _straight_scenario(cfg):
    n = 160
    s = jnp.arange(n) * 2.0
    gp = Path(s, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n))
    K = cfg.n_static_obs + cfg.n_dynamic_obs
    obstacles = Obstacles(*(jnp.zeros(K) for _ in range(4)), jnp.zeros(K, bool))
    z = jnp.zeros(())
    ego0 = EgoState(
        gp.x[0], gp.y[0], gp.theta[0], jnp.asarray(10.0, jnp.float32),
        z, z, z, z, z,
    )
    return scenario.Scenario(gp, ego0, obstacles)


def test_ego_stops_at_red_then_proceeds():
    """Red for t in [0, 6), green after: the ego must hold short of the
    stop line at x = 60 and then drive through."""
    cfg = EMConfig(loop=replace(EMConfig().loop, n_plans=12))
    sc = _straight_scenario(cfg)
    # period 16, green_frac 0.5, offset 8 -> phase = (t+8) % 16: red on
    # [0, 8), green on [8, 16)
    lights = scenario.lights_on_path(
        sc.global_path, [60.0], period=16.0, green_frac=0.5, offsets=[8.0]
    )
    carry, m = closed_loop.simulate(
        sc.global_path, sc.ego0, sc.obstacles, cfg, lights=lights
    )
    xs = np.asarray(m.x).reshape(-1)
    vs = np.asarray(m.speed_kmh).reshape(-1)
    dt = cfg.plant.dt
    t = (np.arange(xs.size) + 1) * dt
    # while red: never crosses the stop line
    red = t < 8.0
    assert xs[red].max() < 60.0, f"ran the red at x={xs[red].max():.1f}"
    # nearly stopped at some point during the red phase
    assert vs[red].min() < 3.0
    # proceeds once green
    assert xs[-1] > 75.0, f"never proceeded (x_end={xs[-1]:.1f})"
    assert not bool(closed_loop.summarize(m)["collided"])


def test_ego_ignores_green_light():
    cfg = EMConfig(loop=replace(EMConfig().loop, n_plans=6))
    sc = _straight_scenario(cfg)
    lights = scenario.lights_on_path(
        sc.global_path, [60.0], period=1000.0, green_frac=1.0
    )
    carry, m = closed_loop.simulate(
        sc.global_path, sc.ego0, sc.obstacles, cfg, lights=lights
    )
    xs = np.asarray(m.x).reshape(-1)
    assert xs[-1] > 70.0  # sailed through


def test_npc_agent_stops_at_red():
    """An agent NPC must hold at a red light (stationary IDM lead)."""
    cfg = EMConfig(loop=replace(EMConfig().loop, n_plans=12))
    n = 160
    s = jnp.arange(n) * 2.0
    gp = Path(s, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n))
    K = cfg.n_static_obs + cfg.n_dynamic_obs
    slot = jnp.arange(K)
    dyn = slot == cfg.n_static_obs
    # NPC 30 m ahead of the ego, moving at 8 m/s toward a permanently red
    # light at x = 80
    ox = jnp.where(dyn, 30.0, 0.0)
    ovx = jnp.where(dyn, 8.0, 0.0)
    obstacles = Obstacles(ox, jnp.zeros(K), ovx, jnp.zeros(K), dyn)
    z = jnp.zeros(())
    ego0 = EgoState(gp.x[0], gp.y[0], gp.theta[0],
                    jnp.asarray(8.0, jnp.float32), z, z, z, z, z)
    lights = scenario.lights_on_path(
        gp, [80.0], period=1000.0, green_frac=0.0
    )
    carry, m = closed_loop.simulate_traffic(
        gp, ego0, obstacles, cfg, lights=lights
    )
    i = cfg.n_static_obs
    npc_x = float(carry.loop.obstacles.x[i])
    npc_v = float(jnp.hypot(carry.loop.obstacles.vx[i],
                            carry.loop.obstacles.vy[i]))
    assert npc_x < 80.0, f"NPC ran the red (x={npc_x:.1f})"
    assert npc_v < 1.0, f"NPC still moving at the red (v={npc_v:.1f})"
    # the ego queues up behind without collision
    assert not bool(closed_loop.summarize(m)["collided"])
