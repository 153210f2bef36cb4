"""Aux subsystems: sensors, NPC agents, reporting, checkpoint/resume."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emplanner_carla_tpu.config import EMConfig
from emplanner_carla_tpu.ops import frenet
from emplanner_carla_tpu.sim import closed_loop, npc, scenario, sensors
from emplanner_carla_tpu.types import EgoState, Obstacles

CFG = EMConfig()


def make_ego(x=0.0, y=0.0, phi=0.0, vx=10.0):
    z = jnp.zeros(())
    return EgoState(
        jnp.float32(x), jnp.float32(y), jnp.float32(phi), jnp.float32(vx),
        z, z, z, z, z,
    )


def make_obs(entries):
    K = 4
    a = np.zeros((4, K), np.float32)
    v = np.zeros(K, bool)
    for i, e in enumerate(entries):
        a[:, i] = e
        v[i] = True
    return Obstacles(*(jnp.asarray(r) for r in a), jnp.asarray(v))


class TestSensors:
    def test_collision_depth(self):
        obs = make_obs([(5.0, 0.0, 0, 0), (0.8, 0.0, 0, 0)])
        d = sensors.collision_depth(make_ego(), obs)
        assert float(d) == pytest.approx(1.5 - 0.8, abs=1e-5)

    def test_lane_invasion(self):
        path = frenet.path_from_xy(jnp.arange(50.0) * 2.0, jnp.zeros(50))
        sm = frenet.arc_length(path)
        assert not bool(sensors.lane_invasion(make_ego(y=0.5), path, sm))
        assert bool(sensors.lane_invasion(make_ego(y=2.5), path, sm))

    def test_radar_fov_and_closing(self):
        obs = make_obs([(30.0, 0.0, -5.0, 0.0), (0.0, 40.0, 0.0, 0.0)])
        r = sensors.radar(make_ego(vx=10.0), obs)
        assert bool(r.valid[0])       # dead ahead, in FOV
        assert not bool(r.valid[1])   # 90 deg off-axis, outside FOV
        # ego at 10 m/s toward obstacle moving -5 -> closing 15 m/s
        assert float(r.velocity[0]) == pytest.approx(15.0, abs=0.1)

    def test_imu_body_frame(self):
        ego = make_ego(phi=np.pi / 2)._replace(
            ax=jnp.float32(0.0), ay=jnp.float32(2.0)
        )
        ax_b, ay_b, omega = sensors.imu(ego)
        assert float(ax_b) == pytest.approx(2.0, abs=1e-5)

    def test_gnss_noise(self):
        x, y = sensors.gnss(make_ego(x=100.0, y=50.0))
        assert float(x) == 100.0
        x2, y2 = sensors.gnss(
            make_ego(x=100.0, y=50.0), key=jax.random.PRNGKey(0), sigma=0.5
        )
        assert float(x2) != 100.0

    def test_gnss_geodetic(self):
        # One degree of latitude = earth_radius * pi/180 metres north.
        m_per_deg = sensors._EARTH_RADIUS * np.pi / 180.0
        fix = sensors.gnss_geodetic(make_ego(x=0.0, y=m_per_deg))
        assert float(fix.latitude) == pytest.approx(1.0, rel=1e-5)
        assert float(fix.longitude) == pytest.approx(0.0, abs=1e-7)
        # Longitude degrees shrink by cos(lat0) away from the equator.
        fix60 = sensors.gnss_geodetic(
            make_ego(x=m_per_deg, y=0.0), lat0=60.0, alt0=3.0
        )
        assert float(fix60.longitude) == pytest.approx(2.0, rel=1e-4)
        assert float(fix60.latitude) == pytest.approx(60.0, rel=1e-6)
        assert float(fix60.altitude) == 3.0
        # Noise hook mirrors the blueprint sigma attributes.
        noisy = sensors.gnss_geodetic(
            make_ego(), key=jax.random.PRNGKey(1), sigma_deg=1e-4
        )
        assert float(noisy.latitude) != 0.0


class TestNPC:
    def test_presets_ordering(self):
        c, n, a = npc.preset("cautious"), npc.preset("normal"), npc.preset("aggressive")
        assert float(c.max_speed) < float(n.max_speed) < float(a.max_speed)
        assert float(c.safety_time) > float(a.safety_time)

    def test_idm_free_road_accelerates(self):
        p = npc.preset("normal")
        a = npc.idm_accel(jnp.float32(5.0), jnp.float32(100.0), jnp.float32(1e4), p)
        assert float(a) > 0.5

    def test_idm_brakes_behind_lead(self):
        p = npc.preset("normal")
        a = npc.idm_accel(jnp.float32(10.0), jnp.float32(2.0), jnp.float32(8.0), p)
        assert float(a) < -1.0

    def test_npc_follows_path(self):
        path = frenet.path_from_xy(jnp.arange(200.0) * 2.0, jnp.zeros(200))
        p = npc.preset("normal")
        st = npc.NPCState(make_ego(vx=5.0), jnp.int32(0), jnp.asarray(True))
        for _ in range(300):
            st = npc.npc_step(
                st, path, jnp.float32(1e4), jnp.float32(100.0), p,
                CFG.vehicle, 0.01,
            )
        assert float(st.ego.x) > 15.0            # made progress
        assert abs(float(st.ego.y)) < 0.5        # stayed on the line
        assert float(st.ego.vx) <= float(p.max_speed) + 0.5


class TestReportAndCheckpoint:
    @pytest.fixture(scope="class")
    def run(self):
        cfg = EMConfig(
            loop=dataclasses.replace(EMConfig().loop, n_plans=3)
        )
        sc = scenario.make_scenario(jax.random.PRNGKey(0), cfg)
        carry, metrics = closed_loop.simulate(
            sc.global_path, sc.ego0, sc.obstacles, cfg
        )
        return cfg, sc, carry, metrics

    def test_run_report(self, run, tmp_path):
        cfg, sc, carry, metrics = run
        from emplanner_carla_tpu.utils import report

        out = report.run_report(metrics, cfg, path=str(tmp_path / "r.json"))
        assert out["ticks"] == cfg.loop.n_plans * cfg.loop.plan_every
        assert out["distance_m"] > 10.0
        assert (tmp_path / "r.json").exists()

    def test_plot_run(self, run, tmp_path):
        cfg, sc, carry, metrics = run
        from emplanner_carla_tpu.utils import report

        p = report.plot_run(metrics, sc, cfg, path=str(tmp_path / "run.png"))
        assert (tmp_path / "run.png").stat().st_size > 10000

    def test_animate_run(self, run, tmp_path):
        cfg, sc, carry, metrics = run
        from PIL import Image

        from emplanner_carla_tpu.utils import report

        p = report.animate_run(
            metrics, sc, cfg, path=str(tmp_path / "run.gif"), every=50,
            camera=True,
        )
        img = Image.open(p)
        assert img.format == "GIF"
        n = getattr(img, "n_frames", 1)
        assert n == (cfg.loop.n_plans * cfg.loop.plan_every + 49) // 50
        assert (tmp_path / "run.gif").stat().st_size > 20000

    def test_checkpoint_roundtrip_and_resume(self, run, tmp_path):
        cfg, sc, carry, metrics = run
        from emplanner_carla_tpu.utils import checkpoint

        path = str(tmp_path / "ckpt")
        checkpoint.save(path, carry)
        restored = checkpoint.restore(path, jax.tree.map(np.asarray, carry))
        np.testing.assert_allclose(
            np.asarray(restored.ego.x), np.asarray(carry.ego.x)
        )
        carry2, m2 = checkpoint.resume_simulation(
            sc.global_path, restored, cfg, n_plans=2
        )
        assert bool(jnp.all(jnp.isfinite(m2.lateral_err)))
        # the resumed run continues from the restored pose
        d0 = np.hypot(
            float(carry2.ego.x) - float(carry.ego.x),
            float(carry2.ego.y) - float(carry.ego.y),
        )
        assert d0 > 5.0  # it moved on


class TestTrafficCheckpoint:
    def test_traffic_resume_continues_lane_change(self, tmp_path):
        """Checkpoint/resume of the agent-traffic loop preserves the NPC
        agents' carried state: an NPC checkpointed MID-lane-change resumes
        and completes the maneuver instead of snapping back to centre."""
        import dataclasses

        from emplanner_carla_tpu.sim import npc as npc_mod
        from emplanner_carla_tpu.types import EgoState, Obstacles, Path
        from emplanner_carla_tpu.utils import checkpoint

        cfg = EMConfig(
            loop=dataclasses.replace(EMConfig().loop, n_plans=2)
        )
        n = 200
        s_ax = jnp.arange(n) * 2.0
        gp = Path(s_ax, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n))
        K = cfg.n_static_obs + cfg.n_dynamic_obs
        d0 = cfg.n_static_obs
        # parked car blocks the agent NPC's lane (the lane-change parity
        # scenario of test_fidelity, shortened)
        ox = jnp.zeros(K).at[0].set(60.0).at[d0].set(20.0)
        ovx = jnp.zeros(K).at[d0].set(8.0)
        valid = jnp.zeros(K, bool).at[0].set(True).at[d0].set(True)
        obstacles = Obstacles(ox, jnp.zeros(K), ovx, jnp.zeros(K), valid)
        z = jnp.zeros(())
        ego0 = EgoState(gp.x[0], z, z, jnp.float32(5.0), z, z, z, z, z)

        carry, _ = closed_loop.simulate_traffic(
            gp, ego0, obstacles, cfg, behavior="normal"
        )
        off_mid = float(carry.npc_lane.offset[d0])
        assert 0.5 < off_mid < 3.4, off_mid   # checkpointed MID-maneuver

        path = str(tmp_path / "traffic_ckpt")
        checkpoint.save(path, carry)
        restored = checkpoint.restore(path, jax.tree.map(np.asarray, carry))
        carry2, m2 = checkpoint.resume_simulation(
            gp, restored, cfg, n_plans=2, behavior="normal"
        )
        assert bool(jnp.all(jnp.isfinite(m2.lateral_err)))
        # maneuver completed from the restored offset (no snap-back)
        off_end = float(carry2.npc_lane.offset[d0])
        assert off_end > off_mid
        assert float(carry2.npc_lane.target[d0]) == 3.5
        assert not bool(np.asarray(m2.collided).any())


class TestTrafficLoop:
    def test_npc_driven_closed_loop(self):
        sc = scenario.make_scenario(jax.random.PRNGKey(0), CFG)
        carry, m = closed_loop.simulate_traffic(
            sc.global_path, sc.ego0, sc.obstacles, CFG
        )
        s = closed_loop.summarize(m)
        assert not bool(s["collided"])
        assert bool(np.isfinite(np.asarray(m.lateral_err)).all())
        # the NPC slot actually drove along the route
        i = CFG.n_static_obs
        moved = np.hypot(
            float(carry.loop.obstacles.x[i]) - float(sc.obstacles.x[i]),
            float(carry.loop.obstacles.y[i]) - float(sc.obstacles.y[i]),
        )
        assert moved > 20.0
        idx = frenet.nearest_index(
            carry.loop.obstacles.x[i], carry.loop.obstacles.y[i], sc.global_path
        )
        off_path = float(
            jnp.hypot(
                sc.global_path.x[idx] - carry.loop.obstacles.x[i],
                sc.global_path.y[idx] - carry.loop.obstacles.y[i],
            )
        )
        # within its own lane or one lane-change offset to the side
        from emplanner_carla_tpu.sim import npc as npc_mod

        assert off_path < 1.5 + npc_mod.LANE_WIDTH

    @pytest.mark.parametrize("behavior", ["cautious", "aggressive"])
    def test_behavior_presets_run(self, behavior):
        import dataclasses

        cfg = EMConfig(loop=dataclasses.replace(EMConfig().loop, n_plans=5))
        sc = scenario.make_scenario(jax.random.PRNGKey(1), cfg)
        carry, m = closed_loop.simulate_traffic(
            sc.global_path, sc.ego0, sc.obstacles, cfg, behavior=behavior
        )
        assert bool(np.isfinite(np.asarray(m.lateral_err)).all())

    def test_npc_lane_change_around_parked_car(self):
        """A blocked agent must move out, pass, and fall back in —
        the overtake/tailgating behavior of behavior_agent.py:150-199."""
        import dataclasses

        from emplanner_carla_tpu.sim import npc as npc_mod
        from emplanner_carla_tpu.types import EgoState, Path

        n = 200
        path = Path(
            jnp.arange(n) * 2.0, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n)
        )
        z = jnp.zeros(())
        npc0 = npc_mod.NPCState(
            EgoState(jnp.float32(0.0), z, z, jnp.float32(8.0), z, z, z, z, z),
            jnp.int32(0),
            jnp.ones((), bool),
        )
        parked_x = jnp.asarray([60.0])
        parked_y = jnp.asarray([0.0])
        parked_valid = jnp.ones(1, bool)
        p = npc_mod.preset("normal")
        dt = 0.05

        def tick(carry, _):
            st, lane = carry
            lane = npc_mod.slew_lane(lane, dt)
            sl = npc_mod.LaneState(lane.offset[0], lane.target[0])
            l_now = npc_mod.lateral_offset_on_path(st.ego, path, st.path_index)
            gap_own, v_own = npc_mod.lead_info(
                st.ego, parked_x, parked_y, jnp.zeros(1), parked_valid,
                lateral_shift=-l_now,
            )
            gap_tgt, v_tgt = npc_mod.lead_info(
                st.ego, parked_x, parked_y, jnp.zeros(1), parked_valid,
                lateral_shift=sl.target - l_now,
            )
            left_free = npc_mod.corridor_free(
                st.ego, npc_mod.LANE_WIDTH - l_now, parked_x, parked_y,
                parked_valid,
            )
            right_free = npc_mod.corridor_free(
                st.ego, -npc_mod.LANE_WIDTH - l_now, parked_x, parked_y,
                parked_valid,
            )
            own_free = npc_mod.corridor_free(
                st.ego, -l_now, parked_x, parked_y, parked_valid
            )
            sl = npc_mod.lane_change_decision(
                sl, gap_own, v_own, st.ego.vx, left_free, right_free,
                own_free, p,
            )
            lane = npc_mod.LaneState(sl.offset[None], sl.target[None])
            st = npc_mod.npc_step(
                st, path, gap_tgt, v_tgt, p, CFG.vehicle, dt,
                lane_offset=sl.offset,
            )
            return (st, lane), (st.ego.x, st.ego.y)

        lane0 = npc_mod.LaneState.init(1)
        (st_end, lane_end), (xs, ys) = jax.lax.scan(
            tick, (npc0, lane0), None, length=600
        )
        xs = np.asarray(xs)
        ys = np.asarray(ys)
        # passed the parked car without collision
        d = np.hypot(xs - 60.0, ys - 0.0)
        assert d.min() > 1.5, f"min clearance {d.min():.2f}"
        assert float(st_end.ego.x) > 80.0, "did not pass the parked car"
        # actually moved into the adjacent lane mid-maneuver
        assert ys.max() > 2.0
        # ... and came back toward its own lane afterwards
        assert abs(ys[-1]) < 1.5

    def test_walker_crossing_full_em(self):
        """A crossing pedestrian (walker slot): the full EM loop must see it
        in the ST graph and drive collision-free."""
        import dataclasses

        cfg = EMConfig(loop=dataclasses.replace(EMConfig().loop, n_plans=8))
        sc = scenario.make_scenario(
            jax.random.PRNGKey(2), cfg, with_dynamic=False,
            n_active_static=0, with_walker=True, v0=10.0,
        )
        # walker slot is active and moving at walking speed
        w = cfg.n_static_obs + 1
        assert bool(sc.obstacles.valid[w])
        wspeed = float(jnp.hypot(sc.obstacles.vx[w], sc.obstacles.vy[w]))
        assert wspeed == pytest.approx(scenario.WALKER_SPEED, rel=1e-5)
        carry, m = closed_loop.simulate_full(
            sc.global_path, sc.ego0, sc.obstacles, cfg
        )
        s = closed_loop.summarize(m)
        assert not bool(s["collided"])
        assert bool(np.isfinite(np.asarray(m.lateral_err)).all())

    def test_traffic_full_em(self):
        """Agent NPCs + the full EM pipeline in one loop (test_10's intent
        with live traffic)."""
        import dataclasses

        cfg = EMConfig(loop=dataclasses.replace(EMConfig().loop, n_plans=5))
        sc = scenario.make_scenario(jax.random.PRNGKey(3), cfg)
        carry, m = closed_loop.simulate_traffic(
            sc.global_path, sc.ego0, sc.obstacles, cfg, full=True
        )
        s = closed_loop.summarize(m)
        assert not bool(s["collided"])
        assert bool(np.isfinite(np.asarray(m.lateral_err)).all())
        assert float(s["mean_speed_kmh"]) > 15.0
