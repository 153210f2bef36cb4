"""S-T speed planning: ST graph, DP vs oracle, convex space, QP, densify."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emplanner_carla_tpu.config import SpeedPlanConfig
from emplanner_carla_tpu.oracle import speed_np
from emplanner_carla_tpu.planner import speed_planner
from emplanner_carla_tpu.types import STSegments

CFG = SpeedPlanConfig()
K = 4


def pack_dyn(obs):
    """obs: list of (s, l, s_dot, l_dot)."""
    a = np.zeros((4, K), np.float32)
    v = np.zeros(K, bool)
    for i, o in enumerate(obs):
        a[:, i] = o
        v[i] = True
    return [jnp.asarray(x) for x in a] + [jnp.asarray(v)]


def test_st_graph_matches_oracle():
    obs = [
        (20.0, -6.0, 5.0, 1.2),    # crossing toward the path
        (30.0, 4.0, 3.0, -0.8),    # crossing from the left
        (15.0, 1.0, 5.0, 0.05),    # slow lateral -> skipped
        (40.0, -30.0, 2.0, 0.5),   # too far/too late -> gated
    ]
    s, l, sd, ld, valid = pack_dyn(obs)
    seg = speed_planner.st_graph(s, l, sd, ld, valid, CFG)
    ref = speed_np.st_graph(*[[o[i] for o in obs] for i in range(4)])
    got = [
        (float(seg.s_in[i]), float(seg.s_out[i]), float(seg.t_in[i]),
         float(seg.t_out[i]))
        for i in range(K) if bool(seg.valid[i])
    ]
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, atol=1e-4)


@pytest.mark.parametrize("case", ["free", "yield", "overtake"])
def test_speed_dp_matches_oracle(case):
    if case == "free":
        obs = []
        v0 = 10.0
    elif case == "yield":
        # obstacle crossing ahead soon: DP should slow down
        obs = [(18.0, -5.0, 1.0, 1.4)]
        v0 = 12.0
    else:
        # obstacle crossing far ahead and slow: DP can pass first
        obs = [(35.0, -8.0, 0.5, 1.0)]
        v0 = 13.9
    if obs:
        s, l, sd, ld, valid = pack_dyn(obs)
        seg = speed_planner.st_graph(s, l, sd, ld, valid, CFG)
        segs_np = speed_np.st_graph(*[[o[i] for o in obs] for i in range(4)])
    else:
        z = jnp.zeros(K)
        seg = STSegments(z, z, z, z, jnp.zeros(K, bool))
        segs_np = []
    dp = speed_planner.speed_dp(seg, jnp.float32(v0), CFG)
    ref_s, ref_valid, ref_end = speed_np.speed_dp(
        segs_np, v0, np.asarray(CFG.s_grid),
        v_ref=CFG.reference_speed,
    )
    assert int(dp.end_index) == ref_end
    np.testing.assert_allclose(
        np.asarray(dp.s)[ref_valid], ref_s[ref_valid], atol=1e-3
    )


def test_speed_dp_free_flow_accelerates():
    z = jnp.zeros(K)
    seg = STSegments(z, z, z, z, jnp.zeros(K, bool))
    dp = speed_planner.speed_dp(seg, jnp.float32(10.0), CFG)
    s = np.asarray(dp.s)[np.asarray(dp.valid)]
    # monotone increasing, reaching deep into the grid
    assert np.all(np.diff(s) > 0)
    assert s[-1] >= 50.0


def test_convex_space_yield_caps_ub():
    obs = [(25.0, -5.0, 2.0, 1.2)]
    s, l, sd, ld, valid = pack_dyn(obs)
    seg = speed_planner.st_graph(s, l, sd, ld, valid, CFG)
    dp = speed_planner.speed_dp(seg, jnp.float32(8.0), CFG)
    path_s = jnp.linspace(0.0, 120.0, 60)
    path_kappa = jnp.full(60, 0.001)
    s_lb, s_ub, sd_lb, sd_ub = speed_planner.convex_space(
        dp, seg, path_s, path_kappa, CFG
    )
    # curvature cap active: sqrt(0.2*9.8/0.001) ~ 44 m/s
    assert float(jnp.min(sd_ub)) < 50.0
    assert np.all(np.asarray(s_lb) <= np.asarray(s_ub) + 1e-3)


def test_speed_qp_tracks_reference_speed_when_free():
    n_t = CFG.n_t
    s_lb = jnp.zeros(n_t)
    s_ub = jnp.full(n_t, 1e8)
    sd_lb = jnp.zeros(n_t)
    sd_ub = jnp.full(n_t, 1e8)
    s, sd, sdd, t = speed_planner.speed_qp(
        jnp.float32(13.9), jnp.float32(0.0), s_lb, s_ub, sd_lb, sd_ub, CFG
    )
    # starts pinned, converges to reference speed
    assert float(s[0]) == pytest.approx(0.0, abs=1e-3)
    assert float(sd[0]) == pytest.approx(13.9, abs=1e-2)
    np.testing.assert_allclose(
        np.asarray(sd)[-4:], CFG.reference_speed, rtol=0.05
    )
    # monotone s
    assert np.all(np.diff(np.asarray(s)) >= -1e-3)


def test_speed_qp_respects_yield_bound():
    n_t = CFG.n_t
    s_lb = jnp.zeros(n_t)
    s_ub = jnp.full(n_t, 1e8)
    # a hard cap: cannot pass s=20 before t=4s (columns 3..7)
    s_ub = s_ub.at[3:8].set(20.0)
    sd_lb = jnp.zeros(n_t)
    sd_ub = jnp.full(n_t, 1e8)
    s, sd, sdd, t = speed_planner.speed_qp(
        jnp.float32(13.9), jnp.float32(0.0), s_lb, s_ub, sd_lb, sd_ub, CFG
    )
    assert np.all(np.asarray(s)[4:9] <= 20.0 + 0.05)
    # accel box respected
    assert np.all(np.asarray(sdd) >= CFG.accel_min - 0.05)
    assert np.all(np.asarray(sdd) <= CFG.accel_max + 0.05)


def test_densify_consistency():
    """Densified profile interpolates the knots and is self-consistent
    (v = ds/dt, a = dv/dt numerically)."""
    n_t = CFG.n_t
    s_lb = jnp.zeros(n_t)
    s_ub = jnp.full(n_t, 1e8)
    sd_lb = jnp.zeros(n_t)
    sd_ub = jnp.full(n_t, 1e8)
    s, sd, sdd, t = speed_planner.speed_qp(
        jnp.float32(5.0), jnp.float32(0.5), s_lb, s_ub, sd_lb, sd_ub, CFG
    )
    s_d, v_d, a_d, t_d = speed_planner.densify_speed(s, sd, sdd, t, CFG)
    assert s_d.shape == (CFG.n_dense,)
    # knots reproduced
    for k in range(0, CFG.n_t + 1, 4):
        i = int(round(float(t[k]) / float(t_d[1])))
        assert float(s_d[i]) == pytest.approx(float(s[k]), abs=2e-2)
    # numeric derivative check
    v_num = np.gradient(np.asarray(s_d), np.asarray(t_d))
    np.testing.assert_allclose(np.asarray(v_d)[5:-5], v_num[5:-5], atol=0.1)


def test_speed_dp_vmaps():
    obs = [(18.0, -5.0, 1.0, 1.4)]
    s, l, sd, ld, valid = pack_dyn(obs)
    seg = speed_planner.st_graph(s, l, sd, ld, valid, CFG)
    v0s = jnp.linspace(5.0, 14.0, 8)
    dps = jax.vmap(lambda v: speed_planner.speed_dp(seg, v, CFG))(v0s)
    assert dps.s.shape == (8, CFG.n_t)
    assert bool(jnp.all(jnp.isfinite(dps.s)))


def test_speed_dp_regimes_vs_oracle_decisions():
    """DP decisions across yield/overtake/crossing regimes stay finite,
    monotone in s, and respect the no-reverse rule (the former "grid"
    obstacle-cost mode was removed in round 2 — it flipped decisions in
    these exact regimes while being only ~8% faster)."""
    cases = [
        [(18.0, -5.0, 1.0, 1.4)],
        [(35.0, -8.0, 0.5, 1.0)],
        [(25.0, -5.0, 2.0, 1.2), (40.0, 6.0, 1.0, -1.0)],
    ]
    for obs in cases:
        s, l, sd, ld, valid = pack_dyn(obs)
        for v0 in [6.0, 13.9]:
            seg = speed_planner.st_graph(s, l, sd, ld, valid, CFG)
            dp = speed_planner.speed_dp(seg, jnp.float32(v0), CFG)
            s_np = np.asarray(dp.s)
            valid_np = np.asarray(dp.valid)
            assert np.all(np.isfinite(s_np)), (obs, v0)
            sv = s_np[valid_np]
            assert np.all(np.diff(sv) >= -1e-6), (obs, v0, sv)
