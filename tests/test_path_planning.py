"""S-L path planning: DP, corridor, and QP vs the NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emplanner_carla_tpu.config import PathPlanConfig
from emplanner_carla_tpu.oracle import path_np
from emplanner_carla_tpu.planner import path_dp, path_qp

CFG = PathPlanConfig()
K = 8  # obstacle slots


def pack_obs(obs):
    s = np.zeros(K, np.float32)
    l = np.zeros(K, np.float32)
    v = np.zeros(K, bool)
    for i, (os, ol) in enumerate(obs):
        s[i], l[i], v[i] = os, ol, True
    return jnp.asarray(s), jnp.asarray(l), jnp.asarray(v)


def run_dp(obs, start=(0.0, 0.5, 0.02, 0.0)):
    s, l, v = pack_obs(obs)
    s0, l0, dl0, ddl0 = (jnp.float32(x) for x in start)
    return path_dp.path_dp(s, l, v, s0, l0, dl0, ddl0, CFG)


@pytest.mark.parametrize(
    "obs",
    [
        [],
        [(40.0, 0.0)],
        [(30.0, 0.5), (60.0, -1.0)],
        [(20.0, -0.2), (45.0, 1.2), (70.0, 0.3)],
    ],
)
def test_dp_matches_oracle(obs):
    start = (0.0, 0.5, 0.02, 0.0)
    dp_s, dp_l, feas = run_dp(obs, start)
    ref_s, ref_l, ref_feas = path_np.path_dp(
        [o[0] for o in obs], [o[1] for o in obs], *start
    )
    np.testing.assert_allclose(np.asarray(dp_s), ref_s, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dp_l), ref_l, atol=1e-4)
    assert bool(feas) == bool(ref_feas)


def test_sparse_edge_costs_match_dense():
    """The 2-candidate sparse transition-edge obstacle cost must equal the
    dense (cols-1, rows, rows, m, K) evaluation bit-for-bit, including
    obstacles at column-window boundaries, out of range, and NaN padding."""
    trans_l, _, u = path_dp._transition_geometry(CFG)
    h, m = CFG.sample_s, CFG.n_edge_samples
    rng = np.random.default_rng(0)
    for trial in range(24):
        s0 = np.float32(rng.uniform(-5.0, 200.0))
        obs_s = s0 + rng.uniform(-20.0, CFG.cols * h + 20.0, K).astype(
            np.float32
        )
        if trial % 3 == 0:
            # pin some obstacles exactly on candidate-window boundaries
            n = rng.integers(0, CFG.cols, 4)
            obs_s[:4] = s0 + (n * h - CFG.safe_dist).astype(np.float32)
        obs_l = rng.uniform(-10.0, 10.0, K).astype(np.float32)
        valid = rng.random(K) < 0.7
        obs_s = np.where(valid, obs_s, np.nan).astype(np.float32)
        sparse = path_dp.transition_obstacle_costs(
            jnp.asarray(obs_s), jnp.asarray(obs_l), jnp.asarray(valid),
            jnp.float32(s0), CFG,
        )
        # dense reference, NumPy float32 (the pre-sparse formula)
        s_samples = s0 + (
            np.arange(CFG.cols, dtype=np.float32)[:, None] * h
            + u[None, :].astype(np.float32) * h
        )
        d2 = (
            np.nan_to_num(obs_s, nan=1e9)[None, None, None, None, :]
            - s_samples[1:, None, None, :, None]
        ) ** 2 + (
            obs_l[None, None, None, None, :] - trans_l[None, :, :, :, None]
        ) ** 2
        collide = np.any(d2 <= CFG.danger_dist**2, axis=-2)
        band = (d2 > CFG.danger_dist**2) & (d2 < CFG.safe_dist**2)
        band_cost = np.sum(
            np.where(band, CFG.danger_cost_num / np.maximum(d2, 1e-6), 0.0),
            axis=-2,
        )
        per = np.where(collide, CFG.w_collision, 0.0) + band_cost
        dense = np.sum(np.where(valid, per, 0.0), axis=-1)
        np.testing.assert_allclose(
            np.asarray(sparse), dense, rtol=1e-5, atol=1e-4,
            err_msg=f"trial {trial}",
        )


def test_dp_no_obstacle_straight():
    dp_s, dp_l, feas = run_dp([])
    np.testing.assert_allclose(np.asarray(dp_l), 0.0)
    assert bool(feas)


def test_dp_avoids_obstacle_on_line():
    """An obstacle dead ahead on the reference line forces |l| > 0 nearby."""
    dp_s, dp_l, feas = run_dp([(45.0, 0.0)])
    assert bool(feas)
    i = int(np.argmin(np.abs(np.asarray(dp_s) - 45.0)))
    assert abs(float(dp_l[i])) >= 1.4


def test_dp_keep_right_bias():
    """With a symmetric choice the keep-right penalty picks l < 0 rows."""
    dp_s, dp_l, _ = run_dp([(45.0, 0.0)], start=(0.0, 0.0, 0.0, 0.0))
    i = int(np.argmin(np.abs(np.asarray(dp_s) - 45.0)))
    assert float(dp_l[i]) < 0


def test_dp_vmap():
    s, l, v = pack_obs([(40.0, 0.0)])
    B = 8
    starts = jnp.linspace(-1.0, 1.0, B)
    f = jax.vmap(
        lambda sl: path_dp.path_dp(
            s, l, v, jnp.float32(0.0), sl, jnp.float32(0.0), jnp.float32(0.0), CFG
        )
    )
    dp_s, dp_l, feas = f(starts)
    assert dp_l.shape == (B, CFG.cols)
    assert bool(jnp.all(feas))


def test_enrich_endpoints_and_continuity():
    start = (0.0, 1.2, -0.05, 0.01)
    dp_s, dp_l, _ = run_dp([(40.0, 0.0)], start)
    s, l = path_dp.enrich_dp(
        dp_s, dp_l, *[jnp.float32(v) for v in start], CFG
    )
    assert s.shape == (path_dp.enriched_length(CFG),)
    # starts at the plan start, ends at the last DP node
    assert float(s[0]) == pytest.approx(start[0])
    assert float(l[0]) == pytest.approx(start[1], abs=1e-5)
    assert float(s[-1]) == pytest.approx(float(dp_s[-1]))
    assert float(l[-1]) == pytest.approx(float(dp_l[-1]), abs=1e-5)
    # the densified polyline passes through every DP node
    for j in range(CFG.cols):
        k = int(np.argmin(np.abs(np.asarray(s) - float(dp_s[j]))))
        assert abs(float(l[k]) - float(dp_l[j])) < 0.35
    # no wild excursions between knots
    assert np.all(np.abs(np.diff(np.asarray(l))) < 1.5)


def test_corridor_matches_oracle():
    obs = [(30.0, 0.5), (60.0, -1.0)]
    start = (0.0, 0.5, 0.02, 0.0)
    dp_s, dp_l, _ = run_dp(obs, start)
    es, el = path_dp.enrich_dp(dp_s, dp_l, *[jnp.float32(v) for v in start], CFG)
    ds_np, dl_np = np.asarray(es)[:: CFG.qp_downsample], np.asarray(el)[:: CFG.qp_downsample]
    os, ol, ov = pack_obs(obs)
    lmin, lmax = path_qp.corridor(
        jnp.asarray(ds_np), jnp.asarray(dl_np), os, ol, ov, CFG
    )
    ref_min, ref_max = path_np.corridor(
        ds_np, dl_np, [o[0] for o in obs], [o[1] for o in obs]
    )
    np.testing.assert_allclose(np.asarray(lmin), ref_min, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lmax), ref_max, atol=1e-5)


def test_path_qp_matches_scipy():
    n = 25
    ds = 4.0
    s_axis = np.arange(n) * ds
    l_min = -10.0 * np.ones(n)
    l_max = 10.0 * np.ones(n)
    l_min[8:13] = 2.5  # must pass left of an obstacle
    start = (0.3, 0.01, 0.0)
    ref_l, ref_dl, ref_ddl, ok = path_np.path_qp_scipy(l_min, l_max, *start, ds)
    assert ok
    l, dl, ddl = path_qp.path_qp(
        jnp.asarray(l_min, jnp.float32),
        jnp.asarray(l_max, jnp.float32),
        *[jnp.float32(v) for v in start],
        CFG,
        ds,
    )
    np.testing.assert_allclose(np.asarray(l), ref_l, atol=0.02)
    # corridor respected (within solver tolerance)
    assert np.all(np.asarray(l)[9:12] >= 2.5 - 0.05)
    # endpoints pinned
    assert float(l[0]) == pytest.approx(start[0], abs=1e-3)
    assert float(l[-1]) == pytest.approx(0.0, abs=1e-3)


def test_path_qp_straight_corridor_stays_centred():
    n = 25
    l_min = -10.0 * np.ones(n, np.float32)
    l_max = 10.0 * np.ones(n, np.float32)
    l, dl, ddl = path_qp.path_qp(
        jnp.asarray(l_min), jnp.asarray(l_max),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
        CFG, 4.0,
    )
    np.testing.assert_allclose(np.asarray(l), 0.0, atol=5e-3)
