"""Golden tests for ops/interp.py — the gather-free jnp.interp replacement.

The planner's densify/merge/convex-space stages interpolate with these
helpers instead of ``jnp.interp`` (dynamic gathers measured ~68 ms per
channel per batch-4096 cycle on TPU v5e); semantics must stay bit-compatible
with ``jnp.interp``'s clamping linear interpolation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from emplanner_carla_tpu.config import EMConfig
from emplanner_carla_tpu.ops import interp
from emplanner_carla_tpu.planner import speed_planner, trajectory as traj_mod
from emplanner_carla_tpu.types import Path


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_interp_matches_jnp_interp(seed):
    rng = np.random.default_rng(seed)
    for _ in range(20):
        n = int(rng.integers(3, 30))
        xp = np.sort(rng.uniform(0, 100, n)).astype(np.float32)
        fp = rng.uniform(-5, 5, n).astype(np.float32)
        xq = rng.uniform(-10, 110, 64).astype(np.float32)
        got = interp.interp(jnp.asarray(xq), jnp.asarray(xp), jnp.asarray(fp))
        want = jnp.interp(jnp.asarray(xq), jnp.asarray(xp), jnp.asarray(fp))
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_interp_duplicate_knots_finite():
    xp = jnp.asarray([0.0, 1.0, 1.0, 2.0], jnp.float32)
    fp = jnp.asarray([0.0, 1.0, 5.0, 6.0], jnp.float32)
    xq = jnp.asarray([0.5, 1.0, 1.5], jnp.float32)
    got = interp.interp(xq, xp, fp)
    assert bool(jnp.all(jnp.isfinite(got)))


@pytest.mark.parametrize("seed", [0, 3])
def test_uniform_hat_matches_jnp_interp(seed):
    rng = np.random.default_rng(seed)
    for _ in range(10):
        n = int(rng.integers(4, 40))
        dx = float(rng.uniform(0.1, 2.0))
        xp = (np.arange(n) * dx).astype(np.float32)
        fp = rng.uniform(-5, 5, n).astype(np.float32)
        xq = rng.uniform(-1, n * dx + 1, 33).astype(np.float32)
        w = interp.uniform_hat(jnp.asarray(xq), 0.0, dx, n)
        got = jnp.sum(w * fp, axis=-1)
        want = jnp.interp(jnp.asarray(xq), jnp.asarray(xp), jnp.asarray(fp))
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_densify_matches_gather_formula():
    """densify_speed's constant Hermite-selector matrices must reproduce the
    direct piecewise-constant-jerk evaluation (the pre-optimization form)."""
    cfg = EMConfig().speed
    nk = cfg.n_t + 1
    rng = np.random.default_rng(7)
    s = np.cumsum(rng.uniform(0.1, 4.0, nk)).astype(np.float32)
    v = rng.uniform(0, 15, nk).astype(np.float32)
    a = rng.uniform(-4, 3, nk).astype(np.float32)
    t = (np.arange(nk) * cfg.t_step).astype(np.float32)
    s_d, v_d, a_d, tq = speed_planner.densify_speed(
        jnp.asarray(s), jnp.asarray(v), jnp.asarray(a), jnp.asarray(t), cfg
    )
    tq2 = np.linspace(0.0, t[-1], cfg.n_dense)
    j = np.clip((tq2 / cfg.t_step).astype(np.int32), 0, nk - 2)
    x = tq2 - t[j]
    jerk = (a[j + 1] - a[j]) / cfg.t_step
    np.testing.assert_allclose(
        s_d, s[j] + v[j] * x + 0.5 * a[j] * x**2 + jerk * x**3 / 6, atol=5e-4
    )
    np.testing.assert_allclose(v_d, v[j] + a[j] * x + 0.5 * jerk * x**2, atol=5e-4)
    np.testing.assert_allclose(a_d, a[j] + jerk * x, atol=5e-4)
    np.testing.assert_allclose(tq, tq2, atol=1e-6)


def test_merge_and_speed_at_match_jnp_interp():
    cfg = EMConfig().speed
    rng = np.random.default_rng(11)
    npth = 23
    px = np.cumsum(rng.uniform(0.5, 3, npth)).astype(np.float32)
    path = Path(
        jnp.asarray(px),
        jnp.asarray(rng.uniform(-5, 5, npth).astype(np.float32)),
        jnp.asarray(rng.uniform(-1, 1, npth).astype(np.float32)),
        jnp.asarray(rng.uniform(-0.1, 0.1, npth).astype(np.float32)),
    )
    s_map = np.array(traj_mod.path_arc_length(path))
    s_dense = np.sort(rng.uniform(-2, s_map[-1] + 5, cfg.n_dense)).astype(np.float32)
    v_d = rng.uniform(0, 15, cfg.n_dense).astype(np.float32)
    a_d = rng.uniform(-3, 2, cfg.n_dense).astype(np.float32)
    t_d = np.linspace(0, 8, cfg.n_dense).astype(np.float32)
    tr = traj_mod.merge(
        path, jnp.asarray(s_dense), jnp.asarray(v_d), jnp.asarray(a_d),
        jnp.asarray(t_d),
    )
    for got, fp in ((tr.x, path.x), (tr.y, path.y), (tr.theta, path.theta),
                    (tr.kappa, path.kappa)):
        want = jnp.interp(jnp.asarray(s_dense), jnp.asarray(s_map), fp)
        np.testing.assert_allclose(got, want, atol=3e-3)
    # merge masks samples beyond the path end
    assert bool(jnp.all(tr.valid[np.asarray(s_dense) <= s_map[-1]]))
    for t_q in [0.0, 0.013, 3.33, 7.99, 8.0, 9.5]:
        got = traj_mod.speed_at(tr, jnp.asarray(t_q, jnp.float32))
        want = jnp.interp(jnp.asarray(t_q), tr.time, tr.speed)
        np.testing.assert_allclose(got, want, atol=2e-3)
