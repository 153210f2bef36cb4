"""Golden tests: JAX Frenet core vs the NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emplanner_carla_tpu.ops import frenet
from emplanner_carla_tpu.oracle import frenet_np
from emplanner_carla_tpu.types import Path


def make_curvy_path(n=80, ds=2.0):
    """An S-curve polyline with known analytic shape."""
    t = np.arange(n) * ds * 0.02
    x = np.cumsum(np.full(n, ds) * np.cos(1.2 * np.sin(t)))
    y = np.cumsum(np.full(n, ds) * np.sin(1.2 * np.sin(t)))
    return x - x[0], y - y[0]


@pytest.fixture
def path():
    x, y = make_curvy_path()
    theta, kappa = frenet_np.heading_kappa(x, y)
    return Path(
        jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32),
        jnp.asarray(theta, jnp.float32),
        jnp.asarray(kappa, jnp.float32),
    )


def test_heading_kappa_matches_oracle():
    x, y = make_curvy_path()
    th_o, k_o = frenet_np.heading_kappa(x, y)
    th_j, k_j = frenet.heading_kappa(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(th_j), th_o, atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_j), k_o, atol=1e-5)


def test_heading_kappa_straight_line():
    x = jnp.arange(20.0) * 2.0
    y = jnp.zeros(20)
    th, k = frenet.heading_kappa(x, y)
    np.testing.assert_allclose(np.asarray(th), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(k), 0.0, atol=1e-7)


def test_heading_kappa_circle():
    """On a circle of radius R, kappa ~ 1/R."""
    R = 30.0
    ang = np.linspace(0, np.pi, 120)
    x, y = R * np.cos(ang), R * np.sin(ang)
    _, k = frenet.heading_kappa(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(k)[2:-2], 1.0 / R, rtol=2e-3)


def test_nearest_and_projection(path):
    xs, ys = np.asarray(path.x), np.asarray(path.y)
    ths, ks = np.asarray(path.theta), np.asarray(path.kappa)
    pts = [(10.0, 4.0), (50.0, 30.0), (100.0, 61.0)]
    for px, py in pts:
        idx_o = frenet_np.nearest_index(px, py, xs, ys)
        idx_j = int(frenet.nearest_index(jnp.float32(px), jnp.float32(py), path))
        assert idx_j == idx_o
        proj_o = frenet_np.project(px, py, xs, ys, ths, ks, idx_o)
        proj_j = frenet.project_to_path(
            jnp.float32(px), jnp.float32(py), path, jnp.int32(idx_j)
        )
        np.testing.assert_allclose(
            [float(v) for v in proj_j], proj_o, atol=1e-4
        )


def test_windowed_nearest(path):
    px, py = 50.0, 30.0
    full = int(frenet.nearest_index(jnp.float32(px), jnp.float32(py), path))
    win = int(
        frenet.nearest_index_windowed(
            jnp.float32(px), jnp.float32(py), path, jnp.int32(max(full - 5, 0)), 16
        )
    )
    assert win == full


def test_s_map_and_sl_roundtrip(path):
    xs, ys = np.asarray(path.x), np.asarray(path.y)
    ths, ks = np.asarray(path.theta), np.asarray(path.kappa)
    ox, oy = 20.0, 10.0
    sm_o = frenet_np.s_map_from_origin(xs, ys, ths, ks, ox, oy)
    sm_j = frenet.s_map_from_origin(path, jnp.float32(ox), jnp.float32(oy))
    np.testing.assert_allclose(np.asarray(sm_j), sm_o, atol=1e-3)

    pts = np.array([(30.0, 18.0), (80.0, 52.0), (12.0, 2.0)])
    s_o, l_o = frenet_np.cartesian_to_sl(pts, xs, ys, ths, ks, sm_o)
    s_j, l_j = frenet.cartesian_to_sl(
        jnp.asarray(pts[:, 0], jnp.float32), jnp.asarray(pts[:, 1], jnp.float32),
        path, sm_j,
    )
    np.testing.assert_allclose(np.asarray(s_j), s_o, atol=2e-3)
    np.testing.assert_allclose(np.asarray(l_j), l_o, atol=2e-3)


def test_full_frenet_state(path):
    xs, ys = np.asarray(path.x), np.asarray(path.y)
    ths, ks = np.asarray(path.theta), np.asarray(path.kappa)
    ox, oy = 40.0, 25.0
    sm = frenet_np.s_map_from_origin(xs, ys, ths, ks, ox, oy)
    vx, vy, ax, ay = 8.0, 1.5, 0.5, -0.2
    ref = frenet_np.frenet_state(ox, oy, vx, vy, ax, ay, xs, ys, ths, ks, sm)
    out = frenet.cartesian_to_frenet_full(
        *[jnp.float32(v) for v in (ox, oy, vx, vy, ax, ay)],
        path,
        jnp.asarray(sm, jnp.float32),
    )
    np.testing.assert_allclose([float(v) for v in out], ref, atol=1e-3, rtol=1e-4)


def test_frenet_to_cartesian_roundtrip(path):
    """(x,y) -> (s,l) -> (x,y) should round-trip to centimetre level."""
    sm = frenet.s_map_from_origin(path, path.x[0], path.y[0])
    pts_x = np.asarray(path.x)[10:40:5] + 1.3
    pts_y = np.asarray(path.y)[10:40:5] - 0.8
    s, l = frenet.cartesian_to_sl(
        jnp.asarray(pts_x, jnp.float32), jnp.asarray(pts_y, jnp.float32), path, sm
    )
    out = frenet.frenet_to_cartesian(
        s, l, jnp.zeros_like(s), jnp.zeros_like(s), path, sm
    )
    np.testing.assert_allclose(np.asarray(out.x), pts_x, atol=0.05)
    np.testing.assert_allclose(np.asarray(out.y), pts_y, atol=0.05)


def test_proj_point_at_s(path):
    sm = frenet.s_map_from_origin(path, path.x[0], path.y[0])
    s_query = jnp.asarray([5.0, 20.0, 47.3], jnp.float32)
    x, y, th, k = frenet.proj_point_at_s(s_query, path, sm)
    # the projected point must itself have s == s_query
    s_back, l_back = frenet.cartesian_to_sl(x, y, path, sm)
    np.testing.assert_allclose(np.asarray(s_back), np.asarray(s_query), atol=2e-2)
    np.testing.assert_allclose(np.asarray(l_back), 0.0, atol=2e-2)


def test_vmap_batching(path):
    """The whole core must vmap cleanly over scenario batches."""
    B = 16
    ox = jnp.linspace(5.0, 60.0, B)
    oy = jnp.linspace(2.0, 35.0, B)
    batched = jax.vmap(lambda a, b: frenet.s_map_from_origin(path, a, b))
    sm = batched(ox, oy)
    assert sm.shape == (B, path.n)
    # each row's zero crossing is at its own origin projection
    assert not np.allclose(np.asarray(sm[0]), np.asarray(sm[-1]))


def test_sample_window_indices():
    n, back, fwd = 100, 10, 40
    # middle: window starts at match - back
    assert int(frenet.sample_window_indices(jnp.int32(50), n, back, fwd)) == 40
    # near start: clipped to 0
    assert int(frenet.sample_window_indices(jnp.int32(3), n, back, fwd)) == 0
    # near end: clipped so the window fits
    assert int(frenet.sample_window_indices(jnp.int32(98), n, back, fwd)) == 49
