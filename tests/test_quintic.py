"""Quintic Hermite basis vs the reference's absolute-s 6x6 solve (float64)."""

import jax.numpy as jnp
import numpy as np

from emplanner_carla_tpu.ops import quintic
from emplanner_carla_tpu.oracle import frenet_np


def test_matches_absolute_six_by_six():
    """Normalized Hermite coefficients reproduce the reference solve even at
    large absolute s where the 6x6 system is ill-conditioned in f32."""
    rng = np.random.default_rng(1)
    for _ in range(20):
        s0 = float(rng.uniform(0, 120))
        h = float(rng.uniform(5, 20))
        s1 = s0 + h
        bc = rng.uniform(-2, 2, size=6)
        bc[1] *= 0.2  # dl
        bc[2] *= 0.05  # ddl
        bc[4] *= 0.2
        bc[5] *= 0.05
        c_abs = frenet_np.quintic_coeffs_abs(*bc, s0, s1)
        c_h = quintic.hermite_coeffs(
            *[jnp.float64(v) if False else jnp.float32(v) for v in bc],
            jnp.float32(h),
        )
        for s in np.linspace(s0, s1, 11):
            ref = frenet_np.quintic_eval_abs(c_abs, s)
            u = jnp.float32((s - s0) / h)
            out = quintic.eval_with_derivs(c_h, u, jnp.float32(h))
            np.testing.assert_allclose(
                [float(v) for v in out], ref, rtol=2e-4, atol=2e-4
            )


def test_zero_derivative_case_is_smoothstep():
    """With zero boundary derivatives the quintic is the classic smoothstep."""
    c = quintic.hermite_coeffs(
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(10.0),
    )
    np.testing.assert_allclose(
        np.asarray(c), [0, 0, 0, 10, -15, 6], atol=1e-6
    )
    u = jnp.asarray([0.0, 0.5, 1.0])
    np.testing.assert_allclose(
        np.asarray(quintic.eval_poly(c, u)), [0.0, 0.5, 1.0], atol=1e-6
    )


def test_boundary_conditions_honoured():
    l0, dl0, ddl0 = 1.2, -0.3, 0.04
    l1, dl1, ddl1 = -0.7, 0.1, -0.02
    h = 15.0
    c = quintic.hermite_coeffs(
        *[jnp.float32(v) for v in (l0, dl0, ddl0, l1, dl1, ddl1, h)]
    )
    for u, exp in [(0.0, (l0, dl0, ddl0)), (1.0, (l1, dl1, ddl1))]:
        l, dl, ddl, _ = quintic.eval_with_derivs(c, jnp.float32(u), jnp.float32(h))
        np.testing.assert_allclose(
            [float(l), float(dl), float(ddl)], exp, atol=1e-5
        )


def test_batched_coeffs():
    l1 = jnp.asarray(np.linspace(-3, 3, 12), jnp.float32)
    z = jnp.zeros_like(l1)
    c = quintic.hermite_coeffs(z, z, z, l1, z, z, jnp.float32(15.0))
    assert c.shape == (12, 6)
    u = jnp.asarray(np.linspace(0, 1, 10), jnp.float32)
    vals = quintic.eval_poly(c[:, None, :], u[None, :])
    assert vals.shape == (12, 10)
    np.testing.assert_allclose(np.asarray(vals[:, -1]), np.asarray(l1), atol=1e-5)
