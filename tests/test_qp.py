"""ADMM QP solvers vs scipy / analytic solutions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emplanner_carla_tpu.ops import qp


def _rand_psd(rng, n, cond=10.0):
    Q = np.linalg.qr(rng.normal(size=(n, n)))[0]
    eig = np.linspace(1.0, cond, n)
    return (Q * eig) @ Q.T


def test_box_qp_unconstrained_interior(rng):
    """When the unconstrained optimum is inside the box, ADMM must find it."""
    n = 12
    H = _rand_psd(rng, n)
    f = rng.normal(size=n)
    x_star = -np.linalg.solve(H, f)
    lb = x_star - 5.0
    ub = x_star + 5.0
    x = qp.solve_box_qp(
        jnp.asarray(H, jnp.float32), jnp.asarray(f, jnp.float32),
        jnp.asarray(lb, jnp.float32), jnp.asarray(ub, jnp.float32), iters=200,
    )
    np.testing.assert_allclose(np.asarray(x), x_star, atol=1e-3)


def test_box_qp_active_bounds(rng):
    """1-D: min (x-3)^2 with x <= 1 -> x = 1."""
    H = jnp.asarray([[2.0]])
    f = jnp.asarray([-6.0])
    x = qp.solve_box_qp(H, f, jnp.asarray([-10.0]), jnp.asarray([1.0]), iters=100)
    np.testing.assert_allclose(float(x[0]), 1.0, atol=1e-4)


def test_box_qp_matches_scipy(rng):
    from scipy.optimize import minimize

    n = 20
    H = _rand_psd(rng, n)
    f = rng.normal(size=n) * 3
    lb, ub = -np.ones(n) * 0.5, np.ones(n) * 0.5
    res = minimize(
        lambda x: 0.5 * x @ H @ x + f @ x,
        np.zeros(n),
        jac=lambda x: H @ x + f,
        bounds=list(zip(lb, ub)),
        method="L-BFGS-B",
        tol=1e-12,
    )
    x = qp.solve_box_qp(
        jnp.asarray(H, jnp.float32), jnp.asarray(f, jnp.float32),
        jnp.asarray(lb, jnp.float32), jnp.asarray(ub, jnp.float32), iters=300,
    )
    np.testing.assert_allclose(np.asarray(x), res.x, atol=2e-3)


def test_general_qp_equality_only(rng):
    """min ||x||^2 s.t. sum(x) = 1 -> x = 1/n."""
    n = 8
    P = 2 * jnp.eye(n)
    q = jnp.zeros(n)
    A = jnp.ones((1, n))
    x = qp.solve_qp(P, q, A, jnp.asarray([1.0]), jnp.asarray([1.0]), iters=200)
    np.testing.assert_allclose(np.asarray(x), 1.0 / n, atol=1e-4)


def test_general_qp_mixed_constraints(rng):
    """Compare against scipy SLSQP on a mixed eq/ineq problem."""
    from scipy.optimize import minimize

    n, m_in = 10, 6
    P = _rand_psd(rng, n)
    q = rng.normal(size=n)
    A_in = rng.normal(size=(m_in, n))
    b_in = rng.uniform(0.5, 2.0, size=m_in)
    A_eq = rng.normal(size=(2, n))
    b_eq = rng.normal(size=2) * 0.1

    res = minimize(
        lambda x: 0.5 * x @ P @ x + q @ x,
        np.zeros(n),
        jac=lambda x: P @ x + q,
        constraints=[
            {"type": "ineq", "fun": lambda x: b_in - A_in @ x, "jac": lambda x: -A_in},
            {"type": "eq", "fun": lambda x: A_eq @ x - b_eq, "jac": lambda x: A_eq},
        ],
        method="SLSQP",
        tol=1e-12,
    )
    assert res.success

    A = jnp.concatenate([jnp.asarray(A_in), jnp.asarray(A_eq)]).astype(jnp.float32)
    l = jnp.concatenate([jnp.full(m_in, -1e8), jnp.asarray(b_eq)]).astype(jnp.float32)
    u = jnp.concatenate([jnp.asarray(b_in), jnp.asarray(b_eq)]).astype(jnp.float32)
    x = qp.solve_qp(
        jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32), A, l, u, iters=500
    )
    np.testing.assert_allclose(np.asarray(x), res.x, atol=5e-3)


def test_general_qp_vmaps(rng):
    """The solver must vmap over problem batches (the whole point)."""
    n, B = 6, 32
    Ps = np.stack([_rand_psd(rng, n) for _ in range(B)]).astype(np.float32)
    qs = rng.normal(size=(B, n)).astype(np.float32)
    A = np.eye(n, dtype=np.float32)
    l = -np.ones(n, dtype=np.float32)
    u = np.ones(n, dtype=np.float32)
    solve = jax.vmap(lambda P, q: qp.solve_qp(P, q, A, l, u, iters=150))
    xs = solve(jnp.asarray(Ps), jnp.asarray(qs))
    assert xs.shape == (B, n)
    from scipy.optimize import minimize

    for i in range(0, B, 8):
        res = minimize(
            lambda x: 0.5 * x @ Ps[i] @ x + qs[i] @ x,
            np.zeros(n),
            jac=lambda x: Ps[i] @ x + qs[i],
            bounds=[(-1.0, 1.0)] * n,
            method="L-BFGS-B",
            tol=1e-12,
        )
        np.testing.assert_allclose(np.asarray(xs[i]), res.x, atol=5e-3)


@pytest.fixture
def rng():
    return np.random.default_rng(7)
