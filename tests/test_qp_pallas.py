"""Pallas fused ADMM kernel vs the jnp prefactored solver (interpret mode).

On CPU the kernel runs through the Pallas interpreter, which is slow — so
this test uses few iterations and a tiny batch; it checks *algorithmic
equivalence* (identical iteration math), while TPU-hardware validation
(numerics at full iteration count + throughput) is part of the verify
drives (see .claude/skills/verify/SKILL.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

from emplanner_carla_tpu.config import PathPlanConfig
from emplanner_carla_tpu.ops import qp as qpmod
from emplanner_carla_tpu.planner.path_qp import _qp_constants

CFG = PathPlanConfig()


def test_pallas_matches_jnp_prefactored():
    n = 25
    P_np, A_np, eq_mask, fi, bi = _qp_constants(n, 4.0, CFG)
    nv = A_np.shape[1]   # 3n + n slacks
    m = A_np.shape[0]
    q_typ = np.zeros(nv)
    q_typ[0 : 3 * n : 3] = -1000.0
    kw = dict(q_typical=q_typ, iters_per_phase=4)
    solve_jnp = qpmod.make_prefactored_qp(P_np, A_np, eq_mask, **kw)
    solve_pl = qpmod.make_prefactored_qp(
        P_np, A_np, eq_mask, **kw,
        use_pallas=True, pallas_block=8, pallas_interpret=True,
    )
    B = 8
    rng = np.random.default_rng(3)
    q = rng.normal(size=(B, nv)).astype(np.float32) * 100.0
    u = np.concatenate(
        [np.zeros((B, 48)), np.full((B, 4 * n), 8.0), np.zeros((B, 6)),
         np.full((B, n), 1e8)], axis=1
    ).astype(np.float32)
    l = np.concatenate(
        [np.zeros((B, 48)), np.full((B, 4 * n), -1e8), np.zeros((B, 6)),
         np.zeros((B, n))], axis=1
    ).astype(np.float32)
    x1 = jax.vmap(solve_jnp)(jnp.asarray(q), jnp.asarray(l), jnp.asarray(u))
    x2 = solve_pl(jnp.asarray(q), jnp.asarray(l), jnp.asarray(u))
    assert bool(jnp.all(jnp.isfinite(x2)))
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), atol=5e-3)


def test_pallas_warm_matches_jnp_prefactored():
    """Warm-state contract: the fused kernel must consume and produce the
    same scaled-space (x, z, y) state as the XLA warm path (the closed
    loops carry it across replan cycles)."""
    n = 25
    P_np, A_np, eq_mask, fi, bi = _qp_constants(n, 4.0, CFG)
    nv = A_np.shape[1]
    m = A_np.shape[0]
    q_typ = np.zeros(nv)
    q_typ[0 : 3 * n : 3] = -1000.0
    kw = dict(q_typical=q_typ, iters_per_phase=4, warm=True,
              warm_iters_per_phase=3)
    solve_jnp = qpmod.make_prefactored_qp(P_np, A_np, eq_mask, **kw)
    solve_pl = qpmod.make_prefactored_qp(
        P_np, A_np, eq_mask, **kw,
        use_pallas=True, pallas_block=8, pallas_interpret=True,
    )
    B = 8
    rng = np.random.default_rng(5)
    q = rng.normal(size=(B, nv)).astype(np.float32) * 100.0
    u = np.concatenate(
        [np.zeros((B, 48)), np.full((B, 4 * n), 8.0), np.zeros((B, 6)),
         np.full((B, n), 1e8)], axis=1
    ).astype(np.float32)
    l = np.concatenate(
        [np.zeros((B, 48)), np.full((B, 4 * n), -1e8), np.zeros((B, 6)),
         np.zeros((B, n))], axis=1
    ).astype(np.float32)
    state = (
        jnp.asarray(rng.normal(size=(B, nv)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(B, m)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(B, m)).astype(np.float32) * 0.1),
    )
    x1, s1 = jax.vmap(solve_jnp)(jnp.asarray(q), jnp.asarray(l), jnp.asarray(u), state)
    x2, s2 = solve_pl(jnp.asarray(q), jnp.asarray(l), jnp.asarray(u), state)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), atol=5e-3)
    # primal state channels agree elementwise; the dual y on equality rows
    # random-walks at rho_eq_scale * ulp per iteration between op orders
    # (verified: one iteration diverges in y only, x/z to 1e-5), so the
    # warm-state contract is checked FUNCTIONALLY: the carried state must
    # yield the same next-cycle solution.
    np.testing.assert_allclose(np.asarray(s2[0]), np.asarray(s1[0]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(s2[1]), np.asarray(s1[1]), atol=5e-3)
    q2 = jnp.asarray(q * 1.05)
    x1b, _ = jax.vmap(solve_jnp)(q2, jnp.asarray(l), jnp.asarray(u), s1)
    x2b, _ = solve_pl(q2, jnp.asarray(l), jnp.asarray(u), s2)
    np.testing.assert_allclose(np.asarray(x2b), np.asarray(x1b), atol=5e-3)


def test_pallas_bf16x3_matches_jnp_prefactored():
    """The production default (config warm_kernel_matmul="bf16x3") splits
    every kernel dot into hi/lo bf16 passes; its iterates must stay within
    the same 5e-3 equivalence bar against the XLA ladder as the HIGHEST
    kernel (measured interpret-mode deviation ~1.6e-3 over two warm solves
    — the XLA default_matmul_precision("high") numerics regime the fleet
    validation in qp.py accepts)."""
    n = 25
    P_np, A_np, eq_mask, fi, bi = _qp_constants(n, 4.0, CFG)
    nv = A_np.shape[1]
    m = A_np.shape[0]
    q_typ = np.zeros(nv)
    q_typ[0 : 3 * n : 3] = -1000.0
    kw = dict(q_typical=q_typ, iters_per_phase=20, warm=True,
              warm_iters_per_phase=20)
    solve_jnp = qpmod.make_prefactored_qp(P_np, A_np, eq_mask, **kw)
    solve_bf = qpmod.make_prefactored_qp(
        P_np, A_np, eq_mask, **kw,
        use_pallas=True, pallas_block=8, pallas_interpret=True,
        kernel_matmul="bf16x3",
    )
    B = 8
    rng = np.random.default_rng(11)
    q = rng.normal(size=(B, nv)).astype(np.float32) * 100.0
    u = np.concatenate(
        [np.zeros((B, 48)), np.full((B, 4 * n), 8.0), np.zeros((B, 6)),
         np.full((B, n), 1e8)], axis=1
    ).astype(np.float32)
    l = np.concatenate(
        [np.zeros((B, 48)), np.full((B, 4 * n), -1e8), np.zeros((B, 6)),
         np.zeros((B, n))], axis=1
    ).astype(np.float32)
    st = (jnp.zeros((B, nv)), jnp.zeros((B, m)), jnp.zeros((B, m)))
    x1, s1 = jax.vmap(solve_jnp)(jnp.asarray(q), jnp.asarray(l),
                                 jnp.asarray(u), st)
    x2, s2 = solve_bf(jnp.asarray(q), jnp.asarray(l), jnp.asarray(u), st)
    assert bool(jnp.all(jnp.isfinite(x2)))
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), atol=5e-3)
    # carried-state contract across a perturbed second cycle
    q2 = jnp.asarray(q * 1.05)
    x1b, _ = jax.vmap(solve_jnp)(q2, jnp.asarray(l), jnp.asarray(u), s1)
    x2b, _ = solve_bf(q2, jnp.asarray(l), jnp.asarray(u), s2)
    np.testing.assert_allclose(np.asarray(x2b), np.asarray(x1b), atol=5e-3)
