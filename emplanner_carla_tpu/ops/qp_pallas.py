"""Pallas TPU kernel: fused batched ADMM for constant-matrix QPs.

The prefactored ADMM of ``ops/qp.make_prefactored_qp`` runs its iterations
as ~360 separate XLA ops over (B, n)/(B, m) arrays: every iteration streams
the iterate state and the constant matrices through HBM. This kernel fuses
the *entire* solve — all rho phases, all iterations — into one
``pallas_call``:

* the grid tiles the batch; each program block holds a (BLOCK, ·) slab of
  instances;
* the constant matrices (A~, Kinv per phase) are loaded into VMEM once per
  block and reused across every iteration;
* the iterate state (x, z, y) lives in VMEM scratch for the whole solve —
  zero HBM traffic between iterations;
* all matmuls run on the MXU with float32 accumulation.

Shapes are padded to MXU-friendly multiples of (8, 128) at factory time:
padded constraint rows have zero A-rows and +-inf bounds (their z, y stay
0); padded variables get an identity Kinv block and zero q (their x stays
0). Padding is exact, not approximate.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emplanner_carla_tpu.types import Array

BIG = 1e8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def make_pallas_qp(
    Pt: np.ndarray,
    At: np.ndarray,
    D: np.ndarray,
    E: np.ndarray,
    c: float,
    phases: list[tuple[np.ndarray, np.ndarray]],
    iters_per_phase: int,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    block: int = 128,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGHEST,
    warm: bool = False,
    matmul: str = "highest",
):
    """Build the fused solver from already-equilibrated constants.

    Pt/At: scaled quadratic/constraint matrices (n, n)/(m, n); D, E, c: the
    Ruiz scalings; phases: [(rho_vec (m,), Kinv (n, n)), ...]. Returns
    ``solve(q, l, u)`` operating on a *batch*: q (B, n), l/u (B, m) ->
    x (B, n). B must be a multiple of ``block``.

    With ``warm=True`` the solver is ``solve(q, l, u, state) -> (x, state)``
    with ``state = (x_s (B, n), z (B, m), y (B, m))`` in the scaled space —
    the same contract as the XLA warm path of ``qp.make_prefactored_qp``
    (pad/unpad at the boundary is exact: padded rows/vars are inert).

    ``matmul`` picks the iteration dot implementation:

    * ``"highest"`` — f32 dots at ``Precision.HIGHEST`` (6 bf16 MXU passes;
      Mosaic has no 3-pass HIGH).
    * ``"bf16x3"`` — an explicit hi/lo bf16 split of both operands with the
      lo*lo term dropped (hh + hl + lh, f32 accumulation): the same ~2^-22
      relative error as XLA's ``default_matmul_precision("high")`` that the
      warm XLA ladder already runs (see qp.py's fleet-validation note), at
      HALF the MXU passes. Constants are split once at factory time; the
      iterate operand is split per dot on the VPU.
    """
    n = Pt.shape[0]
    m = At.shape[0]
    n_pad = _round_up(n, 128)
    m_pad = _round_up(m, 128)
    n_phases = len(phases)

    A_p = np.zeros((m_pad, n_pad), np.float32)
    A_p[:m, :n] = At
    Kinv_p = np.zeros((n_phases, n_pad, n_pad), np.float32)
    rho_p = np.ones((n_phases, m_pad), np.float32)
    for i, (rho_vec, Kinv) in enumerate(phases):
        Kinv_p[i, :n, :n] = Kinv
        Kinv_p[i, n:, n:] = np.eye(n_pad - n)  # inert identity block
        rho_p[i, :m] = rho_vec
    D_p = np.zeros(n_pad, np.float32)
    D_p[:n] = D
    E_p = np.ones(m_pad, np.float32)
    E_p[:m] = E

    AT_p = A_p.T.copy()  # (n_pad, m_pad)

    blk = block
    split = matmul == "bf16x3"
    if matmul not in ("highest", "bf16x3"):
        raise ValueError(f"matmul must be 'highest' or 'bf16x3', got {matmul}")

    if split:
        import ml_dtypes

        def _hl(a: np.ndarray) -> np.ndarray:
            """Stack the hi/lo bf16 split along a new leading axis."""
            hi = a.astype(ml_dtypes.bfloat16)
            lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
            return np.stack([hi, lo])

        A_in = _hl(A_p)                       # (2, m_pad, n_pad) bf16
        AT_in = _hl(AT_p)                     # (2, n_pad, m_pad) bf16
        # pre-transposed, phase-major-flattened: [hi ph0..phk, lo ph0..phk]
        # (keeps the kernel ref 3-D and avoids in-kernel bf16 transposes)
        KinvT_hl = _hl(np.transpose(Kinv_p, (0, 2, 1)))
        Kinv_in = KinvT_hl.reshape(2 * n_phases, n_pad, n_pad)
    else:
        A_in = A_p
        AT_in = AT_p
        Kinv_in = Kinv_p

    def kernel(q_ref, l_ref, u_ref, x0_ref, z0_ref, y0_ref,
               A_ref, AT_ref, Kinv_ref, rho_ref,
               x_out, zs_out, ys_out, x_s, z_s, y_s):
        qs = q_ref[:]                      # (block, n_pad) pre-scaled
        ls = l_ref[:]                      # (block, m_pad)
        us = u_ref[:]
        x_s[:] = x0_ref[:]
        z_s[:] = jnp.clip(z0_ref[:], ls, us)
        y_s[:] = y0_ref[:]

        def dot3(w, c_hi, c_lo):
            # hi/lo bf16 operand split, lo*lo dropped: XLA "high" numerics
            # (~2^-22 relative) at 3 MXU passes instead of HIGHEST's 6
            w_hi = w.astype(jnp.bfloat16)
            w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return (
                jnp.dot(w_hi, c_hi, preferred_element_type=jnp.float32)
                + jnp.dot(w_hi, c_lo, preferred_element_type=jnp.float32)
                + jnp.dot(w_lo, c_hi, preferred_element_type=jnp.float32)
            )

        for ph in range(n_phases):
            rho = rho_ref[ph : ph + 1, :]      # (1, m_pad) — keep 2-D for Mosaic
            rho_inv = 1.0 / rho
            if split:
                KT_hi = Kinv_ref[ph]           # pre-transposed at factory
                KT_lo = Kinv_ref[n_phases + ph]
            else:
                Kinv_T = Kinv_ref[ph].T        # (n_pad, n_pad)

            def body_split(_, carry, rho=rho, rho_inv=rho_inv,
                           KT_hi=KT_hi if split else None,
                           KT_lo=KT_lo if split else None):
                x = x_s[:]
                z = z_s[:]
                y = y_s[:]
                rhs = sigma * x - qs + dot3(rho * z - y, A_ref[0], A_ref[1])
                x = dot3(rhs, KT_hi, KT_lo)
                Ax = dot3(x, AT_ref[0], AT_ref[1])
                Ax_rel = alpha * Ax + (1.0 - alpha) * z
                z_new = jnp.clip(Ax_rel + y * rho_inv, ls, us)
                y_s[:] = y + rho * (Ax_rel - z_new)
                x_s[:] = x
                z_s[:] = z_new
                return 0

            def body(_, carry, rho=rho, rho_inv=rho_inv,
                     Kinv_T=Kinv_T if not split else None):
                # carry unused; state lives in VMEM scratch for the whole solve
                x = x_s[:]
                z = z_s[:]
                y = y_s[:]
                # full f32 multiplies: the MXU's default bf16 passes make
                # the ADMM iteration diverge (same failure mode as the XLA
                # path before default_matmul_precision("highest"))
                hp = precision
                rhs = sigma * x - qs + jnp.dot(
                    rho * z - y, A_ref[:],
                    preferred_element_type=jnp.float32, precision=hp,
                )
                x = jnp.dot(
                    rhs, Kinv_T, preferred_element_type=jnp.float32, precision=hp
                )
                Ax = jnp.dot(
                    x, AT_ref[:], preferred_element_type=jnp.float32, precision=hp
                )
                Ax_rel = alpha * Ax + (1.0 - alpha) * z
                z_new = jnp.clip(Ax_rel + y * rho_inv, ls, us)
                y_s[:] = y + rho * (Ax_rel - z_new)
                x_s[:] = x
                z_s[:] = z_new
                return 0

            jax.lax.fori_loop(
                0, iters_per_phase, body_split if split else body, 0
            )

        x_out[:] = x_s[:]
        zs_out[:] = z_s[:]
        ys_out[:] = y_s[:]

    c_f = float(c)

    def _run(q: Array, l: Array, u: Array, x0, z0, y0):
        # constants converted per call, NOT at factory time: the factory is
        # invoked inside lru_cached solver builders that run during jit
        # traces — jnp arrays created there leak that trace's context into
        # later traces ("No constant handler for DynamicJaxprTracer")
        A_c = jnp.asarray(A_in)
        AT_c = jnp.asarray(AT_in)
        Kinv_c = jnp.asarray(Kinv_in)
        rho_c = jnp.asarray(rho_p)
        D_c = jnp.asarray(D_p)
        E_c = jnp.asarray(E_p)
        c_c = jnp.float32(c_f)
        B = q.shape[0]
        assert B % block == 0, f"batch {B} not a multiple of block {block}"
        # scale + pad per-instance data
        q_s = jnp.zeros((B, n_pad), jnp.float32).at[:, :n].set(
            c_c * (D_c[:n] * q)
        )
        l_s = jnp.full((B, m_pad), -BIG, jnp.float32).at[:, :m].set(
            E_c[:m] * l
        )
        u_s = jnp.full((B, m_pad), BIG, jnp.float32).at[:, :m].set(
            E_c[:m] * u
        )
        x0_p = jnp.zeros((B, n_pad), jnp.float32).at[:, :n].set(x0)
        z0_p = jnp.zeros((B, m_pad), jnp.float32).at[:, :m].set(z0)
        y0_p = jnp.zeros((B, m_pad), jnp.float32).at[:, :m].set(y0)

        bspec_n = pl.BlockSpec((block, n_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        bspec_m = pl.BlockSpec((block, m_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        x_pad, z_pad, y_pad = pl.pallas_call(
            kernel,
            grid=(B // block,),
            in_specs=[
                bspec_n, bspec_m, bspec_m, bspec_n, bspec_m, bspec_m,
                pl.BlockSpec(A_in.shape, lambda i: (0,) * A_in.ndim,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(AT_in.shape, lambda i: (0,) * AT_in.ndim,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(Kinv_in.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_phases, m_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(bspec_n, bspec_m, bspec_m),
            out_shape=(
                jax.ShapeDtypeStruct((B, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((B, m_pad), jnp.float32),
                jax.ShapeDtypeStruct((B, m_pad), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((block, n_pad), jnp.float32),
                pltpu.VMEM((block, m_pad), jnp.float32),
                pltpu.VMEM((block, m_pad), jnp.float32),
            ],
            interpret=interpret,
        )(q_s, l_s, u_s, x0_p, z0_p, y0_p, A_c, AT_c, Kinv_c, rho_c)
        return x_pad, z_pad, y_pad

    if warm:
        def solve(q, l, u, state):
            x0, z0, y0 = state
            x_pad, z_pad, y_pad = _run(q, l, u, x0, z0, y0)
            x_s = x_pad[:, :n]
            D_u = jnp.asarray(D_p[:n])
            return D_u[None, :] * x_s, (x_s, z_pad[:, :m], y_pad[:, :m])
        return solve

    def solve(q: Array, l: Array, u: Array) -> Array:
        B = q.shape[0]
        zeros_n = jnp.zeros((B, n), jnp.float32)
        zeros_m = jnp.zeros((B, m), jnp.float32)
        x_pad, _, _ = _run(q, l, u, zeros_n, zeros_m, zeros_m)
        return jnp.asarray(D_p[:n])[None, :] * x_pad[:, :n]

    return solve
