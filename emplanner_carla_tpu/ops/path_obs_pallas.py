"""Pallas TPU kernel: the path-DP transition-edge obstacle costs,
batch-in-lanes.

After round 5's speed-DP packing and gather rewrites, the XLA lowering of
``path_dp.transition_obstacle_costs`` was the headline's largest remaining
XLA-side chunk (device trace: >= 1.0 ms/cycle at batch 4096 across
fusion.572/.573/add_multiply_fusion.12 plus tail fusions — the sparse
(2, K, rows, rows, m) squared-distance/band chain). The per-lane tensor is
small (23k elements) but XLA materializes each of its ~8 elementwise
passes through HBM-visible fusions; here the whole chain runs
register-resident per (obstacle slot, candidate edge) with lanes in the
128-lane dimension.

Structure (mirrors the XLA path op for op — see
``path_dp.transition_obstacle_costs`` for the sparsity argument):

* one grid step per 512-lane block; the (cols-1, rows*rows, blk) output
  accumulates in VMEM;
* K-slot outer loop gated per slot (``pl.when(any(valid))`` — dp_top_m
  pads to 8 slots, typical scenes fill 3-6), candidate loop (2) gated on
  any lane having that edge in window;
* inner m-sample loop: (rows*rows, blk) slices — ~36 vregs, the same
  register-resident shape discipline as the speed-DP k-sliced recursion;
* the per-(slot, candidate) scatter adds into at most cols-1 output
  columns, each gated on any lane hitting it.

Accumulation order (m ascending; k outer, c inner; column adds masked)
matches the XLA path's explicit sequential folds exactly, so the two
paths are bit-identical — the custom_vmap rule in ``path_dp`` dispatches
full-lane TPU batches here with the XLA path as the semantic base.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emplanner_carla_tpu.config import PathPlanConfig
from emplanner_carla_tpu.types import Array

BLK = 128


def transition_obstacle_costs_batched(
    obs_s: Array,
    obs_l: Array,
    obs_valid: Array,
    plan_start_s: Array,
    cfg: PathPlanConfig,
) -> Array:
    """Batched form: obs_s/obs_l/obs_valid (B, K), plan_start_s (B,).
    Returns (B, cols-1, rows, rows), bit-identical to
    ``jax.vmap(path_dp.transition_obstacle_costs)``."""
    from emplanner_carla_tpu.planner.path_dp import _transition_geometry

    rows, cols, m = cfg.rows, cfg.cols, cfg.n_edge_samples
    h = float(cfg.sample_s)
    B, K = obs_s.shape
    assert B % BLK == 0, f"batch {B} must be a multiple of {BLK}"
    blk = next(c for c in (512, 256, 128) if B % c == 0)
    RR = rows * rows

    trans_l, _, u_np = _transition_geometry(cfg)
    tl = np.asarray(trans_l, np.float32).reshape(RR, m).T.copy()  # (m, RR)
    # u*h as exact f32 products (python-double u[q]*h differs in the last
    # ulp from the XLA path's f32 multiply)
    uh = [
        float(np.float32(x) * np.float32(h))
        for x in np.asarray(u_np, np.float32)
    ]
    span = h * (m - 1) / m
    safe = float(cfg.safe_dist)
    danger2 = float(cfg.danger_dist) ** 2
    safe2 = float(cfg.safe_dist) ** 2
    num = float(cfg.danger_cost_num)
    w_coll = float(cfg.w_collision)
    ncols = cols - 1

    def kernel(os_ref, ol_ref, va_ref, ps_ref, tl_ref, o_ref):
        o_ref[:] = jnp.zeros((ncols, RR, blk), jnp.float32)
        ps = ps_ref[:]                               # (1, blk)
        for k in range(K):
            ok_v = va_ref[k : k + 1, :] > 0.5        # (1, blk)

            @pl.when(jnp.any(ok_v))
            def _slot(k=k, ok_v=ok_v):
                os_k = os_ref[k : k + 1, :]
                ol_k = ol_ref[k : k + 1, :]
                r = os_k - ps
                n1 = jnp.floor((r + safe) / h)
                n_lo = (r - safe - span) / h
                for c in range(2):
                    cn = n1 - (1.0 - c)
                    ok = (
                        (cn >= 1.0) & (cn <= float(ncols))
                        & (cn >= n_lo) & ok_v
                    )                                # (1, blk)

                    @pl.when(jnp.any(ok))
                    def _cand(cn=cn, ok=ok, os_k=os_k, ol_k=ol_k):
                        base_s = ps + cn * h
                        coll = jnp.zeros((RR, blk), bool)
                        bc = jnp.zeros((RR, blk), jnp.float32)
                        for q in range(m):
                            s_c = base_s + uh[q]
                            ds = os_k - s_c
                            ds2 = ds * ds            # (1, blk)
                            dl = ol_k - tl_ref[q]    # (RR, 1) bcast
                            dl2 = dl * dl
                            d2 = ds2 + dl2           # (RR, blk)
                            coll = coll | (d2 <= danger2)
                            bc = bc + jnp.where(
                                (d2 > danger2) & (d2 < safe2),
                                num / jnp.maximum(d2, 1e-6),
                                0.0,
                            )
                        po = jnp.where(coll, w_coll, 0.0) + bc
                        po = jnp.where(ok, po, 0.0)
                        for col in range(ncols):
                            hit = ok & (cn == float(col + 1))

                            @pl.when(jnp.any(hit))
                            def _col(col=col, hit=hit, po=po):
                                o_ref[col] = o_ref[col] + jnp.where(
                                    hit, po, 0.0
                                )

    kspec = pl.BlockSpec((K, blk), lambda b: (0, b), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B // blk,),
        in_specs=[
            kspec, kspec, kspec,
            pl.BlockSpec((1, blk), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, RR, 1), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ncols, RR, blk), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ncols, RR, B), jnp.float32),
        interpret=bool(
            getattr(transition_obstacle_costs_batched, "_interpret", False)
        ),
    )(
        obs_s.T, obs_l.T, obs_valid.astype(jnp.float32).T,
        plan_start_s[None, :],
        jnp.asarray(tl)[:, :, None],
    )
    return jnp.transpose(out, (2, 0, 1)).reshape(B, ncols, rows, rows)
