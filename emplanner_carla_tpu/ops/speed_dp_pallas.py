"""Pallas TPU kernel: the S-T speed-DP recursion, batch-in-lanes, with the
obstacle edge costs computed IN-KERNEL from the raw ST segments.

The XLA version of the 16-column speed DP spends ~50 ms per 4096-batch on
the scan alone — ~6x off bandwidth-bound, because the natural vmap layout
(B, 40, 40) leaves a 40-wide minor dimension (a third of a lane register)
and every column round-trips the carry through HBM. This kernel is the
"S-L/S-T DP as a Pallas wavefront kernel" of BASELINE.json's north star:

* batch lives in the lane dimension: all tensors are (40, 40, BLK) /
  (40, BLK) with BLK = 128 — full lane utilization;
* the DP carry (cost, arrival speed) stays in VMEM scratch across all
  columns; obstacle edge costs are computed *inside* the kernel from the
  K=2 segment parameters (10 floats/scenario) instead of streaming a
  precomputed (n_t-1, n_s, n_s, B) slab from HBM — at batch 4096 that
  slab is 393 MB written by XLA and re-read by the kernel (~2 ms of pure
  HBM traffic) for what is per-scenario ~40 bytes of actual information;
* a per-block validity gate (`pl.when(any_valid)`) skips the whole
  obstacle computation — sqrt/exp chains over (40, 40, BLK) — when no
  scenario in the block has a valid ST segment. In the headline fleet mix
  the lead NPC travels in-lane (|l_dot| below the st_graph gate), so most
  blocks carry zero valid segments and the DP collapses to the pure
  recursion;
* the grid is (batch blocks, columns) with columns minor.

The obstacle-cost math reproduces ``speed_planner._edge_obs_tensors``
(single-sqrt point-segment distances, endpoint/interior decomposition,
hoisted t-only subexpressions) term for term so the Pallas and XLA DPs
stay numerically aligned. First-minimum tie-break of the reference DP
(strict <, ``speed_planning_test.py:145``) via the ascending-k running
strict-< update of the k-sliced recursion (round 5 — see column_min),
which also lets the kernel emit predecessor STATIONS instead of
indices — no iota materialization, no index gathers anywhere.

Round-5 structure (measured on the chained standalone solve, batch 4096):

* liveness packing in ``speed_dp_batched`` (see its docstring): spread
  fleet mix 3.01 -> 1.03 ms/DP, headline 429.6k -> 501.7k cycles/s;
* k-sliced recursion: the per-column transition update iterates the 40
  predecessor stations as (n_s, blk) slices with an incremental
  first-min instead of materializing (n_s, n_s, blk) slabs ~14 times —
  intermediates stay in vector registers. Spread 1.03 -> 0.83,
  all-dead 0.93 -> 0.57 ms/DP; bit-identical (same per-element op
  order; ascending-k strict-< = the masked-sg-min tie-break).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emplanner_carla_tpu.config import SpeedPlanConfig
from emplanner_carla_tpu.types import Array

BLK = 128


def speed_dp_recursion(seg, v0: Array, cfg: SpeedPlanConfig):
    """Run the batched DP recursion with in-kernel obstacle costs.

    seg: STSegments with (B, K) fields; v0: (B,). Returns
    (cost_last (B, n_s), top_costs (B, n_t), predecessor stations
    (B, n_t-1, n_s) — exact s_grid values, see the backtrack)."""
    n_s, n_t = cfg.n_s, cfg.n_t
    B, K = seg.valid.shape
    assert B % BLK == 0, f"batch {B} must be a multiple of {BLK}"
    # grid blocks execute sequentially on the TensorCore (same rationale
    # as the tick kernel): the 15-column serial recursion is launch/
    # overhead-bound at 128 lanes, so take the largest lane block that
    # divides B and fits the (n_s, n_s, blk) slab working set in VMEM
    blk = next(c for c in (512, 256, 128) if B % c == 0)
    dt = cfg.t_step
    m = cfg.n_edge_samples
    s_grid_np = np.asarray(cfg.s_grid, np.float32)
    # the kernel's masked-min arrival-speed selection relies on this
    assert np.all(np.diff(s_grid_np) > 0), "s_grid must be increasing"
    t0 = float(dt)

    dv_np = (s_grid_np[None, :] - s_grid_np[:, None]) / dt       # (k, j)
    ref_tr_np = (
        cfg.w_ref_speed * (dv_np - cfg.reference_speed) ** 2
        + np.where(dv_np < 0.0, 1e8, 0.0)                        # no reverse
    ).astype(np.float32)
    v0_edge_np = (s_grid_np / t0).astype(np.float32)             # (j,)
    ref0_np = (
        cfg.w_ref_speed * (v0_edge_np - cfg.reference_speed) ** 2
    ).astype(np.float32)

    frac_np = np.arange(m, dtype=np.float32) / (m - 1)           # [0, 1]
    fm = [float(f) for f in frac_np[1:-1]]                       # interior
    # interior sample stations s_mid(q, k, j) = s_k + (s_j - s_k) * fm_q
    smid_np = (
        s_grid_np[None, :, None]
        + (s_grid_np[None, None, :] - s_grid_np[None, :, None])
        * frac_np[1:-1][:, None, None]
    ).astype(np.float32)                                         # (m-2, k, j)
    # start-edge samples s0(q, j) = s_j * frac_q
    s0_np = (frac_np[:, None] * s_grid_np[None, :]).astype(np.float32)

    a_lo, a_hi = cfg.accel_min, cfg.accel_max
    w_acc, pen = cfg.w_accel, cfg.accel_penalty
    w_obs = float(cfg.w_obs)
    coll_d = float(cfg.obs_collision_dist)
    dang_d = float(cfg.obs_danger_dist)
    log_w = float(np.log(np.float32(w_obs)))

    def _cost_of(d):
        """= speed_planner._collision_cost (w_obs / exp band / 0)."""
        band = jnp.exp(log_w * (coll_d + 1.0 - d))
        return jnp.where(d < coll_d, w_obs, jnp.where(d < dang_d, band, 0.0))

    def kernel(v0_ref, si_ref, so_ref, ti_ref, to_ref, va_ref,
               dvT_ref, reftrT_ref, sg_ref, v0e_ref, ref0_ref,
               smid_ref, s0_ref,
               cost_out, top0_out, arg_out,
               cost_s, sdot_s, top0_s, obs_s):
        t = pl.program_id(1)
        sg = sg_ref[:]                           # (n_s, 1)
        any_v = jnp.any(va_ref[:] > 0.5)
        t_start = (t + 1).astype(jnp.float32) * dt
        t_end = t_start + dt

        def seg_fields(k):
            si, so = si_ref[k], so_ref[k]        # (BLK,)
            ti, to = ti_ref[k], to_ref[k]
            mk = va_ref[k]
            v3s, v3t = so - si, to - ti
            nrm = v3s * v3s + v3t * v3t + 1e-24
            return si, so, ti, to, mk, v3s, v3t, nrm

        def point_cost_k(k, s_pts, t_pt):
            """Segment-k distance cost of the (n_s, 1)-station, scalar-time
            sample set -> (n_s, BLK). Mirrors _seg_distance."""
            si, so, ti, to, mk, v3s, v3t, nrm = seg_fields(k)
            v1s = si - s_pts                 # (n_s, BLK)
            v1t = ti - t_pt                  # (BLK,)
            v2s = so - s_pts
            v2t = to - t_pt
            d1_sq = v1s * v1s + v1t * v1t
            d2_sq = v2s * v2s + v2t * v2t
            cross = v1s * v3t - v1t * v3s
            d_perp_sq = cross * cross * (1.0 / nrm)
            p1 = v1s * v3s + v1t * v3t
            p2 = v2s * v3s + v2t * v3t
            endpoint = (p1 > 0) == (p2 > 0)
            d = jnp.sqrt(
                jnp.where(endpoint, jnp.minimum(d1_sq, d2_sq), d_perp_sq)
            )
            return mk * _cost_of(d)

        @pl.when(t == 0)
        def _init():
            v0b = v0_ref[:]                      # (1, BLK)
            a0 = (v0e_ref[:] - v0b) / t0         # (n_s, BLK)
            acc0 = jnp.where(
                (a0 < a_hi) & (a0 > a_lo), w_acc, pen * w_acc
            ) * (a0 * a0)
            cost_s[:] = ref0_ref[:] + acc0
            sdot_s[:] = jnp.broadcast_to(v0e_ref[:], (n_s, blk))

            # per-SLOT validity gate: in the fleet mix at most one segment
            # slot is populated in a block (one crossing NPC per scenario),
            # so slot 1's sqrt/exp chains are skipped block-wide. The gate
            # also time-prunes: this column's samples all lie in
            # [0, t0], and the ST distance is lower-bounded by the pure
            # time gap to the segment's [ti, to] span — a gap >= dang_d
            # means every sample costs exactly 0.0 (cost_of is identically
            # zero beyond dang_d), so the skip is bit-identical.
            for k in range(K):
                t_gap0 = jnp.maximum(ti_ref[k] - t0, -to_ref[k])
                live0 = (va_ref[k] > 0.5) & (t_gap0 < dang_d)

                @pl.when(jnp.any(live0))
                def _obs0(k=k):
                    ob = jnp.zeros((n_s, blk), jnp.float32)
                    for q in range(m):
                        ob = ob + point_cost_k(
                            k, s0_ref[q][:, None], float(frac_np[q]) * t0
                        )
                    cost_s[:] = cost_s[:] + ob

            top0_s[:] = cost_s[n_s - 1 : n_s, :]

        # ---- obstacle cost slab for this column, accumulated per valid
        # segment slot (a block with no valid slot pays nothing; a block
        # with one pays one slot's chains) ----
        # validity AND time-pruning gates (see _init): this column's
        # samples all lie in [t_start, t_end]; a pure-time gap of
        # dang_d or more to [ti, to] zeroes every cost exactly, so
        # the whole sqrt/exp slab is skipped for the column —
        # a crossing segment spans well under a second of the 8 s
        # horizon, so even populated blocks skip most columns
        lives = []
        for k in range(K):
            t_gap = jnp.maximum(ti_ref[k] - t_end, t_start - to_ref[k])
            lives.append((va_ref[k] > 0.5) & (t_gap < dang_d))
        # scalar OR of per-slot reductions (stacking the bool vectors hits
        # Mosaic's "invalid vector register cast" on i1 vregs)
        live_any = jnp.any(lives[0])
        for lv in lives[1:]:
            live_any = live_any | jnp.any(lv)

        @pl.when(live_any)
        def _obs_zero():
            obs_s[:] = jnp.zeros((n_s, n_s, blk), jnp.float32)

        for k in range(K):
            @pl.when(jnp.any(lives[k]))
            def _obs_slab_k(k=k):
                # endpoint pieces: q = 0 at (s_k, t_start), q = m-1 at
                # (s_j, t_end) — rank-1 in (k, j)
                costA = point_cost_k(k, sg, t_start)   # (n_s=k, BLK)
                costB = point_cost_k(k, sg, t_end)     # (n_s=j, BLK)
                acc = costA[:, None, :] + costB[None, :, :]
                # interior samples: hoisted t-only/segment-only
                # subexpressions (mirrors _edge_obs_tensors' piece C)
                si, so, ti, to, mk, v3s, v3t, nrm = seg_fields(k)
                inv = 1.0 / nrm
                for q in range(m - 2):
                    t_p = t_start + dt * fm[q]
                    v1t = ti - t_p               # (BLK,)
                    v2t = to - t_p
                    c1 = v1t * v1t
                    c2 = v2t * v2t
                    c3 = v1t * v3s
                    c4 = v1t * v3t
                    v1s = si - smid_ref[q][:, :, None]   # (k, j, BLK)
                    d1_sq = v1s * v1s + c1
                    v2s = v1s + v3s
                    d2_sq = v2s * v2s + c2
                    cross = v1s * v3t - c3
                    d_perp_sq = cross * cross * inv
                    p1 = v1s * v3s + c4
                    p2 = p1 + nrm
                    endpoint = (p1 > 0) == (p2 > 0)
                    d = jnp.sqrt(
                        jnp.where(
                            endpoint, jnp.minimum(d1_sq, d2_sq), d_perp_sq
                        )
                    )
                    acc = acc + mk * _cost_of(d)
                obs_s[:] = obs_s[:] + acc

        cost_prev = cost_s[:]                    # (n_s, BLK)
        sdot_prev = sdot_s[:]
        dvT = dvT_ref[:]                         # (j, k)
        reftrT = reftrT_ref[:]                   # (j, k)

        # k-sliced incremental first-min instead of materializing the
        # (n_s, n_s, BLK) transition slab: every intermediate is one
        # (n_s, BLK) slice (~20 vregs at blk=512), so the chain lives in
        # vector registers instead of round-tripping VMEM ~14 times per
        # column. Per-element op order is IDENTICAL to the slab form
        # (sub, div, square, range-select, multiply, two adds), and the
        # ascending-k strict-< update reproduces the reference first-min
        # tie-break exactly (s_grid increasing => first minimum has the
        # smallest station), so results are bit-identical.
        def column_min(with_obs):
            cost_new = None
            s_sel = None
            for k in range(n_s):
                accel = (dvT[:, k : k + 1] - sdot_prev[k : k + 1, :]) / dt
                a_sq = accel * accel
                acc_cost = jnp.where(
                    (accel < a_hi) & (accel > a_lo), w_acc, pen * w_acc
                ) * a_sq
                tmp = (cost_prev[k : k + 1, :] + reftrT[:, k : k + 1]
                       ) + acc_cost
                if with_obs:
                    tmp = tmp + obs_s[k]
                if cost_new is None:
                    cost_new, s_sel = tmp, jnp.full(
                        (n_s, blk), float(s_grid_np[0]), jnp.float32
                    )
                else:
                    better = tmp < cost_new
                    cost_new = jnp.where(better, tmp, cost_new)
                    s_sel = jnp.where(better, float(s_grid_np[k]), s_sel)
            return cost_new, s_sel

        # the obs slab reads are skipped entirely for dead columns (the
        # common case: headline blocks carry no valid segment and a
        # populated block's segment spans ~1 of the 15 columns)
        cost_new, s_sel = jax.lax.cond(
            live_any,
            lambda: column_min(True),
            lambda: column_min(False),
        )
        sdot_new = (sg[:, 0][:, None] - s_sel) / dt

        cost_s[:] = cost_new
        sdot_s[:] = sdot_new
        cost_out[0] = cost_new
        top0_out[:] = top0_s[:]
        arg_out[0] = s_sel

    n_steps = n_t - 1
    grid = (B // blk, n_steps)
    interp = bool(getattr(speed_dp_recursion, "_interpret", False))

    seg_spec = pl.BlockSpec((K, blk), lambda b, t: (0, b),
                            memory_space=pltpu.VMEM)
    cost_all_T, top0_T, args_T = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk), lambda b, t: (0, b),
                         memory_space=pltpu.VMEM),
            seg_spec, seg_spec, seg_spec, seg_spec, seg_spec,
            pl.BlockSpec((n_s, n_s), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_s, n_s), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_s, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_s, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_s, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m - 2, n_s, n_s), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, n_s), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n_s, blk), lambda b, t: (t, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda b, t: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_s, blk), lambda b, t: (t, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_steps, n_s, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, n_s, B), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_s, blk), jnp.float32),
            pltpu.VMEM((n_s, blk), jnp.float32),
            pltpu.VMEM((1, blk), jnp.float32),
            pltpu.VMEM((n_s, n_s, blk), jnp.float32),
        ],
        interpret=interp,
    )(
        v0[None, :],
        seg.s_in.T, seg.s_out.T, seg.t_in.T, seg.t_out.T,
        seg.valid.astype(jnp.float32).T,
        jnp.asarray(dv_np.T.copy()), jnp.asarray(ref_tr_np.T.copy()),
        jnp.asarray(s_grid_np)[:, None],
        jnp.asarray(v0_edge_np)[:, None],
        jnp.asarray(ref0_np)[:, None],
        jnp.asarray(smid_np), jnp.asarray(s0_np),
    )

    top = jnp.concatenate(
        [top0_T, cost_all_T[:, n_s - 1, :]], axis=0
    )  # (n_t, B)
    return (
        cost_all_T[-1].T,           # (B, n_s)
        top.T,                      # (B, n_t)
        jnp.transpose(args_T, (2, 0, 1)),  # (B, n_steps, n_s)
    )


def speed_dp_batched(seg, v0: Array, cfg: SpeedPlanConfig):
    """Batched speed DP: the drop-in fleet-scale form of
    ``planner.speed_planner.speed_dp``.

    seg: STSegments with leading batch axis (B, K); v0: (B,). Returns a
    ``SpeedDPResult`` with leading batch axis. Obstacle edge costs are
    computed inside the kernel (see module docstring); numerically aligned
    with the vmapped XLA DP (same single-sqrt distance decomposition).
    Dispatched onto the ``simulate_full`` hot path by
    ``speed_planner.speed_dp``'s ``jax.custom_vmap`` rule whenever the
    vmapped batch fills whole lane registers (B % BLK == 0) on a TPU
    backend.

    Liveness packing: the kernel's obstacle gate is per BLOCK — one lane
    with a valid ST segment makes all 512 lanes of its block pay the full
    sqrt/exp slab chain. In the headline fleet mix only ~5% of lane-cycles
    carry a segment, spread uniformly, so EVERY block used to go live
    (measured: the obstacle slabs cost 1.94 of the kernel's 2.77 ms/cycle
    at batch 4096). Sorting lanes dead-first clusters the live lanes into
    the minimal tail of blocks; every kernel op is lane-elementwise (the
    only cross-lane reads are the block-wide gating `any`s, which switch
    between bit-identical branches), so per-lane results are unchanged and
    only the final (B, n_t)-shaped SpeedDPResult needs unpermuting.
    """
    from emplanner_carla_tpu.planner import speed_planner as SP

    n_s, n_t = cfg.n_s, cfg.n_t
    s_grid = jnp.asarray(np.asarray(cfg.s_grid), jnp.float32)
    t_grid = (jnp.arange(n_t, dtype=jnp.float32) + 1.0) * cfg.t_step

    live = jnp.any(seg.valid, axis=1)
    perm = jnp.argsort(live.astype(jnp.int32))        # dead lanes first
    inv = jnp.argsort(perm)
    seg = jax.tree.map(lambda a: jnp.take(a, perm, axis=0), seg)
    v0 = jnp.take(v0, perm, axis=0)

    cost_last, top, args = speed_dp_recursion(seg, v0, cfg)

    # termination + backtrack (vectorized; same tie-breaks as the XLA DP).
    # The kernel emits predecessor STATIONS (exact copies of s_grid
    # entries), so the backtrack works in station values end to end:
    # every per-lane read is an exact-equality one-hot contraction or a
    # direct min reduction — the earlier take_along_axis/index forms
    # lowered to gather fusions measured ~0.85 ms/cycle at batch 4096
    # (the same per-lane-gather poison as frenet._gather).
    B = v0.shape[0]
    right_cost = jnp.min(cost_last, axis=1)
    # station at the FIRST cost minimum: s_grid is increasing, so the
    # masked min over the tie set reproduces argmin's first-min tie-break
    s_right = jnp.min(
        jnp.where(cost_last <= right_cost[:, None], s_grid[None, :], 1e30),
        axis=1,
    )
    best_top_col = (
        n_t - 1 - jnp.argmin(top[:, ::-1], axis=1)
    ).astype(jnp.int32)
    top_cost = jnp.min(top, axis=1)             # tie index irrelevant
    use_top = top_cost <= right_cost
    end_col = jnp.where(use_top, best_top_col, n_t - 1)
    end_s = jnp.where(use_top, s_grid[n_s - 1], s_right)

    def emit(carry, c):
        s_cur = carry                           # (B,) station value
        on = c <= end_col
        this_s = jnp.where(c == end_col, end_s, s_cur)
        oh = this_s[:, None] == s_grid[None, :]                # (B, n_s)
        arg_c = args[:, jnp.maximum(c - 1, 0)]                 # (B, n_s)
        prev = jnp.where(
            (c > 0) & on,
            jnp.sum(jnp.where(oh, arg_c, 0.0), axis=1),
            this_s,
        )
        return prev, jnp.where(on, this_s, -1.0)

    _, s_rev = jax.lax.scan(emit, end_s, jnp.arange(n_t - 1, -1, -1))
    s_vals = s_rev[::-1]  # (n_t, B)
    valid_c = jnp.arange(n_t)[:, None] <= end_col[None, :]
    s_out = jnp.where(valid_c, s_vals, 0.0)
    # undo the liveness packing (cheap: only the final (B, n_t) result
    # crosses back, never the (B, n_t-1, n_s) predecessor tensor)
    return SP.SpeedDPResult(
        jnp.take(s_out.T, inv, axis=0),
        jnp.broadcast_to(t_grid[None, :], (B, n_t)),
        jnp.take(valid_c.T, inv, axis=0),
        jnp.take(end_col, inv, axis=0),
    )
