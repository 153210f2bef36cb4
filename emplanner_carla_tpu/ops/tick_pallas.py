"""Pallas TPU kernel: the full control/plant tick loop, batch-in-lanes.

One EM plan cycle runs ``plan_every`` (100) sequential control ticks — ACC
guard, trajectory speed lookup, LQR lateral control, PID, arrival logic,
kinematic plant, obstacle advance, collision check, metrics. As an XLA
``lax.scan`` each tick body fragments into ~a dozen small kernels (every
reduction ends a fusion), so 100 ticks cost ~1200 kernel launches —
measured 7.5 ms/batch-4096 after op-level tuning, almost entirely launch
latency rather than arithmetic.

This kernel runs the whole tick loop for a block of up to 512 scenarios
in one ``pallas_call``: state lives in registers/VMEM across ticks (batch
in the lane dimension, path/table/buffer axes in sublanes; every
per-scenario value is kept (1, blk)-shaped — Mosaic's vector layouts want
rank >= 2), and per-tick metrics stream to VMEM output buffers. The math
mirrors ``sim/closed_loop._full_ticks_base`` term for term
(reference anchors: ``controller.py:374-611`` LQR, ``:65-336`` MPC,
``:614-677`` PID, ``:694-724`` facade; ``test_9.py:333-446`` loop
pacing/arrival brake). Both lateral controllers (LQR gain table /
condensed-MPC box ADMM with a fused single-dot table lerp and an
all-interior ``lax.cond`` skip), both plants (kinematic /
friction-limited dynamic bicycle), traffic-light red-stop caps (ego +
NPC stop-line leads), and the agent-traffic branch (``traffic=``: all
NPC agents stepped in-register — pure pursuit on the global path, IDM,
overtake-pressure lane changes — with a polynomial atan2, Mosaic having
no atan2 lowering) are implemented; every closed-loop production path
is kernel-eligible (see ``_tick_kernel_eligible``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emplanner_carla_tpu.config import EMConfig
from emplanner_carla_tpu.types import Array

BLK = 128   # minimum lane-block: dispatch requires B % BLK == 0

# single-sourced with the XLA scan bodies (see sim/loop_constants.py)
from emplanner_carla_tpu.sim.loop_constants import (  # noqa: E402
    ACC_HEADWAY, ACC_STANDOFF, COLLISION_RADIUS,
)


def _atan2(y: Array, x: Array) -> Array:
    """Quadrant-correct atan2 for Mosaic (no TC lowering for ``atan2``).

    Octant reduction + the cephes ``atanf`` degree-9 odd polynomial with
    its tan(pi/8) split — |error| < ~2e-7 rad over all inputs, i.e. at the
    f32 representation floor; the interpret-mode equivalence tests compare
    the in-kernel NPC agents (pure-pursuit headings flow through this)
    against ``jnp.arctan2`` in the XLA scan at 1e-3-grade tolerances."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    r = jnp.minimum(ax, ay) / jnp.maximum(mx, 1e-30)   # in [0, 1]
    mid = r > 0.41421356
    x1 = jnp.where(mid, (r - 1.0) / (r + 1.0), r)
    z = x1 * x1
    a = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1)
        * z - 3.33329491539e-1
    ) * z * x1 + x1
    a = a + jnp.where(mid, jnp.pi / 4, 0.0)
    a = jnp.where(ay > ax, jnp.pi / 2 - a, a)
    a = jnp.where(x < 0, jnp.pi - a, a)
    return jnp.where(y < 0, -a, a)


def run_ticks_batched(
    ego,            # EgoState, fields (B,)
    pid_buffer: Array,   # (B, n_buf)
    pid_count: Array,    # (B,) int32
    pid_last: Array,     # (B,)
    obs,            # Obstacles, fields (B, K)
    traj_speed: Array,   # (B, n_dense) planned speed profile (m/s)
    target,         # Path, fields (B, n_path)
    arrived0: Array,     # (B,) bool
    feas: Array,         # (B,) bool
    plan_ok: Array,      # (B,) bool
    dest_x: Array,       # (B,)
    dest_y: Array,       # (B,)
    cfg: EMConfig,
    traffic=None,
    lights=None,
):
    """Run ``cfg.loop.plan_every`` ticks for the whole batch in one kernel.

    Returns (ego', pid_buffer', pid_count', pid_last', obs', arrived',
    metrics) with metrics = dict of (B, n_ticks) arrays matching
    ``TickMetrics`` channel semantics.

    ``lights``: optional (TrafficLights with (B, L) fields, t0 (B,)) —
    fixed-cycle red-light stop lines: the ego's ACC cap is min'd with the
    time-headway red-light cap (sim/traffic_light.red_light_cap) at
    t_abs = t0 + (tick+1) dt, and in traffic mode every NPC treats a red
    stop line as a stationary IDM lead. Invalid slots gate to +inf, so
    TrafficLights.none() reproduces the lights-free loop exactly.

    ``traffic``: optional (global_path (B, n_gp), npc_idx (B, K) int32,
    lane_off (B, K), lane_tgt (B, K), agent_slot (B, K) bool, behavior str)
    — the agent-traffic mode (``closed_loop._traffic_ticks_base``'s
    semantics): instead of constant-velocity advance, agent slots run the
    sim/npc.py model (pure pursuit toward a lookahead on the global path +
    IDM against the nearest lead + overtake-pressure lane changes) against
    the ego and each other, entirely in-register across the cycle. Extra
    returns: (..., obs', npc_idx', lane_off', lane_tgt', arrived', metrics).
    """
    from emplanner_carla_tpu.control import lateral
    from emplanner_carla_tpu.control import pid as pid_mod
    from emplanner_carla_tpu.sim import npc as npc_mod
    from emplanner_carla_tpu.sim import plant as plant_mod
    from emplanner_carla_tpu.types import EgoState, Obstacles

    B = ego.x.shape[0]
    assert B % BLK == 0
    # grid blocks execute sequentially on the TensorCore; pick the largest
    # lane block dividing B (the MPC branch runs a 40-iteration per-tick
    # ADMM whose serial latency scales with the block count — 32 blocks of
    # 128 measured SLOWER than the XLA scan). 1024-lane blocks halve the
    # sequential grid steps (headline tick kernel 1.00 -> 0.91 ms/cycle,
    # round 5) and fit the 16 MB scoped-VMEM limit for the LQR kernel;
    # the MPC branch's per-tick gain-table contraction transient pushes
    # 1024 to 17.98 MB (measured OOM), and the traffic branch's global-
    # path block + per-slot agent state overflows the same way — both
    # cap at 512.
    blk_cap = (
        512 if (cfg.control.kind == "MPC" or traffic is not None) else 1024
    )
    blk = next(c for c in (blk_cap, 512, 256, 128) if B % c == 0)
    K = obs.x.shape[1]
    n_path = target.x.shape[1]
    n_dense = traj_speed.shape[1]
    n_buf = pid_buffer.shape[1]
    n_ticks = cfg.loop.plan_every

    cc, vp, lp = cfg.control, cfg.vehicle, cfg.plant
    kind = cc.kind
    plant_kind = lp.kind
    if kind == "MPC":
        import numpy as _np

        vx_grid_np, Minv_np, G1_np, g2_np, Hinv2_np = lateral.mpc_tables(
            cfg.vehicle, cc
        )
        nu = g2_np.shape[1]
        # ALL seven per-lane table lerps fused into ONE MXU contraction
        # (value(lane) = table.T @ sel(lane)): rows stacked
        # [Minv (nu^2) | G1 e-channels (4 x nu) | g2 (nu) | Hinv2 (nu^2)],
        # sliced apart in-kernel. Seven separate small dots measured as
        # dispatch/relayout overhead on the MPC tick's serial path.
        _tab = _np.concatenate(
            [
                Minv_np.reshape(Minv_np.shape[0], nu * nu).T,  # (nu*nu, n_tab)
            ] + [
                G1_np[:, :, k].T for k in range(4)             # 4 x (nu, n_tab)
            ] + [
                g2_np.T,                                       # (nu, n_tab)
                Hinv2_np.reshape(Hinv2_np.shape[0], nu * nu).T,
            ],
            axis=0,
        )
        # hi/lo bf16 split at trace time: the in-kernel lerp dot runs 3 MXU
        # passes (hh + hl + lh, f32 accumulation) instead of HIGHEST's 6 —
        # ~2^-22 relative on the lerped gains, the same validated regime as
        # the warm-QP kernels (qp_pallas.make_pallas_qp matmul="bf16x3")
        import ml_dtypes as _mld

        _tab_hi = _tab.astype(_mld.bfloat16)
        _tab_lo = (_tab - _tab_hi.astype(_np.float32)).astype(_mld.bfloat16)
        consts_np = [_np.stack([_tab_hi, _tab_lo])]  # (2, 2nu^2+6nu, n_tab)
    else:
        vx_grid_np, K_table_np = lateral.lqr_gain_table(cfg.vehicle, cc)
        consts_np = [K_table_np]                           # (n_tab, 4)
    n_tab = vx_grid_np.shape[0]
    tab_v0 = float(vx_grid_np[0])
    tab_dv = float(vx_grid_np[1] - vx_grid_np[0])

    dt = float(lp.dt)
    t_horizon = float(cfg.speed.n_t * cfg.speed.t_step)
    t_dx = t_horizon / (n_dense - 1)

    a, b = vp.a, vp.b
    cf, cr, m_veh = vp.cf, vp.cr, vp.mass
    L_wb = a + b
    max_steer = vp.max_steer_rad
    arrival_d2 = float(cfg.loop.arrival_dist) ** 2

    if traffic is not None:
        (gp, npc_idx0, lane_off0, lane_tgt0, agent_slot, behavior) = traffic
        n_gp = gp.x.shape[1]
        n_cv_slots = cfg.n_static_obs  # slots below are never agents
        import math as _math

        (P_MAXSPD, P_SAFET, P_MIND, P_ACC, P_DEC) = npc_mod.preset_floats(
            behavior
        )
        P_SQRT_AB = _math.sqrt(P_ACC * P_DEC)
        P_MAXSPD_C = max(P_MAXSPD, 0.1)
        LANE_W = float(npc_mod.LANE_WIDTH)
        LANE_RATE = float(npc_mod.LANE_CHANGE_RATE)
        # windowed agent fast path (see the w08 comment in the kernel);
        # _force_full_path is a test hook pinning the full-path branch
        W_ROWS = 96
        use_window = n_gp > W_ROWS and not getattr(
            run_ticks_batched, "_force_full_path", False
        )

    if lights is not None:
        from emplanner_carla_tpu.sim.traffic_light import (
            STOP_HEADWAY, STOP_LAT_GATE, STOP_STANDOFF,
        )

        tl, t0_cycle = lights
        L_n = tl.x.shape[1]

    n_consts = len(consts_np)

    n_in_fixed = (
        8 + (2 if traffic is not None else 0)
        + (1 if lights is not None else 0)
    )

    def kernel(*refs):
        (ego_ref, pbuf_ref, pmisc_ref, obsr_ref, spd_ref, tgt_ref,
         flag_ref, dest_ref) = refs[:8]
        pos_in = 8
        if traffic is not None:
            gp_ref, npcr_ref = refs[pos_in : pos_in + 2]
            pos_in += 2
        if lights is not None:
            tl_ref = refs[pos_in]
            pos_in += 1
        const_refs = refs[n_in_fixed : n_in_fixed + n_consts]
        outs = refs[n_in_fixed + n_consts :]
        if traffic is not None:
            (ego_out, pbuf_out, pmisc_out, obs_out, npc_out, arr_out,
             mx_out, my_out, mv_out, ml_out, mh_out, mc_out, ma_out,
             mf_out) = outs
        else:
            (ego_out, pbuf_out, pmisc_out, obs_out, arr_out,
             mx_out, my_out, mv_out, ml_out, mh_out, mc_out, ma_out,
             mf_out) = outs
        iota_path = jax.lax.broadcasted_iota(jnp.int32, (n_path, blk), 0)
        iota_tab = jax.lax.broadcasted_iota(jnp.int32, (n_tab, blk), 0)
        iota_16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0).astype(
            jnp.float32
        )
        if traffic is not None:
            iota_gp = jax.lax.broadcasted_iota(jnp.int32, (n_gp, blk), 0)
            iota_K = jax.lax.broadcasted_iota(jnp.int32, (K, blk), 0)
            gp_x, gp_y, gp_th = gp_ref[0], gp_ref[1], gp_ref[2]  # (n_gp, blk)
            agentK = npcr_ref[3]                                 # (K, blk)
            if use_window:
                # block-shared 96-row window of the global path around the
                # block's live agents (GLOBAL row ids carried in iota_win,
                # so all index math below is identical in both views).
                # Every agent-math reduction is a masked sum/min whose
                # support is provably inside the window whenever the
                # per-tick containment gate holds, so the windowed view is
                # BIT-IDENTICAL to the full-path math there (extra rows
                # only ever contribute exact zeros / +inf padding); the
                # gate falls back to the full view otherwise. Motive: the
                # agent math is ~27 (n_gp, blk) vector passes per live
                # slot per tick — 2.27 of config 7's 3.27 ms/cycle tick
                # kernel time at n_gp = 256 (device trace) — and the
                # window cuts those passes 8/3 x. The start index is
                # multiplied by 8 LAST so Mosaic can prove the sublane
                # slice 8-aligned (the spd_ref hat-window idiom).
                ag0 = (npcr_ref[3] > 0.5) & (obsr_ref[4] > 0.5)
                imin = jnp.min(
                    jnp.where(ag0, npcr_ref[0], jnp.float32(1e9))
                )
                w08 = jnp.clip(
                    jnp.floor((imin - 24.0) / 8.0).astype(jnp.int32),
                    0, (n_gp - W_ROWS) // 8,
                ) * 8
                gp_xw = gp_ref[0, pl.ds(w08, W_ROWS)]        # (W_ROWS, blk)
                gp_yw = gp_ref[1, pl.ds(w08, W_ROWS)]
                gp_thw = gp_ref[2, pl.ds(w08, W_ROWS)]
                iota_win = jax.lax.broadcasted_iota(
                    jnp.int32, (W_ROWS, blk), 0
                ) + w08
        if lights is not None:
            # (L, blk) channels + the cycle's absolute start time (1, blk)
            tl_x, tl_y = tl_ref[0], tl_ref[1]
            tl_per = jnp.maximum(tl_ref[2], 1e-3)
            tl_off, tl_gfrac, tl_valid = tl_ref[3], tl_ref[4], tl_ref[5]
            t0_v = flag_ref[3:4]

            def red_stop_dist(px, py, ux_d, uy_d, t_abs):
                """(1, blk) distance to the nearest red stop line ahead in
                the (ux_d, uy_d) corridor; +inf when unaffected — mirrors
                traffic_light.stop_distance."""
                phase = jnp.mod(t_abs + tl_off, tl_per)
                red = (tl_valid > 0.5) & ~(phase < tl_gfrac * tl_per)
                dxl = tl_x - px
                dyl = tl_y - py
                dl_long = dxl * ux_d + dyl * uy_d
                dl_lat = -dxl * uy_d + dyl * ux_d
                gate = red & (dl_long > 0.0) & (
                    jnp.abs(dl_lat) < STOP_LAT_GATE
                )
                return jnp.min(
                    jnp.where(gate, dl_long, jnp.inf), axis=0, keepdims=True
                )

        tgt_x, tgt_y = tgt_ref[0], tgt_ref[1]          # (n_path, blk)
        tgt_th, tgt_k = tgt_ref[2], tgt_ref[3]
        feas_v = flag_ref[0:1]                         # (1, BLK)
        ok_v = flag_ref[1:2]
        not_ok = ok_v < 0.5
        destx = dest_ref[0:1]
        desty = dest_ref[1:2]

        def lat_match(px, py):
            """First-min node match + one-hot channel selection.
            px, py: (1, BLK); returns four (1, BLK) channels."""
            ddx = tgt_x - px
            ddy = tgt_y - py
            d2 = ddx * ddx + ddy * ddy                  # (n_path, blk)
            mn = jnp.min(d2, axis=0, keepdims=True)
            first = jnp.min(
                jnp.where(d2 <= mn, iota_path, n_path), axis=0, keepdims=True
            )
            oh = (iota_path == first).astype(jnp.float32)
            xm = jnp.sum(tgt_x * oh, axis=0, keepdims=True)
            ym = jnp.sum(tgt_y * oh, axis=0, keepdims=True)
            thm = jnp.sum(tgt_th * oh, axis=0, keepdims=True)
            km = jnp.sum(tgt_k * oh, axis=0, keepdims=True)
            return xm, ym, thm, km

        def body(i, st):
            (x, y, phi, vx, vy, omega, _ax, _ay, steer_ap,
             buf, cnt, last, ox, oy, ovx, ovy, ovalid, arr) = st[:18]
            pos = 18
            # MPC only: per-tick-carried box-ADMM warm state (nu, blk)
            mpc_z, mpc_ud = (None, None)
            if kind == "MPC":
                mpc_z, mpc_ud = st[pos : pos + 2]
                pos += 2
            if traffic is not None:
                # per-slot NPC agent state: match index, lane offset/target
                idxK, offK, tgtK = st[pos : pos + 3]
            # all per-scenario values (1, BLK); obstacle arrays (K, BLK)

            # --- planned speed at t_rel (uniform hat, scalar time) ---
            # The hat has <= 2 nonzero weights around a per-tick SCALAR
            # index, so an 8-ALIGNED dynamic 16-row window (Mosaic needs
            # sublane indices provably divisible by 8; the profile is
            # edge-padded to 408 rows at the call boundary so k8+16 is
            # always in range) replaces the full (n_dense, blk)
            # contraction — ~400 of the ~2100 VPU-op cycle budget per
            # block-tick at n_dense=401. Bit-identical to the full masked
            # sum: every weight outside the window is an exact f32 zero
            # (x + 0.0 preserves x) and the in-window terms are the same
            # products in a commutative sum.
            t_rel = (i + 1).astype(jnp.float32) * dt
            u = jnp.clip(t_rel / t_dx, 0.0, n_dense - 1.0)
            k0 = jnp.minimum(jnp.floor(u), n_dense - 2.0).astype(jnp.int32)
            k8 = (k0 // 8) * 8
            rows = spd_ref[pl.ds(k8, 16)]                        # (16, blk)
            w16 = jnp.maximum(
                0.0,
                1.0 - jnp.abs(u - (k8.astype(jnp.float32) + iota_16)),
            )                                                    # (16, 1)
            plan_speed = jnp.sum(rows * w16, axis=0, keepdims=True)
            plan_speed = jnp.where(not_ok, 0.0, plan_speed)

            # --- ACC time-headway guard (closed_loop.simulate_full) ---
            cphi, sphi = jnp.cos(phi), jnp.sin(phi)
            vxw = vx * cphi - vy * sphi
            vyw = vy * cphi + vx * sphi
            spd_w = jnp.sqrt(vxw * vxw + vyw * vyw)
            slow_e = spd_w < 0.5
            den = jnp.where(slow_e, 1.0, jnp.maximum(spd_w, 1e-3))
            # heading fallback below 0.5 m/s (closed_loop._motion_dir):
            # at exact standstill the velocity direction is (0, 0) and
            # every gate ahead would blink out for that tick
            ux = jnp.where(slow_e, cphi, vxw / den)
            uy = jnp.where(slow_e, sphi, vyw / den)
            dxo = ox - x
            dyo = oy - y
            d_long = dxo * ux + dyo * uy                # (K, BLK)
            d_lat = -dxo * uy + dyo * ux
            lead = (ovalid > 0.5) & (d_long > 0.0) & (jnp.abs(d_lat) < 2.0)
            d_lead = jnp.min(
                jnp.where(lead, d_long, jnp.inf), axis=0, keepdims=True
            )
            v_cap = jnp.maximum((d_lead - ACC_STANDOFF) / ACC_HEADWAY, 0.0)
            if lights is not None:
                t_abs = t0_v + (i + 1).astype(jnp.float32) * dt
                # ux/uy already carry the slow-speed heading fallback
                # (shared with the ACC guard above)
                d_stop = red_stop_dist(x, y, ux, uy, t_abs)
                v_cap = jnp.minimum(
                    v_cap,
                    jnp.maximum((d_stop - STOP_STANDOFF) / STOP_HEADWAY, 0.0),
                )
            tick_kmh = 3.6 * jnp.minimum(plan_speed, v_cap)

            # --- lateral steer: shared predicted-pose tracking error, then
            # LQR gain table or condensed-MPC box ADMM (lateral.py) ---
            vxs = jnp.where(
                vx < 0,
                jnp.minimum(vx, -cc.min_vx),
                jnp.maximum(vx, cc.min_vx),
            )
            pos = jnp.clip((vxs - tab_v0) / tab_dv, 0.0, n_tab - 1.0)
            ii = jnp.clip(pos.astype(jnp.int32), 0, n_tab - 2)
            wf = pos - ii.astype(jnp.float32)
            sel = (
                (iota_tab == ii).astype(jnp.float32) * (1.0 - wf)
                + (iota_tab == ii + 1).astype(jnp.float32) * wf
            )                                           # (n_tab, blk)

            ts = cc.ts_predict
            xp = x + (vxs * cphi - vy * sphi) * ts
            yp = y + (vy * cphi + vxs * sphi) * ts
            php = phi + omega * ts
            xm, ym, thm, km = lat_match(xp, yp)
            tx_, ty_ = jnp.cos(thm), jnp.sin(thm)
            ddx, ddy = xp - xm, yp - ym
            e_d = -ty_ * ddx + tx_ * ddy
            e_s = tx_ * ddx + ty_ * ddy
            theta_r = thm + km * e_s
            dph = php - theta_r
            cd, sd_ = jnp.cos(dph), jnp.sin(dph)
            e_d_dot = vy * cd + vxs * sd_
            e_phi = sd_
            s_dot = (vxs * cd - vy * sd_) / (1.0 - km * e_d)
            e_phi_dot = omega - km * s_dot

            if kind == "MPC":
                (mpc_tab_ref,) = const_refs

                sel_hi = sel.astype(jnp.bfloat16)
                sel_lo = (sel - sel_hi.astype(jnp.float32)).astype(
                    jnp.bfloat16
                )
                lerped = (
                    jnp.dot(mpc_tab_ref[0], sel_hi,
                            preferred_element_type=jnp.float32)
                    + jnp.dot(mpc_tab_ref[0], sel_lo,
                              preferred_element_type=jnp.float32)
                    + jnp.dot(mpc_tab_ref[1], sel_hi,
                              preferred_element_type=jnp.float32)
                )                                       # (2nu^2+6nu, blk)
                nn = nu * nu
                minv_l = lerped[0:nn].reshape(nu, nu, blk)
                g1e = (
                    lerped[nn : nn + nu] * e_d
                    + lerped[nn + nu : nn + 2 * nu] * e_d_dot
                    + lerped[nn + 2 * nu : nn + 3 * nu] * e_phi
                    + lerped[nn + 3 * nu : nn + 4 * nu] * e_phi_dot
                )                                       # (nu, blk)
                f_vec = 2.0 * (
                    g1e + km * lerped[nn + 4 * nu : nn + 5 * nu]
                )
                hinv2_l = lerped[nn + 5 * nu :].reshape(nu, nu, blk)
                rho_m = 1.0

                # unconstrained fast path (lateral._mpc_steer_table):
                # exact whenever box-interior
                ustar = -jnp.sum(hinv2_l * f_vec[None, :, :], axis=1)
                interior = (
                    jnp.max(jnp.abs(ustar), axis=0, keepdims=True) <= 1.0
                )                                       # (1, blk)

                def admm(_, st):
                    xx, zz, ud = st
                    v = rho_m * (zz - ud) - f_vec
                    xx = jnp.sum(minv_l * v[None, :, :], axis=1)
                    zz = jnp.clip(xx + ud, -1.0, 1.0)
                    ud = ud + xx - zz
                    return xx, zz, ud

                def run_admm(_):
                    # warm-started across ticks (mpc_z/mpc_ud in the tick
                    # carry, zeros at cycle start == rebind)
                    _x, zf, udf = jax.lax.fori_loop(
                        0, cc.mpc_warm_admm_iters, admm,
                        (mpc_z, mpc_z, mpc_ud),
                    )
                    return zf, udf

                # when EVERY lane in the block is box-interior the fast
                # path is selected everywhere and the ADMM result is
                # discarded — skip its serial iterations entirely
                zf, udf = jax.lax.cond(
                    jnp.all(interior),
                    lambda _: (mpc_z, mpc_ud),
                    run_admm,
                    None,
                )
                steer_cmd = jnp.clip(
                    jnp.where(interior, ustar[0:1], zf[0:1]),
                    -cc.steer_limit, cc.steer_limit,
                )
                mpc_z = jnp.where(interior, ustar, zf)
                mpc_ud = jnp.where(interior, 0.0, udf)
            else:
                (ktab_ref,) = const_refs

                def gain(j):
                    return jnp.sum(
                        sel * ktab_ref[:, j : j + 1], axis=0, keepdims=True
                    )
                k0, k1, k2, k3 = gain(0), gain(1), gain(2), gain(3)
                ff = km * (
                    a + b - b * k2
                    - (b / cf + a * k2 / cr - a / cr)
                    * (m_veh * vxs * vxs) / L_wb
                )
                delta = -(
                    k0 * e_d + k1 * e_d_dot + k2 * e_phi + k3 * e_phi_dot
                ) + ff
                steer_cmd = jnp.clip(
                    delta / max_steer, -cc.steer_limit, cc.steer_limit
                )

            # --- PID: the shared shape-generic core (pid.pid_core) ---
            err = tick_kmh - 3.6 * jnp.sqrt(vx * vx + vy * vy)  # (1, BLK)
            cmd, buf, cnt, last = pid_mod.pid_core(buf, cnt, last, err, cc)
            throttle, brake = pid_mod.split_throttle_brake(cmd)

            # --- arrival + stop gating (pre-step pose, test_9.py:441-446) ---
            ddestx = x - destx
            ddesty = y - desty
            arr = jnp.maximum(
                arr,
                (ddestx * ddestx + ddesty * ddesty < arrival_d2).astype(
                    jnp.float32
                ),
            )
            stop = (arr > 0.5) | not_ok
            steer_g = jnp.where(stop, 0.0, steer_cmd)
            thr_g = jnp.where(stop, 0.0, throttle)
            brk_g = jnp.where(stop, 1.0, brake)

            # --- plant: the shared elementwise steppers (sim/plant.py) run
            # directly on (1, blk) rows — one edit site for the physics ---
            ego_row = EgoState(x, y, phi, vx, vy, omega, _ax, _ay, steer_ap)
            ego_n = plant_mod.step(ego_row, steer_g, thr_g, brk_g, vp, lp)
            (x_n, y_n, phi_n, v_n, vy_n, omega_n, ax_n, ay_n,
             steer_ap) = ego_n

            # --- obstacles advance (+ NPC agents in traffic mode) ---
            if traffic is None:
                ox = ox + ovx * dt
                oy = oy + ovy * dt
            else:
                # sim/npc.py term for term (semantic base:
                # closed_loop._traffic_ticks_base / _advance_npcs), every
                # slot unrolled over (1, blk) rows, the global path shared
                # as (n_gp, blk) channels.
                offK = offK + jnp.clip(
                    tgtK - offK, -LANE_RATE * dt, LANE_RATE * dt
                )
                spd_all = jnp.sqrt(ovx * ovx + ovy * ovy)   # (K, blk)
                e_spd = jnp.sqrt(v_n * v_n + vy_n * vy_n)   # (1, blk)

                def advance_npcs(gpx_a, gpy_a, gpth_a, iota_a):
                    """Per-slot NPC advance over a view of the global path.

                    ``iota_a`` carries GLOBAL row ids for the rows in the
                    view, so every index comparison, clamp, and first-min
                    pad below is identical math whether the view is the
                    full path or the 96-row window — the reductions only
                    differ by rows whose contribution is an exact zero
                    (one-hot sums) or +inf (masked mins).
                    """
                    rows = []
                    for kk in range(K):
                        rows.append(_npc_row(kk, gpx_a, gpy_a, gpth_a,
                                             iota_a))
                    return tuple(
                        jnp.concatenate([r[c] for r in rows], axis=0)
                        for c in range(6)
                    )

                def _npc_row(kk, gpx_a, gpy_a, gpth_a, iota_a):
                    # static slots can never be agents (simulate_traffic:
                    # agent_slot = slot >= n_static_obs & fast) — skip the
                    # agent math and advance them at constant velocity
                    if kk < n_cv_slots:
                        return (
                            ox[kk : kk + 1] + ovx[kk : kk + 1] * dt,
                            oy[kk : kk + 1] + ovy[kk : kk + 1] * dt,
                            ovx[kk : kk + 1], ovy[kk : kk + 1],
                            idxK[kk : kk + 1], tgtK[kk : kk + 1],
                        )
                    idx_k = idxK[kk : kk + 1]               # (1, blk) i32
                    off_k = offK[kk : kk + 1]
                    tgt_k = tgtK[kk : kk + 1]
                    xk, yk = ox[kk : kk + 1], oy[kk : kk + 1]
                    vxk, vyk = ovx[kk : kk + 1], ovy[kk : kk + 1]
                    is_ag = (ovalid[kk : kk + 1] > 0.5) & (
                        agentK[kk : kk + 1] > 0.5
                    )

                    def cv_row(xk=xk, yk=yk, vxk=vxk, vyk=vyk,
                               idx_k=idx_k, tgt_k=tgt_k):
                        return (xk + vxk * dt, yk + vyk * dt, vxk, vyk,
                                idx_k, tgt_k)

                    def agent_row(kk=kk, idx_k=idx_k, off_k=off_k,
                                  tgt_k=tgt_k, xk=xk, yk=yk, vxk=vxk,
                                  vyk=vyk, is_ag=is_ag):
                        spd_k = spd_all[kk : kk + 1]
                        phi_k = jnp.where(
                            spd_k > 0.1, _atan2(vyk, vxk), 0.0
                        )
                        ck, sk = jnp.cos(phi_k), jnp.sin(phi_k)

                        # lateral offset from the path at the carried index
                        oh_i = (iota_a == idx_k).astype(jnp.float32)
                        th_i = jnp.sum(gpth_a * oh_i, axis=0, keepdims=True)
                        px_i = jnp.sum(gpx_a * oh_i, axis=0, keepdims=True)
                        py_i = jnp.sum(gpy_a * oh_i, axis=0, keepdims=True)
                        l_now = -(xk - px_i) * jnp.sin(th_i) + (
                            yk - py_i
                        ) * jnp.cos(th_i)

                        # frame of this NPC: others' longitudinal/lateral
                        # offsets (a lateral corridor shift only moves d_lat)
                        dxk, dyk = ox - xk, oy - yk             # (K, blk)
                        dl_o = dxk * ck + dyk * sk
                        dt_o = -dxk * sk + dyk * ck
                        val_o = (ovalid > 0.5) & (iota_K != kk)
                        dxe, dye = x_n - xk, y_n - yk           # (1, blk)
                        dl_e = dxe * ck + dye * sk
                        dt_e = -dxe * sk + dye * ck

                        def lead(shift, _dl_o=dl_o, _dt_o=dt_o, _val=val_o,
                                 _dl_e=dl_e, _dt_e=dt_e, _sa=spd_all,
                                 _es=e_spd):
                            ahead_o = _val & (_dl_o > 0.5) & (
                                jnp.abs(_dt_o - shift) < 2.0
                            )
                            ahead_e = (_dl_e > 0.5) & (
                                jnp.abs(_dt_e - shift) < 2.0
                            )
                            gap_o = jnp.min(
                                jnp.where(ahead_o, _dl_o, jnp.inf),
                                axis=0, keepdims=True,
                            )
                            gap = jnp.minimum(
                                gap_o, jnp.where(ahead_e, _dl_e, jnp.inf)
                            )
                            # first-min row (obstacle slots win exact ties
                            # against the ego, matching npc.lead_info's argmin
                            # over [obs slots..., ego])
                            hit_o = ahead_o & (_dl_o <= gap)
                            first = jnp.min(
                                jnp.where(hit_o, iota_K, K),
                                axis=0, keepdims=True,
                            )
                            oh_r = (iota_K == first).astype(jnp.float32)
                            v_o = jnp.sum(_sa * oh_r, axis=0, keepdims=True)
                            v_lead = jnp.where(first >= K, _es, v_o)
                            none = gap > 1e30  # == +inf: nothing ahead
                            return (
                                jnp.where(none, 1e4, gap),
                                jnp.where(none, 100.0, v_lead),
                            )

                        def corridor_free(shift, _dl_o=dl_o, _dt_o=dt_o,
                                          _val=val_o, _dl_e=dl_e, _dt_e=dt_e):
                            occ_o = _val & (_dl_o > -8.0) & (_dl_o < 20.0) & (
                                jnp.abs(_dt_o - shift) < 1.8
                            )
                            occ_e = (_dl_e > -8.0) & (_dl_e < 20.0) & (
                                jnp.abs(_dt_e - shift) < 1.8
                            )
                            any_o = jnp.max(
                                occ_o.astype(jnp.float32), axis=0, keepdims=True
                            ) > 0.5
                            return ~(any_o | occ_e)

                        gap_own, v_own = lead(-l_now)
                        gap_tgt, v_tgt = lead(tgt_k - l_now)
                        if lights is not None:
                            # a red stop line is a stationary lead for the IDM
                            # (_advance_npcs' lights branch)
                            t_abs_n = t0_v + (i + 1).astype(jnp.float32) * dt
                            d_light = red_stop_dist(xk, yk, ck, sk, t_abs_n)
                            v_tgt = jnp.where(d_light < gap_tgt, 0.0, v_tgt)
                            gap_tgt = jnp.minimum(gap_tgt, d_light)
                        left_free = corridor_free(LANE_W - l_now)
                        right_free = corridor_free(-LANE_W - l_now)
                        own_free = corridor_free(-l_now)

                        # lane_change_decision
                        press = P_MIND + spd_k * P_SAFET
                        blocked = (gap_own < 1.5 * press) & (
                            v_own < 0.8 * P_MAXSPD
                        )
                        in_lane = jnp.abs(tgt_k) < 0.1
                        go_left = blocked & in_lane & left_free
                        go_right = blocked & in_lane & ~left_free & right_free
                        tgt_new = jnp.where(
                            go_left, LANE_W,
                            jnp.where(go_right, -LANE_W, tgt_k),
                        )
                        # merge back only once the pressure released too
                        # (npc.lane_change_decision's anti-flap hysteresis)
                        tgt_new = jnp.where(
                            ~in_lane & own_free & ~blocked, 0.0, tgt_new
                        )

                        # npc_step: forward-windowed first-min match
                        lo = jnp.clip(idx_k, 0, max(n_gp - 32, 0))
                        in_win = (iota_a >= lo) & (iota_a < lo + 32)
                        d2g = (gpx_a - xk) ** 2 + (gpy_a - yk) ** 2
                        d2m = jnp.where(in_win, d2g, jnp.inf)
                        mng = jnp.min(d2m, axis=0, keepdims=True)
                        idx2 = jnp.min(
                            jnp.where(d2m <= mng, iota_a, n_gp),
                            axis=0, keepdims=True,
                        )
                        look = jnp.clip(
                            idx2 + 2 + (spd_k * 0.25).astype(jnp.int32),
                            0, n_gp - 1,
                        )
                        oh_l = (iota_a == look).astype(jnp.float32)
                        th_l = jnp.sum(gpth_a * oh_l, axis=0, keepdims=True)
                        lx = jnp.sum(gpx_a * oh_l, axis=0, keepdims=True)
                        ly = jnp.sum(gpy_a * oh_l, axis=0, keepdims=True)
                        dxp = lx - off_k * jnp.sin(th_l) - xk
                        dyp = ly + off_k * jnp.cos(th_l) - yk
                        alpha = _atan2(dyp, dxp) - phi_k
                        alpha = _atan2(jnp.sin(alpha), jnp.cos(alpha))
                        ld = jnp.maximum(jnp.sqrt(dxp * dxp + dyp * dyp), 1.0)
                        delta = _atan2(2.0 * L_wb * jnp.sin(alpha), ld)
                        steer_n = jnp.clip(delta / max_steer, -1.0, 1.0)
                        s_star = P_MIND + jnp.maximum(
                            spd_k * P_SAFET
                            + spd_k * (spd_k - v_tgt) / (2.0 * P_SQRT_AB),
                            0.0,
                        )
                        gap_c = jnp.maximum(gap_tgt, 0.5)
                        accn = P_ACC * (
                            1.0 - (spd_k / P_MAXSPD_C) ** 4
                            - (s_star / gap_c) ** 2
                        )
                        accn = jnp.clip(accn, -P_DEC, P_ACC)
                        v2 = jnp.maximum(spd_k + accn * dt, 0.0)
                        om2 = v2 * jnp.tan(steer_n * max_steer) / L_wb
                        phi2 = phi_k + om2 * dt
                        x2 = xk + v2 * jnp.cos(phi2) * dt
                        y2 = yk + v2 * jnp.sin(phi2) * dt

                        return (
                            jnp.where(is_ag, x2, xk + vxk * dt),
                            jnp.where(is_ag, y2, yk + vyk * dt),
                            jnp.where(is_ag, v2 * jnp.cos(phi2), vxk),
                            jnp.where(is_ag, v2 * jnp.sin(phi2), vyk),
                            jnp.where(is_ag, idx2, idx_k),
                            jnp.where(is_ag, tgt_new, tgt_k),
                        )

                    # a block whose lanes carry NO live agent in this slot
                    # skips the slot's ~15 path-width-pass agent math
                    # entirely (the bench mix populates ONE of the dynamic
                    # slots; per-lane selects inside agent_row keep mixed
                    # blocks bit-identical)
                    return jax.lax.cond(jnp.any(is_ag), agent_row, cv_row)

                if use_window:
                    # per-tick containment gate: every live agent's carried
                    # index, its 32-row match window, and its worst-case
                    # lookahead row must sit inside [w08, w08 + W_ROWS).
                    # When they do, the windowed view is bit-identical to
                    # the full path (advance_npcs docstring); otherwise
                    # fall back. Gate cost: a few (K, blk) compares + one
                    # reduce per tick, ~1% of the passes it saves.
                    ag_live = (ovalid > 0.5) & (agentK > 0.5)
                    lo_g = jnp.clip(idxK, 0, max(n_gp - 32, 0))
                    look_hi = lo_g + 33 + (spd_all * 0.25).astype(jnp.int32)
                    ok_lane = (
                        (idxK >= w08) & (idxK < w08 + W_ROWS)
                        & (lo_g >= w08) & (look_hi < w08 + W_ROWS)
                    )
                    fast_ok = jnp.min(jnp.where(
                        ag_live, ok_lane.astype(jnp.float32), 1.0
                    )) > 0.5
                    (ox, oy, ovx, ovy, idxK, tgtK) = jax.lax.cond(
                        fast_ok,
                        lambda: advance_npcs(gp_xw, gp_yw, gp_thw,
                                             iota_win),
                        lambda: advance_npcs(gp_x, gp_y, gp_th, iota_gp),
                    )
                else:
                    (ox, oy, ovx, ovy, idxK, tgtK) = advance_npcs(
                        gp_x, gp_y, gp_th, iota_gp
                    )
            dob_x = ox - x_n
            dob_y = oy - y_n
            hit = (ovalid > 0.5) & (
                dob_x * dob_x + dob_y * dob_y
                < COLLISION_RADIUS * COLLISION_RADIUS
            )
            collided = jnp.max(
                hit.astype(jnp.float32), axis=0, keepdims=True
            )

            # --- lateral-error metric at the NEW pose ---
            xm2, ym2, tm2, km2 = lat_match(x_n, y_n)
            ex, ey = x_n - xm2, y_n - ym2
            ds2 = ex * jnp.cos(tm2) + ey * jnp.sin(tm2)
            tr2 = tm2 + km2 * ds2
            lat_err = -ex * jnp.sin(tr2) + ey * jnp.cos(tr2)

            row = pl.dslice(i, 1)
            mx_out[row, :] = x_n
            my_out[row, :] = y_n
            mv_out[row, :] = 3.6 * jnp.sqrt(v_n * v_n + vy_n * vy_n)
            ml_out[row, :] = lat_err
            mh_out[row, :] = phi_n
            mc_out[row, :] = collided
            ma_out[row, :] = arr
            mf_out[row, :] = feas_v * ok_v

            out_state = (x_n, y_n, phi_n, v_n, vy_n, omega_n, ax_n, ay_n,
                         steer_ap, buf, cnt, last, ox, oy, ovx, ovy, ovalid,
                         arr)
            if kind == "MPC":
                out_state = out_state + (mpc_z, mpc_ud)
            if traffic is not None:
                out_state = out_state + (idxK, offK, tgtK)
            return out_state

        init = tuple(ego_ref[i : i + 1] for i in range(9)) + (
            pbuf_ref[:], pmisc_ref[0:1], pmisc_ref[1:2],
            obsr_ref[0], obsr_ref[1], obsr_ref[2], obsr_ref[3], obsr_ref[4],
            flag_ref[2:3],
        )
        if kind == "MPC":
            z0 = jnp.zeros((nu, blk), jnp.float32)
            init = init + (z0, z0)
        if traffic is not None:
            init = init + (
                npcr_ref[0].astype(jnp.int32), npcr_ref[1], npcr_ref[2]
            )
        out = jax.lax.fori_loop(0, n_ticks, body, init)
        (x, y, phi, vx, vy, omega, ax_, ay_, st_ap,
         buf, cnt, last, ox, oy, ovx, ovy, ovalid, arr) = out[:18]
        ego_out[:] = jnp.concatenate(
            [x, y, phi, vx, vy, omega, ax_, ay_, st_ap]
        )
        pbuf_out[:] = buf
        pmisc_out[:] = jnp.concatenate([cnt, last])
        obs_out[:] = jnp.stack([ox, oy, ovx, ovy, ovalid])
        arr_out[:] = arr
        if traffic is not None:
            idxK_f, offK_f, tgtK_f = out[-3], out[-2], out[-1]
            npc_out[:] = jnp.stack(
                [idxK_f.astype(jnp.float32), offK_f, tgtK_f]
            )

    ego_in = jnp.stack(
        [ego.x, ego.y, ego.phi, ego.vx, ego.vy, ego.omega, ego.ax, ego.ay,
         ego.steer]
    ).astype(jnp.float32)                                  # (9, B)
    pmisc_in = jnp.stack(
        [pid_count.astype(jnp.float32), pid_last.astype(jnp.float32)]
    )                                                      # (2, B)
    obs_in = jnp.stack(
        [obs.x, obs.y, obs.vx, obs.vy, obs.valid.astype(jnp.float32)],
        axis=0,
    ).transpose(0, 2, 1).astype(jnp.float32)               # (5, K, B)
    tgt_in = jnp.stack(
        [target.x, target.y, target.theta, target.kappa], axis=0
    ).transpose(0, 2, 1).astype(jnp.float32)               # (4, n_path, B)
    flag_rows = [feas.astype(jnp.float32), plan_ok.astype(jnp.float32),
                 arrived0.astype(jnp.float32)]
    if lights is not None:
        flag_rows.append(t0_cycle.astype(jnp.float32))
    flag_in = jnp.stack(flag_rows)                         # (3|4, B)
    dest_in = jnp.stack([dest_x, dest_y]).astype(jnp.float32)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape + (blk,), (lambda b, _n=nd: (0,) * _n + (b,)),
            memory_space=pltpu.VMEM,
        )

    out_tick = pl.BlockSpec(
        (n_ticks, blk), lambda b: (0, b), memory_space=pltpu.VMEM
    )
    # edge-pad the speed profile so the kernel's 8-aligned 16-row hat
    # window (k8 <= 8*floor((n_dense-2)/8), k8+16 rows read) stays in
    # range; padded rows carry exact-zero hat weights
    nd_pad = ((n_dense - 2) // 8) * 8 + 16
    spd_in = jnp.pad(
        traj_speed.T.astype(jnp.float32),
        ((0, nd_pad - n_dense), (0, 0)), mode="edge",
    )
    in_arrays = [
        ego_in, pid_buffer.T.astype(jnp.float32), pmisc_in, obs_in,
        spd_in, tgt_in, flag_in, dest_in,
    ]
    n_flag = 4 if lights is not None else 3
    in_specs = [
        bspec((9,)), bspec((n_buf,)), bspec((2,)), bspec((5, K)),
        bspec((nd_pad,)), bspec((4, n_path)), bspec((n_flag,)), bspec((2,)),
    ]
    out_specs = [bspec((9,)), bspec((n_buf,)), bspec((2,)), bspec((5, K))]
    out_shapes = [
        jax.ShapeDtypeStruct((9, B), jnp.float32),
        jax.ShapeDtypeStruct((n_buf, B), jnp.float32),
        jax.ShapeDtypeStruct((2, B), jnp.float32),
        jax.ShapeDtypeStruct((5, K, B), jnp.float32),
    ]
    if traffic is not None:
        gp_in = jnp.stack(
            [gp.x, gp.y, gp.theta], axis=0
        ).transpose(0, 2, 1).astype(jnp.float32)           # (3, n_gp, B)
        npc_in = jnp.stack(
            [npc_idx0.astype(jnp.float32), lane_off0, lane_tgt0,
             agent_slot.astype(jnp.float32)], axis=0
        ).transpose(0, 2, 1).astype(jnp.float32)           # (4, K, B)
        in_arrays += [gp_in, npc_in]
        in_specs += [bspec((3, n_gp)), bspec((4, K))]
        out_specs.append(bspec((3, K)))
        out_shapes.append(jax.ShapeDtypeStruct((3, K, B), jnp.float32))
    if lights is not None:
        tl_in = jnp.stack(
            [tl.x, tl.y, tl.period, tl.offset, tl.green_frac,
             tl.valid.astype(jnp.float32)], axis=0
        ).transpose(0, 2, 1).astype(jnp.float32)           # (6, L, B)
        in_arrays.append(tl_in)
        in_specs.append(bspec((6, L_n)))
    out_specs.append(bspec((1,)))
    out_shapes.append(jax.ShapeDtypeStruct((1, B), jnp.float32))
    out_specs += [out_tick] * 8
    out_shapes += [
        jax.ShapeDtypeStruct((n_ticks, B), jnp.float32) for _ in range(8)
    ]

    interp = bool(getattr(run_ticks_batched, "_interpret", False))
    outs = pl.pallas_call(
        kernel,
        grid=(B // blk,),
        in_specs=in_specs + [
            pl.BlockSpec(
                c.shape, (lambda b, _n=c.ndim: (0,) * _n),
                memory_space=pltpu.VMEM,
            )
            for c in consts_np
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interp,
    )(*in_arrays, *[jnp.asarray(np_c) for np_c in consts_np])

    if traffic is not None:
        (ego_o, pbuf_o, pmisc_o, obs_o, npc_o, arr_o,
         mx, my, mv, ml, mh, mc, ma, mf) = outs
    else:
        (ego_o, pbuf_o, pmisc_o, obs_o, arr_o,
         mx, my, mv, ml, mh, mc, ma, mf) = outs

    ego_new = EgoState(*[ego_o[i] for i in range(9)])
    obs_new = Obstacles(
        obs_o[0].T, obs_o[1].T, obs_o[2].T, obs_o[3].T, obs_o[4].T > 0.5
    )
    metrics = dict(
        x=mx.T, y=my.T, speed_kmh=mv.T, lateral_err=ml.T, heading=mh.T,
        collided=mc.T > 0.5, arrived=ma.T > 0.5, feasible=mf.T > 0.5,
    )
    if traffic is not None:
        return (
            ego_new, pbuf_o.T, pmisc_o[0].astype(jnp.int32), pmisc_o[1],
            obs_new, npc_o[0].T.astype(jnp.int32), npc_o[1].T, npc_o[2].T,
            arr_o[0] > 0.5, metrics,
        )
    return (
        ego_new, pbuf_o.T, pmisc_o[0].astype(jnp.int32), pmisc_o[1],
        obs_new, arr_o[0] > 0.5, metrics,
    )
