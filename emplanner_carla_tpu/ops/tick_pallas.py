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
condensed-MPC box ADMM) and both plants (kinematic / friction-limited
dynamic bicycle) are implemented; see ``_tick_kernel_eligible`` for
which combinations production dispatch routes here.
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
):
    """Run ``cfg.loop.plan_every`` ticks for the whole batch in one kernel.

    Returns (ego', pid_buffer', pid_count', pid_last', obs', arrived',
    metrics) with metrics = dict of (B, n_ticks) arrays matching
    ``TickMetrics`` channel semantics.
    """
    from emplanner_carla_tpu.control import lateral
    from emplanner_carla_tpu.control import pid as pid_mod
    from emplanner_carla_tpu.sim import plant as plant_mod
    from emplanner_carla_tpu.types import EgoState, Obstacles

    B = ego.x.shape[0]
    assert B % BLK == 0
    # grid blocks execute sequentially on the TensorCore; pick the largest
    # lane block dividing B (the MPC branch runs a 40-iteration per-tick
    # ADMM whose serial latency scales with the block count — 32 blocks of
    # 128 measured SLOWER than the XLA scan). 1024 lanes exceeds the 16 MB
    # scoped-VMEM limit (by 444 KB, via the streaming metric buffers);
    # 512 fits.
    blk = next(c for c in (512, 256, 128) if B % c == 0)
    K = obs.x.shape[1]
    n_path = target.x.shape[1]
    n_dense = traj_speed.shape[1]
    n_buf = pid_buffer.shape[1]
    n_ticks = cfg.loop.plan_every

    cc, vp, lp = cfg.control, cfg.vehicle, cfg.plant
    kind = cc.kind
    plant_kind = lp.kind
    if kind == "MPC":
        vx_grid_np, Minv_np, G1_np, g2_np, Hinv2_np = lateral.mpc_tables(
            cfg.vehicle, cc
        )
        nu = g2_np.shape[1]
        # transposed for the per-lane table lerp as one MXU contraction:
        # value(lane) = table.T @ sel(lane)
        consts_np = [
            Minv_np.reshape(Minv_np.shape[0], nu * nu).T,  # (nu*nu, n_tab)
        ] + [
            G1_np[:, :, k].T for k in range(4)             # 4 x (nu, n_tab)
        ] + [
            g2_np.T,                                       # (nu, n_tab)
            Hinv2_np.reshape(Hinv2_np.shape[0], nu * nu).T,
        ]
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

    n_consts = len(consts_np)

    def kernel(*refs):
        (ego_ref, pbuf_ref, pmisc_ref, obsr_ref, spd_ref, tgt_ref,
         flag_ref, dest_ref) = refs[:8]
        const_refs = refs[8 : 8 + n_consts]
        (ego_out, pbuf_out, pmisc_out, obs_out, arr_out,
         mx_out, my_out, mv_out, ml_out, mh_out, mc_out, ma_out,
         mf_out) = refs[8 + n_consts :]
        iota_path = jax.lax.broadcasted_iota(jnp.int32, (n_path, blk), 0)
        iota_tab = jax.lax.broadcasted_iota(jnp.int32, (n_tab, blk), 0)
        iota_nd = jax.lax.broadcasted_iota(
            jnp.int32, (n_dense, 1), 0
        ).astype(jnp.float32)

        tgt_x, tgt_y = tgt_ref[0], tgt_ref[1]          # (n_path, blk)
        tgt_th, tgt_k = tgt_ref[2], tgt_ref[3]
        feas_v = flag_ref[0:1]                         # (1, BLK)
        ok_v = flag_ref[1:2]
        not_ok = ok_v < 0.5
        destx = dest_ref[0:1]
        desty = dest_ref[1:2]
        speed_prof = spd_ref[:]                         # (n_dense, BLK)

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
            # MPC only: per-tick-carried box-ADMM warm state (nu, blk)
            mpc_z, mpc_ud = st[18:] if kind == "MPC" else (None, None)
            # all per-scenario values (1, BLK); obstacle arrays (K, BLK)

            # --- planned speed at t_rel (uniform hat, scalar time) ---
            t_rel = (i + 1).astype(jnp.float32) * dt
            u = jnp.clip(t_rel / t_dx, 0.0, n_dense - 1.0)
            w_nd = jnp.maximum(0.0, 1.0 - jnp.abs(u - iota_nd))  # (nd, 1)
            plan_speed = jnp.sum(speed_prof * w_nd, axis=0, keepdims=True)
            plan_speed = jnp.where(not_ok, 0.0, plan_speed)

            # --- ACC time-headway guard (closed_loop.simulate_full) ---
            cphi, sphi = jnp.cos(phi), jnp.sin(phi)
            vxw = vx * cphi - vy * sphi
            vyw = vy * cphi + vx * sphi
            spd = jnp.maximum(jnp.sqrt(vxw * vxw + vyw * vyw), 1e-3)
            ux, uy = vxw / spd, vyw / spd
            dxo = ox - x
            dyo = oy - y
            d_long = dxo * ux + dyo * uy                # (K, BLK)
            d_lat = -dxo * uy + dyo * ux
            lead = (ovalid > 0.5) & (d_long > 0.0) & (jnp.abs(d_lat) < 2.0)
            d_lead = jnp.min(
                jnp.where(lead, d_long, jnp.inf), axis=0, keepdims=True
            )
            v_cap = jnp.maximum((d_lead - ACC_STANDOFF) / ACC_HEADWAY, 0.0)
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
                hp = jax.lax.Precision.HIGHEST
                (minv_ref, g10_ref, g11_ref, g12_ref, g13_ref,
                 g2t_ref, hinv2_ref) = const_refs

                def lerp(ref):
                    return jnp.dot(
                        ref[:], sel, precision=hp,
                        preferred_element_type=jnp.float32,
                    )

                minv_l = lerp(minv_ref).reshape(nu, nu, blk)
                hinv2_l = lerp(hinv2_ref).reshape(nu, nu, blk)
                g1e = (
                    lerp(g10_ref) * e_d + lerp(g11_ref) * e_d_dot
                    + lerp(g12_ref) * e_phi + lerp(g13_ref) * e_phi_dot
                )                                       # (nu, blk)
                f_vec = 2.0 * (g1e + km * lerp(g2t_ref))
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

                # warm-started across ticks (mpc_z/mpc_ud in the tick
                # carry, zeros at cycle start == ControllerState.rebind)
                _, zf, udf = jax.lax.fori_loop(
                    0, cc.mpc_warm_admm_iters, admm, (mpc_z, mpc_z, mpc_ud)
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

            # --- obstacles advance + collision ---
            ox = ox + ovx * dt
            oy = oy + ovy * dt
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
            return out_state

        init = tuple(ego_ref[i : i + 1] for i in range(9)) + (
            pbuf_ref[:], pmisc_ref[0:1], pmisc_ref[1:2],
            obsr_ref[0], obsr_ref[1], obsr_ref[2], obsr_ref[3], obsr_ref[4],
            flag_ref[2:3],
        )
        if kind == "MPC":
            z0 = jnp.zeros((nu, blk), jnp.float32)
            init = init + (z0, z0)
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
    flag_in = jnp.stack(
        [feas.astype(jnp.float32), plan_ok.astype(jnp.float32),
         arrived0.astype(jnp.float32)]
    )                                                      # (3, B)
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
    interp = bool(getattr(run_ticks_batched, "_interpret", False))
    outs = pl.pallas_call(
        kernel,
        grid=(B // blk,),
        in_specs=[
            bspec((9,)), bspec((n_buf,)), bspec((2,)), bspec((5, K)),
            bspec((n_dense,)), bspec((4, n_path)), bspec((3,)), bspec((2,)),
        ] + [
            pl.BlockSpec(
                c.shape, (lambda b, _n=c.ndim: (0,) * _n),
                memory_space=pltpu.VMEM,
            )
            for c in consts_np
        ],
        out_specs=(
            bspec((9,)), bspec((n_buf,)), bspec((2,)), bspec((5, K)),
            bspec((1,)),
            out_tick, out_tick, out_tick, out_tick, out_tick, out_tick,
            out_tick, out_tick,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((9, B), jnp.float32),
            jax.ShapeDtypeStruct((n_buf, B), jnp.float32),
            jax.ShapeDtypeStruct((2, B), jnp.float32),
            jax.ShapeDtypeStruct((5, K, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ) + tuple(
            jax.ShapeDtypeStruct((n_ticks, B), jnp.float32) for _ in range(8)
        ),
        interpret=interp,
    )(
        ego_in, pid_buffer.T.astype(jnp.float32), pmisc_in, obs_in,
        traj_speed.T.astype(jnp.float32), tgt_in, flag_in, dest_in,
        *[jnp.asarray(np_c) for np_c in consts_np],
    )

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
    return (
        ego_new, pbuf_o.T, pmisc_o[0].astype(jnp.int32), pmisc_o[1],
        obs_new, arr_o[0] > 0.5, metrics,
    )
