"""NumPy float64 closed-loop oracle: the "CPU reference trajectory".

BASELINE.md's fidelity criterion is <= 5 cm lateral RMSE against CPU
reference trajectories, where (per SURVEY.md §7.3) the reference trajectory
is "the NumPy port running the same plant" — CARLA's UE4 physics is not
reproducible, so the bicycle plant defines ground truth.

This module is that port: the complete per-cycle pipeline (reference-line
smoothing -> S-L DP -> corridor -> path QP -> Cartesian conversion) and the
per-tick loop (LQR via scipy DARE + PID + kinematic bicycle with the same
steering actuator), all in float64 with loop-based / scipy implementations
that share no code with the JAX path. tests/test_fidelity.py runs both on
identical scenarios and compares ego trajectories.
"""

from __future__ import annotations

import math

import numpy as np

from emplanner_carla_tpu.oracle import frenet_np, path_np


# ---------------------------------------------------------------- reference line
def smooth_refline(xs, ys, w_s=0.4, w_len=0.3, w_ref=0.3, bound=0.2,
                   iters=60, rho=1.0):
    """Per-coordinate box-QP smoothing via the same ADMM splitting, f64."""
    n = len(xs)
    D2 = np.zeros((n - 2, n))
    for i in range(n - 2):
        D2[i, i : i + 3] = (1, -2, 1)
    D1 = np.zeros((n - 1, n))
    for i in range(n - 1):
        D1[i, i : i + 2] = (1, -1)
    H = 2 * (w_s * D2.T @ D2 + w_len * D1.T @ D1 + w_ref * np.eye(n))
    Minv = np.linalg.inv(H + rho * np.eye(n))

    def solve(ref):
        c = ref.mean()
        r = ref - c
        f = -2 * w_ref * r
        lb, ub = r - bound, r + bound
        x = r.copy()
        z = r.copy()
        u = np.zeros(n)
        for _ in range(iters):
            x = Minv @ (rho * (z - u) - f)
            z = np.clip(x + u, lb, ub)
            u += x - z
        return z + c

    return solve(np.asarray(xs, float)), solve(np.asarray(ys, float))


# ---------------------------------------------------------------- controller
def lqr_gain(vx, vp, q_diag=(200.0, 1.0, 50.0, 1.0), r=1.0, ts=0.1):
    from scipy.linalg import solve_discrete_are

    a, b, cf, cr, m, iz = vp.a, vp.b, vp.cf, vp.cr, vp.mass, vp.iz
    A = np.zeros((4, 4))
    A[0, 1] = 1
    A[1, 1] = (cf + cr) / (m * vx)
    A[1, 2] = -(cf + cr) / m
    A[1, 3] = (a * cf - b * cr) / (m * vx)
    A[2, 3] = 1
    A[3, 1] = (a * cf - b * cr) / (iz * vx)
    A[3, 2] = -(a * cf - b * cr) / iz
    A[3, 3] = (a * a * cf + b * b * cr) / (iz * vx)
    B = np.zeros((4, 1))
    B[1, 0] = -cf / m
    B[3, 0] = -a * cf / iz
    T = np.linalg.inv(np.eye(4) - 0.5 * ts * A)
    Ad = T @ (np.eye(4) + 0.5 * ts * A)
    Bd = T @ B * ts
    Q = np.diag(q_diag)
    R = np.array([[r]])
    P = solve_discrete_are(Ad, Bd, Q, R)
    return (np.linalg.inv(Bd.T @ P @ Bd + R) @ (Bd.T @ P @ Ad))[0]


def lqr_steer(state, path_xyTK, vp, cfg):
    """state = (x, y, phi, vx, vy, omega). Returns normalized steer."""
    x, y, phi, vx, vy, omega = state
    vx_s = max(vx, cfg.min_vx)
    ts = cfg.ts_predict
    xp = x + (vx_s * math.cos(phi) - vy * math.sin(phi)) * ts
    yp = y + (vy * math.cos(phi) + vx_s * math.sin(phi)) * ts
    phip = phi + omega * ts
    xs, ys, ths, ks = path_xyTK
    d2 = (xs - xp) ** 2 + (ys - yp) ** 2
    i = int(np.argmin(d2))
    tx, ty = math.cos(ths[i]), math.sin(ths[i])
    nx, ny = -ty, tx
    dx, dy = xp - xs[i], yp - ys[i]
    e_d = nx * dx + ny * dy
    e_s = tx * dx + ty * dy
    kappa = ks[i]
    theta_r = ths[i] + kappa * e_s
    e_d_dot = vy * math.cos(phip - theta_r) + vx_s * math.sin(phip - theta_r)
    e_phi = math.sin(phip - theta_r)
    s_dot = (vx_s * math.cos(phip - theta_r) - vy * math.sin(phip - theta_r)) / (
        1 - kappa * e_d
    )
    e_phi_dot = omega - kappa * s_dot
    K = lqr_gain(vx_s, vp, cfg.lqr_q, cfg.lqr_r, cfg.ts_discretize)
    e = np.array([e_d, e_d_dot, e_phi, e_phi_dot])
    a, b, cf, cr, m = vp.a, vp.b, vp.cf, vp.cr, vp.mass
    k3 = K[2]
    ff = kappa * (
        a + b - b * k3 - (b / cf + a * k3 / cr - a / cr) * (m * vx_s**2) / (a + b)
    )
    delta = -float(K @ e) + ff
    return float(np.clip(delta / vp.max_steer_rad, -1.0, 1.0))


class PID:
    def __init__(self, cfg):
        self.cfg = cfg
        self.buf = []
        self.last = 0.0

    def step(self, speed_mps, target_kmh):
        cfg = self.cfg
        err = target_kmh - 3.6 * speed_mps
        self.buf.append(err)
        if len(self.buf) > cfg.pid_buffer:
            self.buf.pop(0)
        if len(self.buf) >= 2:
            integral = sum(self.buf) * cfg.pid_dt
            deriv = (err - self.last) / cfg.pid_dt
        else:
            integral = deriv = 0.0
        if abs(err) > cfg.integral_sep_threshold:
            integral = 0.0
            self.buf = []
        self.last = err
        return cfg.kp * err + cfg.ki * integral + cfg.kd * deriv


# ---------------------------------------------------------------- plant
def plant_step(state, applied_steer, steer_cmd, accel, vp, dt):
    x, y, phi, vx, vy, omega = state
    desired = (steer_cmd - applied_steer) * dt / max(vp.steer_tau, dt)
    change = np.clip(desired, -vp.steer_rate * dt, vp.steer_rate * dt)
    applied = float(np.clip(applied_steer + change, -1, 1))
    delta = applied * vp.max_steer_rad
    L = vp.a + vp.b
    v = max(vx + accel * dt, 0.0)
    om = v * math.tan(delta) / L
    phi2 = phi + om * dt
    return (
        x + v * math.cos(phi2) * dt,
        y + v * math.sin(phi2) * dt,
        phi2,
        v,
        0.0,
        om,
    ), applied


# ---------------------------------------------------------------- planner cycle
def plan_cycle(global_xyTK, ego, obstacles, cfg, accel=0.0):
    """One EM path-plan cycle, float64. obstacles: list of (x, y) statics.

    Mirrors em_planner.plan_path_cycle's stages with oracle components
    (including the world-frame acceleration fed into the plan-start Frenet
    state — it pins the QP's ddl0). Returns (xs, ys, thetas, kappas).
    """
    gx, gy, gth, gk = global_xyTK
    x, y, phi, vx, vy, omega = ego
    pp = cfg.path
    rl = cfg.refline

    vxw = vx * math.cos(phi) - vy * math.sin(phi)
    vyw = vy * math.cos(phi) + vx * math.sin(phi)
    px = x + vxw * cfg.loop.pred_ts
    py = y + vyw * cfg.loop.pred_ts

    mi = frenet_np.nearest_index(px, py, gx, gy)
    start = min(max(mi - rl.back_length, 0), len(gx) - rl.n_points)
    wx = gx[start : start + rl.n_points]
    wy = gy[start : start + rl.n_points]
    sx, sy = smooth_refline(wx, wy, rl.w_smooth, rl.w_length, rl.w_ref,
                            rl.xy_bound, rl.admm_iters, rl.admm_rho)
    sth, sk = frenet_np.heading_kappa(sx, sy)
    s_map = frenet_np.s_map_from_origin(sx, sy, sth, sk, x, y)

    obs_sl = frenet_np.cartesian_to_sl(
        np.asarray(obstacles), sx, sy, sth, sk, s_map
    ) if len(obstacles) else (np.zeros(0), np.zeros(0))
    # static gate (nearest within 30 m) + lateral band
    keep_s, keep_l = [], []
    if len(obstacles):
        d = [math.hypot(ox - x, oy - y) for ox, oy in obstacles]
        if min(d) <= 30.0:
            for (os_, ol_) in zip(*obs_sl):
                if abs(ol_) < cfg.loop.lateral_gate:
                    keep_s.append(os_)
                    keep_l.append(ol_)

    axw = accel * math.cos(phi)
    ayw = accel * math.sin(phi)
    st = frenet_np.frenet_state(px, py, vxw, vyw, axw, ayw, sx, sy, sth, sk, s_map)
    s0, l0 = st[0], st[1]
    dl0, ddl0 = st[6], st[7]

    dp_s, dp_l, _ = path_np.path_dp(
        keep_s, keep_l, s0, l0, dl0, ddl0,
        rows=pp.rows, cols=pp.cols, sample_s=pp.sample_s, sample_l=pp.sample_l,
    )
    # enrich on quintics (start segment with true derivatives)
    es, el = [], []
    seg_start = (s0, l0, dl0, ddl0)
    per = int(np.ceil(pp.sample_s / pp.sampling_res))
    for j in range(pp.cols):
        s_a = s0 if j == 0 else dp_s[j - 1]
        l_a = l0 if j == 0 else dp_l[j - 1]
        dl_a = dl0 if j == 0 else 0.0
        ddl_a = ddl0 if j == 0 else 0.0
        cq = frenet_np.quintic_coeffs_abs(
            l_a, dl_a, ddl_a, dp_l[j], 0, 0, s_a, s_a + pp.sample_s
        )
        for k in range(per):
            s_v = s_a + k * pp.sampling_res
            es.append(s_v)
            el.append(frenet_np.quintic_eval_abs(cq, s_v)[0])
    es.append(dp_s[-1])
    el.append(dp_l[-1])
    es = np.asarray(es)[:: pp.qp_downsample]
    el = np.asarray(el)[:: pp.qp_downsample]

    lmin, lmax = path_np.corridor(
        es, el, keep_s, keep_l, pp.obs_length, pp.obs_width,
        pp.corridor_halfwidth, pp.corridor_index_offset,
    )
    ds = pp.sampling_res * pp.qp_downsample
    ql, qdl, qddl, ok = path_np.path_qp_scipy(lmin, lmax, l0, dl0, ddl0, ds)

    # frenet -> cartesian
    txs, tys = [], []
    for s_v, l_v in zip(es, ql):
        i = int(np.searchsorted(s_map, s_v, side="right")) - 1
        i = min(max(i, 0), len(s_map) - 2)
        dseg = s_v - s_map[i]
        xr = sx[i] + dseg * math.cos(sth[i])
        yr = sy[i] + dseg * math.sin(sth[i])
        thr = sth[i] + sk[i] * dseg
        txs.append(xr - l_v * math.sin(thr))
        tys.append(yr + l_v * math.cos(thr))
    fx, fy = smooth_refline(np.asarray(txs), np.asarray(tys),
                            rl.w_smooth, rl.w_length, rl.w_ref,
                            rl.xy_bound, rl.admm_iters, rl.admm_rho)
    fth, fk = frenet_np.heading_kappa(fx, fy)
    return np.asarray(fx), np.asarray(fy), np.asarray(fth), np.asarray(fk)


def simulate(global_xyTK, ego0, obstacles, cfg, n_plans=5):
    """Closed loop, float64. Returns (traj_x, traj_y) per tick."""
    ego = ego0
    applied = 0.0
    accel = 0.0
    xs_out, ys_out = [], []
    for _ in range(n_plans):
        target = plan_cycle(global_xyTK, ego, obstacles, cfg, accel=accel)
        pid = PID(cfg.control)
        # ACC guard
        for _t in range(cfg.loop.plan_every):
            x, y, phi, vx, vy, om = ego
            vxw = vx * math.cos(phi)
            vyw = vx * math.sin(phi)
            spd = max(math.hypot(vxw, vyw), 1e-3)
            ux, uy = vxw / spd, vyw / spd
            d_lead = float("inf")
            for ox, oy in obstacles:
                dl_ = (ox - x) * ux + (oy - y) * uy
                lat_ = -(ox - x) * uy + (oy - y) * ux
                if dl_ > 0 and abs(lat_) < 2.0:
                    d_lead = min(d_lead, dl_)
            from emplanner_carla_tpu.sim.closed_loop import (
                ACC_HEADWAY,
                ACC_STANDOFF,
            )

            v_cap = max((d_lead - ACC_STANDOFF) / ACC_HEADWAY, 0.0) * 3.6
            target_kmh = min(cfg.loop.target_speed_kmh, v_cap)
            steer = lqr_steer(ego, target, cfg.vehicle, cfg.control)
            cmd = pid.step(vx, target_kmh)
            throttle = float(np.clip(cmd, 0, 1))
            brake = float(np.clip(-cmd, 0, 1))
            accel = throttle * cfg.vehicle.max_accel - brake * cfg.vehicle.max_brake_decel
            ego, applied = plant_step(ego, applied, steer, accel, cfg.vehicle,
                                      cfg.plant.dt)
            xs_out.append(ego[0])
            ys_out.append(ego[1])
        # (accel from the last tick feeds the next cycle's plan start)
    return np.asarray(xs_out), np.asarray(ys_out)
