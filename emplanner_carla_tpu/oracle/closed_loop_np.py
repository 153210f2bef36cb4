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
                   iters=12, rho=3.0, alpha=1.6):
    """Per-coordinate box-QP smoothing, f64 mirror of
    ``planner/reference_line.smooth_xy``: one direct unconstrained solve
    (exact when the box is inactive) + ``iters`` over-relaxed ADMM polish
    iterations for box-binding points."""
    n = len(xs)
    D2 = np.zeros((n - 2, n))
    for i in range(n - 2):
        D2[i, i : i + 3] = (1, -2, 1)
    D1 = np.zeros((n - 1, n))
    for i in range(n - 1):
        D1[i, i : i + 2] = (1, -1)
    H = 2 * (w_s * D2.T @ D2 + w_len * D1.T @ D1 + w_ref * np.eye(n))
    W = 2 * w_ref * np.linalg.inv(H)
    Minv = np.linalg.inv(H + rho * np.eye(n))

    def solve(ref):
        c = ref.mean()
        r = ref - c
        f = -2 * w_ref * r
        lb, ub = r - bound, r + bound
        x = W @ r
        z = np.clip(x, lb, ub)
        u = x - z
        for _ in range(iters):
            x = Minv @ (rho * (z - u) - f)
            xh = alpha * x + (1 - alpha) * z
            z = np.clip(xh + u, lb, ub)
            u += xh - z
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


# ---------------------------------------------------------------- MPC oracle
def _tracking_error(state, path_xyTK, vp, cfg):
    """Shared predicted-pose error vector (mirrors lateral.tracking_error,
    float64). Returns (e (4,), kappa, vx_safe)."""
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
    s_dot = (
        vx_s * math.cos(phip - theta_r) - vy * math.sin(phip - theta_r)
    ) / (1 - kappa * e_d)
    e_phi_dot = omega - kappa * s_dot
    return np.array([e_d, e_d_dot, e_phi, e_phi_dot]), float(kappa), vx_s


def _abc(vx, vp):
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
    Cv = np.zeros((4, 1))
    Cv[1, 0] = (a * cf + b * cr) / (m * vx) - vx
    Cv[3, 0] = (a * a * cf + b * b * cr) / (iz * vx)
    return A, B, Cv


def mpc_steer(state, path_xyTK, vp, cfg):
    """Float64 condensed MPC oracle (``controller.py:253-336`` intended
    math): exact batch matrices + an exact box-QP solve (L-BFGS-B on the
    quadratic). Mirrors lateral.mpc_steer_exact/_mpc_steer_table."""
    from scipy.optimize import minimize

    N, P_w, nx = cfg.mpc_n, cfg.mpc_p, 4
    e, kappa, vx_s = _tracking_error(state, path_xyTK, vp, cfg)
    A, B, Cv = _abc(vx_s, vp)
    ts = cfg.ts_discretize
    T = np.linalg.inv(np.eye(4) - 0.5 * ts * A)
    Ad = T @ (np.eye(4) + 0.5 * ts * A)
    Bd = T @ B * ts
    Cd = T @ Cv * ts * kappa * vx_s

    M = np.zeros(((N + 1) * nx, nx))
    M[0:nx] = np.eye(nx)
    for i in range(1, N + 1):
        M[i * nx : (i + 1) * nx] = Ad @ M[(i - 1) * nx : i * nx]
    Cc = np.zeros(((N + 1) * nx, 1))
    for i in range(1, N + 1):
        Cc[i * nx : (i + 1) * nx] = Ad @ Cc[(i - 1) * nx : i * nx] + Cd
    Bp = np.tile(Bd, (1, P_w))
    nu = N * P_w
    Cmat = np.zeros(((N + 1) * nx, nu))
    pow_rows = [Bp]
    for _ in range(N - 1):
        pow_rows.append(Ad @ pow_rows[-1])
    for i in range(1, N + 1):
        for j in range(i):
            Cmat[i * nx : (i + 1) * nx, j * P_w : (j + 1) * P_w] = pow_rows[
                i - 1 - j
            ]
    Q = np.diag(cfg.mpc_q)
    F = np.diag(cfg.mpc_f)
    Qbar = np.zeros(((N + 1) * nx, (N + 1) * nx))
    for i in range(N):
        Qbar[i * nx : (i + 1) * nx, i * nx : (i + 1) * nx] = Q
    Qbar[N * nx :, N * nx :] = F
    Rbar = np.eye(nu) * cfg.mpc_r
    H = Cmat.T @ Qbar @ Cmat + Rbar
    E = Cmat.T @ Qbar @ (Cc[:, 0] + M @ e)
    P2 = 2.0 * H
    q2 = 2.0 * E
    res = minimize(
        lambda u: 0.5 * u @ P2 @ u + q2 @ u,
        np.zeros(nu),
        jac=lambda u: P2 @ u + q2,
        bounds=[(-1.0, 1.0)] * nu,
        method="L-BFGS-B",
        options={"maxiter": 500, "ftol": 1e-14, "gtol": 1e-12},
    )
    # the MPC u is applied directly as the normalized steer (controller.py:311)
    return float(np.clip(res.x[0], -cfg.steer_limit, cfg.steer_limit))


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


def plant_step_dynamic(state, applied_steer, steer_cmd, accel, vp, dt):
    """Float64 dynamic bicycle with friction-limited linear tires — mirror
    of sim/plant.dynamic_step (which defines ground truth for the MPC
    benchmark config)."""
    x, y, phi, vx, vy, omega = state
    desired = (steer_cmd - applied_steer) * dt / max(vp.steer_tau, dt)
    change = np.clip(desired, -vp.steer_rate * dt, vp.steer_rate * dt)
    applied = float(np.clip(applied_steer + change, -1, 1))
    delta = applied * vp.max_steer_rad
    vx_safe = max(vx, 0.5)
    alpha_f = (vy + vp.a * omega) / vx_safe - delta
    alpha_r = (vy - vp.b * omega) / vx_safe
    mu_g = 1.0 * 9.81
    fzf = vp.mass * mu_g * vp.b / (vp.a + vp.b)
    fzr = vp.mass * mu_g * vp.a / (vp.a + vp.b)
    fyf = float(np.clip(vp.cf * alpha_f, -fzf, fzf))
    fyr = float(np.clip(vp.cr * alpha_r, -fzr, fzr))
    vy_dot = (fyf + fyr) / vp.mass - vx * omega
    omega_dot = (vp.a * fyf - vp.b * fyr) / vp.iz
    vx2 = max(vx + accel * dt, 0.0)
    vy2 = vy + vy_dot * dt if vx2 > 0.1 else 0.0
    om2 = omega + omega_dot * dt if vx2 > 0.1 else 0.0
    phi2 = phi + om2 * dt
    c, sn = math.cos(phi2), math.sin(phi2)
    return (
        x + (vx2 * c - vy2 * sn) * dt,
        y + (vy2 * c + vx2 * sn) * dt,
        phi2,
        vx2,
        vy2,
        om2,
    ), applied


# ---------------------------------------------------------------- planner cycle
def plan_cycle(global_xyTK, ego, obstacles, cfg, accel=0.0, dynamics=()):
    """One EM path-plan cycle, float64. obstacles: list of (x, y) statics;
    dynamics: list of (x, y, vx, vy) NPCs feeding the virtual-obstacle
    conversion (mirror of perception.virtual_obstacles).

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
    # per-obstacle perception gates (mirror of perception.perceive: range +
    # longitudinal behind-gate along the unit motion direction with the
    # heading fallback below 0.5 m/s), then the reference's nearest-within-
    # 30 m static gate and the reference-line lateral band. Without the
    # behind-gate mirror a static just behind the ego (which the JAX side
    # drops) clamps the oracle's corridor at its clipped first stations —
    # found by the re-anchored per-cycle certification (44 cm in one cycle).
    keep_s, keep_l = [], []
    if len(obstacles):
        spdw = math.hypot(vxw, vyw)
        if spdw < 0.5:
            uxp, uyp = math.cos(phi), math.sin(phi)
        else:
            uxp, uyp = vxw / spdw, vyw / spdw
        cand = []   # (s, l, dist) passing every per-obstacle gate
        for (ox, oy), (os_, ol_) in zip(obstacles, zip(*obs_sl)):
            dd = math.hypot(ox - x, oy - y)
            lon = (ox - x) * uxp + (oy - y) * uyp
            if (dd < cfg.loop.perception_range
                    and lon > cfg.loop.behind_gate
                    and abs(ol_) < cfg.loop.lateral_gate):
                cand.append((os_, ol_, dd))
        # nearest-within-30m gate over the already-gated set, like the JAX
        # side's static_gate(static_mask & lat_ok, dist)
        if cand and min(c[2] for c in cand) <= 30.0:
            keep_s = [c[0] for c in cand]
            keep_l = [c[1] for c in cand]

    axw = accel * math.cos(phi)
    ayw = accel * math.sin(phi)
    st = frenet_np.frenet_state(px, py, vxw, vyw, axw, ayw, sx, sy, sth, sk, s_map)
    s0, l0 = st[0], st[1]
    dl0, ddl0 = st[6], st[7]

    # dynamic -> virtual static obstacles (mirror of
    # perception.virtual_obstacles: anchored meet/leave band at l = 0)
    if len(dynamics):
        from emplanner_carla_tpu.sim.perception import EGO_LENGTH, OBS_LENGTH

        spdw = math.hypot(vxw, vyw)
        if spdw < 0.5:
            ux, uy = math.cos(phi), math.sin(phi)
        else:
            ux, uy = vxw / spdw, vyw / spdw
        cand = []
        for (dx_, dy_, dvx_, dvy_) in dynamics:
            dd = math.hypot(dx_ - x, dy_ - y)
            lon = (dx_ - x) * ux + (dy_ - y) * uy
            spd_o = math.hypot(dvx_, dvy_)
            if dd >= cfg.loop.perception_range or lon <= cfg.loop.behind_gate:
                continue
            if spd_o <= cfg.loop.dynamic_speed_gate:
                continue
            dsl = frenet_np.cartesian_to_sl(
                np.array([[dx_, dy_]]), sx, sy, sth, sk, s_map
            )
            if abs(dsl[1][0]) >= cfg.loop.lateral_gate:
                continue
            cand.append((dd, spd_o))
        if cand:
            d, v_obs = min(cand)
            dv = math.hypot(vx, vy) - v_obs
            if dv > 0.1:
                meet_t = (d - EGO_LENGTH / 2 - OBS_LENGTH / 2) / dv
                leave_t = meet_t + (EGO_LENGTH + OBS_LENGTH) / dv
                obs_now_s = s0 + d
                meet_s = obs_now_s + v_obs * meet_t - OBS_LENGTH / 2
                leave_s = obs_now_s + v_obs * leave_t + OBS_LENGTH / 2
                if meet_s - 10.0 < 80.0:
                    for sv in (obs_now_s, meet_s - 10.0,
                               0.5 * (meet_s + leave_s), leave_s):
                        keep_s.append(sv)
                        keep_l.append(0.0)

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


def _steer_fn(cfg):
    if cfg.control.kind == "MPC":
        return lambda ego, target: mpc_steer(ego, target, cfg.vehicle,
                                             cfg.control)
    return lambda ego, target: lqr_steer(ego, target, cfg.vehicle, cfg.control)


def _plant_fn(cfg):
    if cfg.plant.kind == "dynamic":
        return plant_step_dynamic
    return plant_step


def _acc_cap_mps(ego, obstacle_xy):
    """Time-headway speed cap (m/s) — mirror of the closed loops' guard.
    Uses the *world-frame* velocity direction like the JAX side."""
    from emplanner_carla_tpu.sim.closed_loop import ACC_HEADWAY, ACC_STANDOFF

    x, y, phi, vx, vy, om = ego
    vxw = vx * math.cos(phi) - vy * math.sin(phi)
    vyw = vy * math.cos(phi) + vx * math.sin(phi)
    spd = math.hypot(vxw, vyw)
    if spd < 0.5:
        # heading fallback (closed_loop._motion_dir): a stopped ego must
        # keep seeing the lead it stopped for
        ux, uy = math.cos(phi), math.sin(phi)
    else:
        ux, uy = vxw / spd, vyw / spd
    d_lead = float("inf")
    for ox, oy in obstacle_xy:
        dl_ = (ox - x) * ux + (oy - y) * uy
        lat_ = -(ox - x) * uy + (oy - y) * ux
        if dl_ > 0 and abs(lat_) < 2.0:
            d_lead = min(d_lead, dl_)
    return max((d_lead - ACC_STANDOFF) / ACC_HEADWAY, 0.0)


def _red_light_cap_mps(ego, lights, t_abs):
    """Float64 mirror of sim/traffic_light.red_light_cap: time-headway
    speed cap against the nearest red stop line ahead. ``lights``: list of
    (x, y, period, offset, green_frac)."""
    x, y, phi, vx, vy, _om = ego
    vxw = vx * math.cos(phi) - vy * math.sin(phi)
    vyw = vy * math.cos(phi) + vx * math.sin(phi)
    spd = max(math.hypot(vxw, vyw), 1e-3)
    if spd < 0.5:
        ux, uy = math.cos(phi), math.sin(phi)
    else:
        ux, uy = vxw / spd, vyw / spd
    d_stop = float("inf")
    for (lx, ly, period, offset, gfrac) in lights:
        phase = math.fmod(t_abs + offset, max(period, 1e-3))
        if phase < gfrac * period:   # green
            continue
        dx, dy = lx - x, ly - y
        d_long = dx * ux + dy * uy
        d_lat = -dx * uy + dy * ux
        if d_long > 0.0 and abs(d_lat) < 3.0:
            d_stop = min(d_stop, d_long)
    return max((d_stop - 4.0) / 1.2, 0.0)


def simulate(global_xyTK, ego0, obstacles, cfg, n_plans=5, lights=None):
    """Closed loop, float64. Controller (LQR/MPC) and plant
    (kinematic/dynamic) follow cfg like the JAX loop. ``lights``: optional
    [(x, y, period, offset, green_frac)] red-light stop lines. Returns
    (traj_x, traj_y) per tick."""
    ego = ego0
    applied = 0.0
    accel = 0.0
    steer_of = _steer_fn(cfg)
    step_of = _plant_fn(cfg)
    xs_out, ys_out = [], []
    tick_abs = 0
    for _ in range(n_plans):
        target = plan_cycle(global_xyTK, ego, obstacles, cfg, accel=accel)
        pid = PID(cfg.control)
        for _t in range(cfg.loop.plan_every):
            v_cap = _acc_cap_mps(ego, obstacles) * 3.6
            target_kmh = min(cfg.loop.target_speed_kmh, v_cap)
            if lights is not None:
                tick_abs += 1
                target_kmh = min(
                    target_kmh,
                    3.6 * _red_light_cap_mps(
                        ego, lights, tick_abs * cfg.plant.dt
                    ),
                )
            steer = steer_of(ego, target)
            cmd = pid.step(ego[3], target_kmh)
            throttle = float(np.clip(cmd, 0, 1))
            brake = float(np.clip(-cmd, 0, 1))
            accel = throttle * cfg.vehicle.max_accel - brake * cfg.vehicle.max_brake_decel
            ego, applied = step_of(ego, applied, steer, accel, cfg.vehicle,
                                   cfg.plant.dt)
            xs_out.append(ego[0])
            ys_out.append(ego[1])
        # (accel from the last tick feeds the next cycle's plan start)
    return np.asarray(xs_out), np.asarray(ys_out)


# ---------------------------------------------------------------- speed stage
def convex_space_np(dp_s, dp_valid, end_col, segs, path_s, path_kappa, sp):
    """Float64 mirror of speed_planner.convex_space (intended math)."""
    n_t = sp.n_t
    t_grid = (np.arange(n_t) + 1.0) * sp.t_step
    s_lb = np.zeros(n_t)
    s_ub = np.full(n_t, 1e8)
    kappa_at = np.interp(dp_s, path_s, np.abs(path_kappa))
    sd_ub = np.sqrt(sp.max_lateral_accel / (kappa_at + 1e-10))
    sd_ub = np.where(dp_valid, sd_ub, 1e8)
    sd_lb = np.zeros(n_t)

    s_end_val = dp_s[end_col]
    dp_s_clean = np.where(dp_valid, dp_s, s_end_val)
    dp_t_full = np.concatenate([[0.0], t_grid])
    dp_s_full = np.concatenate([[0.0], dp_s_clean])
    for (s_in, s_out, t_in, t_out) in segs:
        obs_t = 0.5 * (t_in + t_out)
        obs_s = 0.5 * (s_in + s_out)
        denom = (t_out - t_in) if abs(t_out - t_in) >= 1e-6 else 1.0
        obs_speed = (s_out - s_in) / denom
        dp_s_at = np.interp(obs_t, dp_t_full, dp_s_full)
        yield_to = obs_s > dp_s_at
        t_lb_idx = int(np.sum(t_grid <= t_in)) - 1
        t_ub_idx = int(np.sum(t_grid <= t_out)) - 1
        t_lb_idx = min(max(t_lb_idx, 0), n_t - 1)
        t_ub_idx = min(max(t_ub_idx, 0), n_t - 1)
        t_lb_idx = max(t_lb_idx - 2, 3)
        t_ub_idx = min(t_ub_idx + 2, int(end_col))
        for c in range(t_lb_idx, t_ub_idx + 1):
            line_s = s_in + obs_speed * (t_grid[c] - t_in)
            if yield_to:
                s_ub[c] = min(s_ub[c], line_s)
            else:
                s_lb[c] = max(s_lb[c], line_s)
    return s_lb, s_ub, sd_lb, sd_ub


def speed_qp_scipy(s_dot0, s_ddot0, s_lb, s_ub, sd_lb, sd_ub, sp):
    """Float64 exact solve of the full-horizon speed QP (mirror of
    speed_planner.speed_qp; quirk Q6 fixed — bounds really constrain,
    and like the JAX side the caps are relaxed to the reachable
    max-braking / max-accel envelopes to keep the QP feasible)."""
    from scipy.optimize import Bounds, LinearConstraint, minimize

    n = sp.n_t + 1
    nv = 3 * n
    dt = sp.t_step

    def envelope(a_limit):
        s_i, v_i, a_i = 0.0, max(s_dot0, 0.0), s_ddot0
        s_env, v_env = [], []
        for _ in range(sp.n_t):
            a_next = a_limit
            if a_limit < 0.0:
                a_next = max(a_limit, -2.0 * v_i / dt - a_i)
            v_next = max(v_i + dt * 0.5 * (a_i + a_next), 0.0)
            s_next = s_i + dt * v_i + dt * dt / 3.0 * a_i + dt * dt / 6.0 * a_next
            s_env.append(s_next)
            v_env.append(v_next)
            s_i, v_i, a_i = s_next, v_next, a_next
        return np.asarray(s_env), np.asarray(v_env)

    margin = 1e-2
    s_min_env, v_min_env = envelope(sp.accel_min)
    s_max_env, v_max_env = envelope(sp.accel_max)
    s_ub = np.maximum(s_ub, s_min_env + margin)
    sd_ub = np.maximum(sd_ub, v_min_env + margin)
    s_lb = np.minimum(s_lb, np.maximum(s_max_env - margin, 0.0))
    sd_lb = np.minimum(sd_lb, np.maximum(v_max_env - margin, 0.0))
    P = np.zeros((nv, nv))
    for i in range(n):
        P[3 * i + 1, 3 * i + 1] += sp.w_qp_v_ref
        P[3 * i + 2, 3 * i + 2] += sp.w_qp_s_dot2
    for i in range(n - 1):
        a, b = 3 * i + 2, 3 * i + 5
        P[a, a] += sp.w_qp_jerk
        P[b, b] += sp.w_qp_jerk
        P[a, b] -= sp.w_qp_jerk
        P[b, a] -= sp.w_qp_jerk
    P *= 2.0
    q = np.zeros(nv)
    q[1::3] = -2.0 * sp.w_qp_v_ref * sp.reference_speed

    Aeq = np.zeros((2 * (n - 1), nv))
    for i in range(n - 1):
        Aeq[2 * i, 3 * i : 3 * i + 6] = [1, dt, dt**2 / 3, -1, 0, dt**2 / 6]
        Aeq[2 * i + 1, 3 * i : 3 * i + 6] = [0, 1, dt / 2, 0, -1, dt / 2]
    A_mono = np.zeros((n - 1, nv))
    for i in range(n - 1):
        A_mono[i, 3 * i] = 1.0
        A_mono[i, 3 * i + 3] = -1.0

    lb = np.zeros(nv)
    ub = np.zeros(nv)
    lb[0::3] = np.concatenate([[0.0], s_lb])
    ub[0::3] = np.concatenate([[0.0], s_ub])
    lb[1::3] = np.concatenate([[s_dot0], sd_lb])
    ub[1::3] = np.concatenate([[s_dot0], sd_ub])
    lb[2::3] = np.concatenate([[s_ddot0], np.full(n - 1, sp.accel_min)])
    ub[2::3] = np.concatenate([[s_ddot0], np.full(n - 1, sp.accel_max)])

    res = minimize(
        lambda x: 0.5 * x @ P @ x + q @ x,
        np.clip(np.zeros(nv), lb, ub),
        jac=lambda x: P @ x + q,
        hess=lambda x: P,
        constraints=[
            LinearConstraint(Aeq, 0.0, 0.0),
            LinearConstraint(A_mono, -np.inf, 0.0),
        ],
        bounds=Bounds(lb, ub),
        method="trust-constr",
        options={"maxiter": 2000, "gtol": 1e-10, "xtol": 1e-12},
    )
    x = res.x
    t = np.arange(n) * dt
    return x[0::3], x[1::3], x[2::3], t


def densify_np(s, sd, sdd, t, sp):
    """Exact piecewise-constant-jerk densify (mirror of densify_speed)."""
    dt = sp.t_step
    tq = np.linspace(0.0, t[-1], sp.n_dense)
    j = np.clip((tq / dt).astype(int), 0, len(s) - 2)
    x = tq - t[j]
    jerk = (sdd[j + 1] - sdd[j]) / dt
    s_d = s[j] + sd[j] * x + 0.5 * sdd[j] * x**2 + jerk * x**3 / 6.0
    v_d = sd[j] + sdd[j] * x + 0.5 * jerk * x**2
    return s_d, v_d, tq


def _speed_stage(target, ego, accel, dyn, cfg):
    """S-T speed planning on a freshly planned path, float64 (mirror of
    em_planner.plan_full_cycle's speed half). ``dyn``: [(x, y, vx, vy)]
    current dynamic-obstacle snapshot. Returns the densified
    (t_dense, v_dense) profile."""
    from emplanner_carla_tpu.oracle import speed_np

    tx, ty, tth, tk = target
    sp = cfg.speed
    s_dot0 = max(
        (ego[3] * math.cos(ego[2]) - ego[4] * math.sin(ego[2]))
        * math.cos(tth[0])
        + (ego[4] * math.cos(ego[2]) + ego[3] * math.sin(ego[2]))
        * math.sin(tth[0]),
        0.0,
    )
    axw = accel * math.cos(ego[2])
    ayw = accel * math.sin(ego[2])
    s_ddot0 = axw * math.cos(tth[0]) + ayw * math.sin(tth[0])
    path_s = np.concatenate(
        [[0.0], np.cumsum(np.hypot(np.diff(tx), np.diff(ty)))]
    )
    # dynamic obstacles -> Frenet rates vs the NEW path (perceive gates)
    obs_s, obs_l, obs_sd, obs_ld = [], [], [], []
    for (dx_, dy_, dvx_, dvy_) in dyn:
        dd = math.hypot(dx_ - ego[0], dy_ - ego[1])
        vxw = ego[3] * math.cos(ego[2]) - ego[4] * math.sin(ego[2])
        vyw = ego[4] * math.cos(ego[2]) + ego[3] * math.sin(ego[2])
        spd = max(math.hypot(vxw, vyw), 0.5)
        lon = ((dx_ - ego[0]) * vxw + (dy_ - ego[1]) * vyw) / spd
        if dd >= cfg.loop.perception_range or lon <= cfg.loop.behind_gate:
            continue
        if math.hypot(dvx_, dvy_) <= cfg.loop.dynamic_speed_gate:
            continue
        i = int(np.argmin((tx - dx_) ** 2 + (ty - dy_) ** 2))
        thr = tth[i]
        nx_, ny_ = -math.sin(thr), math.cos(thr)
        tx_, ty_ = math.cos(thr), math.sin(thr)
        # project exactly like ops/frenet.dynamic_obs_frenet: position
        # projection first, then rates vs the projection point
        dxp, dyp = dx_ - tx[i], dy_ - ty[i]
        ds_ = dxp * tx_ + dyp * ty_
        xr = tx[i] + ds_ * tx_
        yr = ty[i] + ds_ * ty_
        thr2 = thr + tk[i] * ds_
        nx2, ny2 = -math.sin(thr2), math.cos(thr2)
        tx2, ty2 = math.cos(thr2), math.sin(thr2)
        l_ = (dx_ - xr) * nx2 + (dy_ - yr) * ny2
        obs_s.append(path_s[i] + ds_)
        obs_l.append(l_)
        obs_ld.append(dvx_ * nx2 + dvy_ * ny2)
        obs_sd.append((dvx_ * tx2 + dvy_ * ty2) / (1.0 - tk[i] * l_))
    segs = speed_np.st_graph(
        obs_s, obs_l, obs_sd, obs_ld, sp.lateral_gate, sp.l_dot_gate,
        sp.t_min_gate, sp.t_max_gate,
    )
    s_grid = np.asarray(sp.s_grid)
    dp_s, dp_valid, end_col = speed_np.speed_dp(
        segs, s_dot0, s_grid, sp.n_t, sp.t_step, sp.reference_speed,
        sp.w_ref_speed, sp.w_accel, sp.accel_penalty,
    )
    s_lb, s_ub, sd_lb, sd_ub = convex_space_np(
        dp_s, dp_valid, end_col, segs, path_s, tk, sp
    )
    qs, qv, qa, qt = speed_qp_scipy(
        s_dot0, s_ddot0, s_lb, s_ub, sd_lb, sd_ub, sp
    )
    _s_d, v_d, t_d = densify_np(qs, qv, qa, qt, sp)
    return t_d, v_d


def simulate_full(global_xyTK, ego0, statics, dynamics, cfg, n_plans=5,
                  applied0=0.0, accel0=0.0, arrived0=False,
                  return_speed=False):
    """Full EM closed loop (path + S-T speed planning), float64 — the
    oracle for closed_loop.simulate_full (test_10's intent, quirk Q10).

    statics: [(x, y)]; dynamics: [(x, y, vx, vy)] advancing at constant
    velocity each tick. Returns (traj_x, traj_y) per tick — or
    (traj_x, traj_y, traj_v) with ``return_speed`` (post-step ground speed
    in m/s, the longitudinal channel the re-anchored certification bounds
    against `TickMetrics.speed_kmh`).

    ``applied0``/``accel0`` seed the steering-actuator state and the
    last-tick acceleration (which pins the plan-start ddl0) — used by the
    re-anchored per-cycle certification to restart the oracle mid-run from
    a JAX cycle-boundary state.
    """
    ego = ego0
    applied = applied0
    accel = accel0
    arrived = arrived0
    dest_x, dest_y = float(global_xyTK[0][-1]), float(global_xyTK[1][-1])
    steer_of = _steer_fn(cfg)
    step_of = _plant_fn(cfg)
    dyn = [list(d) for d in dynamics]
    xs_out, ys_out, vs_out = [], [], []
    for _ in range(n_plans):
        target = plan_cycle(
            global_xyTK, ego, statics, cfg, accel=accel,
            dynamics=[tuple(d) for d in dyn],
        )
        t_d, v_d = _speed_stage(
            target, ego, accel, [tuple(d) for d in dyn], cfg
        )

        pid = PID(cfg.control)
        for tick in range(cfg.loop.plan_every):
            t_rel = (tick + 1) * cfg.plant.dt
            plan_speed = float(np.interp(t_rel, t_d, v_d))
            all_xy = statics + [(d[0], d[1]) for d in dyn]
            v_cap = _acc_cap_mps(ego, all_xy)
            target_kmh = 3.6 * min(plan_speed, v_cap)
            steer = steer_of(ego, target)
            cmd = pid.step(ego[3], target_kmh)
            throttle = float(np.clip(cmd, 0, 1))
            brake = float(np.clip(-cmd, 0, 1))
            # arrival emergency brake — mirror of the JAX loop's latch
            # (closed_loop.simulate_full checks the pre-step ego each tick)
            arrived = arrived or (
                math.hypot(ego[0] - dest_x, ego[1] - dest_y)
                < cfg.loop.arrival_dist
            )
            if arrived:
                steer, throttle, brake = 0.0, 0.0, 1.0
            accel = (throttle * cfg.vehicle.max_accel
                     - brake * cfg.vehicle.max_brake_decel)
            ego, applied = step_of(ego, applied, steer, accel, cfg.vehicle,
                                   cfg.plant.dt)
            for d in dyn:
                d[0] += d[2] * cfg.plant.dt
                d[1] += d[3] * cfg.plant.dt
            xs_out.append(ego[0])
            ys_out.append(ego[1])
            vs_out.append(math.hypot(ego[3], ego[4]))
    if return_speed:
        return np.asarray(xs_out), np.asarray(ys_out), np.asarray(vs_out)
    return np.asarray(xs_out), np.asarray(ys_out)


def simulate_traffic(global_xyTK, ego0, statics, npcs0, cfg,
                     behavior="normal", n_plans=5, full=False,
                     return_npcs=False):
    """Agent-traffic closed loop, float64 — the oracle for
    closed_loop.simulate_traffic (the reference's actual experiment: a
    BehaviorAgent NPC on the same route, ``test_9.py:288-291,344``).

    statics: [(x, y)]; npcs0: [(x, y, vx, vy)] dynamic slots. Slots with
    initial speed > 2.5 m/s run the float64 agent model (oracle/npc_np.py
    — pure pursuit + IDM + lane changes, reacting to the ego and each
    other every tick); slower dynamic slots are walkers advancing at
    constant velocity, exactly as the JAX loop splits them.
    ``full=True`` adds the S-T speed stage per replan. Returns
    (traj_x, traj_y) per ego tick; with ``return_npcs=True`` additionally
    the final per-slot NPC states
    [x, y, vx, vy, path_index, lane_offset, lane_target, agent].
    """
    from emplanner_carla_tpu.oracle import npc_np

    gx, gy = np.asarray(global_xyTK[0]), np.asarray(global_xyTK[1])
    gth = np.asarray(global_xyTK[2])
    p = npc_np.preset(behavior)
    vp = cfg.vehicle
    dt = cfg.plant.dt
    dest_x, dest_y = float(gx[-1]), float(gy[-1])

    # per-slot: [x, y, vx, vy, path_index, lane_offset, lane_target, agent]
    npcs = []
    for (x, y, vx, vy) in npcs0:
        idx0 = frenet_np.nearest_index(x, y, gx, gy)
        npcs.append([float(x), float(y), float(vx), float(vy), int(idx0),
                     0.0, 0.0, math.hypot(vx, vy) > 2.5])

    def advance_npcs(ego_state):
        # lane slew first, then every agent decides on the SAME pre-tick
        # snapshot (the JAX vmap semantics), then all updates apply at once
        for s in npcs:
            s[5], s[6] = npc_np.slew_lane(s[5], s[6], dt)
        snap = [tuple(s[:4]) for s in npcs]
        ex, ey = ego_state[0], ego_state[1]
        e_speed = math.hypot(ego_state[3], ego_state[4])
        updates = []
        for k, s in enumerate(npcs):
            if not s[7]:
                # walker / constant-velocity slot
                updates.append((s[0] + s[2] * dt, s[1] + s[3] * dt,
                                s[2], s[3], s[4], s[5], s[6]))
                continue
            x, y, vx, vy = snap[k]
            spd = math.hypot(vx, vy)
            phi = math.atan2(vy, vx) if spd > 0.1 else 0.0
            # others: statics + the other NPC slots + the ego (JAX slot
            # order: obstacle slots first, ego appended last)
            others = [(sx_, sy_, 0.0, True) for (sx_, sy_) in statics]
            others += [
                (ox, oy, math.hypot(ovx, ovy), j != k)
                for j, (ox, oy, ovx, ovy) in enumerate(snap)
            ]
            others.append((ex, ey, e_speed, True))
            l_now = npc_np.lateral_offset_on_path(x, y, gx, gy, gth, s[4])
            gap_own, v_own = npc_np.lead_info(
                x, y, phi, others, lateral_shift=-l_now
            )
            gap_tgt, v_tgt = npc_np.lead_info(
                x, y, phi, others, lateral_shift=s[6] - l_now
            )
            left_free = npc_np.corridor_free(
                x, y, phi, npc_np.LANE_WIDTH - l_now, others
            )
            right_free = npc_np.corridor_free(
                x, y, phi, -npc_np.LANE_WIDTH - l_now, others
            )
            own_free = npc_np.corridor_free(x, y, phi, -l_now, others)
            off, tgt = npc_np.lane_change_decision(
                s[5], s[6], gap_own, v_own, spd, left_free, right_free,
                own_free, p,
            )
            x2, y2, phi2, v2, idx2 = npc_np.npc_step(
                x, y, phi, spd, s[4], gx, gy, gth, gap_tgt, v_tgt, p, vp,
                dt, lane_offset=off,
            )
            updates.append((x2, y2, v2 * math.cos(phi2),
                            v2 * math.sin(phi2), idx2, off, tgt))
        for s, u in zip(npcs, updates):
            s[:7] = list(u)

    ego = ego0
    applied = 0.0
    accel = 0.0
    arrived = False
    steer_of = _steer_fn(cfg)
    step_of = _plant_fn(cfg)
    xs_out, ys_out = [], []
    for _ in range(n_plans):
        dyn_snap = [(s[0], s[1], s[2], s[3]) for s in npcs]
        target = plan_cycle(
            global_xyTK, ego, statics, cfg, accel=accel, dynamics=dyn_snap
        )
        if full:
            t_d, v_d = _speed_stage(target, ego, accel, dyn_snap, cfg)
        pid = PID(cfg.control)
        for tick in range(cfg.loop.plan_every):
            all_xy = statics + [(s[0], s[1]) for s in npcs]
            v_cap = _acc_cap_mps(ego, all_xy)
            if full:
                t_rel = (tick + 1) * dt
                plan_speed = float(np.interp(t_rel, t_d, v_d))
                target_kmh = 3.6 * min(plan_speed, v_cap)
            else:
                target_kmh = min(cfg.loop.target_speed_kmh, 3.6 * v_cap)
            steer = steer_of(ego, target)
            cmd = pid.step(math.hypot(ego[3], ego[4]), target_kmh)
            throttle = float(np.clip(cmd, 0, 1))
            brake = float(np.clip(-cmd, 0, 1))
            arrived = arrived or (
                math.hypot(ego[0] - dest_x, ego[1] - dest_y)
                < cfg.loop.arrival_dist
            )
            if arrived:
                steer, throttle, brake = 0.0, 0.0, 1.0
            accel = (throttle * vp.max_accel
                     - brake * vp.max_brake_decel)
            ego, applied = step_of(ego, applied, steer, accel, vp, dt)
            advance_npcs(ego)
            xs_out.append(ego[0])
            ys_out.append(ego[1])
    if return_npcs:
        return np.asarray(xs_out), np.asarray(ys_out), npcs
    return np.asarray(xs_out), np.asarray(ys_out)
