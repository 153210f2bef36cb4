"""Lateral control: error-state model, LQR (+feedforward), condensed MPC.

Rebuild of ``/root/reference/controller/controller.py`` (Lateral_LQR_controller
:374-611, Lateral_MPC_controller :65-336) as pure functions.

Shared machinery:
* error-state dynamic bicycle A(Vx), B — ``controller.py:115-149`` with the
  intended parameter order (quirk Q7 fixed via VehicleParams);
* bilinear (Tustin) discretization at ts = 0.1 — ``controller.py:151-168``;
* predicted-pose matching and the e = (e_d, e_d', e_phi, e_phi') error vector
  — ``controller.py:170-249``, with the reference's windowed/full argmin
  searches replaced by a branch-free masked argmin.

LQR: fixed-trip-count Riccati iteration (the reference iterates <= 5000 with
tol 0.1, ``controller.py:468-482``; at these magnitudes it converges in a few
dozen steps, so a fixed 80 is both faster and XLA-friendly) + curvature
feedforward. Quirk Q15 (new, beyond SURVEY §7.4's ledger): the reference
multiplies the feedforward angle by pi/180 (``controller.py:583``) although it
is already in radians, shrinking it 57x; we keep radians.

MPC: the condensed N=6/P=2 formulation (``controller.py:253-311``) solved by
the fixed-iteration box-QP ADMM instead of cvxopt.

Steering command convention: the model's u is a front-wheel angle in radians;
the plant takes a normalized steer in [-1, 1]; we divide by the max wheel
angle (the reference feeds radians straight into carla's normalized steer —
a units mismatch absorbed by its hand-tuned gains).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from emplanner_carla_tpu.config import ControlConfig, VehicleParams
from emplanner_carla_tpu.ops import qp
from emplanner_carla_tpu.types import Array, EgoState, Path


def error_state_model(vx: Array, vp: VehicleParams):
    """Continuous A (4, 4), B (4, 1), C (4, 1) of the error dynamics
    (``controller.py:115-149``)."""
    a, b, cf, cr, m, iz = vp.a, vp.b, vp.cf, vp.cr, vp.mass, vp.iz
    A = jnp.zeros((4, 4))
    A = A.at[0, 1].set(1.0)
    A = A.at[1, 1].set((cf + cr) / (m * vx))
    A = A.at[1, 2].set(-(cf + cr) / m)
    A = A.at[1, 3].set((a * cf - b * cr) / (m * vx))
    A = A.at[2, 3].set(1.0)
    A = A.at[3, 1].set((a * cf - b * cr) / (iz * vx))
    A = A.at[3, 2].set(-(a * cf - b * cr) / iz)
    A = A.at[3, 3].set((a * a * cf + b * b * cr) / (iz * vx))
    B = jnp.zeros((4, 1)).at[1, 0].set(-cf / m).at[3, 0].set(-a * cf / iz)
    C = (
        jnp.zeros((4, 1))
        .at[1, 0].set((a * cf + b * cr) / (m * vx) - vx)
        .at[3, 0].set((a * a * cf + b * b * cr) / (iz * vx))
    )
    return A, B, C


def discretize(A: Array, B: Array, ts: float):
    """Bilinear (Tustin) discretization (``controller.py:160-164``)."""
    with jax.default_matmul_precision("highest"):
        eye = jnp.eye(4)
        T = jnp.linalg.inv(eye - 0.5 * ts * A)
        return T @ (eye + 0.5 * ts * A), T @ B * ts, T


def safe_vx(s: EgoState, cfg: ControlConfig) -> Array:
    """Vx clamped away from the model singularity (``controller.py:103-109``)."""
    return jnp.where(
        s.vx < 0, jnp.minimum(s.vx, -cfg.min_vx), jnp.maximum(s.vx, cfg.min_vx)
    )


def tracking_error(s: EgoState, target: Path, cfg: ControlConfig):
    """Predicted-pose tracking error e = (e_d, e_d', e_phi, e_phi'), the
    projection curvature k_r, and the match index
    (``controller.py:488-567``).

    The reference's MPC restarts a 50-point windowed match from the last
    tick's index (``controller.py:198``) — a CPU-latency optimization that
    on TPU would *add* work (mask + same-width argmin) and a carried state.
    The local target path is short (n_qp points), so a full branch-free
    argmin per tick is both cheaper and robust across rebinds; the LQR side
    of the reference already searches the full path (``controller.py:518``).
    """
    vx = safe_vx(s, cfg)
    ts = cfg.ts_predict
    # kinematic prediction over one control latency (controller.py:505-508)
    x = s.x + (vx * jnp.cos(s.phi) - s.vy * jnp.sin(s.phi)) * ts
    y = s.y + (s.vy * jnp.cos(s.phi) + vx * jnp.sin(s.phi)) * ts
    phi = s.phi + s.omega * ts

    d2 = (target.x - x) ** 2 + (target.y - y) ** 2
    idx = jnp.argmin(d2).astype(jnp.int32)

    # one-hot node selection: a per-lane gather under vmap measured ~2x the
    # plant step's cost; the multiply-sum is fused VPU work (see
    # frenet._gather)
    onehot = (jnp.arange(target.n) == idx).astype(target.x.dtype)
    xm = jnp.sum(target.x * onehot)
    ym = jnp.sum(target.y * onehot)
    thm = jnp.sum(target.theta * onehot)
    kappa = jnp.sum(target.kappa * onehot)
    tx, ty = jnp.cos(thm), jnp.sin(thm)
    nx, ny = -ty, tx
    dx, dy = x - xm, y - ym
    e_d = nx * dx + ny * dy
    e_s = tx * dx + ty * dy
    theta_r = thm + kappa * e_s
    e_d_dot = s.vy * jnp.cos(phi - theta_r) + vx * jnp.sin(phi - theta_r)
    if cfg.raw_heading_error:
        e_phi = phi - theta_r  # the ff-variant's raw e_fi (controller.py:891)
    else:
        e_phi = jnp.sin(phi - theta_r)  # sin() vs the wrap (controller.py:555)
    s_dot = (vx * jnp.cos(phi - theta_r) - s.vy * jnp.sin(phi - theta_r)) / (
        1.0 - kappa * e_d
    )
    e_phi_dot = s.omega - kappa * s_dot
    e = jnp.stack([e_d, e_d_dot, e_phi, e_phi_dot])
    return e, kappa, idx


def riccati_gain(A_d: Array, B_d: Array, Q: Array, R: Array, iters: int) -> Array:
    """K from the discrete Riccati iteration, fixed trip count
    (``controller.py:457-486``)."""
    with jax.default_matmul_precision("highest"):
        def body(_, P):
            BtPB = B_d.T @ P @ B_d + R
            return A_d.T @ P @ A_d - (A_d.T @ P @ B_d) @ jnp.linalg.inv(
                BtPB
            ) @ (B_d.T @ P @ A_d) + Q

        P = jax.lax.fori_loop(0, iters, body, Q)
        return jnp.linalg.inv(B_d.T @ P @ B_d + R) @ (B_d.T @ P @ A_d)  # (1, 4)


def lqr_feedforward(K: Array, kappa: Array, vx: Array, vp: VehicleParams) -> Array:
    """delta_f = kappa (a + b - b K3 - (b/Cf + a K3/Cr - a/Cr) m Vx^2/(a+b))
    (``controller.py:569-583``; Q15: no spurious pi/180)."""
    a, b, cf, cr, m = vp.a, vp.b, vp.cf, vp.cr, vp.mass
    k3 = K[0, 2]
    return kappa * (
        a + b - b * k3 - (b / cf + a * k3 / cr - a / cr) * (m * vx * vx) / (a + b)
    )


from functools import lru_cache


@lru_cache(maxsize=None)
def lqr_gain_table(
    vp: VehicleParams, cfg: ControlConfig, n: int = 128, v_max: float = 30.0
):
    """Trace-time K(Vx) lookup table.

    The gain depends on a single scalar (Vx), yet the reference recomputes
    the whole Riccati iteration every control tick (``controller.py:602``) —
    under ``lax.scan`` that is thousands of sequential 4x4 matmul chains per
    plan cycle, the worst possible shape for a TPU. Solving the DARE on a
    dense Vx grid in float64 NumPy at trace time reduces the per-tick work
    to one gather + lerp; at 128 points over [min_vx, 30] m/s the
    interpolation error is far below the Riccati tolerance the reference
    itself accepts (0.1 absolute, ``controller.py:469``).

    Returns (vx_grid (n,), K_table (n, 4)) as jnp constants.
    """
    import numpy as np

    vx_grid = np.linspace(cfg.min_vx, v_max, n)
    Q = np.diag(cfg.lqr_q).astype(np.float64)
    R = np.array([[cfg.lqr_r]], np.float64)
    a, b, cf, cr, m, iz = vp.a, vp.b, vp.cf, vp.cr, vp.mass, vp.iz
    Ks = np.zeros((n, 4))
    for i, vx in enumerate(vx_grid):
        A = np.zeros((4, 4))
        A[0, 1] = 1.0
        A[1, 1] = (cf + cr) / (m * vx)
        A[1, 2] = -(cf + cr) / m
        A[1, 3] = (a * cf - b * cr) / (m * vx)
        A[2, 3] = 1.0
        A[3, 1] = (a * cf - b * cr) / (iz * vx)
        A[3, 2] = -(a * cf - b * cr) / iz
        A[3, 3] = (a * a * cf + b * b * cr) / (iz * vx)
        B = np.zeros((4, 1))
        B[1, 0] = -cf / m
        B[3, 0] = -a * cf / iz
        ts = cfg.ts_discretize
        T = np.linalg.inv(np.eye(4) - 0.5 * ts * A)
        Ad = T @ (np.eye(4) + 0.5 * ts * A)
        Bd = T @ B * ts
        P = Q.copy()
        for _ in range(cfg.riccati_iters * 4):
            P_new = (
                Ad.T @ P @ Ad
                - (Ad.T @ P @ Bd)
                @ np.linalg.inv(R + Bd.T @ P @ Bd)
                @ (Bd.T @ P @ Ad)
                + Q
            )
            if np.abs(P_new - P).max() < 1e-9:
                P = P_new
                break
            P = P_new
        Ks[i] = (np.linalg.inv(Bd.T @ P @ Bd + R) @ (Bd.T @ P @ Ad))[0]
    # return NumPy (not jnp): jnp constants created inside a jit trace and
    # memoized by lru_cache leak tracers into later traces
    return vx_grid.astype(np.float32), Ks.astype(np.float32)


def _uniform_lerp(table_np, vx: Array, v0: float, dv: float) -> Array:
    """Linear interpolation of a table sampled on a UNIFORM grid
    v0 + i*dv: pure index arithmetic + two gathers. ``jnp.interp`` /
    ``searchsorted`` here measured ~45% of the whole control tick inside
    the vmapped scan — the search is pointless on a uniform grid."""
    table = jnp.asarray(table_np)
    pos = jnp.clip((vx - v0) / dv, 0.0, table.shape[0] - 1.0)
    i = jnp.clip(pos.astype(jnp.int32), 0, table.shape[0] - 2)
    w = pos - i.astype(pos.dtype)
    return table[i] * (1.0 - w) + table[i + 1] * w


def lqr_steer(
    s: EgoState,
    target: Path,
    vp: VehicleParams,
    cfg: ControlConfig,
):
    """One LQR lateral control step -> (normalized steer, match index)."""
    vx = safe_vx(s, cfg)
    vx_grid_np, K_table_np = lqr_gain_table(vp, cfg)
    v0 = float(vx_grid_np[0])
    dv = float(vx_grid_np[1] - vx_grid_np[0])
    K_row = _uniform_lerp(K_table_np, vx, v0, dv)  # (4,)
    K = K_row[None, :]
    e, kappa, idx = tracking_error(s, target, cfg)
    delta = -(K @ e)[0] + lqr_feedforward(K, kappa, vx, vp)
    steer = jnp.clip(delta / vp.max_steer_rad, -cfg.steer_limit, cfg.steer_limit)
    return steer, idx


@lru_cache(maxsize=None)
def mpc_tables(
    vp: VehicleParams, cfg: ControlConfig, n: int = 64, v_max: float = 30.0,
    rho: float = 1.0,
):
    """Trace-time MPC condensed-matrix tables over a Vx grid.

    Everything in the condensed MPC except the error vector and curvature
    depends only on Vx: H = C'Q_bar C + R_bar, the error map G1 = C'Q_bar M,
    and (since Cc is linear in kappa·Vx·T(Vx)C) the feedforward map
    g2 = C'Q_bar Cc_unit with Cc_unit built at kappa = 1. Building them
    per control tick (``controller.py:253-311``) inside a 4096-wide
    100-tick scan is what made the MPC fleet config crash the TPU worker;
    the tables reduce a tick to three lerped gathers + a 12-var box ADMM
    with a prefactored inverse.

    Returns NumPy: (vx_grid (n,), Minv (n,u,u) = inv(2H + rho I),
    G1 (n,u,4), g2 (n,u), Hinv2 (n,u,u) = inv(2H)) with u = mpc_n * mpc_p.
    Hinv2 drives the unconstrained fast path: u* = -Hinv2 f is the EXACT
    QP solution whenever it is box-interior (|u*|inf <= 1), which is every
    tick of ordinary tracking — the ADMM only resolves saturated ticks.
    """
    import numpy as np

    N, P_w, nx = cfg.mpc_n, cfg.mpc_p, 4
    nu = N * P_w
    a, b, cf, cr, m, iz = vp.a, vp.b, vp.cf, vp.cr, vp.mass, vp.iz
    ts = cfg.ts_discretize
    Q = np.diag(cfg.mpc_q)
    F = np.diag(cfg.mpc_f)
    Qbar = np.zeros(((N + 1) * nx, (N + 1) * nx))
    for i in range(N):
        Qbar[i * nx : (i + 1) * nx, i * nx : (i + 1) * nx] = Q
    Qbar[N * nx :, N * nx :] = F
    Rbar = np.eye(nu) * cfg.mpc_r

    vx_grid = np.linspace(cfg.min_vx, v_max, n)
    Minv_t = np.zeros((n, nu, nu))
    G1_t = np.zeros((n, nu, nx))
    g2_t = np.zeros((n, nu))
    Hinv2_t = np.zeros((n, nu, nu))
    for gi, vx in enumerate(vx_grid):
        A = np.zeros((4, 4))
        A[0, 1] = 1.0
        A[1, 1] = (cf + cr) / (m * vx)
        A[1, 2] = -(cf + cr) / m
        A[1, 3] = (a * cf - b * cr) / (m * vx)
        A[2, 3] = 1.0
        A[3, 1] = (a * cf - b * cr) / (iz * vx)
        A[3, 2] = -(a * cf - b * cr) / iz
        A[3, 3] = (a * a * cf + b * b * cr) / (iz * vx)
        B = np.zeros((4, 1))
        B[1, 0] = -cf / m
        B[3, 0] = -a * cf / iz
        Cv = np.zeros((4, 1))
        Cv[1, 0] = (a * cf + b * cr) / (m * vx) - vx
        Cv[3, 0] = (a * a * cf + b * b * cr) / (iz * vx)
        T = np.linalg.inv(np.eye(4) - 0.5 * ts * A)
        Ad = T @ (np.eye(4) + 0.5 * ts * A)
        Bd = T @ B * ts
        Cd_unit = T @ Cv * ts * vx  # kappa = 1

        M = np.zeros(((N + 1) * nx, nx))
        M[0:nx] = np.eye(nx)
        for i in range(1, N + 1):
            M[i * nx : (i + 1) * nx] = Ad @ M[(i - 1) * nx : i * nx]
        Cc = np.zeros(((N + 1) * nx, 1))
        for i in range(1, N + 1):
            Cc[i * nx : (i + 1) * nx] = Ad @ Cc[(i - 1) * nx : i * nx] + Cd_unit
        Bp = np.tile(Bd, (1, P_w))
        Cmat = np.zeros(((N + 1) * nx, nu))
        pow_rows = [Bp]
        for _ in range(N - 1):
            pow_rows.append(Ad @ pow_rows[-1])
        for i in range(1, N + 1):
            for j in range(i):
                Cmat[i * nx : (i + 1) * nx, j * P_w : (j + 1) * P_w] = pow_rows[
                    i - 1 - j
                ]
        H = Cmat.T @ Qbar @ Cmat + Rbar
        Minv_t[gi] = np.linalg.inv(2.0 * H + rho * np.eye(nu))
        G1_t[gi] = Cmat.T @ Qbar @ M
        g2_t[gi] = (Cmat.T @ Qbar @ Cc)[:, 0]
        Hinv2_t[gi] = np.linalg.inv(2.0 * H)
    return (
        vx_grid.astype(np.float32),
        Minv_t.astype(np.float32),
        G1_t.astype(np.float32),
        g2_t.astype(np.float32),
        Hinv2_t.astype(np.float32),
    )


def mpc_steer(
    s: EgoState,
    target: Path,
    vp: VehicleParams,
    cfg: ControlConfig,
):
    """One cold-started condensed-MPC lateral control step
    (``controller.py:253-336``), table-driven: lerp (Minv, G1, g2, Hinv2)
    at Vx, f = 2(G1 e + kappa g2), unconstrained fast path + a
    fixed-iteration box ADMM with the prefactored inverse; first control
    applied. See ``mpc_steer_warm`` for the closed-loop entry that carries
    the ADMM state across ticks."""
    with jax.default_matmul_precision("highest"):
        steer, idx, _ = _mpc_steer_table(
            s, target, vp, cfg, None, cfg.mpc_admm_iters
        )
        return steer, idx


def mpc_steer_warm(
    s: EgoState,
    target: Path,
    vp: VehicleParams,
    cfg: ControlConfig,
    warm,
):
    """Warm-started MPC step -> (steer, idx, (z, u_d)).

    ``warm = (z, u_d)`` is the previous tick's box-ADMM state (zeros on the
    first tick of a plan cycle — ``ControllerState.rebind`` resets it, the
    analogue of the reference re-instantiating its controller per replan,
    ``test_9.py:415-417``). Successive ticks solve near-identical QPs, so
    ``cfg.mpc_warm_admm_iters`` (10) replaces the cold 40; the
    unconstrained fast path makes box-interior ticks *exact* regardless."""
    with jax.default_matmul_precision("highest"):
        return _mpc_steer_table(s, target, vp, cfg, warm, cfg.mpc_warm_admm_iters)


@lru_cache(maxsize=None)
def _ustar_tables(vp: VehicleParams, cfg: ControlConfig, rho: float = 1.0):
    """Fold the unconstrained inverse into the error/curvature maps:
    u* = -inv(2H) f = W1 @ e + kappa * w2 with W1 = -2 inv(2H) G1 (n,u,4)
    and w2 = -2 inv(2H) g2 (n,u). Fetching these per tick costs 60 values
    instead of the 144-wide Hinv2 row (per-lane gathers of wide tables
    measured as the dominant MPC tick cost on TPU)."""
    import numpy as np

    _, _, G1_np, g2_np, Hinv2_np = mpc_tables(vp, cfg, rho=rho)
    W1 = -2.0 * np.einsum("nij,njk->nik", Hinv2_np, G1_np)
    w2 = -2.0 * np.einsum("nij,nj->ni", Hinv2_np, g2_np)
    return W1.astype(np.float32), w2.astype(np.float32)


def _mpc_steer_table(s, target, vp, cfg, warm, iters):
    rho = 1.0
    vx = safe_vx(s, cfg)
    e, kappa, idx = tracking_error(s, target, cfg)
    vx_grid_np, Minv_np, G1_np, g2_np, _ = mpc_tables(vp, cfg, rho=rho)
    W1_np, w2_np = _ustar_tables(vp, cfg, rho=rho)
    v0 = float(vx_grid_np[0])
    dv = float(vx_grid_np[1] - vx_grid_np[0])
    n_tab = vx_grid_np.shape[0]
    nu = g2_np.shape[1]

    # one-hot lerp weights: table fetches become (n_tab,)-contractions
    # (batched matmuls under vmap) instead of per-lane gathers of wide
    # tables — the gather of the (n_tab, nu, nu) Minv measured as the
    # dominant MPC tick cost at batch 4096 (see frenet._gather)
    pos = jnp.clip((vx - v0) / dv, 0.0, n_tab - 1.0)
    i0 = jnp.clip(pos.astype(jnp.int32), 0, n_tab - 2)
    w = pos - i0.astype(pos.dtype)
    ar = jnp.arange(n_tab)
    sel = (ar == i0).astype(jnp.float32) * (1.0 - w) + (
        ar == i0 + 1
    ).astype(jnp.float32) * w                      # (n_tab,)

    Minv = (sel @ Minv_np.reshape(n_tab, nu * nu)).reshape(nu, nu)
    G1 = (sel @ G1_np.reshape(n_tab, nu * 4)).reshape(nu, 4)
    g2 = sel @ jnp.asarray(g2_np)
    W1 = (sel @ W1_np.reshape(n_tab, nu * 4)).reshape(nu, 4)
    w2 = sel @ jnp.asarray(w2_np)
    f = 2.0 * (G1 @ e + kappa * g2)  # (nu,)

    lb = -jnp.ones(nu)
    ub = jnp.ones(nu)

    # unconstrained fast path: exact whenever box-interior
    ustar = W1 @ e + kappa * w2
    interior = jnp.max(jnp.abs(ustar)) <= 1.0

    def body(_, state):
        x, z, u_d = state
        x = Minv @ (rho * (z - u_d) - f)
        z = jnp.clip(x + u_d, lb, ub)
        u_d = u_d + x - z
        return x, z, u_d

    if warm is None:
        z0 = jnp.zeros(nu)
        ud0 = jnp.zeros(nu)
    else:
        z0, ud0 = warm
    _, z, u_d = jax.lax.fori_loop(0, iters, body, (z0, z0, ud0))
    steer = jnp.where(interior, ustar[0], z[0])
    steer = jnp.clip(steer, -cfg.steer_limit, cfg.steer_limit)
    # next tick's warm state: at an interior optimum the ADMM fixed point
    # is x = z = u*, u_d = 0 (zero active-set dual)
    warm_z = jnp.where(interior, ustar, z)
    warm_ud = jnp.where(interior, jnp.zeros(nu), u_d)
    return steer, idx, (warm_z, warm_ud)


def mpc_steer_exact(
    s: EgoState,
    target: Path,
    vp: VehicleParams,
    cfg: ControlConfig,
):
    """The per-tick-constructed condensed MPC (used by tests to validate the
    table-driven fast path)."""
    N, P_w, nx = cfg.mpc_n, cfg.mpc_p, 4
    with jax.default_matmul_precision("highest"):
        return _mpc_steer_impl(s, target, vp, cfg, N, P_w, nx)


def _mpc_steer_impl(s, target, vp, cfg, N, P_w, nx):
    vx = safe_vx(s, cfg)
    A, B, C = error_state_model(vx, vp)
    e, kappa, idx = tracking_error(s, target, cfg)
    A_d, B_d, T = discretize(A, B, cfg.ts_discretize)
    C_d = T @ C * cfg.ts_discretize * kappa * vx  # controller.py:165

    # M: free response stack [(I, A, A^2, ... A^N)] (controller.py:262-265)
    def m_step(Mi, _):
        Mn = A_d @ Mi
        return Mn, Mn

    _, M_rows = jax.lax.scan(m_step, jnp.eye(nx), None, length=N)
    M = jnp.concatenate([jnp.eye(nx)[None], M_rows]).reshape((N + 1) * nx, nx)

    # Cc: accumulated affine term (controller.py:275-277)
    def cc_step(ci, _):
        cn = A_d @ ci + C_d
        return cn, cn

    _, Cc_rows = jax.lax.scan(cc_step, jnp.zeros((nx, 1)), None, length=N)
    Cc = jnp.concatenate([jnp.zeros((1, nx, 1)), Cc_rows]).reshape((N + 1) * nx, 1)

    # C blocks: block-lower-triangular with A^k B broadcast across the P-wide
    # control blocks (controller.py:267-273 tiles B_bar into 4xP blocks)
    Bp = jnp.tile(B_d, (1, P_w))  # (4, P)
    pow_rows = jnp.concatenate([Bp[None], jax.lax.scan(
        lambda Bi, _: (A_d @ Bi, A_d @ Bi), Bp, None, length=N - 1
    )[1]])  # (N, 4, P): A^k B tiled
    # Cmat[(i) block row, j block col] = A^(i-1-j) B for j < i
    Cmat = jnp.zeros(((N + 1) * nx, N * P_w))
    for i in range(1, N + 1):
        for j in range(i):
            Cmat = jax.lax.dynamic_update_slice(
                Cmat, pow_rows[i - 1 - j], (i * nx, j * P_w)
            )

    Q = jnp.diag(jnp.asarray(cfg.mpc_q))
    F = jnp.diag(jnp.asarray(cfg.mpc_f))
    Qbar = jax.scipy.linalg.block_diag(*([Q] * N + [F]))
    Rbar = jnp.eye(N * P_w) * cfg.mpc_r

    H = Cmat.T @ Qbar @ Cmat + Rbar
    E = Cmat.T @ Qbar @ Cc + Cmat.T @ Qbar @ M @ e.reshape(nx, 1)
    u = qp.solve_box_qp(
        2.0 * H,
        (2.0 * E)[:, 0],
        -jnp.ones(N * P_w),
        jnp.ones(N * P_w),
        iters=cfg.mpc_admm_iters,
    )
    delta = u[0]
    # The reference's MPC u is applied directly as the normalized carla steer
    # (controller.py:311,705-710); the QP box |u|<=1 already matches the
    # normalized actuator range, so no rescale here.
    steer = jnp.clip(delta, -cfg.steer_limit, cfg.steer_limit)
    return steer, idx
