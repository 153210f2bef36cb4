"""Device-side synthetic cameras vs analytic expectations.

The reference's cameras are CARLA server renders consumed by the pygame
HUD (``sensors/Sensors_camera_lib.py``); here they are pure functions of
world state, so each output channel can be checked against closed-form
geometry: semantic classes by construction, depth by ray intersection
arithmetic, optical flow by the pinhole egomotion field.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emplanner_carla_tpu.sim import camera
from emplanner_carla_tpu.types import EgoState, Obstacles, Path


CFG = camera.CameraConfig(width=48, height=32)


def straight_path(n=128, ds=2.0):
    x = jnp.arange(n, dtype=jnp.float32) * ds
    z = jnp.zeros(n, jnp.float32)
    return Path(x, z, z, z)


def ego_at(x=0.0, y=0.0, phi=0.0, v=8.0, omega=0.0):
    z = jnp.zeros(())
    return EgoState(
        jnp.float32(x), jnp.float32(y), jnp.float32(phi), jnp.float32(v),
        z, jnp.float32(omega), z, z, z,
    )


def obstacles(xs=(), ys=(), vxs=None, vys=None, k=4):
    x = np.zeros(k, np.float32)
    y = np.zeros(k, np.float32)
    vx = np.zeros(k, np.float32)
    vy = np.zeros(k, np.float32)
    valid = np.zeros(k, bool)
    for i, (xi, yi) in enumerate(zip(xs, ys)):
        x[i], y[i], valid[i] = xi, yi, True
        if vxs is not None:
            vx[i] = vxs[i]
        if vys is not None:
            vy[i] = vys[i]
    return Obstacles(*(jnp.asarray(a) for a in (x, y, vx, vy, valid)))


@pytest.fixture(scope="module")
def empty_frame():
    return jax.jit(camera.render, static_argnums=3)(
        ego_at(), straight_path(), obstacles(), CFG
    )


def test_empty_road_layout(empty_frame):
    sem = np.asarray(empty_frame.semantic)
    H, W = sem.shape
    # top half of the image is sky, bottom-centre column is road,
    # bottom corners (far from the centerline) are terrain
    assert (sem[: H // 2 - 2] == camera.SKY).all()
    assert (sem[-6:, W // 2 - 2 : W // 2 + 2] == camera.ROAD).all()
    # off-road ground appears in the rows just below the horizon, where a
    # corner ray's lateral reach (mount_height * a/|b|) exceeds the road
    # halfwidth; the near field (bottom corners) is all road at 90 deg fov
    assert sem[H // 2 + 5, 0] == camera.TERRAIN
    assert sem[H // 2 + 5, -1] == camera.TERRAIN


def test_ground_depth_matches_geometry(empty_frame):
    """Depth of a bottom-row centre pixel equals the closed-form ray-plane
    intersection distance."""
    depth = np.asarray(empty_frame.depth)
    H, W = depth.shape
    f = (CFG.width / 2.0) / math.tan(CFG.fov / 2.0)
    cy = (CFG.height - 1) / 2.0
    v = H - 1
    b = (cy - v) / f                      # z/x slope (negative: below axis)
    # unit ray (center column): dz = b / sqrt(1 + b^2)
    dz = b / math.sqrt(1.0 + b * b)
    expect = CFG.mount_height / -dz
    assert depth[v, (W - 1) // 2] == pytest.approx(expect, rel=1e-3)
    # depth increases toward the horizon
    col = depth[H // 2 + 2 :, (W - 1) // 2]
    assert (np.diff(col) < 0).all()


def test_vehicle_and_walker_classes_and_depth():
    obs = obstacles(xs=(12.0, 8.0), ys=(0.0, 3.0))
    frame = camera.render(
        ego_at(), straight_path(), obs, CFG,
        is_walker=jnp.array([False, True, False, False]),
    )
    sem = np.asarray(frame.semantic)
    H, W = sem.shape
    assert (sem == camera.VEHICLE).any()
    assert (sem == camera.WALKER).any()
    # centre-row pixel on the vehicle: depth = distance from the camera to
    # the cylinder face along +x
    row = sem[H // 2]
    cols = np.where(row == camera.VEHICLE)[0]
    assert len(cols) > 0
    c = cols[len(cols) // 2]
    expect = 12.0 - CFG.mount_forward - camera.VEHICLE_RADIUS
    assert np.asarray(frame.depth)[H // 2, c] == pytest.approx(
        expect, abs=0.15
    )
    # the walker (left of the path at y=+3) appears left of centre
    wcols = np.where((sem == camera.WALKER).any(axis=0))[0]
    assert (wcols < (W - 1) / 2).all()


def test_flow_expands_from_focus_of_expansion():
    """Driving straight: static-world flow vanishes at the FOE (image
    centre) and points radially outward — left half flows left, right
    half flows right, ground flows down."""
    frame = camera.render(ego_at(v=10.0), straight_path(), obstacles(), CFG)
    flow = np.asarray(frame.flow)
    sem = np.asarray(frame.semantic)
    H, W = sem.shape
    ground = sem != camera.SKY
    # horizontal flow: pixel u left of centre (u < cx) has du < 0? Our
    # convention: u = cx - f*(Y/X); a point on the left (Y>0) maps to
    # u < cx and moving toward the camera increases Y/X -> du < 0 (moves
    # further left). Check the sign pattern relative to the centre column.
    cx = (W - 1) / 2.0
    for v in range(H // 2 + 2, H, 3):
        for u in range(0, W, 5):
            if not ground[v, u] or abs(u - cx) < 2:
                continue
            assert np.sign(flow[v, u, 0]) == np.sign(u - cx), (v, u)
    # ground flows downward in the image (dv > 0 means v increases? our
    # v = cy - f*(Z/X): ground Z<0, approaching -> Z/X more negative ->
    # v increases -> dv/dt = -f d(Z/X)/dt > 0 ... assert sign:
    assert (flow[H - 4 :, :, 1][ground[H - 4 :]] > 0).all()


def test_comoving_obstacle_has_small_flow():
    """An obstacle moving with the ego produces (near-)zero flow on its
    pixels, while the static road streams past."""
    v = 10.0
    obs = obstacles(xs=(15.0,), ys=(0.0,), vxs=(v,), vys=(0.0,))
    frame = camera.render(ego_at(v=v), straight_path(), obs, CFG)
    sem = np.asarray(frame.semantic)
    flow = np.asarray(frame.flow)
    on_vehicle = sem == camera.VEHICLE
    assert on_vehicle.any()
    assert np.abs(flow[on_vehicle]).max() < 1e-3
    on_road = sem == camera.ROAD
    assert np.abs(flow[on_road]).max() > 1.0


def test_rgb_palette_and_vmap():
    """RGB frame uses the CityScapes palette; the whole camera vmaps."""
    frame = camera.render(ego_at(), straight_path(), obstacles(), CFG)
    img = np.asarray(camera.rgb_frame(frame, CFG))
    assert img.shape == (CFG.height, CFG.width, 3) and img.dtype == np.uint8
    # sky pixels keep the exact palette color (no depth shade)
    assert (img[0, 0] == np.array([70, 130, 180])).all()

    egos = jax.tree.map(
        lambda *a: jnp.stack(a), ego_at(0.0), ego_at(5.0), ego_at(10.0)
    )
    gp = straight_path()
    gps = jax.tree.map(lambda a: jnp.broadcast_to(a, (3,) + a.shape), gp)
    obs = obstacles(xs=(30.0,), ys=(0.0,))
    obss = jax.tree.map(lambda a: jnp.broadcast_to(a, (3,) + a.shape), obs)
    frames = jax.jit(
        jax.vmap(lambda e, g, o: camera.render(e, g, o, CFG))
    )(egos, gps, obss)
    assert frames.semantic.shape == (3, CFG.height, CFG.width)
    # nearer ego sees the obstacle bigger
    counts = (np.asarray(frames.semantic) == camera.VEHICLE).sum(axis=(1, 2))
    assert counts[2] > counts[0]
