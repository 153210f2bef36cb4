"""Post-run reporting: plots + structured summaries (the HUD replacement).

The reference's observability is a pygame HUD (server/client FPS, vehicle
state, nearby vehicles, collision sparkline — ``simulation_2.py:594-668``,
``simulation_4.py:411-503``), ``carla.DebugHelper`` world drawings
(``test_9.py:410-433``), and post-run matplotlib speed/heading plots
(``test_3.py:142-152``). In the compiled-loop world, observability is the
structured TickMetrics stream returned from the scan; this module renders
it host-side.
"""

from __future__ import annotations

import json

import numpy as np


def run_report(metrics, cfg, path: str | None = None) -> dict:
    """Scalar roll-up of one scenario's TickMetrics (host-side).

    Returns (and optionally writes as JSON) the run summary: RMSE, speed
    stats, collision/arrival flags, distance travelled.
    """
    lat = np.asarray(metrics.lateral_err).reshape(-1)
    spd = np.asarray(metrics.speed_kmh).reshape(-1)
    x = np.asarray(metrics.x).reshape(-1)
    y = np.asarray(metrics.y).reshape(-1)
    out = {
        "ticks": int(lat.size),
        "sim_seconds": float(lat.size * cfg.plant.dt),
        "lateral_rmse_m": float(np.sqrt(np.mean(lat**2))),
        "lateral_max_m": float(np.max(np.abs(lat))),
        "speed_mean_kmh": float(spd.mean()),
        "speed_max_kmh": float(spd.max()),
        "distance_m": float(np.sum(np.hypot(np.diff(x), np.diff(y)))),
        "collided": bool(np.asarray(metrics.collided).any()),
        "arrived": bool(np.asarray(metrics.arrived).any()),
    }
    if path is not None:
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
    return out


def plot_run(metrics, scenario=None, cfg=None, path: str = "run.png"):
    """Trajectory + speed + heading + lateral-error panel (the post-run
    matplotlib plots of ``test_3.py:142-152`` and the debug-draw overlay of
    ``test_9.py:410-433``, rendered offline)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.asarray(metrics.x).reshape(-1)
    y = np.asarray(metrics.y).reshape(-1)
    spd = np.asarray(metrics.speed_kmh).reshape(-1)
    lat = np.asarray(metrics.lateral_err).reshape(-1)
    heading = np.asarray(metrics.heading).reshape(-1)
    dt = cfg.plant.dt if cfg is not None else 0.01
    t = np.arange(len(spd)) * dt

    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    ax = axes[0, 0]
    if scenario is not None:
        gp = scenario.global_path
        ax.plot(np.asarray(gp.x), np.asarray(gp.y), "k--", lw=0.8,
                label="global path")
        ov = np.asarray(scenario.obstacles.valid)
        ax.scatter(
            np.asarray(scenario.obstacles.x)[ov],
            np.asarray(scenario.obstacles.y)[ov],
            c="red", marker="s", s=40, label="obstacles",
        )
    ax.plot(x, y, "b-", lw=1.2, label="ego")
    ax.set_title("trajectory")
    ax.axis("equal")
    ax.legend(fontsize=8)

    axes[0, 1].plot(t, spd)
    axes[0, 1].set_title("speed (km/h)")
    axes[1, 0].plot(t, lat)
    axes[1, 0].set_title("lateral error (m)")
    axes[1, 1].plot(t, np.unwrap(heading))
    axes[1, 1].set_title("heading (rad)")
    for a in axes.flat:
        a.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def animate_run(
    metrics,
    scenario=None,
    cfg=None,
    path: str = "run.gif",
    every: int = 10,
    camera: bool = False,
    fps: int = 12,
):
    """Rollout animation (the live-HUD role, rendered offline): map view
    with the ego trail + obstacles moving over time, the speed trace with
    a time cursor, and optionally the ego camera's RGB view per frame —
    the closest batch-TPU analogue of the reference's real-time pygame
    window (``simulation_2.py:594-668``; keyboard tele-op is declared out
    of scope in PARITY.md — there is no interactive process to drive).

    Obstacles are re-simulated at constant velocity from the scenario's
    initial state (exact for ``simulate``/``simulate_full`` rollouts; for
    agent traffic it shows the CV approximation). ``camera=True`` renders
    all camera keyframes in ONE vmapped device call from the recorded ego
    poses. Writes an animated GIF; returns the path.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    x = np.asarray(metrics.x).reshape(-1)
    y = np.asarray(metrics.y).reshape(-1)
    spd = np.asarray(metrics.speed_kmh).reshape(-1)
    phi = np.asarray(metrics.heading).reshape(-1)
    dt = cfg.plant.dt if cfg is not None else 0.01
    t = np.arange(len(spd)) * dt
    ks = np.arange(0, len(x), max(int(every), 1))

    rgb_frames = None
    if camera and scenario is not None:
        import jax
        import jax.numpy as jnp

        from emplanner_carla_tpu.sim import camera as cam_mod
        from emplanner_carla_tpu.types import EgoState

        cam_cfg = cam_mod.CameraConfig()
        ov = scenario.obstacles

        def frame_at(xk, yk, pk, vk, tk):
            z = jnp.zeros(())
            ego = EgoState(xk, yk, pk, vk, z, z, z, z, z)
            obs_t = ov._replace(x=ov.x + ov.vx * tk, y=ov.y + ov.vy * tk)
            fr = cam_mod.render(ego, scenario.global_path, obs_t, cam_cfg)
            return cam_mod.rgb_frame(fr, cam_cfg)

        rgb_frames = np.asarray(
            jax.jit(jax.vmap(frame_at))(
                jnp.asarray(x[ks], jnp.float32),
                jnp.asarray(y[ks], jnp.float32),
                jnp.asarray(phi[ks], jnp.float32),
                jnp.asarray(spd[ks] / 3.6, jnp.float32),
                jnp.asarray((ks + 1) * dt, jnp.float32),
            )
        )

    ncols = 3 if rgb_frames is not None else 2
    fig, axes = plt.subplots(1, ncols, figsize=(5 * ncols, 4.2))
    ax_map, ax_spd = axes[0], axes[1]

    if scenario is not None:
        gp = scenario.global_path
        ax_map.plot(np.asarray(gp.x), np.asarray(gp.y), "k--", lw=0.8)
    ax_map.plot(x, y, color="0.8", lw=0.8)  # full route, dimmed
    trail, = ax_map.plot([], [], "b-", lw=1.4)
    ego_pt, = ax_map.plot([], [], "bo", ms=6)
    obs_sc = None
    if scenario is not None:
        ov = np.asarray(scenario.obstacles.valid)
        obs_sc = ax_map.scatter(
            np.asarray(scenario.obstacles.x)[ov],
            np.asarray(scenario.obstacles.y)[ov],
            c="red", marker="s", s=36,
        )
    ax_map.set_title("world")
    ax_map.axis("equal")
    ax_map.grid(alpha=0.3)

    ax_spd.plot(t, spd, color="0.7")
    cursor, = ax_spd.plot([], [], "b-", lw=1.4)
    ax_spd.set_title("speed (km/h)")
    ax_spd.set_xlabel("t (s)")
    ax_spd.grid(alpha=0.3)

    im = None
    if rgb_frames is not None:
        im = axes[2].imshow(rgb_frames[0])
        axes[2].set_title("ego camera")
        axes[2].set_xticks([])
        axes[2].set_yticks([])

    if scenario is not None:
        obs0x = np.asarray(scenario.obstacles.x)
        obs0y = np.asarray(scenario.obstacles.y)
        obsvx = np.asarray(scenario.obstacles.vx)
        obsvy = np.asarray(scenario.obstacles.vy)
        ovalid = np.asarray(scenario.obstacles.valid)

    def draw(i):
        k = ks[i]
        trail.set_data(x[: k + 1], y[: k + 1])
        ego_pt.set_data([x[k]], [y[k]])
        arts = [trail, ego_pt, cursor]
        if obs_sc is not None:
            tk = (k + 1) * dt
            obs_sc.set_offsets(
                np.stack(
                    [obs0x[ovalid] + obsvx[ovalid] * tk,
                     obs0y[ovalid] + obsvy[ovalid] * tk], axis=1
                )
            )
            arts.append(obs_sc)
        cursor.set_data(t[: k + 1], spd[: k + 1])
        if im is not None:
            im.set_data(rgb_frames[i])
            arts.append(im)
        return arts

    fig.tight_layout()
    anim = animation.FuncAnimation(
        fig, draw, frames=len(ks), blit=True, interval=1000 // fps
    )
    anim.save(path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return path


def plot_camera_frame(frame, cfg=None, path: str = "camera.png"):
    """Render one sim/camera.py frame as the four-panel HUD view the
    reference's pygame window showed (RGB / semantic / depth / flow,
    ``simulation_2.py:594-668`` + ``Sensors_camera_lib.py``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from emplanner_carla_tpu.sim import camera as cam_mod

    cam_cfg = cfg if cfg is not None else cam_mod.CameraConfig()
    rgb = np.asarray(cam_mod.rgb_frame(frame, cam_cfg))
    sem = np.asarray(frame.semantic)
    depth = np.asarray(frame.depth)
    flow = np.asarray(frame.flow)

    fig, axes = plt.subplots(2, 2, figsize=(10, 6))
    axes[0, 0].imshow(rgb)
    axes[0, 0].set_title("rgb")
    axes[0, 1].imshow(sem, cmap="tab10", vmin=0, vmax=9)
    axes[0, 1].set_title("semantic")
    im = axes[1, 0].imshow(depth, cmap="viridis")
    axes[1, 0].set_title("depth (m)")
    fig.colorbar(im, ax=axes[1, 0], shrink=0.8)
    mag = np.hypot(flow[..., 0], flow[..., 1])
    axes[1, 1].imshow(mag, cmap="magma")
    axes[1, 1].set_title("optical-flow magnitude (px/s)")
    for a in axes.flat:
        a.set_xticks([])
        a.set_yticks([])
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
