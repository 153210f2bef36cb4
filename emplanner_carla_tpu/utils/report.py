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
