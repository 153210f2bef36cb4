"""Trajectory fidelity: JAX f32 closed loop vs the NumPy f64 oracle.

BASELINE.md's <= 5 cm lateral-RMSE criterion, evaluated the way SURVEY.md
§7.3 defines it: both systems run the *same* plant and the same intended
algorithms on identical scenarios; the deviation measures the JAX/f32/
fixed-iteration implementation against the loop-based float64/scipy oracle.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emplanner_carla_tpu.config import EMConfig
from emplanner_carla_tpu.oracle import closed_loop_np
from emplanner_carla_tpu.sim import closed_loop, scenario

N_PLANS = 5


@pytest.mark.parametrize("seed", [0, 2])
def test_closed_loop_matches_numpy_oracle(seed):
    cfg = EMConfig(
        loop=dataclasses.replace(EMConfig().loop, n_plans=N_PLANS)
    )
    sc = scenario.make_scenario(
        jax.random.PRNGKey(seed), cfg, with_dynamic=False, n_active_static=2,
        v0=10.0,
    )

    # JAX run
    carry, metrics = closed_loop.simulate(
        sc.global_path, sc.ego0, sc.obstacles, cfg
    )
    jx = np.asarray(metrics.x).reshape(-1)
    jy = np.asarray(metrics.y).reshape(-1)

    # oracle run on the identical world
    gx = np.asarray(sc.global_path.x, np.float64)
    gy = np.asarray(sc.global_path.y, np.float64)
    gth = np.asarray(sc.global_path.theta, np.float64)
    gk = np.asarray(sc.global_path.kappa, np.float64)
    valid = np.asarray(sc.obstacles.valid)
    obstacles = [
        (float(sc.obstacles.x[i]), float(sc.obstacles.y[i]))
        for i in np.where(valid)[0]
    ]
    ego0 = (
        float(sc.ego0.x), float(sc.ego0.y), float(sc.ego0.phi),
        float(sc.ego0.vx), 0.0, 0.0,
    )
    ox, oy = closed_loop_np.simulate(
        (gx, gy, gth, gk), ego0, obstacles, cfg, n_plans=N_PLANS
    )

    assert len(ox) == len(jx)
    # lateral deviation between the two trajectories: distance from each JAX
    # point to the oracle polyline (projection on the nearest oracle segment)
    dev = []
    for k in range(0, len(jx), 5):
        d2 = (ox - jx[k]) ** 2 + (oy - jy[k]) ** 2
        i = int(np.argmin(d2))
        i0 = max(min(i, len(ox) - 2), 0)
        tx, ty = ox[i0 + 1] - ox[i0], oy[i0 + 1] - oy[i0]
        nrm = np.hypot(tx, ty) + 1e-12
        lat = abs(
            -(jx[k] - ox[i0]) * ty / nrm + (jy[k] - oy[i0]) * tx / nrm
        )
        dev.append(lat)
    rmse = float(np.sqrt(np.mean(np.square(dev))))
    assert rmse <= 0.05, f"lateral RMSE vs oracle {rmse:.3f} m"
