"""Fleet sharding over the virtual 8-device mesh (parallel/fleet.py)."""

import dataclasses

import jax
import numpy as np
import pytest

from emplanner_carla_tpu.config import EMConfig
from emplanner_carla_tpu.parallel import fleet
from emplanner_carla_tpu.sim import scenario

CFG = EMConfig(loop=dataclasses.replace(EMConfig().loop, n_plans=3))


# conftest.py re-execs pytest with the axon sitecustomize scrubbed, so the
# suite runs on a REAL 8-device virtual CPU mesh (the sitecustomize's
# replacement CPU client used to ignore --xla_force_host_platform_device_count
# and collapse it to one device). N_DEV stays dynamic so the tests also pass
# in odd environments; the driver additionally runs __graft_entry__.dryrun_multichip(8)
# in a clean environment as the semantics proof.
N_DEV = len(jax.devices())


@pytest.mark.parametrize("full", [False, True])
def test_fleet_simulate_on_mesh(full):
    mesh = fleet.make_mesh()
    B = 2 * N_DEV  # 2 scenarios per device
    scs = scenario.batch_scenarios(jax.random.PRNGKey(4), B, CFG)
    scs = fleet.shard_scenarios(scs, mesh)
    metrics, agg = fleet.fleet_simulate(scs, CFG, mesh, full=full)
    assert int(agg["n_scenarios"]) == B
    assert np.isfinite(float(agg["lateral_rmse"]))
    assert float(agg["mean_speed_kmh"]) > 10.0
    assert metrics.x.shape == (B, CFG.loop.n_plans, CFG.loop.plan_every)
    # the per-scenario metrics stay sharded across the mesh
    shards = metrics.x.sharding
    assert len(shards.device_set) == N_DEV


def test_fleet_agg_matches_local():
    """psum aggregates must equal a host-side reduction of the metrics."""
    mesh = fleet.make_mesh()
    B = max(8, N_DEV)
    scs = scenario.batch_scenarios(jax.random.PRNGKey(5), B, CFG)
    scs = fleet.shard_scenarios(scs, mesh)
    metrics, agg = fleet.fleet_simulate(scs, CFG, mesh)
    lat = np.asarray(metrics.lateral_err)
    np.testing.assert_allclose(
        float(agg["lateral_rmse"]), np.sqrt(np.mean(lat**2)), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(agg["mean_speed_kmh"]),
        np.asarray(metrics.speed_kmh).mean(),
        rtol=1e-4,
    )


def test_fleet_simulate_pixels_on_mesh():
    """The drive-from-pixels loop shards over the mesh like the others:
    camera render -> detector -> tracker -> full EM per chip, tick
    aggregates psum'd over ICI, per-scenario PixelMetrics sharded."""
    mesh = fleet.make_mesh()
    B = 2 * N_DEV
    scs = scenario.batch_scenarios(jax.random.PRNGKey(6), B, CFG)
    scs = fleet.shard_scenarios(scs, mesh)
    metrics, agg = fleet.fleet_simulate(scs, CFG, mesh, full=True, pixels=True)
    assert int(agg["n_scenarios"]) == B
    assert np.isfinite(float(agg["lateral_rmse"]))
    assert metrics.ticks.x.shape == (B, CFG.loop.n_plans, CFG.loop.plan_every)
    assert metrics.perc_err.shape == (B, CFG.loop.n_plans)
    assert len(metrics.ticks.x.sharding.device_set) == N_DEV
