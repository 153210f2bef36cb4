"""Fleet-scale execution: scenario batches sharded over a TPU mesh.

The reference's only concurrency is a 2-process planner/controller split
joined by a pickled pipe (SURVEY.md §2.2). The TPU-native scaling story is
batch (scenario) parallelism: ``vmap`` turns one ego into a batch, and
``shard_map`` over a device mesh splits the batch across chips with XLA
collectives (``psum`` over ICI) reducing fleet-level metrics — no NCCL/MPI,
no pipes.

The mesh axis is named "data": each chip simulates batch/n_devices
scenarios independently; the only cross-chip traffic is the metric
reduction at the end (a handful of scalars over ICI).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emplanner_carla_tpu.config import EMConfig
from emplanner_carla_tpu.sim import closed_loop
from emplanner_carla_tpu.sim.scenario import Scenario

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_scenarios(scenarios: Scenario, mesh: Mesh) -> Scenario:
    """Place a batched Scenario with its leading axis split over the mesh."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), scenarios)


def fleet_simulate(
    scenarios: Scenario, cfg: EMConfig, mesh: Mesh, full: bool = False,
    traffic: bool = False, behavior: str = "normal",
    pixels: bool = False, return_carry: bool = False,
):
    """Run the closed loop for a sharded scenario batch.

    ``full=True`` runs the complete EM loop (path + speed planning,
    ``simulate_full``); otherwise the path-only loop. ``traffic=True``
    instead runs the agent-traffic loop (``simulate_traffic`` — NPC slots
    drive the route with the IDM/pure-pursuit agent, composing with
    ``full``). ``pixels=True`` instead runs the drive-from-pixels loop
    (``sim/pixel_loop.simulate_pixels`` — camera render -> detector ->
    tracker -> planner on the estimates, composing with ``full``; the
    returned per-scenario metrics are ``PixelMetrics`` whose ``.ticks``
    feed the same fleet aggregates). Returns (metrics, aggregates): per-scenario metrics
    (sharded like the input) and fleet-level aggregates reduced across
    the mesh with psum — lateral RMSE, mean speed, collision count,
    scenario count. ``return_carry=True`` appends the final (sharded)
    loop carry: ``(metrics, agg, carry)`` — the mesh-sharded state a
    fleet checkpoint persists.
    """
    if pixels and traffic:
        raise ValueError("pixels and traffic modes are mutually exclusive")
    if pixels:
        from emplanner_carla_tpu.sim import pixel_loop

        def sim(gp, e, o, cfg):
            return pixel_loop.simulate_pixels(gp, e, o, cfg, full=full)
    elif traffic:
        def sim(gp, e, o, cfg):
            return closed_loop.simulate_traffic(
                gp, e, o, cfg, behavior=behavior, full=full
            )
    else:
        sim = closed_loop.simulate_full if full else closed_loop.simulate
    batched = jax.vmap(lambda gp, e, o: sim(gp, e, o, cfg))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS),),
        out_specs=(P(DATA_AXIS), P(), P(DATA_AXIS)),
        check_vma=False,
    )
    def run(sc: Scenario):
        carry, metrics = batched(sc.global_path, sc.ego0, sc.obstacles)
        tk = metrics.ticks if pixels else metrics
        b = tk.lateral_err.shape[0]
        sq_sum = jnp.sum(tk.lateral_err**2)
        n_ticks = jnp.asarray(tk.lateral_err.size, jnp.float32)
        collisions = jnp.sum(
            jnp.any(tk.collided.reshape(b, -1), axis=1).astype(jnp.float32)
        )
        speed_sum = jnp.sum(tk.speed_kmh)
        # feasible is constant within a plan cycle: count infeasible cycles
        # from each cycle's first tick (metrics are (b, n_plans, plan_every))
        infeasible = jnp.sum(1.0 - tk.feasible[..., 0].astype(jnp.float32))
        # planner-compression drops (constant within a cycle: first ticks
        # only): ST segments cut by st_top_m (full loops) + DP obstacle
        # slots cut by dp_top_m (all loops, incl. path-only)
        seg_dropped = jnp.sum(
            tk.segments_dropped[..., 0].astype(jnp.float32)
        )
        # cross-chip reductions ride ICI
        tot_sq = jax.lax.psum(sq_sum, DATA_AXIS)
        tot_ticks = jax.lax.psum(n_ticks, DATA_AXIS)
        tot_col = jax.lax.psum(collisions, DATA_AXIS)
        tot_speed = jax.lax.psum(speed_sum, DATA_AXIS)
        tot_b = jax.lax.psum(jnp.asarray(b, jnp.float32), DATA_AXIS)
        tot_infeasible = jax.lax.psum(infeasible, DATA_AXIS)
        tot_dropped = jax.lax.psum(seg_dropped, DATA_AXIS)
        agg = jnp.stack(
            [
                jnp.sqrt(tot_sq / tot_ticks),
                tot_speed / tot_ticks,
                tot_col,
                tot_b,
                tot_infeasible,
                tot_dropped,
            ]
        )
        return metrics, agg, carry

    metrics, agg, carry = jax.jit(run)(scenarios)
    agg_d = {
        "lateral_rmse": agg[0],
        "mean_speed_kmh": agg[1],
        "collisions": agg[2],
        "n_scenarios": agg[3],
        "infeasible_cycles": agg[4],
        "segments_dropped": agg[5],
    }
    if return_carry:
        return metrics, agg_d, carry
    return metrics, agg_d
