"""Headline benchmark: aggregate FULL-EM plan-control-step cycles/sec.

One "cycle" = one complete EM replan — reference line -> S-L path DP ->
corridor -> piecewise-jerk QP -> S-T graph -> speed DP -> convex space ->
speed QP -> 401-pt trajectory merge — plus ``plan_every`` LQR+PID control
ticks stepping the bicycle plant: the unit the reference intended to run at
10 Hz for a single ego and never achieved (its speed pipeline crashes,
SURVEY.md §3.5/Q10; the path-only loop misses the deadline under obstacles).

Prints ONE JSON line:
  {"metric": ..., "value": cycles/s, "unit": ..., "vs_baseline": value/10}

vs_baseline: the reference runs ONE ego at an intended 10 plan cycles/sec
(test_10.py:324-325; in practice it misses that deadline whenever obstacles
are present, SURVEY.md §3.5) — so vs_baseline = aggregate cycles/sec / 10.
"""

from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/emplanner_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from emplanner_carla_tpu.config import EMConfig
    from emplanner_carla_tpu.sim import closed_loop, scenario

    cfg = EMConfig()
    batch = 4096
    scs = scenario.batch_scenarios(jax.random.PRNGKey(1), batch, cfg)

    # Reduce to scalars on device: timing must not include pulling the
    # (batch, plans, ticks) metric tensors through the TPU tunnel, and on
    # this backend only a host transfer reliably fences the computation.
    def run(gp, e, o):
        carry, metrics = closed_loop.simulate_full(gp, e, o, cfg)
        return (
            jnp.sum(metrics.lateral_err**2),
            jnp.sum(metrics.lateral_err.astype(jnp.float32) * 0 + 1),
            jnp.sum(jnp.isfinite(metrics.lateral_err)),
        )

    sim = jax.jit(jax.vmap(run))

    # compile + correctness sanity
    sq, cnt, fin = sim(scs.global_path, scs.ego0, scs.obstacles)
    assert float(jnp.sum(fin)) == float(jnp.sum(cnt)), "non-finite metrics"

    best = float("inf")
    for _ in range(5):  # best-of-5 against tunnel-dispatch jitter
        t0 = time.perf_counter()
        sq, cnt, fin = sim(scs.global_path, scs.ego0, scs.obstacles)
        _ = float(jnp.sum(sq))  # forced synchronization
        best = min(best, time.perf_counter() - t0)

    cycles = batch * cfg.loop.n_plans
    value = cycles / best
    print(
        json.dumps(
            {
                "metric": "em_plan_control_cycles_per_sec",
                "value": round(value, 1),
                "unit": f"cycles/s aggregate (batch={batch}, 1 chip)",
                "vs_baseline": round(value / 10.0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
