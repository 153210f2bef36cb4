"""Headline benchmark: aggregate EM plan-control-step cycles/sec.

One "cycle" = one full EM replan (reference line -> S-L DP -> corridor ->
piecewise-jerk QP -> Cartesian target path) plus ``plan_every`` LQR+PID
control ticks stepping the bicycle plant — the unit the reference performs
at an intended 10 Hz for a single ego (BASELINE.md).

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

    from emplanner_carla_tpu.config import EMConfig
    from emplanner_carla_tpu.sim import closed_loop, scenario

    cfg = EMConfig()
    batch = 1024
    scs = scenario.batch_scenarios(jax.random.PRNGKey(1), batch, cfg)
    sim = jax.jit(
        jax.vmap(lambda gp, e, o: closed_loop.simulate(gp, e, o, cfg))
    )

    # compile + correctness sanity
    carry, metrics = sim(scs.global_path, scs.ego0, scs.obstacles)
    jax.block_until_ready(carry)
    assert bool(jax.numpy.all(jax.numpy.isfinite(metrics.lateral_err)))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = sim(scs.global_path, scs.ego0, scs.obstacles)
        jax.block_until_ready(out)
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
