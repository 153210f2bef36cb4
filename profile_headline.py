"""Utilization artifact for the headline config (BASELINE config 5).

Answers "what is the full-EM cycle actually bound by" with measurements
instead of knob ablations (round-3 verdict item 6):

1. XLA cost analysis of the compiled headline program — FLOPs + bytes the
   XLA side touches (Pallas custom calls are opaque to it);
2. wall-time roofline placement: achieved FLOP/s vs the v5e MXU peak and
   achieved bytes/s vs HBM bandwidth;
3. a `jax.profiler` device trace (works through the axon tunnel),
   aggregated per op — the per-cycle attribution table published in
   BASELINE.md.

Run: `python profile_headline.py` (real TPU). Writes the raw trace to
/tmp/emplanner_trace and prints JSON lines + the per-op table.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/emplanner_tpu_cache")

PEAK_BF16 = 197e12   # v5e MXU peak (bf16 FLOP/s)
HBM_BW = 819e9       # v5e HBM bandwidth (bytes/s)


def main():
    from emplanner_carla_tpu.config import EMConfig
    from emplanner_carla_tpu.sim import closed_loop, scenario

    cfg = EMConfig()
    batch = 4096
    scs = scenario.batch_scenarios(jax.random.PRNGKey(1), batch, cfg)

    def run(gp, e, o):
        carry, metrics = closed_loop.simulate_full(gp, e, o, cfg)
        return jnp.sum(metrics.lateral_err ** 2)

    sim = jax.jit(jax.vmap(run))
    compiled = sim.lower(scs.global_path, scs.ego0, scs.obstacles).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    bytes_acc = float(ca.get("bytes accessed", float("nan")))

    out = sim(scs.global_path, scs.ego0, scs.obstacles)
    _ = float(jnp.sum(out))  # warm + fence
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = sim(scs.global_path, scs.ego0, scs.obstacles)
        _ = float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)

    print(json.dumps({
        "wall_s": round(best, 4),
        "cycles_per_s": round(batch * cfg.loop.n_plans / best, 1),
        "xla_visible_GFLOP": round(flops / 1e9, 2),
        "xla_visible_GB": round(bytes_acc / 2 ** 30, 2),
        "achieved_GBps": round(bytes_acc / best / 2 ** 30, 1),
        "mfu_vs_bf16_peak_pct": round(flops / best / PEAK_BF16 * 100, 3),
        "hbm_util_pct": round(bytes_acc / best / HBM_BW * 100, 2),
    }))

    with jax.profiler.trace("/tmp/emplanner_trace"):
        out = sim(scs.global_path, scs.ego0, scs.obstacles)
        _ = float(jnp.sum(out))

    # newest trace.json.gz under the trace dir
    paths = sorted(glob.glob(
        "/tmp/emplanner_trace/plugins/profile/*/*.trace.json.gz"
    ))
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])
    pid_names = {
        e.get("pid"): e.get("args", {}).get("name", "")
        for e in ev if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg: collections.Counter = collections.Counter()
    total_dev = 0.0
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        proc = pid_names.get(e["pid"], "")
        if not str(proc).startswith("/device"):
            continue
        name = e["name"]
        if name.startswith("jit_") or name.startswith("while."):
            # the outer program / outer scan envelope double-counts its body
            if name.startswith("jit_"):
                total_dev = max(total_dev, e["dur"])
            continue
        agg[name] += e["dur"]
    n_cycles = cfg.loop.n_plans
    print(f"\nper-op device time (headline, {n_cycles} cycles, batch {batch}):")
    print(f"{'op':44} {'ms/cycle':>9} {'% device':>9}")
    shown = 0.0
    for name, dur in agg.most_common(14):
        ms = dur / 1e3 / n_cycles
        shown += dur
        print(f"{name[:44]:44} {ms:9.3f} {dur / total_dev * 100:8.1f}%")
    rest = max(total_dev * 0.0, sum(agg.values()) - shown)
    print(f"{'(remaining fused ops)':44} "
          f"{rest / 1e3 / n_cycles:9.3f} {rest / total_dev * 100:8.1f}%")
    print(f"{'TOTAL device':44} "
          f"{total_dev / 1e3 / n_cycles:9.3f} {'100.0':>8}%")


if __name__ == "__main__":
    main()
