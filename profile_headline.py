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
    wall_ms = best / n_cycles * 1e3
    print(f"{'(wall - device: tunnel dispatch + bubbles)':44} "
          f"{wall_ms - total_dev / 1e3 / n_cycles:9.3f}")

    # --- per-Pallas-kernel rooflines (round-4 verdict item 1b): hand-
    # counted work divided by trace-measured kernel time, against the
    # v5e peaks. Clock derived from the bf16 MXU peak: 197e12 / (4 MXUs
    # x 128x128 MACs x 2) = 1.50 GHz; VPU peak = 8 sublanes x 128 lanes
    # x 4 ALUs x 1.50 GHz = 6.1 Top/s (f32, FMA counted as one op). ---
    def kernel_ms(prefix):
        tot = sum(d for nm, d in agg.items() if nm.startswith(prefix))
        return tot / 1e3 / n_cycles

    VPU_PEAK = 4 * 8 * 128 * 1.5e9
    print("\nper-kernel rooflines (per cycle, batch %d):" % batch)

    # speed-DP kernel: k-sliced recursion = n_s slices x ~12 elementwise
    # ops over (n_s, B) per column x (n_t - 1) columns; liveness packing
    # leaves the obstacle slabs on ~1-2 of B/512 blocks (the residual
    # between measured time and the recursion count is the live-block
    # obstacle work + grid overhead)
    sdp = kernel_ms("speed_dp")
    n_s, n_t = cfg.speed.n_s, cfg.speed.n_t
    rec_ops = n_s * 12 * n_s * batch * (n_t - 1)
    print(f"  speed_dp  {sdp:6.3f} ms  recursion {rec_ops/1e9:.2f} Gop "
          f"-> {rec_ops/(sdp/1e3)/VPU_PEAK*100:5.1f}% of VPU peak "
          f"(+ packed obstacle slabs on live blocks)")

    # warm-QP kernels: 3 bf16x3 dots per ADMM iteration at the padded
    # MXU shapes (exact flop count; these are the kernels' only MXU work)
    from emplanner_carla_tpu.planner import path_qp as PQ
    from emplanner_carla_tpu.planner import speed_planner as SP

    def qp_roofline(tag, n_var, m, iters, t_ms):
        np_, mp_ = -(-n_var // 128) * 128, -(-m // 128) * 128
        fl = iters * 3 * batch * 2 * (np_ * np_ + 2 * np_ * mp_)
        pct = fl / (t_ms / 1e3) / PEAK_BF16 * 100 if t_ms else float("nan")
        print(f"  {tag:9} {t_ms:6.3f} ms  {fl/1e9:.1f} GFLOP "
              f"(n_pad {np_}, m_pad {mp_}, {iters} iters x 9 MXU passes) "
              f"-> {pct:5.1f}% of bf16 MXU peak")

    Ps, As, _ = SP._speed_qp_constants(cfg.speed)
    qp_roofline("speed_qp", Ps.shape[0], As.shape[0],
                cfg.speed.warm_admm_iters, kernel_ms("speed_qp"))
    out = PQ._qp_constants(cfg.path.n_qp, 4.0, cfg.path)
    qp_roofline("path_qp", out[0].shape[0], out[1].shape[0],
                cfg.path.warm_admm_iters, kernel_ms("path_qp"))

    # tick kernel: 100 serial ticks (MPC/LQR + actuator + plant + NPC
    # agents) — serial-depth bound, not a flops roofline
    tick = kernel_ms("closed_call")
    print(f"  tick      {tick:6.3f} ms  = {tick*1e3/cfg.loop.plan_every:.1f} "
          f"us/tick over {cfg.loop.plan_every} SERIAL ticks "
          f"(latency-bound: ~{tick*1.5e6/cfg.loop.plan_every:.0f} TensorCore "
          f"cycles of dependent work per tick)")


if __name__ == "__main__":
    main()
