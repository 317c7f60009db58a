"""Diagnose the physics batch-size ceiling on the real TPU (VERDICT r2 #8).

Round 2 recorded "batch 64 exceeds the compile/memory budget" without
diagnosing WHICH budget. This sweep measures, per batch size:
  - compile time (first call) vs steady-state solve time (second call),
  - throughput (seq/hour) and convergence (durations_ok rate),
  - device HBM high-water mark (device.memory_stats), so the ceiling is
    attributed to XLA compile time on this 1-core host vs real HBM pressure.

Run: python benchmarks/phys_batch_sweep.py [B ...]   (default 16 32 64)
Emits one JSON line per batch size; a failed size emits {"error": ...}.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

F = int(os.environ.get("SWEEP_FRAMES", "100"))


def mem_stats(dev):
    try:
        s = dev.memory_stats() or {}
        return {
            "peak_gb": round(s.get("peak_bytes_in_use", 0) / 2**30, 3),
            "in_use_gb": round(s.get("bytes_in_use", 0) / 2**30, 3),
            "limit_gb": round(s.get("bytes_limit", 0) / 2**30, 3),
        }
    except Exception:
        return {}


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [16, 32, 64]
    import jax

    from chd_tpu.parallel import batch as batch_lib
    from chd_tpu.physics import collocation
    from chd_tpu.physics.synth import walking_input
    from chd_tpu.physics.types import PhysWeights

    dev = jax.devices()[0]
    weights, cfg = PhysWeights(), collocation.SolveConfig()

    for B in sizes:
        inputs = [walking_input(F, seed=i) for i in range(B)]
        batched, _ = batch_lib.pad_phys_inputs(inputs)

        def solve():
            rf, rd = batch_lib.solve_physics_batch(batched, weights, cfg)
            res, stats, ok = batch_lib.solve_physics_durations_batch(
                batched, rd, weights, cfg)
            jax.block_until_ready(res.base_lin)
            return res, stats, ok

        rec = {"batch": B, "frames": F}
        try:
            t0 = time.perf_counter()
            res, stats, ok = solve()
            rec["first_call_s"] = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            res, stats, ok = solve()
            dt = time.perf_counter() - t0
            rec["steady_s"] = round(dt, 2)
            rec["seq_per_hour"] = round(B / dt * 3600.0, 1)
            rec["durations_ok"] = f"{int(np.sum(ok))}/{B}"
            rec["max_dyn"] = round(float(np.max(np.asarray(stats["dyn"]))), 4)
            rec["mem"] = mem_stats(dev)
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {e}"[:500]
            rec["mem"] = mem_stats(dev)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
