"""Sweep the physics inner-solver budgets on the real TPU (VERDICT r4 #2).

The staged solve's wall time is ~linear in max_iters × cg_iters (every CG
iteration is one linearized-tangent + one transpose pass through the
residual graph, sequential on device), but the budgets (30 LM × 60 CG,
SolveConfig defaults) were never swept: if smaller budgets still converge —
durations_ok at the bench acceptance rate, dynamics violation at the
scoreboard floor — throughput improves proportionally for free.

Per (max_iters, cg_iters) combo this emits one JSON line with steady-state
throughput AND the convergence evidence (durations_ok, max dyn violation,
stage-2 DYN_H cost) so a faster config only counts if it still solves the
problem. The reference's analog knobs are IPOPT's per-stage max_iter
budgets (towr_phys_optim/phys_optim.cpp:571-652).

Run: python benchmarks/phys_solver_sweep.py [maxit:cgit ...]
     (default sweep: 30:60 25:50 20:50 20:40 15:40 15:30)
Env: SWEEP_BATCH (default 32), SWEEP_FRAMES (default 100).
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

B = int(os.environ.get("SWEEP_BATCH", "32"))
F = int(os.environ.get("SWEEP_FRAMES", "100"))

DEFAULT_COMBOS = ["30:60", "25:50", "20:50", "20:40", "15:40", "15:30"]


def main():
    combos = sys.argv[1:] or DEFAULT_COMBOS
    import jax
    import jax.numpy as jnp

    from chd_tpu.kinematics.lm import LMConfig
    from chd_tpu.parallel import batch as batch_lib
    from chd_tpu.physics import collocation
    from chd_tpu.physics.synth import walking_input
    from chd_tpu.physics.types import PhysWeights

    inputs = [walking_input(F, seed=i) for i in range(B)]
    batched, _ = batch_lib.pad_phys_inputs(inputs)
    weights = PhysWeights()
    base_cfg = collocation.SolveConfig()

    dyn_cost = collocation.dyn_cost_for(weights)

    def solve(cfg):
        rf, rd = batch_lib.solve_physics_batch(batched, weights, cfg)
        res, stats, ok = batch_lib.solve_physics_durations_batch(
            batched, rd, weights, cfg)
        jax.block_until_ready(res.base_lin)
        return rd, res, stats, ok

    @jax.jit
    def dynh_cost(rd_x):
        def one(x, p):
            r = collocation.cost_residuals(x, p, dyn_cost)
            return 0.5 * jnp.vdot(r, r)
        return jax.vmap(one)(rd_x, batched)

    for combo in combos:
        mi, cg = (int(v) for v in combo.split(":"))
        cfg = dataclasses.replace(
            base_cfg, lm=dataclasses.replace(base_cfg.lm, max_iters=mi,
                                             cg_iters=cg))
        rec = {"max_iters": mi, "cg_iters": cg, "batch": B, "frames": F}
        try:
            t0 = time.perf_counter()
            out = solve(cfg)
            rec["first_call_s"] = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            rd, res, stats, ok = solve(cfg)
            dt = time.perf_counter() - t0
            rec["steady_s"] = round(dt, 2)
            rec["seq_per_hour"] = round(B / dt * 3600.0, 1)
            rec["durations_ok"] = f"{int(np.sum(ok))}/{B}"
            rec["max_dyn"] = round(float(np.max(np.asarray(stats["dyn"]))), 4)
            rec["max_terrain"] = round(
                float(np.max(np.asarray(stats["terrain"]))), 5)
            # solution quality beyond feasibility: the stage-2 data cost —
            # a cheaper budget that converges to a worse optimum shows here
            x_rd = jax.vmap(collocation.join_vars)(
                rd.base_lin, rd.base_ang, rd.ee_pos, rd.ee_force)
            costs = np.asarray(dynh_cost(x_rd))
            rec["dynh_cost_mean"] = round(float(costs.mean()), 2)
            rec["dynh_cost_max"] = round(float(costs.max()), 2)
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {e}"[:400]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
