"""Sweep the kinematic LM budgets on the real TPU (round 5).

The physics budget ladder showed the staged solver's former 30:60 LM budget
was over-provisioned (25:50 quality-identical, BASELINE.md). This asks the
same measured question for the kinematic stage's 50:100 default
(kinematics/batch.optimize_trajectory_batch, mirroring the reference's
max_nfev=50 × 2 stages, optimize_trajectory.py:614,785): per budget, report
throughput AND solution quality = the mean stage-2 objective over the batch
(the same objective the trajectory golden's dominance check scores).

Run: python benchmarks/kin_budget_sweep.py [maxit:cgit ...]
     (default: 50:100 40:80 30:60 25:50)
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

B = int(os.environ.get("SWEEP_BATCH", "16"))
F = int(os.environ.get("SWEEP_FRAMES", "100"))


def build_problems(skel):
    import jax.numpy as jnp

    from chd_tpu.characters import defs
    from chd_tpu.kinematics import trajectory as traj_lib
    from chd_tpu.kinematics.residuals import data_order_positions

    J = skel.num_joints
    rng = np.random.default_rng(0)
    problems = []
    for i in range(B):
        e0 = rng.uniform(-0.2, 0.2, size=(J, 3))
        e1 = e0 + rng.uniform(-0.15, 0.15, size=(J, 3))
        t = np.linspace(0, 1, F)[:, None, None]
        es = (1 - t) * e0[None] + t * e1[None]
        root = np.stack(
            [np.linspace(0, 15, F), np.full(F, -95.0), np.linspace(380, 395, F)],
            axis=1)
        x = np.concatenate([root, es.reshape(F, -1)], axis=1)
        y, r = data_order_positions(
            jnp.asarray(x, jnp.float32).reshape(F, -1),
            jnp.asarray(skel.offsets, jnp.float32), skel.parents)
        pose3d = np.array(y)
        pose3d[:, defs.COMBINED_ROOT_IDX] = 0.0
        world = np.array(y + r[:, None])
        world[:, defs.COMBINED_ROOT_IDX] = np.asarray(r)
        fx, fy = defs.MTC_FOCAL
        cx, cy = defs.MTC_PP
        pose2d = np.stack(
            [fx * world[..., 0] / world[..., 2] + cx,
             fy * world[..., 1] / world[..., 2] + cy], axis=-1)
        conf = np.ones((F, 28))
        conf[:, 25:] = 0
        vc = traj_lib.contacts_to_vel_constraints(
            (rng.uniform(size=(F, 4)) > 0.5).astype(int))
        problems.append(dict(
            pose2d=pose2d, conf2d=conf, pose3d=pose3d, root_pos=root,
            smpl_angles=-es, vel_constraints=vc))
    return problems


def main():
    combos = sys.argv[1:] or ["50:100", "40:80", "30:60", "25:50"]
    import jax
    import jax.numpy as jnp

    from chd_tpu.characters import defs
    from chd_tpu.core import bvh
    from chd_tpu.kinematics import batch as kbatch
    from chd_tpu.kinematics import trajectory as traj_lib
    from chd_tpu.kinematics.lm import LMConfig
    from chd_tpu.kinematics.residuals import TrajectoryData, residual_fn_for

    skel_bvh = "/root/reference/src/skeleton_fitting/combined_body_25.bvh"
    if not os.path.exists(skel_bvh):
        skel_bvh = os.path.join(REPO, "tests", "fixtures", "combined_body_25.bvh")
    skel, names, _ = bvh.load(skel_bvh)
    problems = build_problems(skel)
    parents = tuple(skel.parents)

    # stage-2 objective scorer on the solved batch (same construction as
    # bench.py's flop accounting; each solution scored on its own floor)
    arrs, Fb = kbatch.prepare_batch_arrays(problems, skel)
    residual = residual_fn_for(parents)
    dtype = arrs["pose3d"].dtype

    @jax.jit
    def stage2_costs(x_b, normals, points, vc2):
        data = TrajectoryData(
            arrs["pose3d"], arrs["root"], arrs["p2dn"], arrs["pw"], arrs["dw"],
            jnp.broadcast_to(
                jnp.asarray(defs.COMBINED_SMOOTH_WEIGHTS, dtype), (B, 28)),
            vc2, normals, points, arrs["offsets"], arrs["fmask"],
        )

        def one(x, d):
            r = residual(x, d, traj_lib.STAGE2)
            return 0.5 * jnp.vdot(r, r)

        return jax.vmap(one)(x_b, data)  # every data leaf is batched on 0

    for combo in combos:
        mi, cg = (int(v) for v in combo.split(":"))
        cfg = LMConfig(max_iters=mi, cg_iters=cg)
        rec = {"max_iters": mi, "cg_iters": cg, "batch": B, "frames": F}
        try:
            def run():
                return kbatch._refine_core(
                    arrs, traj_lib.STAGE1, traj_lib.STAGE2, parents=parents,
                    ik_cfg=kbatch.IKConfig(iterations=200, damping=7.0,
                                           solver="cg"),
                    lm_cfg=cfg)

            t0 = time.perf_counter()
            out = jax.block_until_ready(run())
            rec["first_call_s"] = round(time.perf_counter() - t0, 1)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = jax.block_until_ready(run())
                ts.append(round(time.perf_counter() - t0, 2))
            x2, normals, points, vc2 = out[0], out[1], out[2], out[3]
            med = float(np.median(ts))
            costs = np.asarray(stage2_costs(x2, normals, points, vc2))
            rec["steady_s"] = ts
            rec["seq_per_hour_med"] = round(B / med * 3600.0, 1)
            rec["stage2_cost_mean"] = round(float(costs.mean()), 2)
            rec["stage2_cost_max"] = round(float(costs.max()), 2)
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {e}"[:400]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
