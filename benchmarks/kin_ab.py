"""A/B the batched kinematic LM inner solver on the live device:
matrix-free Jacobi-PCG (cg_iters sequential JVP+VJP passes) vs the exact
block-pentadiagonal direct solve (one batched band extraction + block-Thomas
scan per LM iteration). Prints wall times and result agreement.

CHD_KIN_AB_SOLVERS=pcg,banded (default) selects variants;
CHD_KIN_AB_BATCH / CHD_KIN_AB_FRAMES override the problem size.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

B = int(os.environ.get("CHD_KIN_AB_BATCH", "16"))
F = int(os.environ.get("CHD_KIN_AB_FRAMES", "100"))


def make_problems():
    import jax.numpy as jnp

    from chd_tpu.characters import defs
    from chd_tpu.core import bvh
    from chd_tpu.kinematics import trajectory as traj_lib
    from chd_tpu.kinematics.residuals import data_order_positions

    skel, names, _ = bvh.load(
        "/root/reference/src/skeleton_fitting/combined_body_25.bvh")
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
            jnp.asarray(skel.offsets, jnp.float32), tuple(skel.parents))
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
    return problems, skel


def main():
    from chd_tpu.kinematics import batch as kbatch

    problems, skel = make_problems()
    sel = os.environ.get("CHD_KIN_AB_SOLVERS", "pcg,banded").split(",")
    results = {}
    for solver in sel:
        t0 = time.perf_counter()
        res = kbatch.optimize_trajectory_batch(problems, skel, lm_solver=solver)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = kbatch.optimize_trajectory_batch(problems, skel, lm_solver=solver)
        dt = time.perf_counter() - t0
        results[solver] = (res, dt)
        print(f"{solver}: warm {dt:.2f}s ({B / dt * 3600:.0f} seq/hour), "
              f"first-call {t_compile:.1f}s", flush=True)

    if len(results) == 2 and "pcg" in results and "banded" in results:
        rp, rb = results["pcg"][0], results["banded"][0]
        dpos = max(
            float(np.abs(a.pose3d - b.pose3d).max()) for a, b in zip(rp, rb)
        )
        dn = max(
            float(np.abs(a.floor_normal - b.floor_normal).max())
            for a, b in zip(rp, rb)
        )
        print(f"agreement: max|d pose3d|={dpos:.3e} cm, max|d floor normal|={dn:.3e}")


if __name__ == "__main__":
    main()
