"""Measure the reference kinematic-stage cost on CPU (BASELINE config #3).

Times the reference's own hot path (imported from /root/reference, which is
CPU-only by design) on a synthetic 100-frame combined-skeleton sequence:

  1. 200-iteration JacobianInverseKinematicsCK init
     (optimize_trajectory.py:611-617)
  2. scipy least_squares with the reference's fun_anim_for_projection and
     hand-built sparse Jacobian, max_nfev=50, tr_solver='lsmr', x2 stages
     (optimize_trajectory.py:659-670, 779-789)

This is the measured denominator for bench.py's kinematic_seq_per_hour
vs_baseline. Run once, record the number in BASELINE.md; bench.py carries it
as REF_KINEMATIC_SEC_PER_SEQ (override with CHD_REF_KIN_SEC).
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
for p in [
    "/root/reference/src/optimize",
    "/root/reference/src/skeleton_fitting/ik",
    "/root/reference/src/utils",
    "/root/reference/src",
]:
    sys.path.append(p)

F = int(os.environ.get("REF_KIN_FRAMES", "100"))
SKEL_BVH = "/root/reference/src/skeleton_fitting/combined_body_25.bvh"


def main():
    import jax.numpy as jnp
    from scipy.optimize import least_squares

    # numpy>=2 removed numpy.core.umath_tests; shim for the oracle import
    import types
    if "numpy.core.umath_tests" not in sys.modules:
        shim = types.ModuleType("numpy.core.umath_tests")
        shim.matrix_multiply = np.matmul
        sys.modules["numpy.core.umath_tests"] = shim

    import Animation as RefAnim
    import optimize_trajectory as ref_traj
    from InverseKinematics import JacobianInverseKinematicsCK
    from Quaternions import Quaternions as RefQ

    from chd_tpu.characters import defs
    from chd_tpu.core import bvh
    from chd_tpu.kinematics import trajectory as traj_lib
    from chd_tpu.kinematics.residuals import data_order_positions

    rng = np.random.default_rng(0)
    anim, names, _ = bvh.load(SKEL_BVH)
    J = anim.num_joints

    # plausible smooth motion → 3D/2D evidence (same generator as bench.py)
    e0 = rng.uniform(-0.2, 0.2, size=(J, 3))
    e1 = e0 + rng.uniform(-0.15, 0.15, size=(J, 3))
    t = np.linspace(0, 1, F)[:, None, None]
    es = (1 - t) * e0[None] + t * e1[None]
    root = np.stack(
        [np.linspace(0, 15, F), np.full(F, -95.0), np.linspace(380, 395, F)], axis=1
    )
    x = np.concatenate([root, es.reshape(F, -1)], axis=1)
    y, r = data_order_positions(
        jnp.asarray(x, jnp.float32).reshape(F, -1),
        jnp.asarray(anim.offsets, jnp.float32), anim.parents,
    )
    pose3d = np.array(y, np.float64)
    pose3d[:, defs.COMBINED_ROOT_IDX] = 0.0
    world = np.array(y + r[:, None], np.float64)
    world[:, defs.COMBINED_ROOT_IDX] = np.asarray(r)
    pose2d_norm = world[..., :2] / world[..., 2:3]
    conf = np.ones((F, 28))
    conf[:, 25:] = 0.0
    proj_w, data_w = traj_lib.build_weights(conf)
    vc = traj_lib.contacts_to_vel_constraints(np.ones((F, 4), int)).astype(float)
    normal = np.array([0.0, -1.0, 0.0])
    point = np.array([0.0, 95.0, 0.0])

    skel = RefAnim.Animation(
        RefQ(np.tile(np.array([1.0, 0, 0, 0]), (1, J, 1))),
        anim.offsets[None].copy(),
        RefQ(np.tile(np.array([1.0, 0, 0, 0]), (J, 1))),
        anim.offsets.copy(),
        np.asarray(anim.parents),
    )

    t0 = time.perf_counter()

    # --- 200-iter CK-IK init (optimize_trajectory.py:576-618) ---
    ik_anim = skel.copy()
    ik_anim.rotations = RefQ(np.tile(np.array([1.0, 0, 0, 0]), (F, J, 1)))
    ik_anim.positions = np.broadcast_to(anim.offsets[None], (F, J, 3)).copy()
    ik_anim.positions[:, 0] = root
    targets = world.copy()
    spine = set(int(s) for s in defs.COMBINED_SKEL_SPINE_JOINTS)
    targetmap = {
        j: targets[:, defs.COMBINED_SKEL_TO_DATA[j]]
        for j in range(J) if j not in spine
    }
    ik = JacobianInverseKinematicsCK(
        ik_anim, targetmap, translate=False, iterations=200, smoothness=0.0,
        damping=7, silent=True,
    )
    ik()
    t_ik = time.perf_counter() - t0
    print(f"ik_200it_sec={t_ik:.1f}", flush=True)

    # --- 2-stage sparse-Jacobian least_squares (reference budget) ---
    x0 = np.concatenate(
        [root, np.degrees(-es.reshape(F, -1)) * 0.0 + rng.normal(0, 5, (F, J * 3))],
        axis=1,
    ).reshape(-1)
    stage_w = [
        (1000.0, 0.1, 0.5, 0.3, 10.0, 0.0),   # :630-635
        (1000.0, 0.1, 0.5, 0.3, 10.0, 10.0),  # :773-778
    ]
    t1 = time.perf_counter()
    for pw, swv, swa, dw, vw, fw in stage_w:
        sol = least_squares(
            ref_traj.fun_anim_for_projection, x0, max_nfev=50, verbose=0,
            jac=ref_traj.jac_anim_for_projection_sparse, gtol=1e-12,
            bounds=[-np.inf, np.inf], tr_solver="lsmr",
            args=(skel, pose3d, root, pose2d_norm, normal, point,
                  proj_w, data_w, np.arange(28), np.arange(28),
                  np.asarray(defs.COMBINED_SMOOTH_WEIGHTS), vc,
                  pw, swv, swa, dw, vw, fw),
        )
        x0 = sol.x
        print(f"stage done at {time.perf_counter() - t1:.1f}s "
              f"(nfev={sol.nfev})", flush=True)
    t_ls = time.perf_counter() - t1

    total = time.perf_counter() - t0
    print(json.dumps({
        "frames": F,
        "ik_200it_sec": round(t_ik, 2),
        "least_squares_2x50_sec": round(t_ls, 2),
        "total_sec_per_seq": round(total, 2),
        "seq_per_hour": round(3600.0 / total, 2),
    }))


if __name__ == "__main__":
    main()
