"""One-time generator for frozen reference-oracle golden fixtures.

Runs the ACTUAL reference code (imported from /root/reference) on
deterministic synthetic inputs and freezes inputs+outputs into
tests/fixtures/, so parity coverage survives even if the reference mount or
its imports break, and so a full-pipeline artifact comparison runs in the
fast test tier (tests/test_goldens.py) with no reference dependency.

Goldens produced:
  contact_golden.npz   — 2 synthetic video dirs driven through the
                         reference's RealVideoDataset + OpenPoseModel
                         (torch seed 0) + test.py full-video vote pipeline;
                         stores raw per-video keypoints, the torch
                         state_dict, and the reference foot_contacts.npy
                         outputs (src/contact_learning/test.py:221-322).
  prepare_input/       — reference towr_utils.prepare_input text artifacts
                         (skel/motion/terrain/contact_info.txt) for
                         ybot / combined / ybot+combined-contacts, plus the
                         input motion BVH, floor, contacts
                         (src/utils/towr_utils.py:451-777).
  ck_ik_golden.npz     — reference JacobianInverseKinematicsCK result
                         (30 iters, translate+smoothness+nullspace) on a
                         fixed problem (ik/InverseKinematics.py:326-576).

Usage: python tests/fixtures/generate_goldens.py   (requires /root/reference)
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import types

import numpy as np

FIXTURES = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(FIXTURES))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

REF = "/root/reference"
for p in [
    f"{REF}/src/contact_learning",
    f"{REF}/src/optimize",
    f"{REF}/src/skeleton_fitting/ik",
    f"{REF}/src/utils",
    f"{REF}/src",
]:
    sys.path.append(p)

# numpy>=2 shim for the reference ik library
if "numpy.core.umath_tests" not in sys.modules:
    shim = types.ModuleType("numpy.core.umath_tests")
    shim.matrix_multiply = np.matmul
    sys.modules["numpy.core.umath_tests"] = shim

# the reference imports skimage only for optional frame-image loading, which
# these goldens never exercise; stub it so the import succeeds
for name in ("skimage", "skimage.io", "skimage.transform",
              "torchvision", "torchvision.transforms", "torchvision.utils"):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
sys.modules["skimage"].io = sys.modules["skimage.io"]
sys.modules["skimage"].transform = sys.modules["skimage.transform"]
sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]

# numpy>=2 removed the deprecated builtin aliases the reference still uses
np.int = int      # test.py:107
np.float = float
np.bool = bool


def synth_keypoints(F, seed, dims=(1920, 1080)):
    """Plausible raw OpenPose keypoints: smooth joint tracks + noise +
    low-confidence dropouts (what the gap-fill handles)."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 4 * np.pi, F)[:, None]
    base_x = rng.uniform(0.3, 0.7, 25)[None] * dims[0]
    base_y = rng.uniform(0.2, 0.8, 25)[None] * dims[1]
    kp = np.zeros((F, 25, 3))
    kp[..., 0] = base_x + 60 * np.sin(t + rng.uniform(0, np.pi, 25)[None])
    kp[..., 1] = base_y + 40 * np.cos(0.7 * t + rng.uniform(0, np.pi, 25)[None])
    kp[..., 2] = rng.uniform(0.3, 1.0, (F, 25))
    drop = rng.uniform(size=(F, 25)) < 0.06
    kp[..., 2][drop] = 0.05
    kp[0, :, 2] = np.maximum(kp[0, :, 2], 0.5)   # confident first/last frame
    kp[-1, :, 2] = np.maximum(kp[-1, :, 2], 0.5)
    return kp


def write_video_dir(root, name, kp):
    vd = os.path.join(root, name)
    opd = os.path.join(vd, "openpose_result")
    os.makedirs(opd, exist_ok=True)
    for f in range(kp.shape[0]):
        payload = {"people": [{"pose_keypoints_2d": kp[f].reshape(-1).tolist()}]}
        with open(os.path.join(opd, f"frame_{f:06d}_keypoints.json"), "w") as fh:
            json.dump(payload, fh)
    return vd


def gen_contact_golden():
    import torch

    from models.openpose_only import OpenPoseModel  # reference
    import test as ref_test  # reference src/contact_learning/test.py

    torch.manual_seed(0)
    model = OpenPoseModel(9, 13, 5, 3)  # lower joint set: 13 joints
    model.eval()

    kps = [synth_keypoints(140, seed=1), synth_keypoints(120, seed=2)]
    tmp = tempfile.mkdtemp()
    try:
        data_root = os.path.join(tmp, "videos")
        os.makedirs(data_root)
        for i, kp in enumerate(kps):
            write_video_dir(data_root, f"vid{i}", kp)
        out_dir = os.path.join(tmp, "out")
        flags = argparse.Namespace(
            data=data_root, out=out_dir, window_size=9, pred_size=5,
            batch_size=32, viz=False, classify_thresh=0.5, full_vid_eval=True,
            use_real_data=True, use_confidence=True, joint_set="lower",
            save_contacts=True, cpu=True,
        )
        ref_test.test(flags, op_model=model)
        contacts = [
            np.load(os.path.join(out_dir, "contact_results", f"vid{i}", "foot_contacts.npy"))
            for i in range(len(kps))
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # keys are already "model.<idx>.<param>" (the Sequential attr is .model)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()
          if "num_batches" not in k}
    out = {}
    for i, (kp, c) in enumerate(zip(kps, contacts)):
        out[f"keypoints_{i}"] = kp.astype(np.float32)
        out[f"contacts_{i}"] = c
    for k, v in sd.items():
        out[f"sd.{k}"] = v
    np.savez_compressed(os.path.join(FIXTURES, "contact_golden.npz"), **out)
    print("contact_golden.npz:", [c.shape for c in contacts],
          "positives:", [int(c.sum()) for c in contacts])


def gen_prepare_input_goldens():
    import jax.numpy as jnp

    import towr_utils as ref_towr  # reference

    from chd_tpu.core import bvh, quat

    skels = {
        "ybot": f"{REF}/src/skeleton_fitting/ybot.bvh",
        "combined": f"{REF}/src/skeleton_fitting/combined_body_25.bvh",
    }
    configs = [
        ("ybot", False), ("combined", False), ("ybot", True),
    ]
    rng = np.random.default_rng(6)
    for character, combined_contacts in configs:
        anim, names, ft = bvh.load(skels[character])
        J, F = anim.num_joints, 12
        es = rng.uniform(-0.15, 0.15, size=(F, J, 3))
        rot = np.asarray(quat.from_euler(jnp.asarray(es), "xyz", world=True))
        pos = np.broadcast_to(np.asarray(anim.offsets)[None], (F, J, 3)).copy()
        pos[:, 0] = np.stack(
            [np.linspace(0, 15, F), np.full(F, -95.0), np.linspace(0, 8, F)], axis=1
        )
        src = anim.replace(rotations=rot, positions=pos)

        tag = f"{character}{'_cc' if combined_contacts else ''}"
        cdir = os.path.join(FIXTURES, "prepare_input", tag)
        os.makedirs(cdir, exist_ok=True)
        bvh_path = os.path.join(cdir, "motion.bvh")
        bvh.save(bvh_path, src, names)
        floor_path = os.path.join(cdir, "floor_out.txt")
        with open(floor_path, "w") as f:
            f.write("0.01 -0.99 0.02\n1.0 95.0 2.0")
        contacts = (rng.uniform(size=(F, 4)) > 0.4).astype(int)
        contacts[0] = [1, 1, 1, 1]
        np.save(os.path.join(cdir, "foot_contacts.npy"), contacts)

        ref_out = os.path.join(cdir, "ref_out")
        os.makedirs(ref_out, exist_ok=True)
        ref_towr.prepare_input(
            bvh_path, floor_path, os.path.join(cdir, "foot_contacts.npy"),
            ref_out, character, start_idx=0, end_idx=F, dt=1.0 / 30.0,
            combined_contacts=combined_contacts,
        )
        print("prepare_input golden:", tag)


def gen_ck_ik_golden():
    import jax.numpy as jnp

    import Animation as RefAnim
    from InverseKinematics import JacobianInverseKinematicsCK
    from Quaternions import Quaternions as RefQ

    from chd_tpu.core import bvh, quat

    anim, names, _ = bvh.load(f"{REF}/src/skeleton_fitting/combined_body_25.bvh")
    J, F = anim.num_joints, 10
    rng = np.random.default_rng(11)

    # Meter-scale skeleton: at raw cm scale the damped normal matrix
    # (J Jᵀ + λ²I, λ=7) is dominated by J Jᵀ and near-singular for the
    # redundant combined skeleton, so LU pivoting-order differences pick
    # different near-null-space solutions — both "correct", not comparable
    # element-wise (measured: 1e-2 euler drift at cm scale vs 1e-6 at m
    # scale for identical geometry). The golden freezes the regime where
    # the reference solve is well-conditioned and parity is meaningful.
    scale = 0.01
    offsets = anim.offsets * scale
    es_init = rng.uniform(-0.2, 0.2, size=(F, J, 3))
    init_rot = np.asarray(quat.from_euler(jnp.asarray(es_init), "xyz", world=True))
    init_pos = np.broadcast_to(offsets[None], (F, J, 3)).copy()
    init_pos[:, 0] = rng.normal(0, 5 * scale, (F, 3)) + np.array([0, -0.95, 0])
    refs = rng.uniform(-0.3, 0.3, size=(F, J, 3))

    ik_anim = RefAnim.Animation(
        RefQ(init_rot.copy()), init_pos.copy(),
        RefQ(np.tile(np.array([1.0, 0, 0, 0]), (J, 1))),
        offsets.copy(), np.asarray(anim.parents),
    )
    gp = RefAnim.positions_global(ik_anim)
    targets = gp + rng.normal(0, 3.0 * scale, gp.shape)
    tidx = [0, 4, 7, 11, 14, 17, 19, 21, 22, 24]
    targetmap = {j: targets[:, j].copy() for j in tidx}

    ik = JacobianInverseKinematicsCK(
        ik_anim, targetmap, references=refs.reshape(F, -1).copy(),
        translate=True, iterations=30, smoothness=1e-3,
        damping=7.0, secondary=0.25, silent=True,
    )
    ik()

    np.savez_compressed(
        os.path.join(FIXTURES, "ck_ik_golden.npz"),
        offsets=offsets, parents=np.asarray(anim.parents),
        init_rotations=init_rot, init_positions=init_pos,
        references=refs, targets=targets, target_idx=np.asarray(tidx),
        out_euler=np.asarray(ik_anim.rotations.euler()),
        out_positions=np.asarray(ik_anim.positions),
    )
    print("ck_ik_golden.npz")


def gen_trajectory_golden():
    """Whole-solution golden for the full kinematic stage: the reference's
    optimize_trajectory (200-iter CK-IK init, stage-1 LM, Huber floor fit +
    contact pruning, stage-2 LM — optimize_trajectory.py:522-833) run ONCE
    on deterministic synthetic evidence, inputs and final solution frozen.
    Closes the gap between "same residuals" (test_trajectory.py) and "same
    optimum"."""
    import jax.numpy as jnp

    # numpy>=1.24 removed the np.float alias the reference uses for the
    # no-given-floor branch (optimize_trajectory.py:533-534)
    if not hasattr(np, "float"):
        np.float = float

    import BVH as RefBVH
    import optimize_trajectory as ref_traj

    from chd_tpu.characters import defs
    from chd_tpu.core import bvh
    from chd_tpu.kinematics import trajectory as traj_lib
    from chd_tpu.kinematics.residuals import data_order_positions

    F = 16
    rng = np.random.default_rng(7)
    skel, names, _ = bvh.load(f"{REF}/src/skeleton_fitting/combined_body_25.bvh")
    J = skel.num_joints

    # smooth ground-truth motion → rendered 3D/2D evidence (cm units, the
    # combined-skeleton scale) — same generator family as the e2e test
    e0 = rng.uniform(-0.2, 0.2, size=(J, 3))
    e1 = e0 + rng.uniform(-0.15, 0.15, size=(J, 3))
    t = np.linspace(0, 1, F)[:, None, None]
    es_true = (1 - t) * e0[None] + t * e1[None]
    root_true = np.stack(
        [np.linspace(0, 12, F), np.full(F, -95.0), np.linspace(380, 390, F)],
        axis=1,
    )
    x_true = np.concatenate([root_true, es_true.reshape(F, -1)], axis=1)
    y, r = data_order_positions(
        jnp.asarray(x_true, jnp.float64).reshape(F, -1),
        jnp.asarray(skel.offsets, jnp.float64), skel.parents,
    )
    pose3d = np.array(y, np.float64)
    pose3d[:, defs.COMBINED_ROOT_IDX] = 0.0
    world = np.array(y + r[:, None], np.float64)
    world[:, defs.COMBINED_ROOT_IDX] = np.asarray(r)

    fx, fy = defs.MTC_FOCAL
    cx, cy = defs.MTC_PP
    pose2d = np.stack(
        [fx * world[..., 0] / world[..., 2] + cx,
         fy * world[..., 1] / world[..., 2] + cy], axis=-1,
    )
    conf = np.ones((F, 28))
    conf[:, 25:] = 0.0
    pose3d_noisy = pose3d + rng.normal(size=pose3d.shape) * 1.0
    pose3d_noisy[:, defs.COMBINED_ROOT_IDX] = 0.0

    fc = np.ones((F, 4), int)  # both feet planted (near-constant height)
    vel_constraints = traj_lib.contacts_to_vel_constraints(fc)
    smpl_angles = -es_true  # crude axis-angle-ish init; IK does the real work

    ref_skel, ref_names, _ = RefBVH.load(
        f"{REF}/src/skeleton_fitting/combined_body_25.bvh"
    )
    out_dir = tempfile.mkdtemp()
    anim, new_pose3d, proj2d, plane_n, plane_p, vc_out = ref_traj.optimize_trajectory(
        pose2d.copy(), conf.copy(), pose3d_noisy.copy(), root_true.copy(),
        smpl_angles.copy(), ref_skel, ref_names,
        cx, cy, np.array([fx, fy]), vel_constraints.copy().astype(float),
        save_dir=out_dir,
    )
    shutil.rmtree(out_dir, ignore_errors=True)

    np.savez_compressed(
        os.path.join(FIXTURES, "trajectory_golden.npz"),
        pose2d=pose2d, conf=conf, pose3d=pose3d_noisy, root=root_true,
        smpl_angles=smpl_angles, vel_constraints=vel_constraints,
        cam_focal=np.array([fx, fy]), cam_pp=np.array([cx, cy]),
        # template skeleton frozen so the test needs no reference mount
        skel_rotations=np.asarray(skel.rotations),
        skel_positions=np.asarray(skel.positions),
        skel_orients=np.asarray(skel.orients),
        skel_offsets=np.asarray(skel.offsets),
        skel_parents=np.asarray(skel.parents),
        out_euler=np.asarray(anim.rotations.euler()),
        out_root=np.asarray(anim.positions[:, 0]),
        out_pose3d=np.asarray(new_pose3d),
        out_proj2d=np.asarray(proj2d),
        out_plane_normal=np.asarray(plane_n),
        out_plane_point=np.asarray(plane_p),
        out_vel_constraints=np.asarray(vc_out),
    )
    print("trajectory_golden.npz")


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    gens = {
        "contact": gen_contact_golden,
        "prepare_input": gen_prepare_input_goldens,
        "ck_ik": gen_ck_ik_golden,
        "trajectory": gen_trajectory_golden,
    }
    for name, fn in gens.items():
        if only is None or name == only:
            fn()
