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


if __name__ == "__main__":
    gen_contact_golden()
    gen_prepare_input_goldens()
    gen_ck_ik_golden()
