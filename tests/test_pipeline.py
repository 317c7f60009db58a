"""Full-pipeline test on a completely synthetic video directory.

Synthesizes all three upstream inputs the reference expects (OpenPose JSON
dir, MTC tracked_results.json, foot_contacts.npy) from a ground-truth
combined-skeleton motion, then runs kinematic → retarget → physics and
checks the full artifact tree appears and is self-consistent.
"""
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from chd_tpu.characters import defs
from chd_tpu.core import bvh, quat
from chd_tpu.kinematics.residuals import data_order_positions
from chd_tpu.pipeline.run import run_kinematic_stage, run_physics_stage, run_retarget_stage
from chd_tpu.utils.config import PipelineConfig

SKEL_BVH = "/root/reference/src/skeleton_fitting/combined_body_25.bvh"
YBOT_BVH = "/root/reference/src/skeleton_fitting/ybot.bvh"


def synthesize_video_dir(tmp_path, F=12):
    rng = np.random.default_rng(9)
    vd = tmp_path / "dance_synth"
    os.makedirs(vd)

    skel, names, _ = bvh.load(SKEL_BVH)
    J = skel.num_joints

    e0 = rng.uniform(-0.2, 0.2, size=(J, 3))
    e1 = e0 + rng.uniform(-0.15, 0.15, size=(J, 3))
    t = np.linspace(0, 1, F)[:, None, None]
    es = (1 - t) * e0[None] + t * e1[None]
    root = np.stack(
        [np.linspace(0, 20, F), np.full(F, -95.0), np.linspace(380, 400, F)], axis=1
    )
    x = np.concatenate([root, es.reshape(F, -1)], axis=1)
    y, r = data_order_positions(
        jnp.asarray(x, jnp.float32).reshape(F, -1), jnp.asarray(skel.offsets, jnp.float32),
        skel.parents,
    )
    pose3d = np.array(y)  # root-relative, data order
    pose3d[:, defs.COMBINED_ROOT_IDX] = 0.0
    world = np.array(y + r[:, None])
    world[:, defs.COMBINED_ROOT_IDX] = np.asarray(r)

    # OpenPose JSON (pixels)
    fx, fy = defs.MTC_FOCAL
    cx, cy = defs.MTC_PP
    px = fx * world[..., 0] / world[..., 2] + cx
    py = fy * world[..., 1] / world[..., 2] + cy
    op_dir = vd / "openpose_result"
    os.makedirs(op_dir)
    for f in range(F):
        kp = np.stack([px[f, :25], py[f, :25], np.ones(25)], axis=1)
        json.dump(
            {"people": [{"pose_keypoints_2d": kp.reshape(-1).tolist()}]},
            open(op_dir / f"{f:06d}_keypoints.json", "w"),
        )

    # MTC tracked_results.json: body25 = data joints 0..24; SMPL joints only
    # matter at the spine indices; angles seed the IK (crude is fine)
    smpl3d = np.zeros((F, 22, 3))
    smpl3d[:, np.asarray(defs.SMPL_SPINE_JOINTS)] = pose3d[:, 25:]
    smpl_angles = np.zeros((F, 22, 3))
    frames = []
    for f in range(F):
        frames.append(
            {
                "trans": dict(zip("xyz", map(float, r[f]))),
                "joints": [
                    {"pos": dict(zip("xyz", map(float, pose3d[f, j])))} for j in range(25)
                ],
                "SMPLJoints": [
                    {
                        "pos": dict(zip("xyz", map(float, smpl3d[f, j]))),
                        "rot": dict(zip("xyz", map(float, smpl_angles[f, j]))),
                    }
                    for j in range(22)
                ],
                "bodyCoeffs": [0.0] * 30,
                "faceCoeffs": [0.0] * 200,
            }
        )
    json.dump({"totalcapResults": frames}, open(vd / "tracked_results.json", "w"))

    np.save(vd / "foot_contacts.npy", np.ones((F, 4), dtype=int))
    return str(vd)


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(
        character="ybot",
        kinematic=__import__("chd_tpu.utils.config", fromlist=["KinematicConfig"]).KinematicConfig(
            skel_path=SKEL_BVH, ik_iterations=20, lm_iters=8, cg_iters=30
        ),
        physics=__import__("chd_tpu.utils.config", fromlist=["PhysicsConfig"]).PhysicsConfig(
            al_iters_fit=1, al_iters_dyn=1, al_iters_height=1, lm_iters=6, cg_iters=20,
            # stage 3 is covered by test_durations; its extra compile would
            # dominate this CPU test's runtime
            optimize_durations=False,
        ),
    )


@pytest.mark.slow
def test_full_pipeline(tmp_path, cfg):
    vd = synthesize_video_dir(tmp_path)

    kin = run_kinematic_stage(vd, cfg)
    assert os.path.exists(os.path.join(kin, "final_test.bvh"))
    assert os.path.exists(os.path.join(kin, "floor_out.txt"))
    refined = np.load(os.path.join(kin, "foot_contacts.npy"))
    assert refined.shape[1] == 4

    out_bvh = run_retarget_stage(vd, cfg, skel_bvh=YBOT_BVH)
    assert os.path.exists(out_bvh)

    res = run_physics_stage(vd, cfg)
    out = res["out_dir"]
    for f in [
        "sol_out_no_dynamics.txt", "sol_out_dynamics.txt", "sol_out_durations.txt",
        "success_log.txt", "dance_synth_ybot_dynamics.bvh",
    ]:
        assert os.path.exists(os.path.join(out, f)), f
    # input artifacts too
    for f in ["skel_info.txt", "motion_info.txt", "terrain_info.txt", "contact_info.txt"]:
        assert os.path.exists(os.path.join(vd, f"phys_optim_in_ybot/{f}")), f
    assert np.isfinite(list(res["stats"].values())).all()

    # the dynamics BVH loads and has the ybot joint count
    anim, names, _ = bvh.load(os.path.join(out, "dance_synth_ybot_dynamics.bvh"))
    assert anim.num_joints == 67


@pytest.mark.slow
def test_full_pipeline_real_fps(tmp_path, cfg):
    """Real-fps metadata drives the physics dt end-to-end (VERDICT r3 #6).

    A dance1-layout video dir — the REAL 23.976-fps clip plus synthetic
    1920x1080 keypoints and MTC results — must land dt = 1/24 in the towr
    input files and every sol_out_* header; the reference threads --fps the
    same way (run_phys_mocap.py:88-89 → towr_utils.py:899-1039). Nothing in
    this test assumes the 30-fps config default.
    """
    import shutil

    from chd_tpu.physics import towr_io

    clip = "/root/reference/data/example_data/dance1/dance1.mp4"
    if not os.path.isfile(clip):
        pytest.skip("reference example video not mounted")

    vd = synthesize_video_dir(tmp_path)
    shutil.copyfile(clip, os.path.join(vd, os.path.basename(vd) + ".mp4"))
    assert cfg.probe_fps  # default on; the clip, not the config, sets dt

    run_kinematic_stage(vd, cfg)
    run_retarget_stage(vd, cfg, skel_bvh=YBOT_BVH)
    res = run_physics_stage(vd, cfg)

    with open(os.path.join(vd, "phys_optim_in_ybot", "motion_info.txt")) as f:
        dt_in = float(f.readline())
    assert abs(dt_in - 1.0 / 24.0) < 1e-9, dt_in

    for label in ["no_dynamics", "dynamics", "durations"]:
        loaded = towr_io.load_results(
            os.path.join(res["out_dir"], f"sol_out_{label}.txt"))
        assert abs(loaded.dt - 1.0 / 24.0) < 1e-6, (label, loaded.dt)


def test_config_roundtrip_and_override():
    cfg = PipelineConfig()
    text = cfg.to_json()
    cfg2 = PipelineConfig.from_json(text)
    assert cfg2 == cfg
    cfg3 = cfg.override(**{"physics.w_ee": 0.5, "character": "ty"})
    assert cfg3.physics.w_ee == 0.5 and cfg3.character == "ty"
    with pytest.raises(KeyError):
        cfg.override(**{"physics.nonexistent": 1})


@pytest.mark.slow
def test_kinematic_stage_frame_sharded(tmp_path, cfg):
    """frame_shard_threshold routes the kinematic stage through the
    frame-sharded LM path (parallel/longseq.py) and produces the same
    artifact set."""
    import dataclasses

    vd = synthesize_video_dir(tmp_path)
    cfg_sh = dataclasses.replace(
        cfg,
        kinematic=dataclasses.replace(cfg.kinematic, frame_shard_threshold=8),
    )
    kin = run_kinematic_stage(vd, cfg_sh)
    assert os.path.exists(os.path.join(kin, "final_test.bvh"))
    assert os.path.exists(os.path.join(kin, "floor_out.txt"))
    refined = np.load(os.path.join(kin, "foot_contacts.npy"))
    assert refined.shape[1] == 4
    anim, _, _ = bvh.load(os.path.join(kin, "final_test.bvh"))
    assert np.isfinite(np.asarray(anim.positions)).all()
