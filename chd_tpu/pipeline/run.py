"""End-to-end physics-mocap pipeline.

In-process replacement for scripts/run_phys_mocap.py:55-204, which chained
five subprocesses through files on disk. Stages (same artifacts, same
layout, so any stage can be re-run alone exactly like the reference,
README.md:100):

  video_dir/
    openpose_result/            (input: OpenPose JSON)
    tracked_results.json        (input: MTC fit)
    foot_contacts.npy           (input: contact detection)
    kinematic_results/
      final_test.bvh, floor_out.txt, foot_contacts.npy (refined),
      <char>_out.bvh
    phys_optim_in_<char>/       (skel/motion/terrain/contact_info.txt)
    phys_optim_out_<char>/
      sol_out_no_dynamics.txt, sol_out_dynamics.txt, sol_out_durations.txt,
      success_log.txt, <video>_<char>_{no_dynamics,dynamics,durations}.bvh
"""
from __future__ import annotations

import os
import shutil
from typing import Optional

import numpy as np

from ..characters import defs
from ..core import bvh
from ..ingest import openpose, totalcap
from ..kinematics.lm import LMConfig
from ..kinematics import trajectory as traj_lib
from ..physics import apply_results, prepare_input, solve_physics, towr_io
from ..physics.collocation import SolveConfig
from ..physics.types import PhysWeights
from ..retarget import retarget
from ..utils.config import PipelineConfig
from ..utils.log import get_logger, stage_timer

log = get_logger("pipeline")

DEFAULT_SKEL = "src/skeleton_fitting/combined_body_25.bvh"  # reference layout


def _skel_path(cfg: PipelineConfig) -> str:
    if cfg.kinematic.skel_path:
        return cfg.kinematic.skel_path
    raise FileNotFoundError(
        "no combined-skeleton template configured; set kinematic.skel_path "
        "to a combined_body_25.bvh"
    )


def run_kinematic_stage(
    video_dir: str, cfg: PipelineConfig, num_frames: Optional[int] = None
) -> str:
    """Kinematic optimization (kinematic_optimizer.optimize_2d_3d:30-224).

    Reads openpose_result/, tracked_results.json, foot_contacts.npy; writes
    kinematic_results/{final_test.bvh, floor_out.txt, foot_contacts.npy}.
    Returns the kinematic_results path.
    """
    out_dir = os.path.join(video_dir, "kinematic_results")
    os.makedirs(out_dir, exist_ok=True)

    poses2d_all = openpose.load_keypoint_dir(os.path.join(video_dir, "openpose_result"))
    if poses2d_all is None:
        raise FileNotFoundError(f"no openpose_result under {video_dir}")
    tc = totalcap.load_totalcap_results(os.path.join(video_dir, "tracked_results.json"))
    if tc is None:
        raise FileNotFoundError(f"no tracked_results.json under {video_dir}")
    fc_path = os.path.join(video_dir, "foot_contacts.npy")
    if not os.path.exists(fc_path):
        raise FileNotFoundError(f"no foot_contacts.npy under {video_dir}")
    foot_contacts = np.load(fc_path)

    available = min(poses2d_all.shape[0], tc.joint3d.shape[0], foot_contacts.shape[0])
    F = min(num_frames, available) if num_frames else available

    conf2d = poses2d_all[:F, :, 2]
    poses2d = poses2d_all[:F, :, :2]
    root_b25, body25 = totalcap.normalize_root_pos(tc.root_trans, tc.joint3d)
    _, smpl3d = totalcap.normalize_root_pos(
        tc.root_trans, tc.smpl_joint3d, root_idx=totalcap.SMPL_ROOT_IDX
    )
    pose3d = totalcap.create_combined_model(body25, smpl3d)[:F]
    root_pos = root_b25[:F]

    # pad 2D data with the 3 spine joints at zero confidence
    # (kinematic_optimizer.py:92-97)
    pad = np.zeros((F, 3, 2))
    poses2d = np.concatenate([poses2d, pad], axis=1)
    conf2d = np.concatenate([conf2d, np.zeros((F, 3))], axis=1)

    vel_constraints = traj_lib.contacts_to_vel_constraints(foot_contacts[:F])

    plane_normal = plane_point = None
    if cfg.kinematic.use_gt_floor:
        with open(os.path.join(video_dir, "floor_gt.txt")) as f:
            plane_normal = np.array([float(x) for x in f.readline().split()])
            plane_point = np.array([float(x) for x in f.readline().split()]) * 100.0

    smpl_skel = totalcap.combined_angles_from_smpl(tc.smpl_joint_angles[:F])
    skeleton, names, frametime = bvh.load(_skel_path(cfg))

    lm_cfg = LMConfig(max_iters=cfg.kinematic.lm_iters, cg_iters=cfg.kinematic.cg_iters)
    thresh = cfg.kinematic.frame_shard_threshold
    import jax

    if thresh and F >= thresh and len(jax.devices()) > 1:
        # one very long sequence: shard the LM stages' frame axis over all
        # devices (parallel/longseq.py) instead of solving on one chip
        from ..parallel import longseq as longseq_lib
        from ..parallel import mesh as mesh_lib

        res = longseq_lib.optimize_trajectory_frame_sharded(
            poses2d, conf2d, pose3d, root_pos, smpl_skel, skeleton,
            vel_constraints, mesh_lib.make_mesh(model=1),
            cam_focal=cfg.kinematic.focal,
            cam_pp=cfg.kinematic.pp,
            plane_normal=plane_normal,
            plane_point=plane_point,
            ik_iterations=cfg.kinematic.ik_iterations,
            lm_cfg=lm_cfg,
        )
    else:
        res = traj_lib.optimize_trajectory(
            poses2d, conf2d, pose3d, root_pos, smpl_skel, skeleton, vel_constraints,
            cam_focal=cfg.kinematic.focal,
            cam_pp=cfg.kinematic.pp,
            plane_normal=plane_normal,
            plane_point=plane_point,
            ik_iterations=cfg.kinematic.ik_iterations,
            lm_cfg=lm_cfg,
        )

    bvh.save(os.path.join(out_dir, "final_test.bvh"), res.anim, names, frametime=frametime)
    np.save(os.path.join(out_dir, "foot_contacts.npy"), res.refined_contacts)
    with open(os.path.join(out_dir, "floor_out.txt"), "w") as f:
        f.write(" ".join(str(v) for v in res.floor_normal) + "\n")
        f.write(" ".join(str(v) for v in res.floor_point))
    return out_dir


def run_retarget_stage(video_dir: str, cfg: PipelineConfig, skel_bvh: Optional[str] = None) -> str:
    """final_test.bvh → <character>_out.bvh (run_phys_mocap.py:117-133)."""
    kin = os.path.join(video_dir, "kinematic_results")
    final = os.path.join(kin, "final_test.bvh")
    out = os.path.join(kin, f"{cfg.character}_out.bvh")
    if cfg.character == "combined":
        shutil.copyfile(final, out)
        return out
    if skel_bvh is None:
        raise FileNotFoundError(
            f"character template BVH required to retarget to {cfg.character!r}"
        )
    src, names, _ = bvh.load(final)
    retarget(src, cfg.character, skel_bvh, out_bvh=out)
    return out


def run_physics_stage(video_dir: str, cfg: PipelineConfig, video_name: Optional[str] = None) -> dict:
    """prepare → solve → artifacts (run_phys_mocap.py:136-201)."""
    kin = os.path.join(video_dir, "kinematic_results")
    char = cfg.character
    char_bvh = os.path.join(kin, f"{char}_out.bvh")
    in_dir = os.path.join(video_dir, f"phys_optim_in_{char}")
    out_dir = os.path.join(video_dir, f"phys_optim_out_{char}")
    os.makedirs(out_dir, exist_ok=True)
    video_name = video_name or os.path.basename(os.path.abspath(video_dir))

    anim, names, frametime = bvh.load(char_bvh)
    with open(os.path.join(kin, "floor_out.txt")) as f:
        normal = np.array([float(x) for x in f.readline().split()])
        point = np.array([float(x) for x in f.readline().split()])
    contacts = np.load(os.path.join(kin, "foot_contacts.npy"))

    fps = cfg.fps
    if cfg.probe_fps:
        from .probe import probe_fps

        fps = probe_fps(video_dir, default=cfg.fps)

    F = min(anim.num_frames, contacts.shape[0])
    if anim.num_frames != contacts.shape[0]:
        log.warning(
            "frame-count mismatch in %s: BVH has %d frames, foot_contacts.npy "
            "has %d (at %.0f fps); truncating to %d",
            video_dir, anim.num_frames, contacts.shape[0], fps, F,
        )
    phys = prepare_input(
        anim.slice_frames(0, F), normal, point, contacts[:F], char,
        start_idx=0, end_idx=F, dt=1.0 / fps, out_dir=in_dir,
    )

    pw = PhysWeights(
        cfg.physics.w_com_lin, cfg.physics.w_com_ang, cfg.physics.w_ee,
        cfg.physics.w_smooth, cfg.physics.w_dur,
    )
    scfg = SolveConfig(
        al_iters_fit=cfg.physics.al_iters_fit,
        al_iters_dyn=cfg.physics.al_iters_dyn,
        al_iters_height=cfg.physics.al_iters_height,
        al_iters_durations=cfg.physics.al_iters_durations,
        optimize_durations=cfg.physics.optimize_durations,
        lm=LMConfig(max_iters=cfg.physics.lm_iters, cg_iters=cfg.physics.cg_iters,
                    init_lambda=1e-2),
    )
    durations_ok = False
    if cfg.physics.optimize_durations:
        # ONE device dispatch for the whole staged solve incl. stage-3/4
        # (parallel/batch.solve_physics_full_batch on a batch of 1): the
        # per-stage dispatch structure paid a host↔device round-trip per
        # lm_solve, which dominated wall time on tunneled/remote devices
        # (round-5 measurements, BASELINE.md "physics dispatch anatomy")
        from ..parallel import batch as batch_lib
        from ..physics.collocation import join_vars, violation_stats

        batched, seq_lens = batch_lib.pad_phys_inputs([phys])
        rf_b, rd_b, res3_b, stats3_b, ok_b = batch_lib.solve_physics_full_batch(
            batched, pw, scfg)
        res_fit = batch_lib.unbatch_results(rf_b, seq_lens)[0]
        res_dyn = batch_lib.unbatch_results(rd_b, seq_lens)[0]
        x2 = join_vars(res_dyn.base_lin, res_dyn.base_ang, res_dyn.ee_pos,
                       res_dyn.ee_force)
        stats = violation_stats(x2, phys)
        durations_ok = bool(ok_b[0])
        res3 = batch_lib.unbatch_results(res3_b, seq_lens)[0]
        stats3 = {k: float(v[0]) for k, v in stats3_b.items()}
    else:
        res_fit, res_dyn, stats = solve_physics(phys, pw, scfg)

    towr_io.save_solution(res_fit, os.path.join(out_dir, "sol_out_no_dynamics.txt"))
    towr_io.save_solution(res_dyn, os.path.join(out_dir, "sol_out_dynamics.txt"))
    dynamics_ok = (
        stats["dyn"] < cfg.physics.dyn_tol
        and stats["terrain"] < cfg.physics.kin_tol
        and stats["height"] < cfg.physics.kin_tol
    )

    # STAGE 3 result selection: on failure keep the stage-2 result with
    # durations frozen (the reference's stage-4 fallback,
    # phys_optim.cpp:713-749)
    res_durations = res_dyn
    if cfg.physics.optimize_durations and durations_ok:
        res_durations = res3
        stats = {**stats, **{f"dur_{k}": v for k, v in stats3.items()}}
    durations_ok = durations_ok or dynamics_ok  # fallback result converged
    towr_io.save_solution(res_durations, os.path.join(out_dir, "sol_out_durations.txt"))
    towr_io.save_success_log(os.path.join(out_dir, "success_log.txt"), dynamics_ok, durations_ok)

    # BVH exports of each result (towr_utils.py --viz branch :953-975)
    for label in ["no_dynamics", "dynamics", "durations"]:
        loaded = towr_io.load_results(os.path.join(out_dir, f"sol_out_{label}.txt"))
        applied, _, _ = apply_results(loaded, anim.slice_frames(0, F), char)
        from ..physics.apply import remove_heel
        from ..characters import get_character

        save_anim = applied if get_character(char).has_heel else remove_heel(applied)
        bvh.save(
            os.path.join(out_dir, f"{video_name}_{char}_{label}.bvh"),
            save_anim, names, frametime=frametime,
        )
    return {"stats": stats, "dynamics_ok": dynamics_ok, "out_dir": out_dir}


def run_pipeline(video_dir: str, cfg: PipelineConfig, char_skel_bvh: Optional[str] = None) -> dict:
    """Full per-video pipeline (run_phys_mocap.py main loop)."""
    with stage_timer(f"kinematic [{video_dir}]", log):
        run_kinematic_stage(video_dir, cfg)
    with stage_timer(f"retarget → {cfg.character}", log):
        run_retarget_stage(video_dir, cfg, char_skel_bvh)
    with stage_timer("physics", log):
        return run_physics_stage(video_dir, cfg)
