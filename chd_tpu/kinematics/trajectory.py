"""Kinematic trajectory optimization (the pipeline's core refinement).

Batched JAX replacement for src/optimize/optimize_trajectory.py:522-833 and
the per-video driver around it (src/optimize/kinematic_optimizer.py:30-224):

1.  bone-length fit of the template skeleton to the median observed lengths
    with the spine special case (``update_skeleton``, reference :485-520);
2.  IK initialization from the SMPL axis-angle estimates via 200 CK-IK
    iterations, damping 7 (:576-618);
3.  stage-1 Levenberg–Marquardt over per-frame [root, euler] variables with
    projection / smoothness / data / contact terms, floor weight 0
    (:630-670);
4.  robust Huber floor fit on contact-frame foot positions + a second fit
    whose outliers prune spurious contact labels (:713-767);
5.  stage-2 LM with the floor term active (:770-789).

Where the reference builds hand-written sparse Jacobians for scipy's trf
solver, the JAX version autodiffs the residual inside a matrix-free LM (see
kinematics/lm.py), and the whole per-sequence solve jits/vmaps.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..characters import defs
from ..core import quat
from ..core.animation import Animation
from ..core.fk import positions_global
from . import floor as floor_lib
from .ik import IKConfig, solve_ck_ik
from .lm import LMConfig, lm_solve
from .residuals import TermWeights, TrajectoryData, trajectory_residuals

STAGE1 = TermWeights(proj=1000.0, smooth_vel=0.1, smooth_acc=0.5, data=0.3, vel=10.0, floor=0.0)
STAGE2 = TermWeights(proj=1000.0, smooth_vel=0.1, smooth_acc=0.5, data=0.3, vel=10.0, floor=10.0)


@dataclasses.dataclass
class TrajectoryResult:
    anim: Animation                # optimized skeleton-order animation
    pose3d: np.ndarray             # (F, 28, 3) global, data order
    proj2d: np.ndarray             # (F, 28, 2) pixels
    floor_normal: np.ndarray       # (3,)
    floor_point: np.ndarray        # (3,)
    vel_constraints: np.ndarray    # (F, 28) possibly pruned
    refined_contacts: np.ndarray   # (F, 4) [Lheel, Ltoe, Rheel, Rtoe]


def update_skeleton(offsets: np.ndarray, parents, targets: np.ndarray) -> np.ndarray:
    """Scale template offsets to median observed bone lengths
    (optimize_trajectory.update_skeleton:485-520). Spine joints get one third
    of the median root→Spine2 distance to avoid SMPL's crunched spine."""
    offsets = np.asarray(offsets, np.float64).copy()
    parents = np.asarray(parents)
    J = len(parents)
    spine = set(int(s) for s in defs.COMBINED_SKEL_SPINE_JOINTS)
    bones = np.zeros(J)
    for j in range(1, J):
        if j in spine:
            d = targets[:, int(defs.COMBINED_SKEL_SPINE_JOINTS[2])] - targets[:, 0]
            bones[j] = np.median(np.linalg.norm(d, axis=1) / 3.0)
        else:
            d = targets[:, j] - targets[:, parents[j]]
            bones[j] = np.median(np.linalg.norm(d, axis=1))
    dirs = offsets[1:] / np.linalg.norm(offsets[1:], axis=1, keepdims=True)
    offsets[1:] = dirs * bones[1:, None]
    offsets[0] = 0.0
    return offsets


def build_weights(conf2d: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Projection/data weight matrices from detection confidence
    (optimize_trajectory.py:556-572). conf2d: (F, 28) with zero-padded spine."""
    F, Jd = conf2d.shape
    proj_w = np.ones((F, Jd))
    data_w = np.ones((F, Jd))
    body = np.arange(Jd) < 25
    proj_w = np.where(body, conf2d * defs.COMBINED_PROJ_WEIGHTS[None], 0.0)
    data_w = np.where(
        body,
        (1.0 + conf2d) * defs.COMBINED_DATA_WEIGHTS[None],
        (1.0 + 0.4) * defs.COMBINED_DATA_WEIGHTS[None],
    )
    return proj_w, data_w


def init_rotations_from_smpl(smpl_axis_angle_skel: np.ndarray) -> np.ndarray:
    """Axis-angle (skeleton order) → init quaternions with the reference's
    axis negation (:589-599): q(θ, −axis) — the conjugate rotation."""
    aa = jnp.asarray(smpl_axis_angle_skel)
    angle = jnp.linalg.norm(aa, axis=-1)
    axis = -aa / (angle[..., None] + 1e-10)
    return np.asarray(quat.from_angle_axis(angle, axis))


def optimize_trajectory(
    pose2d: np.ndarray,
    conf2d: np.ndarray,
    pose3d: np.ndarray,
    root_pos: np.ndarray,
    smpl_angles_skel: np.ndarray,
    skeleton: Animation,
    vel_constraints: np.ndarray,
    cam_focal=(defs.MTC_FOCAL[0], defs.MTC_FOCAL[1]),
    cam_pp=(defs.MTC_PP[0], defs.MTC_PP[1]),
    plane_normal: Optional[np.ndarray] = None,
    plane_point: Optional[np.ndarray] = None,
    ik_iterations: int = 200,
    # 40:80 = measured quality-parity point of the round-5 budget ladder
    # (BASELINE.md); see kinematics/batch.optimize_trajectory_batch
    lm_cfg: LMConfig = LMConfig(max_iters=40, cg_iters=80),
    dtype=jnp.float32,
) -> TrajectoryResult:
    """End-to-end kinematic refinement of one sequence.

    pose2d (F, 28, 2) pixels / conf2d (F, 28): OpenPose padded with zero-conf
    spine columns; pose3d (F, 28, 3): root-relative MTC joints (data order);
    smpl_angles_skel (F, J, 3): SMPL axis-angle mapped to skeleton order;
    skeleton: combined template (28 joints); vel_constraints (F, 28).
    """
    F = pose2d.shape[0]
    parents = tuple(skeleton.parents)
    J = skeleton.num_joints
    s2d = np.asarray(defs.COMBINED_SKEL_TO_DATA)
    given_floor = plane_normal is not None and plane_point is not None

    # 1. bone-length fit
    targets = pose3d[:, s2d] + root_pos[:, None, :]
    offsets = update_skeleton(np.asarray(skeleton.offsets), parents, targets)

    # 2. projection weights + normalized image coords
    proj_w, data_w = build_weights(conf2d)
    pose2d_norm = (pose2d - np.asarray(cam_pp)[None, None]) / np.asarray(cam_focal)[None, None]

    # 3. IK init from SMPL angles
    rot0 = init_rotations_from_smpl(smpl_angles_skel)
    pos0 = np.broadcast_to(offsets[None], (F, J, 3)).copy()
    pos0[:, 0] = root_pos
    anim0 = Animation(
        jnp.asarray(rot0, dtype), jnp.asarray(pos0, dtype),
        jnp.asarray(skeleton.orients, dtype), jnp.asarray(offsets, dtype), parents,
    )
    spine = set(int(s) for s in defs.COMBINED_SKEL_SPINE_JOINTS)
    targetmap = {
        j: jnp.asarray(targets[:, j], dtype) for j in range(J) if j not in spine
    }
    anim_ik = solve_ck_ik(
        anim0, targetmap, IKConfig(iterations=ik_iterations, damping=7.0)
    )

    # 4. stage-1 LM
    x0 = jnp.concatenate(
        [
            anim_ik.positions[:, 0],
            quat.to_euler(anim_ik.rotations, "xyz").reshape(F, -1),
        ],
        axis=-1,
    ).reshape(-1).astype(dtype)

    def make_data(vc, n, p):
        return TrajectoryData(
            pose3d=jnp.asarray(pose3d, dtype),
            root_trans=jnp.asarray(root_pos, dtype),
            pose2d_norm=jnp.asarray(pose2d_norm, dtype),
            proj_weights=jnp.asarray(proj_w, dtype),
            data_weights=jnp.asarray(data_w, dtype),
            smooth_weights=jnp.asarray(defs.COMBINED_SMOOTH_WEIGHTS, dtype),
            vel_constraints=jnp.asarray(vc, dtype),
            floor_normal=jnp.asarray(n, dtype),
            floor_point=jnp.asarray(p, dtype),
            offsets=jnp.asarray(offsets, dtype),
        )

    zero3 = np.zeros(3)
    data1 = make_data(vel_constraints, plane_normal if given_floor else zero3,
                      plane_point if given_floor else zero3)

    from .residuals import residual_fn_for

    residual = residual_fn_for(tuple(parents))  # stable fn identity so the
    # lm_solve jit cache survives across calls (fresh closures recompile)

    from .lm import frame_coloring_masks

    masks = frame_coloring_masks(F, 3 + J * 3, dtype=dtype)
    x1, _ = lm_solve(residual, x0, (data1, STAGE1), lm_cfg, diag_masks=masks)

    # 5. floor fit + contact pruning on stage-1 foot positions
    y1, root1 = _positions_from_x(x1, data1.offsets, parents, F)
    feet_cols = s2d[defs.COMBINED_SKEL_FEET_IDX]  # data cols of skel feet order
    world_feet = np.asarray(y1 + root1[:, None, :])[:, feet_cols]  # (F, 6, 3)
    flags = np.asarray(vel_constraints)[:, feet_cols]
    mask = jnp.asarray(flags.reshape(-1) == 1)
    pts = world_feet.reshape(-1, 3)

    new_vc = np.asarray(vel_constraints).copy()
    if not given_floor:
        fit = floor_lib.fit_floor(
            jnp.asarray(pts[:, [0, 2]], dtype), jnp.asarray(pts[:, 1], dtype),
            mask, epsilon=1.5,
        )
        plane_normal = np.asarray(fit.normal, np.float64)
        plane_point = np.asarray(fit.point, np.float64)

        fit2 = floor_lib.fit_floor(
            jnp.asarray(pts[:, [0, 2]], dtype), jnp.asarray(pts[:, 1], dtype),
            mask, epsilon=2.2,
        )
        pruned = floor_lib.prune_contacts(
            jnp.asarray(new_vc, dtype), jnp.asarray(feet_cols), fit2.outliers, mask
        )
        new_vc = np.asarray(pruned)

    # 6. stage-2 LM with floor active
    data2 = make_data(new_vc, plane_normal, plane_point)
    x2, _ = lm_solve(residual, x1, (data2, STAGE2), lm_cfg, diag_masks=masks)

    # 7. outputs
    y2, root2 = _positions_from_x(x2, data2.offsets, parents, F)
    pose3d_out = np.array(y2 + root2[:, None, :])
    pose3d_out[:, defs.COMBINED_ROOT_IDX] = np.asarray(root2)

    fx, fy = cam_focal
    cx, cy = cam_pp
    proj2d = np.stack(
        [
            fx * pose3d_out[..., 0] / pose3d_out[..., 2] + cx,
            fy * pose3d_out[..., 1] / pose3d_out[..., 2] + cy,
        ],
        axis=-1,
    )

    xm = np.asarray(x2).reshape(F, -1)
    rot = quat.from_euler(jnp.asarray(xm[:, 3:].reshape(F, J, 3), dtype), "xyz", world=True)
    pos = np.broadcast_to(offsets[None], (F, J, 3)).copy()
    pos[:, 0] = xm[:, :3]
    anim = Animation(
        np.asarray(rot), pos, np.asarray(skeleton.orients), offsets, parents
    )

    refined = refine_contact_labels(new_vc)
    return TrajectoryResult(
        anim=anim,
        pose3d=pose3d_out,
        proj2d=proj2d,
        floor_normal=np.asarray(plane_normal),
        floor_point=np.asarray(plane_point),
        vel_constraints=new_vc,
        refined_contacts=refined,
    )


def _positions_from_x(x, offsets, parents, F):
    """Data-order root-relative positions + root from a flat variable vector."""
    from .residuals import data_order_positions

    y, root = data_order_positions(x.reshape(F, -1), offsets, parents)
    return y, root


def contacts_to_vel_constraints(foot_contacts: np.ndarray, num_joints: int = 28) -> np.ndarray:
    """(F, 4) [Lheel, Ltoe, Rheel, Rtoe] labels → (F, 28) per-joint constraint
    matrix (kinematic_optimizer.py:107-117)."""
    F = foot_contacts.shape[0]
    vc = np.zeros((F, num_joints))
    for col, joints in defs.CONTACT_TO_DATA_JOINTS.items():
        for j in joints:
            vc[:, j] = foot_contacts[:, col]
    return vc


def refine_contact_labels(vel_constraints: np.ndarray) -> np.ndarray:
    """(F, 28) pruned constraints → (F, 4) refined labels
    (kinematic_optimizer.py:184-204): toes are the OR of big/small toe."""
    feet = vel_constraints[:, 19:25]  # LBig, LSmall, LHeel, RBig, RSmall, RHeel
    lheel = feet[:, 2]
    ltoe = np.logical_or(feet[:, 0], feet[:, 1]).astype(feet.dtype)
    rheel = feet[:, 5]
    rtoe = np.logical_or(feet[:, 3], feet[:, 4]).astype(feet.dtype)
    return np.stack([lheel, ltoe, rheel, rtoe], axis=1).astype(int)
