"""End-to-end kinematic optimization on a synthetic consistent sequence.

Plays the role of BASELINE config #3 (skeleton fitting + kinematic init):
generates a smooth ground-truth motion on the combined skeleton, renders
2D/3D evidence from it, then checks optimize_trajectory recovers the motion
(projection error shrinks, contact feet end up on the fitted floor).
"""
import pytest
import numpy as np
import jax.numpy as jnp

from chd_tpu.characters import defs
from chd_tpu.core import bvh
from chd_tpu.core.fk import positions_global
from chd_tpu.core import quat
from chd_tpu.kinematics.lm import LMConfig
from chd_tpu.kinematics import trajectory as traj_lib
from chd_tpu.kinematics.residuals import data_order_positions

SKEL_BVH = "/root/reference/src/skeleton_fitting/combined_body_25.bvh"


@pytest.mark.slow
def test_optimize_trajectory_end_to_end():
    rng = np.random.default_rng(3)
    skel, names, _ = bvh.load(SKEL_BVH)
    parents = skel.parents
    J, F = skel.num_joints, 10

    # smooth ground-truth motion (interpolate 2 keyposes), walking forward
    e0 = rng.uniform(-0.25, 0.25, size=(J, 3))
    e1 = e0 + rng.uniform(-0.2, 0.2, size=(J, 3))
    t = np.linspace(0, 1, F)[:, None, None]
    es_true = (1 - t) * e0[None] + t * e1[None]
    root_true = np.stack(
        [np.linspace(0, 30, F), np.full(F, -95.0), np.linspace(380, 420, F)], axis=1
    )
    x_true = np.concatenate([root_true, es_true.reshape(F, -1)], axis=1)

    offsets = jnp.asarray(skel.offsets, jnp.float32)
    y, r = data_order_positions(jnp.asarray(x_true, jnp.float32).reshape(F, -1), offsets, parents)
    pose3d = np.array(y)
    pose3d[:, defs.COMBINED_ROOT_IDX] = 0.0
    world = np.array(y + r[:, None])
    world[:, defs.COMBINED_ROOT_IDX] = np.asarray(r)

    fx, fy = defs.MTC_FOCAL
    cx, cy = defs.MTC_PP
    pose2d = np.stack(
        [fx * world[..., 0] / world[..., 2] + cx, fy * world[..., 1] / world[..., 2] + cy],
        axis=-1,
    )
    conf = np.ones((F, 28))
    conf[:, 25:] = 0.0

    # noise the 3D init a bit (MTC is imperfect)
    pose3d_noisy = pose3d + rng.normal(size=pose3d.shape) * 1.0
    pose3d_noisy[:, defs.COMBINED_ROOT_IDX] = 0.0

    # contacts: both feet planted all frames (they're near constant height)
    fc = np.ones((F, 4), int)
    vc = traj_lib.contacts_to_vel_constraints(fc)

    # SMPL-style init angles: conjugate of truth maps back through the
    # negation in init_rotations_from_smpl
    aa_angle = np.linalg.norm(es_true, axis=-1)
    smpl_angles = -es_true  # crude axis-angle-ish init; IK does the real work

    res = traj_lib.optimize_trajectory(
        pose2d, conf, pose3d_noisy, root_true, smpl_angles, skel, vc,
        ik_iterations=30,
        lm_cfg=LMConfig(max_iters=12, cg_iters=40),
    )

    # projection error of the result vs the observed 2D
    err = np.linalg.norm(res.proj2d[conf > 0.2] - pose2d[conf > 0.2], axis=-1)
    assert np.median(err) < 25.0, np.median(err)  # pixels @1920x1080

    # contact feet lie near the fitted floor plane
    n, p = res.floor_normal, res.floor_point
    gp = np.asarray(
        positions_global(
            jnp.asarray(res.anim.rotations), jnp.asarray(res.anim.positions), parents
        )
    )
    feet_cols_skel = defs.COMBINED_SKEL_FEET_IDX
    feet = gp[:, feet_cols_skel]
    d = np.abs((feet - p) @ n)
    contact_mask = res.vel_constraints[:, np.asarray(defs.COMBINED_SKEL_TO_DATA)[feet_cols_skel]] == 1
    assert d[contact_mask].mean() < 4.0, d[contact_mask].mean()  # cm

    # refined contacts format
    assert res.refined_contacts.shape == (F, 4)
    assert res.pose3d.shape == (F, 28, 3)
