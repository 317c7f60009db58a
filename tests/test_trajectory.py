"""Kinematic trajectory optimizer tests.

- Residual parity: element-wise against the reference's
  fun_anim_for_projection (optimize_trajectory.py:324-483).
- Behavioral: the LM solve reduces the cost and satisfies contact/floor
  constraints on a synthetic sequence.
"""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from chd_tpu.characters import defs
from chd_tpu.core import bvh, quat
from chd_tpu.kinematics import lm
from chd_tpu.kinematics.residuals import TermWeights, TrajectoryData, trajectory_residuals
from chd_tpu.kinematics import trajectory as traj_lib

SKEL_BVH = "/root/reference/src/skeleton_fitting/combined_body_25.bvh"


@pytest.fixture(scope="module")
def ref_traj(ref_ik):
    for p in [
        "/root/reference/src/optimize",
        "/root/reference/src/skeleton_fitting/ik",
        "/root/reference/src/utils",
        "/root/reference/src",
    ]:
        if p not in sys.path:
            sys.path.append(p)
    import optimize_trajectory as mod  # noqa

    return mod


@pytest.fixture(scope="module")
def problem():
    """Random but plausible combined-skeleton problem."""
    rng = np.random.default_rng(0)
    anim, names, _ = bvh.load(SKEL_BVH)
    J = anim.num_joints
    F = 7
    es = rng.uniform(-0.3, 0.3, size=(F, J, 3))
    root = rng.normal(size=(F, 3)) * 20 + np.array([0, 0, 400.0])

    pose3d = rng.normal(size=(F, 28, 3)) * 30
    pose3d[:, :, 2] += 400.0  # positive depth
    pose3d[:, defs.COMBINED_ROOT_IDX] = 0.0
    root_trans = root + rng.normal(size=(F, 3))
    pose2d = rng.uniform(-0.3, 0.3, size=(F, 28, 2))
    conf = rng.uniform(0.2, 1.0, size=(F, 28))
    conf[:, 25:] = 0.0
    proj_w, data_w = traj_lib.build_weights(conf)
    vc = np.zeros((F, 28))
    vc[:, [19, 20, 21, 22, 23, 24]] = (rng.uniform(size=(F, 6)) > 0.5).astype(float)
    normal = np.array([0.02, -1.0, 0.01])
    normal /= np.linalg.norm(normal)
    point = np.array([0.0, 95.0, 0.0])
    x = np.concatenate([root, es.reshape(F, -1)], axis=1)
    return dict(
        anim=anim, F=F, J=J, x=x, pose3d=pose3d, root_trans=root_trans,
        pose2d=pose2d, proj_w=proj_w, data_w=data_w, vc=vc,
        normal=normal, point=point,
    )


@pytest.mark.parametrize("floor_w", [0.0, 10.0])
def test_residuals_match_reference(ref_traj, problem, floor_w):
    p = problem
    w = TermWeights(proj=1000.0, smooth_vel=0.1, smooth_acc=0.5, data=0.3,
                    vel=10.0, floor=floor_w)
    data = TrajectoryData(
        pose3d=jnp.asarray(p["pose3d"]),
        root_trans=jnp.asarray(p["root_trans"]),
        pose2d_norm=jnp.asarray(p["pose2d"]),
        proj_weights=jnp.asarray(p["proj_w"]),
        data_weights=jnp.asarray(p["data_w"]),
        smooth_weights=jnp.asarray(defs.COMBINED_SMOOTH_WEIGHTS),
        vel_constraints=jnp.asarray(p["vc"]),
        floor_normal=jnp.asarray(p["normal"]),
        floor_point=jnp.asarray(p["point"]),
        offsets=jnp.asarray(p["anim"].offsets),
    )
    ours = np.asarray(
        trajectory_residuals(jnp.asarray(p["x"].reshape(-1)), data, w, p["anim"].parents)
    )

    # reference: needs an ik-Animation skeleton object
    import Animation as RefAnim
    from Quaternions import Quaternions as RefQ

    J = p["J"]
    skel = RefAnim.Animation(
        RefQ(np.tile(np.array([1.0, 0, 0, 0]), (1, J, 1))),
        p["anim"].offsets[None].copy(),
        RefQ(np.tile(np.array([1.0, 0, 0, 0]), (J, 1))),
        p["anim"].offsets.copy(),
        np.asarray(p["anim"].parents),
    )
    theirs = ref_traj.fun_anim_for_projection(
        p["x"].reshape(-1), skel, p["pose3d"], p["root_trans"], p["pose2d"],
        p["normal"], p["point"], p["proj_w"], p["data_w"],
        np.arange(28), np.arange(28), defs.COMBINED_SMOOTH_WEIGHTS, p["vc"],
        w.proj, w.smooth_vel, w.smooth_acc, w.data, w.vel, w.floor,
    )
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-8)


@pytest.mark.slow
def test_lm_reduces_cost_on_consistent_problem():
    """Realistic setup: 2D/3D evidence generated from a true motion, solver
    started from a perturbed init (the role the IK init plays in the
    pipeline). LM must slash the cost and nearly recover the projection."""
    rng = np.random.default_rng(7)
    anim, _, _ = bvh.load(SKEL_BVH)
    parents = anim.parents
    J, F = anim.num_joints, 8

    es_true = rng.uniform(-0.25, 0.25, size=(F, J, 3))
    root_true = np.cumsum(rng.normal(size=(F, 3)), axis=0) + np.array([0, 0, 400.0])
    x_true = np.concatenate([root_true, es_true.reshape(F, -1)], axis=1).reshape(-1)

    from chd_tpu.kinematics.residuals import data_order_positions

    offsets = jnp.asarray(anim.offsets, jnp.float32)
    y, root = data_order_positions(jnp.asarray(x_true, jnp.float32).reshape(F, -1), offsets, parents)
    pose3d = np.array(y)
    pose3d[:, defs.COMBINED_ROOT_IDX] = 0.0
    world = np.array(y + root[:, None])
    world[:, defs.COMBINED_ROOT_IDX] = np.asarray(root)
    pose2d = world[..., :2] / world[..., 2:3]

    conf = np.ones((F, 28)); conf[:, 25:] = 0.0
    proj_w, data_w = traj_lib.build_weights(conf)
    vc = np.zeros((F, 28))

    data = TrajectoryData(
        pose3d=jnp.asarray(pose3d, jnp.float32),
        root_trans=jnp.asarray(root_true, jnp.float32),
        pose2d_norm=jnp.asarray(pose2d, jnp.float32),
        proj_weights=jnp.asarray(proj_w, jnp.float32),
        data_weights=jnp.asarray(data_w, jnp.float32),
        smooth_weights=jnp.asarray(defs.COMBINED_SMOOTH_WEIGHTS, jnp.float32),
        vel_constraints=jnp.asarray(vc, jnp.float32),
        floor_normal=jnp.asarray([0.0, -1.0, 0.0], jnp.float32),
        floor_point=jnp.zeros(3, jnp.float32),
        offsets=offsets,
    )

    def residual(x, d, ww):
        return trajectory_residuals(x, d, ww, parents)

    w = traj_lib.STAGE1
    # perturbed init (plays the role of the IK initialization)
    x0 = x_true + rng.normal(size=x_true.shape) * np.tile(
        np.concatenate([np.full(3, 2.0), np.full(J * 3, 0.03)]), F
    )
    x0 = jnp.asarray(x0, jnp.float32)
    r0 = residual(x0, data, w)
    c0 = 0.5 * float(jnp.vdot(r0, r0))
    rt = residual(jnp.asarray(x_true, jnp.float32), data, w)
    c_true = 0.5 * float(jnp.vdot(rt, rt))  # smoothness terms ≠ 0 at truth

    masks = lm.frame_coloring_masks(F, 3 + J * 3)
    x1, c1 = lm.lm_solve(
        residual, x0, (data, w), lm.LMConfig(max_iters=15, cg_iters=40), diag_masks=masks
    )
    # must beat both the perturbed init and the (non-smooth) ground truth
    assert float(c1) < 0.3 * c0, (c0, float(c1))
    assert float(c1) < c_true, (c_true, float(c1))


def test_update_skeleton_matches_reference(ref_traj, problem):
    p = problem
    rng = np.random.default_rng(5)
    targets = rng.normal(size=(p["F"], p["J"], 3)) * 50

    ours = traj_lib.update_skeleton(p["anim"].offsets, p["anim"].parents, targets)

    import Animation as RefAnim
    from Quaternions import Quaternions as RefQ

    J = p["J"]
    skel = RefAnim.Animation(
        RefQ(np.tile(np.array([1.0, 0, 0, 0]), (1, J, 1))),
        p["anim"].offsets[None].copy(),
        RefQ(np.tile(np.array([1.0, 0, 0, 0]), (J, 1))),
        p["anim"].offsets.copy(),
        np.asarray(p["anim"].parents),
    )
    theirs = ref_traj.update_skeleton(skel, targets)
    np.testing.assert_allclose(ours, theirs.offsets, atol=1e-9)


def test_contact_mapping_roundtrip():
    rng = np.random.default_rng(2)
    fc = (rng.uniform(size=(20, 4)) > 0.5).astype(int)
    vc = traj_lib.contacts_to_vel_constraints(fc)
    back = traj_lib.refine_contact_labels(vc)
    np.testing.assert_array_equal(back, fc)
