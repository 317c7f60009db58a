"""Batched kinematic optimization matches the single-sequence path."""
import pytest
import numpy as np
import jax.numpy as jnp

from chd_tpu.characters import defs
from chd_tpu.core import bvh
from chd_tpu.core.fk import positions_global
from chd_tpu.kinematics import batch as kbatch
from chd_tpu.kinematics import trajectory as traj_lib
from chd_tpu.kinematics.lm import LMConfig
from chd_tpu.kinematics.residuals import data_order_positions

SKEL_BVH = "/root/reference/src/skeleton_fitting/combined_body_25.bvh"


def make_problem(rng, skel, F):
    J = skel.num_joints
    e0 = rng.uniform(-0.2, 0.2, size=(J, 3))
    e1 = e0 + rng.uniform(-0.15, 0.15, size=(J, 3))
    t = np.linspace(0, 1, F)[:, None, None]
    es = (1 - t) * e0[None] + t * e1[None]
    root = np.stack(
        [np.linspace(0, 15, F), np.full(F, -95.0), np.linspace(380, 395, F)], axis=1
    )
    x = np.concatenate([root, es.reshape(F, -1)], axis=1)
    y, r = data_order_positions(
        jnp.asarray(x, jnp.float32).reshape(F, -1), jnp.asarray(skel.offsets, jnp.float32),
        skel.parents,
    )
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
    conf[:, 25:] = 0
    vc = traj_lib.contacts_to_vel_constraints(np.ones((F, 4), int))
    return dict(
        pose2d=pose2d, conf2d=conf, pose3d=pose3d, root_pos=root,
        smpl_angles=-es, vel_constraints=vc,
    )


@pytest.mark.slow
def test_batch_matches_single():
    rng = np.random.default_rng(17)
    skel, names, _ = bvh.load(SKEL_BVH)
    F = 8
    prob = make_problem(rng, skel, F)
    prob2 = make_problem(rng, skel, 6)  # ragged second sequence

    lm_cfg = LMConfig(max_iters=5, cg_iters=15)
    batch_res = kbatch.optimize_trajectory_batch(
        [prob, prob2], skel, ik_iterations=10, lm_cfg=lm_cfg
    )

    single = traj_lib.optimize_trajectory(
        prob["pose2d"], prob["conf2d"], prob["pose3d"], prob["root_pos"],
        prob["smpl_angles"], skel, prob["vel_constraints"].copy(),
        ik_iterations=10, lm_cfg=lm_cfg,
    )

    gp_b = np.asarray(positions_global(
        jnp.asarray(batch_res[0].anim.rotations),
        jnp.asarray(batch_res[0].anim.positions), skel.parents))
    gp_s = np.asarray(positions_global(
        jnp.asarray(single.anim.rotations),
        jnp.asarray(single.anim.positions), skel.parents))
    # same math in lockstep (floor prune may diverge on borderline outliers;
    # positions should still agree closely)
    err = np.abs(gp_b - gp_s).max()
    assert err < 0.5, err  # cm

    assert batch_res[1].anim.num_frames == 6
    assert batch_res[1].refined_contacts.shape == (6, 4)
    np.testing.assert_allclose(
        batch_res[0].floor_normal, single.floor_normal, atol=5e-2
    )
