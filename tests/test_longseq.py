"""Frame-axis sharded LM (parallel/longseq.py) equals the single-device
solve: same residual math through halo exchange + ownership masking, same
iterates — checked element-wise on the virtual 8-CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chd_tpu.characters import defs
from chd_tpu.core import bvh
from chd_tpu.kinematics.lm import LMConfig, frame_coloring_masks, lm_solve
from chd_tpu.kinematics.residuals import (
    TermWeights, TrajectoryData, residual_fn_for, trajectory_residuals,
)
from chd_tpu.parallel import longseq
from chd_tpu.parallel import mesh as mesh_lib

SKEL_BVH = "/root/reference/src/skeleton_fitting/combined_body_25.bvh"


def make_problem(F, dtype=jnp.float32, seed=3):
    rng = np.random.default_rng(seed)
    skel, _, _ = bvh.load(SKEL_BVH)
    J = skel.num_joints
    D = 3 + J * 3
    pose3d = rng.normal(size=(F, 28, 3)).astype(np.float32) * 0.3
    root = (rng.normal(size=(F, 3)) + np.array([0, 0, 4.0])).astype(np.float32)
    conf = np.ones((F, 28), np.float32)
    conf[:, 25:] = 0
    data = TrajectoryData(
        pose3d=jnp.asarray(pose3d, dtype),
        root_trans=jnp.asarray(root, dtype),
        pose2d_norm=jnp.asarray(rng.normal(size=(F, 28, 2)) * 0.1, dtype),
        proj_weights=jnp.asarray(conf, dtype),
        data_weights=jnp.asarray(conf, dtype),
        smooth_weights=jnp.asarray(defs.COMBINED_SMOOTH_WEIGHTS, dtype),
        vel_constraints=jnp.asarray(
            (rng.uniform(size=(F, 28)) > 0.8).astype(np.float32), dtype
        ),
        floor_normal=jnp.asarray([0.0, -1.0, 0.0], dtype),
        floor_point=jnp.asarray([0.0, 0.9, 0.0], dtype),
        offsets=jnp.asarray(skel.offsets * 0.01, dtype),
    )
    x0 = (rng.normal(size=(F, D)) * 0.05).astype(np.float32)
    return x0, data, tuple(skel.parents)


@pytest.mark.parametrize("F", [24, 23])  # even split and ragged (pad) split
def test_sharded_lm_matches_single_device(F):
    w = TermWeights(floor=10.0)
    cfg = LMConfig(max_iters=4, cg_iters=15, init_lambda=1e-2)
    x0, data, parents = make_problem(F)
    mesh = mesh_lib.make_mesh(n_devices=4, model=1)

    x_sh, c_sh = longseq.lm_solve_frame_sharded(
        x0, data, w, parents, mesh, axis="data", cfg=cfg
    )

    D = x0.shape[1]
    masks = frame_coloring_masks(F, D)
    residual = residual_fn_for(parents)
    x_ref, c_ref = lm_solve(
        residual, jnp.asarray(x0.reshape(-1)), (data, w), cfg, diag_masks=masks
    )
    np.testing.assert_allclose(float(c_sh), float(c_ref), rtol=1e-4)
    np.testing.assert_allclose(
        x_sh.reshape(-1), np.asarray(x_ref), atol=5e-4,
    )


def test_sharded_residual_cost_exact():
    """‖r‖² from the sharded evaluation equals the global residual norm
    (checks halo exchange + ownership masking with zero LM iterations)."""
    w = TermWeights()
    cfg = LMConfig(max_iters=0, cg_iters=1)  # no steps: c = cost(x0)
    x0, data, parents = make_problem(16, seed=9)
    mesh = mesh_lib.make_mesh(n_devices=8, model=1)
    _, c_sh = longseq.lm_solve_frame_sharded(
        x0, data, w, parents, mesh, axis="data", cfg=cfg
    )
    r = trajectory_residuals(jnp.asarray(x0.reshape(-1)), data, w, parents)
    c_ref = 0.5 * float(jnp.vdot(r, r))
    np.testing.assert_allclose(float(c_sh), c_ref, rtol=1e-5)
