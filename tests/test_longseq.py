"""Frame-axis sharded LM (parallel/longseq.py) equals the single-device
solve: same residual math through halo exchange + ownership masking —
checked element-wise on the virtual 8-CPU mesh.

Equality strategy: the LM building blocks (cost, Jᵀr, diag(JᵀJ)) are checked
to near machine precision via ``probe_grad_diag`` — they are order-invariant
sums and must match exactly. Full multi-iteration iterate equality is only
meaningful where the trajectory is not chaotic: on an ill-conditioned
random problem, psum'd CG dots round differently than the global vdot and a
borderline accept/reject can fork the paths (~50% cost differences from
~1e-7 seeds, same effect as the cm-scale CK-IK golden in test_goldens.py).
The solve-level test therefore runs heavily damped (large init_lambda), where
the step is near-gradient-descent and the comparison is stable.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # shard_map autodiff graphs compile slowly

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
    np_dtype = np.dtype(jnp.dtype(dtype))
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
    x0 = (rng.normal(size=(F, D)) * 0.05).astype(np_dtype)
    return x0, data, tuple(skel.parents)


@pytest.mark.parametrize("F", [24, 23])  # even split and ragged (pad) split
def test_sharded_lm_matches_single_device(F):
    """Damped-regime iterate equality in f64 (see module docstring)."""
    w = TermWeights(floor=10.0)
    cfg = LMConfig(max_iters=4, cg_iters=15, init_lambda=1e2)
    x0, data, parents = make_problem(F, dtype=jnp.float64)
    mesh = mesh_lib.make_mesh(n_devices=4, model=1)

    x_sh, c_sh = longseq.lm_solve_frame_sharded(
        x0, data, w, parents, mesh, axis="data", cfg=cfg, dtype=jnp.float64
    )

    D = x0.shape[1]
    masks = frame_coloring_masks(F, D, dtype=jnp.float64)
    residual = residual_fn_for(parents)
    x_ref, c_ref = lm_solve(
        residual, jnp.asarray(x0.reshape(-1), jnp.float64), (data, w), cfg,
        diag_masks=masks,
    )
    np.testing.assert_allclose(float(c_sh), float(c_ref), rtol=1e-9)
    np.testing.assert_allclose(
        x_sh.reshape(-1), np.asarray(x_ref), rtol=0.0, atol=1e-5,
        err_msg="sharded LM iterates diverged from single-device",
        # psum'd CG dots round differently than the global vdot; over 4
        # damped iterations the f64 drift stays ≲1e-6 on O(0.05) variables
    )


def test_sharded_grad_diag_exact():
    """Jᵀr and diag(JᵀJ) from the sharded evaluation equal the global
    computation to near machine precision (order-invariant building blocks;
    this is the real equality claim behind the sharded solver)."""
    w = TermWeights(floor=10.0)
    x0, data, parents = make_problem(12, dtype=jnp.float64, seed=5)
    mesh = mesh_lib.make_mesh(n_devices=4, model=1)
    c_sh, g_sh, diag_sh = longseq.probe_grad_diag(
        x0, data, w, parents, mesh, axis="data", dtype=jnp.float64
    )

    F, D = x0.shape
    xf = jnp.asarray(x0.reshape(-1), jnp.float64)
    residual = residual_fn_for(parents)
    res = lambda x: residual(x, data, w)
    r = res(xf)
    c_ref = 0.5 * float(jnp.vdot(r, r))
    _, vjp = jax.vjp(res, xf)
    g_ref = np.asarray(vjp(r)[0])

    def jtjv(v):
        _, Jv = jax.jvp(res, (xf,), (v,))
        return vjp(Jv)[0]

    masks = frame_coloring_masks(F, D, dtype=jnp.float64)
    diag_ref = np.asarray(sum(m * jtjv(m) for m in masks))

    np.testing.assert_allclose(float(c_sh), c_ref, rtol=1e-12)
    scale_g = np.abs(g_ref).max()
    np.testing.assert_allclose(
        g_sh.reshape(-1) / scale_g, g_ref / scale_g, atol=1e-10
    )
    scale_d = np.abs(diag_ref).max()
    np.testing.assert_allclose(
        diag_sh.reshape(-1) / scale_d, diag_ref / scale_d, atol=1e-10
    )


def test_sharded_residual_cost_exact():
    """‖r‖² from the sharded evaluation equals the global residual norm
    (checks halo exchange + ownership masking with zero LM iterations)."""
    w = TermWeights()
    cfg = LMConfig(max_iters=0, cg_iters=1)  # no steps: c = cost(x0)
    # f64: in f32 the jitted shard_map body's fusion/reassociation rounds
    # the psum'd cost ~7e-5 relative on this problem's 1e14-scale cost —
    # the equality claim is about halo/ownership structure, so assert it
    # in a dtype where rounding can't mask (or mimic) a structural bug
    x0, data, parents = make_problem(16, dtype=jnp.float64, seed=9)
    mesh = mesh_lib.make_mesh(n_devices=8, model=1)
    _, c_sh = longseq.lm_solve_frame_sharded(
        x0, data, w, parents, mesh, axis="data", cfg=cfg, dtype=jnp.float64
    )
    r = trajectory_residuals(
        jnp.asarray(x0.reshape(-1), jnp.float64), data, w, parents)
    c_ref = 0.5 * float(jnp.vdot(r, r))
    np.testing.assert_allclose(float(c_sh), c_ref, rtol=1e-9)


def test_full_refinement_frame_sharded():
    """The complete frame-sharded refinement (IK init → sharded stage-1 LM →
    floor fit + pruning → sharded stage-2 LM) lands in the same solution as
    the single-device optimize_trajectory on a well-conditioned problem."""
    from chd_tpu.kinematics import trajectory as traj_lib
    from test_kinematics_batch import make_problem as kin_problem

    rng = np.random.default_rng(11)
    skel, _, _ = bvh.load(SKEL_BVH)
    F = 16
    prob = kin_problem(rng, skel, F)
    cfg = LMConfig(max_iters=6, cg_iters=20, init_lambda=1e-2)
    mesh = mesh_lib.make_mesh(n_devices=4, model=1)

    res_sh = longseq.optimize_trajectory_frame_sharded(
        prob["pose2d"], prob["conf2d"], prob["pose3d"], prob["root_pos"],
        prob["smpl_angles"], skel, prob["vel_constraints"], mesh,
        ik_iterations=10, lm_cfg=cfg,
    )
    res_1d = traj_lib.optimize_trajectory(
        prob["pose2d"], prob["conf2d"], prob["pose3d"], prob["root_pos"],
        prob["smpl_angles"], skel, prob["vel_constraints"],
        ik_iterations=10, lm_cfg=cfg,
    )
    assert np.isfinite(res_sh.pose3d).all()
    # same solution basin (identical math; fp drift only — cm-scale problem)
    np.testing.assert_allclose(
        res_sh.pose3d, res_1d.pose3d, rtol=0.0, atol=0.5
    )
    np.testing.assert_allclose(
        res_sh.floor_normal, res_1d.floor_normal, rtol=0.0, atol=1e-3
    )
    np.testing.assert_array_equal(res_sh.refined_contacts, res_1d.refined_contacts)
