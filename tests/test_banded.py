"""Banded normal-equation machinery (kinematics/banded.py).

Checks the coloring extraction and the superblock Thomas solve against
dense linear algebra, and the banded LM path against the PCG path on the
real trajectory objective.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chd_tpu.characters import defs
from chd_tpu.core import bvh
from chd_tpu.kinematics import banded, trajectory as traj_lib
from chd_tpu.kinematics.lm import LMConfig, frame_coloring_masks, lm_solve
from chd_tpu.kinematics.residuals import TrajectoryData, trajectory_residuals


def _random_banded_spd(F, D, bw, rng):
    n = F * D
    J = rng.normal(size=(3 * n, n))
    # zero couplings beyond the band: residual row i touches frames in a
    # window — emulate by masking J to a block-banded sparsity then forming A
    A = np.zeros((n, n))
    for f in range(F):
        for fp in range(max(0, f - bw), min(F, f + bw + 1)):
            blk = rng.normal(size=(D, D))
            A[f * D : (f + 1) * D, fp * D : (fp + 1) * D] = blk
    A = A + A.T  # symmetric banded
    A += (np.abs(A).sum(1).max() + 1.0) * np.eye(n)  # diagonally dominant SPD
    return A


def test_block_penta_solve_matches_dense():
    rng = np.random.default_rng(0)
    for F, D in [(7, 5), (8, 3), (2, 4), (3, 2)]:
        A = _random_banded_spd(F, D, 2, rng)
        b = rng.normal(size=(F * D,))
        diag = np.stack([A[f * D : (f + 1) * D, f * D : (f + 1) * D] for f in range(F)])
        lo1 = np.zeros((F, D, D))
        lo2 = np.zeros((F, D, D))
        for f in range(F - 1):
            lo1[f] = A[(f + 1) * D : (f + 2) * D, f * D : (f + 1) * D]
        for f in range(F - 2):
            lo2[f] = A[(f + 2) * D : (f + 3) * D, f * D : (f + 1) * D]
        x = banded.block_penta_solve(
            jnp.asarray(diag), jnp.asarray(lo1), jnp.asarray(lo2),
            jnp.asarray(b.reshape(F, D)),
        )
        expect = np.linalg.solve(A, b)
        np.testing.assert_allclose(np.asarray(x).reshape(-1), expect, rtol=1e-8)


@pytest.fixture(scope="module")
def traj_problem():
    skel, _, _ = bvh.load(
        "/root/reference/src/skeleton_fitting/combined_body_25.bvh"
    )
    parents = tuple(skel.parents)
    J = skel.num_joints
    F = 11
    rng = np.random.default_rng(1)
    pose3d = rng.normal(0, 30, (F, 28, 3))
    root = np.cumsum(rng.normal(0, 1, (F, 3)), 0) + np.array([0, 100, 300.0])
    conf = rng.uniform(0.3, 1.0, (F, 28))
    conf[:, 25:] = 0
    vc = (rng.uniform(size=(F, 28)) < 0.2).astype(np.float64)
    pw, dw = traj_lib.build_weights(conf)
    targets = pose3d[:, np.asarray(defs.COMBINED_SKEL_TO_DATA)] + root[:, None]
    offsets = traj_lib.update_skeleton(np.asarray(skel.offsets), parents, targets)
    data = TrajectoryData(
        jnp.asarray(pose3d), jnp.asarray(root),
        jnp.asarray(rng.normal(0, 0.3, (F, 28, 2))),
        jnp.asarray(pw), jnp.asarray(dw),
        jnp.asarray(defs.COMBINED_SMOOTH_WEIGHTS, jnp.float64),
        jnp.asarray(vc), jnp.asarray(np.array([0.0, 1.0, 0.0])),
        jnp.asarray(np.zeros(3)), jnp.asarray(offsets),
    )
    x0 = jnp.asarray(
        np.concatenate(
            [root, rng.normal(0, 0.1, (F, J * 3))], axis=-1
        ).reshape(-1)
    )
    return parents, data, x0, F, 3 + J * 3


@pytest.mark.slow
def test_banded_jtj_matches_dense_jacobian(traj_problem):
    parents, data, x0, F, D = traj_problem
    w = traj_lib.STAGE2

    def res(x):
        return trajectory_residuals(x, data, w, parents)

    Jd = jax.jacfwd(res)(x0)
    A = np.asarray(Jd.T @ Jd)

    _, vjp = jax.vjp(res, x0)

    def jtjv(v):
        _, Jv = jax.jvp(res, (x0,), (v,))
        return vjp(Jv)[0]

    masks = banded.coloring_masks(F, D, 2, x0.dtype)
    U0, L1, L2 = banded.banded_jtj(jtjv, masks, F, D, 2)
    for f in range(F):
        np.testing.assert_allclose(
            np.asarray(U0[f]), A[f * D : (f + 1) * D, f * D : (f + 1) * D],
            atol=1e-8 * max(1.0, np.abs(A).max()),
        )
    for f in range(F - 1):
        np.testing.assert_allclose(
            np.asarray(L1[f]), A[(f + 1) * D : (f + 2) * D, f * D : (f + 1) * D],
            atol=1e-8 * max(1.0, np.abs(A).max()),
        )
    for f in range(F - 2):
        np.testing.assert_allclose(
            np.asarray(L2[f]), A[(f + 2) * D : (f + 3) * D, f * D : (f + 1) * D],
            atol=1e-8 * max(1.0, np.abs(A).max()),
        )
    # and nothing beyond the band
    for f in range(F - 3):
        blk = A[(f + 3) * D : (f + 4) * D, f * D : (f + 1) * D]
        assert np.abs(blk).max() < 1e-8 * max(1.0, np.abs(A).max())


@pytest.mark.slow
def test_lm_banded_converges_like_cg(traj_problem):
    parents, data, x0, F, D = traj_problem
    w = traj_lib.STAGE1

    def residual(x, d, tw):
        return trajectory_residuals(x, d, tw, parents)

    cfg = LMConfig(max_iters=12, cg_iters=120)
    masks = frame_coloring_masks(F, D, dtype=x0.dtype)
    _, c_cg = lm_solve(residual, x0, (data, w), cfg, diag_masks=masks)
    _, c_banded = lm_solve(residual, x0, (data, w), cfg, banded_spec=(F, D))
    c0 = 0.5 * float(jnp.vdot(residual(x0, data, w), residual(x0, data, w)))
    assert float(c_banded) < 0.7 * c0  # actually optimizes
    # the exact solve should do at least as well as (well-converged) PCG,
    # up to a small slack for different accept/reject trajectories
    assert float(c_banded) <= 1.05 * float(c_cg)
