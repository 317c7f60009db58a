"""Batched multi-sequence kinematic optimization.

vmap/pjit analogue of kinematics/trajectory.optimize_trajectory: the whole
refinement — CK-IK initialization, stage-1 LM, Huber floor fit + contact
pruning, stage-2 LM — runs in lockstep for a padded batch of sequences
(replacing the reference's one-subprocess-per-video kinematic stage,
scripts/run_phys_mocap.py:102-115). Sequences pad to a common frame count
by replicating their last frame (all difference terms vanish on padding).
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..characters import defs
from ..core import quat
from ..core.animation import Animation
from . import floor as floor_lib
from . import trajectory as traj_lib
from .ik import IKConfig, _solve as ik_solve
from .lm import LMConfig, frame_coloring_masks, lm_solve
from .residuals import TrajectoryData, residual_fn_for, trajectory_residuals


def _pad_frames(a: np.ndarray, F: int) -> np.ndarray:
    if a.shape[0] >= F:
        return a[:F]
    reps = np.repeat(a[-1:], F - a.shape[0], axis=0)
    return np.concatenate([a, reps], axis=0)


def ik_init_batch(arrs, *, parents, ik_cfg):
    """The vmapped CK-IK initialization exactly as :func:`_refine_core` runs
    it — exposed separately so bench.py can lower it at reduced iteration
    counts for cost_analysis()-based FLOP crediting (the fori_loop bodies are
    counted once by XLA's cost analysis, so the per-iteration cost is
    recovered by differencing iterations=1 vs iterations=0 lowerings)."""
    dtype = arrs["pose3d"].dtype
    B, F = arrs["pose3d"].shape[:2]
    J = arrs["offsets"].shape[1]
    s2d = np.asarray(defs.COMBINED_SKEL_TO_DATA)
    spine = set(int(s) for s in defs.COMBINED_SKEL_SPINE_JOINTS)
    tidx = tuple(j for j in range(J) if j not in spine)

    targets_b = (
        arrs["pose3d"][:, :, jnp.asarray(s2d[list(tidx)])] + arrs["root"][:, :, None, :]
    )  # (B, F, T, 3)

    dummy = jnp.zeros((F, J, 3), dtype)
    limits = (jnp.zeros((J * 3,), dtype), jnp.zeros((J * 3,), dtype))
    ones = jnp.ones((J,), dtype)

    def ik_one(rot0, pos0, tgt):
        return ik_solve(
            rot0, pos0, tgt, dummy, limits, ones, ones,
            targets_idx=tidx, parents=parents, cfg=ik_cfg,
            use_reference=False, use_limits=False,
        )

    return jax.vmap(ik_one)(arrs["rot0"], arrs["pos0"], targets_b)


@functools.partial(
    jax.jit, static_argnames=("parents", "ik_cfg", "lm_cfg", "lm_solver")
)
def _refine_core(arrs, w1, w2, *, parents, ik_cfg, lm_cfg, lm_solver="pcg"):
    """The whole batched refinement — IK init → stage-1 LM → floor fit +
    contact pruning → stage-2 LM — as ONE jitted graph.

    One device dispatch per batch instead of hundreds: the eager glue
    (vmapped IRLS floor fit, euler/quat conversions, x0 assembly) costs a
    device round-trip per primitive, which dwarfs the solve when the device
    sits behind a tunnel/remote coordinator (measured 47 s → ~7 s for a
    batch-16×100-frame solve on v5e).
    """
    dtype = arrs["pose3d"].dtype
    B, F = arrs["pose3d"].shape[:2]
    J = arrs["offsets"].shape[1]

    rot_ik, pos_ik = ik_init_batch(arrs, parents=parents, ik_cfg=ik_cfg)

    x0 = jnp.concatenate(
        [pos_ik[:, :, 0], quat.to_euler(rot_ik, "xyz").reshape(B, F, -1)], axis=-1
    ).reshape(B, -1)

    smooth_w = jnp.asarray(defs.COMBINED_SMOOTH_WEIGHTS, dtype)
    zero3 = jnp.zeros(3, dtype)

    def make_data(i_vc, normal, point):
        return TrajectoryData(
            arrs["pose3d"], arrs["root"], arrs["p2dn"], arrs["pw"], arrs["dw"],
            jnp.broadcast_to(smooth_w, (B, 28)), i_vc,
            normal, point, arrs["offsets"], arrs["fmask"],
        )

    residual = residual_fn_for(parents)
    if lm_solver == "banded":
        # exact block-pentadiagonal direct solve (kinematics/banded.py):
        # one batched JtJ band extraction + block-Thomas scan per LM step
        # instead of cg_iters sequential JVP+VJP passes
        kw = dict(banded_spec=(F, 3 + J * 3))
    else:
        kw = dict(diag_masks=frame_coloring_masks(F, 3 + J * 3, dtype=dtype))

    def stage(x0_b, data_b, w):
        return jax.vmap(
            lambda x0, d: lm_solve(residual, x0, (d, w), lm_cfg, **kw)[0]
        )(x0_b, data_b)

    data1 = make_data(
        arrs["vc"], jnp.broadcast_to(zero3, (B, 3)), jnp.broadcast_to(zero3, (B, 3))
    )
    x1 = stage(x0, data1, w1)

    # batched floor fit + contact pruning
    s2d = np.asarray(defs.COMBINED_SKEL_TO_DATA)
    feet_cols = jnp.asarray(s2d[defs.COMBINED_SKEL_FEET_IDX])

    def fit_one(x, offsets, vc):
        from .residuals import data_order_positions

        y, root = data_order_positions(x.reshape(F, -1), offsets, parents)
        pts = (y + root[:, None, :])[:, feet_cols].reshape(-1, 3)
        mask = vc[:, feet_cols].reshape(-1) == 1
        fit = floor_lib.fit_floor(pts[:, jnp.asarray([0, 2])], pts[:, 1], mask, epsilon=1.5)
        fit2 = floor_lib.fit_floor(pts[:, jnp.asarray([0, 2])], pts[:, 1], mask, epsilon=2.2)
        pruned = floor_lib.prune_contacts(vc, feet_cols, fit2.outliers, mask)
        return fit.normal, fit.point, pruned

    normals, points, vc2 = jax.vmap(fit_one)(x1, arrs["offsets"], arrs["vc"])

    data2 = make_data(vc2, normals, points)
    x2 = stage(x1, data2, w2)

    # batched unpack: quaternions + data-order positions for every sequence
    # (keeps the per-sequence python loop free of device round-trips)
    from .residuals import data_order_positions

    xm = x2.reshape(B, F, -1)
    rot_q = quat.from_euler(xm[..., 3:].reshape(B, F, J, 3), "xyz", world=True)
    y_b, root_b = jax.vmap(
        lambda x, o: data_order_positions(x, o, parents)
    )(xm, arrs["offsets"])
    return x2, normals, points, vc2, rot_q, y_b, root_b


def prepare_batch_arrays(
    problems: Sequence[dict],
    skeleton: Animation,
    cam_focal=defs.MTC_FOCAL,
    cam_pp=defs.MTC_PP,
    dtype=jnp.float32,
):
    """Host-side per-sequence prep: bone fit + weights + padding, stacked
    into the arrs dict :func:`_refine_core` consumes. Padded frames carry
    zero weights/constraints AND a zero frame mask, so they contribute no
    residuals (and no floor-fit points) whatsoever. Returns (arrs, F).

    Exposed so bench.py can lower ``_refine_core`` on real inputs for
    cost_analysis()-based FLOP accounting."""
    parents = tuple(skeleton.parents)
    J = skeleton.num_joints
    s2d = np.asarray(defs.COMBINED_SKEL_TO_DATA)
    lens = [p["pose2d"].shape[0] for p in problems]
    F = max(lens)

    stacked = {k: [] for k in [
        "pose3d", "root", "p2dn", "pw", "dw", "vc", "offsets", "rot0", "pos0", "fmask"]}
    for p in problems:
        Fi = p["pose2d"].shape[0]
        targets = p["pose3d"][:, s2d] + p["root_pos"][:, None, :]
        offsets = traj_lib.update_skeleton(np.asarray(skeleton.offsets), parents, targets)
        pw, dw = traj_lib.build_weights(p["conf2d"])
        p2dn = (p["pose2d"] - np.asarray(cam_pp)[None, None]) / np.asarray(cam_focal)[None, None]
        rot0 = traj_lib.init_rotations_from_smpl(p["smpl_angles"])
        pos0 = np.broadcast_to(offsets[None], (Fi, J, 3)).copy()
        pos0[:, 0] = p["root_pos"]
        zeros_after = np.concatenate([np.ones(Fi), np.zeros(F - Fi)])
        stacked["pose3d"].append(_pad_frames(p["pose3d"], F))
        stacked["root"].append(_pad_frames(p["root_pos"], F))
        stacked["p2dn"].append(_pad_frames(p2dn, F))
        stacked["pw"].append(_pad_frames(pw, F) * zeros_after[:, None])
        stacked["dw"].append(_pad_frames(dw, F) * zeros_after[:, None])
        stacked["vc"].append(_pad_frames(p["vel_constraints"], F) * zeros_after[:, None])
        stacked["offsets"].append(offsets)
        stacked["rot0"].append(_pad_frames(rot0, F))
        stacked["pos0"].append(_pad_frames(pos0, F))
        stacked["fmask"].append(zeros_after)
    return {k: jnp.asarray(np.stack(v), dtype) for k, v in stacked.items()}, F


def optimize_trajectory_batch(
    problems: Sequence[dict],
    skeleton: Animation,
    cam_focal=defs.MTC_FOCAL,
    cam_pp=defs.MTC_PP,
    ik_iterations: int = 200,
    # 40:80 measured quality-identical to the reference-mirroring 50:100
    # (stage-2 cost mean 1569.9 vs 1571.1 on the v5e budget ladder,
    # BASELINE.md) at 1.25x the throughput; 50:100 remains available for
    # bit-level golden comparisons (tests/test_goldens.py pins it).
    lm_cfg: LMConfig = LMConfig(max_iters=40, cg_iters=80),
    mesh=None,
    dtype=jnp.float32,
    ik_solver: str = "cg",  # measured 19x faster than chunked LU on v5e
    # (200-iter batch-16 IK: 0.74s cg vs 13.9s lu — the lax.map'd LU chunks
    # serialize; CG's batched 84x84 matvecs stay on the MXU). "lu" remains
    # available for bit-exactness vs the reference's per-frame lu_solve.
    lm_solver: str = "pcg",  # "banded" = exact block-pentadiagonal direct
    # inner solve (see kinematics/banded.py)
) -> List[traj_lib.TrajectoryResult]:
    """problems: per-sequence dicts with keys pose2d (F,28,2), conf2d (F,28),
    pose3d (F,28,3), root_pos (F,3), smpl_angles (F,J,3),
    vel_constraints (F,28). Returns per-sequence TrajectoryResults (trimmed
    to true lengths)."""
    parents = tuple(skeleton.parents)
    J = skeleton.num_joints
    lens = [p["pose2d"].shape[0] for p in problems]
    arrs, F = prepare_batch_arrays(
        problems, skeleton, cam_focal=cam_focal, cam_pp=cam_pp, dtype=dtype
    )

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        arrs = {k: jax.device_put(v, NamedSharding(mesh, P("data"))) for k, v in arrs.items()}

    x2, normals, points, vc2, rot_q, y_b, root_b = _refine_core(
        arrs, traj_lib.STAGE1, traj_lib.STAGE2,
        parents=parents, ik_cfg=IKConfig(
            iterations=ik_iterations, damping=7.0, solver=ik_solver
        ),
        lm_cfg=lm_cfg, lm_solver=lm_solver,
    )

    # unpack per sequence (pure numpy — all device work happened in the core)
    results = []
    x2_np = np.asarray(x2)
    rot_np = np.asarray(rot_q)
    y_np = np.asarray(y_b)
    root_np = np.asarray(root_b)
    offsets_np = np.asarray(arrs["offsets"])
    vc2_np = np.asarray(vc2)
    normals = np.asarray(normals)
    points = np.asarray(points)
    fx, fy = cam_focal
    cx, cy = cam_pp
    for i, L in enumerate(lens):
        xm = x2_np[i].reshape(F, -1)[:L]
        offsets_i = offsets_np[i]
        rot = rot_np[i, :L]
        pos = np.broadcast_to(offsets_i[None], (L, J, 3)).copy()
        pos[:, 0] = xm[:, :3]
        anim = Animation(rot, pos, np.asarray(skeleton.orients), offsets_i, parents)
        vc_i = vc2_np[i][:L]

        y_i, root_i = y_np[i, :L], root_np[i, :L]
        pose3d_i = np.array(y_i + root_i[:, None, :])
        pose3d_i[:, defs.COMBINED_ROOT_IDX] = np.asarray(root_i)
        proj2d_i = np.stack(
            [
                fx * pose3d_i[..., 0] / pose3d_i[..., 2] + cx,
                fy * pose3d_i[..., 1] / pose3d_i[..., 2] + cy,
            ],
            axis=-1,
        )
        results.append(
            traj_lib.TrajectoryResult(
                anim=anim,
                pose3d=pose3d_i,
                proj2d=proj2d_i,
                floor_normal=np.asarray(normals[i]),
                floor_point=np.asarray(points[i]),
                vel_constraints=vc_i,
                refined_contacts=traj_lib.refine_contact_labels(vc_i),
            )
        )
    return results
