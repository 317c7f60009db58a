"""ICP mesh-fitting IK (reference InverseKinematics.ICP:578-733).

Fits an animation so its linear-blend-skinned mesh matches per-frame goal
point clouds: damped-least-squares on euler+translation variables with a
skinning-weighted Jacobian, optionally re-associating goal points by
nearest neighbor each iteration. Unused by the reference pipeline but part
of its animation-library surface; here it is one jit per iteration with
batched per-frame solves.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import quat
from ..core.fk import fk
from ..core.skeleton import descendants_mask
from ..core.skinning import _topk
from .ik import IKConfig, _axis_columns


def solve_icp(
    anim,
    rest_anim,
    vertex_weights,
    mesh,
    goal,
    cfg: IKConfig = IKConfig(iterations=10, damping=10.0, translate=True),
    maxjoints: int = 4,
    find_closest: bool = True,
):
    """anim/rest_anim: posed/rest Animations; vertex_weights (V, J);
    mesh (V, 3) rest vertices; goal (F, V, 3) target clouds."""
    from ..core.skinning import skin

    parents = tuple(anim.parents)
    J = anim.num_joints
    F = anim.num_frames
    dtype = jax.dtypes.canonicalize_dtype(np.result_type(anim.rotations))

    w_all = jnp.asarray(vertex_weights, dtype)
    top_w, top_idx = _topk(w_all, min(maxjoints, J))
    top_w = top_w / jnp.sum(top_w, axis=1, keepdims=True)

    dsc = jnp.asarray(descendants_mask(parents), dtype) + jnp.eye(J, dtype=dtype)
    goal = jnp.asarray(goal, dtype)
    V = goal.shape[1]

    ndof = J * 3 * (2 if cfg.translate else 1)
    lam = cfg.damping * jnp.ones((ndof,), dtype)
    D = jnp.diag(lam * lam)

    rot = jnp.asarray(anim.rotations, dtype)
    pos = jnp.asarray(anim.positions, dtype)

    # per-vertex joint gate: vertex v is moved by joint j's dofs iff j is an
    # ancestor-or-self of one of its influencing joints, weighted by skinning
    gate = jnp.einsum("jk,vk->vj", dsc[:, :], jnp.zeros((V, J), dtype).at[
        jnp.arange(V)[:, None], top_idx].set(top_w))  # (V, J)

    @jax.jit
    def iteration(rot, pos):
        gq, gp = fk(rot, pos, parents)
        curr = skin(
            anim.replace(rotations=rot, positions=pos), rest_anim,
            vertex_weights, mesh, maxjoints,
        )  # (F, V, 3)

        if find_closest:
            d2 = jnp.sum(
                (curr[:, :, None, :] - goal[:, None, :, :]) ** 2, axis=-1
            )  # (F, V, V)
            nearest = jnp.argmin(d2, axis=2)
            tgt = jnp.take_along_axis(goal, nearest[..., None], axis=1)
        else:
            tgt = goal
        e = cfg.gamma * (tgt - curr).reshape(F, V * 3)

        x = quat.to_euler(rot, "xyz").reshape(F, J * 3)
        if cfg.translate:
            x = jnp.concatenate([x, pos.reshape(F, J * 3)], axis=-1)

        parent_rot = gq[:, list(parents)]
        parent_rot = parent_rot.at[:, 0].set(
            jnp.broadcast_to(quat.identity((), dtype), (F, 4))
        )
        axes = _axis_columns(x[:, : J * 3].reshape(F, J, 3), parent_rot)  # (F, J, 3, 3)

        # rotation block: for vertex v, joint j, axis a:
        # gate[v, j] · (axis × (v_pos − p_j))
        diff = curr[:, None, :, :] - gp[:, :, None, :]  # (F, J, V, 3)
        jrot = jnp.cross(
            axes[:, :, :, None, :], (gate.T)[None, :, None, :, None] * diff[:, :, None, :, :]
        )  # (F, J, 3, V, 3)
        Jm = jrot.reshape(F, J * 3, V * 3).transpose(0, 2, 1)
        if cfg.translate:
            taxes = axes * 0 + jnp.stack(
                [
                    quat.rotate(parent_rot, jnp.asarray([1.0, 0, 0], dtype)),
                    quat.rotate(parent_rot, jnp.asarray([0.0, 1, 0], dtype)),
                    quat.rotate(parent_rot, jnp.asarray([0.0, 0, 1], dtype)),
                ],
                axis=-2,
            )
            jt = (gate.T)[None, :, None, :, None] * taxes[:, :, :, None, :]
            jt = jt.reshape(F, J * 3, V * 3).transpose(0, 2, 1)
            Jm = jnp.concatenate([Jm, jt], axis=-1)

        JtJ = jnp.einsum("fij,fik->fjk", Jm, Jm)
        dx = jnp.linalg.solve(JtJ + D, jnp.einsum("fij,fi->fj", Jm, e)[..., None])[..., 0]
        x = x + dx
        new_rot = quat.from_euler(x[:, : J * 3].reshape(F, J, 3), "xyz", world=True)
        new_pos = x[:, J * 3 :].reshape(F, J, 3) if cfg.translate else pos
        return new_rot, new_pos

    for _ in range(cfg.iterations):
        rot, pos = iteration(rot, pos)
    return anim.replace(rotations=rot, positions=pos)
