"""Secondary IK solvers: direction-matching IK and the plain DLS solver.

Completes the reference's IK family (src/skeleton_fitting/ik/
InverseKinematics.py): the pipeline's workhorse CK variant lives in
kinematics/ik.py; this module provides

- ``solve_basic_ik`` — BasicInverseKinematics (:9-107): per-joint rotations
  aligning current child directions to target directions, averaged in the
  quaternion log-space, applied joint-by-joint down the tree;
- ``solve_jacobian_ik`` — JacobianInverseKinematics (:110-324): damped
  least squares with an optional nullspace-projected secondary task pulling
  ALL joints toward reference positions.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import quat
from ..core.fk import fk
from ..core.skeleton import children_list, descendants_mask
from .ik import IKConfig, _build_jacobian


def solve_basic_ik(anim, target_positions, iterations: int = 1):
    """Direction-matching IK toward full-body target positions (F, J, 3)."""
    parents = tuple(anim.parents)
    J = anim.num_joints
    children = children_list(parents)
    rot = jnp.asarray(anim.rotations)
    pos = jnp.asarray(anim.positions)
    tgt = jnp.asarray(target_positions, rot.dtype)

    for _ in range(iterations):
        for j in range(J):
            c = children[j]
            if len(c) == 0:
                continue
            gq, gp = fk(rot, pos, parents)
            jdirs = gp[:, c] - gp[:, j : j + 1]
            ddirs = tgt[:, c] - gp[:, j : j + 1]
            jn = jdirs / (jnp.linalg.norm(jdirs, axis=-1, keepdims=True) + 1e-10)
            dn = ddirs / (jnp.linalg.norm(ddirs, axis=-1, keepdims=True) + 1e-10)
            angles = jnp.arccos(jnp.clip(jnp.sum(jn * dn, axis=-1), -1.0, 1.0))
            axes = jnp.cross(jn, dn)
            # express the axis in the joint's local frame (reference :91)
            axes = quat.rotate(quat.conjugate(gq[:, j : j + 1]), axes)
            rots = quat.from_angle_axis(angles, axes)  # (F, C, 4)
            if len(c) == 1:
                avg = rots[:, 0]
            else:
                avg = quat.exp(jnp.mean(quat.log(rots), axis=-2))
            rot = rot.at[:, j].set(quat.mul(rot[:, j], avg))
    return anim.replace(rotations=rot, positions=pos)


def solve_jacobian_ik(
    anim,
    targets: Dict[int, np.ndarray],
    cfg: IKConfig = IKConfig(),
    reference_positions: Optional[np.ndarray] = None,
    secondary: float = 0.25,
    weights: Optional[np.ndarray] = None,
):
    """Plain damped-least-squares IK with optional positional secondary task.

    reference_positions: (F, J, 3) — the result is biased toward them in the
    nullspace of the primary targets (reference :297-309)."""
    parents = tuple(anim.parents)
    J = anim.num_joints
    F = anim.num_frames
    dtype = jax.dtypes.canonicalize_dtype(np.result_type(anim.rotations))

    tidx = tuple(sorted(targets.keys()))
    tpos = jnp.stack([jnp.asarray(targets[t], dtype) for t in tidx], axis=1)
    rot = jnp.asarray(anim.rotations, dtype)
    pos = jnp.asarray(anim.positions, dtype)
    refs = (
        jnp.asarray(reference_positions, dtype)
        if reference_positions is not None
        else None
    )

    dsc = jnp.asarray(descendants_mask(parents), dtype)
    tdsc = dsc + jnp.eye(J, dtype=dtype)
    w = jnp.repeat(jnp.asarray(weights, dtype) if weights is not None else jnp.ones(J, dtype), 3)
    if cfg.translate:
        w = jnp.concatenate([w, jnp.ones(J * 3, dtype)])
    lam = cfg.damping * (1.0 / (w + 0.001))
    D = jnp.diag(lam * lam)

    def gated(cols):
        tc = jnp.asarray(list(cols))
        return (
            jnp.broadcast_to(dsc[:, None, tc], (J, 3, len(cols))),
            jnp.broadcast_to(tdsc[:, None, tc], (J, 3, len(cols))),
        )

    d1, t1 = gated(tidx)
    if refs is not None:
        d2, t2 = gated(range(J))

    for _ in range(cfg.iterations):
        gq, gp = fk(rot, pos, parents)
        x = quat.to_euler(rot, "xyz").reshape(F, J * 3)
        if cfg.translate:
            x = jnp.concatenate([x, pos.reshape(F, J * 3)], axis=-1)

        Jm = _build_jacobian(x[:, : J * 3].reshape(F, J, 3), gq, gp, tidx, d1, t1,
                             parents, cfg.translate)
        e = cfg.gamma * (tpos.reshape(F, -1) - gp[:, jnp.asarray(tidx)].reshape(F, -1))
        JtJ = jnp.einsum("fij,fik->fjk", Jm, Jm)
        A = JtJ + D
        dx = jnp.linalg.solve(A, jnp.einsum("fij,fi->fj", Jm, e)[..., None])[..., 0]

        if refs is not None:
            ns = jnp.eye(x.shape[1], dtype=dtype)[None] - jnp.linalg.solve(A, JtJ)
            J2 = _build_jacobian(x[:, : J * 3].reshape(F, J, 3), gq, gp,
                                 tuple(range(J)), d2, t2, parents, cfg.translate)
            e2 = secondary * (refs.reshape(F, -1) - gp.reshape(F, -1))
            J2tJ2 = jnp.einsum("fij,fik->fjk", J2, J2)
            dx2 = jnp.linalg.solve(
                J2tJ2 + D, jnp.einsum("fij,fi->fj", J2, e2)[..., None]
            )[..., 0]
            dx = dx + jnp.einsum("fij,fj->fi", ns, dx2)

        x = x + dx
        rot = quat.from_euler(x[:, : J * 3].reshape(F, J, 3), "xyz", world=True)
        if cfg.translate:
            pos = x[:, J * 3 :].reshape(F, J, 3)

    return anim.replace(rotations=rot, positions=pos)
