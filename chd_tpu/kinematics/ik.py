"""Batched Choi–Ko damped-least-squares inverse kinematics.

The workhorse IK of the whole pipeline — the reference uses
``JacobianInverseKinematicsCK`` (src/skeleton_fitting/ik/InverseKinematics.py
:326-561) for the kinematic-optimizer init (200 iters), Mixamo retargeting
(200 iters) and physics-result re-application (30 iters). Its per-frame
solves are independent, which the reference exploits with a python
``map(lu_solve, ...)`` over frames; here the whole iteration — FK, geometric
Jacobian, damped normal-equation solve, smoothness and reference-pose
nullspace tasks — is one jit graph with a batched ``jnp.linalg.solve`` over
frames, and vmaps again over sequences.

Semantics matched to the reference:
- variables are world-composed 'xyz' euler angles re-extracted each iteration
  (canonicalized), plus optional per-joint translations;
- rotation-axis columns come from the partial world rotations
  (parent ∘ Rz ∘ Ry for the x axis, etc. — :421-428);
- strict-descendant mask gates rotation columns, self+descendants gates
  translation columns (:462-469);
- dx1 = (JᵀJ + D)⁻¹Jᵀe with D = (damping/(w+0.001))² I (:506-512);
- dx2 = smoothness · time-Laplacian of x (:516-527);
- dx3 = nullspace-projected pull toward reference eulers (:529-537);
- optional elementwise angle limits (:541-544).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import quat
from ..core.fk import fk
from ..core.skeleton import descendants_mask


@dataclasses.dataclass(frozen=True)
class IKConfig:
    iterations: int = 10
    damping: float = 2.0
    smoothness: float = 0.0
    translate: bool = False
    gamma: float = 1.0
    # "lu": exact chunked LU (bit-matches the reference's per-frame lu_solve,
    #       InverseKinematics.py:511-512) — kept as the parity oracle;
    # "cg": fixed-iteration Jacobi-preconditioned CG on the SPD normal
    #       matrix. Measured 19× faster than "lu" on v5e (batch-16 × 100
    #       frames × 200 iters: 0.74 s vs 13.9 s) because the lax.map'd LU
    #       chunks serialize while CG's batched 84×84 matvecs stay on the
    #       MXU. The batched/pipeline paths default to "cg".
    solver: str = "lu"
    cg_iters: int = 64


# Frame-chunk size for the per-frame linear solves. XLA's batched
# triangular-solve inverts diagonal blocks in scoped VMEM; thousands of
# (ndof × ndof) factorizations at once (batched sequences × frames) blow the
# 16 MB limit on v5e. Chunking via lax.map keeps the working set bounded
# while staying exact (LU per frame, like the reference's per-frame
# lu_solve loop at InverseKinematics.py:511-512).
SOLVE_CHUNK = 16


def _pcg_solve(A, b, iters: int):
    """Jacobi-preconditioned CG for batched SPD systems A (N,n,n), b (N,n)."""
    inv_d = 1.0 / jnp.maximum(
        jnp.diagonal(A, axis1=-2, axis2=-1), 1e-12
    )  # (N, n)

    def mv(v):
        return jnp.einsum("fij,fj->fi", A, v)

    def body(_, state):
        x, r, z, p, rz = state
        Ap = mv(p)
        denom = jnp.sum(p * Ap, axis=-1, keepdims=True)
        alpha = rz / jnp.maximum(denom, 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_d * r
        rz_new = jnp.sum(r * z, axis=-1, keepdims=True)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, z, p, rz_new

    z0 = inv_d * b
    state = (jnp.zeros_like(b), b, z0, z0, jnp.sum(b * z0, axis=-1, keepdims=True))
    x, *_ = jax.lax.fori_loop(0, iters, body, state)
    return x


def _chunked_solve(A, b):
    """Batched linear solve over the leading axis in fixed-size chunks.

    A: (N, n, n); b: (N, n) or (N, n, k). Exact (LU); sequential over
    ceil(N / SOLVE_CHUNK) steps to bound VMEM under vmap.
    """
    N = A.shape[0]
    vec = b.ndim == 2
    if vec:
        b = b[..., None]
    if N <= SOLVE_CHUNK:
        out = jnp.linalg.solve(A, b)
        return out[..., 0] if vec else out

    pad = (-N) % SOLVE_CHUNK
    if pad:
        eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), (pad,) + A.shape[1:])
        A = jnp.concatenate([A, eye], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad,) + b.shape[1:], b.dtype)], axis=0)
    k = A.shape[0] // SOLVE_CHUNK
    Ac = A.reshape((k, SOLVE_CHUNK) + A.shape[1:])
    bc = b.reshape((k, SOLVE_CHUNK) + b.shape[1:])
    out = jax.lax.map(lambda ab: jnp.linalg.solve(ab[0], ab[1]), (Ac, bc))
    out = out.reshape((k * SOLVE_CHUNK,) + out.shape[2:])[:N]
    return out[..., 0] if vec else out


def _axis_columns(x_euler, parent_rot):
    """World-space rotation axes per (joint, euler axis).

    x_euler: (F, J, 3); parent_rot: (F, J, 4) global parent rotations.
    Returns (F, J, 3, 3): axes for the x/y/z euler dofs of each joint.
    """
    dtype = x_euler.dtype
    ey = jnp.asarray([0.0, 1.0, 0.0], dtype)
    ez = jnp.asarray([0.0, 0.0, 1.0], dtype)
    qy = quat.from_angle_axis(x_euler[..., 1], ey)
    qz = quat.from_angle_axis(x_euler[..., 2], ez)
    pz = quat.mul(parent_rot, qz)
    pzy = quat.mul(pz, qy)
    ax_x = quat.rotate(pzy, jnp.asarray([1.0, 0.0, 0.0], dtype))
    ax_y = quat.rotate(pz, ey)
    ax_z = quat.rotate(parent_rot, ez)
    return jnp.stack([ax_x, ax_y, ax_z], axis=-2)


def _build_jacobian(x_euler, gq, gp, targets_idx, dsc3, tdsc3, parents, translate):
    """(F, 3T, ndof) geometric Jacobian (reference jacobian(), :411-448)."""
    F, J = gq.shape[0], gq.shape[1]
    T = len(targets_idx)
    parent_rot = gq[:, list(parents)]
    parent_rot = parent_rot.at[:, 0].set(
        jnp.broadcast_to(quat.identity((), gq.dtype), (F, 4))
    )

    axes = _axis_columns(x_euler, parent_rot)  # (F, J, 3, 3)
    tps = gp[:, list(targets_idx)]  # (F, T, 3)

    diff = tps[:, None, None, :, :] - gp[:, :, None, None, :]  # (F, J, 1, T, 3)
    gated = dsc3[None, :, :, :, None] * diff  # dsc3 (J, 3, T)
    jrot = jnp.cross(axes[:, :, :, None, :], gated)  # (F, J, 3, T, 3)
    # → rows (t, coord), cols (j, axis)
    jrot = jrot.reshape(F, J * 3, T * 3).transpose(0, 2, 1)

    if not translate:
        return jrot

    taxes = jnp.stack(
        [
            quat.rotate(parent_rot, jnp.asarray([1.0, 0.0, 0.0], gq.dtype)),
            quat.rotate(parent_rot, jnp.asarray([0.0, 1.0, 0.0], gq.dtype)),
            quat.rotate(parent_rot, jnp.asarray([0.0, 0.0, 1.0], gq.dtype)),
        ],
        axis=-2,
    )  # (F, J, 3, 3)
    jt = tdsc3[None, :, :, :, None] * taxes[:, :, :, None, :]  # (F, J, 3, T, 3)
    jt = jt.reshape(F, J * 3, T * 3).transpose(0, 2, 1)
    return jnp.concatenate([jrot, jt], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("targets_idx", "parents", "cfg", "use_reference", "use_limits"),
)
def _solve(
    rotations,
    positions,
    target_pos,
    reference_euler,
    angle_limits,
    weights,
    weights_translate,
    *,
    targets_idx: Tuple[int, ...],
    parents: Tuple[int, ...],
    cfg: IKConfig,
    use_reference: bool,
    use_limits: bool,
):
    F, J = rotations.shape[0], rotations.shape[1]
    T = len(targets_idx)
    dtype = rotations.dtype

    dsc = jnp.asarray(descendants_mask(parents), dtype)  # (J, J) strict
    tdsc = dsc + jnp.eye(J, dtype=dtype)
    tcols = jnp.asarray(list(targets_idx))
    dsc3 = jnp.broadcast_to(dsc[:, None, tcols], (J, 3, T))
    tdsc3 = jnp.broadcast_to(tdsc[:, None, tcols], (J, 3, T))

    w = jnp.repeat(weights, 3)
    if cfg.translate:
        w = jnp.concatenate([w, jnp.repeat(weights_translate, 3)])
    lam = cfg.damping * (1.0 / (w + 0.001))
    D = jnp.diag(lam * lam)
    ndof = w.shape[0]

    endeff = target_pos.reshape(F, T * 3)

    def body(_, carry):
        rot, pos = carry
        gq, gp = fk(rot, pos, parents)
        x = quat.to_euler(rot, "xyz").reshape(F, J * 3)
        if cfg.translate:
            x = jnp.concatenate([x, pos.reshape(F, J * 3)], axis=-1)

        Jm = _build_jacobian(
            x[:, : J * 3].reshape(F, J, 3), gq, gp, targets_idx, dsc3, tdsc3,
            parents, cfg.translate,
        )  # (F, 3T, ndof)
        e = cfg.gamma * (endeff - gp[:, tcols].reshape(F, T * 3))
        JtJ = jnp.einsum("fij,fik->fjk", Jm, Jm)
        A = JtJ + D
        solve = (
            _chunked_solve
            if cfg.solver == "lu"
            else lambda M, v: _pcg_solve(M, v, cfg.cg_iters)
        )
        dx1 = solve(A, jnp.einsum("fij,fi->fj", Jm, e))

        xp = jnp.concatenate([x[:1], x[:-1]], axis=0)
        xa = jnp.concatenate([x[1:], x[-1:]], axis=0)
        dx2 = cfg.smoothness * (xp + xa - 2.0 * x)

        if use_reference:
            # ns[:3J,:3J] @ diff == ((I − A⁻¹JᵀJ) @ [diff; 0])[:3J] — a vector
            # solve instead of materializing the (ndof × ndof) nullspace
            diff = reference_euler.reshape(F, J * 3) - x[:, : J * 3]
            v = (
                jnp.concatenate([diff, jnp.zeros((F, ndof - J * 3), dtype)], axis=-1)
                if cfg.translate
                else diff
            )
            jv = jnp.einsum("fjk,fk->fj", JtJ, v)
            dx3 = v - solve(A, jv)
            if cfg.translate:
                dx3 = dx3.at[:, J * 3 :].set(0.0)
        else:
            dx3 = jnp.zeros_like(x)

        x = x + dx1 + dx2 + dx3
        if use_limits:
            lo, hi = angle_limits
            x = x.at[:, : J * 3].set(jnp.clip(x[:, : J * 3], lo, hi))

        new_rot = quat.from_euler(x[:, : J * 3].reshape(F, J, 3), "xyz", world=True)
        new_pos = x[:, J * 3 :].reshape(F, J, 3) if cfg.translate else pos
        return new_rot, new_pos

    rot, pos = jax.lax.fori_loop(0, cfg.iterations, body, (rotations, positions))
    return rot, pos


def solve_ck_ik(
    anim,
    targets: Dict[int, np.ndarray],
    cfg: IKConfig = IKConfig(),
    references: Optional[np.ndarray] = None,
    angle_limits: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    weights: Optional[np.ndarray] = None,
    weights_translate: Optional[np.ndarray] = None,
):
    """Run CK-IK on an Animation toward per-joint position targets.

    targets: {joint index: (F, 3) world positions}. references: (F, J, 3)
    euler angles for the secondary pull task. Returns a new Animation.
    """
    J = anim.num_joints
    # canonicalize so host float64 arrays don't trigger x64 warnings
    dtype = jax.dtypes.canonicalize_dtype(np.result_type(anim.rotations))
    tidx = tuple(sorted(targets.keys()))
    tpos = jnp.stack([jnp.asarray(targets[t], dtype) for t in tidx], axis=1)

    F = anim.num_frames
    ref = (
        jnp.asarray(references, dtype)
        if references is not None
        else jnp.zeros((F, J, 3), dtype)
    )
    limits = (
        (jnp.asarray(angle_limits[0], dtype), jnp.asarray(angle_limits[1], dtype))
        if angle_limits is not None
        else (jnp.zeros((J * 3,), dtype), jnp.zeros((J * 3,), dtype))
    )
    w = jnp.asarray(weights, dtype) if weights is not None else jnp.ones((J,), dtype)
    wt = (
        jnp.asarray(weights_translate, dtype)
        if weights_translate is not None
        else jnp.ones((J,), dtype)
    )

    rot, pos = _solve(
        jnp.asarray(anim.rotations, dtype),
        jnp.asarray(anim.positions, dtype),
        tpos,
        ref,
        limits,
        w,
        wt,
        targets_idx=tidx,
        parents=tuple(anim.parents),
        cfg=cfg,
        use_reference=references is not None,
        use_limits=angle_limits is not None,
    )
    return anim.replace(rotations=rot, positions=pos)
