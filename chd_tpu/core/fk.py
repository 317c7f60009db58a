"""Forward kinematics as pure, jit/vmap-friendly functions.

TPU-first redesign of the reference FK (Animation.transforms_global,
src/skeleton_fitting/ik/Animation.py:379-413): instead of sequential 4×4
matrix chains, we propagate (quaternion, translation) pairs down the tree
with an unrolled loop over the (static, small) joint axis. Every step is a
batched elementwise op over the frame/batch axes, which XLA fuses; there is
no data-dependent control flow, so the whole thing vmaps over sequences.

Semantics note (parity-critical): like the reference, FK consumes
``rotations`` and per-frame local ``positions`` only — rest-pose ``orients``
are NOT folded in (see transforms_local, Animation.py:294-323).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from . import quat


def fk(rotations, positions, parents: Sequence[int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global (rotations, positions) for every joint.

    Args:
      rotations: (..., J, 4) local joint rotations (wxyz).
      positions: (..., J, 3) local joint translations.
      parents:   static parent indices, topologically ordered.

    Returns:
      (global_q (..., J, 4), global_p (..., J, 3))
    """
    J = rotations.shape[-2]
    gq = [None] * J
    gp = [None] * J
    gq[0] = rotations[..., 0, :]
    gp[0] = positions[..., 0, :]
    for j in range(1, J):
        p = parents[j]
        gq[j] = quat.mul(gq[p], rotations[..., j, :])
        gp[j] = gp[p] + quat.rotate(gq[p], positions[..., j, :])
    return jnp.stack(gq, axis=-2), jnp.stack(gp, axis=-2)


def positions_global(rotations, positions, parents) -> jnp.ndarray:
    """Global joint positions (reference Animation.positions_global:416-438)."""
    return fk(rotations, positions, parents)[1]


def rotations_global(rotations, positions, parents) -> jnp.ndarray:
    return fk(rotations, positions, parents)[0]


def transforms_global(rotations, positions, parents) -> jnp.ndarray:
    """(..., J, 4, 4) homogeneous global transforms, for parity checking."""
    gq, gp = fk(rotations, positions, parents)
    m = quat.to_matrix(gq)
    top = jnp.concatenate([m, gp[..., None]], axis=-1)  # (..., J, 3, 4)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def fk_anim(anim) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FK over a core.animation.Animation."""
    return fk(anim.rotations, anim.positions, anim.parents)
