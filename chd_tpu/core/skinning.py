"""Linear-blend skinning and wrapped-angle helpers.

Rounds out the core animation library with the remaining reference
capabilities: LBS mesh skinning (Animation.skin, ik/Animation.py:623-640 —
used by the ICP mesh-fitting solver) and the wrapped-angle container
semantics of ik/Pivots.py (angles kept in (−π, π]).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import quat
from .fk import fk


def skin(anim, rest_anim, vertex_weights, mesh, maxjoints: int = 4):
    """Linear-blend skin mesh vertices through an animation.

    anim/rest_anim: posed and rest Animations (same skeleton);
    vertex_weights: (V, J) skinning weights; mesh: (V, 3) rest vertices.
    Uses the top-``maxjoints`` weights per vertex (like the reference).
    Returns (F, V, 3).
    """
    w = jnp.asarray(vertex_weights)
    V, J = w.shape
    k = min(maxjoints, J)
    top_w, top_idx = _topk(w, k)
    # guard all-zero weight rows (unskinned prop vertices): leave them bound
    # rigidly to joint 0 rather than emitting NaNs
    wsum = jnp.sum(top_w, axis=1, keepdims=True)
    top_w = jnp.where(wsum > 0, top_w / jnp.maximum(wsum, 1e-12), 0.0)
    top_w = top_w.at[:, 0].set(jnp.where(wsum[:, 0] > 0, top_w[:, 0], 1.0))

    # rest frame 0 defines the bind pose (only that frame's FK is needed)
    gq_r, gp_r = fk(
        jnp.asarray(rest_anim.rotations)[:1], jnp.asarray(rest_anim.positions)[:1],
        rest_anim.parents,
    )
    gq_p, gp_p = fk(jnp.asarray(anim.rotations), jnp.asarray(anim.positions), anim.parents)

    bind_q = gq_r[0]  # (J, 4)
    bind_p = gp_r[0]

    mesh = jnp.asarray(mesh)
    # vertex expressed in each influencing joint's bind-local frame
    local = quat.rotate(
        quat.conjugate(bind_q[top_idx]), mesh[:, None, :] - bind_p[top_idx]
    )  # (V, k, 3)

    posed = quat.rotate(gq_p[:, top_idx], local[None]) + gp_p[:, top_idx]  # (F, V, k, 3)
    return jnp.sum(posed * top_w[None, :, :, None], axis=2)


def _topk(w, k):
    idx = jnp.argsort(-w, axis=1)[:, :k]
    vals = jnp.take_along_axis(w, idx, axis=1)
    return vals, idx


def wrap_angles(a):
    """Wrap to (−π, π] (ik/Pivots.py semantics)."""
    pi = jnp.pi
    return -((-a + pi) % (2 * pi) - pi)
