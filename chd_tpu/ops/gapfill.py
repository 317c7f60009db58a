"""Vectorized low-confidence gap filling for 2D keypoint tracks.

Replaces the reference's per-joint per-frame Python while-loop
(src/contact_learning/data/openpose_dataset.py:49-111, ``process_openpose_data``)
with one jit-compiled pass: for every (frame, joint) below the confidence
threshold, linearly interpolate x/y from the nearest valid frames on either
side; clamp-copy at sequence edges; leave everything untouched if the whole
track is invalid. Scans over the frame axis only — O(F) with static shapes,
vmappable over joints and videos.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _prev_valid_scan(valid):
    """prev[t] = last index <= t with valid True, else -1. (F,) int32."""
    F = valid.shape[0]
    idx = jnp.arange(F, dtype=jnp.int32)
    marks = jnp.where(valid, idx, -1)
    return jax.lax.associative_scan(jnp.maximum, marks)


def fill_low_confidence(joints2d, confidence, thresh: float = 0.2):
    """Fill sub-threshold detections by temporal linear interpolation.

    Args:
      joints2d:   (F, J, 2) pixel coordinates.
      confidence: (F, J) detection confidences.
      thresh:     validity threshold (reference default 0.2).

    Returns:
      (F, J, 2) with invalid spans interpolated/edge-copied, matching the
      reference loop's output exactly.
    """
    valid = confidence >= thresh  # (F, J); reference treats `< thresh` as bad
    F = joints2d.shape[0]
    idx = jnp.arange(F, dtype=jnp.int32)

    prev_v = jax.vmap(_prev_valid_scan, in_axes=1, out_axes=1)(valid)  # (F, J)
    nxt_marks = jnp.where(valid, idx[:, None], F)
    next_v = jax.vmap(
        lambda m: jax.lax.associative_scan(jnp.minimum, m, reverse=True),
        in_axes=1,
        out_axes=1,
    )(nxt_marks)  # (F, J)

    has_prev = prev_v >= 0
    has_next = next_v < F
    prev_c = jnp.clip(prev_v, 0, F - 1)
    next_c = jnp.clip(next_v, 0, F - 1)

    take = jnp.take_along_axis  # gather per joint along frames
    v_prev = take(joints2d, prev_c[..., None].repeat(2, -1), axis=0)
    v_next = take(joints2d, next_c[..., None].repeat(2, -1), axis=0)

    denom = jnp.maximum(next_v - prev_v, 1).astype(joints2d.dtype)
    w = (idx[:, None] - prev_v).astype(joints2d.dtype) / denom  # (F, J)
    interp = (1.0 - w[..., None]) * v_prev + w[..., None] * v_next

    filled = jnp.where(
        (has_prev & has_next)[..., None],
        interp,
        jnp.where(has_prev[..., None], v_prev, jnp.where(has_next[..., None], v_next, joints2d)),
    )
    return jnp.where(valid[..., None], joints2d, filled)


@jax.jit
def preprocess_keypoints(op_data, thresh: float = 0.2, normalization: float = 1.0):
    """Gap-fill + pixel normalization in one fused pass.

    op_data: (F, J, 3) [x, y, confidence] → same shape; x/y gap-filled and
    divided by ``normalization`` (reference normalize_openpose_data:113-121),
    confidence untouched.
    """
    xy = fill_low_confidence(op_data[..., :2], op_data[..., 2], thresh)
    xy = xy / normalization
    return jnp.concatenate([xy, op_data[..., 2:3]], axis=-1)
