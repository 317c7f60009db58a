"""Vectorized low-confidence gap filling for 2D keypoint tracks.

Replaces the reference's per-joint per-frame Python while-loop
(src/contact_learning/data/openpose_dataset.py:49-111, ``process_openpose_data``)
with one jit-compiled pass: for every (frame, joint) below the confidence
threshold, linearly interpolate x/y from the nearest valid frames on either
side; clamp-copy at sequence edges; leave everything untouched if the whole
track is invalid.

TPU note: this is deliberately GATHER-FREE. Nearest-valid values/indices
come from two "keep the latest valid sample" associative scans over the
frame axis (forward + flipped), carrying packed [x, y, frame_idx, flag]
lanes — log₂(F) elementwise steps batched over all videos/joints at once.
The obvious take_along_axis formulation costs ~20× more on v5e (TPU
gathers along a non-minor axis serialize badly).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def fill_low_confidence(joints2d, confidence, thresh: float = 0.2):
    """Fill sub-threshold detections by temporal linear interpolation.

    Args:
      joints2d:   (..., F, J, 2) pixel coordinates (any leading batch dims).
      confidence: (..., F, J) detection confidences.
      thresh:     validity threshold (reference default 0.2).

    Returns:
      Same shape as joints2d; invalid spans interpolated/edge-copied,
      matching the reference loop's output exactly.
    """
    x = joints2d
    F = x.shape[-3]
    axis = x.ndim - 3  # frame axis
    valid = confidence >= thresh
    vf = valid[..., None].astype(x.dtype)
    idx_shape = [1] * x.ndim
    idx_shape[axis] = F
    idx = jnp.arange(F, dtype=x.dtype).reshape(idx_shape)

    # packed lanes: [x, y, frame_idx, valid_flag]; invalid rows zeroed so the
    # scan's identity element is a zero flag
    packed = jnp.concatenate(
        [x, jnp.broadcast_to(idx, x[..., :1].shape), vf], axis=-1
    )
    packed = packed * vf  # zero out invalid entries (flag included)

    def keep_latest_valid(a, b):
        return jnp.where(b[..., 3:4] > 0, b, a)

    fwd = jax.lax.associative_scan(keep_latest_valid, packed, axis=axis)
    bwd = jnp.flip(
        jax.lax.associative_scan(
            keep_latest_valid, jnp.flip(packed, axis=axis), axis=axis
        ),
        axis=axis,
    )

    v_prev, i_prev, has_prev = fwd[..., :2], fwd[..., 2], fwd[..., 3] > 0
    v_next, i_next, has_next = bwd[..., :2], bwd[..., 2], bwd[..., 3] > 0

    t = idx[..., 0]
    denom = jnp.maximum(i_next - i_prev, 1.0)
    w = ((t - i_prev) / denom)[..., None]
    interp = (1.0 - w) * v_prev + w * v_next

    hp = has_prev[..., None]
    hn = has_next[..., None]
    filled = jnp.where(hp & hn, interp, jnp.where(hp, v_prev, jnp.where(hn, v_next, x)))
    return jnp.where(valid[..., None], x, filled)


@jax.jit
def preprocess_keypoints(op_data, thresh: float = 0.2, normalization: float = 1.0):
    """Gap-fill + pixel normalization in one fused pass.

    op_data: (..., F, J, 3) [x, y, confidence] → same shape; x/y gap-filled
    and divided by ``normalization`` (reference normalize_openpose_data:
    113-121), confidence untouched. Batch dims welcome.
    """
    xy = fill_low_confidence(op_data[..., :2], op_data[..., 2], thresh)
    xy = xy / normalization
    return jnp.concatenate([xy, op_data[..., 2:3]], axis=-1)
