"""Sliding-window featurization for contact detection.

Replaces the reference's per-window __getitem__ slicing + root normalization
(src/contact_learning/data/real_video_dataset.py:206-276 and
openpose_dataset.py:277-363) with a single gather-based op that materializes
every window of a video at once — the natural TPU layout (one batched matmul
feeds the MLP with all windows).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def num_windows(num_frames: int, window_size: int) -> int:
    """Overlapping windows: every frame except the edges is a target frame
    (real_video_dataset.py:133)."""
    return num_frames - 2 * (window_size // 2)


def extract_windows(x, window_size: int):
    """All overlapping windows along the leading frame axis.

    x: (F, ...) → (F - W + 1, W, ...). Gather-based; XLA turns this into a
    cheap strided read.
    """
    F = x.shape[0]
    n = F - window_size + 1
    starts = jnp.arange(n)[:, None] + jnp.arange(window_size)[None, :]
    return x[starts]


def root_normalize_windows(win, root_joint: int):
    """Per-window root normalization (openpose_dataset.py:329-337).

    win: (N, W, J, C) with C >= 2 ([x, y, conf?]). Subtracts the TARGET
    (middle) frame's root x/y from every joint in the window, then writes the
    absolute root back into the target frame's root slot only.
    """
    W = win.shape[1]
    mid = W // 2
    tgt_root = win[:, mid, root_joint, :2]  # (N, 2)
    xy = win[..., :2] - tgt_root[:, None, None, :]
    xy = xy.at[:, mid, root_joint, :].set(tgt_root)
    return jnp.concatenate([xy, win[..., 2:]], axis=-1)


def featurize_batch(
    x,
    window_size: int,
    root_in_subset: int,
    use_confidence: bool = True,
):
    """Batched, gather-free featurization for already-subset keypoints.

    x: (V, F, J, 3) preprocessed keypoints restricted to the model's joint
    subset (root at index ``root_in_subset``) → (V, N, W, J, feat).

    Semantics identical to vmapping :func:`featurize_video` over videos
    (reference real_video_dataset.py:206-276), but the windows come from W
    static shifted slices instead of one (N, W) gather — on TPU a gather
    along the non-minor frame axis serializes badly (measured ~6× slower at
    V=1024 on v5e), while shifted slices lower to plain strided copies that
    XLA fuses into the consumer.
    """
    V, F = x.shape[:2]
    N = F - window_size + 1
    mid = window_size // 2
    wins = jnp.stack([x[:, w : w + N] for w in range(window_size)], axis=2)
    r = x[:, mid : mid + N, root_in_subset, :2]  # (V, N, 2) target roots
    xy = wins[..., :2] - r[:, :, None, None, :]
    xy = xy.at[:, :, mid, root_in_subset, :].set(r)
    if not use_confidence:
        return xy
    return jnp.concatenate([xy, wins[..., 2:]], axis=-1)


def layer1_conv_kernel(
    w1,
    window_size: int,
    n_joints: int,
    root_idx: int,
    n_model_joints: int,
    use_confidence: bool = True,
):
    """Fold window featurization + the MLP's first layer into ONE temporal
    conv kernel — the window tensor is never materialized.

    The featurized window is linear in the per-frame keypoints: every xy
    entry is ``u[n+w, j, c] - r[n, c]`` with ``r[n, c] = u[n+mid, root, c]``
    (windows.featurize_batch), and the mid-frame root slot holds ``r``
    itself. Hence ``W1 @ f[n] = Σ_w K_w @ u[n+w]`` where K equals W1 laid
    out per-tap, with the root-normalization correction
    ``S[o, c] = Σ_(w,j)≠(mid,root) W1[o, w, j, c]`` (c ∈ {x, y}) folded
    into the (mid, root) tap. Layer 1 becomes
    ``lax.conv_general_dilated(u, K, 'VALID')`` — an implicit-GEMM conv on
    the MXU reading the raw (V, F, J, 3) frames once, instead of writing +
    re-reading the 9×-blown-up (V, N, W, J, C) window tensor.

    Args:
      w1: (H, W * n_model_joints * Cm) folded first-layer weights
          (Cm = 3 with confidence, else 2).
      n_joints: joints in the preprocessed input u (model joints first;
          may carry one appended root joint used only for normalization).
      root_idx: root joint index within u's joint axis.
      n_model_joints: joints the model consumes (= n_joints, or
          n_joints - 1 when the root was appended for normalization only).

    Returns:
      (W, n_joints * 3, H) kernel for dimension_numbers ('NWC','WIO','NWC').
    """
    H = w1.shape[0]
    Cm = 3 if use_confidence else 2
    W = window_size
    mid = W // 2
    w1r = w1.reshape(H, W, n_model_joints, Cm)
    K = jnp.zeros((W, n_joints, 3, H), w1.dtype)
    K = K.at[:, :n_model_joints, :Cm, :].set(jnp.transpose(w1r, (1, 2, 3, 0)))
    S = w1r[:, :, :, :2].sum(axis=(1, 2))  # (H, 2)
    if root_idx < n_model_joints:
        # the mid-frame root xy slot holds r itself (no subtraction there)
        S = S - w1r[:, mid, root_idx, :2]
    K = K.at[mid, root_idx, :2, :].add(-S.T)
    return K.reshape(W, n_joints * 3, H)


def featurize_video(
    op_data,
    window_size: int,
    joint_subset: Sequence[int],
    root_joint: int = 8,
    use_confidence: bool = True,
):
    """(F, 25, 3) preprocessed keypoints → (N, W, |subset|, feat) MLP input.

    Equivalent to running the reference RealVideoDataset __getitem__ for every
    window index, batched. ``joint_subset`` indexes the full 25-joint array
    (characters.defs.OP_JOINT_SUBSETS).
    """
    win = extract_windows(op_data, window_size)  # (N, W, 25, 3)
    win = root_normalize_windows(win, root_joint)
    win = win[:, :, jnp.asarray(list(joint_subset)), :]
    if not use_confidence:
        win = win[..., :2]
    return win
