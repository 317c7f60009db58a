"""Full-video foot-contact inference.

The TPU-native replacement for the reference's ``test.py --full-video
--save-contacts --real-data`` path (src/contact_learning/test.py:51-219 +
data/real_video_dataset.py): one jit-compiled function goes from raw
``(F, 25, 3)`` OpenPose keypoints to ``(F, 4)`` binary contacts — gap-fill →
normalize → window featurization → BN-folded MLP → sigmoid threshold →
sliding-window vote merge — entirely on device. Batches of videos run via
``vmap`` (padding to the longest video like real_video_dataset.fix_data_len
:165-191); multi-chip sharding is layered on in chd_tpu.parallel.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..characters import defs
from ..models import contact_mlp
from ..ops import gapfill, voting, windows

# Constants matching training of the reference model
# (real_video_dataset.py:17-18)
TRAIN_DIM = (1280, 720)
TRAIN_NORMALIZATION = 200.4160302695367  # median hip→toe pixels in training


def _infer_batch(
    op_batch,
    folded,
    *,
    window_size: int,
    pred_size: int,
    joint_subset: Tuple[int, ...],
    use_confidence: bool,
    conf_thresh: float,
    normalization: float,
    classify_thresh: float,
    use_pallas: bool = False,
    precision: str = "high",
    mlp_dtype=None,
    use_conv: bool = False,
):
    """(V, F, 25, 3) → ((V, F, 4) contacts, (V, N, P, 4) probs).

    TPU-shaped end to end (measured v5e-1, V=1024, F=240: 23.6 → 14.6 ms
    vs the round-2 gather-based formulation):
      - gap-fill runs on the 13 subset joints only — the other 12 joints
        never feed the model, and the gap-fill scans are the pipeline's
        largest HBM consumer;
      - windows come from W static shifted slices (ops.windows.featurize_
        batch), not an (N, W) gather;
      - all windows of all videos flow through the MLP as one flat matmul
        batch at explicit "high" precision (see models.contact_mlp);
      - vote aggregation is one exact 1-D conv (ops.voting.merge_votes_
        batch) instead of lane-starved per-video shifted adds.
    """
    V = op_batch.shape[0]
    # Subsets lacking the root joint (lower_knees/…/upper) still normalize
    # root-relative: featurize subset+[root] and drop the root column after —
    # the reference root-normalizes the full 25-joint array before subsetting
    # (openpose_dataset.py:329-337), so the root slot is discarded there too.
    joints = list(joint_subset)
    root_appended = defs.OP_ROOT_JOINT not in joints
    if root_appended:
        joints = joints + [defs.OP_ROOT_JOINT]
    subset = jnp.asarray(joints)
    root_in_subset = joints.index(defs.OP_ROOT_JOINT)

    x = jax.vmap(
        lambda o: gapfill.preprocess_keypoints(o, conf_thresh, normalization)
    )(op_batch[:, :, subset, :])
    if mlp_dtype is not None:
        # storage-level low precision: halves the activation HBM traffic AND
        # runs single-pass MXU matmuls (vs "high" = 3-pass bf16); gated by
        # the binary-decision tripwire in benchmarks/contact_sweep.py
        folded = jax.tree.map(lambda a: a.astype(mlp_dtype), folded)
    if use_conv and not use_pallas:
        # window featurization + layer 1 folded into ONE temporal conv over
        # raw frames (ops.windows.layer1_conv_kernel): the 9×-materialized
        # (V, N, W, J, C) window tensor never exists
        J = len(joints)
        Jm = J - 1 if root_appended else J
        u = x.reshape(V, x.shape[1], J * 3)
        if mlp_dtype is not None:
            u = u.astype(mlp_dtype)
        K = windows.layer1_conv_kernel(
            folded["w"][0], window_size, J, root_in_subset, Jm, use_confidence
        )
        h = jax.lax.conv_general_dilated(
            u, K, (1,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=None if precision is None else jax.lax.Precision(precision),
        ) + folded["b"][0]
        N = h.shape[1]
        h = jax.nn.relu(h).reshape(V * N, -1)
        logits = contact_mlp.apply_folded_tail(folded, h, pred_size,
                                               precision=precision)
    else:
        feats = windows.featurize_batch(
            x, window_size, root_in_subset, use_confidence
        )  # (V, N, W, J, C)
        if root_appended:
            feats = feats[:, :, :, :-1, :]
        N = feats.shape[1]
        flat = feats.reshape((V * N,) + feats.shape[2:])
        if mlp_dtype is not None:
            flat = flat.astype(mlp_dtype)
        if use_pallas:
            from ..ops.pallas_mlp import fused_mlp

            logits = fused_mlp(folded, flat, pred_size)
        else:
            logits = contact_mlp.apply_folded(folded, flat, pred_size,
                                              precision=precision)
    logits = logits.astype(jnp.float32)
    probs = jax.nn.sigmoid(logits).reshape(V, N, pred_size, 4)
    preds = (probs > classify_thresh).astype(jnp.float32)
    contacts = voting.merge_votes_batch(preds, window_size)
    return contacts, probs


def _infer_one(op_data, folded, **kw):
    """(F, 25, 3) raw keypoints → ((F, 4) contacts, (N, P, 4) window probs)."""
    contacts, probs = _infer_batch(op_data[None], folded, **kw)
    return contacts[0], probs[0]


def _infer_batch_chunked(op_batch, folded, *, max_device_batch: int = 512,
                         **kw):
    """Large batches as ONE dispatch of lax.map over ≤max_device_batch chunks.

    Why: on the benched v5e runtime, identical per-video inputs produce
    deterministically CORRUPTED outputs once on-device intermediates grow
    past a shape threshold — measured exact at V≤768 (max|d| 5e-6 vs a
    V=4 run), wrong by up to 0.42 in probability at V≥1024, with the
    gap-fill stage itself corrupting at V=4096 (814 wrong elements; see
    BASELINE.md "batch-invariance tripwire"). Chunking the video axis is
    mathematically exact (all per-video computation is independent), keeps
    the single-dispatch amortization of a big batch, and pins every
    intermediate to the verified-safe shape range. Padding videos are
    all-zero (gap-fill leaves fully-invalid tracks untouched) and dropped
    after the map.
    """
    V = op_batch.shape[0]
    if V <= max_device_batch:
        return _infer_batch(op_batch, folded, **kw)
    n = -(-V // max_device_batch)
    pad = n * max_device_batch - V
    xp = jnp.pad(op_batch, ((0, pad), (0, 0), (0, 0), (0, 0)))
    xp = xp.reshape((n, max_device_batch) + op_batch.shape[1:])
    contacts, probs = jax.lax.map(lambda c: _infer_batch(c, folded, **kw), xp)
    contacts = contacts.reshape((n * max_device_batch,) + contacts.shape[2:])
    probs = probs.reshape((n * max_device_batch,) + probs.shape[2:])
    return contacts[:V], probs[:V]


class ContactDetector:
    """Holds converted model weights and compiled inference functions."""

    def __init__(
        self,
        params,
        state,
        window_size: int = 9,
        pred_size: int = 5,
        joint_set: str = "lower",
        use_confidence: bool = True,
        conf_thresh: float = 0.2,
        normalization: float = TRAIN_NORMALIZATION,
        classify_thresh: float = 0.5,
        dtype=jnp.float32,
        use_pallas: Optional[bool] = None,
        use_conv: bool = True,
        mlp_dtype=None,
        precision: Optional[str] = "high",
        max_device_batch: int = 512,
    ):
        # Defaults = the measured winner of benchmarks/contact_sweep.py on
        # v5e-1 (round 5, quiet-host run; full table in BASELINE.md): the
        # conv-fused path at precision="high" is the fastest config with
        # EXACT binary agreement (1.0) vs the f64 torch oracle. conv_bf16
        # is faster still but flips 0.37% of labels on the synthetic check
        # set, so bf16 storage stays opt-in via mlp_dtype=jnp.bfloat16.
        # max_device_batch chunks the video axis inside the jitted graph
        # (lax.map): videos beyond ~768 per flat batch hit a measured
        # runtime corruption on v5e (see _infer_batch_chunked); 512 keeps a
        # safety margin while one dispatch still serves arbitrarily large
        # batches.
        if window_size % 2 == 0:  # must be odd (real_video_dataset.py:47-50)
            window_size += 1
        self.window_size = window_size
        self.pred_size = pred_size
        self.joint_subset = tuple(defs.OP_JOINT_SUBSETS[joint_set])
        self.use_confidence = use_confidence
        folded = contact_mlp.fold_batchnorm(params, state)
        self.folded = jax.tree.map(lambda a: jnp.asarray(a, dtype), folded)
        if use_pallas and use_conv:
            raise ValueError(
                "use_pallas and use_conv are mutually exclusive paths "
                "(the conv fusion replaces the window tensor the pallas "
                "kernel consumes)")
        if use_pallas is None:
            # the conv-fused path is the default everywhere (measured winner
            # + exact); the pallas kernel stays available explicitly, and is
            # only auto-selected when the caller disabled conv on a TPU
            use_pallas = (not use_conv and
                          jax.default_backend() not in ("cpu", "gpu"))

        kw = dict(
            window_size=window_size,
            pred_size=pred_size,
            joint_subset=self.joint_subset,
            use_confidence=use_confidence,
            conf_thresh=conf_thresh,
            normalization=normalization,
            classify_thresh=classify_thresh,
            use_pallas=use_pallas,
            use_conv=use_conv,
            mlp_dtype=mlp_dtype,
            precision=precision,
        )
        self._single = jax.jit(functools.partial(_infer_one, **kw))
        # batched path: featurization/voting vmap over videos, but ALL
        # windows of all videos flow through the MLP as one flat batch —
        # one big MXU matmul instead of V small ones (and pallas_call
        # receives a plain 2D problem instead of a vmapped grid); chunked
        # over the video axis past max_device_batch (see
        # _infer_batch_chunked)
        self._batched = jax.jit(functools.partial(
            _infer_batch_chunked, max_device_batch=max_device_batch, **kw))

    def detect(self, op_data: np.ndarray, seq_len: Optional[int] = None) -> np.ndarray:
        """Single video (F, 25, 3) → (seq_len, 4) int contacts."""
        contacts, _ = self._single(jnp.asarray(op_data, jnp.float32), self.folded)
        contacts = np.asarray(contacts)
        return contacts[: seq_len if seq_len is not None else len(contacts)]

    def detect_batch(
        self, op_batch: np.ndarray, seq_lens: Optional[Sequence[int]] = None
    ) -> list:
        """(B, F, 25, 3) padded batch → list of (len_i, 4) contacts."""
        contacts, _ = self._batched(jnp.asarray(op_batch, jnp.float32), self.folded)
        contacts = np.asarray(contacts)
        if seq_lens is None:
            return list(contacts)
        return [c[:l] for c, l in zip(contacts, seq_lens)]


def pad_to_length(arrs: Sequence[np.ndarray], length: Optional[int] = None):
    """Pad each (F_i, ...) array to the max length by repeating the last frame
    (reference fix_data_len, real_video_dataset.py:165-191)."""
    if length is None:
        length = max(a.shape[0] for a in arrs)
    out = []
    for a in arrs:
        if a.shape[0] >= length:
            out.append(a[:length])
        else:
            pad = np.repeat(a[-1:], length - a.shape[0], axis=0)
            out.append(np.concatenate([a, pad], axis=0))
    return np.stack(out, axis=0), length


def detect_contacts(
    video_dirs: Sequence[str],
    params,
    state,
    image_dims=(1920, 1080),
    save: bool = True,
    **detector_kw,
) -> list:
    """End-to-end contact detection over video directories.

    Mirrors scripts/run_detect_contacts.py + test.py --full-video: reads each
    dir's ``openpose_result``, rescales pixels to the training resolution
    (real_video_dataset.py:148-155), batches all videos padded to the longest,
    and writes ``foot_contacts.npy`` per video dir.
    """
    import os

    from ..ingest import openpose

    det = ContactDetector(params, state, **detector_kw)
    scale_w = float(TRAIN_DIM[0]) / image_dims[0]
    scale_h = float(TRAIN_DIM[1]) / image_dims[1]
    if abs(scale_w - scale_h) > 1e-5:
        raise ValueError("videos must match the training aspect ratio")

    data, lens = [], []
    for vd in video_dirs:
        kp = openpose.load_keypoint_dir(os.path.join(vd, "openpose_result"))
        if kp is None:
            raise FileNotFoundError(f"no openpose_result under {vd}")
        kp = kp.copy()
        kp[..., :2] *= scale_w
        data.append(kp)
        lens.append(kp.shape[0])

    batch, _ = pad_to_length(data)
    results = det.detect_batch(batch, lens)
    if save:
        for vd, contacts in zip(video_dirs, results):
            np.save(os.path.join(vd, "foot_contacts.npy"), contacts)
    return results
