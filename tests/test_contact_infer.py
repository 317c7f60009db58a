"""End-to-end full-video contact inference parity (BASELINE config #1 shape).

Oracle = the reference pipeline re-enacted step by step in numpy+torch:
RealVideoDataset preprocessing (rescale → gap-fill → normalize → per-window
root-normalize/subset; real_video_dataset.py:148-276) → OpenPoseModel forward
(torch) → sigmoid threshold → vote merge (test.py:51-152).
Ours = chd_tpu.contact.detect_contacts over the same synthetic video dirs.
"""
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from chd_tpu.characters.defs import OP_JOINT_SUBSETS  # noqa: E402
from chd_tpu.contact import infer  # noqa: E402
from chd_tpu.models import torch_convert  # noqa: E402
from test_contact_model import Wrapper, build_torch_model  # noqa: E402
from test_contact_ops import ref_gapfill, ref_votes, ref_window_item  # noqa: E402

W, P = 9, 5


def make_video_dir(tmp_path, name, F, rng):
    """Synthetic OpenPose keypoint JSON dir at 1920x1080 with dropouts."""
    d = tmp_path / name / "openpose_result"
    os.makedirs(d)
    kp = np.zeros((F, 25, 3))
    kp[..., 0] = rng.uniform(300, 1600, size=(F, 25))
    kp[..., 1] = rng.uniform(100, 1000, size=(F, 25))
    kp[..., 2] = rng.uniform(0.3, 1.0, size=(F, 25))
    kp[rng.uniform(size=(F, 25)) < 0.08, 2] = 0.05  # low-confidence dropouts
    for t in range(F):
        doc = {"people": [{"pose_keypoints_2d": kp[t].reshape(-1).tolist()}]}
        with open(d / f"{name}_{t:06d}_keypoints.json", "w") as f:
            json.dump(doc, f)
    return str(tmp_path / name), kp


def oracle_contacts(kp, model, subset, pad_to=None):
    """Returns (contacts, stable_mask); frames whose label flips under a
    ±1e-3 threshold perturbation are masked out (float32 borderline probs
    legitimately differ between the torch and BN-folded JAX paths)."""
    x = kp.copy()
    if pad_to is not None and pad_to > x.shape[0]:  # fix_data_len: pad FIRST
        x = np.concatenate([x, np.repeat(x[-1:], pad_to - x.shape[0], axis=0)])
    x[..., :2] *= infer.TRAIN_DIM[0] / 1920.0
    x[..., :2] = ref_gapfill(x[..., :2], x[..., 2], 0.2)
    x[..., :2] /= infer.TRAIN_NORMALIZATION
    n_windows = x.shape[0] - W + 1
    feats = np.stack([ref_window_item(x, s, W, subset) for s in range(n_windows)])
    with torch.no_grad():
        logits = model(
            torch.from_numpy(feats.reshape(n_windows, -1).astype(np.float32))
        ).numpy().reshape(n_windows, P, 4)
    probs = 1.0 / (1.0 + np.exp(-logits))
    contacts = ref_votes((probs > 0.5).astype(np.float32), W)
    lo = ref_votes((probs > 0.5 + 1e-3).astype(np.float32), W)
    hi = ref_votes((probs > 0.5 - 1e-3).astype(np.float32), W)
    stable = (lo == hi)
    return contacts, stable


def test_rootless_joint_subset_matches_featurize_video():
    """Joint sets lacking the root joint (e.g. lower_ankles) must still
    root-normalize against joint 8 — the reference normalizes the full
    25-joint array before subsetting (openpose_dataset.py:329-340), so the
    root never needs to survive into the model input."""
    import jax
    import jax.numpy as jnp

    from chd_tpu.models import contact_mlp
    from chd_tpu.ops import gapfill, windows

    subset = OP_JOINT_SUBSETS["lower_ankles"]
    assert 8 not in subset
    rng = np.random.default_rng(3)
    F = 40
    kp = np.zeros((F, 25, 3), np.float32)
    kp[..., 0] = rng.uniform(300, 900, size=(F, 25))
    kp[..., 1] = rng.uniform(100, 600, size=(F, 25))
    kp[..., 2] = rng.uniform(0.3, 1.0, size=(F, 25))

    cfg = contact_mlp.ModelConfig(W, len(subset), P, 3)
    params, state = contact_mlp.init(jax.random.PRNGKey(0), cfg)
    folded = contact_mlp.fold_batchnorm(params, state)
    folded = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), folded)

    contacts, probs = infer._infer_batch(
        jnp.asarray(kp)[None], folded,
        window_size=W, pred_size=P, joint_subset=tuple(subset),
        use_confidence=True, conf_thresh=0.2,
        normalization=infer.TRAIN_NORMALIZATION, classify_thresh=0.5,
    )

    # reference path: preprocess full 25 joints, window+root-normalize, subset
    x = gapfill.preprocess_keypoints(
        jnp.asarray(kp), 0.2, infer.TRAIN_NORMALIZATION
    )
    feats = windows.featurize_video(x, W, subset, root_joint=8)
    logits = contact_mlp.apply_folded(
        folded, feats, P, precision="high"
    )
    probs_ref = jax.nn.sigmoid(logits).reshape(1, -1, P, 4)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(probs_ref),
                               atol=1e-6)
    assert contacts.shape == (1, F, 4)


def test_detect_contacts_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    model = build_torch_model()
    params, state = torch_convert.from_state_dict(Wrapper(model).state_dict())
    subset = OP_JOINT_SUBSETS["lower"]

    dirs, raws = [], []
    for name, F in [("vidA", 60), ("vidB", 45)]:
        d, kp = make_video_dir(tmp_path, name, F, rng)
        dirs.append(d)
        raws.append(kp)

    results = infer.detect_contacts(dirs, params, state, image_dims=(1920, 1080))

    for d, kp, got in zip(dirs, raws, results):
        pad_to = max(k.shape[0] for k in raws)
        expected, stable = oracle_contacts(kp, model, subset, pad_to=pad_to)
        # vidB is padded to vidA's length inside the batch; compare the
        # unpadded frames (the reference also trims to true seq_len,
        # test.py:149-152)
        assert got.shape[0] == kp.shape[0]
        F = kp.shape[0]
        m = stable[:F]
        assert m.mean() > 0.95  # nearly all frames are threshold-stable
        np.testing.assert_array_equal(np.where(m, got, 0), np.where(m, expected[:F], 0))
        saved = np.load(os.path.join(d, "foot_contacts.npy"))
        np.testing.assert_array_equal(saved, got)


def test_chunked_batch_matches_flat():
    """max_device_batch chunking (lax.map over the video axis) is exactly
    equal to the flat batch — the chunked path exists because flat batches
    past ~768 videos produced deterministically corrupted results on the
    benched v5e runtime (BASELINE.md "batch-invariance tripwire"), so its
    exactness is load-bearing for the default inference config."""
    import jax.numpy as jnp

    from chd_tpu.models import contact_mlp

    rng = np.random.default_rng(3)
    V, F = 21, 40
    kp = np.zeros((V, F, 25, 3), np.float32)
    kp[..., 0] = rng.uniform(0.5, 6.0, size=(V, F, 25))
    kp[..., 1] = rng.uniform(0.5, 4.0, size=(V, F, 25))
    kp[..., 2] = rng.uniform(0.0, 1.0, size=(V, F, 25))

    cfg = contact_mlp.ModelConfig()
    import jax

    params, state = contact_mlp.init(jax.random.PRNGKey(0), cfg)
    det_chunk = infer.ContactDetector(params, state, max_device_batch=8)
    det_flat = infer.ContactDetector(params, state, max_device_batch=64)
    x = jnp.asarray(kp)
    c1, p1 = det_chunk._batched(x, det_chunk.folded)
    c2, p2 = det_flat._batched(x, det_flat.folded)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
