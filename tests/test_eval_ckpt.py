"""Evaluation module + checkpoint/resume tests."""
import os

import numpy as np
import jax
import pytest

from chd_tpu.contact import data as data_lib
from chd_tpu.contact import evaluate, train as train_lib
from chd_tpu.models import contact_mlp
from chd_tpu.utils import checkpoint as ckpt_lib


def make_dataset(tmp_path, rng):
    """Tiny synthetic Mixamo tree via the ContactDataset loader."""
    import json

    root = tmp_path / "synth"
    for c in ["A", "B"]:
        for m in range(5):
            mdir = root / c / f"{m:03d}"
            os.makedirs(mdir / "view1")
            os.makedirs(mdir / "keypoints_view1")
            np.save(mdir / "foot_contacts.npy", (rng.uniform(size=(30, 4)) > 0.5).astype(int))
            for t in range(30):
                kp = np.concatenate(
                    [rng.uniform(100, 1000, (25, 2)), rng.uniform(0.3, 1, (25, 1))], 1
                )
                json.dump(
                    {"people": [{"pose_keypoints_2d": kp.reshape(-1).tolist()}]},
                    open(mdir / "keypoints_view1" / f"{t:06d}_keypoints.json", "w"),
                )
    return data_lib.ContactDataset.load(str(root))


def test_evaluate_full_video(tmp_path):
    rng = np.random.default_rng(0)
    ds = make_dataset(tmp_path, rng)
    cfg = train_lib.TrainConfig()
    subset_n = len(__import__("chd_tpu.characters.defs", fromlist=["OP_JOINT_SUBSETS"]).OP_JOINT_SUBSETS[cfg.joint_set])
    params, state = contact_mlp.init(
        jax.random.PRNGKey(0),
        contact_mlp.ModelConfig(cfg.window_size, subset_n, cfg.pred_size, 3),
    )
    res = evaluate.evaluate_full_video(params, state, ds, split="val", cfg=cfg)
    assert 0 <= res["merged"]["accuracy"] <= 1
    assert len(res["per_frame"]) == cfg.pred_size
    B = len(ds.splits["val"])
    assert res["merged_predictions"].shape == (B, ds.num_frames, 4)
    # random model on random labels → accuracy near 0.5
    assert 0.3 < res["merged"]["accuracy"] < 0.7


def test_checkpoint_roundtrip(tmp_path):
    import optax

    cfg = train_lib.TrainConfig()
    params, state = contact_mlp.init(jax.random.PRNGKey(1), contact_mlp.ModelConfig())
    tx = train_lib.make_optimizer(cfg)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(7)

    path = str(tmp_path / "ckpt")
    ckpt_lib.save_train_state(path, 42, params, state, opt_state, key)
    restored = ckpt_lib.load_train_state(path)
    assert restored is not None
    assert int(restored["step"]) == 42
    np.testing.assert_array_equal(np.asarray(restored["rng_key"]), np.asarray(key))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        restored["params"], params,
    )
    assert ckpt_lib.load_train_state(str(tmp_path / "missing")) is None
