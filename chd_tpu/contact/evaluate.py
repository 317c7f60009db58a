"""Contact-model evaluation.

The reference's ``test.py`` (src/contact_learning/test.py:51-322) in API
form: window-level metrics per target frame, and full-video evaluation with
sliding-window vote merging + post-merge metrics. Everything device-side;
metrics come back as plain floats.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..characters.defs import OP_JOINT_SUBSETS
from ..models import contact_mlp
from ..ops import voting, windows
from ..utils import metrics as metrics_lib
from . import data as data_lib
from .train import TrainConfig, eval_step


def evaluate_windows(
    params, state, dataset: data_lib.ContactDataset, split: str = "test",
    cfg: TrainConfig = TrainConfig(), overlap: bool = False,
) -> Dict:
    """Window-level evaluation (reference val_epoch / test non-full-video)."""
    op, ct = dataset.split_arrays(split)
    loss, confs = eval_step(params, state, jnp.asarray(op), jnp.asarray(ct),
                            cfg=cfg, overlap=overlap)
    per_frame = [
        metrics_lib.metrics_from_confusion(metrics_lib.Confusion(*c)) for c in confs
    ]
    return {
        "loss": float(loss),
        "per_frame": [
            {k: float(v) for k, v in m.items() if k != "confusion"} for m in per_frame
        ],
    }


def evaluate_full_video(
    params, state, dataset: data_lib.ContactDataset, split: str = "test",
    cfg: TrainConfig = TrainConfig(),
) -> Dict:
    """Full-video evaluation with vote merging + merged metrics
    (reference val_full_video:51-219, incl. the merged confusion at :124-140)."""
    op, ct = dataset.split_arrays(split)
    op = jnp.asarray(op)
    ct = jnp.asarray(ct)
    subset = tuple(OP_JOINT_SUBSETS[cfg.joint_set])

    folded = contact_mlp.fold_batchnorm(params, state)
    folded = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), folded)

    @jax.jit
    def run(op_b):
        def one(od):
            feats = windows.featurize_video(
                od, cfg.window_size, subset, 8, cfg.use_confidence
            )
            logits = contact_mlp.apply_folded(folded, feats, cfg.pred_size)
            preds = (jax.nn.sigmoid(logits) > cfg.classify_thresh).astype(jnp.float32)
            return voting.merge_votes(preds, cfg.window_size)

        return jax.vmap(one)(op_b)

    merged_pred = run(op)  # (B, F, 4)
    conf = metrics_lib.confusion_counts(merged_pred > 0.5, ct > 0.5)
    merged = metrics_lib.metrics_from_confusion(conf)
    window_res = evaluate_windows(params, state, dataset, split, cfg, overlap=True)
    return {
        **window_res,
        "merged": {k: float(v) for k, v in merged.items() if k != "confusion"},
        "merged_predictions": np.asarray(merged_pred),
    }
