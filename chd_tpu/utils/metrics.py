"""Classification metrics for contact detection.

Replaces src/contact_learning/utils.py:73-96 (``calculate_metrics``) and
models/openpose_only.py:80-115 (``accuracy`` confusion counts) with
vectorized jnp ops usable inside jit (e.g. psum-reduced across a mesh).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Confusion(NamedTuple):
    tp: jnp.ndarray
    fp: jnp.ndarray
    fn: jnp.ndarray
    tn: jnp.ndarray

    def __add__(self, other):
        return Confusion(*(a + b for a, b in zip(self, other)))


def confusion_counts(pred_bool, label_bool) -> Confusion:
    """Element-wise confusion totals over all axes (reference accuracy:80-115)."""
    p = pred_bool.astype(jnp.int32)
    l = label_bool.astype(jnp.int32)
    return Confusion(
        tp=jnp.sum(p * l),
        fp=jnp.sum(p * (1 - l)),
        fn=jnp.sum((1 - p) * l),
        tn=jnp.sum((1 - p) * (1 - l)),
    )


def format_metrics(m: dict) -> str:
    """One-line metric summary (reference print_metrics equivalent,
    src/contact_learning/utils.py:98-108)."""
    return (
        f"accuracy {float(m['accuracy']):.4f}  precision {float(m['precision']):.4f}  "
        f"recall {float(m['recall']):.4f}  F1 {float(m['f1']):.4f}"
    )


def metrics_from_confusion(c: Confusion):
    """accuracy, precision, recall, F1 (reference calculate_metrics:73-96)."""
    tp, fp, fn, tn = (jnp.asarray(x, jnp.float32) for x in c)
    total = tp + fp + fn + tn
    accuracy = (tp + tn) / jnp.maximum(total, 1)
    precision = tp / jnp.maximum(tp + fp, 1)
    recall = tp / jnp.maximum(tp + fn, 1)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-12)
    return {
        "accuracy": accuracy,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "confusion": c,
    }
