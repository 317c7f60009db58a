"""Checkpoint / resume.

The reference only saves bare model weights at val epochs
(src/contact_learning/train.py:167-179) — no optimizer state, no epoch
counter, no mid-run resume (SURVEY §5). This module keeps the lightweight
npz path (via models.torch_convert) for weight-only artifacts AND adds full
training-state checkpointing through Orbax: params, BN state, optimizer
moments, epoch, and RNG key, so runs resume exactly.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_train_state(path: str, step: int, params, state, opt_state, rng_key) -> None:
    import orbax.checkpoint as ocp

    ckpt = {
        "step": step,
        "params": params,
        "state": state,
        "opt_state": opt_state,
        "rng_key": np.asarray(rng_key),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), ckpt, force=True)


def load_train_state(path: str) -> Optional[Dict[str, Any]]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)
