"""Convert reference PyTorch contact-model checkpoints to chd_tpu params.

The reference trains OpenPoseModel and saves ``state_dict()`` checkpoints
(src/contact_learning/train.py:167-179, e.g. pretrained
``contact_detection_weights.pth``). This maps the nn.Sequential indices
(Linear at 0/3/6/10/13, BatchNorm1d at 1/4/7/11 — openpose_only.py:29-44)
onto our param/state pytrees, and can export/import an ``.npz`` so torch is
not needed at inference time.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

_LINEAR_IDX = (0, 3, 6, 10, 13)
_BN_IDX = (1, 4, 7, 11)


def from_state_dict(sd) -> Tuple[Dict, Dict]:
    """torch state_dict (or {name: ndarray}) → (params, state) pytrees."""

    def arr(k):
        v = sd[k]
        # copy: torch .numpy() aliases module buffers, which BN updates in place
        return np.array(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params: Dict = {}
    state: Dict = {}
    for i, li in enumerate(_LINEAR_IDX):
        params[f"linear{i}"] = {"w": arr(f"model.{li}.weight"), "b": arr(f"model.{li}.bias")}
    for i, bi in enumerate(_BN_IDX):
        params[f"bn{i}"] = {"scale": arr(f"model.{bi}.weight"), "bias": arr(f"model.{bi}.bias")}
        state[f"bn{i}"] = {
            "mean": arr(f"model.{bi}.running_mean"),
            "var": arr(f"model.{bi}.running_var"),
        }
    return params, state


def load_torch_checkpoint(path: str) -> Tuple[Dict, Dict]:
    """Load a ``.pth`` checkpoint (requires torch, CPU map) and convert."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return from_state_dict(sd)


def save_npz(path: str, params: Dict, state: Dict) -> None:
    flat = {}
    for scope, tree in (("params", params), ("state", state)):
        for mod, leaves in tree.items():
            for k, v in leaves.items():
                flat[f"{scope}.{mod}.{k}"] = np.asarray(v)
    np.savez(path, **flat)


def load_npz(path: str) -> Tuple[Dict, Dict]:
    data = np.load(path)
    params: Dict = {}
    state: Dict = {}
    for key in data.files:
        scope, mod, leaf = key.split(".")
        tgt = params if scope == "params" else state
        tgt.setdefault(mod, {})[leaf] = data[key]
    return params, state
