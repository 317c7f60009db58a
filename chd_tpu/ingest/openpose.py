"""OpenPose keypoint ingestion.

Host-side parsing of OpenPose BODY_25 JSON output directories into
``(F, 25, 3)`` arrays — the in-process replacement for
src/utils/openpose_utils.py:48-76 (``load_keypoint_file``/``load_keypoint_dir``).
Semantics match: first detected person only; all-zero row when no person is
found in a frame. A C++ fast path (chd_tpu.utils.native) parses large keypoint
directories without the json-module overhead; this falls back to pure Python.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np


def load_keypoint_file(path: str, num_joints: int = 25) -> np.ndarray:
    with open(path, "r") as f:
        d = json.load(f)
    people = d.get("people", [])
    if not people:
        return np.zeros((num_joints, 3))
    return np.asarray(people[0]["pose_keypoints_2d"], dtype=np.float64).reshape(-1, 3)


def keypoint_files(dir_path: str) -> List[str]:
    return sorted(
        os.path.join(dir_path, f)
        for f in os.listdir(dir_path)
        if f.rsplit(".", 1)[-1] == "json"
    )


def load_keypoint_dir(dir_path: str, use_native: bool = True) -> Optional[np.ndarray]:
    """Load a whole video's keypoints as (F, 25, 3)."""
    if not os.path.isdir(dir_path):
        return None
    files = keypoint_files(dir_path)
    if use_native:
        try:
            from ..utils import native

            arr = native.load_keypoint_dir(files)
            if arr is not None:
                return arr
        except Exception:
            pass  # fall back to pure python
    return np.stack([load_keypoint_file(f) for f in files], axis=0)
