"""ctypes bindings for the native runtime library (native/chd_native.cpp).

Auto-builds the shared library on first use if a toolchain is present;
callers fall back to the pure-python paths when it isn't.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libchd_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.chd_load_keypoint_dir.restype = ctypes.c_int
        lib.chd_load_keypoint_dir.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.chd_parse_floats.restype = ctypes.c_int64
        lib.chd_parse_floats.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ]
        lib.chd_native_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_keypoint_dir(files: List[str], num_joints: int = 25) -> Optional[np.ndarray]:
    """Parse OpenPose JSON files → (F, J, 3), or None if native unavailable."""
    lib = _load()
    if lib is None or not files:
        return None
    blob = b"\x00".join(f.encode() for f in files) + b"\x00"
    out = np.zeros((len(files), num_joints, 3), dtype=np.float64)
    rc = lib.chd_load_keypoint_dir(
        blob, len(files), num_joints,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise IOError(f"native loader failed on file #{rc}: {files[rc - 1]}")
    return out


def parse_floats(path: str, max_vals: int) -> Optional[np.ndarray]:
    """All numeric tokens of a whitespace file, skipping labels."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(max_vals, dtype=np.float64)
    n = lib.chd_parse_floats(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_vals
    )
    if n < 0:
        raise IOError(f"cannot read {path}")
    return out[:n]
