"""Native loader parity with the pure-python paths."""
import json
import os

import numpy as np
import pytest

from chd_tpu.ingest import openpose
from chd_tpu.utils import native


@pytest.fixture(scope="module")
def kp_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("kp")
    rng = np.random.default_rng(0)
    truth = []
    for t in range(25):
        if t == 7:
            doc = {"people": []}  # no detection
            truth.append(np.zeros((25, 3)))
        else:
            kp = rng.normal(size=(25, 3)) * 100
            doc = {
                "version": 1.3,
                "people": [
                    {"pose_keypoints_2d": kp.reshape(-1).tolist()},
                    {"pose_keypoints_2d": (kp * 2).reshape(-1).tolist()},  # 2nd person ignored
                ],
            }
            truth.append(kp)
        json.dump(doc, open(d / f"{t:06d}_keypoints.json", "w"))
    return str(d), np.stack(truth)


def test_native_builds():
    assert native.available(), "native library should build in this image"


def test_native_matches_python(kp_dir):
    d, truth = kp_dir
    files = openpose.keypoint_files(d)
    got_native = native.load_keypoint_dir(files)
    got_python = np.stack([openpose.load_keypoint_file(f) for f in files])
    np.testing.assert_allclose(got_native, got_python, atol=1e-12)
    np.testing.assert_allclose(got_native, truth, atol=1e-9)


def test_ingest_uses_native(kp_dir):
    d, truth = kp_dir
    out = openpose.load_keypoint_dir(d, use_native=True)
    np.testing.assert_allclose(out, truth, atol=1e-9)


def test_parse_floats(tmp_path):
    p = tmp_path / "sol.txt"
    p.write_text("base_lin\n1.5 2.5e-3 -7\nnum_frames\n3\nfootpos\n0.1 0.2\n")
    vals = native.parse_floats(str(p), 100)
    np.testing.assert_allclose(vals, [1.5, 2.5e-3, -7, 3, 0.1, 0.2])


def test_native_missing_file(kp_dir):
    d, _ = kp_dir
    with pytest.raises(IOError):
        native.load_keypoint_dir([os.path.join(d, "nonexistent.json")])
