"""fps probing (run_phys_mocap.py:88-89): the pipeline must pick up the
clip's true frame rate instead of trusting the 30-fps config default."""
import os

import numpy as np
import pytest

from chd_tpu.pipeline import probe


def _write_clip(path, fps, frames=8, size=(64, 48)):
    cv2 = pytest.importorskip("cv2")
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w = cv2.VideoWriter(path, fourcc, fps, size)
    assert w.isOpened(), "cv2 VideoWriter could not open output"
    img = np.zeros((size[1], size[0], 3), np.uint8)
    for i in range(frames):
        img[:] = (i * 20) % 255
        w.write(img)
    w.release()


@pytest.mark.parametrize("fps", [24, 60])
def test_probe_reads_true_fps(tmp_path, fps):
    vd = tmp_path / "clip24"
    vd.mkdir()
    _write_clip(str(vd / "clip24.mp4"), fps)
    assert probe.probe_fps(str(vd), default=30.0) == float(fps)


def test_probe_prefers_dirname_match(tmp_path):
    vd = tmp_path / "vid"
    vd.mkdir()
    _write_clip(str(vd / "aaa_other.mp4"), 60)
    _write_clip(str(vd / "vid.mp4"), 24)
    assert probe.find_video_file(str(vd)).endswith("vid.mp4")
    assert probe.probe_fps(str(vd)) == 24.0


def test_probe_falls_back_without_clip(tmp_path):
    vd = tmp_path / "empty"
    vd.mkdir()
    assert probe.probe_fps(str(vd), default=30.0) == 30.0


def test_probe_on_pipeline_video_dir(tmp_path):
    """Probing works on the synthetic pipeline layout: a 24-fps clip dropped
    next to openpose_result/ etc. is found and read (the full dt→
    motion_info.txt plumbing is exercised by test_pipeline's physics stage,
    which calls run_physics_stage → probe_fps with this same layout)."""
    from test_pipeline import synthesize_video_dir

    pytest.importorskip("cv2")
    vd = synthesize_video_dir(tmp_path)
    _write_clip(os.path.join(vd, os.path.basename(vd) + ".mp4"), 24)
    assert probe.probe_fps(vd, default=30.0) == 24.0
