"""Real-footage tests on the one genuine video in the environment.

Every other test runs on synthetic clips; these exercise the real-data code
paths on /root/reference's example video (dance1.mp4: 73 frames, 23.976 fps,
1920x1080 — the reference's own e2e fixture, README.md:60-61):

- probe_fps must return the reference's int(round(cv2 fps)) = 24, the
  non-default branch real footage actually takes (run_phys_mocap.py:88-89);
- frame extraction must produce one exactly-1920x1080 PNG per frame
  (run_totalcap.py:105-130);
- pad_image / resize_image must agree pixel-for-pixel with the reference
  implementations (run_totalcap.py:69-103) on real frames at the sizes the
  MTC pipeline hits;
- create_optim_data_structure must build the <name>/<name>.mp4 layout from a
  directory of videos (create_optim_data_structure.py:24-46).

No synthetic stand-ins anywhere in this module.
"""
import importlib.util
import os
import shutil

import numpy as np
import pytest

DANCE1 = "/root/reference/data/example_data/dance1/dance1.mp4"

cv2 = pytest.importorskip("cv2")
pytestmark = pytest.mark.skipif(
    not os.path.isfile(DANCE1), reason="reference example video not mounted"
)


@pytest.fixture(scope="module")
def ref_totalcap():
    """Import the reference run_totalcap module as the pad/resize oracle."""
    spec = importlib.util.spec_from_file_location(
        "ref_run_totalcap", "/root/reference/scripts/run_totalcap.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def first_frame():
    cap = cv2.VideoCapture(DANCE1)
    try:
        ok, frame = cap.read()
    finally:
        cap.release()
    assert ok, "could not decode the first frame of dance1.mp4"
    return frame


def test_probe_fps_real_video(tmp_path):
    from chd_tpu.pipeline.probe import find_video_file, probe_fps

    vdir = tmp_path / "dance1"
    vdir.mkdir()
    shutil.copyfile(DANCE1, vdir / "dance1.mp4")
    assert find_video_file(str(vdir)) == str(vdir / "dance1.mp4")
    # 23.976 fps footage must probe as 24 (int(round(...)) like the
    # reference), NOT fall back to the 30 fps config default — a wrong fps
    # silently corrupts the physics dt.
    assert probe_fps(str(vdir), default=30.0) == 24.0


def test_make_structure_real_video(tmp_path):
    from chd_tpu.pipeline.structure import create_optim_data_structure

    src = tmp_path / "videos"
    src.mkdir()
    shutil.copyfile(DANCE1, src / "dance1.mp4")
    made = create_optim_data_structure(str(src), str(tmp_path / "out"))
    assert made == [str(tmp_path / "out" / "dance1")]
    out_file = tmp_path / "out" / "dance1" / "dance1.mp4"
    assert out_file.is_file()
    assert out_file.stat().st_size == os.path.getsize(DANCE1)
    # the copied clip is still a decodable video with the same frame count
    cap = cv2.VideoCapture(str(out_file))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n == 73


def test_extract_frames_real_video(tmp_path):
    from chd_tpu.pipeline.external import extract_frames

    out = tmp_path / "raw_image"
    n = extract_frames(DANCE1, str(out), target=(1920, 1080))
    assert n == 73
    frames = sorted(os.listdir(out))
    assert len(frames) == 73
    assert frames[0] == "00000001.png" and frames[-1] == "00000073.png"
    im = cv2.imread(str(out / frames[0]))
    # MTC requires exactly 1920x1080 after resize+pad (run_totalcap.py:128)
    assert im.shape == (1080, 1920, 3)
    assert im.dtype == np.uint8


def test_pad_resize_parity_real_frame(ref_totalcap, first_frame):
    from chd_tpu.pipeline import external

    assert first_frame.shape == (1080, 1920, 3)
    # the sizes the pipeline actually hits: identity at native res, a
    # downscale target (MTC crop-net input), and a pad-up from a smaller
    # crop of the real frame
    for im, size in [
        (first_frame, (1920, 1080)),          # native: both helpers no-op
        (first_frame, (1280, 720)),           # downscale
        (first_frame, (1080, 1080)),          # width-limited downscale
        (first_frame[200:800, 300:1100], (1920, 1080)),  # resize then pad up
        (first_frame[:, :900], (1920, 1080)),            # tall crop
    ]:
        ours = external.pad_image(external.resize_image(im, size), size)
        ref = ref_totalcap.pad_image(ref_totalcap.resize_image(im, size), size)
        assert ours.shape == ref.shape, (im.shape, size)
        np.testing.assert_array_equal(ours, ref)


def test_contact_stage_on_real_fps_metadata(tmp_path):
    """The pipeline's fps probe feeds the physics dt: dt must be 1/24 for
    dance1, not 1/30 (run_phys_mocap.py:88-89 → towr dt plumbing)."""
    from chd_tpu.pipeline.probe import probe_fps

    vdir = tmp_path / "dance1"
    vdir.mkdir()
    shutil.copyfile(DANCE1, vdir / "dance1.mp4")
    fps = probe_fps(str(vdir), default=30.0)
    dt = 1.0 / fps
    assert abs(dt - 1.0 / 24.0) < 1e-12
