"""Image helpers for the external-binary drivers: parity vs the reference
(openpose_utils.pad_image:13-28, resize_image:30-46)."""
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from chd_tpu.pipeline.external import pad_image, resize_image


@pytest.fixture(scope="module")
def ref_op(ref_ik):
    for p in ["/root/reference/src/utils", "/root/reference/src/optimize"]:
        if p not in sys.path:
            sys.path.append(p)
    import openpose_utils as mod  # noqa

    return mod


@pytest.mark.parametrize("shape", [(720, 1280, 3), (1080, 1920, 3), (480, 640, 3)])
def test_pad_image_matches_reference(ref_op, shape):
    rng = np.random.default_rng(0)
    im = rng.integers(0, 255, size=shape, dtype=np.uint8)
    ours = pad_image(im.copy(), (1920, 1080))
    theirs = ref_op.pad_image(im.copy(), (1920, 1080))
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("shape", [(720, 1280, 3), (1080, 1440, 3), (2160, 3840, 3)])
def test_resize_image_matches_reference(ref_op, shape):
    rng = np.random.default_rng(1)
    im = rng.integers(0, 255, size=shape, dtype=np.uint8)
    ours = resize_image(im.copy(), (1920, 1080))
    theirs = ref_op.resize_image(im.copy(), (1920, 1080))
    np.testing.assert_array_equal(ours, theirs)
