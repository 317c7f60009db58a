import os

import numpy as np
import jax.numpy as jnp
import pytest

from chd_tpu.core import bvh, fk

TEMPLATES = [
    "/root/reference/src/skeleton_fitting/combined_body_25.bvh",
    "/root/reference/src/skeleton_fitting/ybot.bvh",
    "/root/reference/src/skeleton_fitting/ty.bvh",
]


@pytest.mark.parametrize("path", TEMPLATES)
def test_load_matches_reference(ref_ik, path):
    if not os.path.exists(path):
        pytest.skip("template missing")
    anim, names, ft = bvh.load(path)
    ref_anim, ref_names, ref_ft = ref_ik.BVH.load(path)
    assert names == ref_names
    assert ft == ref_ft
    assert list(anim.parents) == list(ref_anim.parents)
    np.testing.assert_allclose(anim.offsets, ref_anim.offsets, atol=1e-10)
    np.testing.assert_allclose(anim.positions, ref_anim.positions, atol=1e-10)
    np.testing.assert_allclose(anim.rotations, ref_anim.rotations.qs, atol=1e-10)


def test_save_roundtrip(tmp_path, ref_ik):
    src = TEMPLATES[0]
    if not os.path.exists(src):
        pytest.skip("template missing")
    anim, names, ft = bvh.load(src)
    # animate it a little so rotations are non-trivial
    rng = np.random.default_rng(3)
    F, J = 5, anim.num_joints
    from chd_tpu.core import quat

    es = rng.uniform(-0.4, 0.4, size=(F, J, 3))
    rot = np.asarray(quat.from_euler(jnp.asarray(es), order="zyx", world=False))
    pos = np.broadcast_to(anim.offsets[None], (F, J, 3)).copy()
    pos[:, 0] = rng.normal(size=(F, 3)) * 5
    anim2 = anim.replace(rotations=rot, positions=pos)

    out = str(tmp_path / "out.bvh")
    bvh.save(out, anim2, names, frametime=ft)

    # both loaders agree on our output, and FK positions survive the roundtrip
    ours_back, names_b, _ = bvh.load(out)
    ref_back, ref_names_b, _ = ref_ik.BVH.load(out)
    assert names_b == ref_names_b == names
    np.testing.assert_allclose(ours_back.rotations, ref_back.rotations.qs, atol=1e-10)

    p_orig = np.asarray(fk.positions_global(jnp.asarray(rot), jnp.asarray(pos), anim.parents))
    p_back = np.asarray(
        fk.positions_global(
            jnp.asarray(ours_back.rotations), jnp.asarray(ours_back.positions), anim.parents
        )
    )
    np.testing.assert_allclose(p_back, p_orig, atol=1e-3)  # %f = 6 decimals in file
