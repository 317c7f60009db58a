"""Retargeting parity vs the reference combined_to_mixamo.retarget.

The reference function reads module-global ``args`` (a CLI script quirk), so
the test injects a stub args and drives it through temp BVH files.
"""
import os
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from chd_tpu.core import bvh, quat
from chd_tpu.core.fk import positions_global
from chd_tpu.retarget import retarget, softmin

SKEL_DIR = "/root/reference/src/skeleton_fitting"
COMBINED_BVH = os.path.join(SKEL_DIR, "combined_body_25.bvh")
YBOT_BVH = os.path.join(SKEL_DIR, "ybot.bvh")


def make_source_motion(tmp_path):
    """Small combined-skeleton motion saved as BVH (shared input format)."""
    rng = np.random.default_rng(4)
    anim, names, ft = bvh.load(COMBINED_BVH)
    J, F = anim.num_joints, 6
    es = rng.uniform(-0.2, 0.2, size=(F, J, 3))
    rot = np.asarray(quat.from_euler(jnp.asarray(es), "xyz", world=True))
    pos = np.broadcast_to(np.asarray(anim.offsets)[None], (F, J, 3)).copy()
    pos[:, 0] = np.stack(
        [np.linspace(0, 10, F), np.full(F, -95.0), np.linspace(0, 5, F)], axis=1
    )
    src = anim.replace(rotations=rot, positions=pos)
    path = str(tmp_path / "src.bvh")
    bvh.save(path, src, names)
    return path, src


@pytest.fixture(scope="module")
def ref_retarget(ref_ik):
    for p in [SKEL_DIR, os.path.join(SKEL_DIR, "ik"), "/root/reference/src/utils"]:
        if p not in sys.path:
            sys.path.append(p)
    import combined_to_mixamo as mod  # noqa

    return mod


def test_softmin_matches_reference(ref_retarget):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(50,))
    ours = softmin(x, softness=0.5, axis=0)
    theirs = ref_retarget.softmin(x, softness=0.5, axis=0)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


@pytest.mark.slow
def test_retarget_matches_reference(tmp_path, ref_retarget):
    src_path, src = make_source_motion(tmp_path)

    # ours
    ours, names = retarget(src, "ybot", YBOT_BVH, ik_iterations=10)

    # reference (script-style globals)
    ref_retarget.args = types.SimpleNamespace(
        character="ybot", src_bvh=src_path, out_bvh=str(tmp_path / "ref_out.bvh")
    )
    # patch its IK iteration count for test speed: monkeypatch the class
    import InverseKinematics as RefIK

    orig = RefIK.JacobianInverseKinematicsCK.__init__

    def patched(self, *a, **kw):
        kw["iterations"] = 10
        kw["silent"] = True
        orig(self, *a, **kw)

    RefIK.JacobianInverseKinematicsCK.__init__ = patched
    try:
        ref_retarget.retarget(src_path, "ybot", str(tmp_path / "ref_out.bvh"))
    finally:
        RefIK.JacobianInverseKinematicsCK.__init__ = orig

    ref_anim, ref_names, _ = bvh.load(str(tmp_path / "ref_out.bvh"))
    assert names == ref_names

    ours_gp = np.asarray(
        positions_global(jnp.asarray(ours.rotations), jnp.asarray(ours.positions), ours.parents)
    )
    ref_gp = np.asarray(
        positions_global(
            jnp.asarray(ref_anim.rotations), jnp.asarray(ref_anim.positions), ref_anim.parents
        )
    )
    # BVH stores 6 decimals; positions in cm → compare to ~0.01 cm, but the
    # IK involves many f64-vs-f32 iterations: allow small drift
    err = np.abs(ours_gp - ref_gp)
    assert err.max() < 0.5, err.max()  # cm on a ~180cm character
