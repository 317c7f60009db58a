"""MTC ingest parity vs reference totalcap_utils."""
import json
import os
import sys

import numpy as np
import pytest

from chd_tpu.ingest import totalcap


@pytest.fixture(scope="module")
def ref_tc(ref_ik):
    for p in ["/root/reference/src/utils", "/root/reference/src/skeleton_fitting/ik",
              "/root/reference/src"]:
        if p not in sys.path:
            sys.path.append(p)
    import totalcap_utils as mod  # noqa

    return mod


def make_results_json(tmp_path, F=5, seed=0):
    rng = np.random.default_rng(seed)
    frames = []
    for f in range(F):
        frames.append(
            {
                "trans": dict(zip("xyz", rng.normal(size=3).tolist())),
                "joints": [
                    {"pos": dict(zip("xyz", rng.normal(size=3).tolist()))} for _ in range(25)
                ],
                "SMPLJoints": [
                    {
                        "pos": dict(zip("xyz", rng.normal(size=3).tolist())),
                        "rot": dict(zip("xyz", rng.normal(size=3).tolist())),
                    }
                    for _ in range(22)
                ],
                "bodyCoeffs": rng.normal(size=30).tolist(),
                "faceCoeffs": rng.normal(size=200).tolist(),
            }
        )
    path = str(tmp_path / "tracked_results.json")
    json.dump({"totalcapResults": frames}, open(path, "w"))
    return path


def test_load_matches_reference(tmp_path, ref_tc):
    path = make_results_json(tmp_path)
    ours = totalcap.load_totalcap_results(path)
    theirs = ref_tc.load_totalcap_results(path)
    np.testing.assert_allclose(ours.root_trans, theirs.root_trans)
    np.testing.assert_allclose(ours.joint3d, theirs.joint3d)
    np.testing.assert_allclose(ours.smpl_joint3d, theirs.smpl_joint3d)
    np.testing.assert_allclose(ours.smpl_joint_angles, theirs.smpl_joint_angles)
    np.testing.assert_allclose(ours.body_coeffs, theirs.body_coeffs)
    np.testing.assert_allclose(ours.face_coeffs, theirs.face_coeffs)


def test_save_matches_reference(tmp_path, ref_tc):
    path = make_results_json(tmp_path)
    res = totalcap.load_totalcap_results(path)
    ref_res = ref_tc.load_totalcap_results(path)

    ours_dir = str(tmp_path / "ours")
    ref_dir = str(tmp_path / "ref")
    totalcap.save_totalcap_results(res, ours_dir)
    ref_tc.save_totalcap_results(ref_res, ref_dir)
    for fname in sorted(os.listdir(ref_dir)):
        a = open(os.path.join(ours_dir, fname)).read().split()
        b = open(os.path.join(ref_dir, fname)).read().split()
        np.testing.assert_allclose([float(x) for x in a], [float(x) for x in b])


def test_normalize_and_combined_match(tmp_path, ref_tc):
    path = make_results_json(tmp_path, seed=1)
    res = totalcap.load_totalcap_results(path)

    rt_o, j_o = totalcap.normalize_root_pos(res.root_trans, res.joint3d)
    rt_r, j_r = ref_tc.normalize_root_pos(res.root_trans.copy(), res.joint3d.copy())
    np.testing.assert_allclose(rt_o, rt_r)
    np.testing.assert_allclose(j_o, j_r)

    _, s_o = totalcap.normalize_root_pos(res.root_trans, res.smpl_joint3d, root_idx=0)
    comb_o = totalcap.create_combined_model(j_o, s_o)
    _, s_r = ref_tc.normalize_root_pos(res.root_trans.copy(), res.smpl_joint3d.copy(),
                                       root_idx=ref_tc.SMPL_ROOT_IDX)
    comb_r = ref_tc.create_combined_model(j_r, s_r)
    np.testing.assert_allclose(comb_o, comb_r)


def test_angle_remaps_match(tmp_path, ref_tc):
    rng = np.random.default_rng(2)
    smpl = rng.normal(size=(4, 22, 3))
    np.testing.assert_allclose(
        totalcap.combined_angles_from_smpl(smpl), ref_tc.combined_angles_from_smpl(smpl)
    )
    comb = rng.normal(size=(4, 28, 3))
    np.testing.assert_allclose(
        totalcap.smpl_from_combined_angles(comb), ref_tc.smpl_from_combined_angles(comb)
    )
    for char in ["ybot", "ty", "skeletonzombie"]:
        np.testing.assert_allclose(
            totalcap.mixamo_angles_from_smpl(smpl, char),
            ref_tc.mixamo_angles_from_smpl(smpl, char),
        )
