import importlib.util
import sys

import numpy as np
import pytest

from chd_tpu.characters import CHARACTERS, defs, get_character


@pytest.fixture(scope="module")
def ref_chars():
    path = "/root/reference/src/utils/character_info_utils.py"
    spec = importlib.util.spec_from_file_location("ref_character_info", path)
    if spec is None:
        pytest.skip("reference not available")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name", ["combined", "ybot", "skeletonzombie", "ty"])
def test_character_parity(ref_chars, name):
    c = get_character(name)
    assert c.mass == ref_chars.get_character_mass(name)
    assert list(c.left_leg_chain) == list(ref_chars.get_character_leg_chain(name, "left"))
    assert list(c.right_leg_chain) == list(ref_chars.get_character_leg_chain(name, "right"))
    assert list(c.toe_inds) == list(ref_chars.get_character_toe_inds(name))
    assert list(c.ankle_inds) == list(ref_chars.get_character_ankle_inds(name))
    assert list(c.hip_inds) == list(ref_chars.get_character_hip_inds(name))
    assert list(c.foot_inds) == list(ref_chars.get_character_foot_inds(name))
    assert list(c.upper_body_joints) == list(ref_chars.get_character_upper_body(name))
    ref_eyes = ref_chars.get_character_eye_inds(name)
    if ref_eyes is None:  # reference leaves 'combined' eyes on a module const
        assert list(c.eye_indices) == list(ref_chars.combined_eye_inds)
    else:
        assert list(c.eye_indices) == list(ref_eyes)
    ref_heels = ref_chars.get_character_heel_inds(name)
    if ref_heels is None:
        assert c.heel_indices is None
    else:
        assert list(c.heel_indices) == list(ref_heels)

    ref_mass_map = ref_chars.get_character_seg_to_mass_perc_map(name)
    assert c.seg_mass_perc == ref_mass_map
    ref_seg_map = ref_chars.get_character_seg_to_joint_map(name)
    assert set(c.seg_joints) == set(ref_seg_map)
    for k in ref_seg_map:
        assert list(c.seg_joints[k]) == list(ref_seg_map[k]), k

    if name != "combined":
        assert list(c.ik_blacklist) == list(ref_chars.get_character_ik_blacklist(name))
        to_comb = ref_chars.get_character_to_combined_mapping(name)
        for j in range(c.num_joints):
            assert c.to_combined[j] == to_comb[j], (name, j)
        to_smpl = ref_chars.get_character_to_smpl_mapping(name)
        for j in range(c.num_joints):
            assert c.to_smpl[j] == to_smpl[j], (name, j)


def test_combined_tables_match_reference(ref_chars):
    np.testing.assert_array_equal(defs.COMBINED_FOOT_INDS, ref_chars.combined_foot_inds)
    np.testing.assert_array_equal(defs.COMBINED_TOE_INDS, ref_chars.combined_toe_inds)
    np.testing.assert_array_equal(defs.COMBINED_ANKLE_INDS, ref_chars.combined_ankle_inds)
    np.testing.assert_array_equal(defs.COMBINED_EYE_INDS, ref_chars.combined_eye_inds)
    for j, v in ref_chars.mapping_combined_skel_to_smpl.items():
        assert defs.SMPL_FOR_COMBINED_SKEL[j] == v
    for j, v in ref_chars.mapping_smpl_to_combined_skel.items():
        assert defs.COMBINED_SKEL_FOR_SMPL[j] == v


def test_skeleton_definitions_match_reference():
    sys.path.insert(0, "/root/reference/src/optimize")
    try:
        import importlib.util as ilu

        spec = ilu.spec_from_file_location(
            "ref_skel_defs", "/root/reference/src/optimize/SkeletonDefinitions.py"
        )
        mod = ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.pop(0)

    np.testing.assert_array_equal(defs.COMBINED_PROJ_WEIGHTS, mod.COMBINED_PROJ_WEIGHTS)
    np.testing.assert_array_equal(defs.COMBINED_DATA_WEIGHTS, mod.COMBINED_DATA_WEIGHTS)
    np.testing.assert_array_equal(defs.COMBINED_SMOOTH_WEIGHTS, mod.COMBINED_SMOOTH_WEIGHTS)
    np.testing.assert_array_equal(defs.COMBINED_SKEL_FEET_IDX, mod.COMBINED_FEET_IDX)
    assert defs.COMBINED_ROOT_IDX == mod.COMBINED_ROOT_IDX
    assert list(defs.COMBINED_SKEL_SPINE_JOINTS) == mod.COMBINED_SKEL_SPINE_JOINTS
    assert defs.COMBINED_SKEL_NECK_JOINT == mod.COMBINED_SKEL_NECK_JOINT
    for s, d in mod.mapping_combined_skel_to_body_25.items():
        assert defs.COMBINED_SKEL_TO_DATA[s] == d
    for d, s in mod.mapping_body_25_to_combined_skel.items():
        assert defs.COMBINED_DATA_TO_SKEL[d] == s


def test_segment_matrices_reproduce_dict_com():
    """Vectorized COM equals the reference's per-segment dict-loop COM."""
    rng = np.random.default_rng(0)
    for name, c in CHARACTERS.items():
        P = rng.normal(size=(4, c.num_joints, 3))
        idx, w, frac = c.segment_matrices()
        # reference-style loop
        com_loop = np.zeros((4, 3))
        for s in c.seg_joints:
            seg_pos = P[:, list(c.seg_joints[s])].mean(axis=1)
            com_loop += (c.seg_mass_perc[s] / 100.0) * seg_pos
        sel = np.einsum("sk,fskd->fsd", w, P[:, idx])
        com_mat = np.einsum("s,fsd->fd", frac, sel)
        np.testing.assert_allclose(com_mat, com_loop, atol=1e-12)
