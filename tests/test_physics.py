"""Physics layer tests: SRBD dynamics sanity, prepare_input parity vs the
reference featurization, sol_out I/O cross-compatibility."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chd_tpu.core import bvh, quat
from chd_tpu.physics import srbd, towr_io
from chd_tpu.physics.types import GRAVITY, PhysInput


# ---------------------------------------------------------------------------
# SRBD
# ---------------------------------------------------------------------------

def test_rot_zyx_matches_quat():
    rng = np.random.default_rng(0)
    ang = rng.uniform(-1.5, 1.5, size=(20, 3))
    R1 = np.asarray(srbd.rot_zyx(jnp.asarray(ang)))
    q = quat.from_euler(jnp.asarray(ang), "xyz", world=True)  # Rz·Ry·Rx
    R2 = np.asarray(quat.to_matrix(q))
    np.testing.assert_allclose(R1, R2, atol=1e-9)


def test_euler_rate_matrix_consistency():
    """ω from M(θ)θ̇ must equal the skew of Ṙ Rᵀ (world angular velocity)."""
    rng = np.random.default_rng(1)
    theta = jnp.asarray(rng.uniform(-1.0, 1.0, size=3))
    dtheta = jnp.asarray(rng.normal(size=3))

    omega = srbd.euler_rate_matrix(theta) @ dtheta

    dR = jax.jacfwd(lambda a: srbd.rot_zyx(a))(theta)  # (3,3,3)
    Rdot = jnp.einsum("ijk,k->ij", dR, dtheta)
    W = Rdot @ srbd.rot_zyx(theta).T  # skew(ω)
    omega_ref = jnp.asarray([W[2, 1], W[0, 2], W[1, 0]])
    np.testing.assert_allclose(np.asarray(omega), np.asarray(omega_ref), atol=1e-10)


def test_static_standing_is_dynamically_consistent():
    """Constant COM, symmetric contacts, each foot carrying mg/2 along the
    floor normal with zero torque about the COM → violation ≈ 0."""
    F = 10
    dt = jnp.asarray(1.0 / 30.0)
    mass = jnp.asarray(70.0)
    n = jnp.asarray([0.0, 0.0, 1.0])
    base_lin = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (F, 1))
    base_ang = jnp.zeros((F, 3))
    # feet symmetric about the COM in x → torques cancel
    ee = jnp.stack(
        [
            jnp.tile(jnp.asarray([0.2, 0.1, 0.0]), (F, 1)),
            jnp.tile(jnp.asarray([-0.2, 0.1, 0.0]), (F, 1)),
            jnp.tile(jnp.asarray([0.2, -0.1, 0.0]), (F, 1)),
            jnp.tile(jnp.asarray([-0.2, -0.1, 0.0]), (F, 1)),
        ]
    )
    fz = float(mass) * GRAVITY / 4.0
    force = jnp.tile(jnp.asarray([0.0, 0.0, fz]), (4, F, 1))
    contact = jnp.ones((4, F))
    inertia = jnp.tile(jnp.eye(3) * 5.0, (F, 1, 1))

    viol = srbd.dynamic_violation(
        base_lin, base_ang, ee, force, contact, inertia, mass, -n, dt
    )
    # gravity dir = -n (pointing down); lin: m·0 − Σf − m·g·(−n) = −mg·n + mg·n = 0
    assert float(jnp.abs(viol).max()) < 1e-3, np.asarray(viol)


def test_free_fall_violation_matches_gravity():
    """Unsupported constant COM should violate linear dynamics by exactly mg."""
    F = 6
    mass = jnp.asarray(50.0)
    n = jnp.asarray([0.0, 0.0, 1.0])
    viol = srbd.dynamic_violation(
        jnp.tile(jnp.asarray([0.0, 0, 1.0]), (F, 1)),
        jnp.zeros((F, 3)),
        jnp.zeros((4, F, 3)),
        jnp.zeros((4, F, 3)),
        jnp.zeros((4, F)),
        jnp.tile(jnp.eye(3), (F, 1, 1)),
        mass,
        -n,
        jnp.asarray(1 / 30),
    )
    np.testing.assert_allclose(
        np.asarray(viol[:, 3:]),
        np.tile([0, 0, float(mass) * GRAVITY], (F, 1)),
        atol=1e-3,
    )


# ---------------------------------------------------------------------------
# prepare_input parity vs reference towr_utils.prepare_input
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_towr(ref_ik):
    for p in [
        "/root/reference/src/utils",
        "/root/reference/src/skeleton_fitting/ik",
        "/root/reference/src/optimize",
    ]:
        if p not in sys.path:
            sys.path.append(p)
    import towr_utils as mod  # noqa

    return mod


_SKELS = {
    "ybot": "/root/reference/src/skeleton_fitting/ybot.bvh",
    "combined": "/root/reference/src/skeleton_fitting/combined_body_25.bvh",
}


def make_motion(tmp_path, character="ybot"):
    """Posed motion + floor + contacts on disk (shared input format)."""
    rng = np.random.default_rng(6)
    anim, names, ft = bvh.load(_SKELS[character])
    J, F = anim.num_joints, 12
    es = rng.uniform(-0.15, 0.15, size=(F, J, 3))
    rot = np.asarray(quat.from_euler(jnp.asarray(es), "xyz", world=True))
    pos = np.broadcast_to(np.asarray(anim.offsets)[None], (F, J, 3)).copy()
    pos[:, 0] = np.stack(
        [np.linspace(0, 15, F), np.full(F, -95.0), np.linspace(0, 8, F)], axis=1
    )
    src = anim.replace(rotations=rot, positions=pos)
    bvh_path = str(tmp_path / "motion.bvh")
    bvh.save(bvh_path, src, names)

    floor_path = str(tmp_path / "floor_out.txt")
    with open(floor_path, "w") as f:
        f.write("0.01 -0.99 0.02\n1.0 95.0 2.0")

    contacts = (rng.uniform(size=(F, 4)) > 0.4).astype(int)
    contacts[0] = [1, 1, 1, 1]
    contacts_path = str(tmp_path / "foot_contacts.npy")
    np.save(contacts_path, contacts)
    return bvh_path, floor_path, contacts_path, F


def read_ref_files(out_dir, F):
    def nums(path):
        with open(path) as f:
            return [[float(x) for x in ln.split()] for ln in f if ln.strip()]

    return {
        "skel": nums(os.path.join(out_dir, "skel_info.txt")),
        "motion": nums(os.path.join(out_dir, "motion_info.txt")),
        "terrain": nums(os.path.join(out_dir, "terrain_info.txt")),
        "contact": nums(os.path.join(out_dir, "contact_info.txt")),
    }


@pytest.mark.parametrize(
    "character,combined_contacts",
    [("ybot", False), ("combined", False), ("ybot", True)],
)
def test_prepare_input_matches_reference(tmp_path, ref_towr, character, combined_contacts):
    bvh_path, floor_path, contacts_path, F = make_motion(tmp_path, character)

    ref_out = str(tmp_path / "ref_out")
    os.makedirs(ref_out)
    ref_towr.prepare_input(
        bvh_path, floor_path, contacts_path, ref_out, character,
        start_idx=0, end_idx=F, dt=1.0 / 30.0, combined_contacts=combined_contacts,
    )

    from chd_tpu.physics import prepare_input

    anim, names, _ = bvh.load(bvh_path)
    point = np.array([1.0, 95.0, 2.0])
    normal = np.array([0.01, -0.99, 0.02])
    ours_out = str(tmp_path / "ours_out")
    prepare_input(
        anim, normal, point, np.load(contacts_path), character,
        start_idx=0, end_idx=F, dt=1.0 / 30.0, out_dir=ours_out,
        combined_contacts=combined_contacts,
    )

    ref = read_ref_files(ref_out, F)
    ours = read_ref_files(ours_out, F)
    for key in ["skel", "motion", "terrain", "contact"]:
        assert len(ref[key]) == len(ours[key]), key
        for i, (a, b) in enumerate(zip(ref[key], ours[key])):
            np.testing.assert_allclose(b, a, atol=2e-4, err_msg=f"{key} line {i}")


# ---------------------------------------------------------------------------
# sol_out I/O
# ---------------------------------------------------------------------------

def test_sol_out_roundtrip_and_reference_load(tmp_path, ref_towr):
    rng = np.random.default_rng(3)
    F = 9
    from chd_tpu.physics.types import PhysResult

    res = PhysResult(
        dt=jnp.asarray(1 / 30),
        base_lin=jnp.asarray(rng.normal(size=(F, 3))),
        base_ang=jnp.asarray(rng.uniform(-1, 1, size=(F, 3))),
        ee_pos=jnp.asarray(rng.normal(size=(4, F, 3))),
        ee_force=jnp.asarray(rng.normal(size=(4, F, 3)) * 100),
        contact=jnp.asarray((rng.uniform(size=(4, F)) > 0.5).astype(float)),
    )
    path = str(tmp_path / "sol_out_dynamics.txt")
    towr_io.save_solution(res, path)

    ours = towr_io.load_results(path)
    theirs = ref_towr.load_results(path, flip_coords=True)

    np.testing.assert_allclose(ours.base_pos, theirs.base_pos, atol=1e-6)
    np.testing.assert_allclose(ours.feet_pos, theirs.feet_pos, atol=1e-6)
    np.testing.assert_allclose(ours.feet_force, theirs.feet_force, atol=1e-6)
    np.testing.assert_array_equal(ours.feet_contact, theirs.feet_contact)
    # (TowrResults' docstring claims degrees but load_results actually
    # produces radians — towr_utils.py:115-119; both are radians here)
    np.testing.assert_allclose(ours.base_rot, theirs.base_rot, atol=1e-6)
    np.testing.assert_allclose(ours.base_R, theirs.base_R, atol=1e-6)

    # success log roundtrip
    log = str(tmp_path / "success_log.txt")
    towr_io.save_success_log(log, True, False)
    assert towr_io.load_success_log(log) == {"dynamics": True, "durations": False}
