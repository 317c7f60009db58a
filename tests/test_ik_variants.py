"""Secondary IK solvers + skinning tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from chd_tpu.core.animation import Animation
from chd_tpu.core import fk, quat
from chd_tpu.core.skinning import skin, wrap_angles
from chd_tpu.kinematics.basic_ik import solve_basic_ik, solve_jacobian_ik
from chd_tpu.kinematics.ik import IKConfig

from test_ik import make_anim_and_ref


def test_basic_ik_matches_reference(ref_ik):
    rng = np.random.default_rng(20)
    ours, theirs = make_anim_and_ref(ref_ik, rng, F=4, J=8)
    gp = np.asarray(
        fk.positions_global(jnp.asarray(ours.rotations), jnp.asarray(ours.positions), ours.parents)
    )
    tgt = gp + 0.1 * rng.normal(size=gp.shape)

    got = solve_basic_ik(ours, tgt, iterations=2)

    import InverseKinematics as RefIK

    ik = RefIK.BasicInverseKinematics(theirs, tgt.copy(), iterations=2, silent=True)
    ref_res = ik()
    np.testing.assert_allclose(
        np.asarray(quat.to_euler(jnp.asarray(got.rotations), "xyz")),
        ref_res.rotations.euler(), atol=1e-6,
    )


def test_jacobian_ik_matches_reference(ref_ik):
    rng = np.random.default_rng(21)
    ours, theirs = make_anim_and_ref(ref_ik, rng, F=4, J=8)
    gp = np.asarray(
        fk.positions_global(jnp.asarray(ours.rotations), jnp.asarray(ours.positions), ours.parents)
    )
    targets = {3: gp[:, 3] + 0.05, 7: gp[:, 7] - 0.05}

    got = solve_jacobian_ik(ours, targets, IKConfig(iterations=3, damping=5.0))

    import InverseKinematics as RefIK

    ik = RefIK.JacobianInverseKinematics(
        theirs, {k: v.copy() for k, v in targets.items()},
        iterations=3, damping=5.0, silent=True,
    )
    ik()
    np.testing.assert_allclose(
        np.asarray(quat.to_euler(jnp.asarray(got.rotations), "xyz")),
        theirs.rotations.euler(), atol=1e-6,
    )


def test_jacobian_ik_secondary_task_biases_pose():
    """The references path of the reference solver is dead py2 code (xrange,
    InverseKinematics.py:259), so this is behavioral: with a positional
    secondary task, untargeted joints end closer to the reference pose."""
    rng = np.random.default_rng(22)
    from chd_tpu.core.animation import Animation as A

    parents = (-1, 0, 1, 2, 3, 4, 5, 6)
    J, F = 8, 3
    offsets = np.zeros((J, 3)); offsets[1:, 0] = 1.0
    es = rng.uniform(-0.2, 0.2, size=(F, J, 3))
    rot = np.asarray(quat.from_euler(jnp.asarray(es), "xyz", world=True))
    pos = np.broadcast_to(offsets[None], (F, J, 3)).copy()
    orients = np.zeros((J, 4)); orients[:, 0] = 1
    anim = A(rot, pos, orients, offsets, parents)

    gp = np.asarray(fk.positions_global(jnp.asarray(rot), jnp.asarray(pos), parents))
    targets = {J - 1: gp[:, J - 1] + 0.1}
    refs = gp + 0.3 * rng.normal(size=gp.shape)

    plain = solve_jacobian_ik(anim, targets, IKConfig(iterations=10, damping=3.0))
    biased = solve_jacobian_ik(
        anim, targets, IKConfig(iterations=10, damping=3.0), reference_positions=refs
    )
    gp_plain = np.asarray(fk.positions_global(
        jnp.asarray(plain.rotations), jnp.asarray(plain.positions), parents))
    gp_biased = np.asarray(fk.positions_global(
        jnp.asarray(biased.rotations), jnp.asarray(biased.positions), parents))
    mid = list(range(1, J - 1))
    d_plain = np.linalg.norm(gp_plain[:, mid] - refs[:, mid], axis=-1).mean()
    d_biased = np.linalg.norm(gp_biased[:, mid] - refs[:, mid], axis=-1).mean()
    assert d_biased < d_plain


def test_skinning_rigid_motion():
    """Skinned vertices follow a rigid transform of their owning joint."""
    parents = (-1, 0)
    offsets = np.array([[0.0, 0, 0], [1.0, 0, 0]])
    orients = np.tile([1.0, 0, 0, 0], (2, 1))
    rest_rot = np.tile([1.0, 0, 0, 0], (1, 2, 1))
    rest_pos = offsets[None]
    rest = Animation(rest_rot, rest_pos, orients, offsets, parents)

    # pose: rotate root 90° about z
    es = np.zeros((1, 2, 3))
    es[0, 0, 2] = np.pi / 2
    rot = np.asarray(quat.from_euler(jnp.asarray(es), "xyz", world=True))
    posed = Animation(rot, rest_pos, orients, offsets, parents)

    mesh = np.array([[0.5, 0.0, 0.0], [1.5, 0.0, 0.0]])
    weights = np.array([[1.0, 0.0], [0.0, 1.0]])
    out = np.asarray(skin(posed, rest, weights, mesh, maxjoints=1))
    np.testing.assert_allclose(out[0, 0], [0.0, 0.5, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], [0.0, 1.5, 0.0], atol=1e-6)


def test_wrap_angles():
    a = jnp.asarray([0.0, np.pi, -np.pi, 3 * np.pi, -2.5 * np.pi])
    w = np.asarray(wrap_angles(a))
    assert (w > -np.pi - 1e-9).all() and (w <= np.pi + 1e-9).all()
    np.testing.assert_allclose(np.cos(w), np.cos(np.asarray(a)), atol=1e-9)
    np.testing.assert_allclose(np.sin(w), np.sin(np.asarray(a)), atol=1e-9)
