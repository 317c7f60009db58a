import numpy as np
import jax.numpy as jnp
import pytest

from chd_tpu.core.animation import Animation
from chd_tpu.core import fk, quat
from chd_tpu.kinematics import IKConfig, solve_ck_ik


def make_anim_and_ref(ref_ik, rng, F=6, J=10):
    parents = [-1] + [int(rng.integers(0, j)) for j in range(1, J)]
    offsets = rng.normal(size=(J, 3))
    offsets[0] = 0
    es = rng.uniform(-0.5, 0.5, size=(F, J, 3))
    rot = np.asarray(quat.from_euler(jnp.asarray(es), "xyz", world=True))
    pos = np.broadcast_to(offsets[None], (F, J, 3)).copy()
    pos[:, 0] = rng.normal(size=(F, 3))
    orients = np.zeros((J, 4))
    orients[:, 0] = 1
    ours = Animation(rot, pos, orients, offsets, parents)
    theirs = ref_ik.Animation.Animation(
        ref_ik.Quaternions(rot.copy()), pos.copy(),
        ref_ik.Quaternions(orients.copy()), offsets.copy(), np.asarray(parents),
    )
    return ours, theirs


def run_ref_ik(ref_ik, anim, targets, **kw):
    import InverseKinematics as RefIK

    ik = RefIK.JacobianInverseKinematicsCK(anim, targets, silent=True, **kw)
    ik()
    return anim


@pytest.mark.parametrize("translate,smoothness", [(False, 0.0), (True, 0.001), (False, 0.05)])
def test_ck_ik_matches_reference(ref_ik, translate, smoothness):
    rng = np.random.default_rng(11)
    ours, theirs = make_anim_and_ref(ref_ik, rng)
    F, J = ours.shape

    # reachable-ish targets: perturbed current positions of a few joints
    gp = np.asarray(fk.positions_global(jnp.asarray(ours.rotations), jnp.asarray(ours.positions), ours.parents))
    tjoints = [3, 6, J - 1]
    targets = {t: gp[:, t] + 0.1 * rng.normal(size=(F, 3)) for t in tjoints}

    cfg = IKConfig(iterations=5, damping=7.0, smoothness=smoothness, translate=translate)
    got = solve_ck_ik(ours, targets, cfg)

    ref_res = run_ref_ik(
        ref_ik, theirs, {t: v.copy() for t, v in targets.items()},
        iterations=5, damping=7.0, smoothness=smoothness, translate=translate,
    )

    ours_euler = np.asarray(quat.to_euler(jnp.asarray(got.rotations), "xyz"))
    ref_euler = ref_res.rotations.euler()
    np.testing.assert_allclose(ours_euler, ref_euler, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.positions), ref_res.positions, atol=1e-6)


def test_ck_ik_with_references_matches(ref_ik):
    rng = np.random.default_rng(12)
    ours, theirs = make_anim_and_ref(ref_ik, rng, F=4, J=8)
    F, J = ours.shape
    gp = np.asarray(fk.positions_global(jnp.asarray(ours.rotations), jnp.asarray(ours.positions), ours.parents))
    targets = {5: gp[:, 5] + 0.05, 7: gp[:, 7] - 0.05}
    refs = rng.uniform(-0.3, 0.3, size=(F, J, 3))

    got = solve_ck_ik(ours, targets, IKConfig(iterations=4, damping=5.0), references=refs)
    # reference expects (F, J*3) y
    ref_res = run_ref_ik(
        ref_ik, theirs, {t: v.copy() for t, v in targets.items()},
        iterations=4, damping=5.0, references=refs.reshape(F, -1),
    )
    np.testing.assert_allclose(
        np.asarray(quat.to_euler(jnp.asarray(got.rotations), "xyz")),
        ref_res.rotations.euler(), atol=1e-6,
    )


def test_ck_ik_converges_to_targets():
    """Behavioral: IK actually reaches reachable targets."""
    rng = np.random.default_rng(13)
    J, F = 6, 3
    parents = [-1, 0, 1, 2, 3, 4]
    offsets = np.zeros((J, 3))
    offsets[1:, 0] = 1.0
    es = rng.uniform(-0.2, 0.2, size=(F, J, 3))
    rot = np.asarray(quat.from_euler(jnp.asarray(es), "xyz", world=True))
    pos = np.broadcast_to(offsets[None], (F, J, 3)).copy()
    orients = np.zeros((J, 4)); orients[:, 0] = 1
    anim = Animation(rot, pos, orients, offsets, parents)

    # target: end effector at a reachable point
    tgt = np.tile(np.array([[3.0, 2.0, 1.0]]), (F, 1))
    got = solve_ck_ik(anim, {J - 1: tgt}, IKConfig(iterations=100, damping=2.0))
    gp = np.asarray(fk.positions_global(jnp.asarray(got.rotations), jnp.asarray(got.positions), parents))
    err = np.linalg.norm(gp[:, J - 1] - tgt, axis=-1)
    assert err.max() < 0.05, err
