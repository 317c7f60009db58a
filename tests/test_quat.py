import numpy as np
import jax.numpy as jnp
import pytest

from chd_tpu.core import quat


def rand_quats(rng, shape):
    q = rng.normal(size=shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_mul_matches_reference(ref_ik, rng):
    a = rand_quats(rng, (5, 7))
    b = rand_quats(rng, (5, 7))
    ours = np.asarray(quat.mul(jnp.asarray(a), jnp.asarray(b)))
    theirs = (ref_ik.Quaternions(a) * ref_ik.Quaternions(b)).qs
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_rotate_matches_reference(ref_ik, rng):
    q = rand_quats(rng, (6, 3))
    v = rng.normal(size=(6, 3, 3))
    ours = np.asarray(quat.rotate(jnp.asarray(q), jnp.asarray(v)))
    theirs = ref_ik.Quaternions(q) * v
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


@pytest.mark.parametrize("order", ["xyz", "zyx", "yzx"])
@pytest.mark.parametrize("world", [False, True])
def test_from_euler_matches_reference(ref_ik, rng, order, world):
    es = rng.uniform(-np.pi, np.pi, size=(4, 9, 3))
    ours = np.asarray(quat.from_euler(jnp.asarray(es), order=order, world=world))
    theirs = ref_ik.Quaternions.from_euler(es, order=order, world=world).qs
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


@pytest.mark.parametrize("order", ["xyz", "yzx"])
def test_to_euler_matches_reference(ref_ik, rng, order):
    q = rand_quats(rng, (8, 5))
    ours = np.asarray(quat.to_euler(jnp.asarray(q), order=order))
    theirs = ref_ik.Quaternions(q).euler(order=order)
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


def test_euler_roundtrip():
    es = np.random.default_rng(1).uniform(-1.2, 1.2, size=(10, 3))
    q = quat.from_euler(jnp.asarray(es), order="xyz", world=True)
    back = np.asarray(quat.to_euler(q, order="xyz"))
    np.testing.assert_allclose(back, es, atol=1e-9)


def test_to_matrix_matches_reference(ref_ik, rng):
    q = rand_quats(rng, (11,))
    ours = np.asarray(quat.to_matrix(jnp.asarray(q)))
    theirs = ref_ik.Quaternions(q).transforms()
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_from_matrix_matches_reference(ref_ik, rng):
    q = rand_quats(rng, (50,))
    m = np.asarray(quat.to_matrix(jnp.asarray(q)))
    ours = np.asarray(quat.from_matrix(jnp.asarray(m)))
    theirs = ref_ik.Quaternions.from_transforms(m).qs
    np.testing.assert_allclose(ours, theirs, atol=1e-8)
    # and it actually inverts to_matrix (up to sign)
    sign = np.sign(np.sum(ours * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours * sign, q, atol=1e-7)


def test_angle_axis_matches_reference(ref_ik, rng):
    q = rand_quats(rng, (9, 4))
    a_ours, ax_ours = quat.to_angle_axis(jnp.asarray(q))
    a_ref, ax_ref = ref_ik.Quaternions(q).angle_axis()
    np.testing.assert_allclose(np.asarray(a_ours), a_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ax_ours), ax_ref, atol=1e-8)


def test_from_angle_axis_matches_reference(ref_ik, rng):
    angles = rng.uniform(-np.pi, np.pi, size=(7, 3))
    axes = rng.normal(size=(7, 3, 3))
    ours = np.asarray(quat.from_angle_axis(jnp.asarray(angles), jnp.asarray(axes)))
    theirs = ref_ik.Quaternions.from_angle_axis(angles, axes).qs
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


def test_exp_log_match_reference(ref_ik, rng):
    w = rng.normal(size=(12, 3)) * 0.8
    ours = np.asarray(quat.exp(jnp.asarray(w)))
    theirs = ref_ik.Quaternions.exp(w).qs
    np.testing.assert_allclose(ours, theirs, atol=1e-10)
    q = rand_quats(rng, (12,))
    np.testing.assert_allclose(
        np.asarray(quat.log(jnp.asarray(q))), ref_ik.Quaternions(q).log(), atol=1e-10
    )


def test_between_matches_reference(ref_ik, rng):
    v0 = rng.normal(size=(8, 3))
    v1 = rng.normal(size=(8, 3))
    ours = np.asarray(quat.between(jnp.asarray(v0), jnp.asarray(v1)))
    theirs = ref_ik.Quaternions.between(v0, v1).qs
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


def test_slerp_matches_reference(ref_ik, rng):
    q0 = rand_quats(rng, (20,))
    q1 = rand_quats(rng, (20,))
    # include nearly-parallel pairs to hit the linear fallback
    q1[:5] = q0[:5] + 1e-5
    q1[:5] /= np.linalg.norm(q1[:5], axis=-1, keepdims=True)
    a = rng.uniform(0, 1, size=(20,))
    ours = np.asarray(quat.slerp(jnp.asarray(q0), jnp.asarray(q1), jnp.asarray(a)))
    theirs = ref_ik.Quaternions.slerp(ref_ik.Quaternions(q0), ref_ik.Quaternions(q1), a).qs
    np.testing.assert_allclose(ours, theirs, atol=1e-8)
