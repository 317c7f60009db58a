import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chd_tpu.core import fk, quat, skeleton


def random_chain(rng, J=12, F=7):
    """Random topologically-ordered skeleton + animation (numpy)."""
    parents = [-1]
    for j in range(1, J):
        parents.append(int(rng.integers(0, j)))
    offsets = rng.normal(size=(J, 3))
    rot = rng.normal(size=(F, J, 4))
    rot /= np.linalg.norm(rot, axis=-1, keepdims=True)
    pos = np.broadcast_to(offsets[None], (F, J, 3)).copy()
    pos[:, 0] = rng.normal(size=(F, 3)) * 10.0
    return parents, offsets, rot, pos


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def make_ref_anim(ref_ik, rot, pos, offsets, parents):
    orients = ref_ik.Quaternions.id(len(parents))
    return ref_ik.Animation.Animation(
        ref_ik.Quaternions(rot.copy()), pos.copy(), orients, offsets.copy(),
        np.asarray(parents),
    )


def test_positions_global_matches_reference(ref_ik, rng):
    parents, offsets, rot, pos = random_chain(rng)
    ours = np.asarray(fk.positions_global(jnp.asarray(rot), jnp.asarray(pos), parents))
    theirs = ref_ik.Animation.positions_global(make_ref_anim(ref_ik, rot, pos, offsets, parents))
    np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_transforms_global_matches_reference(ref_ik, rng):
    parents, offsets, rot, pos = random_chain(rng, J=9, F=4)
    ours = np.asarray(fk.transforms_global(jnp.asarray(rot), jnp.asarray(pos), parents))
    theirs = ref_ik.Animation.transforms_global(make_ref_anim(ref_ik, rot, pos, offsets, parents))
    np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_rotations_global_matches_reference(ref_ik, rng):
    parents, offsets, rot, pos = random_chain(rng, J=10, F=3)
    gq = np.asarray(fk.rotations_global(jnp.asarray(rot), jnp.asarray(pos), parents))
    gt = ref_ik.Animation.transforms_global(make_ref_anim(ref_ik, rot, pos, offsets, parents))
    theirs = ref_ik.Quaternions.from_transforms(gt).qs
    sign = np.sign(np.sum(gq * theirs, axis=-1, keepdims=True))
    np.testing.assert_allclose(gq * sign, theirs, atol=1e-7)


def test_fk_jit_and_vmap(rng):
    parents, offsets, rot, pos = random_chain(rng, J=8, F=5)
    f = jax.jit(lambda r, p: fk.positions_global(r, p, tuple(parents)))
    single = f(jnp.asarray(rot), jnp.asarray(pos))
    batched = jax.vmap(f)(
        jnp.broadcast_to(jnp.asarray(rot), (3,) + rot.shape),
        jnp.broadcast_to(jnp.asarray(pos), (3,) + pos.shape),
    )
    np.testing.assert_allclose(np.asarray(batched[1]), np.asarray(single), atol=1e-12)


def test_descendants_mask_matches_reference(ref_ik, rng):
    parents, _, _, _ = random_chain(rng, J=15)
    ours = skeleton.descendants_mask(parents)
    theirs = ref_ik.Structure.descendants_mask(np.asarray(parents))
    np.testing.assert_allclose(ours, theirs)
