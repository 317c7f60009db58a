"""Huber floor-fit parity vs sklearn HuberRegressor (the reference's
fitter, optimize_trajectory.py:713-767)."""
import numpy as np
import jax.numpy as jnp
import pytest

sklearn = pytest.importorskip("sklearn")
from sklearn import linear_model  # noqa: E402

from chd_tpu.kinematics import floor as floor_lib  # noqa: E402


def make_contact_points(rng, n=120, outlier_frac=0.1):
    xz = rng.uniform(-80, 80, size=(n, 2))
    coef = np.array([0.03, -0.02])
    intercept = 95.0
    y = xz @ coef + intercept + rng.normal(size=n) * 0.8
    n_out = int(n * outlier_frac)
    y[:n_out] += rng.uniform(10, 30, size=n_out) * rng.choice([-1, 1], size=n_out)
    return xz, y


@pytest.mark.parametrize("eps", [1.5, 2.2])
def test_fit_matches_sklearn(eps):
    rng = np.random.default_rng(0)
    xz, y = make_contact_points(rng)
    mask = jnp.ones(len(y), bool)

    fit = floor_lib.fit_floor(jnp.asarray(xz), jnp.asarray(y), mask, epsilon=eps, iters=200)

    huber = linear_model.HuberRegressor(epsilon=eps)
    huber.fit(xz, y)

    np.testing.assert_allclose(np.asarray(fit.coef), huber.coef_, atol=5e-3)
    np.testing.assert_allclose(float(fit.intercept), huber.intercept_, atol=0.3)
    np.testing.assert_allclose(float(fit.sigma), huber.scale_, rtol=0.1)
    # outlier sets agree
    np.testing.assert_array_equal(np.asarray(fit.outliers), huber.outliers_)


def test_fit_with_padding_mask():
    """Masked (padded) points must not influence the fit."""
    rng = np.random.default_rng(1)
    xz, y = make_contact_points(rng, n=80)
    pad_xz = np.concatenate([xz, rng.uniform(-500, 500, size=(40, 2))])
    pad_y = np.concatenate([y, np.full(40, 1e4)])
    mask = jnp.asarray(np.concatenate([np.ones(80), np.zeros(40)]).astype(bool))

    fit_full = floor_lib.fit_floor(jnp.asarray(xz), jnp.asarray(y), jnp.ones(80, bool), iters=200)
    fit_masked = floor_lib.fit_floor(jnp.asarray(pad_xz), jnp.asarray(pad_y), mask, iters=200)
    np.testing.assert_allclose(np.asarray(fit_masked.coef), np.asarray(fit_full.coef), atol=1e-4)
    assert not bool(fit_masked.outliers[80:].any())


def test_normal_geometry():
    """Plane normal/point reproduce the reference's three-point construction."""
    rng = np.random.default_rng(2)
    xz, y = make_contact_points(rng)
    fit = floor_lib.fit_floor(jnp.asarray(xz), jnp.asarray(y), jnp.ones(len(y), bool), iters=200)
    n = np.asarray(fit.normal)
    # points on the fitted plane must satisfy n·(p − point) = 0
    p_test = np.array([10.0, 10 * fit.coef[0] + 5 * fit.coef[1] + fit.intercept, 5.0])
    assert abs(n @ (p_test - np.asarray(fit.point))) < 1e-3
    assert np.isclose(np.linalg.norm(n), 1.0)


def test_prune_contacts():
    vc = np.zeros((4, 28))
    feet_cols = np.array([21, 19, 20, 24, 22, 23])
    vc[:, feet_cols] = 1.0
    mask = jnp.asarray(vc[:, feet_cols].reshape(-1) == 1)
    outliers = jnp.zeros(4 * 6, bool).at[3].set(True).at[10].set(True)
    pruned = np.asarray(
        floor_lib.prune_contacts(jnp.asarray(vc), jnp.asarray(feet_cols), outliers, mask)
    )
    flat = pruned[:, feet_cols].reshape(-1)
    assert flat[3] == 0 and flat[10] == 0
    assert flat.sum() == 24 - 2
