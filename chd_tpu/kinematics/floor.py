"""Robust floor-plane fitting from contact-frame foot positions.

The reference fits y = f(x, z) with sklearn's HuberRegressor twice
(src/optimize/optimize_trajectory.py:713-767): ε=1.5 for the plane itself,
then ε=2.2 whose outlier set *prunes spurious contact labels*. This module
implements the same Huber-with-concomitant-scale objective (Owen 2007, what
sklearn minimizes):

    min_{w,c,σ>0} Σ_i [ σ + H_ε((y_i − x_i·w − c)/σ)·σ ] + α‖w‖²

via optax L-BFGS, entirely in JAX. Contact points enter as a fixed-size
masked array so the solve stays jit-compatible across sequences with
different contact counts. ``outliers`` follows sklearn: |residual| > ε·σ.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class FloorFit(NamedTuple):
    coef: jnp.ndarray       # (2,) slope in x and z
    intercept: jnp.ndarray  # ()
    sigma: jnp.ndarray      # ()
    normal: jnp.ndarray     # (3,) unit plane normal
    point: jnp.ndarray      # (3,) a point on the plane
    outliers: jnp.ndarray   # (N,) bool (masked-out points are False)


def _huber(z, eps):
    a = jnp.abs(z)
    return jnp.where(a <= eps, z * z, 2.0 * eps * a - eps * eps)


@partial(jax.jit, static_argnames=("epsilon", "alpha", "iters"))
def fit_floor(
    feet_xz,
    feet_y,
    mask,
    epsilon: float = 1.5,
    alpha: float = 1e-4,
    iters: int = 100,
) -> FloorFit:
    """Fit the plane to masked contact points.

    feet_xz: (N, 2) (x, z) of contact foot positions; feet_y: (N,) heights;
    mask: (N,) validity (padding for batching).
    """
    m = mask.astype(feet_y.dtype)
    n_valid = jnp.maximum(m.sum(), 1.0)

    def objective(p):
        w, c, log_sigma = p[:2], p[2], p[3]
        sigma = jnp.exp(log_sigma)
        r = (feet_y - feet_xz @ w - c) / sigma
        per_point = sigma + _huber(r, epsilon) * sigma
        return jnp.sum(m * per_point) + alpha * jnp.dot(p[:2], p[:2])

    # init like sklearn: w=0, c=0, sigma=1
    p0 = jnp.zeros(4, feet_y.dtype)
    opt = optax.lbfgs()
    state0 = opt.init(p0)
    value_and_grad = optax.value_and_grad_from_state(objective)

    def body(_, carry):
        p, state = carry
        value, grad = value_and_grad(p, state=state)
        updates, state = opt.update(
            grad, state, p, value=value, grad=grad, value_fn=objective
        )
        p = optax.apply_updates(p, updates)
        return p, state

    p, _ = jax.lax.fori_loop(0, iters, body, (p0, state0))
    w, c, sigma = p[:2], p[2], jnp.exp(p[3])

    # plane geometry exactly like the reference (:727-733): predict three
    # points, take the cross product
    v0 = jnp.array([0.0, 0.0, 0.0], feet_y.dtype)
    v1 = jnp.array([0.0, 0.0, 100.0], feet_y.dtype)
    v2 = jnp.array([100.0, 0.0, 0.0], feet_y.dtype)

    def on_plane(v):
        return v.at[1].set(v[0] * w[0] + v[2] * w[1] + c)

    v0, v1, v2 = on_plane(v0), on_plane(v1), on_plane(v2)
    normal = jnp.cross(v2 - v0, v1 - v2)
    normal = normal / jnp.linalg.norm(normal)

    resid = feet_y - feet_xz @ w - c
    outliers = (jnp.abs(resid) > epsilon * sigma) & mask
    return FloorFit(w, c, sigma, normal, v0, outliers)


def prune_contacts(vel_constraints, feet_cols, outliers, mask):
    """Clear contact labels flagged as floor-fit outliers
    (optimize_trajectory.py:752-767).

    vel_constraints: (F, 28); feet_cols: (K,) data-order foot columns; the
    fit consumed the contact points in (frame-major, foot-minor) flattened
    order of vel_constraints[:, feet_cols] == 1 — `outliers`/`mask` are that
    flattened (F·K,) array.
    """
    flat = vel_constraints[:, feet_cols].reshape(-1)
    keep = jnp.where(mask & outliers, 0.0, flat)
    F = vel_constraints.shape[0]
    return vel_constraints.at[:, feet_cols].set(keep.reshape(F, len(feet_cols)))
