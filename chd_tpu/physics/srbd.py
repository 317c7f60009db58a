"""Single-rigid-body dynamics with time-varying inertia.

JAX re-derivation of the reference's HumanoidRigidBodyDynamics
(towr_phys_optim/src/models/humanoid_rigid_body_dynamics.cpp:89-115): the
Newton–Euler violation

    ang: I_w ω̇ + ω × (I_w ω) − Σ_e (p_e − c) × f_e
    lin: m c̈ − Σ_e f_e − m g ĝ        (ĝ = −floor normal, :208-211)

with the per-frame body inertia tensor picked by time (:81-87) and
I_w = R I_b Rᵀ (:104). The base orientation convention matches TOWR's
EulerConverter: world rotation R = Rz(θz)·Ry(θy)·Rx(θx) and world angular
velocity ω = M(θ)·θ̇ with columns M = [Rz·Ry·x̂ | Rz·ŷ | ẑ].

Instead of spline derivatives and hand-written product-rule Jacobians
(:117-206), everything is finite differences on the frame grid + autodiff.
"""
from __future__ import annotations

import jax.numpy as jnp


def rot_zyx(ang):
    """R = Rz(θz)·Ry(θy)·Rx(θx) for ang (..., 3) = (θx, θy, θz)."""
    x, y, z = ang[..., 0], ang[..., 1], ang[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    r00 = cz * cy
    r01 = cz * sy * sx - sz * cx
    r02 = cz * sy * cx + sz * sx
    r10 = sz * cy
    r11 = sz * sy * sx + cz * cx
    r12 = sz * sy * cx - cz * sx
    r20 = -sy
    r21 = cy * sx
    r22 = cy * cx
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        axis=-2,
    )


def euler_rate_matrix(ang):
    """M(θ) with ω_world = M · (θ̇x, θ̇y, θ̇z)."""
    x, y, z = ang[..., 0], ang[..., 1], ang[..., 2]
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # column 0: Rz·Ry·x̂ ; column 1: Rz·ŷ ; column 2: ẑ
    c0 = jnp.stack([cz * cy, sz * cy, -sy], -1)
    c1 = jnp.stack([-sz, cz, zero], -1)
    c2 = jnp.stack([zero, zero, one], -1)
    return jnp.stack([c0, c1, c2], axis=-1)


def central_diff(x, dt):
    """(F, ...) → time derivative, central interior / one-sided edges."""
    interior = (x[2:] - x[:-2]) / (2.0 * dt)
    first = (x[1] - x[0]) / dt
    last = (x[-1] - x[-2]) / dt
    return jnp.concatenate([first[None], interior, last[None]], axis=0)


def angular_velocity(base_ang, dt):
    """World-frame ω and ω̇ from euler trajectories via finite differences."""
    ang_rate = central_diff(base_ang, dt)  # (F, 3)
    M = euler_rate_matrix(base_ang)        # (F, 3, 3)
    omega = jnp.einsum("fij,fj->fi", M, ang_rate)
    omega_dot = central_diff(omega, dt)
    return omega, omega_dot


def dynamic_violation(
    base_lin, base_ang, ee_pos, ee_force, contact, inertia, mass, gravity_dir, dt,
):
    """Newton–Euler violation per frame.

    base_lin/base_ang: (F, 3); ee_pos/ee_force: (4, F, 3); contact: (4, F);
    inertia: (F, 3, 3) body frame; gravity_dir: unit vector of gravity
    (ĝ = −floor normal). Returns (F, 6): [angular, linear].
    """
    from .types import GRAVITY

    R = rot_zyx(base_ang)                       # (F, 3, 3)
    I_w = jnp.einsum("fij,fjk,flk->fil", R, inertia, R)  # R I Rᵀ
    omega, omega_dot = angular_velocity(base_ang, dt)

    f_eff = ee_force * contact[..., None]       # forces vanish off contact
    f_sum = f_eff.sum(axis=0)                   # (F, 3)
    # τ_e = f × (c − p_e)  (reference :97-100)
    tau = jnp.cross(f_eff, base_lin[None] - ee_pos).sum(axis=0)

    acc = central_diff(central_diff(base_lin, dt), dt)

    ang = (
        jnp.einsum("fij,fj->fi", I_w, omega_dot)
        + jnp.cross(omega, jnp.einsum("fij,fj->fi", I_w, omega))
        - tau
    )
    lin = mass * acc - f_sum - mass * GRAVITY * gravity_dir
    return jnp.concatenate([ang, lin], axis=-1)
