"""Synthetic benchmark/test motion clips for the physics solver.

The reference validates its solver only on downloaded example data
(`data/example_data/dance1`, README.md:60-61) which is absent in this
environment; these generators produce kinematically-plausible,
dynamically-inconsistent clips of the same shape (walking with alternating
swing phases, standing squats) used by bench.py, the trajectory scoreboard
test, and the scaling demo.
"""
from __future__ import annotations

import numpy as np


def walking_input(F: int, dt: float = 1.0 / 30.0, seed: int = 0):
    """Walking-like sequence with alternating swing phases (so the stage-3
    duration solve has real phases to optimize). Mirrors the contact-phase
    structure the reference's `find_contact_durations` extracts from real
    clips (src/utils/towr_utils.py:435-449)."""
    import jax.numpy as jnp

    from .types import PhysInput

    rng = np.random.default_rng(seed)
    t = np.arange(F) * dt
    speed = 1.2
    base_lin = np.stack([
        speed * t, np.zeros(F), 0.95 + 0.02 * np.sin(2 * np.pi * 1.6 * t)
    ], axis=1)
    base_ang = np.zeros((F, 3))
    base_ang[:, 2] = 0.05 * np.sin(2 * np.pi * 0.8 * t)

    period = int(round(0.5 / dt))  # ~0.5 s per step
    contact = np.ones((4, F))
    for f in range(F):
        ph = (f // period) % 2
        if ph == 0:
            contact[[1, 3], f] = 0.0  # right foot (toe+heel) swings
        else:
            contact[[0, 2], f] = 0.0
    contact[:, :3] = 1.0
    contact[:, -3:] = 1.0

    ee = np.zeros((4, F, 3))
    side_y = np.array([0.1, -0.1, 0.1, -0.1])
    heel_dx = np.array([0.0, 0.0, -0.2, -0.2])
    for e in range(4):
        x = speed * t + heel_dx[e]
        z = np.where(contact[e] > 0, 0.0, 0.06)
        ee[e] = np.stack([x, np.full(F, side_y[e]), z], axis=1)

    inertia = np.tile(np.eye(3) * 8.0, (F, 1, 1))
    inertia += rng.normal(0, 0.1, size=(F, 3, 3)) * np.eye(3)
    return PhysInput(
        dt=jnp.asarray(dt, jnp.float32),
        base_lin=jnp.asarray(base_lin, jnp.float32),
        base_ang=jnp.asarray(base_ang, jnp.float32),
        ee_pos=jnp.asarray(ee, jnp.float32),
        contact=jnp.asarray(contact, jnp.float32),
        left_hip=jnp.asarray(np.tile([0.0, 0.1, -0.1], (F, 1)), jnp.float32),
        right_hip=jnp.asarray(np.tile([0.0, -0.1, -0.1], (F, 1)), jnp.float32),
        inertia=jnp.asarray(inertia, jnp.float32),
        mass=jnp.asarray(73.0, jnp.float32),
        max_leg_length=jnp.asarray(1.2, jnp.float32),
        max_heel_length=jnp.asarray(1.15, jnp.float32),
        heel_dist=jnp.asarray(0.2, jnp.float32),
        floor_normal=jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
        floor_point=jnp.zeros(3, jnp.float32),
    )
