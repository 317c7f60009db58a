"""Data structures for the physics trajectory optimization.

In-memory replacements for the four whitespace text files the reference
pipeline shuttles between python and the C++ IPOPT front-end
(src/utils/towr_utils.py:451-777 writers ↔ towr_phys_optim/phys_optim.cpp:
169-267 readers). All quantities are in TOWR convention: meters, seconds,
and the swizzled axes (x, z_up) — see prepare.py for the transform.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

NUM_EE = 4  # left toe, right toe, left heel, right heel (phys_optim.cpp:104)
GRAVITY = 9.80665  # m/s² (TOWR DynamicModel)


class PhysInput(NamedTuple):
    """One sequence's physics problem (frame grid, dt = 1/fps)."""

    dt: jnp.ndarray              # () seconds between frames
    base_lin: jnp.ndarray        # (F, 3) COM position init
    base_ang: jnp.ndarray        # (F, 3) base euler angles init (radians, xyz)
    ee_pos: jnp.ndarray          # (4, F, 3) EE position init (lt, rt, lh, rh)
    contact: jnp.ndarray         # (4, F) binary contact schedule
    left_hip: jnp.ndarray        # (F, 3) hip offset in COM (body) frame
    right_hip: jnp.ndarray       # (F, 3)
    inertia: jnp.ndarray         # (F, 3, 3) body-frame inertia about COM
    mass: jnp.ndarray            # ()
    max_leg_length: jnp.ndarray  # () hip→toe
    max_heel_length: jnp.ndarray  # () hip→heel
    heel_dist: jnp.ndarray       # () toe↔heel separation
    floor_normal: jnp.ndarray    # (3,) unit, points away from ground
    floor_point: jnp.ndarray     # (3,)
    frame_mask: jnp.ndarray = None  # (F,) 1 = real frame; None = all real.
    # Ragged batches pad to a common F (parallel/batch.pad_phys_inputs);
    # masked frames contribute no cost or constraint residuals at all.


class PhysWeights(NamedTuple):
    """Pipeline cost weights (scripts/run_phys_mocap.py:33-44 defaults,
    flags at phys_optim.cpp:27-31)."""

    w_com_lin: float = 0.4
    w_com_ang: float = 1.7
    w_ee: float = 0.3
    w_smooth: float = 0.1
    w_dur: float = 0.1


class PhysResult(NamedTuple):
    """Optimized solution on the frame grid (sol_out_*.txt content)."""

    dt: jnp.ndarray
    base_lin: jnp.ndarray   # (F, 3)
    base_ang: jnp.ndarray   # (F, 3) radians
    ee_pos: jnp.ndarray     # (4, F, 3)
    ee_force: jnp.ndarray   # (4, F, 3)
    contact: jnp.ndarray    # (4, F)
