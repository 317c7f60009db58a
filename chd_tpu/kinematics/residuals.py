"""Residuals for the kinematic trajectory optimization.

Vectorized equivalent of the reference objective
(src/optimize/optimize_trajectory.py ``fun_anim_for_projection``:324-483),
with identical block layout and per-element semantics so outputs can be
compared element-wise:

  [ projection (F·28·2) | velocity smoothness ((F−1)·28·3) |
    acceleration smoothness ((F−2)·28·3) | data (F·28·3) |
    contact zero-velocity ((F−1)·28·3) | floor distance (F·28) |
    euler-velocity smoothness ((F−1)·29·3) ]

Variables x: (F, 3 + J·3) = per-frame root translation + world-'xyz' euler
angles in SKELETON order. FK runs with the root pinned at the origin, so
joint positions are root-relative; the root slot of the data-order position
array carries the root variable itself (:344-359).

Masked entries (zero projection/data weight, no contact) are exact zeros,
matching the reference's pre-zeroed f vector. Autodiff through this function
replaces the hand-written Jacobians at :51-322.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..characters import defs
from ..core import quat
from ..core.fk import positions_global

# per-axis smoothness multipliers (optimize_trajectory.py:43-48)
SMOOTH_VEL_XYZ = jnp.asarray([1.0, 1.0, 2.0])
SMOOTH_VEL_EULER = 10.0


class TrajectoryData(NamedTuple):
    """Per-sequence problem data (traced inputs to the solver)."""

    pose3d: jnp.ndarray          # (F, 28, 3) data-order, root-relative (MTC init)
    root_trans: jnp.ndarray      # (F, 3)
    pose2d_norm: jnp.ndarray     # (F, 28, 2) normalized image coords
    proj_weights: jnp.ndarray    # (F, 28) conf-scaled projection weights
    data_weights: jnp.ndarray    # (F, 28)
    smooth_weights: jnp.ndarray  # (28,) per-joint (data order)
    vel_constraints: jnp.ndarray  # (F, 28) 1 = in contact
    floor_normal: jnp.ndarray    # (3,)
    floor_point: jnp.ndarray     # (3,)
    offsets: jnp.ndarray         # (J, 3) fitted skeleton offsets (skeleton order)
    frame_mask: jnp.ndarray = None  # (F,) 1 = real frame; None = all real
    # (batched ragged sequences pad to a common F; masked frames contribute
    # no residuals at all, so padding cannot perturb the real solution)


class TermWeights(NamedTuple):
    """Stage weights (optimize_trajectory.py:630-635 stage 1, :773-778 stage 2)."""

    proj: float = 1000.0
    smooth_vel: float = 0.1
    smooth_acc: float = 0.5
    data: float = 0.3
    vel: float = 10.0
    floor: float = 0.0


@functools.lru_cache(maxsize=None)
def residual_fn_for(parents: Tuple[int, ...]):
    """Stable residual-fn object per skeleton topology.

    lm_solve keys its jit cache on the residual_fn's identity, so callers
    must NOT hand it a fresh closure per call — that forces a full LM
    recompile every solve (measured ~45 s per batch-16 call on v5e vs ~4 s
    for the actual solve). Weights ride through lm_solve's traced ``args``.
    """

    def residual(x, data, w):
        return trajectory_residuals(x, data, w, parents)

    return residual


def data_order_positions(x, offsets, parents: Tuple[int, ...]):
    """FK → data-order positions y with y[:, root] = root variable.

    x: (F, 3+J*3). Returns (y (F, 28, 3), root (F, 3))."""
    F = x.shape[0]
    J = offsets.shape[0]
    root = x[:, :3]
    euler = x[:, 3:].reshape(F, J, 3)
    rot = quat.from_euler(euler, "xyz", world=True)
    pos = jnp.broadcast_to(offsets, (F, J, 3))
    gp = positions_global(rot, pos, parents)  # root at origin → root-relative
    y = gp[:, jnp.asarray(defs.COMBINED_DATA_TO_SKEL)]
    y = y.at[:, defs.COMBINED_ROOT_IDX].set(root)
    return y, root


def trajectory_residuals(
    x,
    data: TrajectoryData,
    w: TermWeights,
    parents: Tuple[int, ...],
):
    F = data.pose3d.shape[0]
    Jd = data.pose3d.shape[1]  # 28, data order
    root_idx = defs.COMBINED_ROOT_IDX
    x = x.reshape(F, -1)
    fm = (
        jnp.ones((F,), x.dtype) if data.frame_mask is None
        else data.frame_mask.astype(x.dtype)
    )
    pair = fm[:-1] * fm[1:]          # both frames real
    triple = pair[:-1] * fm[2:]      # three consecutive real frames

    y, root = data_order_positions(x, data.offsets, parents)

    # --- projection (F, 28, 2) -------------------------------------------------
    root_b = root[:, None, :]
    num = jnp.where(
        (jnp.arange(Jd) == root_idx)[None, :, None], y, y + root_b
    )
    active = (data.proj_weights > 0)[..., None]
    # guard masked rows' depth: grad-of-where still sees the untaken branch,
    # so a 0-depth padded joint would otherwise poison gradients with NaNs
    z = jnp.where(active, num[..., 2:3], 1.0)
    proj = num[..., :2] / z
    r_proj = jnp.where(
        active, w.proj * data.proj_weights[..., None] * (proj - data.pose2d_norm), 0.0
    ) * fm[:, None, None]

    # --- velocity smoothness ((F-1), 28, 3) ------------------------------------
    sw = data.smooth_weights[None, :, None] * SMOOTH_VEL_XYZ[None, None, :]
    r_sv = w.smooth_vel * sw * (y[:-1] - y[1:]) * pair[:, None, None]

    # --- acceleration smoothness ((F-2), 28, 3) ---------------------------------
    vel = y[1:] - y[:-1]
    r_sa = w.smooth_acc * (vel[1:] - vel[:-1]) * triple[:, None, None]

    # --- data term (F, 28, 3) ---------------------------------------------------
    target = data.pose3d.at[:, root_idx].set(data.root_trans)
    r_data = w.data * data.data_weights[..., None] * (y - target) * fm[:, None, None]

    # --- contact zero-velocity ((F-1), 28, 3) -----------------------------------
    world = y + root_b  # note: root entry becomes 2·root, but contacts never on root
    mask_v = (data.vel_constraints[:-1] == 1)[..., None]
    r_vel = jnp.where(mask_v, w.vel * (world[:-1] - world[1:]), 0.0) * pair[:, None, None]

    # --- floor distance (F, 28) --------------------------------------------------
    d = jnp.einsum("fjc,c->fj", world - data.floor_point, data.floor_normal)
    r_floor = jnp.where(data.vel_constraints == 1, w.floor * d, 0.0) * fm[:, None]

    # --- euler-velocity smoothness ((F-1), 29, 3) — includes root translation ----
    xr = x.reshape(F, -1, 3)
    r_es = w.smooth_vel * SMOOTH_VEL_EULER * (xr[:-1] - xr[1:]) * pair[:, None, None]

    return jnp.concatenate(
        [
            r_proj.reshape(-1),
            r_sv.reshape(-1),
            r_sa.reshape(-1),
            r_data.reshape(-1),
            r_vel.reshape(-1),
            r_floor.reshape(-1),
            r_es.reshape(-1),
        ]
    )
