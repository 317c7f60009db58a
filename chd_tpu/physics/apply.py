"""Re-apply physics-optimized trajectories onto the full skeleton.

Equivalent of towr_utils.apply_results (src/utils/towr_utils.py:779-857):
preserve the upper body's offsets relative to the original COM, drive the
root from the optimized COM/orientation, and run translate-enabled CK-IK
(30 iterations, smoothness 1e-3, damping 7) with targets on the upper-body
joints, the toes, and the heels.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..characters import get_character
from ..core import quat
from ..core.animation import Animation
from ..core.fk import positions_global
from ..kinematics.ik import IKConfig, solve_ck_ik
from .prepare import add_heel
from .towr_io import LoadedResults


def _fk(anim: Animation) -> np.ndarray:
    return np.array(
        positions_global(
            jnp.asarray(anim.rotations), jnp.asarray(anim.positions), anim.parents
        )
    )


def apply_results(
    results: LoadedResults,
    anim: Animation,
    character: str,
    start_idx: int = 0,
    end_idx: int | None = None,
    run_ik: bool = True,
) -> Tuple[Animation, Animation, np.ndarray]:
    """Returns (optimized anim, original anim slice, original COM (cm))."""
    char = get_character(character)
    end_idx = anim.num_frames if end_idx is None else end_idx
    anim = anim.slice_frames(start_idx, end_idx)
    F = anim.num_frames

    if (not char.has_heel) and results.feet_pos.shape[1] == 4:
        anim = add_heel(anim, char.toe_inds, char.ankle_inds)

    init_pos = _fk(anim)
    idx, w, frac = char.segment_matrices()
    seg_pos = np.einsum("sk,fskd->fsd", w, init_pos[:, idx])
    com = np.einsum("s,fsd->fd", frac, seg_pos)  # (F, 3) cm

    upper = list(char.upper_body_joints)
    upper_offsets = init_pos[:, upper] - com[:, None, :]

    anim_og = anim.copy()
    seq = min(F, results.base_pos.shape[0])

    desired = upper_offsets[:seq] + results.base_pos[:seq, None, :] * 100.0

    rot = np.array(anim.rotations)
    rot[:seq, 0] = np.asarray(
        quat.from_euler(jnp.asarray(results.base_rot[:seq]), "xyz", world=True)
    )
    pos = np.array(anim.positions)
    pos[:seq, 0] = desired[:, 0]
    new_anim = anim.replace(rotations=rot, positions=pos)

    if run_ik:
        targetmap = {int(j): desired[:, k] for k, j in enumerate(upper)}
        lt, rt = char.toe_inds
        targetmap[int(lt)] = results.feet_pos[:seq, 0] * 100.0
        targetmap[int(rt)] = results.feet_pos[:seq, 1] * 100.0
        if results.feet_pos.shape[1] == 4:
            if char.has_heel:
                lh, rh = char.heel_indices
            else:
                lh, rh = new_anim.num_joints - 2, new_anim.num_joints - 1
            targetmap[int(lh)] = results.feet_pos[:seq, 2] * 100.0
            targetmap[int(rh)] = results.feet_pos[:seq, 3] * 100.0

        new_anim = solve_ck_ik(
            new_anim.slice_frames(0, seq),
            targetmap,
            IKConfig(iterations=30, damping=7.0, smoothness=0.001, translate=True),
        )

    return new_anim, anim_og, com


def remove_heel(anim: Animation) -> Animation:
    """Drop the two injected heel joints (towr_utils.remove_heel_from_anim
    :425-433)."""
    J = anim.num_joints - 2
    return Animation(
        np.asarray(anim.rotations)[:, :J],
        np.asarray(anim.positions)[:, :J],
        np.asarray(anim.orients)[:J],
        np.asarray(anim.offsets)[:J],
        tuple(anim.parents)[:J],
    )
