"""Batched multi-sequence solving — the framework's scale-out story.

The reference processes videos with a sequential per-video subprocess loop
(scripts/run_phys_mocap.py:80) and one CPU IPOPT process per sequence. Here
every per-sequence solver is a pure jit function of padded, fixed-shape
inputs, so scaling is:

  vmap   — many sequences per chip (one lockstep LM/AL solve for the batch);
  pjit   — the batch axis sharded over the 'data' axis of a device mesh,
           XLA splitting the vmapped solve across chips via ICI.

Ragged sequences pad to a common frame count: frame-indexed fields
replicate the last real frame, and a per-sequence frame_mask zeroes every
cost and constraint residual on padded frames (see physics/collocation.py),
so padding cannot perturb the real solution.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kinematics.lm import LMConfig, frame_coloring_masks, lm_solve
from ..physics import collocation
from ..physics.types import PhysInput, PhysResult, PhysWeights


def pad_phys_inputs(inputs: Sequence[PhysInput], num_frames: Optional[int] = None):
    """Stack per-sequence PhysInputs into one batched PhysInput + mask.

    Frame-indexed fields repeat the final frame; the frame_mask marks
    padding so the solver ignores it entirely. Returns
    (batched PhysInput (B, F, ...), seq_lens)."""
    longest = max(int(p.base_lin.shape[0]) for p in inputs)
    F = num_frames or longest
    if F < longest:
        raise ValueError(
            f"num_frames={F} is shorter than the longest sequence ({longest}); "
            "pad_phys_inputs pads, it does not truncate"
        )

    def pad_time(a, axis):
        a = np.asarray(a)
        n = a.shape[axis]
        if n == F:
            return a
        last = np.take(a, [-1], axis=axis)
        reps = [1] * a.ndim
        reps[axis] = F - n
        return np.concatenate([a, np.tile(last, reps)], axis=axis)

    fields = {}
    for name in PhysInput._fields:
        vals = [getattr(p, name) for p in inputs]
        if name in ("base_lin", "base_ang", "left_hip", "right_hip", "inertia"):
            arr = np.stack([pad_time(v, 0) for v in vals])
        elif name in ("ee_pos",):
            arr = np.stack([pad_time(v, 1) for v in vals])
        elif name == "contact":
            arr = np.stack([pad_time(v, 1) for v in vals])
        elif name == "frame_mask":
            continue  # built below from seq lengths
        else:
            arr = np.stack([np.asarray(v) for v in vals])
        fields[name] = jnp.asarray(arr)
    seq_lens = np.array([int(p.base_lin.shape[0]) for p in inputs])
    fields["frame_mask"] = jnp.asarray(
        (np.arange(F)[None, :] < seq_lens[:, None]).astype(np.float32)
    )
    return PhysInput(**fields), seq_lens


def solve_physics_batch(
    phys_batch: PhysInput,
    weights: PhysWeights = PhysWeights(),
    cfg: collocation.SolveConfig = collocation.SolveConfig(),
    mesh=None,
) -> Tuple[PhysResult, PhysResult]:
    """Solve B physics problems in lockstep (vmap), optionally sharded over a
    mesh's 'data' axis. Returns batched (fit, dynamics) results."""
    B, F = phys_batch.base_lin.shape[:2]
    masks = frame_coloring_masks(F, collocation.DOF, dtype=phys_batch.base_lin.dtype)
    dyn_cost = collocation.CostW(
        weights.w_com_lin, weights.w_com_ang, weights.w_ee,
        0.001, 0.001, weights.w_smooth, 1e-4, 1e3,
    )

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        phys_batch = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P("data"))), phys_batch
        )

    def solve_one_stage(x, phys, lams, w, rho):
        fn = collocation.make_al_residual_fn(w, rho)
        x, _ = lm_solve(fn, x, (phys, lams), cfg.lm, diag_masks=masks)
        lams = collocation.update_multipliers(x, phys, lams, rho)
        return x, lams

    vstage = jax.vmap(solve_one_stage, in_axes=(0, 0, 0, None, None))

    x = jax.vmap(collocation.join_vars)(
        phys_batch.base_lin, phys_batch.base_ang, phys_batch.ee_pos,
        jnp.zeros_like(phys_batch.ee_pos),
    )
    lams = jax.vmap(collocation.init_multipliers)(phys_batch)

    for _ in range(cfg.al_iters_fit):
        x, lams = vstage(x, phys_batch, lams, collocation.FIT_COST, collocation.FIT_RHO)
    res_fit = jax.vmap(collocation._to_result)(x, phys_batch)

    for _ in range(cfg.al_iters_dyn):
        x, lams = vstage(x, phys_batch, lams, dyn_cost, collocation.DYN_RHO)
    for _ in range(cfg.al_iters_height):
        x, lams = vstage(x, phys_batch, lams, dyn_cost, collocation.DYN_H_RHO)
    res_dyn = jax.vmap(collocation._to_result)(x, phys_batch)
    return res_fit, res_dyn


def unbatch_results(res: PhysResult, seq_lens) -> List[PhysResult]:
    out = []
    for i, L in enumerate(seq_lens):
        out.append(
            PhysResult(
                dt=res.dt[i],
                base_lin=np.asarray(res.base_lin[i][:L]),
                base_ang=np.asarray(res.base_ang[i][:L]),
                ee_pos=np.asarray(res.ee_pos[i][:, :L]),
                ee_force=np.asarray(res.ee_force[i][:, :L]),
                contact=np.asarray(res.contact[i][:, :L]),
            )
        )
    return out
