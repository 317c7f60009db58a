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
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kinematics.lm import LMConfig, frame_coloring_masks, lm_solve
from ..physics import collocation
from ..physics import durations as dur_lib
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
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        phys_batch = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P("data"))), phys_batch
        )

    return _staged_core(phys_batch, weights, cfg)


@functools.partial(jax.jit, static_argnames=("weights", "cfg"))
def _staged_core(phys_batch: PhysInput, weights: PhysWeights,
                 cfg: collocation.SolveConfig):
    """Traceable FIT→DYN→HEIGHT body shared by :func:`solve_physics_batch`
    and the one-dispatch :func:`solve_physics_full_batch`."""
    B, F = phys_batch.base_lin.shape[:2]
    masks = frame_coloring_masks(F, collocation.DOF,
                                 dtype=phys_batch.base_lin.dtype)
    dyn_cost = collocation.dyn_cost_for(weights)

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
        x, lams = vstage(x, phys_batch, lams, collocation.FIT_COST,
                         collocation.FIT_RHO)
    res_fit = jax.vmap(collocation._to_result)(x, phys_batch)

    for _ in range(cfg.al_iters_dyn):
        x, lams = vstage(x, phys_batch, lams, dyn_cost, collocation.DYN_RHO)
    for _ in range(cfg.al_iters_height):
        x, lams = vstage(x, phys_batch, lams, dyn_cost, collocation.DYN_H_RHO)
    res_dyn = jax.vmap(collocation._to_result)(x, phys_batch)
    return res_fit, res_dyn


@functools.partial(jax.jit, static_argnames=("weights", "cfg"))
def _full_solve_core(phys_batch: PhysInput, spec_b, weights: PhysWeights,
                     cfg: collocation.SolveConfig):
    """The WHOLE staged solve (FIT→DYN→HEIGHT→durations→frozen polish) as
    one traced graph — see :func:`solve_physics_full_batch`."""
    res_fit, res_dyn = _staged_core(phys_batch, weights, cfg)
    res, stats, ok = durations_core(phys_batch, res_dyn, spec_b, weights, cfg)
    return res_fit, res_dyn, res, stats, ok


def solve_physics_full_batch(
    phys_batch: PhysInput,
    weights: PhysWeights = PhysWeights(),
    cfg: collocation.SolveConfig = collocation.SolveConfig(),
    mesh=None,
    spec_b: Optional[dur_lib.DurationSpec] = None,
):
    """The full staged solve in ONE device dispatch.

    solve_physics_batch + solve_physics_durations_batch issue 13 separate
    lm_solve dispatches per solve; behind an interactive tunnel / remote
    coordinator each dispatch pays a host round-trip, which round-5
    measurements showed dominating the solve wall time at batch ≤32 (wall
    nearly flat in both batch size and LM/CG budgets, and 40% run-to-run
    drift on identical configs — BASELINE.md "physics dispatch anatomy").
    Fusing every stage into one jit call leaves exactly one round-trip.

    Returns (res_fit, res_dyn, res_final, stats, durations_ok) — the
    reference's sol_out_no_dynamics / sol_out_dynamics / final artifacts
    (phys_optim.cpp:554-749)."""
    if spec_b is None:
        spec_b = pad_duration_specs(phys_batch)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as Pspec

        put = lambda t: jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, Pspec("data"))), t
        )
        phys_batch, spec_b = put(phys_batch), put(spec_b)
    res_fit, res_dyn, res, stats, ok = _full_solve_core(
        phys_batch, spec_b, weights, cfg)
    return res_fit, res_dyn, res, stats, np.asarray(ok)


def pad_duration_specs(phys_batch: PhysInput) -> dur_lib.DurationSpec:
    """Per-sequence DurationSpecs from the batched (padded) contact
    schedules, padded to a common phase count P_max (zero-length phases with
    phase_mask 0 — soft_contact hard-masks them). Returns a batched
    DurationSpec with leading axis B."""
    B = phys_batch.contact.shape[0]
    specs = [
        dur_lib.build_duration_spec(
            np.asarray(phys_batch.contact[i]), float(phys_batch.dt[i])
        )
        for i in range(B)
    ]
    P = max(int(s.durations.shape[1]) for s in specs)

    def pad(a, width):
        a = np.asarray(a)
        return np.concatenate(
            [a, np.zeros((a.shape[0], width - a.shape[1]), a.dtype)], axis=1
        )

    return dur_lib.DurationSpec(
        jnp.asarray(np.stack([pad(s.durations, P) for s in specs])),
        jnp.asarray(np.stack([pad(s.phase_mask, P) for s in specs])),
        jnp.asarray(np.stack([pad(s.contact_phase, P) for s in specs])),
        jnp.asarray(np.stack([np.asarray(s.total_time) for s in specs])),
    )


def solve_physics_durations_batch(
    phys_batch: PhysInput,
    stage2: PhysResult,
    weights: PhysWeights = PhysWeights(),
    cfg: collocation.SolveConfig = collocation.SolveConfig(),
    mesh=None,
) -> Tuple[PhysResult, Dict[str, jnp.ndarray], np.ndarray]:
    """Batched stage-3 duration refinement + stage-4 frozen re-solve.

    vmap of collocation.solve_physics_durations (phys_optim.cpp:663-749):
    per-sequence phase durations (padded to the batch's P_max) join the LM
    variable vector behind a soft contact schedule, then each sequence is
    re-solved with its re-rasterized schedule frozen. Returns (batched
    result, batched violation stats, per-sequence durations_ok flags —
    callers keep the stage-2 result where ok is False, the reference's
    fallback rule)."""
    spec_b = pad_duration_specs(phys_batch)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as Pspec

        put = lambda t: jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, Pspec("data"))), t
        )
        phys_batch, stage2, spec_b = put(phys_batch), put(stage2), put(spec_b)

    res, stats, ok = durations_core(phys_batch, stage2, spec_b, weights, cfg)
    return res, stats, np.asarray(ok)


def stage3_problem(F: int, dtype, spec_b: dur_lib.DurationSpec,
                   weights: PhysWeights):
    """The stage-3 augmented-LM problem pieces: (fn3, masks_aug, traj_masks,
    dyn_cost, n_traj). ONE construction shared by :func:`durations_core` and
    bench.py's cost_analysis()-based FLOP accounting, so the accounted graph
    cannot drift from the solved one."""
    P = int(spec_b.durations.shape[-1])
    dof_d = 4 * P
    n_traj = F * collocation.DOF

    dyn_cost = collocation.dyn_cost_for(weights, accel=0.0)
    fn3 = collocation.make_stage3_residual_fn(
        dyn_cost, collocation.DYN_H_RHO, weights.w_dur, F
    )

    traj_masks = frame_coloring_masks(F, collocation.DOF, dtype=dtype)
    masks_aug = jnp.concatenate(
        [
            jnp.concatenate(
                [traj_masks, jnp.zeros((traj_masks.shape[0], dof_d), dtype)], axis=1
            ),
            jnp.concatenate(
                [jnp.zeros((dof_d, n_traj), dtype), jnp.eye(dof_d, dtype=dtype)],
                axis=1,
            ),
        ],
        axis=0,
    )
    return fn3, masks_aug, traj_masks, dyn_cost, n_traj


def durations_core(
    phys_batch: PhysInput,
    stage2: PhysResult,
    spec_b: dur_lib.DurationSpec,
    weights: PhysWeights = PhysWeights(),
    cfg: collocation.SolveConfig = collocation.SolveConfig(),
):
    """Traceable stage-3/4 body (no host round-trips): jit-wrap together with
    solve_physics_batch to lower the WHOLE staged solve into one executable —
    bench.py uses this for cost_analysis()-based FLOP/MFU accounting.
    ``spec_b`` comes from :func:`pad_duration_specs` (host-side, needs
    concrete contact schedules). Returns ok as a device bool array."""
    B, F = phys_batch.base_lin.shape[:2]
    dtype = phys_batch.base_lin.dtype
    fn3, masks_aug, traj_masks, dyn_cost, n_traj = stage3_problem(
        F, dtype, spec_b, weights)

    def stage3_iter(x_aug, phys, lams, spec):
        x_aug, _ = lm_solve(fn3, x_aug, (phys, lams, spec), cfg.lm, diag_masks=masks_aug)
        d = x_aug[n_traj:].reshape(spec.durations.shape)
        c_soft = dur_lib.soft_contact(d, spec, F, phys.dt)
        lams = collocation.update_multipliers(
            x_aug[:n_traj], phys, lams, collocation.DYN_H_RHO, contact=c_soft
        )
        return x_aug, lams

    v_stage3 = jax.vmap(stage3_iter)

    x2 = jax.vmap(collocation.join_vars)(
        stage2.base_lin, stage2.base_ang, stage2.ee_pos, stage2.ee_force
    )
    x_aug = jnp.concatenate([x2, spec_b.durations.reshape(B, -1)], axis=-1)
    lams = jax.vmap(collocation.init_multipliers)(phys_batch)
    for _ in range(cfg.al_iters_durations):
        x_aug, lams = v_stage3(x_aug, phys_batch, lams, spec_b)

    x3 = x_aug[:, :n_traj]
    d3 = x_aug[:, n_traj:].reshape(spec_b.durations.shape)
    new_contact = jax.vmap(lambda d, s, dt: dur_lib.rasterize(d, s, F, dt))(
        d3, spec_b, phys_batch.dt
    )
    phys_new = phys_batch._replace(contact=new_contact)

    # STAGE 4: frozen-duration polish under the re-rasterized hard schedule
    fn4 = collocation.make_al_residual_fn(dyn_cost, collocation.DYN_H_RHO)

    def stage4_iter(x, phys, lams):
        x, _ = lm_solve(fn4, x, (phys, lams), cfg.lm, diag_masks=traj_masks)
        lams = collocation.update_multipliers(x, phys, lams, collocation.DYN_H_RHO)
        return x, lams

    v_stage4 = jax.vmap(stage4_iter)
    lams4 = jax.vmap(collocation.init_multipliers)(phys_new)
    x4 = x3
    for _ in range(max(cfg.al_iters_height, 1)):
        x4, lams4 = v_stage4(x4, phys_new, lams4)

    stats = jax.vmap(collocation.violation_stats_arrays)(x4, phys_new)
    old_stats = jax.vmap(collocation.violation_stats_arrays)(x2, phys_batch)
    dyn_floor = collocation._dyn_tol_floor(phys_batch.mass)
    ok = jnp.logical_and(
        stats["dyn"] <= jnp.maximum(2.0 * old_stats["dyn"], dyn_floor),
        stats["terrain"] <= jnp.maximum(2.0 * old_stats["terrain"], 0.02),
    )
    res = jax.vmap(collocation._to_result)(x4, phys_new)
    return res, stats, ok


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
