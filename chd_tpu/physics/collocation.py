"""Physics trajectory optimization as batched direct collocation.

TPU-native replacement for the TOWR/IPOPT pipeline (towr_phys_optim/
phys_optim.cpp:375-762 + the TOWR phase-based spline NLP). Design mapping:

- TOWR's phase-based node splines with per-phase polynomial budgets
  (nodes_variables_dynamic_phase_based.cpp) are hostile to XLA's static
  shapes; instead ALL quantities live on the fixed frame grid
  (dt = 1/fps): variables are per-frame [base_lin, base_ang, 4×ee_pos,
  4×ee_force] — (F, 30). Derivatives are finite differences.
- IPOPT's interior-point handling of constraints becomes an augmented
  Lagrangian: each constraint block carries multipliers λ and penalty ρ;
  inner minimizations run the same matrix-free Levenberg–Marquardt used by
  the kinematic stage (banded structure → exact Jacobi scaling via frame
  coloring), outer iterations update λ.
- the reference's staged schedule is reproduced (stage refs phys_optim.cpp):
  FIT    (1.1/1.2, :554-603): data+smooth costs, kinematic constraints;
  DYNAMICS (2.1, :606-643): + Newton–Euler + friction-cone constraints,
           pipeline cost weights (w_com_lin 0.4, w_com_ang 1.7, w_ee 0.3);
  HEIGHT  (2.2, :646-661): + above-floor clearance;
  DURATIONS (3, :663-711): see solve_physics_durations — the binary contact
           schedule becomes a smooth function of phase-duration variables
           (physics/durations.py), which join the LM variable vector; after
           re-rasterization a frozen-duration re-solve polishes the
           trajectory (the reference's stage 4, :713-749), and failure falls
           back to the stage-2 result just like the reference.
- swing-phase forces are eliminated rather than constrained: effective force
  = contact_mask · f (the TOWR EEForce parameterization pins them to zero,
  nodes_variables_dynamic_phase_based.cpp:121-151); stance no-slip and
  on-terrain conditions replace TOWR's single-stance-node parameterization.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kinematics.lm import LMConfig, frame_coloring_masks, lm_solve
from . import srbd
from .types import NUM_EE, PhysInput, PhysResult, PhysWeights

DOF = 6 + NUM_EE * 3 + NUM_EE * 3  # 30 per frame
FRICTION = 0.5          # TOWR HeightMap default friction coefficient
FORCE_LIMIT = 1000.0    # N (parameters.cpp force_limit_in_normal_direction_)


class CostW(NamedTuple):
    data_lin: float
    data_ang: float
    data_ee: float
    sv_lin: float
    sv_ang: float
    sv_ee: float
    sa: float          # acceleration smoothing (0 = off)
    pin: float         # initial/final base state penalty


class Rho(NamedTuple):
    """Penalty strengths per constraint block (0 disables the block)."""

    dyn: float = 0.0
    leg: float = 0.0
    heel: float = 0.0
    terrain: float = 0.0
    slip: float = 0.0
    force: float = 0.0
    height: float = 0.0


# stage schedules (see module docstring)
FIT_COST = CostW(1.0, 1.0, 1.0, 0.1, 0.1, 0.1, 0.0, 1e3)
FIT_RHO = Rho(leg=10.0, heel=100.0, terrain=100.0, slip=100.0)
DYN_COST = CostW(0.4, 1.7, 0.3, 0.001, 0.001, 0.1, 1e-4, 1e3)
DYN_RHO = Rho(dyn=0.05, leg=10.0, heel=100.0, terrain=100.0, slip=100.0, force=1e-4)
DYN_H_RHO = Rho(dyn=0.05, leg=10.0, heel=100.0, terrain=100.0, slip=100.0, force=1e-4, height=100.0)


def split_vars(x, F: int):
    """x (F·30,) → (base_lin (F,3), base_ang (F,3), ee (4,F,3), force (4,F,3))."""
    m = x.reshape(F, DOF)
    base_lin = m[:, 0:3]
    base_ang = m[:, 3:6]
    ee = m[:, 6 : 6 + NUM_EE * 3].reshape(F, NUM_EE, 3).transpose(1, 0, 2)
    force = m[:, 6 + NUM_EE * 3 :].reshape(F, NUM_EE, 3).transpose(1, 0, 2)
    return base_lin, base_ang, ee, force


def join_vars(base_lin, base_ang, ee, force):
    F = base_lin.shape[0]
    m = jnp.concatenate(
        [
            base_lin,
            base_ang,
            ee.transpose(1, 0, 2).reshape(F, -1),
            force.transpose(1, 0, 2).reshape(F, -1),
        ],
        axis=-1,
    )
    return m.reshape(-1)


def constraints(x, phys: PhysInput, contact=None) -> Dict[str, jnp.ndarray]:
    """All constraint values (equalities = 0, inequalities g ≤ 0).

    ``contact`` overrides phys.contact (stage 3 passes the SOFT schedule so
    everything becomes differentiable w.r.t. phase durations)."""
    F = phys.base_lin.shape[0]
    base_lin, base_ang, ee, force = split_vars(x, F)
    dt = phys.dt
    n = phys.floor_normal
    p0 = phys.floor_point
    c = phys.contact if contact is None else contact  # (4, F)
    fm = (
        jnp.ones((F,), base_lin.dtype)
        if phys.frame_mask is None
        else phys.frame_mask.astype(base_lin.dtype)
    )
    # finite-difference span gating: central diffs at frame f touch f±1
    fm3 = fm * jnp.concatenate([fm[1:], fm[-1:]]) * jnp.concatenate([fm[:1], fm[:-1]])
    pair = fm[:-1] * fm[1:]

    out: Dict[str, jnp.ndarray] = {}

    # dynamics (humanoid_dynamic_constraint.cpp; gravity dir = −floor normal)
    out["dyn"] = (
        srbd.dynamic_violation(
            base_lin, base_ang, ee, force, c, phys.inertia, phys.mass, -n, dt
        )
        * fm3[:, None]
    )

    # leg length (leg_length_constraint.cpp:38-60): ½‖ee − (R·hip + base)‖² ≤ ½L²
    R = srbd.rot_zyx(base_ang)  # (F, 3, 3)
    hips = jnp.stack(
        [phys.left_hip, phys.right_hip, phys.left_hip, phys.right_hip]
    )  # (4, F, 3) — heels share hip offsets (humanoid.h:45-48)
    hip_w = jnp.einsum("fij,efj->efi", R, hips) + base_lin[None]
    d2 = jnp.sum((ee - hip_w) ** 2, axis=-1)  # (4, F)
    lmax = jnp.stack(
        [phys.max_leg_length, phys.max_leg_length, phys.max_heel_length, phys.max_heel_length]
    )
    out["leg"] = (0.5 * d2 - 0.5 * (lmax[:, None] ** 2)) * fm[None, :]  # ≤ 0

    # heel↔toe distance equality (ee_dist_constraint.cpp:34-94), pairs (0,2),(1,3)
    hd2 = jnp.sum((ee[:2] - ee[2:]) ** 2, axis=-1)  # (2, F)
    out["heel"] = (0.5 * hd2 - 0.5 * phys.heel_dist ** 2) * fm[None, :]

    # on-terrain during contact (TOWR TerrainConstraint)
    height = jnp.einsum("efc,c->ef", ee - p0, n)  # (4, F)
    out["terrain"] = c * height * fm[None, :]

    # stance no-slip: consecutive contact frames share the EE position
    both = (c[:, :-1] * c[:, 1:] * pair[None, :])[..., None]  # (4, F-1, 1)
    out["slip"] = both * (ee[:, 1:] - ee[:, :-1])

    # friction cone + bounds on effective (masked) force
    f_eff = force * c[..., None]
    fn = jnp.einsum("efc,c->ef", f_eff, n)
    ft = f_eff - fn[..., None] * n
    ft2 = jnp.sum(ft * ft, axis=-1)
    out["force"] = jnp.stack(
        [-fn, fn - FORCE_LIMIT, ft2 - FRICTION ** 2 * fn ** 2], axis=-1
    ) * fm[None, :, None]  # (4, F, 3) all ≤ 0

    # above-floor clearance everywhere (height_constraint.cpp:23-58)
    out["height"] = -height * fm[None, :]  # ≤ 0

    return out


INEQ = {"leg": True, "heel": False, "terrain": False, "slip": False, "force": True,
        "height": True, "dyn": False}


def cost_residuals(x, phys: PhysInput, w: CostW, contact=None):
    F = phys.base_lin.shape[0]
    base_lin, base_ang, ee, force = split_vars(x, F)
    dt = phys.dt
    c = phys.contact if contact is None else contact
    F_ = base_lin.shape[0]
    fm = (
        jnp.ones((F_,), base_lin.dtype)
        if phys.frame_mask is None
        else phys.frame_mask.astype(base_lin.dtype)
    )
    pair = fm[:-1] * fm[1:]
    triple = pair[:-1] * fm[2:]

    parts = [
        np.sqrt(w.data_lin) * (base_lin - phys.base_lin) * fm[:, None],
        np.sqrt(w.data_ang) * (base_ang - phys.base_ang) * fm[:, None],
        np.sqrt(w.data_ee) * (ee - phys.ee_pos) * fm[None, :, None],
        np.sqrt(w.sv_lin) * (base_lin[1:] - base_lin[:-1]) * pair[:, None],
        np.sqrt(w.sv_ang) * (base_ang[1:] - base_ang[:-1]) * pair[:, None],
        np.sqrt(w.sv_ee) * (ee[:, 1:] - ee[:, :-1]) * pair[None, :, None],
        # keep swing-phase force variables pinned (they're masked out of the
        # dynamics, so nothing else constrains them); padded-frame force
        # variables are likewise pinned to zero
        1e-2 * (1.0 - c[..., None] * fm[None, :, None]) * force,
        1e-4 * c[..., None] * fm[None, :, None] * force,
    ]
    if w.sa > 0:
        parts += [
            np.sqrt(w.sa) * (base_lin[2:] - 2 * base_lin[1:-1] + base_lin[:-2]) * triple[:, None],
            np.sqrt(w.sa) * (base_ang[2:] - 2 * base_ang[1:-1] + base_ang[:-2]) * triple[:, None],
            np.sqrt(w.sa) * (ee[:, 2:] - 2 * ee[:, 1:-1] + ee[:, :-2]) * triple[None, :, None],
        ]

    # initial/final base pins: pos + 5-frame-averaged velocity
    # (phys_optim.cpp:442-489)
    k = min(5, F - 1)
    v0 = (phys.base_lin[1 : k + 1] - phys.base_lin[:k]).mean(axis=0) / dt
    vf = (phys.base_lin[F - k :] - phys.base_lin[F - k - 1 : -1]).mean(axis=0) / dt
    cur_v0 = (base_lin[1] - base_lin[0]) / dt
    cur_vf = (base_lin[-1] - base_lin[-2]) / dt
    pins = jnp.stack(
        [
            base_lin[0] - phys.base_lin[0],
            base_lin[-1] - phys.base_lin[-1],
            base_ang[0] - phys.base_ang[0],
            base_ang[-1] - phys.base_ang[-1],
            0.1 * (cur_v0 - v0),
            0.1 * (cur_vf - vf),
        ]
    )
    parts.append(np.sqrt(w.pin) * pins)
    return jnp.concatenate([p.reshape(-1) for p in parts])


import functools


@functools.lru_cache(maxsize=None)
def make_al_residual_fn(w: CostW, rho: Rho):
    """Residual function with (w, rho) baked in statically — cached so
    repeated solves with the same stage schedule reuse one jit compilation."""

    def al_residuals(x, phys, lams):
        r = [cost_residuals(x, phys, w)]
        cons = constraints(x, phys)
        for name, cval in sorted(cons.items()):
            rho_k = getattr(rho, name)
            if rho_k == 0.0:
                continue
            shifted = cval + lams[name] / rho_k
            if INEQ[name]:
                shifted = jnp.maximum(shifted, 0.0)
            r.append(np.sqrt(rho_k) * shifted.reshape(-1))
        return jnp.concatenate(r)

    return al_residuals


def init_multipliers(phys: PhysInput) -> Dict[str, jnp.ndarray]:
    cons = constraints(join_vars(phys.base_lin, phys.base_ang, phys.ee_pos,
                                 jnp.zeros_like(phys.ee_pos)), phys)
    return {k: jnp.zeros_like(v) for k, v in cons.items()}


@partial(jax.jit, static_argnames=("rho",))
def update_multipliers(x, phys, lams, rho: Rho, contact=None):
    cons = constraints(x, phys, contact=contact)
    new = {}
    for name, cval in cons.items():
        rho_k = getattr(rho, name)
        if rho_k == 0.0:
            new[name] = lams[name]
        elif INEQ[name]:
            new[name] = jnp.maximum(lams[name] + rho_k * cval, 0.0)
        else:
            new[name] = lams[name] + rho_k * cval
    return new


@functools.lru_cache(maxsize=None)
def make_stage3_residual_fn(w: CostW, rho: Rho, w_dur: float, F: int):
    """Stage-3 residuals over the augmented vector [trajectory | durations].

    The contact schedule becomes soft_contact(durations) so constraint
    residuals carry gradients into the phase durations (the reference's
    PhaseDurations variable sets + schedule Jacobians, phys_optim.cpp:
    663-711 / nodes_variables_dynamic_phase_based.cpp)."""
    from . import durations as dur_lib

    n_traj = F * DOF

    def residuals(x_aug, phys, lams, spec):
        x = x_aug[:n_traj]
        d = x_aug[n_traj:].reshape(spec.durations.shape)
        c_soft = dur_lib.soft_contact(d, spec, F, phys.dt)
        r = [cost_residuals(x, phys, w, contact=c_soft)]
        cons = constraints(x, phys, contact=c_soft)
        for name, cval in sorted(cons.items()):
            rho_k = getattr(rho, name)
            if rho_k == 0.0:
                continue
            shifted = cval + lams[name] / rho_k
            if INEQ[name]:
                shifted = jnp.maximum(shifted, 0.0)
            r.append(np.sqrt(rho_k) * shifted.reshape(-1))
        r.append(dur_lib.duration_residuals(d, spec, w_dur))
        return jnp.concatenate(r)

    return residuals


@dataclasses.dataclass(frozen=True)
class SolveConfig:
    al_iters_fit: int = 2
    al_iters_dyn: int = 3
    al_iters_height: int = 3
    al_iters_durations: int = 2
    optimize_durations: bool = True
    # 25:50 measured quality-IDENTICAL to the former 30:60 default on the
    # v5e fused solve (round-5 budget ladder, BASELINE.md: stage-2 DYN_H
    # cost 0.42 = 0.42, dyn violation 0.037 vs 0.039 N, 32/32 durations_ok)
    # at 0.72x the wall time; 20:40 costs +5%, 15:30 +21% — those stay
    # opt-in. (Reference budget analog: phys_optim.cpp:571-652.)
    lm: LMConfig = LMConfig(max_iters=25, cg_iters=50, init_lambda=1e-2)



def dyn_cost_for(weights, accel: float = 1e-4):
    """The DYN/DYN_H-stage cost weights derived from pipeline PhysWeights
    (run_phys_mocap.py:33-44 / phys_optim.cpp:27-31). ``accel=0.0`` is the
    stage-3/4 variant — no accel smoothing with duration optimization
    (vel_smooth_cost.cpp:72-79). Shared by solve_physics,
    solve_physics_durations, parallel.batch.stage3_problem and bench.py's
    FLOP accounting so they can never drift apart."""
    return CostW(
        weights.w_com_lin, weights.w_com_ang, weights.w_ee,
        0.001, 0.001, weights.w_smooth, accel, 1e3,
    )


def solve_physics(
    phys: PhysInput,
    weights: PhysWeights = PhysWeights(),
    cfg: SolveConfig = SolveConfig(),
) -> Tuple[PhysResult, PhysResult, Dict[str, float]]:
    """Run the staged solve. Returns (no_dynamics result, dynamics result,
    final constraint-violation stats) — mirroring the reference's
    sol_out_no_dynamics / sol_out_dynamics artifacts. When
    cfg.optimize_durations is on, use solve_physics_durations afterwards for
    the stage-3 refinement."""
    F = int(phys.base_lin.shape[0])
    dyn_cost = dyn_cost_for(weights)

    x = join_vars(phys.base_lin, phys.base_ang, phys.ee_pos, jnp.zeros_like(phys.ee_pos))
    masks = frame_coloring_masks(F, DOF, dtype=x.dtype)
    lams = init_multipliers(phys)

    def run_stage(x, lams, w, rho, iters):
        fn = make_al_residual_fn(w, rho)
        for _ in range(iters):
            x, _ = lm_solve(fn, x, (phys, lams), cfg.lm, diag_masks=masks)
            lams = update_multipliers(x, phys, lams, rho)
        return x, lams

    # FIT (stages 1.1 + 1.2)
    x, lams = run_stage(x, lams, FIT_COST, FIT_RHO, cfg.al_iters_fit)
    res_fit = _to_result(x, phys)

    # DYNAMICS (2.1)
    x, lams = run_stage(x, lams, dyn_cost, DYN_RHO, cfg.al_iters_dyn)
    # HEIGHT (2.2)
    x, lams = run_stage(x, lams, dyn_cost, DYN_H_RHO, cfg.al_iters_height)
    res_dyn = _to_result(x, phys)

    stats = violation_stats(x, phys)
    return res_fit, res_dyn, stats


def violation_stats(x, phys, contact=None) -> Dict[str, float]:
    cons = constraints(x, phys, contact=contact)
    return {
        name: float(jnp.abs(v).max()) if not INEQ[name] else float(jnp.maximum(v, 0).max())
        for name, v in cons.items()
    }


def violation_stats_arrays(x, phys, contact=None) -> Dict[str, jnp.ndarray]:
    """Pure-jnp violation_stats (scalar arrays) — vmappable over a batch."""
    cons = constraints(x, phys, contact=contact)
    return {
        name: jnp.abs(v).max() if not INEQ[name] else jnp.maximum(v, 0).max()
        for name, v in cons.items()
    }


def _dyn_tol_floor(mass) -> jnp.ndarray:
    """Absolute dynamics-violation tolerance floor, scaled to body weight.

    1 N per 73 kg reference body (≈1.4e-3·m·g): a fixed 1.0 N floor would
    over-bless light characters (ty is 31 kg)."""
    return jnp.asarray(mass) * 9.81 / (73.0 * 9.81)


def solve_physics_durations(
    phys: PhysInput,
    stage2: PhysResult,
    weights: PhysWeights = PhysWeights(),
    cfg: SolveConfig = SolveConfig(),
) -> Tuple[PhysResult, Dict[str, float], bool]:
    """Stage 3: refine contact-phase durations (phys_optim.cpp:663-711).

    Warm-starts from the stage-2 solution. Returns (result with the
    re-rasterized schedule, stats, durations_ok). On failure to improve, the
    caller should keep the stage-2 result (the reference's stage-4 fallback
    :713-749)."""
    from . import durations as dur_lib

    x = join_vars(stage2.base_lin, stage2.base_ang, stage2.ee_pos, stage2.ee_force)
    lams = init_multipliers(phys)
    F = int(phys.base_lin.shape[0])
    spec = dur_lib.build_duration_spec(np.asarray(phys.contact), float(phys.dt))
    P = spec.durations.shape[1]
    dof_d = 4 * P

    dyn_cost = dyn_cost_for(weights, accel=0.0)
    fn = make_stage3_residual_fn(dyn_cost, DYN_H_RHO, weights.w_dur, F)

    traj_masks = frame_coloring_masks(F, DOF, dtype=x.dtype)
    n_traj = F * DOF
    masks_aug = jnp.concatenate(
        [
            jnp.concatenate([traj_masks, jnp.zeros((traj_masks.shape[0], dof_d), x.dtype)], axis=1),
            jnp.concatenate([jnp.zeros((dof_d, n_traj), x.dtype), jnp.eye(dof_d, dtype=x.dtype)], axis=1),
        ],
        axis=0,
    )

    x_aug = jnp.concatenate([x, spec.durations.reshape(-1)])
    for _ in range(cfg.al_iters_durations):
        x_aug, _ = lm_solve(fn, x_aug, (phys, lams, spec), cfg.lm, diag_masks=masks_aug)
        d = x_aug[n_traj:].reshape(spec.durations.shape)
        c_soft = dur_lib.soft_contact(d, spec, F, phys.dt)
        lams = update_multipliers(x_aug[:n_traj], phys, lams, DYN_H_RHO, contact=c_soft)

    x_new = x_aug[:n_traj]
    d = x_aug[n_traj:].reshape(spec.durations.shape)
    new_contact = dur_lib.rasterize(d, spec, F, phys.dt)
    phys_new = phys._replace(contact=new_contact)

    # STAGE 4: re-solve dynamics with the refined durations FROZEN
    # (phys_optim.cpp:713-749) — the soft-mask optimum needs polishing under
    # the re-rasterized hard schedule
    lams4 = init_multipliers(phys_new)
    fn4 = make_al_residual_fn(dyn_cost, DYN_H_RHO)
    for _ in range(max(cfg.al_iters_height, 1)):
        x_new, _ = lm_solve(fn4, x_new, (phys_new, lams4), cfg.lm, diag_masks=traj_masks)
        lams4 = update_multipliers(x_new, phys_new, lams4, DYN_H_RHO)

    stats = violation_stats(x_new, phys_new)
    # success criterion ≈ IPOPT status: constraint violations comparable to
    # the stage-2 solve (absolute floors scale with body weight — a fixed
    # 1 N floor would bless bad solves on light characters)
    old_stats = violation_stats(x, phys)
    dyn_floor = float(_dyn_tol_floor(phys.mass))
    ok = stats["dyn"] <= max(2.0 * old_stats["dyn"], dyn_floor) and stats[
        "terrain"
    ] <= max(2.0 * old_stats["terrain"], 0.02)
    res = _to_result(x_new, phys_new)
    return res, stats, bool(ok)


def _to_result(x, phys: PhysInput) -> PhysResult:
    F = phys.base_lin.shape[0]
    base_lin, base_ang, ee, force = split_vars(x, F)
    return PhysResult(
        dt=phys.dt,
        base_lin=base_lin,
        base_ang=base_ang,
        ee_pos=ee,
        ee_force=force * phys.contact[..., None],
        contact=phys.contact,
    )
