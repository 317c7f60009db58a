"""Matrix-free Levenberg–Marquardt for large nonlinear least squares.

The reference solves its trajectory NLS with scipy ``least_squares`` (trf +
lsmr, hand-built sparse Jacobians — src/optimize/optimize_trajectory.py:
659-670). That shape (host sparse assembly, dynamic trust region) doesn't
map to XLA; instead we run LM with a Jacobi-preconditioned matrix-free
conjugate-gradient inner solve: every CG iteration is one JVP + one VJP
through the residual function (autodiff replaces the ~300-line hand-written
Jacobian chain at optimize_trajectory.py:51-322). Everything is
fixed-iteration ``lax`` control flow — one compiled graph, vmappable over
sequences.

Marquardt scaling needs diag(JᵀJ). For trajectory-style problems the
Jacobian is block-banded along the frame axis (every residual row touches at
most ``bandwidth+1`` consecutive frames), so an exact diagonal falls out of
a graph coloring: for a tangent vector active at one dof of every
(bandwidth+1)-spaced frame, the cross terms of (JᵀJ v) ⊙ v vanish — a row
can't touch two same-color frames. That's ``dofs_per_frame × (bandwidth+1)``
batched JᵀJ·v products (one vmapped pass on the MXU) instead of n JVPs.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LMConfig:
    max_iters: int = 50
    cg_iters: int = 50
    init_lambda: float = 1e-3
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    min_lambda: float = 1e-12
    max_lambda: float = 1e10
    diag_floor: float = 1e-8


def frame_coloring_masks(
    num_frames: int, dofs_per_frame: int, bandwidth: int = 2, dtype=jnp.float32
):
    """(dofs_per_frame·(bandwidth+1), n) tangent masks for exact diag(JᵀJ).

    bandwidth = max |f−f'| such that some residual couples frames f and f'
    (2 for the trajectory objective: the acceleration term spans 3 frames).
    """
    C = bandwidth + 1
    n = num_frames * dofs_per_frame
    masks = np.zeros((dofs_per_frame * C, n), dtype=np.float32)
    for d in range(dofs_per_frame):
        for c in range(C):
            frames = np.arange(c, num_frames, C)
            masks[d * C + c, frames * dofs_per_frame + d] = 1.0
    return jnp.asarray(masks, dtype)


def _pcg(matvec: Callable, b, inv_diag, iters: int):
    """Fixed-iteration preconditioned CG (Jacobi preconditioner)."""

    def body(_, state):
        x, r, z, p, rz = state
        Ap = matvec(p)
        denom = jnp.vdot(p, Ap)
        alpha = jnp.where(denom > 0, rz / jnp.maximum(denom, 1e-30), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_diag * r
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, z, p, rz_new

    x0 = jnp.zeros_like(b)
    z0 = inv_diag * b
    state = (x0, b, z0, z0, jnp.vdot(b, z0))
    x, *_ = jax.lax.fori_loop(0, iters, body, state)
    return x


@partial(jax.jit, static_argnames=("residual_fn", "cfg", "banded_spec"))
def lm_solve(
    residual_fn: Callable,
    x0,
    args=(),
    cfg: LMConfig = LMConfig(),
    diag_masks: Optional[jnp.ndarray] = None,
    banded_spec: Optional[tuple] = None,
):
    """Minimize ½‖residual_fn(x, *args)‖² from x0. Returns (x, final_cost).

    ``args`` is a traced pytree (problem data stays an input, not a baked
    constant, so one compilation serves every sequence of the same shape).
    ``diag_masks`` (from ``frame_coloring_masks``) turns on exact Marquardt
    scaling + Jacobi preconditioning; without it, damping is λI.

    ``banded_spec=(num_frames, dofs_per_frame)`` switches the inner solve
    from matrix-free PCG to the exact block-pentadiagonal factorization
    (kinematics/banded.py): the full banded JᵀJ is extracted by frame
    coloring and solved directly — one block-Thomas scan instead of
    ``cg_iters`` sequential JVP+VJP passes per LM iteration. Requires the
    residual to couple frames no further than ``bandwidth`` (=2) apart and
    variables laid out frame-major. ``diag_masks`` is ignored.
    """
    if banded_spec is not None:
        from . import banded as banded_lib

        bF, bD = banded_spec
        banded_masks = banded_lib.coloring_masks(bF, bD, 2, x0.dtype)

    def res(x):
        return residual_fn(x, *args)

    def cost(x):
        r = res(x)
        return 0.5 * jnp.vdot(r, r)

    def step(state, _):
        x, lam, c = state

        # Linearize ONCE per LM step: the Gauss–Newton matvec JᵀJ·v runs
        # cg_iters times at a FIXED linearization point, so jax.linearize +
        # jax.linear_transpose make each CG iteration one tangent pass + one
        # transpose pass. The previous jax.jvp-per-matvec formulation
        # re-evaluated the primal forward inside every CG iteration (XLA does
        # not reliably hoist the loop-invariant primal chain out of the fori
        # body) — measured ~1.4x on the staged physics solve (v5e-1,
        # BASELINE.md round 5).
        r, jvp_lin = jax.linearize(res, x)
        vjp_lin = jax.linear_transpose(jvp_lin, x)
        g = vjp_lin(r)[0]

        def jtjv(v):
            return vjp_lin(jvp_lin(v))[0]

        if banded_spec is not None:
            U0, L1, L2 = banded_lib.banded_jtj(jtjv, banded_masks, bF, bD, 2)
            diagv = jnp.diagonal(U0, axis1=-2, axis2=-1)  # (F, D)
            scale_f = jnp.maximum(diagv, cfg.diag_floor)
            A0 = U0 + lam * jax.vmap(jnp.diag)(scale_f)
            delta = banded_lib.block_penta_solve(
                A0, L1, L2, (-g).reshape(bF, bD)
            ).reshape(-1)
            x_new = x + delta
            c_new = cost(x_new)
            accept = c_new < c
            x = jnp.where(accept, x_new, x)
            c = jnp.where(accept, c_new, c)
            lam = jnp.clip(
                jnp.where(accept, lam * cfg.lambda_down, lam * cfg.lambda_up),
                cfg.min_lambda,
                cfg.max_lambda,
            )
            return (x, lam, c), c

        if diag_masks is not None:
            diag = jnp.sum(jax.vmap(lambda m: m * jtjv(m))(diag_masks), axis=0)
            scale = jnp.maximum(diag, cfg.diag_floor)
        else:
            scale = jnp.ones_like(x)

        def matvec(v):
            return jtjv(v) + lam * scale * v

        inv_diag = 1.0 / (scale * (1.0 + lam)) if diag_masks is not None else jnp.ones_like(x)
        delta = _pcg(matvec, -g, inv_diag, cfg.cg_iters)
        x_new = x + delta
        c_new = cost(x_new)
        accept = c_new < c
        x = jnp.where(accept, x_new, x)
        c = jnp.where(accept, c_new, c)
        lam = jnp.clip(
            jnp.where(accept, lam * cfg.lambda_down, lam * cfg.lambda_up),
            cfg.min_lambda,
            cfg.max_lambda,
        )
        return (x, lam, c), c

    init = (x0, jnp.asarray(cfg.init_lambda, x0.dtype), cost(x0))
    (x, _, c), _ = jax.lax.scan(step, init, None, length=cfg.max_iters)
    return x, c
