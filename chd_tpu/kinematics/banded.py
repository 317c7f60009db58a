"""Exact block-banded normal-equation solve for frame-structured NLS.

The trajectory objective couples frames only through velocity/acceleration
differences (reference residual fun_anim_for_projection,
src/optimize/optimize_trajectory.py:324-483), so JᵀJ is block-pentadiagonal
along the frame axis: block (f, f') vanishes for |f − f'| > bandwidth (= 2,
the acceleration stencil). Instead of iterating CG against matrix-free
JᵀJ·v products, we

1. extract the exact banded blocks with `2·bandwidth+1` frame colorings —
   for a tangent active at one dof of every 5th frame, each output row of
   JᵀJ·v receives a contribution from exactly one colored frame, so one
   vmapped batch of `dofs_per_frame × 5` products recovers every block
   (a strict superset of the diagonal-only coloring in lm.py); then
2. fold frame pairs into 2×2 superblocks, turning the pentadiagonal system
   into a block-TRIdiagonal one, and run the classic SPD block-Thomas
   recurrence (Cholesky per superblock) as a `lax.scan` — ~F/2 tiny batched
   factorizations instead of ~100 sequential full JVP+VJP graphs per LM
   iteration.

Everything is fixed-shape and vmappable over sequences.
"""
from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import cho_solve


def coloring_masks(
    num_frames: int, dofs_per_frame: int, bandwidth: int = 2, dtype=jnp.float32
):
    """(dofs_per_frame·(2·bandwidth+1), F·D) tangent masks.

    Stride 2·bandwidth+1 guarantees each JᵀJ row window (±bandwidth frames)
    contains at most one colored frame, so products recover exact block
    columns (the diagonal-only masks in lm.frame_coloring_masks use stride
    bandwidth+1, which is enough for the diagonal but not for off-bands).
    """
    stride = 2 * bandwidth + 1
    n = num_frames * dofs_per_frame
    masks = np.zeros((dofs_per_frame * stride, n), dtype=np.float32)
    for d in range(dofs_per_frame):
        for c in range(stride):
            frames = np.arange(c, num_frames, stride)
            masks[d * stride + c, frames * dofs_per_frame + d] = 1.0
    return jnp.asarray(masks, dtype)


def banded_jtj(
    jtjv: Callable,
    masks,
    num_frames: int,
    dofs_per_frame: int,
    bandwidth: int = 2,
) -> List[jnp.ndarray]:
    """Extract the lower block bands of A = JᵀJ from matrix-free products.

    Returns blocks[k] of shape (F, D, D) with blocks[k][f] = A[f+k, f]
    (rows f+k, cols f; the last k entries are zero). blocks[0] is the
    symmetric diagonal band.
    """
    stride = 2 * bandwidth + 1
    F, D = num_frames, dofs_per_frame
    P = jax.vmap(jtjv)(masks).reshape(D, stride, F, D)  # [d, c, f_row, d_row]
    f_idx = np.arange(F)
    blocks = []
    for k in range(bandwidth + 1):
        parts = []
        for c in range(stride):
            sel = jnp.asarray((f_idx[: F - k] % stride) == c)
            # rows f+k of the color-c product, transposed to (f, d_row, d_col)
            src = P[:, c, k:, :].transpose(1, 2, 0)
            parts.append(jnp.where(sel[:, None, None], src, 0.0))
        Uk = sum(parts)
        if k:
            Uk = jnp.concatenate([Uk, jnp.zeros((k, D, D), P.dtype)], axis=0)
        blocks.append(Uk)
    return blocks


def block_penta_solve(diag, lo1, lo2, b):
    """Solve A x = b, A SPD block-pentadiagonal (one sequence).

    diag: (F, D, D) A[f, f]; lo1: (F, D, D) with lo1[f] = A[f+1, f] (last
    entry ignored); lo2: (F, D, D) with lo2[f] = A[f+2, f] (last two
    ignored); b: (F, D). Returns x: (F, D).

    Frames are folded pairwise into 2D×2D superblocks so the system is
    block-tridiagonal; solved by the SPD block-Thomas recurrence
    (forward Cholesky elimination scan + backward substitution scan).
    """
    F, D = b.shape
    dtype = b.dtype
    G = (F + 1) // 2
    pad = 2 * G - F
    if pad:
        eye = jnp.broadcast_to(jnp.eye(D, dtype=dtype), (pad, D, D))
        diag = jnp.concatenate([diag, eye], axis=0)
        zfill = jnp.zeros((pad, D, D), dtype)
        lo1 = jnp.concatenate([lo1, zfill], axis=0)
        lo2 = jnp.concatenate([lo2, zfill], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, D), dtype)], axis=0)
    # ensure out-of-range couplings into the padded frame are dead
    if pad:
        lo1 = lo1.at[F - 1].set(0.0)
        lo2 = lo2.at[F - 2 :].set(0.0)

    d0, d1 = diag[0::2], diag[1::2]      # (G, D, D)
    u1 = jnp.swapaxes(lo1[0::2], -1, -2)  # A[2g, 2g+1]
    S = jnp.concatenate(
        [
            jnp.concatenate([d0, u1], axis=-1),
            jnp.concatenate([jnp.swapaxes(u1, -1, -2), d1], axis=-1),
        ],
        axis=-2,
    )  # (G, 2D, 2D)

    # E[g] = A[2g+2:2g+4, 2g:2g+2] for g = 0..G-2; E[G-1] unused (zero)
    e00 = lo2[0::2]          # A[2g+2, 2g]
    e01 = lo1[1::2]          # A[2g+2, 2g+1]
    e11 = lo2[1::2]          # A[2g+3, 2g+1]
    z = jnp.zeros_like(e00)
    E = jnp.concatenate(
        [
            jnp.concatenate([e00, e01], axis=-1),
            jnp.concatenate([z, e11], axis=-1),
        ],
        axis=-2,
    )
    E = E.at[-1].set(0.0)
    bs = b.reshape(G, 2 * D)

    # E_prev[g] = E[g-1] (sub-diagonal block feeding superblock g)
    E_prev = jnp.concatenate([jnp.zeros_like(E[:1]), E[:-1]], axis=0)

    two_d = 2 * D
    eye2 = jnp.eye(two_d, dtype=dtype)

    def fwd(carry, inp):
        L_prev, y_prev = carry
        Sg, Eg_prev, bg = inp
        W = cho_solve((L_prev, True), jnp.swapaxes(Eg_prev, -1, -2))
        C = Sg - Eg_prev @ W
        L = jnp.linalg.cholesky(C)
        y = cho_solve((L, True), bg - Eg_prev @ y_prev)
        return (L, y), (L, y)

    init = (eye2, jnp.zeros((two_d,), dtype))
    _, (Ls, ys) = jax.lax.scan(fwd, init, (S, E_prev, bs))

    def bwd(x_next, inp):
        Lg, Eg, yg = inp
        x = yg - cho_solve((Lg, True), jnp.swapaxes(Eg, -1, -2) @ x_next)
        return x, x

    _, xs = jax.lax.scan(
        bwd, jnp.zeros((two_d,), dtype), (Ls, E, ys), reverse=True
    )
    return xs.reshape(2 * G, D)[:F]
