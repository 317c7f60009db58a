"""Fused contact-MLP inference kernel (Pallas/TPU).

The contact model is the pipeline's only NN (SURVEY §2.2): five small
matmuls whose BN can be folded into the weights for eval
(models/contact_mlp.fold_batchnorm). All weights together are ~3.8 MB —
they fit in VMEM with room to spare — so the whole network runs as ONE
kernel per batch tile: weights stay resident on-chip, activations never
round-trip to HBM between layers, and each layer is a single MXU dot.

The grid tiles the window/batch axis; weights are broadcast to every tile
(constant index map). Works on any batch size via ceil-div + masked writes.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 256


def _kernel(x_ref, w0, b0, w1, b1, w2, b2, w3, b3, w4, b4, out_ref):
    h = jnp.dot(x_ref[:], w0[:], preferred_element_type=jnp.float32) + b0[:]
    h = jnp.maximum(h, 0.0)
    h = jnp.dot(h, w1[:], preferred_element_type=jnp.float32) + b1[:]
    h = jnp.maximum(h, 0.0)
    h = jnp.dot(h, w2[:], preferred_element_type=jnp.float32) + b2[:]
    h = jnp.maximum(h, 0.0)
    h = jnp.dot(h, w3[:], preferred_element_type=jnp.float32) + b3[:]
    h = jnp.maximum(h, 0.0)
    out_ref[:] = jnp.dot(h, w4[:], preferred_element_type=jnp.float32) + b4[:]


@functools.partial(jax.jit, static_argnames=("pred_size", "interpret"))
def fused_mlp(folded: Dict, x, pred_size: int, interpret: bool = False):
    """Eval-mode forward through BN-folded weights as one Pallas kernel.

    folded: {'w': [5 × (out, in)], 'b': [5 × (out,)]} from fold_batchnorm;
    x: (B, ...) flattened to (B, in_dim). Returns (B, pred_size, 4) logits.
    Set interpret=True off-TPU (tests run the interpreter on CPU).
    """
    B = x.shape[0]
    x2 = x.reshape(B, -1).astype(jnp.float32)
    in_dim = x2.shape[1]
    out_dim = folded["w"][-1].shape[0]

    # weights → (in, out) layout; biases → (1, out) for clean VMEM tiles
    ws = [jnp.asarray(w, jnp.float32).T for w in folded["w"]]
    bs = [jnp.asarray(b, jnp.float32)[None, :] for b in folded["b"]]

    # pad batch to a tile multiple
    Bp = ((B + TILE_B - 1) // TILE_B) * TILE_B
    if Bp != B:
        x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))

    grid = (Bp // TILE_B,)
    const = lambda i: (0, 0)  # weights: same block for every tile

    operands = []
    in_specs = [pl.BlockSpec((TILE_B, in_dim), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    for w, b in zip(ws, bs):
        operands += [w, b]
        in_specs += [
            pl.BlockSpec(w.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, const, memory_space=pltpu.VMEM),
        ]

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE_B, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, out_dim), jnp.float32),
        interpret=interpret,
    )(x2, *operands)

    return out[:B].reshape(B, pred_size, 4)
