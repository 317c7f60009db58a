"""The foot-contact MLP as pure-JAX init/apply functions.

Architecture parity with the reference OpenPoseModel
(src/contact_learning/models/openpose_only.py:29-44): flattened
``window*joints*feat`` input → Linear(1024) → BN → ReLU → Linear(512) → BN →
ReLU → Linear(128) → BN → ReLU → Dropout(0.3) → Linear(32) → BN → ReLU →
Linear(4*pred_size); Xavier-uniform weight init with bias 0.01 (:48-51);
per-(frame,label) binary-cross-entropy-with-logits loss (:62-73).

TPU notes: parameters are a flat pytree (works with optax/pjit directly);
BatchNorm carries torch-compatible running statistics so converted
checkpoints evaluate bit-for-bit; the eval path can fold BN into the linear
weights (``fold_batchnorm``) giving a pure 5-matmul chain that XLA maps
straight onto the MXU — that folded form is what the inference pipeline and
the Pallas fused kernel (chd_tpu.ops.pallas_mlp) consume.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

HIDDEN = (1024, 512, 128, 32)
DROPOUT_LAYER = 3          # dropout applied to the 128-d activations
DROPOUT_RATE = 0.3
BN_MOMENTUM = 0.1          # torch BatchNorm1d default
BN_EPS = 1e-5


class ModelConfig(NamedTuple):
    window_size: int = 9
    num_joints: int = 13
    pred_size: int = 5
    feat_size: int = 3  # (x, y, confidence)

    @property
    def in_dim(self) -> int:
        return self.window_size * self.num_joints * self.feat_size

    @property
    def out_dim(self) -> int:
        return 4 * self.pred_size


def _xavier_uniform(key, shape, dtype):
    fan_out, fan_in = shape
    a = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def init(key, cfg: ModelConfig, dtype=jnp.float32) -> Tuple[Dict, Dict]:
    """Returns (params, state). Weights stored torch-style (out, in)."""
    dims = [cfg.in_dim, *HIDDEN, cfg.out_dim]
    params, state = {}, {}
    keys = jax.random.split(key, len(dims) - 1)
    for i in range(len(dims) - 1):
        params[f"linear{i}"] = {
            "w": _xavier_uniform(keys[i], (dims[i + 1], dims[i]), dtype),
            "b": jnp.full((dims[i + 1],), 0.01, dtype),
        }
        if i < len(HIDDEN):  # BN after every hidden linear
            params[f"bn{i}"] = {
                "scale": jnp.ones((dims[i + 1],), dtype),
                "bias": jnp.zeros((dims[i + 1],), dtype),
            }
            state[f"bn{i}"] = {
                "mean": jnp.zeros((dims[i + 1],), dtype),
                "var": jnp.ones((dims[i + 1],), dtype),
            }
    return params, state


def apply(
    params: Dict,
    state: Dict,
    x,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Dict]:
    """Forward pass.

    x: (B, W, J, F) or (B, in_dim). Returns (logits (B, pred, 4) as
    (B, P*4)-reshaped later by caller, new_state).
    """
    B = x.shape[0]
    h = x.reshape(B, -1)
    new_state = dict(state)
    n_hidden = len(HIDDEN)
    for i in range(n_hidden + 1):
        lin = params[f"linear{i}"]
        if train and i == n_hidden - 1 and dropout_rng is not None:
            keep = 1.0 - DROPOUT_RATE
            mask = jax.random.bernoulli(dropout_rng, keep, h.shape)
            h = jnp.where(mask, h / keep, 0.0)
        h = h @ lin["w"].T + lin["b"]
        if i < n_hidden:
            bn = params[f"bn{i}"]
            if train:
                mean = h.mean(axis=0)
                var = h.var(axis=0)  # biased, used for normalization (torch)
                n = h.shape[0]
                unbiased = var * n / max(n - 1, 1)
                new_state[f"bn{i}"] = {
                    "mean": (1 - BN_MOMENTUM) * state[f"bn{i}"]["mean"] + BN_MOMENTUM * mean,
                    "var": (1 - BN_MOMENTUM) * state[f"bn{i}"]["var"] + BN_MOMENTUM * unbiased,
                }
            else:
                mean = state[f"bn{i}"]["mean"]
                var = state[f"bn{i}"]["var"]
            h = (h - mean) * jax.lax.rsqrt(var + BN_EPS) * bn["scale"] + bn["bias"]
            h = jax.nn.relu(h)
    return h, new_state


def predict_logits(params, state, x, pred_size: int):
    """Eval-mode logits reshaped to (B, pred_size, 4) (reference forward:53-60)."""
    out, _ = apply(params, state, x, train=False)
    return out.reshape(out.shape[0], pred_size, 4)


def bce_with_logits(logits, labels):
    """Per-element binary cross-entropy with logits (reference loss:62-73,
    torch BCEWithLogitsLoss(reduction='none')). Shapes (B, P, 4)."""
    z = logits
    return jnp.maximum(z, 0.0) - z * labels + jnp.log1p(jnp.exp(-jnp.abs(z)))


def fold_batchnorm(params: Dict, state: Dict) -> Dict:
    """Fold eval-mode BN into the preceding linear layers.

    y = ((xW^T + b) - μ)/σ·γ + β  ≡  x(W')^T + b' with W' = (γ/σ)·W,
    b' = (b - μ)·γ/σ + β. Output: {'w': [...], 'b': [...]} lists of 5 folded
    layers — a pure matmul chain for the fast inference path.
    """
    ws, bs = [], []
    n_hidden = len(HIDDEN)
    for i in range(n_hidden + 1):
        w = params[f"linear{i}"]["w"]
        b = params[f"linear{i}"]["b"]
        if i < n_hidden:
            g = params[f"bn{i}"]["scale"]
            beta = params[f"bn{i}"]["bias"]
            mu = state[f"bn{i}"]["mean"]
            sig = jnp.sqrt(state[f"bn{i}"]["var"] + BN_EPS)
            scale = g / sig
            w = w * scale[:, None]
            b = (b - mu) * scale + beta
        ws.append(w)
        bs.append(b)
    return {"w": ws, "b": bs}


def apply_folded(folded: Dict, x, pred_size: int, precision="high"):
    """Eval forward through BN-folded weights: 5 matmuls + ReLUs.

    ``precision`` pins the TPU matmul algorithm (default "high" = 3-pass
    bfloat16, ~7e-5 max error vs f64 on v5e). The backend's DEFAULT dot can
    silently drop to single-pass bf16 depending on how the surrounding graph
    fuses (measured: the same 5-matmul chain drifted 1.4e-4 vs torch inside
    one graph and 1.2e-2 inside another) — parity must not depend on the
    lowering mood, so the contact path always requests "high" explicitly.
    On CPU the parameter is a no-op (always full f32).
    """
    B = x.shape[0]
    h = x.reshape(B, -1)
    h = jnp.dot(h, folded["w"][0].T, precision=precision) + folded["b"][0]
    if len(folded["w"]) > 1:
        h = jax.nn.relu(h)
    return apply_folded_tail(folded, h, pred_size, precision=precision)


def apply_folded_tail(folded: Dict, h, pred_size: int, precision="high"):
    """Layers 1..n of the folded chain on precomputed first-layer
    activations ``h`` (B, hidden0) — used by the conv-fused inference path
    (ops.windows.layer1_conv_kernel), which computes layer 0 as a temporal
    convolution over raw frames."""
    n = len(folded["w"])
    for i in range(1, n):
        h = jnp.dot(h, folded["w"][i].T, precision=precision) + folded["b"][i]
        if i < n - 1:
            h = jax.nn.relu(h)
    return h.reshape(h.shape[0], pred_size, 4)
