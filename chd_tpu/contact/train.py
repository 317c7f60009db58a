"""Contact-model training.

Replaces the reference trainer (src/contact_learning/train.py:45-185):
Adam (lr 1e-4, torch-style L2 weight decay 1e-4), batch 64, 5000 epochs,
mean BCE-with-logits loss, validation every 20 epochs with checkpointing
(latest / BEST-on-F1 / FINAL — reference :167-179; BEST uses the middle
target frame's F1).

TPU design: the whole (small) dataset lives on device; each epoch samples
one random window per training sequence on device (matching the reference's
per-epoch sampling), and the jit'd train step fuses featurization + forward +
backward + Adam. Data parallelism = sharding the batch axis of the same jit
function over a mesh (chd_tpu.parallel); BN statistics are global batch
reductions, which XLA turns into psums across data shards (sync-BN).
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..characters.defs import OP_JOINT_SUBSETS
from ..models import contact_mlp, torch_convert
from ..utils import metrics as metrics_lib
from . import data as data_lib


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    window_size: int = 9
    pred_size: int = 5
    batch_size: int = 64
    epochs: int = 5000
    val_every: int = 20
    classify_thresh: float = 0.5
    joint_set: str = "lower"
    use_confidence: bool = True
    lr: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 1e-4
    noise_dev: float = 0.005
    seed: int = 0


def make_optimizer(cfg: TrainConfig):
    """torch Adam with L2 weight decay = decay added to grads BEFORE the
    Adam moment updates (train.py:82-83)."""
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps),
    )


def loss_and_logits(params, state, feats, labels, dropout_rng, pred_size):
    out, new_state = contact_mlp.apply(params, state, feats, train=True, dropout_rng=dropout_rng)
    logits = out.reshape(out.shape[0], pred_size, 4)
    loss = contact_mlp.bce_with_logits(logits, labels).mean()
    return loss, (new_state, logits)


def _train_step_impl(params, state, opt_state, batch_op, batch_contacts, rng,
                     cfg: TrainConfig, tx):
    k_win, k_drop = jax.random.split(rng)
    feats, labels = data_lib.sample_train_windows(
        k_win, batch_op, batch_contacts, cfg.window_size, cfg.pred_size,
        tuple(OP_JOINT_SUBSETS[cfg.joint_set]), cfg.noise_dev, cfg.use_confidence,
    )
    (loss, (new_state, logits)), grads = jax.value_and_grad(
        loss_and_logits, has_aux=True
    )(params, state, feats, labels, k_drop, cfg.pred_size)
    updates, new_opt_state = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    mid = cfg.pred_size // 2
    pred = jax.nn.sigmoid(logits[:, mid]) > cfg.classify_thresh
    conf = metrics_lib.confusion_counts(pred, labels[:, mid] > 0.5)
    return new_params, new_state, new_opt_state, loss, conf


@functools.partial(jax.jit, static_argnames=("cfg", "tx"))
def train_step(params, state, opt_state, batch_op, batch_contacts, rng, *, cfg: TrainConfig, tx):
    """One optimizer step over a batch of SEQUENCES (windows sampled inside)."""
    return _train_step_impl(params, state, opt_state, batch_op, batch_contacts,
                            rng, cfg, tx)


@functools.partial(jax.jit, static_argnames=("cfg", "tx"))
def train_epoch(params, state, opt_state, train_op, train_ct, batch_idx, rng,
                *, cfg: TrainConfig, tx):
    """All full batches of an epoch inside ONE compiled lax.scan.

    One device dispatch per epoch instead of one per batch: with a model
    this small (≈0.9 MB of params) the per-step path is dominated by host
    dispatch latency, which an interactive tunnel (or a remote coordinator)
    multiplies. batch_idx is (n_batches, B) permuted sequence indices.
    Returns per-batch losses (n_batches,) and summed Confusion.
    """
    keys = jax.random.split(rng, batch_idx.shape[0])

    def step(carry, xs):
        p, s, o = carry
        idx, k = xs
        op = jnp.take(train_op, idx, axis=0)
        ct = jnp.take(train_ct, idx, axis=0)
        p, s, o, loss, conf = _train_step_impl(p, s, o, op, ct, k, cfg, tx)
        return (p, s, o), (loss, jnp.stack(conf))

    (params, state, opt_state), (losses, confs) = jax.lax.scan(
        step, (params, state, opt_state), (batch_idx, keys)
    )
    conf_sum = metrics_lib.Confusion(*confs.sum(axis=0))
    return params, state, opt_state, losses, conf_sum


@functools.partial(jax.jit, static_argnames=("cfg", "overlap"))
def eval_step(params, state, op_data, contacts, *, cfg: TrainConfig, overlap: bool = False):
    """Window-level evaluation over a split (utils.val_epoch equivalent).

    Returns mean loss and per-target-frame confusion counts (P, 4)."""
    feats, labels = data_lib.eval_windows(
        op_data, contacts, cfg.window_size, cfg.pred_size,
        tuple(OP_JOINT_SUBSETS[cfg.joint_set]), overlap, cfg.use_confidence,
    )
    logits = contact_mlp.predict_logits(params, state, feats, cfg.pred_size)
    loss = contact_mlp.bce_with_logits(logits, labels).mean()
    pred = jax.nn.sigmoid(logits) > cfg.classify_thresh
    confs = []
    for p in range(cfg.pred_size):
        c = metrics_lib.confusion_counts(pred[:, p], labels[:, p] > 0.5)
        confs.append(jnp.stack(c))
    return loss, jnp.stack(confs)  # (P, 4)


def train(
    dataset: data_lib.ContactDataset,
    cfg: TrainConfig = TrainConfig(),
    out_dir: Optional[str] = None,
    log_every: int = 5,
    verbose: bool = True,
) -> Tuple[Dict, Dict, Dict]:
    """Full training run. Returns (params, state, history)."""
    subset = OP_JOINT_SUBSETS[cfg.joint_set]
    mcfg = contact_mlp.ModelConfig(
        cfg.window_size, len(subset), cfg.pred_size, 3 if cfg.use_confidence else 2
    )
    key = jax.random.PRNGKey(cfg.seed)
    key, k_init = jax.random.split(key)
    params, state = contact_mlp.init(k_init, mcfg)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    train_op, train_ct = dataset.split_arrays("train")
    val_op, val_ct = dataset.split_arrays("val")
    train_op = jnp.asarray(train_op)
    train_ct = jnp.asarray(train_ct)
    val_op = jnp.asarray(val_op)
    val_ct = jnp.asarray(val_ct)
    n_train = train_op.shape[0]

    history = {"train_loss": [], "train_acc": [], "val_loss": [], "val_f1": [], "val_metrics": []}
    best_f1 = -np.inf
    rng_np = np.random.default_rng(cfg.seed)

    n_full = n_train // cfg.batch_size

    for epoch in range(cfg.epochs):
        perm = rng_np.permutation(n_train)
        epoch_loss, conf_sum, nb = 0.0, None, 0
        if n_full > 0:  # all full batches in one compiled scan (one dispatch)
            batch_idx = jnp.asarray(
                perm[: n_full * cfg.batch_size].reshape(n_full, cfg.batch_size)
            )
            key, k = jax.random.split(key)
            params, state, opt_state, losses, conf_sum = train_epoch(
                params, state, opt_state, train_op, train_ct, batch_idx, k,
                cfg=cfg, tx=tx,
            )
            epoch_loss += float(losses.sum())
            nb += n_full
        for s in range(n_full * cfg.batch_size, n_train, cfg.batch_size):
            # ragged tail batch (the reference's DataLoader keeps it too)
            idx = jnp.asarray(perm[s : s + cfg.batch_size])
            key, k = jax.random.split(key)
            params, state, opt_state, loss, conf = train_step(
                params, state, opt_state, train_op[idx], train_ct[idx], k, cfg=cfg, tx=tx
            )
            epoch_loss += float(loss)
            conf_sum = (
                conf
                if conf_sum is None
                else metrics_lib.Confusion(*(a + b for a, b in zip(conf_sum, conf)))
            )
            nb += 1

        if epoch % log_every == 0:
            m = metrics_lib.metrics_from_confusion(conf_sum)
            history["train_loss"].append(epoch_loss / nb)
            history["train_acc"].append(float(m["accuracy"]))
            if verbose:
                print(f"[train] epoch {epoch}: loss {epoch_loss/nb:.4f} acc {float(m['accuracy']):.4f}")

        if epoch % cfg.val_every == 0 and len(val_op) > 0:
            vloss, confs = eval_step(params, state, val_op, val_ct, cfg=cfg)
            mid = cfg.pred_size // 2
            vm = metrics_lib.metrics_from_confusion(metrics_lib.Confusion(*confs[mid]))
            f1 = float(vm["f1"])
            history["val_loss"].append(float(vloss))
            history["val_f1"].append(f1)
            history["val_metrics"].append(
                [metrics_lib.metrics_from_confusion(metrics_lib.Confusion(*c)) for c in confs]
            )
            if verbose:
                print(f"[val]   epoch {epoch}: loss {float(vloss):.4f} mid-frame F1 {f1:.4f}")
            if out_dir:
                torch_convert.save_npz(os.path.join(out_dir, "contact_weights.npz"), params, state)
                if f1 > best_f1:
                    best_f1 = f1
                    torch_convert.save_npz(
                        os.path.join(out_dir, "contact_weights_BEST.npz"), params, state
                    )

    if out_dir:
        torch_convert.save_npz(os.path.join(out_dir, "contact_weights_FINAL.npz"), params, state)
    return params, state, history
