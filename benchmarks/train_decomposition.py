"""Where does the training step's time go? (VERDICT r4 #6)

The sweep-selected contact-inference config (conv fusion / bf16 matmuls)
only helps training if the MLP matmuls are a material share of the step.
This measures that share directly on the TPU, at the train-epoch bench
shape (512-sequence global batch, the TPU-shaped headline): one epoch-step
decomposed into
  - featurize: on-device window sampling + featurization
    (contact/data.sample_train_windows — the reference does this per-item
    in numpy inside Dataset.__getitem__, train.py:22-38)
  - fwd/bwd: loss value_and_grad on prebuilt features + Adam update
  - full: the real fused train_epoch step (scan body)

If featurize + overheads dominate, bf16/conv knobs in the train path are a
recorded negative result; if fwd/bwd dominates, they're worth wiring.

Run: python benchmarks/train_decomposition.py   (JSON lines)
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SEQ = int(os.environ.get("DEC_SEQ", "512"))
F = int(os.environ.get("DEC_FRAMES", "32"))
STEPS = int(os.environ.get("DEC_STEPS", "64"))


def main():
    import jax
    import jax.numpy as jnp

    from chd_tpu.characters.defs import OP_JOINT_SUBSETS
    from chd_tpu.contact import data as data_lib
    from chd_tpu.contact import train as train_lib
    from chd_tpu.models import contact_mlp

    cfg = train_lib.TrainConfig(batch_size=N_SEQ)
    subset = tuple(OP_JOINT_SUBSETS[cfg.joint_set])
    mcfg = contact_mlp.ModelConfig(cfg.window_size, len(subset), cfg.pred_size, 3)
    params, state = contact_mlp.init(jax.random.PRNGKey(0), mcfg)
    tx = train_lib.make_optimizer(cfg)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    op = jnp.asarray(rng.uniform(0, 5, size=(N_SEQ, F, 25, 3)), jnp.float32)
    contacts = jnp.asarray((rng.uniform(size=(N_SEQ, F, 4)) > 0.5), jnp.float32)
    batch_idx = jnp.asarray(
        np.stack([rng.permutation(N_SEQ) for _ in range(STEPS)]), jnp.int32)
    key = jax.random.PRNGKey(1)

    # Each call gets a DIFFERENT key (fold_in a counter): the tunneled axon
    # device short-circuits repeat executions with identical args, so timing
    # the same (executable, args) pair reports ~0 after the first call.
    fold = {"i": 0}

    def timeit(fn, n=3):
        def call():
            fold["i"] += 1
            out = fn(jax.random.fold_in(key, fold["i"]))
            # host fetch of one leaf = reliable sync; on axon,
            # block_until_ready can return before the execution lands
            # (measured: 2 ms "full epoch" whose parts sum to 77 ms)
            np.asarray(jax.tree_util.tree_leaves(out)[-1])

        call()
        # adaptive warm-up: two consecutive agreeing timings (tunnel regime)
        prev = None
        for _ in range(8):
            t0 = time.perf_counter()
            call()
            dt = time.perf_counter() - t0
            if prev is not None and abs(dt - prev) < 0.15 * min(dt, prev):
                break
            prev = dt
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            call()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # full epoch-scan step (the bench shape: STEPS steps in one scan).
    # Return the WHOLE output tuple: on axon, block_until_ready on a single
    # element of a multi-output executable can return before the execution
    # finishes (measured: blocking on losses alone reported 0.9 ms for an
    # epoch whose parts sum to 77 ms; blocking on the full tuple, 45-75 ms).
    def full(k):
        return train_lib.train_epoch(params, state, opt_state, op, contacts,
                                     batch_idx, k, cfg=cfg, tx=tx)

    t_full = timeit(full)

    # featurize only, STEPS times in one scan (same shape as the step body)
    @jax.jit
    def feat_scan(k):
        keys = jax.random.split(k, STEPS)

        def body(_, xs):
            idx, kk = xs
            f, l = data_lib.sample_train_windows(
                kk, jnp.take(op, idx, axis=0), jnp.take(contacts, idx, axis=0),
                cfg.window_size, cfg.pred_size, subset, cfg.noise_dev,
                cfg.use_confidence)
            return (), (jnp.sum(f), jnp.sum(l))

        _, (s1, s2) = jax.lax.scan(body, (), (batch_idx, keys))
        return s1 + s2

    t_feat = timeit(feat_scan)

    # fwd/bwd + Adam on PREBUILT features, STEPS times in one scan
    feats, labels = data_lib.sample_train_windows(
        key, op, contacts, cfg.window_size, cfg.pred_size, subset,
        cfg.noise_dev, cfg.use_confidence)

    @jax.jit
    def fwdbwd_scan(k):
        keys = jax.random.split(k, STEPS)

        def body(carry, kk):
            p, s, o = carry
            import optax

            (loss, (ns, _)), grads = jax.value_and_grad(
                train_lib.loss_and_logits, has_aux=True
            )(p, s, feats, labels, kk, cfg.pred_size)
            upd, no = tx.update(grads, o, p)
            return (optax.apply_updates(p, upd), ns, no), loss

        (_, _, _), losses = jax.lax.scan(
            body, (params, state, opt_state), keys)
        return losses

    t_fb = timeit(fwdbwd_scan)

    # Same fwd/bwd with single-pass bf16 matmuls (the sweep-winning MLP
    # knob): if the step were matmul-bound this would approach 2-3x; the
    # FLOP model says matmuls are ~3% of the fwd/bwd wall at this shape.
    @jax.jit
    def fwdbwd_bf16_scan(k):
        # context active during tracing = all dots lowered single-pass bf16
        with jax.default_matmul_precision("bfloat16"):
            return fwdbwd_scan.__wrapped__(k)

    t_fb16 = timeit(fwdbwd_bf16_scan)

    print(json.dumps({
        "n_seq": N_SEQ, "steps_per_scan": STEPS,
        "full_ms_per_step": round(t_full / STEPS * 1e3, 3),
        "featurize_ms_per_step": round(t_feat / STEPS * 1e3, 3),
        "fwdbwd_ms_per_step": round(t_fb / STEPS * 1e3, 3),
        "fwdbwd_bf16_ms_per_step": round(t_fb16 / STEPS * 1e3, 3),
        "residual_ms_per_step": round((t_full - t_feat - t_fb) / STEPS * 1e3, 3),
        "fwdbwd_share_pct": round(100 * t_fb / t_full, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
