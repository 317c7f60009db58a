"""Contact-path throughput/MFU sweep on the real TPU (VERDICT r2 #2).

Measures the full fused inference graph (gap-fill -> windows -> MLP ->
vote merge) across video-batch sizes and matmul precision settings, with
the binary-decision tripwire evaluated per configuration: a faster setting
only counts if the final contact arrays still agree >=99.9% with the f64
torch oracle path.

Run: python benchmarks/contact_sweep.py [precision ...] [--batches 1024,2048]
With no args, sweeps every precision; naming precisions lets a timed-out
sweep resume where it stopped (each config is an independent JSON line).
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

F = 240
W, P = 9, 5
SUBSET = list(range(8, 15)) + list(range(19, 25))
MLP_DIMS = [W * len(SUBSET) * 3, 1024, 512, 128, 32, 4 * P]
MLP_FLOPS = 2 * sum(a * b for a, b in zip(MLP_DIMS, MLP_DIMS[1:]))


ALL_PRECISIONS = ["high", "default", "highest", "bf16", "pallas",
                  "conv", "conv_bf16"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("precisions", nargs="*", default=None,
                    choices=ALL_PRECISIONS)
    ap.add_argument("--batches", default="128,512,1024,2048")
    ap.add_argument("--skip-decomposition", action="store_true")
    cli = ap.parse_args()
    precisions = cli.precisions or ALL_PRECISIONS
    batches = [int(b) for b in cli.batches.split(",") if b.strip()]

    import jax
    import jax.numpy as jnp

    from chd_tpu.contact import infer
    from chd_tpu.models import contact_mlp

    params, state = contact_mlp.init(jax.random.PRNGKey(0), contact_mlp.ModelConfig())
    folded = contact_mlp.fold_batchnorm(params, state)
    folded = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), folded)

    rng = np.random.default_rng(0)

    def synth(n):
        kp = np.empty((n, F, 25, 3), np.float32)
        kp[..., 0] = rng.uniform(0, 1280, size=(n, F, 25))
        kp[..., 1] = rng.uniform(0, 720, size=(n, F, 25))
        kp[..., 2] = rng.uniform(0, 1, size=(n, F, 25))
        return kp

    # oracle decisions on 2 videos (f64 torch path, from the test helpers)
    from test_contact_ops import ref_gapfill, ref_votes, ref_window_item
    import torch

    tm = torch.nn.Sequential(
        torch.nn.Linear(MLP_DIMS[0], 1024), torch.nn.ReLU(),
        torch.nn.Linear(1024, 512), torch.nn.ReLU(),
        torch.nn.Linear(512, 128), torch.nn.ReLU(),
        torch.nn.Linear(128, 32), torch.nn.ReLU(),
        torch.nn.Linear(32, 4 * P),
    )
    with torch.no_grad():
        for i, li in enumerate([0, 2, 4, 6, 8]):
            tm[li].weight.copy_(torch.tensor(np.asarray(folded["w"][i])))
            tm[li].bias.copy_(torch.tensor(np.asarray(folded["b"][i])))
    tm.eval()

    def oracle_contacts(kp):
        outs = []
        for v in range(kp.shape[0]):
            x = kp[v].astype(np.float64)
            xy = ref_gapfill(x[..., :2], x[..., 2]) / infer.TRAIN_NORMALIZATION
            x = np.concatenate([xy, x[..., 2:]], axis=-1)
            n_win = F - W + 1
            feats = np.stack([ref_window_item(x, s, W, SUBSET) for s in range(n_win)])
            with torch.no_grad():
                logits = tm(
                    torch.tensor(feats.reshape(n_win, -1), dtype=torch.float32)
                ).numpy().reshape(n_win, P, 4)
            probs = 1 / (1 + np.exp(-logits))
            outs.append(ref_votes((probs > 0.5).astype(np.float32), W))
        return np.stack(outs)

    kp_check = synth(2)
    want = oracle_contacts(kp_check)

    # stage decomposition at a fixed batch: time the MLP alone on pre-built
    # features vs the full fused graph, so the roofline statement ("MLP-bound
    # vs featurization-bound") is measured, not assumed
    def featurize_only(kp_in):
        from chd_tpu.characters import defs as cdefs
        from chd_tpu.ops import gapfill, windows

        x = jax.vmap(
            lambda o: gapfill.preprocess_keypoints(
                o, 0.2, infer.TRAIN_NORMALIZATION)
        )(kp_in[:, :, jnp.asarray(SUBSET), :])
        return windows.featurize_batch(x, W, SUBSET.index(8), True)

    V_dec = 1024
    feat_fn = jax.jit(featurize_only)

    def time_it(g, *a, n_iter=5):
        out = g(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = g(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n_iter

    from chd_tpu.models.contact_mlp import apply_folded

    if not cli.skip_decomposition:
        kp_dec = jnp.asarray(synth(V_dec))
        feats = feat_fn(kp_dec)
        jax.block_until_ready(feats)
        flat = feats.reshape((-1,) + feats.shape[2:])
        mlp_fn = jax.jit(functools.partial(apply_folded, pred_size=P,
                                           precision="high"))
        mlp_bf16 = jax.jit(functools.partial(apply_folded, pred_size=P,
                                             precision=None))
        folded_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), folded)
        flat_bf16 = flat.astype(jnp.bfloat16)
        t_feat = time_it(feat_fn, kp_dec)
        t_mlp = time_it(lambda x: mlp_fn(folded, x), flat)
        t_mlp_bf16 = time_it(lambda x: mlp_bf16(folded_bf16, x), flat_bf16)
        print(json.dumps({
            "decomposition": True, "batch": V_dec,
            "featurize_ms": round(t_feat * 1e3, 2),
            "mlp_ms": round(t_mlp * 1e3, 2),
            "mlp_bf16_ms": round(t_mlp_bf16 * 1e3, 2),
            "mlp_tflops": round(
                V_dec * (F - W + 1) * MLP_FLOPS / t_mlp / 1e12, 2),
            "mlp_bf16_tflops": round(
                V_dec * (F - W + 1) * MLP_FLOPS / t_mlp_bf16 / 1e12, 2),
        }), flush=True)

    # Per-process warm-up: on the tunneled axon device, the FIRST jitted
    # graph timed in a process runs ~3x slower for its entire lifetime
    # (measured: whichever precision config is listed first reports
    # 150-260 ms/call at every batch size, then the identical config in a
    # later slot reports 30-70 ms). Burn a throwaway config so every timed
    # config runs in the warm regime and cross-config numbers compare.
    warm_fn = jax.jit(functools.partial(
        infer._infer_batch_chunked, window_size=W, pred_size=P,
        joint_subset=tuple(SUBSET), use_confidence=True, conf_thresh=0.2,
        normalization=infer.TRAIN_NORMALIZATION, classify_thresh=0.5,
    ))
    # adaptive: the cold regime lasts well past a handful of small calls,
    # so burn full-size calls until two consecutive timings agree within
    # 15% (cap 20 calls), and report how long warm-up took
    kp_warm = jnp.asarray(synth(max(batches)))
    c, _ = warm_fn(kp_warm, folded)
    jax.block_until_ready(c)
    prev, t_start, converged = None, time.perf_counter(), False
    for i in range(20):
        t0 = time.perf_counter()
        c, _ = warm_fn(kp_warm, folded)
        float(jnp.sum(c))
        dt = time.perf_counter() - t0
        if prev is not None and abs(dt - prev) < 0.15 * min(dt, prev):
            converged = True
            break
        prev = dt
    print(json.dumps({"warmup": True, "calls": i + 2, "converged": converged,
                      "wall_s": round(time.perf_counter() - t_start, 1),
                      "settled_ms": round(dt * 1e3, 2)}), flush=True)

    for precision in precisions:
        use_pallas = precision == "pallas"
        use_conv = precision.startswith("conv")
        prec = None if precision in ("default", "bf16", "conv_bf16") else (
            "high" if use_pallas or precision == "conv" else precision)
        mlp_dtype = jnp.bfloat16 if precision.endswith("bf16") else None
        # _infer_batch_chunked: flat video batches >=1024 hit a measured
        # deterministic runtime corruption on v5e (BASELINE.md
        # "batch-invariance tripwire"); lax.map over <=512-video chunks is
        # exact and keeps the one-dispatch amortization
        fn = jax.jit(functools.partial(
            infer._infer_batch_chunked,
            window_size=W, pred_size=P,
            joint_subset=tuple(SUBSET), use_confidence=True,
            conf_thresh=0.2, normalization=infer.TRAIN_NORMALIZATION,
            classify_thresh=0.5, use_pallas=use_pallas, precision=prec,
            mlp_dtype=mlp_dtype, use_conv=use_conv,
        ))
        c2, _ = fn(jnp.asarray(kp_check), folded)
        agree = float((np.asarray(c2) == want).mean())
        print(json.dumps({
            "precision": precision, "binary_agreement": agree,
            "check_videos": int(kp_check.shape[0]),
        }), flush=True)
        for V in batches:
            # the check videos ride as rows 0-1 of every TIMED batch so the
            # agreement gate runs inside the big executable — the small-
            # batch-only gate missed the >=1024 flat-batch corruption
            kp = jnp.asarray(
                np.concatenate([kp_check, synth(V - 2)], axis=0))
            c, p = fn(kp, folded)  # compile
            jax.block_until_ready(c)
            n_iter = 3
            t0 = time.perf_counter()
            for _ in range(n_iter):
                c, p = fn(kp, folded)
                float(jnp.sum(c))  # checksum transfer forces completion
            dt = (time.perf_counter() - t0) / n_iter
            fps = V * F / dt
            wpf = (F - W + 1) / F
            print(json.dumps({
                "precision": precision, "batch": V,
                "ms_per_call": round(dt * 1e3, 2),
                "frames_per_sec": round(fps),
                "mfu_pct": round(100 * fps * wpf * MLP_FLOPS / 197e12, 2),
                # in-executable gate: check-video decisions from the TIMED
                # graph itself must match the f64 oracle
                "in_batch_agreement": float(
                    (np.asarray(c[:2]) == want).mean()),
            }), flush=True)


if __name__ == "__main__":
    main()
