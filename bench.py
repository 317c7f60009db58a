"""Benchmark: full-video contact inference throughput (frames/sec).

Compares the chd_tpu jit pipeline (gap-fill → window featurization → contact
MLP → vote merge, batched over videos on the default JAX device) against a
faithful re-enactment of the reference CPU pipeline (per-video python
preprocessing loops + torch MLP over windows + python vote loop — the shape
of src/contact_learning/test.py --full-video with real_video_dataset).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

W, P = 9, 5
FRAMES = 240
OUR_BATCH = 128   # videos per device batch for the JAX path
REF_VIDEOS = 2      # videos for the (slow) reference-style baseline
SUBSET = list(range(8, 15)) + list(range(19, 25))  # 'lower'


def synth_videos(n, frames, seed=0):
    rng = np.random.default_rng(seed)
    kp = np.zeros((n, frames, 25, 3), np.float32)
    kp[..., 0] = rng.uniform(200, 1100, size=(n, frames, 25))
    kp[..., 1] = rng.uniform(100, 650, size=(n, frames, 25))
    kp[..., 2] = rng.uniform(0.25, 1.0, size=(n, frames, 25))
    kp[rng.uniform(size=(n, frames, 25)) < 0.05, 2] = 0.05
    return kp


def bench_ours(kp):
    import jax
    import jax.numpy as jnp

    from chd_tpu.contact.infer import ContactDetector
    from chd_tpu.models import contact_mlp

    cfg = contact_mlp.ModelConfig()
    params, state = contact_mlp.init(jax.random.PRNGKey(0), cfg)
    det = ContactDetector(params, state)

    @jax.jit
    def run(x, folded):
        contacts, probs = det._batched(x, folded)
        # scalar checksum forces full materialization even if the transport
        # layer's block_until_ready is lazy
        return contacts, jnp.sum(probs) + jnp.sum(contacts)

    x = jnp.asarray(kp)
    # warmup/compile (+ checksum to host)
    _, chk = run(x, det.folded)
    float(chk)
    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        _, chk = run(x, det.folded)
    float(chk)  # host transfer of the checksum syncs the stream
    dt = (time.perf_counter() - t0) / n_iter
    frames = kp.shape[0] * kp.shape[1]
    return frames / dt


def bench_reference_style(kp):
    """Reference pipeline shape on CPU: python loops + torch model."""
    import torch
    import torch.nn as nn

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from test_contact_ops import ref_gapfill, ref_votes, ref_window_item

    torch.manual_seed(0)
    in_dim = W * len(SUBSET) * 3
    model = nn.Sequential(
        nn.Linear(in_dim, 1024), nn.BatchNorm1d(1024), nn.ReLU(),
        nn.Linear(1024, 512), nn.BatchNorm1d(512), nn.ReLU(),
        nn.Linear(512, 128), nn.BatchNorm1d(128), nn.ReLU(),
        nn.Dropout(0.3),
        nn.Linear(128, 32), nn.BatchNorm1d(32), nn.ReLU(),
        nn.Linear(32, 4 * P),
    )
    model.eval()

    t0 = time.perf_counter()
    for v in range(kp.shape[0]):
        x = kp[v].astype(np.float64)
        x[..., :2] = ref_gapfill(x[..., :2], x[..., 2], 0.2)
        x[..., :2] /= 200.4160302695367
        n_win = x.shape[0] - W + 1
        feats = np.stack([ref_window_item(x, s, W, SUBSET) for s in range(n_win)])
        with torch.no_grad():
            logits = model(
                torch.from_numpy(feats.reshape(n_win, -1).astype(np.float32))
            ).numpy().reshape(n_win, P, 4)
        preds = (1 / (1 + np.exp(-logits)) > 0.5).astype(np.float32)
        ref_votes(preds, W)
    dt = time.perf_counter() - t0
    frames = kp.shape[0] * kp.shape[1]
    return frames / dt


def main():
    ours_fps = bench_ours(synth_videos(OUR_BATCH, FRAMES))
    try:
        ref_fps = bench_reference_style(synth_videos(REF_VIDEOS, FRAMES))
    except Exception:
        ref_fps = float("nan")
    print(
        json.dumps(
            {
                "metric": "contact_infer_frames_per_sec",
                "value": round(ours_fps, 1),
                "unit": "frames/sec",
                "vs_baseline": round(ours_fps / ref_fps, 2) if ref_fps == ref_fps else None,
            }
        )
    )


if __name__ == "__main__":
    main()
