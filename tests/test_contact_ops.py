"""Parity tests for gap-fill, windowing, and vote merging.

Oracles are direct numpy re-implementations of the reference behavior
(process_openpose_data loop at openpose_dataset.py:49-111; window
root-normalization at :329-340 / real_video_dataset.py:244-255; vote
aggregation at test.py:91-122), written loop-style in the tests.
"""
import numpy as np
import jax.numpy as jnp

from chd_tpu.ops import gapfill, voting, windows


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def ref_gapfill(seq, conf, thresh=0.2):
    """Loop oracle for the reference confidence gap fill."""
    seq = seq.copy()
    F, J, _ = seq.shape
    for j in range(J):
        t = 0
        while t < F:
            if conf[t, j] < thresh:
                nxt = t + 1
                while nxt < F and conf[nxt, j] < thresh:
                    nxt += 1
                init = t - 1
                if t == 0 and nxt == F:
                    pass
                elif t == 0:
                    seq[:nxt, j] = seq[nxt, j]
                elif nxt == F:
                    seq[init:, j] = seq[init, j]
                else:
                    step = 1.0 / (nxt - init)
                    cur, ct = step, t
                    while ct < nxt:
                        seq[ct, j] = (1 - cur) * seq[init, j] + cur * seq[nxt, j]
                        ct += 1
                        cur += step
                t = nxt
            else:
                t += 1
    return seq


def ref_votes(preds, window_size):
    """Loop oracle for vote merging (test.py:91-122)."""
    N, P, C = preds.shape
    agg = np.zeros((N + P - 1, C))
    for w in range(N):
        agg[w : w + P] += preds[w]
    thresh = np.ones(agg.shape[0]) * ((P + 1) / 2)
    for e in range(P - 1):
        thresh[e] = e // 2 + 1
        thresh[-1 - e] = e // 2 + 1
    contact = (agg >= thresh[:, None]).astype(int)
    off = (window_size - P) // 2
    lead = np.repeat(contact[:1], off, axis=0)
    tail = np.repeat(contact[-1:], off, axis=0)
    return np.concatenate([lead, contact, tail], axis=0)


def ref_window_item(op_data, start, W, subset, root=8):
    """Oracle for one window's featurization (real_video_dataset.py:230-255)."""
    w = op_data[start : start + W].copy()
    mid = W // 2
    tgt_root = w[mid, root, :2].copy()
    w[:, :, :2] -= tgt_root[None, None]
    w[mid, root, :2] = tgt_root
    return w[:, subset, :]


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_gapfill_matches_reference_loop():
    rng = np.random.default_rng(0)
    F, J = 40, 7
    seq = rng.normal(size=(F, J, 2)) * 100
    conf = rng.uniform(size=(F, J))
    # force interesting cases: leading gap, trailing gap, interior gaps, all-bad
    conf[:5, 0] = 0.0
    conf[-6:, 1] = 0.05
    conf[10:20, 2] = 0.1
    conf[:, 3] = 0.0
    expected = ref_gapfill(seq, conf)
    got = np.asarray(gapfill.fill_low_confidence(jnp.asarray(seq), jnp.asarray(conf)))
    np.testing.assert_allclose(got, expected, atol=1e-9)


def test_gapfill_single_frame_gaps():
    rng = np.random.default_rng(1)
    seq = rng.normal(size=(10, 2, 2))
    conf = np.ones((10, 2))
    conf[3, 0] = 0.0
    conf[0, 1] = 0.0
    expected = ref_gapfill(seq, conf)
    got = np.asarray(gapfill.fill_low_confidence(jnp.asarray(seq), jnp.asarray(conf)))
    np.testing.assert_allclose(got, expected, atol=1e-9)


def test_vote_merge_matches_reference_loop():
    rng = np.random.default_rng(2)
    for W, P in [(9, 5), (9, 3), (7, 5), (5, 1)]:
        N = 30
        preds = (rng.uniform(size=(N, P, 4)) > 0.6).astype(np.float32)
        expected = ref_votes(preds, W)
        got = np.asarray(voting.merge_votes(jnp.asarray(preds), W))
        np.testing.assert_array_equal(got, expected)
        assert got.shape[0] == N + W - 1  # one row per original frame


def test_window_featurization_matches_reference_item():
    from chd_tpu.characters.defs import OP_JOINT_SUBSETS

    rng = np.random.default_rng(3)
    F, W = 30, 9
    subset = OP_JOINT_SUBSETS["lower"]
    op = rng.normal(size=(F, 25, 3))
    feats = np.asarray(windows.featurize_video(jnp.asarray(op), W, subset))
    assert feats.shape == (F - W + 1, W, len(subset), 3)
    for start in [0, 5, F - W]:
        expected = ref_window_item(op, start, W, subset)
        np.testing.assert_allclose(feats[start], expected, atol=1e-12)


def test_num_windows_matches_reference():
    assert windows.num_windows(100, 9) == 100 - 2 * 4


def test_one_euro_matches_reference():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_oef", "/root/reference/src/optimize/OneEuroFilter.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from chd_tpu.ingest.one_euro import one_euro_filter

    rng = np.random.default_rng(4)
    x = rng.normal(size=(50,))
    cfg = dict(freq=30.0, mincutoff=0.05, beta=0.005, dcutoff=1.0)
    f = mod.OneEuroFilter(**cfg)
    expected = np.array([f(x[t], t) for t in range(50)])
    got = np.asarray(
        one_euro_filter(
            jnp.asarray(x), freq=cfg["freq"], mincutoff=cfg["mincutoff"],
            beta=cfg["beta"], dcutoff=cfg["dcutoff"], timestamps=jnp.arange(50.0),
        )
    )
    np.testing.assert_allclose(got, expected, atol=1e-10)


def test_vote_merge_batch_matches_single():
    """merge_votes_batch (1-D conv over packed channels) == vmapped
    merge_votes for every (W, P) shape the pipeline uses."""
    rng = np.random.default_rng(4)
    for W, P in [(9, 5), (9, 3), (7, 5), (5, 1)]:
        V, N = 3, 30
        preds = (rng.uniform(size=(V, N, P, 4)) > 0.6).astype(np.float32)
        got = np.asarray(voting.merge_votes_batch(jnp.asarray(preds), W))
        for v in range(V):
            want = np.asarray(voting.merge_votes(jnp.asarray(preds[v]), W))
            np.testing.assert_array_equal(got[v], want)


def test_vote_merge_batch_rejects_parity_mismatch():
    import pytest

    preds = np.zeros((1, 10, 4, 4), np.float32)
    with pytest.raises(ValueError):
        voting.merge_votes_batch(jnp.asarray(preds), 9)


def test_featurize_batch_matches_per_video():
    """featurize_batch (W shifted slices on pre-subset joints) == vmapped
    featurize_video on the full 25-joint arrays."""
    from chd_tpu.characters.defs import OP_JOINT_SUBSETS, OP_ROOT_JOINT

    rng = np.random.default_rng(5)
    V, F, W = 4, 30, 9
    subset = list(OP_JOINT_SUBSETS["lower"])
    root_in_subset = subset.index(OP_ROOT_JOINT)
    op = rng.normal(size=(V, F, 25, 3)) * 100

    got = np.asarray(
        windows.featurize_batch(
            jnp.asarray(op[:, :, subset, :]), W, root_in_subset
        )
    )
    for v in range(V):
        want = np.asarray(
            windows.featurize_video(jnp.asarray(op[v]), W, subset)
        )
        np.testing.assert_allclose(got[v], want, atol=1e-12)

    # use_confidence=False drops the confidence channel
    got2 = windows.featurize_batch(
        jnp.asarray(op[:, :, subset, :]), W, root_in_subset, use_confidence=False
    )
    assert got2.shape[-1] == 2


def test_conv_fused_inference_matches_window_path():
    """The conv-fused path (layer 1 as a width-W temporal conv with the
    per-window root normalization folded into the kernel,
    windows.layer1_conv_kernel) produces the same probabilities and
    identical decisions as the materialized-window path, across joint sets
    with and without the root joint and with/without confidence."""
    import functools

    import jax

    from chd_tpu.characters.defs import OP_JOINT_SUBSETS
    from chd_tpu.contact import infer
    from chd_tpu.models import contact_mlp

    rng = np.random.default_rng(0)
    V, F = 3, 60
    kp = np.empty((V, F, 25, 3), np.float32)
    kp[..., 0] = rng.uniform(0, 1280, size=(V, F, 25))
    kp[..., 1] = rng.uniform(0, 720, size=(V, F, 25))
    kp[..., 2] = rng.uniform(0, 1, size=(V, F, 25))

    for joint_set, use_conf in [
        ("lower", True),          # root inside the subset
        ("lower", False),         # no confidence channel
        ("lower_ankles", True),   # root appended for normalization only
    ]:
        subset = tuple(OP_JOINT_SUBSETS[joint_set])
        cfg = contact_mlp.ModelConfig(
            num_joints=len(subset), feat_size=3 if use_conf else 2
        )
        params, state = contact_mlp.init(jax.random.PRNGKey(1), cfg)
        folded = contact_mlp.fold_batchnorm(params, state)

        def run(use_conv):
            fn = jax.jit(functools.partial(
                infer._infer_batch, window_size=9, pred_size=5,
                joint_subset=subset, use_confidence=use_conf,
                conf_thresh=0.2, normalization=infer.TRAIN_NORMALIZATION,
                classify_thresh=0.5, use_conv=use_conv,
            ))
            return fn(jnp.asarray(kp), folded)

        c_win, p_win = run(False)
        c_conv, p_conv = run(True)
        np.testing.assert_allclose(
            np.asarray(p_conv), np.asarray(p_win), atol=1e-4,
            err_msg=f"{joint_set} conf={use_conf}",
        )
        assert (np.asarray(c_conv) == np.asarray(c_win)).all(), (
            joint_set, use_conf,
        )
