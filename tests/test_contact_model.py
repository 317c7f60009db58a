"""Parity of the JAX contact MLP against an equivalent torch model.

The reference model module can't be imported here (its package pulls in
skimage/torchvision, absent from this image), so the oracle is a torch
nn.Sequential built to the reference architecture spec
(src/contact_learning/models/openpose_only.py:29-44).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from chd_tpu.models import contact_mlp, torch_convert  # noqa: E402

WINDOW, JOINTS, PRED, FEAT = 9, 13, 5, 3


def build_torch_model(seed=0):
    torch.manual_seed(seed)
    in_dim = WINDOW * JOINTS * FEAT
    model = nn.Sequential(
        nn.Linear(in_dim, 1024), nn.BatchNorm1d(1024), nn.ReLU(),
        nn.Linear(1024, 512), nn.BatchNorm1d(512), nn.ReLU(),
        nn.Linear(512, 128), nn.BatchNorm1d(128), nn.ReLU(),
        nn.Dropout(p=0.3),
        nn.Linear(128, 32), nn.BatchNorm1d(32), nn.ReLU(),
        nn.Linear(32, 4 * PRED),
    )
    # run a few training batches so BN running stats are non-trivial
    model.train()
    with torch.no_grad():
        for _ in range(3):
            model(torch.randn(64, in_dim))
    model.eval()
    return model


class Wrapper(nn.Module):
    """state_dict keys as 'model.<i>.*' like the reference OpenPoseModel."""

    def __init__(self, seq):
        super().__init__()
        self.model = seq


@pytest.fixture(scope="module")
def converted():
    m = build_torch_model()
    sd = Wrapper(m).state_dict()
    params, state = torch_convert.from_state_dict(sd)
    return m, params, state


def test_eval_forward_parity(converted):
    m, params, state = converted
    rng = np.random.default_rng(0)
    x = rng.normal(size=(17, WINDOW, JOINTS, FEAT)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x.reshape(17, -1))).numpy()
    ours, _ = contact_mlp.apply(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-4)


def test_folded_forward_parity(converted):
    m, params, state = converted
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, WINDOW, JOINTS, FEAT)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x.reshape(8, -1))).numpy().reshape(8, PRED, 4)
    folded = contact_mlp.fold_batchnorm(params, state)
    ours = contact_mlp.apply_folded(folded, jnp.asarray(x), PRED)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=1e-3)


def test_train_forward_matches_torch_batchstats(converted):
    m, params, state = converted
    rng = np.random.default_rng(2)
    x = rng.normal(size=(32, WINDOW, JOINTS, FEAT)).astype(np.float32)
    mt = build_torch_model()
    sd = Wrapper(mt).state_dict()
    params, state = torch_convert.from_state_dict(sd)
    # disable dropout on both sides for determinism
    mt.train()
    mt[9].p = 0.0
    with torch.no_grad():
        ref = mt(torch.from_numpy(x.reshape(32, -1))).numpy()
    ours, new_state = contact_mlp.apply(params, state, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=1e-3)
    # running stats update matches torch momentum semantics
    ref_mean = mt[1].running_mean.numpy()
    np.testing.assert_allclose(np.asarray(new_state["bn0"]["mean"]), ref_mean, atol=1e-5)
    ref_var = mt[1].running_var.numpy()
    np.testing.assert_allclose(np.asarray(new_state["bn0"]["var"]), ref_var, atol=1e-4)


def test_bce_loss_parity(converted):
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(6, PRED, 4)).astype(np.float32)
    labels = (rng.uniform(size=(6, PRED, 4)) > 0.5).astype(np.float32)
    ref = torch.nn.BCEWithLogitsLoss(reduction="none")(
        torch.from_numpy(logits.reshape(6, -1)), torch.from_numpy(labels.reshape(6, -1))
    ).numpy().reshape(6, PRED, 4)
    ours = contact_mlp.bce_with_logits(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_npz_roundtrip(tmp_path, converted):
    _, params, state = converted
    p = str(tmp_path / "w.npz")
    torch_convert.save_npz(p, params, state)
    p2, s2 = torch_convert.load_npz(p)
    for k in params:
        for leaf in params[k]:
            np.testing.assert_array_equal(np.asarray(params[k][leaf]), p2[k][leaf])
    for k in state:
        for leaf in state[k]:
            np.testing.assert_array_equal(np.asarray(state[k][leaf]), s2[k][leaf])


def test_init_shapes():
    cfg = contact_mlp.ModelConfig(WINDOW, JOINTS, PRED, FEAT)
    params, state = contact_mlp.init(jax.random.PRNGKey(0), cfg)
    out, _ = contact_mlp.apply(params, state, jnp.zeros((4, WINDOW, JOINTS, FEAT)), train=False)
    assert out.shape == (4, 4 * PRED)
