"""Training actually learns: on a dataset where contacts are a simple
function of the pose (heel height below a floor line), F1 must climb far
above chance. Validates the full loop end-to-end (sampling, noise, BN in
train mode, Adam+L2, metrics)."""
import numpy as np
import jax.numpy as jnp
import pytest

from chd_tpu.contact import data as data_lib
from chd_tpu.contact import train as train_lib
from chd_tpu.contact.evaluate import evaluate_full_video


def synthetic_learnable_dataset(n_seq=24, F=60, seed=0):
    """Keypoints whose heel/toe y oscillates; label = foot near its low point."""
    rng = np.random.default_rng(seed)
    op = np.zeros((n_seq, F, 25, 3), np.float32)
    contacts = np.zeros((n_seq, F, 4), np.float32)
    t = np.arange(F)
    for s in range(n_seq):
        base_y = rng.uniform(400, 500)
        phase = rng.uniform(0, 2 * np.pi)
        freq = rng.uniform(0.2, 0.5)
        # static-ish upper body
        op[s, :, :, 0] = rng.uniform(500, 700, size=(1, 25))
        op[s, :, :, 1] = rng.uniform(100, 400, size=(1, 25))
        op[s, :, :, 2] = 1.0
        for side, (heel_j, toe_j, lh, lt) in enumerate(
            [(21, 19, 0, 1), (24, 22, 2, 3)]
        ):
            osc = np.sin(freq * t + phase + side * np.pi)  # feet alternate
            y = base_y + 40 * osc
            op[s, :, heel_j, 1] = y
            op[s, :, toe_j, 1] = y + 5
            op[s, :, 20 if side == 0 else 23, 1] = y + 5
            down = osc > 0.3  # "planted" when low (image y grows downward)
            contacts[s, :, lh] = down
            contacts[s, :, lt] = down
        op[s, :, 8, 1] = base_y - 200  # hip above feet
        op[s, :, 8, 0] = 600
        op[s, :, 19, 0] = 580
    # noise
    op[..., :2] += rng.normal(size=op[..., :2].shape) * 2.0

    norm = float(np.median(np.linalg.norm(op[:, :, 8, :2] - op[:, :, 19, :2], axis=-1)))
    from chd_tpu.ops import gapfill
    import jax

    proc = jax.vmap(lambda x: gapfill.preprocess_keypoints(x, 0.2, norm))(jnp.asarray(op))
    n_train = n_seq - 4
    return data_lib.ContactDataset(
        op_data=np.asarray(proc),
        contacts=contacts,
        normalization=norm,
        splits={"train": list(range(n_train)), "val": list(range(n_train, n_seq)),
                "test": list(range(n_train, n_seq))},
        num_frames=F,
        names=[f"s{i}" for i in range(n_seq)],
    )


@pytest.mark.parametrize("epochs", [150])
@pytest.mark.slow
def test_training_learns_contacts(epochs):
    ds = synthetic_learnable_dataset()
    cfg = train_lib.TrainConfig(epochs=epochs, batch_size=16, val_every=50, lr=3e-4)
    params, state, hist = train_lib.train(ds, cfg, verbose=False)
    res = evaluate_full_video(params, state, ds, split="test", cfg=cfg)
    f1 = res["merged"]["f1"]
    acc = res["merged"]["accuracy"]
    assert f1 > 0.8, (f1, acc)
    assert acc > 0.8, (f1, acc)
