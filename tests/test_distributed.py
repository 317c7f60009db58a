"""Distributed-backend tests on the virtual 8-CPU mesh: hybrid
('slice','data','model') mesh construction, cross-"DCN" batch sharding, and
a data-parallel train step whose gradient all-reduce crosses the slice axis.
(True multi-process DCN needs multiple hosts; here slices are emulated by
partitioning the 8 virtual devices — the sharding program is identical.)"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from chd_tpu.parallel import distributed as dist


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert dist.initialize() is False  # single-process: no-op, no crash


def test_global_mesh_axes():
    m = dist.make_global_mesh(model=2, n_slices=2)
    assert m.shape == {"slice": 2, "data": 2, "model": 2}
    with pytest.raises(ValueError):
        dist.make_global_mesh(model=3, n_slices=2)
    with pytest.raises(ValueError):
        dist.make_global_mesh(n_slices=3)


def test_shard_global_batch_layout():
    m = dist.make_global_mesh(model=1, n_slices=2)
    x = dist.shard_global_batch(m, jnp.arange(16.0).reshape(16, 1))
    # batch split 8-ways across slice×data
    assert len(x.addressable_shards) == 8
    assert all(s.data.shape == (2, 1) for s in x.addressable_shards)


def test_process_local_slice_covers_dataset():
    s = dist.process_local_slice(10)
    assert s == slice(0, 10)  # single process owns everything


def test_train_step_across_slices():
    """Sync-BN dp train step with the batch split over slice×data: gradients
    (and BN batch stats) all-reduce across BOTH axes, i.e. over the DCN
    boundary — the config-#5 sweep layout."""
    from chd_tpu.characters.defs import OP_JOINT_SUBSETS
    from chd_tpu.contact import train as train_lib
    from chd_tpu.models import contact_mlp

    cfg = train_lib.TrainConfig(batch_size=16)
    subset = OP_JOINT_SUBSETS[cfg.joint_set]
    mcfg = contact_mlp.ModelConfig(cfg.window_size, len(subset), cfg.pred_size, 3)
    params, state = contact_mlp.init(jax.random.PRNGKey(0), mcfg)
    tx = train_lib.make_optimizer(cfg)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    n_seq, F = 32, 24
    op = jnp.asarray(rng.uniform(0, 5, size=(n_seq, F, 25, 3)), jnp.float32)
    ct = jnp.asarray((rng.uniform(size=(n_seq, F, 4)) > 0.5), jnp.float32)
    batch_idx = jnp.asarray(
        rng.integers(0, n_seq, size=(2, cfg.batch_size)), jnp.int32
    )

    m = dist.make_global_mesh(model=1, n_slices=2)
    op_s = dist.shard_global_batch(m, op)
    ct_s = dist.shard_global_batch(m, ct)
    rep = NamedSharding(m, P())
    p_s = jax.tree.map(lambda a: jax.device_put(a, rep), params)
    s_s = jax.tree.map(lambda a: jax.device_put(a, rep), state)
    o_s = jax.tree.map(
        lambda a: jax.device_put(a, rep) if hasattr(a, "shape") else a, opt_state
    )

    p2, s2, o2, losses, conf = train_lib.train_epoch(
        p_s, s_s, o_s, op_s, ct_s, batch_idx, jax.random.PRNGKey(1),
        cfg=cfg, tx=tx)
    jax.block_until_ready(losses)
    assert np.isfinite(np.asarray(losses)).all()

    # identical math on an unsharded mesh-free run
    p1, s1, o1, losses1, _ = train_lib.train_epoch(
        params, state, opt_state, op, ct, batch_idx, jax.random.PRNGKey(1),
        cfg=cfg, tx=tx)
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(losses1), rtol=2e-5, atol=2e-6
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        ),
        p2, p1,
    )
