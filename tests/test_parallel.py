"""Multi-device and batched-solver tests on the virtual 8-CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chd_tpu.kinematics.lm import LMConfig
from chd_tpu.parallel import batch as batch_lib
from chd_tpu.parallel import mesh as mesh_lib
from chd_tpu.physics import collocation
from chd_tpu.physics.types import PhysWeights

from test_physics_solve import standing_hop_input


def test_mesh_shapes():
    m = mesh_lib.make_mesh(n_devices=8, model=2)
    assert m.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(n_devices=8, data=3, model=2)


@pytest.fixture(scope="module")
def quick_cfg():
    return collocation.SolveConfig(
        al_iters_fit=1, al_iters_dyn=1, al_iters_height=1,
        lm=LMConfig(max_iters=6, cg_iters=20, init_lambda=1e-2),
    )


@pytest.mark.slow
def test_batched_physics_matches_single(quick_cfg):
    """vmapped batch solve == per-sequence solve (same math, lockstep)."""
    phys = standing_hop_input(F=20)
    batched, lens = batch_lib.pad_phys_inputs([phys, phys])
    rf_b, rd_b = batch_lib.solve_physics_batch(batched, PhysWeights(), quick_cfg)
    rf_s, rd_s, _ = collocation.solve_physics(phys, PhysWeights(), quick_cfg)
    np.testing.assert_allclose(
        np.asarray(rd_b.base_lin[0]), np.asarray(rd_s.base_lin), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(rd_b.base_lin[0]), np.asarray(rd_b.base_lin[1]), atol=1e-6
    )


@pytest.mark.slow
def test_batched_durations_matches_single(quick_cfg):
    """Batched stage-3+4 duration solve == per-sequence solve_physics_durations."""
    cfg = collocation.SolveConfig(
        al_iters_fit=1, al_iters_dyn=1, al_iters_height=1, al_iters_durations=1,
        lm=quick_cfg.lm,
    )
    phys = standing_hop_input(F=20)
    batched, lens = batch_lib.pad_phys_inputs([phys, phys])
    _, rd_b = batch_lib.solve_physics_batch(batched, PhysWeights(), cfg)
    res_b, stats_b, ok_b = batch_lib.solve_physics_durations_batch(
        batched, rd_b, PhysWeights(), cfg
    )
    _, rd_s, _ = collocation.solve_physics(phys, PhysWeights(), cfg)
    res_s, stats_s, ok_s = collocation.solve_physics_durations(
        phys, rd_s, PhysWeights(), cfg
    )
    assert ok_b.shape == (2,)
    assert bool(ok_b[0]) == ok_s and bool(ok_b[1]) == ok_s
    np.testing.assert_allclose(
        np.asarray(res_b.base_lin[0]), np.asarray(res_s.base_lin), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_b.contact[0]), np.asarray(res_s.contact), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(res_b.base_lin[0]), np.asarray(res_b.base_lin[1]), atol=1e-6
    )
    for k, v in stats_b.items():
        assert np.isfinite(np.asarray(v)).all()


@pytest.mark.slow
def test_full_solve_matches_staged(quick_cfg):
    """One-dispatch fused solve (solve_physics_full_batch) == the staged
    solve_physics_batch + solve_physics_durations_batch calls. Same math,
    one traced graph — the fusion exists purely to eliminate the 13
    per-stage host round-trips (BASELINE.md 'physics dispatch anatomy')."""
    cfg = collocation.SolveConfig(
        al_iters_fit=1, al_iters_dyn=1, al_iters_height=1, al_iters_durations=1,
        lm=quick_cfg.lm,
    )
    phys = standing_hop_input(F=20)
    batched, lens = batch_lib.pad_phys_inputs([phys, phys])
    rf_s, rd_s = batch_lib.solve_physics_batch(batched, PhysWeights(), cfg)
    res_s, stats_s, ok_s = batch_lib.solve_physics_durations_batch(
        batched, rd_s, PhysWeights(), cfg
    )
    rf_f, rd_f, res_f, stats_f, ok_f = batch_lib.solve_physics_full_batch(
        batched, PhysWeights(), cfg
    )
    assert list(ok_f) == list(np.asarray(ok_s))
    np.testing.assert_allclose(
        np.asarray(rd_f.base_lin), np.asarray(rd_s.base_lin), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res_f.base_lin), np.asarray(res_s.base_lin), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res_f.contact), np.asarray(res_s.contact), atol=0
    )
    for k in stats_s:
        np.testing.assert_allclose(
            np.asarray(stats_f[k]), np.asarray(stats_s[k]), atol=1e-5
        )


@pytest.mark.slow
def test_batched_physics_ragged_padding(quick_cfg):
    """Sequences of different lengths solve together; trimmed outputs finite."""
    p1 = standing_hop_input(F=20)
    p2 = standing_hop_input(F=14)
    batched, lens = batch_lib.pad_phys_inputs([p1, p2])
    assert batched.base_lin.shape == (2, 20, 3)
    rf, rd = batch_lib.solve_physics_batch(batched, PhysWeights(), quick_cfg)
    outs = batch_lib.unbatch_results(rd, lens)
    assert outs[0].base_lin.shape == (20, 3)
    assert outs[1].base_lin.shape == (14, 3)
    for o in outs:
        assert np.isfinite(o.base_lin).all() and np.isfinite(o.ee_force).all()


@pytest.mark.slow
def test_batched_physics_on_mesh(quick_cfg):
    """Same solve with the batch sharded across the 8-device mesh."""
    mesh = mesh_lib.make_mesh(model=1)
    B = mesh.shape["data"]
    phys = standing_hop_input(F=16)
    batched, lens = batch_lib.pad_phys_inputs([phys] * B)
    rf, rd = batch_lib.solve_physics_batch(batched, PhysWeights(), quick_cfg, mesh=mesh)
    base = np.asarray(rd.base_lin)
    for i in range(1, B):
        np.testing.assert_allclose(base[i], base[0], atol=1e-6)


def test_batched_contact_inference_sharded():
    """Contact detection over a mesh-sharded video batch equals unsharded."""
    from chd_tpu.contact.infer import ContactDetector
    from chd_tpu.models import contact_mlp

    params, state = contact_mlp.init(jax.random.PRNGKey(0), contact_mlp.ModelConfig())
    det = ContactDetector(params, state, use_pallas=False)
    rng = np.random.default_rng(0)
    kp = rng.uniform(0, 5, size=(8, 40, 25, 3)).astype(np.float32)

    plain = det.detect_batch(kp)

    mesh = mesh_lib.make_mesh(model=1)
    sharded_in = mesh_lib.shard_batch(mesh, jnp.asarray(kp))
    sharded_out, _ = det._batched(sharded_in, det.folded)
    np.testing.assert_array_equal(np.asarray(sharded_out), np.stack(plain))
