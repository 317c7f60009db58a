"""Contact-duration optimization (physics stage 3) tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from chd_tpu.kinematics.lm import LMConfig
from chd_tpu.physics import collocation, durations as dur_lib
from chd_tpu.physics.types import PhysWeights

from test_physics_solve import standing_hop_input


def walking_contact(F=40):
    """Alternating stance/swing schedule for 4 EEs."""
    c = np.ones((4, F))
    c[0, 10:18] = 0  # left toe swing
    c[2, 8:16] = 0   # left heel swing
    c[1, 25:33] = 0  # right toe swing
    c[3, 23:31] = 0  # right heel swing
    return c


def test_duration_spec_roundtrip():
    dt = 1 / 30
    c = walking_contact()
    spec = dur_lib.build_duration_spec(c, dt)
    # total time parity across EEs (parameters.cpp:147-151 assert)
    sums = np.asarray((spec.durations * spec.phase_mask).sum(axis=1))
    np.testing.assert_allclose(sums, sums[0], atol=1e-6)
    # rasterizing the initial durations reproduces the binary schedule
    back = np.asarray(dur_lib.rasterize(spec.durations, spec, c.shape[1], jnp.asarray(dt)))
    np.testing.assert_array_equal(back, c)


def test_soft_contact_matches_hard_at_init():
    dt = 1 / 30
    c = walking_contact()
    spec = dur_lib.build_duration_spec(c, dt)
    soft = np.asarray(dur_lib.soft_contact(spec.durations, spec, c.shape[1], jnp.asarray(dt)))
    # interior frames saturate; transition frames may be fractional
    agree = (soft > 0.5) == (c > 0.5)
    assert agree.mean() > 0.95


def test_duration_residuals_zero_at_init():
    dt = 1 / 30
    spec = dur_lib.build_duration_spec(walking_contact(), dt)
    r = dur_lib.duration_residuals(spec.durations, spec, w_dur=0.1)
    assert float(jnp.abs(r).max()) < 1e-5


@pytest.mark.slow
def test_stage3_solve_runs_and_reports():
    phys = standing_hop_input(F=30)
    # make a schedule with real swing phases so durations are meaningful
    c = np.ones((4, 30))
    c[0, 12:18] = 0
    c[2, 12:18] = 0
    phys = phys._replace(contact=jnp.asarray(c, jnp.float32))
    cfg = collocation.SolveConfig(
        al_iters_fit=1, al_iters_dyn=1, al_iters_height=1, al_iters_durations=1,
        lm=LMConfig(max_iters=6, cg_iters=20, init_lambda=1e-2),
    )
    _, res_dyn, stats2 = collocation.solve_physics(phys, PhysWeights(), cfg)
    res3, stats3, ok = collocation.solve_physics_durations(phys, res_dyn, PhysWeights(), cfg)

    assert isinstance(ok, bool)
    contact = np.asarray(res3.contact)
    assert contact.shape == (4, 30)
    assert set(np.unique(contact)).issubset({0.0, 1.0})
    # schedule stays close to the initialization (duration cost pulls back)
    drift = np.abs(contact - c).mean()
    assert drift < 0.3, drift
    assert np.isfinite(list(v for v in stats3.values())).all()
