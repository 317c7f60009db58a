"""Behavioral tests of the collocation physics solver (BASELINE config #4
shape): a kinematically-plausible but dynamically-inconsistent input motion
must come out dynamics-consistent, on-terrain, and friction-feasible."""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from chd_tpu.kinematics.lm import LMConfig
from chd_tpu.physics import collocation, srbd
from chd_tpu.physics.types import GRAVITY, PhysInput, PhysWeights


def standing_hop_input(F=40, dt=1.0 / 30.0):
    """Standing with a mid-sequence COM dip (squat) — all feet planted."""
    t = np.linspace(0, 1, F)
    com_z = 1.0 - 0.08 * np.exp(-((t - 0.5) ** 2) / 0.02)
    base_lin = np.stack([np.zeros(F), np.zeros(F), com_z], axis=1)
    base_ang = np.zeros((F, 3))
    feet_xy = np.array([[0.15, 0.1], [-0.15, 0.1], [0.15, -0.1], [-0.15, -0.1]])
    ee = np.zeros((4, F, 3))
    ee[:, :, 0] = feet_xy[:, 0:1]
    ee[:, :, 1] = feet_xy[:, 1:2]
    contact = np.ones((4, F))
    inertia = np.tile(np.eye(3) * 8.0, (F, 1, 1))
    return PhysInput(
        dt=jnp.asarray(dt, jnp.float32),
        base_lin=jnp.asarray(base_lin, jnp.float32),
        base_ang=jnp.asarray(base_ang, jnp.float32),
        ee_pos=jnp.asarray(ee, jnp.float32),
        contact=jnp.asarray(contact, jnp.float32),
        left_hip=jnp.asarray(np.tile([0.1, 0.1, -0.1], (F, 1)), jnp.float32),
        right_hip=jnp.asarray(np.tile([-0.1, 0.1, -0.1], (F, 1)), jnp.float32),
        inertia=jnp.asarray(inertia, jnp.float32),
        mass=jnp.asarray(73.0, jnp.float32),
        max_leg_length=jnp.asarray(1.2, jnp.float32),
        max_heel_length=jnp.asarray(1.15, jnp.float32),
        heel_dist=jnp.asarray(0.2, jnp.float32),
        floor_normal=jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
        floor_point=jnp.zeros(3, jnp.float32),
    )


@pytest.fixture(scope="module")
def solved():
    phys = standing_hop_input()
    cfg = collocation.SolveConfig(
        al_iters_fit=2, al_iters_dyn=3, al_iters_height=2,
        lm=LMConfig(max_iters=20, cg_iters=50, init_lambda=1e-2),
    )
    return phys, *collocation.solve_physics(phys, PhysWeights(), cfg)


def test_dynamics_satisfied(solved):
    phys, res_fit, res_dyn, stats = solved
    # Newton–Euler violation small (IPOPT tol is 1e-3; allow a bit more
    # headroom for the penalty formulation on interior frames)
    viol = srbd.dynamic_violation(
        res_dyn.base_lin, res_dyn.base_ang, res_dyn.ee_pos,
        res_dyn.ee_force / jnp.maximum(phys.contact[..., None], 1e-9),
        phys.contact, phys.inertia, phys.mass, -phys.floor_normal, phys.dt,
    )
    interior = np.asarray(viol)[2:-2]
    assert np.abs(interior).mean() < 10.0, np.abs(interior).mean()  # N / N·m

    # average vertical force ≈ weight while standing
    fz = np.asarray(res_dyn.ee_force)[:, 2:-2, 2].sum(axis=0)
    assert abs(fz.mean() - 73.0 * GRAVITY) < 60.0, fz.mean()


def test_feet_stay_on_terrain(solved):
    phys, res_fit, res_dyn, stats = solved
    h = np.asarray(res_dyn.ee_pos)[..., 2]
    assert np.abs(h).max() < 0.01, np.abs(h).max()  # contact: on the floor


def test_no_slip(solved):
    phys, _, res_dyn, stats = solved
    d = np.abs(np.diff(np.asarray(res_dyn.ee_pos), axis=1)).max()
    assert d < 0.01, d


def test_friction_cone(solved):
    phys, _, res_dyn, stats = solved
    f = np.asarray(res_dyn.ee_force)
    fn = f[..., 2]
    assert fn.min() > -5.0, fn.min()  # no pulling on the ground
    ft = np.linalg.norm(f[..., :2], axis=-1)
    # cone satisfied (small tolerance for penalty method)
    assert (ft - collocation.FRICTION * np.maximum(fn, 0) < 5.0).all()


def test_com_tracks_input(solved):
    phys, _, res_dyn, stats = solved
    err = np.linalg.norm(np.asarray(res_dyn.base_lin - phys.base_lin), axis=-1)
    assert err.mean() < 0.05, err.mean()  # meters


def test_stats_reported(solved):
    _, _, _, stats = solved
    assert set(stats) == {"dyn", "leg", "heel", "terrain", "slip", "force", "height"}
