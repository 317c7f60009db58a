"""CG solver option for the IK matches the exact-LU path closely."""
import numpy as np
import jax.numpy as jnp

from chd_tpu.core import fk, quat
from chd_tpu.core.animation import Animation
from chd_tpu.kinematics.ik import IKConfig, solve_ck_ik


def test_cg_solver_matches_lu():
    rng = np.random.default_rng(3)
    parents = (-1, 0, 1, 2, 3, 4, 5, 6, 7, 8)
    J, F = 10, 6
    offsets = np.zeros((J, 3)); offsets[1:, 0] = 1.0
    es = rng.uniform(-0.2, 0.2, size=(F, J, 3))
    rot = np.asarray(quat.from_euler(jnp.asarray(es), "xyz", world=True))
    pos = np.broadcast_to(offsets[None], (F, J, 3)).copy()
    orients = np.zeros((J, 4)); orients[:, 0] = 1
    anim = Animation(rot, pos, orients, offsets, parents)

    gp = np.asarray(fk.positions_global(jnp.asarray(rot), jnp.asarray(pos), parents))
    targets = {J - 1: gp[:, J - 1] + 0.3, 4: gp[:, 4] - 0.1}

    lu = solve_ck_ik(anim, targets, IKConfig(iterations=20, damping=3.0, solver="lu"))
    cg = solve_ck_ik(
        anim, targets, IKConfig(iterations=20, damping=3.0, solver="cg", cg_iters=60)
    )
    gp_lu = np.asarray(fk.positions_global(
        jnp.asarray(lu.rotations), jnp.asarray(lu.positions), parents))
    gp_cg = np.asarray(fk.positions_global(
        jnp.asarray(cg.rotations), jnp.asarray(cg.positions), parents))
    assert np.abs(gp_lu - gp_cg).max() < 5e-3, np.abs(gp_lu - gp_cg).max()

    # CG tracks LU's target errors (damped LS doesn't fully reach targets in
    # 20 iterations; what matters is the two solvers agree)
    for t, v in targets.items():
        e_lu = np.linalg.norm(gp_lu[:, t] - v, axis=-1).max()
        e_cg = np.linalg.norm(gp_cg[:, t] - v, axis=-1).max()
        assert abs(e_lu - e_cg) < 5e-3, (e_lu, e_cg)
