"""ICP mesh-fitting IK behavioral test."""
import numpy as np
import jax.numpy as jnp

from chd_tpu.core.animation import Animation
from chd_tpu.core import quat
from chd_tpu.core.skinning import skin
from chd_tpu.kinematics.icp import solve_icp
from chd_tpu.kinematics.ik import IKConfig


def test_icp_recovers_pose():
    rng = np.random.default_rng(0)
    parents = (-1, 0, 1, 2)
    J, F, V = 4, 2, 12
    offsets = np.zeros((J, 3)); offsets[1:, 0] = 1.0
    orients = np.zeros((J, 4)); orients[:, 0] = 1
    rest_rot = np.tile([1.0, 0, 0, 0], (F, J, 1))
    rest_pos = np.broadcast_to(offsets[None], (F, J, 3)).copy()
    rest = Animation(rest_rot, rest_pos, orients, offsets, parents)

    # mesh points along the chain, each owned by the nearest joint
    mesh = np.zeros((V, 3))
    mesh[:, 0] = np.linspace(0.2, 3.2, V)
    mesh[:, 1] = 0.05
    weights = np.zeros((V, J))
    own = np.clip(mesh[:, 0].astype(int), 0, J - 1)
    weights[np.arange(V), own] = 1.0

    # ground-truth pose + its skinned cloud as the goal
    es = rng.uniform(-0.25, 0.25, size=(F, J, 3))
    rot_true = np.asarray(quat.from_euler(jnp.asarray(es), "xyz", world=True))
    posed = rest.replace(rotations=jnp.asarray(rot_true))
    goal = np.asarray(skin(posed, rest, weights, mesh, maxjoints=1))

    fitted = solve_icp(
        rest, rest, weights, mesh, goal,
        cfg=IKConfig(iterations=25, damping=3.0, translate=False),
        maxjoints=1, find_closest=False,
    )
    got = np.asarray(skin(fitted, rest, weights, mesh, maxjoints=1))
    err = np.linalg.norm(got - goal, axis=-1).mean()
    assert err < 0.05, err
