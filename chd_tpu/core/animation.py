"""Animation container as a JAX pytree.

The functional replacement for the reference's mutable ``Animation`` class
(src/skeleton_fitting/ik/Animation.py:9-37): per-frame local rotations
(F, J, 4 wxyz) and local translations (F, J, 3), rest-pose orients/offsets,
plus a *static* parents tuple so the structure is part of the jit cache key.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import quat


@jax.tree_util.register_pytree_node_class
class Animation:
    def __init__(self, rotations, positions, orients, offsets, parents):
        self.rotations = rotations  # (F, J, 4) local joint rotations, wxyz
        self.positions = positions  # (F, J, 3) local joint translations
        self.orients = orients      # (J, 4) rest orientations
        self.offsets = offsets      # (J, 3) rest offsets
        self.parents = tuple(int(p) for p in parents)  # static

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (
            (self.rotations, self.positions, self.orients, self.offsets),
            self.parents,
        )

    @classmethod
    def tree_unflatten(cls, parents, leaves):
        rotations, positions, orients, offsets = leaves
        obj = cls.__new__(cls)
        obj.rotations = rotations
        obj.positions = positions
        obj.orients = orients
        obj.offsets = offsets
        obj.parents = parents
        return obj

    # -- conveniences --------------------------------------------------------
    @property
    def shape(self) -> Tuple[int, int]:
        return (self.rotations.shape[0], self.rotations.shape[1])

    @property
    def num_frames(self) -> int:
        return self.rotations.shape[0]

    @property
    def num_joints(self) -> int:
        return self.rotations.shape[1]

    def replace(self, **kw) -> "Animation":
        fields = dict(
            rotations=self.rotations,
            positions=self.positions,
            orients=self.orients,
            offsets=self.offsets,
            parents=self.parents,
        )
        fields.update(kw)
        return Animation(**fields)

    def slice_frames(self, start: int, end: int) -> "Animation":
        return self.replace(
            rotations=self.rotations[start:end], positions=self.positions[start:end]
        )

    def copy(self) -> "Animation":
        return self.replace()

    @classmethod
    def rest_pose(cls, skeleton, num_frames: int, dtype=jnp.float32) -> "Animation":
        """Animation standing at the rest pose of a ``core.skeleton.Skeleton``."""
        J = skeleton.num_joints
        offsets = jnp.asarray(skeleton.offsets, dtype=dtype)
        orients = jnp.asarray(skeleton.orients, dtype=dtype)
        rotations = jnp.broadcast_to(
            quat.identity((J,), dtype=dtype), (num_frames, J, 4)
        )
        positions = jnp.broadcast_to(offsets, (num_frames, J, 3))
        return cls(rotations, positions, orients, offsets, skeleton.parents)

    def to_numpy(self) -> "Animation":
        return Animation(
            np.asarray(self.rotations),
            np.asarray(self.positions),
            np.asarray(self.orients),
            np.asarray(self.offsets),
            self.parents,
        )
