"""Skeleton structure utilities.

Static (host-side) graph helpers over a ``parents`` array — the jnp-free
equivalent of the reference's src/skeleton_fitting/ik/AnimationStructure.py.
``parents`` is always a topologically-ordered tree (parents[i] < i, root has
parent -1), which the reference FK also relies on (Animation.py:379-413).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


def children_list(parents) -> list:
    """children_list(parents)[j] = array of direct children of joint j."""
    parents = np.asarray(parents)
    return [np.where(parents == j)[0] for j in range(len(parents))]


def descendants_mask(parents) -> np.ndarray:
    """(J, J) float mask; m[i, j] = 1 iff j is a strict descendant of i.

    Drives the IK Jacobians exactly like the reference's
    AnimationStructure.descendants_mask (:217).
    """
    parents = np.asarray(parents)
    J = len(parents)
    mask = np.zeros((J, J))
    for j in range(J):
        p = parents[j]
        while p >= 0:
            mask[p, j] = 1.0
            p = parents[p]
    return mask


def ancestors_mask(parents) -> np.ndarray:
    return descendants_mask(parents).T


def joint_chain_ascend(parents, start: int, end: int) -> np.ndarray:
    """Chain of joints walking up from ``start`` until hitting ``end``."""
    parents = np.asarray(parents)
    chain = [start]
    while chain[-1] != end:
        chain.append(int(parents[chain[-1]]))
    return np.array(chain, dtype=int)


def validate_topological(parents) -> None:
    parents = np.asarray(parents)
    if parents[0] != -1:
        raise ValueError("joint 0 must be the root (parent -1)")
    if np.any(parents[1:] >= np.arange(1, len(parents))):
        raise ValueError("parents must be topologically ordered (parents[i] < i)")


@dataclasses.dataclass(frozen=True)
class Skeleton:
    """Static skeleton metadata (hashable, safe to close over in jit).

    offsets/orients carry the rest pose (BVH OFFSET lines and joint
    orientations); ``names`` is optional labeling.
    """

    parents: Tuple[int, ...]
    offsets: np.ndarray  # (J, 3) rest-pose local offsets
    orients: np.ndarray  # (J, 4) rest-pose orientations (wxyz)
    names: Tuple[str, ...] = ()

    def __post_init__(self):
        validate_topological(self.parents)

    @property
    def num_joints(self) -> int:
        return len(self.parents)
