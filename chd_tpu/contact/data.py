"""Synthetic Mixamo contact dataset.

Loads the reference's synthetic training set layout
(Character/Motion/{foot_contacts.npy, viewN/, keypoints_viewN/,
viewN_camera_params.npz} — documented at
src/contact_learning/data/contact_data_utils.py:8-30) into padded device
arrays. Replaces the torch Dataset/DataLoader stack
(openpose_dataset.py:123-386) with an all-on-device design: every sequence
is preprocessed once at load; training windows are gathered on device each
step (no worker processes, no per-item python).

Split semantics match the reference exactly (openpose_dataset.py:217-238):
per-character motion-level 80/10/10 train/test/val with ``np.random.seed(0)``
shuffling, and the pixel normalization constant is the median hip→toe
distance over the FULL dataset before splitting (:368-382, computed at :212).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..characters.defs import OP_JOINT_SUBSETS, OP_ROOT_JOINT
from ..ingest import openpose
from ..ops import gapfill, windows


def character_paths(root: str) -> List[str]:
    return sorted(
        os.path.join(root, f)
        for f in os.listdir(root)
        if os.path.isdir(os.path.join(root, f)) and not f.startswith(".")
    )


def motion_paths(character_dir: str) -> List[str]:
    return sorted(
        os.path.join(character_dir, f)
        for f in os.listdir(character_dir)
        if os.path.isdir(os.path.join(character_dir, f)) and not f.startswith(".")
    )


def view_names(motion_dir: str) -> List[str]:
    return sorted(
        f
        for f in os.listdir(motion_dir)
        if os.path.isdir(os.path.join(motion_dir, f)) and f.startswith("view")
    )


def motion_vid_paths(motion_dir: str) -> List[str]:
    """Rendered view videos <motion>_<view>.mp4 (contact_data_utils:91-103)."""
    name = os.path.basename(os.path.abspath(motion_dir))
    return [
        os.path.join(motion_dir, f"{name}_{v}.mp4") for v in view_names(motion_dir)
    ]


def cam_param_paths(motion_dir: str) -> List[str]:
    """Per-view camera parameter files viewN_camera_params.npz
    (contact_data_utils:116-126)."""
    return [
        os.path.join(motion_dir, f"{v}_camera_params.npz")
        for v in view_names(motion_dir)
    ]


def load_cam_params(paths: Sequence[str]) -> List:
    """Load {P, RT, K} npz dicts, None for missing (contact_data_utils:138-149)."""
    return [np.load(p) if os.path.exists(p) else None for p in paths]


def frame_paths(view_dir: str) -> List[str]:
    """Rendered frame images of one view (contact_data_utils:223-232)."""
    if not os.path.isdir(view_dir):
        return []
    return sorted(
        os.path.join(view_dir, f)
        for f in os.listdir(view_dir)
        if not f.startswith(".") and f.rsplit(".", 1)[-1] in ("png", "jpg", "jpeg")
    )


def reference_split(
    num_characters: int, num_motions: int, num_views: int, train_frac: float = 0.8
) -> Tuple[List[int], List[int], List[int]]:
    """(train, test, val) global sequence indices, bit-identical to
    openpose_dataset.py:217-238."""
    rng_state = np.random.get_state()
    np.random.seed(0)
    try:
        split_inds: List[List[int]] = [[], [], []]
        per_char = num_motions * num_views
        for c in range(num_characters):
            inds = np.arange(num_motions)
            np.random.shuffle(inds)
            train_size = int(train_frac * num_motions)
            test_size = (num_motions - train_size) // 2
            groups = (
                inds[:train_size],
                inds[train_size : train_size + test_size],
                inds[train_size + test_size :],
            )
            base = c * per_char
            for i, g in enumerate(groups):
                for m in g:
                    split_inds[i] += list(range(base + m * num_views, base + m * num_views + num_views))
        return split_inds[0], split_inds[1], split_inds[2]
    finally:
        np.random.set_state(rng_state)


@dataclasses.dataclass
class ContactDataset:
    """All sequences as stacked arrays + split index lists."""

    op_data: np.ndarray       # (N, F, 25, 3) gap-filled, normalized
    contacts: np.ndarray      # (N, F, 4)
    normalization: float
    splits: Dict[str, List[int]]
    num_frames: int
    names: List[str]

    @classmethod
    def load(
        cls,
        root: str,
        conf_thresh: float = 0.2,
        train_frac: float = 0.8,
    ) -> "ContactDataset":
        chars = character_paths(root)
        if not chars:
            raise FileNotFoundError(f"no character dirs under {root}")
        motions_per_char = len(motion_paths(chars[0]))

        seqs, labels, names = [], [], []
        num_views = None
        for cdir in chars:
            for mdir in motion_paths(cdir):
                vnames = view_names(mdir)
                if num_views is None:
                    num_views = len(vnames)
                contact = np.load(os.path.join(mdir, "foot_contacts.npy"))
                for v in vnames:
                    kp = openpose.load_keypoint_dir(os.path.join(mdir, f"keypoints_{v}"))
                    seqs.append(kp)
                    labels.append(contact)
                    names.append(f"{os.path.basename(cdir)}/{os.path.basename(mdir)}/{v}")

        expected = len(chars) * motions_per_char * (num_views or 0)
        if len(seqs) != expected:
            raise ValueError(
                f"ragged dataset: found {len(seqs)} sequences but "
                f"{len(chars)} characters × {motions_per_char} motions × "
                f"{num_views} views = {expected}; the reference split "
                "(openpose_dataset.py:217-238) requires a regular grid"
            )
        op = np.stack(seqs).astype(np.float32)          # (N, F, 25, 3)
        contacts = np.stack(labels).astype(np.float32)  # (N, F, 4)

        # normalization over the FULL dataset, before splits
        midhip = op[:, :, 8, :2]
        ltoe = op[:, :, 19, :2]
        normalization = float(np.median(np.linalg.norm(midhip - ltoe, axis=-1)))

        train, test, val = reference_split(len(chars), motions_per_char, num_views, train_frac)

        # preprocess once, batched on device
        proc = jax.vmap(lambda x: gapfill.preprocess_keypoints(x, conf_thresh, normalization))(
            jnp.asarray(op)
        )
        return cls(
            op_data=np.asarray(proc),
            contacts=contacts,
            normalization=normalization,
            splits={"train": train, "test": test, "val": val},
            num_frames=op.shape[1],
            names=names,
        )

    def split_arrays(self, split: str) -> Tuple[np.ndarray, np.ndarray]:
        idx = self.splits[split]
        return self.op_data[idx], self.contacts[idx]


# ---------------------------------------------------------------------------
# on-device window sampling / featurization
# ---------------------------------------------------------------------------


def sample_train_windows(
    rng: jax.Array,
    op_data,
    contacts,
    window_size: int,
    pred_size: int,
    joint_subset: Sequence[int],
    noise_dev: float = 0.005,
    use_confidence: bool = True,
):
    """One random window per sequence (the reference's train __getitem__,
    openpose_dataset.py:287-294 + noise :343-346), fully on device.

    op_data: (B, F, 25, 3); returns (feats (B, W, J, C), labels (B, P, 4)).
    """
    B, F = op_data.shape[0], op_data.shape[1]
    half = window_size // 2
    k_tgt, k_noise = jax.random.split(rng)
    tgt = jax.random.randint(k_tgt, (B,), half, F - half)  # [half, F-half)
    starts = tgt - half
    offs = jnp.arange(window_size)
    fidx = starts[:, None] + offs[None, :]  # (B, W)
    win = jnp.take_along_axis(op_data, fidx[:, :, None, None], axis=1)
    win = windows.root_normalize_windows(win, OP_ROOT_JOINT)
    win = win[:, :, jnp.asarray(list(joint_subset)), :]
    noise = noise_dev * jax.random.normal(k_noise, win[..., :2].shape, win.dtype)
    win = win.at[..., :2].add(noise)
    if not use_confidence:
        win = win[..., :2]

    off = (window_size - pred_size) // 2
    lidx = starts[:, None] + off + jnp.arange(pred_size)[None, :]
    labels = jnp.take_along_axis(contacts, lidx[:, :, None], axis=1)
    return win, labels


def eval_windows(
    op_data,
    contacts,
    window_size: int,
    pred_size: int,
    joint_subset: Sequence[int],
    overlap: bool = False,
    use_confidence: bool = True,
):
    """Deterministic val/test windows (openpose_dataset.py:296-313).

    Non-overlapping: windows at starts 0, W, 2W, … (F//W per sequence);
    overlapping: every valid start. Returns (feats (B·n, W, J, C),
    labels (B·n, P, 4)).
    """
    B, F = op_data.shape[0], op_data.shape[1]
    if overlap:
        starts = jnp.arange(windows.num_windows(F, window_size))
    else:
        starts = jnp.arange(F // window_size) * window_size
    offs = jnp.arange(window_size)
    fidx = starts[:, None] + offs[None, :]  # (n, W)

    win = op_data[:, fidx]  # (B, n, W, 25, 3)
    win = win.reshape((-1,) + win.shape[2:])
    win = windows.root_normalize_windows(win, OP_ROOT_JOINT)
    win = win[:, :, jnp.asarray(list(joint_subset)), :]
    if not use_confidence:
        win = win[..., :2]

    off = (window_size - pred_size) // 2
    lidx = starts[:, None] + off + jnp.arange(pred_size)[None, :]
    labels = contacts[:, lidx].reshape(-1, pred_size, contacts.shape[-1])
    return win, labels
