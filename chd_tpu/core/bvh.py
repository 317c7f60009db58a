"""BVH load/save (host-side, numpy).

Format-compatible with the reference's parser/writer
(src/skeleton_fitting/ik/BVH.py:25-169 load, :173-288 save) so artifacts are
interchangeable: the saver emits the exact same layout (6-channel root,
3-channel joints, 'zyx' channel order by default, End Sites with zero
offsets, "%f" formatting), and the loader accepts files written by either
implementation (including Mixamo "name:name" joint names).

Implementation is a fresh tokenizer-based parser — structure-first, then one
vectorized pass over the motion block — rather than a per-line regex loop.
"""
from __future__ import annotations

import re
from typing import List, Optional, Tuple

import numpy as np

from .animation import Animation
from . import quat as jquat
import jax.numpy as jnp

_CHANNEL_AXIS = {"Xrotation": "x", "Yrotation": "y", "Zrotation": "z"}
_AXIS_CHANNEL = {v: k for k, v in _CHANNEL_AXIS.items()}
_AXIS_COL = {"x": 0, "y": 1, "z": 2}


def load(path: str, order: Optional[str] = None, world: bool = False):
    """Load a BVH file.

    Returns (Animation [numpy leaves], names, frametime). Euler→quaternion
    conversion matches the reference: ``from_euler(radians(vals), order,
    world)`` where ``order`` comes from the file's rotation-channel order.
    """
    with open(path, "r") as f:
        text = f.read()

    if "MOTION" not in text or "HIERARCHY" not in text:
        raise ValueError(f"{path!r} is not a BVH file (missing HIERARCHY/MOTION)")
    hierarchy_src, motion_src = re.split(r"MOTION", text, maxsplit=1)

    names: List[str] = []
    parents: List[int] = []
    offsets: List[List[float]] = []
    chans_per_joint: List[int] = []

    stack: List[int] = []
    end_site = False
    file_order = order

    for raw in hierarchy_src.splitlines():
        line = raw.strip()
        if not line or line == "HIERARCHY":
            continue
        m = re.match(r"(ROOT|JOINT)\s+([\w:.\-]+)", line)
        if m:
            names.append(m.group(2))
            parents.append(stack[-1] if stack else -1)
            offsets.append([0.0, 0.0, 0.0])
            chans_per_joint.append(0)
            continue
        if line.startswith("End Site"):
            end_site = True
            continue
        if line == "{":
            if not end_site:
                stack.append(len(names) - 1)
            else:
                stack.append(-2)  # sentinel for end-site scope
            continue
        if line == "}":
            stack.pop()
            if end_site:
                end_site = False
            continue
        if line.startswith("OFFSET"):
            if not end_site:
                offsets[stack[-1]] = [float(x) for x in line.split()[1:4]]
            continue
        if line.startswith("CHANNELS"):
            parts = line.split()
            n = int(parts[1])
            chans_per_joint[stack[-1]] = n
            if file_order is None:
                rot_parts = [p for p in parts[2:] if p in _CHANNEL_AXIS]
                if len(rot_parts) == 3:
                    file_order = "".join(_CHANNEL_AXIS[p] for p in rot_parts)
            continue

    J = len(names)
    parents_arr = np.asarray(parents, dtype=int)
    offsets_arr = np.asarray(offsets, dtype=np.float64)

    motion_lines = [ln for ln in motion_src.splitlines() if ln.strip()]
    frames = None
    frametime = 1.0 / 30.0
    data_rows: List[np.ndarray] = []
    for ln in motion_lines:
        s = ln.strip()
        if s.startswith("Frames:"):
            frames = int(s.split(":")[1])
            continue
        if s.startswith("Frame Time:"):
            frametime = float(s.split(":")[1])
            continue
        data_rows.append(np.array(s.split(), dtype=np.float64))
    data = np.stack(data_rows, axis=0)
    F = data.shape[0]
    if frames is not None and frames < F:
        data = data[:frames]
        F = frames

    positions = np.broadcast_to(offsets_arr[None], (F, J, 3)).copy()
    eulers = np.zeros((F, J, 3))

    col = 0
    for j in range(J):
        n = chans_per_joint[j]
        if n == 6:
            positions[:, j] = data[:, col : col + 3]
            eulers[:, j] = data[:, col + 3 : col + 6]
            col += 6
        elif n == 3:
            eulers[:, j] = data[:, col : col + 3]
            col += 3
        elif n != 0:
            raise ValueError(f"unsupported channel count {n} at joint {j}")

    rotations = np.asarray(
        jquat.from_euler(jnp.asarray(np.radians(eulers)), order=file_order, world=world)
    )
    orients = np.zeros((J, 4))
    orients[:, 0] = 1.0

    anim = Animation(rotations, positions, orients, offsets_arr, parents_arr)
    return anim, names, frametime


def save(
    path: str,
    anim,
    names: Optional[List[str]] = None,
    frametime: float = 1.0 / 24.0,
    order: str = "zyx",
    positions: bool = False,
):
    """Write a BVH file in the reference layout (BVH.py save, :173-253).

    Rotations are serialized as ``degrees(to_euler(q, order[::-1]))`` with the
    three values written in the file's channel order — byte-level-compatible
    with reference output for the same animation.
    """
    rot = np.asarray(anim.rotations)
    pos = np.asarray(anim.positions)
    offsets = np.asarray(anim.offsets)
    parents = list(anim.parents)
    F, J = rot.shape[0], rot.shape[1]
    if names is None:
        names = [f"joint_{i}" for i in range(J)]

    children = [[] for _ in range(J)]
    for j in range(1, J):
        children[parents[j]].append(j)

    lines: List[str] = []

    def fmt3(v):
        return "%f %f %f" % (v[0], v[1], v[2])

    def write_joint(j: int, depth: int):
        t = "\t" * depth
        lines.append(f"{t}JOINT {names[j]}")
        lines.append(f"{t}{{")
        t2 = "\t" * (depth + 1)
        lines.append(f"{t2}OFFSET {fmt3(offsets[j])}")
        chan = " ".join(_AXIS_CHANNEL[a] for a in order)
        if positions:
            lines.append(f"{t2}CHANNELS 6 Xposition Yposition Zposition {chan} ")
        else:
            lines.append(f"{t2}CHANNELS 3 {chan}")
        if children[j]:
            for c in children[j]:
                write_joint(c, depth + 1)
        else:
            lines.append(f"{t2}End Site")
            lines.append(f"{t2}{{")
            lines.append("\t" * (depth + 2) + "OFFSET %f %f %f" % (0.0, 0.0, 0.0))
            lines.append(f"{t2}}}")
        lines.append(f"{t}}}")

    lines.append("HIERARCHY")
    lines.append(f"ROOT {names[0]}")
    lines.append("{")
    chan = " ".join(_AXIS_CHANNEL[a] for a in order)
    lines.append(f"\tOFFSET {fmt3(offsets[0])}")
    lines.append(f"\tCHANNELS 6 Xposition Yposition Zposition {chan} ")
    for c in children[0]:
        write_joint(c, 1)
    lines.append("}")

    lines.append("MOTION")
    lines.append(f"Frames: {F}")
    lines.append("Frame Time: %f" % frametime)

    eul = np.degrees(np.asarray(jquat.to_euler(jnp.asarray(rot), order=order[::-1])))
    cols = [_AXIS_COL[a] for a in order]
    for i in range(F):
        parts = []
        for j in range(J):
            if positions or j == 0:
                parts.append(
                    "%f %f %f %f %f %f " % (
                        pos[i, j, 0], pos[i, j, 1], pos[i, j, 2],
                        eul[i, j, cols[0]], eul[i, j, cols[1]], eul[i, j, cols[2]],
                    )
                )
            else:
                parts.append(
                    "%f %f %f " % (eul[i, j, cols[0]], eul[i, j, cols[1]], eul[i, j, cols[2]])
                )
        lines.append("".join(parts))

    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
