"""Unified typed configuration tree.

Replaces the reference's three uncoordinated config layers (SURVEY §5):
per-script argparse (e.g. train.py:15-42), C++ gflags (phys_optim.cpp:23-31),
and scattered hardcoded constants (optimization weights, camera intrinsics,
normalization constants). One dataclass tree, JSON round-trip, dotted-path
CLI overrides.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional, Tuple


@dataclasses.dataclass
class ContactConfig:
    window_size: int = 9
    pred_size: int = 5
    joint_set: str = "lower"
    use_confidence: bool = True
    classify_thresh: float = 0.5
    conf_thresh: float = 0.2
    weights_npz: Optional[str] = None  # converted checkpoint
    weights_pth: Optional[str] = None  # torch checkpoint (converted on load)
    train_dim: Tuple[int, int] = (1280, 720)
    normalization: float = 200.4160302695367  # real_video_dataset.py:18


@dataclasses.dataclass
class KinematicConfig:
    # camera (kinematic_optimizer.py:23-28)
    focal: Tuple[float, float] = (2000.0, 2000.0)
    pp: Tuple[float, float] = (960.0, 540.0)
    ik_iterations: int = 200
    lm_iters: int = 50
    cg_iters: int = 100
    use_gt_floor: bool = False
    skel_path: Optional[str] = None  # combined template BVH
    # shard the FRAME axis of the LM stages over all devices when a single
    # sequence reaches this many frames (parallel/longseq.py); 0 disables.
    frame_shard_threshold: int = 0


@dataclasses.dataclass
class PhysicsConfig:
    # pipeline weights (run_phys_mocap.py:33-44)
    w_com_lin: float = 0.4
    w_com_ang: float = 1.7
    w_ee: float = 0.3
    w_smooth: float = 0.1
    w_dur: float = 0.1
    al_iters_fit: int = 2
    al_iters_dyn: int = 3
    al_iters_height: int = 3
    al_iters_durations: int = 2
    optimize_durations: bool = True
    lm_iters: int = 30
    cg_iters: int = 60
    # violation thresholds standing in for IPOPT's return status when
    # writing success_log.txt (phys_optim.cpp:655,709)
    dyn_tol: float = 5.0
    kin_tol: float = 0.05


@dataclasses.dataclass
class PipelineConfig:
    character: str = "ybot"
    fps: float = 30.0
    # probe the true fps from the clip in each video dir (run_phys_mocap.py:
    # 88-89); fps above is the fallback when no clip is present
    probe_fps: bool = True
    image_dims: Tuple[int, int] = (1920, 1080)
    contact: ContactConfig = dataclasses.field(default_factory=ContactConfig)
    kinematic: KinematicConfig = dataclasses.field(default_factory=KinematicConfig)
    physics: PhysicsConfig = dataclasses.field(default_factory=PhysicsConfig)

    # -- serialization ---------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "PipelineConfig":
        return _from_dict(cls, json.loads(text))

    def override(self, **dotted: Any) -> "PipelineConfig":
        """Apply dotted-path overrides: cfg.override(**{"physics.w_ee": 0.5})."""
        d = dataclasses.asdict(self)
        for key, val in dotted.items():
            node = d
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            if parts[-1] not in node:
                raise KeyError(f"unknown config key {key!r}")
            node[parts[-1]] = val
        return _from_dict(type(self), d)


def _from_dict(cls, d):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
            kwargs[f.name] = _from_dict(f.type, v)
        elif f.name in ("contact", "kinematic", "physics"):
            sub = {"contact": ContactConfig, "kinematic": KinematicConfig, "physics": PhysicsConfig}[f.name]
            kwargs[f.name] = _from_dict(sub, v)
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)
