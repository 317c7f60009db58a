"""Command-line interface: ``python -m chd_tpu.pipeline <command>``.

One CLI replaces the reference's five argparse scripts (scripts/*.py) and
the gflags C++ binary. Every stage is runnable standalone against the same
on-disk layout, like the reference (README.md:100).
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def _add_config_args(p):
    p.add_argument("--config", help="JSON config file (PipelineConfig)")
    p.add_argument(
        "--set", nargs="*", default=[], metavar="KEY=VALUE",
        help="dotted config overrides, e.g. physics.w_ee=0.5",
    )


def _load_config(args):
    from ..utils.config import PipelineConfig

    if args.config:
        with open(args.config) as f:
            cfg = PipelineConfig.from_json(f.read())
    else:
        cfg = PipelineConfig()
    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        overrides[k] = v
    if getattr(args, "character", None):
        overrides["character"] = args.character
    if getattr(args, "skel_path", None):
        overrides["kinematic.skel_path"] = args.skel_path
    return cfg.override(**overrides) if overrides else cfg


def _video_dirs(data_path):
    return sorted(
        os.path.join(data_path, f)
        for f in os.listdir(data_path)
        if os.path.isdir(os.path.join(data_path, f)) and not f.startswith(".")
    )


def main(argv=None):
    parser = argparse.ArgumentParser(prog="chd_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("detect-contacts", help="foot-contact detection over video dirs")
    p.add_argument("--data", required=True)
    p.add_argument("--weights", required=True, help=".npz (converted) or .pth weights")
    _add_config_args(p)

    p = sub.add_parser("kinematic", help="kinematic optimization for one video dir")
    p.add_argument("--video-dir", required=True)
    p.add_argument("--skel-path", dest="skel_path", required=True)
    p.add_argument("--character", default="ybot")
    _add_config_args(p)

    p = sub.add_parser("retarget", help="retarget final_test.bvh onto a character")
    p.add_argument("--src-bvh", required=True)
    p.add_argument("--out-bvh", required=True)
    p.add_argument("--character", default="ybot")
    p.add_argument("--char-bvh", required=True, help="character template BVH")

    p = sub.add_parser("physics", help="physics optimization for one video dir")
    p.add_argument("--video-dir", required=True)
    p.add_argument("--character", default="ybot")
    _add_config_args(p)

    p = sub.add_parser("run", help="full pipeline over a data dir of video dirs")
    p.add_argument("--data", required=True)
    p.add_argument("--character", default="ybot")
    p.add_argument("--skel-path", dest="skel_path", required=True)
    p.add_argument("--char-bvh", help="character template BVH (non-combined)")
    _add_config_args(p)

    p = sub.add_parser("train-contacts", help="train the contact model")
    p.add_argument("--data", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--epochs", type=int, default=5000)
    p.add_argument("--batch-size", type=int, default=64)

    p = sub.add_parser(
        "eval-contacts",
        help="evaluate the contact model on the synthetic dataset "
             "(reference contact_learning/test.py)",
    )
    p.add_argument("--data", required=True)
    p.add_argument("--weights", required=True, help=".npz (converted) or .pth weights")
    p.add_argument("--out", help="directory for eval_results.json + merged_predictions.npy")
    p.add_argument("--split", default="test", choices=["train", "val", "test"])
    p.add_argument("--full-video", action="store_true",
                   help="vote-merged full-video metrics (test.py --full-video)")
    p.add_argument("--joint-set", default="lower")

    p = sub.add_parser(
        "openpose",
        help="run the OpenPose binary per video dir (reference run_openpose.py)",
    )
    p.add_argument("--data", required=True)
    p.add_argument("--openpose", required=True, help="OpenPose root (with build/)")
    p.add_argument("--hands", action="store_true")
    p.add_argument("--face", action="store_true")
    p.add_argument("--save-video", action="store_true")

    p = sub.add_parser(
        "totalcap",
        help="run MonocularTotalCapture per video dir (reference run_totalcap.py)",
    )
    p.add_argument("--data", required=True)
    p.add_argument("--totalcap", required=True, help="MTC fork root")

    p = sub.add_parser("make-structure", help="dir of mp4s → dir of video dirs")
    p.add_argument("--data", required=True)
    p.add_argument("--out", required=True)

    p = sub.add_parser("config", help="print the default config JSON")

    args = parser.parse_args(argv)

    if args.cmd == "config":
        from ..utils.config import PipelineConfig

        print(PipelineConfig().to_json())
        return 0

    if args.cmd == "make-structure":
        from .structure import create_optim_data_structure

        made = create_optim_data_structure(args.data, args.out)
        print("\n".join(made))
        return 0

    if args.cmd == "detect-contacts":
        from ..contact.infer import detect_contacts
        from ..models import torch_convert

        cfg = _load_config(args)
        if args.weights.endswith(".pth"):
            params, state = torch_convert.load_torch_checkpoint(args.weights)
        else:
            params, state = torch_convert.load_npz(args.weights)
        dirs = _video_dirs(args.data)
        results = detect_contacts(dirs, params, state, image_dims=cfg.image_dims)
        for d, r in zip(dirs, results):
            print(f"{d}: {r.shape[0]} frames, contact rate {r.mean():.3f}")
        return 0

    if args.cmd == "kinematic":
        from .run import run_kinematic_stage

        cfg = _load_config(args)
        out = run_kinematic_stage(args.video_dir, cfg)
        print(out)
        return 0

    if args.cmd == "retarget":
        from ..core import bvh
        from ..retarget import retarget

        src, _, _ = bvh.load(args.src_bvh)
        retarget(src, args.character, args.char_bvh, out_bvh=args.out_bvh)
        print(args.out_bvh)
        return 0

    if args.cmd == "physics":
        from .run import run_physics_stage

        cfg = _load_config(args)
        res = run_physics_stage(args.video_dir, cfg)
        print(json.dumps(res))
        return 0

    if args.cmd == "run":
        from .run import run_pipeline

        cfg = _load_config(args)
        for vd in _video_dirs(args.data):
            print(f"=== {vd} ===")
            res = run_pipeline(vd, cfg, char_skel_bvh=args.char_bvh)
            print(json.dumps(res["stats"]))
        return 0

    if args.cmd == "eval-contacts":
        import numpy as np

        from ..contact import evaluate
        from ..contact.data import ContactDataset
        from ..contact.train import TrainConfig
        from ..models import torch_convert

        if args.weights.endswith(".pth"):
            params, state = torch_convert.load_torch_checkpoint(args.weights)
        else:
            params, state = torch_convert.load_npz(args.weights)
        ds = ContactDataset.load(args.data)
        cfg = TrainConfig(joint_set=args.joint_set)
        if args.full_video:
            res = evaluate.evaluate_full_video(params, state, ds, args.split, cfg)
        else:
            res = evaluate.evaluate_windows(params, state, ds, args.split, cfg)
        merged_pred = res.pop("merged_predictions", None)
        print(json.dumps(res, indent=2))
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            with open(os.path.join(args.out, "eval_results.json"), "w") as f:
                json.dump(res, f, indent=2)
            if merged_pred is not None:
                np.save(os.path.join(args.out, "merged_predictions.npy"),
                        merged_pred)
        return 0

    if args.cmd == "openpose":
        from .external import run_openpose

        run_openpose(_video_dirs(args.data), args.openpose,
                     hands=args.hands, face=args.face,
                     save_video=args.save_video)
        return 0

    if args.cmd == "totalcap":
        from .external import run_totalcap

        run_totalcap(_video_dirs(args.data), args.totalcap)
        return 0

    if args.cmd == "train-contacts":
        from ..contact.data import ContactDataset
        from ..contact.train import TrainConfig, train

        ds = ContactDataset.load(args.data)
        os.makedirs(args.out, exist_ok=True)
        train(ds, TrainConfig(epochs=args.epochs, batch_size=args.batch_size), out_dir=args.out)
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
