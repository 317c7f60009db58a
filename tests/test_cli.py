"""CLI surface tests (``python -m chd_tpu.pipeline <command>``).

The reference exposes each stage as a standalone argparse script
(scripts/run_openpose.py, run_totalcap.py, run_detect_contacts.py,
contact_learning/{train,test}.py, run_phys_mocap.py); here one CLI carries
the same surface. These tests drive the in-process entry point.
"""
import json
import os

import jax
import numpy as np
import pytest

from chd_tpu.models import contact_mlp, torch_convert
from chd_tpu.pipeline import cli

from test_eval_ckpt import make_dataset


def test_config_prints_valid_json(capsys):
    assert cli.main(["config"]) == 0
    cfg = json.loads(capsys.readouterr().out)
    assert "physics" in cfg and "kinematic" in cfg


def test_eval_contacts_cli(tmp_path, capsys):
    """eval-contacts = reference contact_learning/test.py --full-video:
    loads weights, evaluates the requested split, writes eval_results.json
    + merged_predictions.npy."""
    rng = np.random.default_rng(3)
    make_dataset(tmp_path, rng)
    params, state = contact_mlp.init(jax.random.PRNGKey(0), contact_mlp.ModelConfig())
    wpath = tmp_path / "weights.npz"
    torch_convert.save_npz(str(wpath), params, state)
    out = tmp_path / "eval_out"

    rc = cli.main([
        "eval-contacts",
        "--data", str(tmp_path / "synth"),
        "--weights", str(wpath),
        "--out", str(out),
        "--split", "val",
        "--full-video",
    ])
    assert rc == 0
    res = json.load(open(out / "eval_results.json"))
    assert 0 <= res["merged"]["accuracy"] <= 1
    assert len(res["per_frame"]) == 5
    merged = np.load(out / "merged_predictions.npy")
    assert merged.ndim == 3 and merged.shape[-1] == 4
    # stdout carries the same JSON (no ndarray leaked into it)
    printed = json.loads(capsys.readouterr().out)
    assert printed["merged"] == res["merged"]


def test_eval_contacts_window_level(tmp_path, capsys):
    rng = np.random.default_rng(4)
    make_dataset(tmp_path, rng)
    params, state = contact_mlp.init(jax.random.PRNGKey(1), contact_mlp.ModelConfig())
    wpath = tmp_path / "w.npz"
    torch_convert.save_npz(str(wpath), params, state)
    rc = cli.main([
        "eval-contacts", "--data", str(tmp_path / "synth"),
        "--weights", str(wpath), "--split", "val",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out)
    assert "merged" not in res and len(res["per_frame"]) == 5


@pytest.mark.parametrize("cmd,flag", [("openpose", "--openpose"),
                                      ("totalcap", "--totalcap")])
def test_external_cmds_require_binary(tmp_path, cmd, flag):
    """openpose/totalcap subcommands mirror the reference drivers; without
    the external binary they fail with a pointed FileNotFoundError (the
    reference would crash on subprocess exec instead)."""
    vd = tmp_path / "data" / "vid1"
    os.makedirs(vd)
    with pytest.raises(FileNotFoundError):
        cli.main([cmd, "--data", str(tmp_path / "data"), flag, str(tmp_path)])
