"""Smoke tests for the headless visualization layer."""
import os

import numpy as np

from chd_tpu.characters import defs
from chd_tpu.viz import (
    animate_physics_results,
    animate_skeletons,
    plot_3curve,
    plot_confusion_matrix,
    plot_train_curves,
    render_keypoint_video,
)
from chd_tpu.viz.blender import pick_result


def _output_exists(path):
    return os.path.exists(path) or os.path.isdir(path + ".frames")


def test_animate_skeletons(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(3, 28, 3)) * 50
    out = str(tmp_path / "skel.mp4")
    animate_skeletons(
        [pts], [defs.COMBINED_ADJ_LIST], out,
        contacts=(rng.uniform(size=(3, 28)) > 0.8),
        floor_normal=[0.01, -1, 0], floor_point=[0, 90, 0], max_frames=3,
    )
    assert _output_exists(out)


def test_render_keypoint_video(tmp_path):
    rng = np.random.default_rng(1)
    kp = np.concatenate(
        [rng.uniform(100, 800, size=(4, 25, 2)), rng.uniform(0, 1, size=(4, 25, 1))],
        axis=-1,
    )
    out = str(tmp_path / "kp.mp4")
    render_keypoint_video(
        [kp], out, dimensions=(960, 540),
        contacts=(rng.uniform(size=(4, 4)) > 0.5).astype(int),
    )
    assert _output_exists(out)


def test_animate_physics(tmp_path):
    from chd_tpu.physics.towr_io import LoadedResults

    rng = np.random.default_rng(2)
    F = 3
    res = LoadedResults(
        num_feet=4, dt=1 / 30,
        base_pos=rng.normal(size=(F, 3)),
        base_rot=np.zeros((F, 3)),
        base_R=np.tile(np.eye(3), (F, 1, 1)),
        feet_pos=rng.normal(size=(F, 4, 3)),
        feet_force=rng.normal(size=(F, 4, 3)) * 200,
        feet_contact=(rng.uniform(size=(F, 4)) > 0.5).astype(int),
    )
    out = str(tmp_path / "phys.mp4")
    animate_physics_results(
        [res, res], out, names=["Dyn", "Init"],
        floor_normal=[0, -1, 0.01], floor_point=[0, 1.0, 0], max_frames=3,
    )
    assert _output_exists(out)


def test_plots(tmp_path):
    hist = {
        "train_loss": [1.0, 0.8, 0.6], "val_loss": [0.9, 0.7],
        "train_acc": [0.5, 0.6, 0.7], "val_f1": [0.4, 0.55],
    }
    assert os.path.exists(plot_train_curves(hist, str(tmp_path / "curves.png")))
    assert os.path.exists(plot_confusion_matrix((10, 2, 3, 40), str(tmp_path / "cm.png")))
    assert os.path.exists(
        plot_3curve(np.random.default_rng(0).normal(size=(10, 3)), 1 / 30,
                    str(tmp_path / "c3.png"), "pos")
    )


def test_blender_pick_result(tmp_path):
    from chd_tpu.physics.towr_io import save_success_log

    d = str(tmp_path)
    save_success_log(os.path.join(d, "success_log.txt"), True, False)
    assert pick_result(d) == "dynamics"
    save_success_log(os.path.join(d, "success_log.txt"), True, True)
    assert pick_result(d) == "durations"
    save_success_log(os.path.join(d, "success_log.txt"), False, False)
    assert pick_result(d) == "no_dynamics"
