"""Driver tests: test_ft and render_vid against a trained checkpoint."""

import os

import numpy as np
import pytest

from pointnerf_tpu.run import train_ft, test_ft, render_vid

from fixtures import make_nerf_synth_scene
from test_train_ft_driver import tiny_train_opt


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    make_nerf_synth_scene(root, wh=(40, 40))
    out = str(tmp_path_factory.mktemp("ckpt"))
    opt = tiny_train_opt(root, out, maximum_step=80, prune_iter=0, prob_freq=0,
                         save_iter_freq=80, save_point_freq=0, test_freq=0)
    res = train_ft.main(opt)
    return opt, res


def test_test_ft(trained):
    opt, res = trained
    out = test_ft.main(opt.replace(test_num=2))
    assert out["step"] == 80
    assert out["psnr"] > 15.0
    assert out["scores"]["psnr"] > 15.0
    # deterministic render: same PSNR as the final test in training
    assert abs(out["psnr"] - res["final_psnr"]) < 2.0


def test_render_vid(trained):
    opt, _ = trained
    out = render_vid.main(opt)
    assert out["n_frames"] == 20
    assert out["video"] is not None and os.path.exists(out["video"])
    assert os.path.getsize(out["video"]) > 1000
