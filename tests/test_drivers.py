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


def test_preset_scene_parity():
    """Every shipped per-scene preset constructs with the reference dev_script
    constants (reference: dev_scripts/w_n360/*_cuda.sh, w_scannet_etf/*.sh,
    w_tt_ft/*.sh)."""
    from pointnerf_tpu.config import PRESETS

    n360 = {s: PRESETS["nerf_synth"](s) for s in
            ("chair", "drums", "ficus", "hotdog", "lego", "materials",
             "mic", "ship")}
    assert n360["ship"].max_o == 1500000 and n360["ship"].vox_res == 280
    assert n360["ship"].prob_thresh == 0.5
    assert n360["mic"].random_sample_size == 110
    assert n360["mic"].zero_one_loss_items == ()
    assert n360["ficus"].plr == 0.008 and n360["ficus"].prob_thresh == -0.7
    assert n360["chair"].prune_iter == -10001   # pruning disabled
    assert all(o.depth_occ == 1 and o.bg_filtering == 1
               for o in n360.values())
    assert n360["materials"].ranges[0] == -1.123

    tt = {s: PRESETS["tt"](s) for s in
          ("Barn", "Caterpillar", "Family", "Ignatius", "Truck")}
    assert tt["Family"].vsize == (0.001, 0.001, 0.001)
    assert tt["Family"].P == 32 and tt["Family"].random_sample_size == 68
    assert tt["Truck"].prune_thresh == -1.0 and tt["Truck"].default_conf == 0.1
    assert tt["Caterpillar"].prob_tiers == (130000,)
    assert tt["Ignatius"].prob_num_step == 25

    sc = PRESETS["scannet"]("scene0101_04")
    assert sc.max_o == 2000000 and sc.P == 30

    dtu = PRESETS["dtu_ft"]("scan1")
    assert dtu.bgmodel == "plane" and dtu.dataset_name == "dtu_ft"

    col = PRESETS["nerf_synth_colmap"]("chair")
    assert col.load_points == 1 and col.prune_iter == -1
    assert col.random_sample_size == 70 and col.prob_tiers == (60000,)
    assert col.prob_kernel_size == (1.0, 1.0, 1.0)
    assert col.zero_one_loss_items == ()

    inf = PRESETS["dtu_inf"]("scan8")
    assert inf.wcoord_query == 0 and inf.depth_occ == 1
    assert inf.maximum_step == 0 and inf.geo_cnsst_num == 10
