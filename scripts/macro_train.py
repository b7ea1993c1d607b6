"""Macro end-to-end run on the real TPU: full train_ft driver on a synthetic
96x96 NeRF-Synthetic-layout scene (COLMAP-style point init, prune + probe/
grow, periodic held-out test renders). Records wall-clock and PSNR so the
quality/throughput story rests on a real driver run, not only unit tests.

Run: python scripts/macro_train.py [--steps 4000] [--wh 96]
"""

from __future__ import annotations

import os

import os as _os, sys as _sys
_d = _os.path.dirname(_os.path.abspath(__file__))
_sys.path[:0] = [_d, _os.path.dirname(_d)]
from pointnerf_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()  # host-keyed persistent compile cache (utils/cache.py)

import argparse
import json
import sys
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--wh", type=int, default=96)
    ap.add_argument("--rays", type=int, default=32, help="ray square side")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    sys.path.insert(0, "tests")
    from fixtures import make_nerf_synth_scene
    from pointnerf_tpu.config import Options
    from pointnerf_tpu.run import train_ft

    root = tempfile.mkdtemp(prefix="macro_scene_")
    out = tempfile.mkdtemp(prefix="macro_ckpt_")
    make_nerf_synth_scene(root, wh=(args.wh, args.wh), n_train=24, n_test=4)

    opt = Options(
        experiment="plate_macro", checkpoints_dir=out, load_points=1,
        data_root=root, scan="plate", dataset_name="nerf_synth360_ft",
        img_wh=(args.wh, args.wh), random_sample="random",
        random_sample_size=args.rays,
        near_plane=2.0, far_plane=4.5, bg_color="white",
        ranges=(-0.55, -0.55, -0.15, 0.55, 0.55, 0.15),
        vsize=(0.02, 0.02, 0.02), vscale=(1, 1, 1),
        kernel_size=(3, 3, 3), query_size=(3, 3, 3),
        max_o=65536, P=12, K=8, SR=24, z_depth_dim=128,
        radius_limit_scale=4.0, vox_res=160,
        point_features_dim=32, feature_init_method="rand",
        num_feat_freqs=3, dist_xyz_freq=5, num_viewdir_freqs=4,
        shading_feature_num=256,
        shading_feature_mlp_layer1=2, shading_feature_mlp_layer3=2,
        shading_alpha_mlp_layer=1, shading_color_mlp_layer=4,
        agg_intrp_order=2, agg_distance_kernel="linear", agg_dist_pers=20,
        point_conf_mode="1", point_color_mode="1", point_dir_mode="1",
        which_tonemap_func="off", default_conf=0.4,
        lr=0.0005, plr=0.002,
        color_loss_items=("ray_masked_coarse_raycolor",
                          "ray_miss_coarse_raycolor", "coarse_raycolor"),
        color_loss_weights=(1.0, 0.0, 0.0),
        zero_one_loss_items=("conf_coefficient",),
        zero_one_loss_weights=(0.0001,),
        superset_P=32, SR_budget=-1,
        maximum_step=args.steps,
        prune_iter=1000, prune_thresh=0.1, prune_max_iter=args.steps,
        prob_freq=1000, prob_num_step=8, prob_thresh=0.7, prob_mul=0.4,
        prob_kernel_size=(3.0, 3.0, 3.0), prob_tiers=(100000,),
        print_freq=500, save_iter_freq=args.steps, save_point_freq=args.steps,
        test_freq=args.steps // 2, test_num=4,
    )
    t0 = time.time()
    result = train_ft.main(opt)
    dt = time.time() - t0
    rays_per_step = args.rays ** 2
    print(json.dumps({
        "steps": result["total_steps"],
        "wall_s": round(dt, 1),
        "final_psnr": round(result["final_psnr"], 3),
        "best_psnr": round(result.get("best_psnr", result["final_psnr"]), 3),
        "train_rays_per_sec_incl_everything":
            round(result["total_steps"] * rays_per_step / dt, 1),
    }))


if __name__ == "__main__":
    main()
