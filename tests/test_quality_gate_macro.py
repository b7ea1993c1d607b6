"""Production-shaped quality gate (VERDICT r2 item 7).

The original recorded-PSNR gate (test_quality_gate.py) trains a 12-ray-side
toy scene through trainer.train_step directly — the SR_budget compaction,
the eval budget ladder, prune, and the full train_ft driver loop are all
OUTSIDE it. This gate runs the REAL driver at macro shape: 64x64 images,
COLMAP init, superset-bucket query, SR_budget=-1 compaction, prune live,
held-out eval through render_image (grouped chunks + overflow ladder).
A silent regression in any of those paths moves the recorded PSNR.
"""

import tempfile

import numpy as np
import jax
import pytest

from fixtures import make_nerf_synth_scene
from pointnerf_tpu.config import Options

# Recorded on the known-good pipeline (jax 0.9.0 CPU mesh, 2026-08-17,
# round 3, per-batch compaction). Drift beyond ±0.15 dB means the
# query/compaction/driver/eval numerics changed — investigate before
# re-recording.
#
# Sensitivity (verified when recorded):
#  * a deliberate bug clamping effective_sr_budget to 256 rows (which the
#    adaptive ladder cannot heal, since it consults the same function)
#    scores 30.0985 — CAUGHT (drift 0.23 > 0.15);
#  * a mere config-level SR_budget=256 scores 30.3476 — NOT caught, by
#    design: the driver's overflow ladder raises the budget and eval
#    retries overflowing chunks uncompacted, so a recoverable misconfig
#    heals instead of silently degrading.
RECORDED_MACRO_PSNR = 30.3308


def _macro_opt(root, out, steps):
    return Options(
        experiment="gate_macro", checkpoints_dir=out, load_points=1,
        data_root=root, scan="plate", dataset_name="nerf_synth360_ft",
        img_wh=(64, 64), random_sample="random", random_sample_size=24,
        near_plane=2.0, far_plane=4.5, bg_color="white",
        ranges=(-0.55, -0.55, -0.15, 0.55, 0.55, 0.15),
        vsize=(0.02, 0.02, 0.02), vscale=(1, 1, 1),
        kernel_size=(3, 3, 3), query_size=(3, 3, 3),
        max_o=65536, P=12, K=8, SR=24, z_depth_dim=128,
        radius_limit_scale=4.0, vox_res=160,
        point_features_dim=32, feature_init_method="rand",
        num_feat_freqs=3, dist_xyz_freq=5, num_viewdir_freqs=4,
        shading_feature_num=64,
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
        superset_P=32, SR_budget=-1,         # compaction + superset query LIVE
        maximum_step=steps,
        prune_iter=200, prune_thresh=0.1, prune_max_iter=steps,
        prob_freq=0,                          # growing is driver-tested elsewhere;
                                              # keeping the gate fast + focused
        print_freq=steps, save_iter_freq=steps, save_point_freq=0,
        test_freq=0, test_num=2, gen_vid=False,
    )


@pytest.mark.slow
def test_macro_driver_recorded_psnr():
    from pointnerf_tpu.run import train_ft

    root = tempfile.mkdtemp(prefix="gate_macro_scene_")
    out = tempfile.mkdtemp(prefix="gate_macro_ckpt_")
    make_nerf_synth_scene(root, wh=(64, 64), n_train=12, n_test=2)
    opt = _macro_opt(root, out, steps=400)
    result = train_ft.main(opt)
    got = result["final_psnr"]
    if RECORDED_MACRO_PSNR is None:
        raise AssertionError(f"record this macro PSNR: {got:.4f}")
    assert abs(got - RECORDED_MACRO_PSNR) <= 0.15, (got, RECORDED_MACRO_PSNR)
