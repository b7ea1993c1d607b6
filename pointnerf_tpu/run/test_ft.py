"""Test-only driver: load a checkpoint, render the held-out split, report metrics.

Reference: run/test_ft.py:276-353 — loads best/latest ckpt and runs test() with
PSNR/SSIM/LPIPS via run/evaluate.py.

Usage: python -m pointnerf_tpu.run.test_ft --preset nerf_synth:lego \
           --data_root <dir> [--resume_iter N]
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import jax

from ..config import Options
from ..data import create_dataset
from ..train import trainer
from ..utils.checkpoint import load_checkpoint, latest_step
from ..utils.metrics import report_metrics
from ..utils.visualizer import Visualizer
from .common import (init_point_state_from_dataset, make_spec_and_grid,
                     options_from_cli)
from .train_ft import test


def main(opt: Options) -> Dict:
    ckpt_dir = opt.resume_dir or os.path.join(opt.checkpoints_dir, opt.experiment)
    visualizer = Visualizer(opt)
    train_ds = create_dataset(opt, split="train")
    test_ds = create_dataset(opt, split="test")

    step = None if opt.resume_iter in ("", "latest", "best") else int(opt.resume_iter)
    found = latest_step(ckpt_dir) if step is None else step
    if found is None:
        raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")

    key = jax.random.PRNGKey(opt.seed)
    point_state = init_point_state_from_dataset(opt, train_ds, key)
    template = trainer.create_train_state(opt, key, point_state)
    try:
        ts, counters = load_checkpoint(ckpt_dir, template, step=found)
    except (ValueError, KeyError):
        # point capacity in the checkpoint differs from the fresh template
        # (grow/prune changed it); retry with expanded template
        import re, glob
        data = np.load(os.path.join(ckpt_dir, f"{found}_full.npz"))
        cap = max(v.shape[0] for k, v in data.items()
                  if "pt_static/mask" in k or k.endswith("mask"))
        template = trainer.expand_capacity(template, cap)
        ts, counters = load_checkpoint(ckpt_dir, template, step=found)

    spec, grid = make_spec_and_grid(opt, trainer.point_state_of(ts))
    # --n_devices / --gpu_ids: SPMD serving over a device mesh
    from ..parallel import make_runner
    runner = make_runner(opt)
    mesh = None
    if runner is not None:
        ts = runner.place_state(ts)
        grid = runner.place_grid(grid, spec)
        mesh = runner.mesh
    visualizer.print_details(
        f"loaded step {found} (best_PSNR {counters.get('best_PSNR', 0):.3f})")

    mean_psnr = test(ts, grid, opt, spec, test_ds, visualizer, found,
                     max_images=opt.test_num if opt.test_num > 0 else None,
                     mesh=mesh)
    img_dir = os.path.join(visualizer.image_dir, f"test_{found}")
    metric_names = ["psnr", "ssim", "rmse", "lpips", "vgglpips"]
    scores = report_metrics(
        img_dir, img_dir, img_dir, tuple(metric_names),
        lpips_weights={"lpips": opt.lpips_alex_path,
                       "vgglpips": opt.lpips_vgg_path})
    visualizer.print_details(f"scores: {scores}")
    return {"psnr": mean_psnr, "scores": scores, "step": found}


if __name__ == "__main__":
    main(options_from_cli())
