"""Video render driver: spin the render-pose path and assemble a video.

Reference: run/render_vid.py:26-79 — chunked render over dataset.render_poses,
frames saved then assembled by Visualizer.gen_video.

Usage: python -m pointnerf_tpu.run.render_vid --preset nerf_synth:lego \
           --data_root <dir>
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np

from ..config import Options
from ..data import create_dataset
from ..train import trainer
from ..utils.checkpoint import load_checkpoint, latest_step
from ..utils.visualizer import Visualizer
from .common import (init_point_state_from_dataset, make_spec_and_grid,
                     options_from_cli, render_image)


def render_vid(ts, grid, opt, spec, dataset, visualizer, total_steps: int = 0,
               fps: int = 24, mesh=None) -> Dict:
    frames = []
    for i in range(len(dataset)):
        item = dataset.get_dummyrot_item(i)
        maps = render_image(ts, grid, opt.replace(random_sample="no_crop"),
                            spec, item, keys=("coarse_raycolor",), mesh=mesh)
        img = maps["coarse_raycolor"]
        visualizer.display_current_results({"coarse_raycolor": img}, i,
                                           subdir=f"vid_{total_steps}")
        frames.append(i)
    path = visualizer.gen_video(
        f"video_{total_steps}",
        os.path.join(visualizer.image_dir, f"vid_{total_steps}"),
        "step-%04d-coarse_raycolor.png", frames, fps=fps)
    visualizer.print_details(f"video written to {path}")
    return {"video": path, "n_frames": len(frames)}


def main(opt: Options) -> Dict:
    ckpt_dir = opt.resume_dir or os.path.join(opt.checkpoints_dir, opt.experiment)
    visualizer = Visualizer(opt)
    train_ds = create_dataset(opt, split="train")
    render_ds = create_dataset(opt, split="render")

    found = latest_step(ckpt_dir)
    if found is None:
        raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
    key = jax.random.PRNGKey(opt.seed)
    point_state = init_point_state_from_dataset(opt, train_ds, key)
    template = trainer.create_train_state(opt, key, point_state)
    try:
        ts, _ = load_checkpoint(ckpt_dir, template, step=found)
    except (ValueError, KeyError):
        data = np.load(os.path.join(ckpt_dir, f"{found}_full.npz"))
        cap = max(v.shape[0] for k, v in data.items() if k.endswith("mask"))
        template = trainer.expand_capacity(template, cap)
        ts, _ = load_checkpoint(ckpt_dir, template, step=found)
    spec, grid = make_spec_and_grid(opt, trainer.point_state_of(ts))
    from ..parallel import make_runner
    runner = make_runner(opt)
    mesh = None
    if runner is not None:
        ts = runner.place_state(ts)
        grid = runner.place_grid(grid, spec)
        mesh = runner.mesh
    return render_vid(ts, grid, opt, spec, render_ds, visualizer, found,
                      mesh=mesh)


if __name__ == "__main__":
    main(options_from_cli())
