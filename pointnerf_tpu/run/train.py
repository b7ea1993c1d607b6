"""Generalizable (feed-forward) training driver.

Reference: run/train.py + MvsPointsVolumetricModel feedforward mode
(models/mvs_points_volumetric_model.py:121-132): every step runs
MVS depth → points → embeddings → render on a fresh view bundle; the render
MLPs and the MVS feature nets train jointly (alternating by `alter_step`),
points carry no optimizer state (opt.feedforward=1).

TPU design: the whole step — MVSNet inference, FPN features, point
generation, grid build, render, loss, both Adam updates — is ONE jitted
function with static shapes (points = V·H·W slots with a validity mask; the
reference instead materializes dynamic point counts per step).

Usage: python -m pointnerf_tpu.run.train --dataset_name dtu --data_root <dir> ...
"""

from __future__ import annotations

import os
import time
from typing import Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import Options
from ..data import create_dataset
from ..models import neural_points as npc
from ..models.aggregator import init_aggregator_params
from ..models.losses import compute_losses
from ..models.mvs import points_model as pm
from ..models.networks import make_lr_schedule
from ..models.renderer import render_forward
from ..ops.grid import GridSpec, build_grid, make_grid_spec
from ..train.trainer import COMPUTE_DTYPES
from ..utils.checkpoint import save_pytree_npz, load_pytree_npz
from ..utils.visualizer import Visualizer
from .common import options_from_cli


class GenTrainState(NamedTuple):
    agg_params: Dict
    mvs_train: Dict            # trainable: FPN featurenet (+ premlp)
    mvs_frozen: Dict           # frozen: pretrained MVSNet depth estimator
    opt_state_net: optax.OptState
    opt_state_mvs: optax.OptState
    step: jnp.ndarray


def split_mvs_params(params: Dict) -> Tuple[Dict, Dict]:
    """MVSNet depth net is frozen (reference loads it pretrained and runs it
    under no_grad, mvs_points_model.py:314); FPN + premlp train."""
    train = {k: v for k, v in params.items() if k != "mvsnet"}
    frozen = {"mvsnet": params["mvsnet"]}
    return train, frozen


def make_optimizers(opt):
    # The MVS chain takes its own LR when --mvs_lr is set, falling back to
    # --lr (reference: models/mvs_points_volumetric_model.py:73-77).
    mvs_lr = opt.mvs_lr if opt.mvs_lr is not None else opt.lr
    net_tx = optax.chain(
        optax.scale_by_adam(),
        optax.scale_by_schedule(lambda s: -1.0 * make_lr_schedule(opt, opt.lr)(s)))
    mvs_tx = optax.chain(
        optax.scale_by_adam(),
        optax.scale_by_schedule(lambda s: -1.0 * make_lr_schedule(opt, mvs_lr)(s)))
    return net_tx, mvs_tx


def create_gen_state(opt, key) -> GenTrainState:
    k1, k2 = jax.random.split(key)
    agg = init_aggregator_params(k1, opt)
    mvs = pm.init_mvs_points_params(k2, opt)
    if opt.pre_d_est and opt.manual_depth_view > 0:
        from .common import load_pretrained_mvsnet
        mvs = dict(mvs, mvsnet=load_pretrained_mvsnet(opt.pre_d_est))
    mvs_train, mvs_frozen = split_mvs_params(mvs)
    net_tx, mvs_tx = make_optimizers(opt)
    return GenTrainState(
        agg_params=agg, mvs_train=mvs_train, mvs_frozen=mvs_frozen,
        opt_state_net=net_tx.init(agg), opt_state_mvs=mvs_tx.init(mvs_train),
        step=jnp.asarray(0, jnp.int32))


def feedforward_point_state(mvs_params: Dict, opt, sample: Dict, key) -> Dict:
    """gen_points → masked point-state dict (no padding reorder — jit-safe).

    Equivalent of NeuralPoints.set_points(parameter=False)
    (reference: mvs_points_volumetric_model.py:121-127).
    """
    out = pm.gen_points(mvs_params, opt, sample, key, training=True)
    keep = out["keep"]
    xyz = jnp.where(keep[:, None], out["xyz_w"], npc.SENTINEL)
    return {
        "xyz": xyz,
        "embedding": out["embedding"],
        "color": out["color"],
        "dir": out["dir"][:, :3],
        "conf": out["conf"],
        "mask": keep,
        "Rw2c": jnp.eye(3, dtype=jnp.float32),
    }


def gen_train_step_impl(state: GenTrainState, sample: Dict, batch: Dict,
                        key: jax.Array, opt, spec: GridSpec
                        ) -> Tuple[GenTrainState, Dict]:
    net_tx, mvs_tx = make_optimizers(opt)
    k_pts, k_render = jax.random.split(key)

    def loss_fn(agg_params, mvs_train):
        mvs_params = dict(mvs_train, **state.mvs_frozen)
        point_state = feedforward_point_state(mvs_params, opt, sample, k_pts)
        # frustum mode builds its own per-camera perspective grid inside
        # render_query; the world grid would be dead weight
        grid = None if opt.wcoord_query == 0 else \
            build_grid(point_state["xyz"], point_state["mask"], spec)
        output = render_forward(agg_params, point_state, grid, spec, opt,
                                batch, k_render, is_train=True,
                                compute_dtype=COMPUTE_DTYPES[opt.compute_dtype])
        total, items = compute_losses(opt, output, batch["gt_image"],
                                      gt_mask=batch.get("gt_mask"),
                                      gt_depth=batch.get("gt_depth"))
        return total, items

    (_, items), grads = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                           has_aux=True)(
        state.agg_params, state.mvs_train)
    g_net, g_mvs = grads

    if opt.alter_step > 0:
        # alternate render-net and mvs-net updates (reference: run/train.py:109-113)
        phase = (state.step // opt.alter_step) % 2
        g_net = jax.tree.map(lambda g: g * (phase == 0), g_net)
        g_mvs = jax.tree.map(lambda g: g * (phase == 1), g_mvs)

    upd_net, os_net = net_tx.update(g_net, state.opt_state_net, state.agg_params)
    upd_mvs, os_mvs = mvs_tx.update(g_mvs, state.opt_state_mvs, state.mvs_train)
    return GenTrainState(
        agg_params=optax.apply_updates(state.agg_params, upd_net),
        mvs_train=optax.apply_updates(state.mvs_train, upd_mvs),
        mvs_frozen=state.mvs_frozen,
        opt_state_net=os_net, opt_state_mvs=os_mvs,
        step=state.step + 1), items


gen_train_step = jax.jit(gen_train_step_impl, static_argnames=("opt", "spec"))


def gen_eval_impl(state: GenTrainState, sample: Dict, batch: Dict,
                  key: jax.Array, opt, spec: GridSpec) -> Dict:
    mvs_params = dict(state.mvs_train, **state.mvs_frozen)
    point_state = feedforward_point_state(mvs_params, opt, sample, key)
    grid = None if opt.wcoord_query == 0 else \
        build_grid(point_state["xyz"], point_state["mask"], spec)
    return render_forward(state.agg_params, point_state, grid, spec, opt,
                          batch, key=None, is_train=False,
                          compute_dtype=COMPUTE_DTYPES[opt.compute_dtype])


gen_eval_step = jax.jit(gen_eval_impl, static_argnames=("opt", "spec"))


def sample_to_device(sample: Dict) -> Dict:
    return {k: jnp.asarray(v) for k, v in sample.items()
            if k not in ("scan", "view_ids")}


def make_render_spec(opt, ds, n_pts: int) -> GridSpec:
    """World grid spec, or a frustum spec when --wcoord_query 0 (the
    reference's default perspective querier; dtu_test_inf scripts use it)."""
    if opt.wcoord_query == 0:
        from ..ops.frustum import make_frustum_spec
        return make_frustum_spec(
            opt, ds.intrinsics[0], opt.img_wh[0], opt.img_wh[1],
            float(ds.near_far[0]), float(ds.near_far[1]))
    return make_grid_spec(opt, max_points=n_pts)


def inference(opt: Options, state: Optional[GenTrainState] = None,
              max_images: Optional[int] = None) -> Dict:
    """Pure feed-forward novel-view synthesis on unseen scans — no per-scene
    optimization (reference: dev_scripts/dtu_test_inf/*.sh run train.py with
    maximum_step=0). Renders each meta's held-out target view and reports PSNR.
    """
    from ..utils.metrics import psnr as psnr_fn
    from ..utils.visualizer import Visualizer
    from ..data.base import chunks_of_item

    key = jax.random.PRNGKey(opt.seed)
    visualizer = Visualizer(opt)
    test_ds = create_dataset(opt, split="test")
    n_pts = len(str(opt.depth_vid)) * opt.num_each_depth \
        * opt.img_wh[0] * opt.img_wh[1]
    spec = make_render_spec(opt, test_ds, n_pts)
    if state is None:
        key, sub = jax.random.split(key)
        state = create_gen_state(opt, sub)
        ckpt_dir = os.path.join(opt.checkpoints_dir, opt.experiment)
        import glob
        cands = sorted(glob.glob(os.path.join(ckpt_dir, "*_gen.npz")),
                       key=lambda p: int(os.path.basename(p).split("_")[0]))
        if cands:
            state = load_pytree_npz(cands[-1], state)
            visualizer.print_details(f"loaded {cands[-1]}")

    n = len(test_ds) if max_images is None else min(max_images, len(test_ds))
    psnrs = []
    for i in range(n):
        item = test_ds.get_item(i, full_img=True)
        sample = sample_to_device(item.pop("mvs_sample"))
        H, W = int(item["h"]), int(item["w"])
        img = np.zeros((H, W, 3), np.float32)
        pix = item["pixel_idx"][0].astype(np.int64)
        chunk = opt.random_sample_size ** 2
        for sub_item, s, e in chunks_of_item(item, chunk):
            batch = {k: jnp.asarray(v) for k, v in sub_item.items()
                     if k in ("raydir", "campos", "camrotc2w", "near", "far",
                              "bg_color", "gt_image")}
            key, k2 = jax.random.split(key)
            out = gen_eval_step(state, sample, batch, k2, opt, spec)
            arr = np.asarray(out["coarse_raycolor"][0])[: e - s]
            img[pix[s:e, 1], pix[s:e, 0]] = arr
        gt = item["gt_image"][0].reshape(H, W, 3)
        p = psnr_fn(gt, img)
        psnrs.append(p)
        visualizer.display_current_results(
            {"coarse_raycolor": img, "gt_image": gt}, i, subdir="inference")
    mean = float(np.mean(psnrs))
    visualizer.print_details(f"feed-forward inference PSNR {mean:.3f} over {n}")
    return {"psnr": mean, "n": n}


def main(opt: Options, max_steps: Optional[int] = None) -> Dict:
    if opt.maximum_step == 0:
        return inference(opt)
    key = jax.random.PRNGKey(opt.seed)
    rng = np.random.RandomState(opt.seed)
    ckpt_dir = os.path.join(opt.checkpoints_dir, opt.experiment)
    os.makedirs(ckpt_dir, exist_ok=True)
    visualizer = Visualizer(opt)

    train_ds = create_dataset(opt, split="train")
    # grid geometry is fixed by opt.ranges; capacity defaults to the per-step
    # point count (one point per depth-view pixel)
    n_pts = len(str(opt.depth_vid)) * opt.num_each_depth \
        * opt.img_wh[0] * opt.img_wh[1]
    spec = make_render_spec(opt, train_ds, n_pts)

    key, sub = jax.random.split(key)
    state = create_gen_state(opt, sub)
    total_steps = 0
    stop_at = min(opt.maximum_step, max_steps or opt.maximum_step)
    t0 = time.time()
    while total_steps < stop_at:
        idx = int(rng.randint(len(train_ds)))
        item = train_ds.get_item(idx, rng=rng)
        sample = sample_to_device(item.pop("mvs_sample"))
        batch = {k: jnp.asarray(v) for k, v in item.items()
                 if k in ("raydir", "campos", "camrotc2w", "near", "far",
                          "bg_color", "gt_image")}
        key, sub = jax.random.split(key)
        state, items = gen_train_step(state, sample, batch, sub, opt, spec)
        total_steps += 1
        visualizer.accumulate_losses({k: float(v) for k, v in items.items()})
        if total_steps % opt.print_freq == 0:
            visualizer.print_losses(total_steps)
        if total_steps % opt.save_iter_freq == 0 or total_steps == stop_at:
            save_pytree_npz(os.path.join(ckpt_dir, f"{total_steps}_gen.npz"),
                            state)

    loss = float(items["loss_total"]) if "loss_total" in items else \
        float(list(items.values())[0])
    visualizer.print_details(
        f"generalizable training done: {total_steps} steps in "
        f"{time.time() - t0:.1f}s")
    return {"total_steps": total_steps, "state": state, "spec": spec,
            "last_items": {k: float(v) for k, v in items.items()}}


if __name__ == "__main__":
    main(options_from_cli())
