"""Per-scene finetune driver — the flagship entry point.

Reference: run/train_ft.py (epoch loop :829-1011, probe_hole :417-530,
test :252-414). Structural deltas, all TPU-motivated:

* prune/grow are masked buffer updates — no optimizer rebuild, no process
  restart (the reference saves + exit()s after every grow, :878-911, relying
  on an outer bash loop); capacity exhaustion triggers a host-side buffer
  expansion that preserves per-slot Adam moments;
* the voxel grid is rebuilt only when points move (prune/grow), not every
  step (reference rebuilds per step inside the CUDA querier);
* everything in the hot loop is one jitted train_step with static shapes.

Usage: python -m pointnerf_tpu.run.train_ft --preset nerf_synth:lego \
           --data_root <dir> [--flag value ...]
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Options
from ..data import create_dataset
from ..models import neural_points as npc
from ..train import trainer
from ..data.loader import Prefetcher
from ..utils.checkpoint import save_checkpoint, load_checkpoint, latest_step
from ..utils.profiling import PhaseTimer, device_trace
from ..utils.metrics import psnr as psnr_fn, report_metrics
from ..models.networks import PlateauTracker
from ..utils.visualizer import Visualizer
from .common import (init_point_state_from_dataset, make_spec_and_grid,
                     options_from_cli, render_image, PROBE_KEYS)


def bloat_mask(mask: np.ndarray, shift: int = 1) -> np.ndarray:
    """Dilate a [H,W] bool mask by ±shift pixels (reference bloat_inds,
    train_ft.py:532-540)."""
    out = mask.copy()
    H, W = mask.shape
    for dy in range(-shift, shift + 1):
        for dx in range(-shift, shift + 1):
            ys = slice(max(0, dy), min(H, H + dy))
            yd = slice(max(0, -dy), min(H, H - dy))
            xs = slice(max(0, dx), min(W, W + dx))
            xd = slice(max(0, -dx), min(W, W - dx))
            out[yd, xd] |= mask[ys, xs]
    return out


def probe_hole(ts, grid, opt, spec, dataset, frame_ids, visualizer,
               total_steps: int, runner=None) -> Dict[str, np.ndarray]:
    """Find ray-miss holes and collect new point candidates
    (reference: train_ft.py:417-530). Under a mesh runner the enlarged
    probe grid is placed on the mesh and the prob renders run SPMD."""
    # tiered query-size enlargement (reference :425-430)
    probe_opt = opt
    if len(opt.prob_kernel_size) >= 3:
        tier = int(np.sum(np.asarray(opt.prob_tiers) < total_steps))
        ks = opt.prob_kernel_size[tier * 3: tier * 3 + 3]
        if len(ks) == 3:
            probe_opt = opt.replace(query_size=tuple(int(k) for k in ks))
    probe_opt = probe_opt.replace(random_sample="no_crop")
    # enlarged dilation needs a re-specced grid
    from .common import make_spec_and_grid
    from ..ops.grid import build_grid, make_grid_spec
    pstate = trainer.point_state_of(ts)
    mask = np.asarray(pstate["mask"])
    xyz_np = np.asarray(pstate["xyz"])[mask]
    pspec = make_grid_spec(probe_opt, points_min=xyz_np.min(0),
                           points_max=xyz_np.max(0), max_points=int(mask.sum()))
    pgrid = build_grid(pstate["xyz"], pstate["mask"], pspec)
    if runner is not None:
        pgrid = runner.place_grid(pgrid, pspec)

    cand: Dict[str, list] = {k: [] for k in
                             ("xyz", "embedding", "color", "dir", "conf")}
    for fid in frame_ids:
        item = dataset.get_item(int(fid), full_img=True)
        maps = render_image(ts, pgrid, probe_opt, pspec, item, prob=True,
                            keys=PROBE_KEYS,
                            mesh=None if runner is None else runner.mesh)
        H, W = int(item["h"]), int(item["w"])
        gt = item["gt_image"][0].reshape(H, W, 3)
        bg = item["bg_color"][0]

        ray_mask = maps["ray_mask"][..., 0] > 0
        nonbg = np.linalg.norm(gt - bg, axis=-1) > 0.002
        miss = (~ray_mask) & nonbg
        neighboring = bloat_mask(miss, 1)
        if opt.far_thresh > 0 and "ray_max_far_dist" in maps:
            far = ray_mask & (maps["ray_max_far_dist"][..., 0] > opt.far_thresh) \
                & (np.linalg.norm(gt - maps["coarse_raycolor"], axis=-1) < 0.1)
            neighboring |= far
        sel = ray_mask & neighboring & \
            (maps["ray_max_shading_opacity"][..., 0] > opt.prob_thresh)
        if not sel.any():
            continue
        cand["xyz"].append(maps["ray_max_sample_loc_w"][sel])
        cand["embedding"].append(maps["shading_avg_embedding"][sel])
        cand["color"].append(maps["shading_avg_color"][sel])
        cand["dir"].append(maps["shading_avg_dir"][sel])
        cand["conf"].append(maps["shading_avg_conf"][sel] * opt.prob_mul)

    if not cand["xyz"]:
        return {}
    out = {k: np.concatenate(v, axis=0) for k, v in cand.items()}
    # planepoints bg: never grow onto the background plane
    # (reference: train_ft.py:524-527 filter_plane via masking)
    if opt.bgmodel.startswith("planepoints") and hasattr(dataset, "filter_plane"):
        keep = ~np.asarray(dataset.filter_plane(out["xyz"]))
        out = {k: v[keep] for k, v in out.items()}
        if not len(out["xyz"]):
            return {}
    visualizer.save_neural_points(f"prob{total_steps:04d}", out["xyz"], None)
    visualizer.print_details(
        f"probe_hole found {len(out['xyz'])} candidate points")
    return out


def grow_from_candidates(ts, opt, cand: Dict[str, np.ndarray]):
    """Masked grow, expanding capacity if free slots run out
    (reference exits the process here, train_ft.py:878-911)."""
    state = trainer.point_state_of(ts)
    n_new = len(cand["xyz"])
    free = int(np.sum(~np.asarray(state["mask"])))
    if n_new > free:
        new_cap = npc.round_capacity(state["mask"].shape[0] + (n_new - free))
        ts = trainer.expand_capacity(ts, new_cap)
        state = trainer.point_state_of(ts)
    grown, dropped = npc.grow(
        state,
        jnp.asarray(cand["xyz"]), jnp.asarray(cand["embedding"]),
        jnp.asarray(cand["color"]), jnp.asarray(cand["dir"]),
        jnp.asarray(cand["conf"]),
        jnp.ones((n_new,), bool))
    pt_train, pt_static = trainer.split_point_params(grown, opt)
    return ts._replace(pt_train=pt_train, pt_static=pt_static), int(dropped)


def prune_points(ts, opt):
    state = trainer.point_state_of(ts)
    pruned = npc.prune(state, opt.prune_thresh)
    pt_train, pt_static = trainer.split_point_params(pruned, opt)
    return ts._replace(pt_train=pt_train, pt_static=pt_static)


def _test_loss_items(opt, img, gt, ray_mask):
    """Per-image test losses for opt.test_color_loss_items (reference logs the
    same masked/miss/plain MSE triplet at test, base_rendering_model.py:533-662)."""
    items = {}
    mask = ray_mask.astype(bool).reshape(-1)
    d2 = np.square(img.reshape(-1, 3) - gt.reshape(-1, 3))
    for name in opt.test_color_loss_items:
        if name.startswith("ray_masked"):
            v = float(d2[mask].mean()) if mask.any() else 0.0
        elif name.startswith("ray_miss"):
            v = float(d2[~mask].sum()) / 3.0
        else:
            v = float(d2.mean())
        items["loss_" + name] = v
    return items


def _visual_maps(opt, maps, gt):
    """Select the maps opt.visual_items asks for (reference visual_items flag).
    ray_masked/ray_miss variants are the render masked to hit/miss rays."""
    rm = maps["ray_mask"].astype(bool)
    out = {}
    for name in opt.visual_items:
        if name == "gt_image":
            out[name] = gt
        elif name in maps:
            out[name] = maps[name]
        elif name.startswith("ray_masked") and name[len("ray_masked") + 1:] in maps:
            out[name] = np.where(rm, maps[name[len("ray_masked") + 1:]], 1.0)
        elif name.startswith("ray_miss") and name[len("ray_miss") + 1:] in maps:
            out[name] = np.where(rm, 1.0, maps[name[len("ray_miss") + 1:]])
    return out


def test(ts, grid, opt, spec, dataset, visualizer, total_steps: int,
         max_images: Optional[int] = None, write_images: bool = True,
         bg_maps=None, mesh=None) -> float:
    """Render the held-out split, PSNR per image (reference: train_ft.py:252-414)."""
    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    psnrs = []
    agg_items: Dict[str, list] = {}
    for i in range(n):
        item = dataset.get_item(i, full_img=True)
        if bg_maps is not None:
            pix = item["pixel_idx"][0].astype(np.int64)
            item["bg_ray"] = bg_maps[i][pix[:, 1], pix[:, 0]][None]
        maps = render_image(ts, grid, opt.replace(random_sample="no_crop"),
                            spec, item, keys=("coarse_raycolor", "ray_mask"),
                            mesh=mesh)
        H, W = int(item["h"]), int(item["w"])
        gt = item["gt_image"][0].reshape(H, W, 3)
        img = maps["coarse_raycolor"]
        # rays the querier skipped render bg (fill_invalid equivalent)
        p = psnr_fn(gt, img)
        psnrs.append(p)
        for k, v in _test_loss_items(opt, img, gt, maps["ray_mask"]).items():
            agg_items.setdefault(k, []).append(v)
        if write_images:
            visualizer.display_current_results(
                _visual_maps(opt, maps, gt), i, subdir=f"test_{total_steps}")
    mean_psnr = float(np.mean(psnrs))
    detail = "  ".join(f"{k}: {np.mean(v):.6f}" for k, v in
                       sorted(agg_items.items()))
    visualizer.print_details(
        f"test at {total_steps}: PSNR {mean_psnr:.3f} over {n} images  {detail}")
    return mean_psnr


def main(opt: Options, max_steps: Optional[int] = None) -> Dict:
    if opt.timestamp:
        # reference base_options appends launch time to the experiment name
        opt = opt.replace(timestamp=False, experiment=opt.experiment
                          + time.strftime("_%m%d_%H%M%S"))
    if opt.verbose:
        print(opt.to_json())
    key = jax.random.PRNGKey(opt.seed)
    rng = np.random.RandomState(opt.seed)
    # --n_devices / --gpu_ids: SPMD over a device mesh (the reference's
    # DataParallel flag, models/neural_points_volumetric_model.py:165-168)
    from ..parallel import make_runner
    runner = make_runner(opt)
    mesh = None if runner is None else runner.mesh
    ckpt_dir = os.path.join(opt.checkpoints_dir, opt.experiment)
    os.makedirs(ckpt_dir, exist_ok=True)
    with open(os.path.join(ckpt_dir, "opt.json"), "w") as f:
        f.write(opt.to_json())
    visualizer = Visualizer(opt)

    train_ds = create_dataset(opt, split="train")
    test_ds = create_dataset(opt, split="test")

    # ---------------------------------------------------------------- init/resume
    if opt.load_points >= 1:
        # BRANCH C: provided COLMAP/sensor points (reference: train_ft.py:649-673)
        point_state = init_point_state_from_dataset(opt, train_ds, key)
    else:
        # BRANCH B: MVSNet depth init (reference: train_ft.py:51-167)
        from .common import gen_points_filter_embeddings
        point_state = gen_points_filter_embeddings(opt, train_ds, key)

    if opt.bgmodel.startswith("planepoints") and \
            hasattr(train_ds, "get_plane_param_points"):
        # background plane points join the cloud at init
        # (reference: dtu_ft get_plane_param_points + train_ft bgmodel wiring)
        from ..models.neural_points import create_point_cloud
        bx, bemb, bdir, bcol, bconf = train_ds.get_plane_param_points(rng)
        mask = np.asarray(point_state["mask"])
        def cat(k, extra):
            a = np.asarray(point_state[k])[mask]
            return np.concatenate([a, extra], axis=0)
        point_state = create_point_cloud(
            cat("xyz", bx), cat("embedding", bemb[:, :point_state["embedding"].shape[1]]),
            cat("color", bcol), cat("dir", bdir), cat("conf", bconf))
        visualizer.print_details(f"added {len(bx)} background plane points")
    ts = trainer.create_train_state(opt, key, point_state)

    # plane background: precompute per-frame bg maps from the init views
    # (reference: train_ft.py:788-798 create_all_bg + :928-936 per-batch wiring)
    bg_train = bg_test = None
    if opt.bgmodel.endswith("plane") and getattr(train_ds, "view_id_list", None) \
            and hasattr(train_ds, "get_plane_param"):
        from ..models.mvs import bg as bgmod
        views = bgmod.collect_bg_views(train_ds, opt.init_view_num)
        st = trainer.point_state_of(ts)
        fg_xyz = np.asarray(st["xyz"])[np.asarray(st["mask"])]
        plane_params = train_ds.get_plane_param()
        bg_train = bgmod.create_all_bg(train_ds, views, fg_xyz, plane_params)
        bg_test = bgmod.create_all_bg(test_ds, views, fg_xyz, plane_params)
        visualizer.print_details(
            f"plane background precomputed for {len(bg_train)} train / "
            f"{len(bg_test)} test frames")

    total_steps, best_psnr, best_iter = 0, 0.0, 0
    # PSNR is a quality score: max-mode rel-threshold semantics (feeding a
    # negated score into min mode never fires for negative metrics — the
    # rel-threshold math assumes positive values; see PlateauTracker)
    plateau = PlateauTracker(mode="max") if opt.lr_policy == "plateau" else None

    def extra_counters():
        """Driver state persisted beyond the reference's four counters: the
        plateau-reduced effective lr/plr and the tracker state, so resume
        does not silently undo LR reductions."""
        out = {"lr": opt.lr, "plr": opt.plr}
        if plateau is not None:
            out.update(plateau.state_dict())
        return out

    if latest_step(ckpt_dir) is not None:
        ts, counters = load_checkpoint(ckpt_dir, ts)
        total_steps = counters["total_steps"]
        best_psnr = counters.get("best_PSNR", 0.0)
        best_iter = counters.get("best_iter", 0)
        if "lr" in counters:
            opt = opt.replace(lr=counters["lr"], plr=counters["plr"])
        if plateau is not None:
            plateau.load_state_dict(counters)
        visualizer.print_details(f"resumed at step {total_steps}")
    spec, grid = make_spec_and_grid(opt, trainer.point_state_of(ts))
    if runner is not None:
        ts = runner.place_state(ts)
        grid = runner.place_grid(grid, spec)
        visualizer.print_details(
            f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} over "
            f"{runner.n_devices} devices"
            + (" (point buffers sharded)" if runner.points > 1 else ""))

    n_active = int(npc.num_active(trainer.point_state_of(ts)))
    visualizer.print_details(
        f"start: {n_active} active points, grid {spec.vdim}, steps {total_steps}")

    # ray-miss frame ranking (reference: mvs_points_volumetric_model.py:134-166)
    num_probe = max(1, len(train_ds) // max(1, opt.prob_num_step))
    top_miss_loss = np.zeros(num_probe + 1, np.float32)
    top_miss_ids = np.arange(num_probe + 1, dtype=np.int64) % len(train_ds)

    stop_at = min(opt.maximum_step, total_steps + max_steps) if max_steps \
        else opt.maximum_step
    t_start = time.time()
    timer = PhaseTimer()

    # background host-batch preparation (decoupled rng stream; the device
    # crunches step k while the host assembles step k+1)
    data_rng = np.random.RandomState(opt.seed + 9999)

    def produce():
        fid = int(data_rng.randint(len(train_ds)))
        item = train_ds.get_item(fid, rng=data_rng)
        if bg_train is not None:
            pix = item["pixel_idx"][0].astype(np.int64)
            item["bg_ray"] = bg_train[fid][pix[:, 1], pix[:, 0]][None]
        return fid, item

    prefetcher = Prefetcher(produce, depth=max(1, opt.prefetch_depth)
                            * max(1, opt.steps_per_dispatch))
    trace_ctx = device_trace(opt.profile_dir)
    trace_ctx.__enter__()
    while total_steps < stop_at:
        # ------------------------------------------------ prune (reference :834-842)
        if opt.prune_iter > 0 and 0 < total_steps <= opt.prune_max_iter \
                and total_steps % opt.prune_iter == 0:
            if runner is not None:   # gather -> host rebuild -> reshard
                ts = runner.gather_state(ts)
            before = int(npc.num_active(trainer.point_state_of(ts)))
            ts = prune_points(ts, opt)
            grid = trainer.rebuild_grid(ts, spec)
            if runner is not None:
                ts = runner.place_state(ts)
                grid = runner.place_grid(grid, spec)
            after = int(npc.num_active(trainer.point_state_of(ts)))
            visualizer.print_details(
                f"prune at {total_steps}: {before} -> {after} points")

        # ------------------------------------------------ grow (reference :844-911)
        if opt.prob_freq > 0 and 0 < total_steps < opt.maximum_step - 1 \
                and total_steps % opt.prob_freq == 0:
            if top_miss_loss[0] > 1e-5 or opt.prob_mode != 0 or opt.far_thresh > 0:
                # frame selection (reference probe_hole :440-455 + prob_mode):
                # 0 + prob_top: top ray-miss train frames; 1: test frames;
                # otherwise random train frames
                probe_ds = train_ds
                if opt.prob_mode == 1:
                    probe_ds = test_ds
                    frame_ids = rng.permutation(len(test_ds))[:num_probe]
                elif opt.prob_mode == 0 and opt.prob_top == 1:
                    mask = top_miss_loss[:-1] > 0
                    frame_ids = top_miss_ids[:-1][mask][:num_probe]
                    if len(frame_ids) == 0:
                        frame_ids = rng.permutation(len(train_ds))[:num_probe]
                else:
                    frame_ids = rng.permutation(len(train_ds))[:num_probe]
                cand = probe_hole(ts, grid, opt, spec, probe_ds, frame_ids,
                                  visualizer, total_steps, runner=runner)
                if cand:
                    if runner is not None:
                        ts = runner.gather_state(ts)
                    before = int(npc.num_active(trainer.point_state_of(ts)))
                    ts, dropped = grow_from_candidates(ts, opt, cand)
                    grid = trainer.rebuild_grid(ts, spec)
                    if runner is not None:
                        ts = runner.place_state(ts)
                        grid = runner.place_grid(grid, spec)
                    after = int(npc.num_active(trainer.point_state_of(ts)))
                    visualizer.print_details(
                        f"grow at {total_steps}: {before} -> {after} points"
                        f" (dropped {dropped})")
                top_miss_loss[:] = 0
                top_miss_ids[:] = np.arange(num_probe + 1) % len(train_ds)

        # ------------------------------------------------ train steps
        # fuse up to steps_per_dispatch steps into one device dispatch,
        # clamped so prune/grow/print/save/test boundaries land exactly
        boundaries = [stop_at]
        for freq in (opt.prune_iter, opt.prob_freq, opt.print_freq,
                     opt.save_iter_freq, opt.test_freq, opt.save_point_freq,
                     opt.grid_rebuild_every if opt.xyz_grad > 0 else 0):
            if freq > 0:
                boundaries.append((total_steps // freq + 1) * freq)
        to_boundary = min(boundaries) - total_steps
        # only two program shapes ever compile: the full scan and chunk=1
        # (a clamped scan length would compile a fresh program per length)
        chunk = opt.steps_per_dispatch \
            if to_boundary >= opt.steps_per_dispatch else 1
        with timer.phase("host_data"):
            pulled = [prefetcher.get() for _ in range(chunk)]
        fids = [f for f, _ in pulled]
        host_items = [it for _, it in pulled]
        batch_keys = ("raydir", "campos", "camrotc2w", "near", "far",
                      "bg_color", "gt_image") + \
            (("bg_ray",) if bg_train is not None else ())
        with timer.phase("device_step"):
            if chunk == 1:
                batch = {k: jnp.asarray(host_items[0][k]) for k in batch_keys}
                if runner is not None:
                    ts, items = runner.train_step(ts, grid, batch, key, opt,
                                                  spec)
                else:
                    ts, items = trainer.train_step(ts, grid, batch, key, opt,
                                                   spec)
                step_items = [items]
            else:
                batches = {k: jnp.asarray(np.stack([it[k] for it in host_items]))
                           for k in batch_keys}
                if runner is not None:
                    ts, items_s = runner.train_steps_scan(ts, grid, batches,
                                                          key, opt, spec)
                else:
                    ts, items_s = trainer.train_steps_scan(ts, grid, batches,
                                                           key, opt, spec)
                items_np = {k: np.asarray(v) for k, v in items_s.items()}
                step_items = [{k: v[s] for k, v in items_np.items()}
                              for s in range(chunk)]
        total_steps += chunk

        if opt.grid_rebuild_every > 0 and opt.xyz_grad > 0 and \
                total_steps % opt.grid_rebuild_every == 0:
            grid = trainer.rebuild_grid(ts, spec)
            if runner is not None:
                grid = runner.place_grid(grid, spec)

        miss_key = "loss_ray_miss_coarse_raycolor"
        for fid, items in zip(fids, step_items):
            # ray-miss ranking update
            if opt.prob_freq > 0 and miss_key in items:
                loss_miss = float(items[miss_key])
                hit = np.flatnonzero(top_miss_ids == fid)
                if len(hit):
                    top_miss_loss[hit] = np.maximum(top_miss_loss[hit],
                                                    loss_miss)
                else:
                    top_miss_ids[-1] = fid
                    top_miss_loss[-1] = loss_miss
                order = np.argsort(-top_miss_loss, kind="stable")
                top_miss_loss = top_miss_loss[order]
                top_miss_ids = top_miss_ids[order]
            visualizer.accumulate_losses(
                {k: float(v) for k, v in items.items()})

        # ------------------------------------------ adaptive compaction budget
        # sr_overflow > 0 means valid shading rows were rendered empty this
        # dispatch (static-shape stand-in for the reference's dynamic
        # compaction). Raise the budget 1.5x — a rare recompile, same
        # numerics once the budget covers the scene again.
        overflow = max((float(it.get("sr_overflow", 0.0))
                        for it in step_items), default=0.0)
        if overflow > 0:
            from ..models.renderer import effective_sr_budget
            rows = opt.random_sample_size ** 2 * opt.SR
            cur = effective_sr_budget(opt, rows)
            new = min(rows, -(-int(cur * 1.5) // 128) * 128)
            if 0 < cur < new:
                opt = opt.replace(SR_budget=new)
                visualizer.print_details(
                    f"SR_budget overflow at {total_steps} "
                    f"({int(overflow)} rows dropped): budget {cur} -> {new}")
        if total_steps % opt.print_freq == 0:
            visualizer.print_losses(total_steps, extra=timer.summary())
            timer.reset()
        if opt.save_point_freq > 0 and total_steps % opt.save_point_freq == 0:
            st = trainer.point_state_of(ts)
            visualizer.save_neural_points(
                total_steps, np.asarray(st["xyz"]),
                np.asarray(st["color"]) if st["color"] is not None else None,
                np.asarray(st["conf"]) if st["conf"] is not None else None,
                np.asarray(st["mask"]))
        if total_steps % opt.save_iter_freq == 0:
            save_checkpoint(ckpt_dir, total_steps, ts, opt, best_psnr,
                            best_iter, extra_counters=extra_counters())
        if opt.test_freq > 0 and total_steps % opt.test_freq == 0:
            cur = test(ts, grid, opt, spec, test_ds, visualizer, total_steps,
                       max_images=opt.test_num, bg_maps=bg_test, mesh=mesh)
            if cur > best_psnr:
                best_psnr, best_iter = cur, total_steps
            if plateau is not None and plateau.update(cur):
                # lr_policy=plateau: reduce both lrs when held-out PSNR
                # plateaus (torch ReduceLROnPlateau semantics, reference
                # helpers/networks.py:50-55). Adam moments are lr-invariant;
                # swapping the static lr just recompiles the step.
                opt = opt.replace(lr=opt.lr * plateau.factor,
                                  plr=opt.plr * plateau.factor)
                visualizer.print_details(
                    f"plateau: lr -> {opt.lr:.3e}, plr -> {opt.plr:.3e}")

    # ---------------------------------------------------------------- final
    trace_ctx.__exit__(None, None, None)
    prefetcher.close()
    save_checkpoint(ckpt_dir, total_steps, ts, opt, best_psnr, best_iter,
                    extra_counters=extra_counters())
    final_psnr = test(ts, grid, opt, spec, test_ds, visualizer, total_steps,
                      bg_maps=bg_test, mesh=mesh)
    if final_psnr > best_psnr:
        best_psnr, best_iter = final_psnr, total_steps
    visualizer.print_details(
        f"done: {total_steps} steps in {time.time() - t_start:.1f}s, "
        f"final PSNR {final_psnr:.3f}, best {best_psnr:.3f}@{best_iter}")
    img_dir = os.path.join(visualizer.image_dir, f"test_{total_steps}")
    metric_names = ["psnr", "ssim", "rmse", "lpips", "vgglpips"]
    scores = report_metrics(
        img_dir, img_dir, img_dir, tuple(metric_names),
        lpips_weights={"lpips": opt.lpips_alex_path,
                       "vgglpips": opt.lpips_vgg_path})
    if opt.gen_vid:
        # final video over the render path (reference: train_ft.py:1014-1033)
        try:
            from .render_vid import render_vid
            render_ds = create_dataset(opt, split="render")
            render_vid(ts, grid, opt, spec, render_ds, visualizer, total_steps,
                       mesh=mesh)
        except Exception as e:  # dataset may not define a render path
            visualizer.print_details(f"gen_vid skipped: {e}")
    return {"total_steps": total_steps, "final_psnr": final_psnr,
            "best_psnr": best_psnr, "best_iter": best_iter, "scores": scores,
            "state": ts, "grid": grid, "spec": spec}


if __name__ == "__main__":
    main(options_from_cli())
