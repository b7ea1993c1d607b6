"""Decompose the 800x800 serving render: where do the 14 s/image go?

Builds the exact bench workload (bench.make_workload: lego preset, ~100k-pt
cloud) and times a full 800x800 render through run.common.render_image —
the production serving path (grouped lax.map dispatch + SR-budget ladder) —
plus one isolated group dispatch per budget rung so ladder escalation cost
is visible.

Run:  python scripts/serving_probe.py [--side 800] [--group 8]
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
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=800)
    ap.add_argument("--group", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from bench import make_workload
    from pointnerf_tpu.run.common import render_image, CONST_BATCH_KEYS
    from pointnerf_tpu.models.renderer import effective_sr_budget
    from pointnerf_tpu.train import trainer
    from pointnerf_tpu.data.base import chunks_of_item

    opt, state, spec, grid, ts, batch = make_workload()
    side = args.side
    R = side * side
    chunk = opt.random_sample_size ** 2

    # full-image ray grid through the bench camera
    px, py = np.meshgrid(np.arange(side), np.arange(side))
    u = (px.reshape(-1) + 0.5) / side * 0.9 - 0.45
    v = (py.reshape(-1) + 0.5) / side * 0.9 - 0.45
    camrot = np.asarray(batch["camrotc2w"])
    rd = np.stack([u, v, np.ones_like(u)], -1).astype(np.float32) @ camrot[0].T
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    item = {
        "h": side, "w": side,
        "raydir": rd[None],
        "pixel_idx": np.stack([px.reshape(-1), py.reshape(-1)], -1)[None],
        "campos": np.asarray(batch["campos"]),
        "camrotc2w": camrot,
        "near": float(opt.near_plane), "far": float(opt.far_plane),
        "bg_color": np.ones((1, 3), np.float32),
    }
    print(json.dumps({"side": side, "chunk": chunk,
                      "n_chunks": -(-R // chunk), "group": args.group,
                      "train_budget": effective_sr_budget(opt, chunk * opt.SR),
                      "SR": opt.SR}))

    # ---- isolated group dispatch per budget rung (compile + steady)
    const_batch = {k: jnp.asarray(item[k]) for k in CONST_BATCH_KEYS
                   if k in item}
    subs = []
    for sub, s, e in chunks_of_item(item, chunk):
        subs.append(sub)
        if len(subs) == args.group:
            break
    stacked = {"raydir": jnp.asarray(np.stack([s["raydir"] for s in subs]))}
    for mode, fn in (("map", trainer.eval_chunks),
                     ("stacked", trainer.eval_chunks_stacked)):
        for label, o in (("rung0_train_budget", opt),
                         ("rung2_budget_off", opt.replace(SR_budget=0))):
            if mode == "stacked" and label == "rung2_budget_off":
                # known HBM OOM at production group shapes (85.7 GB) — the
                # production ladder renders its budget-off rung per-chunk
                # (run/common.py::run_group); each OOM attempt burns ~3 min
                # of remote compile, so skip it here
                continue
            outs = fn(ts, grid, stacked, const_batch, o, spec)
            float(jnp.sum(outs["coarse_raycolor"]))
            t0 = time.perf_counter()
            for _ in range(3):
                outs = fn(ts, grid, stacked, const_batch, o, spec)
            over = int(np.asarray(outs["sr_overflow"]).sum())
            float(jnp.sum(outs["coarse_raycolor"]))
            dt = (time.perf_counter() - t0) / 3
            print(json.dumps({
                "mode": mode,
                label + "_ms_per_group": round(dt * 1000.0, 1),
                "rays_per_group": chunk * args.group,
                "krays_per_s": round(chunk * args.group / dt / 1e3, 1),
                "sr_overflow": over}), flush=True)

    # ---- full image through the production path, both group modes
    # (render twice: first pass pays compiles, second is steady state)
    for stack in (True, False):
        t0 = time.perf_counter()
        maps = render_image(ts, grid, opt, spec, item, group=args.group,
                            stack=stack)
        dt_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        maps = render_image(ts, grid, opt, spec, item, group=args.group,
                            stack=stack)
        dt = time.perf_counter() - t0
        print(json.dumps({"stack": stack, "render_s_cold": round(dt_cold, 2),
                          "render_s_steady": round(dt, 2),
                          "krays_per_s": round(R / dt / 1e3, 1),
                          "finite": bool(np.isfinite(
                              maps["coarse_raycolor"]).all())}), flush=True)


if __name__ == "__main__":
    main()
