"""Speed-of-light analysis of the train step (VERDICT r2 item 2).

Uses XLA's own compiled cost analysis (flops + bytes accessed) for the exact
bench program, and compares the measured step time against the hardware
roofline:

    SoL ms = max(flops / peak_flops, hbm_bytes / hbm_bw)

v5e single-chip peaks (public: cloud.google.com/tpu/docs/v5e): 197 TFLOP/s
bf16, ~98.5 TFLOP/s fp32 (MXU f32 at half bf16 rate), HBM 819 GB/s. The
analysis prints per-phase flops/bytes, arithmetic intensity, the roofline
bound, and measured-vs-SoL efficiency — quantifying how much the
gather/scatter-bound step leaves on the table.

Run: python scripts/roofline.py [--rays 3600] [--iters 8]
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

PEAK_F32 = 98.5e12        # FLOP/s
PEAK_BF16 = 197e12
HBM_BW = 819e9            # B/s


def cost_of(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    # bytes accessed: top-level key plus per-operand breakdown; the top-level
    # "bytes accessed" is XLA's total (HBM traffic upper bound — on-chip
    # reuse can only reduce it)
    byts = float(ca.get("bytes accessed", 0.0))
    return flops, byts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rays", type=int, default=3600)
    ap.add_argument("--superset_P", type=int, default=None,
                    help="override preset superset_P (the remote compile "
                    "service 413-rejects the largest standalone phase "
                    "programs at P2=64; the full train step compiles)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from bench import make_workload
    from pointnerf_tpu.models.renderer import render_forward, render_query
    from pointnerf_tpu.train import trainer

    import math
    rss = int(math.isqrt(args.rays))
    over = {"random_sample_size": rss}
    if args.superset_P is not None:
        over["superset_P"] = args.superset_P
    opt, state, spec, grid, ts, batch = make_workload(**over)
    S = args.iters
    key0 = jax.random.PRNGKey(7)
    point_state = trainer.point_state_of(ts)

    def query_scan():
        def body(c, i):
            q = render_query(point_state, grid, spec, opt, batch,
                             jax.random.fold_in(key0, i), is_train=True)
            pidx = q.comp[2] if q.comp is not None else q.sample_pidx
            return c + jnp.sum(pidx) + jnp.sum(q.sample_loc_w), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(S))
        return c

    def fwd_scan():
        def body(c, i):
            out = render_forward(ts.agg_params, point_state, grid, spec, opt,
                                 batch, jax.random.fold_in(key0, i),
                                 is_train=True)
            return c + jnp.sum(out["coarse_raycolor"]), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(S))
        return c

    def step_scan(ts, batches):
        new_ts, items = trainer.train_steps_scan_impl(ts, grid, batches, key0,
                                                      opt, spec)
        return new_ts, items["loss_total"][-1]

    batches = {k: (jnp.stack([v] * S) if hasattr(v, "ndim")
                   else jnp.full((S,), v, jnp.float32))
               for k, v in batch.items()}

    rows = []
    measured = {}
    for name, fn, fargs in (
            ("query", query_scan, ()),
            ("forward", fwd_scan, ()),
            ("full_step", step_scan, (ts, batches))):
        jitted = jax.jit(fn) if not fargs else \
            jax.jit(fn, static_argnames=())
        lowered = jitted.lower(*fargs)
        compiled = lowered.compile()
        flops, byts = cost_of(compiled)
        # time it (host scalar fetch as the completion barrier)
        out = jitted(*fargs)
        leaf = jax.tree.leaves(out)[-1]
        float(jnp.sum(leaf.astype(jnp.float32))
              if hasattr(leaf, "astype") else leaf)
        t0 = time.perf_counter()
        out = jitted(*fargs)
        leaf = jax.tree.leaves(out)[-1]
        float(jnp.sum(leaf.astype(jnp.float32))
              if hasattr(leaf, "astype") else leaf)
        dt = time.perf_counter() - t0
        ms = dt / S * 1000.0
        measured[name] = ms

        flops_i, bytes_i = flops / S, byts / S
        t_flops_ms = flops_i / PEAK_F32 * 1e3
        t_bytes_ms = bytes_i / HBM_BW * 1e3
        sol_ms = max(t_flops_ms, t_bytes_ms)
        rows.append({
            "phase": name,
            "gflops_per_iter": round(flops_i / 1e9, 2),
            "gbytes_per_iter": round(bytes_i / 1e9, 3),
            "intensity_flop_per_byte": round(flops_i / max(bytes_i, 1), 2),
            "roofline_flops_ms": round(t_flops_ms, 2),
            "roofline_hbm_ms": round(t_bytes_ms, 2),
            "sol_ms": round(sol_ms, 2),
            "measured_ms": round(ms, 2),
            "pct_of_sol": round(100.0 * sol_ms / ms, 1) if ms > 0 else None,
        })

    for r in rows:
        print(json.dumps(r))
    step = rows[-1]
    print(json.dumps({
        "summary": "train_step",
        "rays_per_sec": round(args.rays / measured["full_step"] * 1000.0, 1),
        "bound": "HBM" if step["roofline_hbm_ms"] > step["roofline_flops_ms"]
                 else "FLOPs",
        "sol_rays_per_sec": round(args.rays / step["sol_ms"] * 1000.0, 1),
        "efficiency_pct": step["pct_of_sol"],
    }))


if __name__ == "__main__":
    main()
