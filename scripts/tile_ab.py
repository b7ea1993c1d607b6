"""A/B the fused-kernel tile size (trunk_tile) on the bench workload.

Round-4 found tile 1024 exceeds the default 16 MB scoped-VMEM limit; the
trunk_tile knob now raises vmem_limit_bytes automatically for tiles > 512.
This measures whether bigger tiles (fewer grid steps, longer MXU pipelines)
actually buy anything at bench shapes.

Run:  python scripts/tile_ab.py [--tiles 512,768,1024] [--dispatches 6]
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

sys.path.insert(0, ".")


def run_one(tile: int, dispatches: int) -> float:
    import jax
    import jax.numpy as jnp
    from bench import make_workload
    from pointnerf_tpu.train import trainer

    opt, state, spec, grid, ts, batch = make_workload(trunk_tile=tile)
    R = opt.random_sample_size ** 2
    S = opt.steps_per_dispatch
    key = jax.random.PRNGKey(1)
    batches = {k: (jnp.stack([v] * S) if hasattr(v, "ndim") else
                   jnp.full((S,), v, jnp.float32))
               for k, v in batch.items()}
    ts, items = trainer.train_steps_scan(ts, grid, batches, key, opt, spec)
    loss0 = float(items["loss_total"][-1])
    t0 = time.perf_counter()
    for _ in range(dispatches):
        ts, items = trainer.train_steps_scan(ts, grid, batches, key, opt, spec)
    final = float(items["loss_total"][-1])
    dt = time.perf_counter() - t0
    assert np.isfinite(final)
    rps = dispatches * S * R / dt
    return rps, loss0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="512,768,1024")
    ap.add_argument("--dispatches", type=int, default=6)
    args = ap.parse_args()
    out = {}
    for t in [int(x) for x in args.tiles.split(",")]:
        try:
            rps, loss0 = run_one(t, args.dispatches)
            out[f"tile_{t}"] = {"rays_per_sec": round(rps, 1),
                                "loss0": round(loss0, 6)}
        except Exception as e:  # noqa: BLE001
            out[f"tile_{t}"] = f"FAILED: {str(e)[:200]}"
        print(json.dumps({f"tile_{t}": out[f"tile_{t}"]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
