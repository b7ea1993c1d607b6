"""Dump the HLO context of the MP train step's largest all-reduces.

VERDICT r4 weak item 4: the point-sharded step all-reduces gathered-ROW
cotangents (f32[S,42] / f32[S,32]) instead of reducing the [cap,·] point
buffers after a local scatter. This probe compiles the production MP step
on the virtual CPU mesh (smaller shapes by default — same program
structure) and prints, for each all-reduce above a size threshold, the
producing and consuming HLO lines, so the resharding choice GSPMD made is
visible instead of guessed at.

Run:  JAX_PLATFORMS=cpu python scripts/mp_hlo_context.py [--rays 900]
"""

from __future__ import annotations

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import os as _os, sys as _sys
_d = _os.path.dirname(_os.path.abspath(__file__))
_sys.path[:0] = [_d, _os.path.dirname(_d)]
from pointnerf_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()  # host-keyed persistent compile cache (utils/cache.py)

import argparse
import re
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=900)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--superset_P", type=int, default=32)
    ap.add_argument("--min_mib", type=float, default=1.0)
    ap.add_argument("--context", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, ".")
    import math
    from bench import make_workload
    from pointnerf_tpu.parallel import make_mesh, make_mp_train_step
    from pointnerf_tpu.parallel.points import shard_state, shard_grid

    rss = int(math.isqrt(args.rays))
    opt, state, spec, grid, ts, batch = make_workload(
        random_sample_size=rss, superset_P=args.superset_P)
    mesh = make_mesh(n_devices=args.devices, batch_size=1, points=2)
    ts = shard_state(ts, mesh)
    grid = shard_grid(grid, spec, mesh)
    step = make_mp_train_step(opt, spec, mesh, batch, ts, grid)
    import jax.numpy as jnp
    key = jax.random.PRNGKey(0)
    lowered = step.lower(ts, grid, batch, key)
    compiled = lowered.compile()
    text = compiled.as_text()
    lines = text.splitlines()

    dt_bytes = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "s8": 1, "u8": 1,
                "pred": 1}
    pat = re.compile(r"(\%?[\w.-]+) = (?:\()?(\w+)\[([0-9,]*)\][^=]*?"
                     r"(all-reduce|all-gather|reduce-scatter)\(([^)]*)\)")
    defs = {}
    for i, ln in enumerate(lines):
        m = re.match(r"\s*(\%?[\w.-]+) = ", ln)
        if m:
            defs.setdefault(m.group(1), i)

    found = 0
    for i, ln in enumerate(lines):
        m = pat.search(ln)
        if not m:
            continue
        name, dt, dims, kind, operands = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        mib = n * dt_bytes.get(dt, 4) / 2**20
        if mib < args.min_mib:
            continue
        found += 1
        print(f"\n===== {kind} {dt}[{dims}] {mib:.2f} MiB  ({name})")
        print("  OP :", ln.strip()[:400])
        # producers: first operand ids
        for op in re.findall(r"(\%?[\w.-]+)", operands)[:2]:
            j = defs.get(op)
            if j is not None:
                print("  IN :", lines[j].strip()[:400])
        # consumers: lines mentioning the result name
        shown = 0
        for j in range(i + 1, min(i + 400, len(lines))):
            if name + ")" in lines[j] or name + "," in lines[j] \
                    or name + " " in lines[j]:
                print("  OUT:", lines[j].strip()[:400])
                shown += 1
                if shown >= args.context:
                    break
    print(f"\n{found} collectives >= {args.min_mib} MiB")


if __name__ == "__main__":
    main()
