"""Pallas / layout candidates for the [S,42] -> [cap,42] scatter-add floor.

scatter_micro.py established (real chip, S=64 scans): base 6.06 ms,
sorted-scatter 3.77 ms but the row permute to feed it costs 4.78 ms —
every pipeline that touches the 384k rows twice loses. Candidates that
touch them once:

  pallas    whole [cap,42] accumulator resident in VMEM (17.2 MB, raised
            scoped limit), sequential grid over input tiles, per-row
            dynamic-index read-modify-write in VMEM.
  banks     XLA scatter into [NB*cap,42] with idx' = (i%NB)*cap + idx
            (spreads run collisions across NB banks), then a dense
            [NB,cap,42] sum — trades 0.2 ms of dense reduce for shallower
            collision depth in the scatter loop.

Run:  python scripts/scatter_pallas.py [--S 384000] [--cap 102400]
"""

from __future__ import annotations

import os

import os as _os, sys as _sys
_d = _os.path.dirname(_os.path.abspath(__file__))
_sys.path[:0] = [_d, _os.path.dirname(_d)]
from pointnerf_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()  # host-keyed persistent compile cache (utils/cache.py)

import argparse
import functools
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=384000)
    ap.add_argument("--cap", type=int, default=102400)
    ap.add_argument("--C", type=int, default=42)
    ap.add_argument("--scan", type=int, default=64)
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--banks", type=int, default=8)
    ap.add_argument("--dup", type=float, default=6.0)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, cap, C, SC, T = args.S, args.cap, args.C, args.scan, args.tile
    NB = args.banks
    rng = np.random.RandomState(0)
    uniq = max(1, int(S / args.dup))
    pool = rng.choice(cap, uniq, replace=False)
    idx_np = pool[rng.randint(0, uniq, S)].astype(np.int32)
    upd_np = rng.uniform(-1, 1, (S, C)).astype(np.float32)
    idx = jnp.asarray(idx_np)
    upd = jnp.asarray(upd_np)

    results = {"S": S, "cap": cap, "C": C, "dup": args.dup, "scan": SC,
               "tile": T, "banks": NB, "backend": jax.default_backend()}

    # ---- pallas per-row VMEM accumulator ------------------------------
    def _kernel(idx_ref, upd_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        def body(i, carry):
            r = idx_ref[i]
            row = upd_ref[pl.ds(i, 1), :]
            out_ref[pl.ds(r, 1), :] = out_ref[pl.ds(r, 1), :] + row
            return carry

        jax.lax.fori_loop(0, T, body, 0)

    @jax.jit
    def pallas_scatter(i, u):
        grid = S // T
        return pl.pallas_call(
            _kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((T,), lambda g: (g,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((T, C), lambda g: (g, 0)),
            ],
            out_specs=pl.BlockSpec((cap, C), lambda g: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((cap, C), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(i, u)

    # ---- bank-split XLA scatter ---------------------------------------
    @jax.jit
    def bank_scatter(i, u):
        lane = jnp.arange(S, dtype=jnp.int32) % NB
        i2 = lane * cap + i
        out = jnp.zeros((NB * cap, C), jnp.float32).at[i2].add(u)
        return out.reshape(NB, cap, C).sum(0)

    @jax.jit
    def base(i, u):
        return jnp.zeros((cap, C), jnp.float32).at[i].add(u)

    # correctness first
    want = np.zeros((cap, C), np.float32)
    np.add.at(want, idx_np, upd_np)
    for name, fn in (("pallas", pallas_scatter), ("banks", bank_scatter),
                     ("base", base)):
        try:
            got = np.asarray(fn(idx, upd))
            err = float(np.abs(got - want).max())
            results[f"{name}_maxerr"] = err
            assert err < 1e-3, (name, err)
        except Exception as e:  # noqa: BLE001
            results[f"{name}_maxerr"] = f"FAILED: {str(e)[:200]}"

    def scan_time(body):
        @jax.jit
        def f():
            c, _ = jax.lax.scan(lambda c, i2: (c + body(i2), None),
                                jnp.float32(0), jnp.arange(SC))
            return c
        float(f())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(f())
            best = min(best, time.perf_counter() - t0)
        return best / SC * 1e3

    def vary(i):
        return 1.0 + 1e-6 * i.astype(jnp.float32)

    for name, fn in (("base_ms", base), ("banks_ms", bank_scatter),
                     ("pallas_ms", pallas_scatter)):
        if isinstance(results.get(f"{name.split('_')[0]}_maxerr"), str):
            results[name] = "skipped (correctness failed)"
            continue
        try:
            ms = scan_time(lambda i2, fn=fn: fn(idx, upd * vary(i2))[0, 0])
            results[name] = round(ms, 3)
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAILED: {str(e)[:200]}"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
