"""Micro-bench: the [S,42] -> [cap,42] point-gradient scatter-add floor.

VERDICT r4 item 1: the packed point-attribute scatter-add (5.8 ms isolated
at S=384k, cap=102.4k) is the named blocker on the 90k rays/s target.
Round-4 measured-and-rejected bf16 and sort+segment (sort in the hot path);
this probe decomposes the remaining candidates with S=64-iteration scan
timing (a bare jit call through the axon tunnel costs ~30 ms of dispatch
latency — the first version of this script timed exactly that):

  base      the production scatter-add (repeating indices)
  sorted    scatter with indices_are_sorted=True on PRE-sorted indices
            (c_pidx is a non-differentiable query output, so its argsort
            can be computed OUTSIDE the backward and amortized)
  argsort   the one-time cost of that argsort, charged to the step
  permute   the [S,42] row permute by the argsort order
  segsum    jax.ops.segment_sum with sorted segment ids
  combined  argsort + permute + sorted scatter fused in ONE program (what
            the custom-VJP gather would actually add to the step)

Run:  python scripts/scatter_micro.py [--S 384000] [--cap 102400]
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
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=384000)
    ap.add_argument("--cap", type=int, default=102400)
    ap.add_argument("--C", type=int, default=42)
    ap.add_argument("--scan", type=int, default=64)
    ap.add_argument("--dup", type=float, default=6.0,
                    help="average index repetition (S / unique)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    S, cap, C, SC = args.S, args.cap, args.C, args.scan
    rng = np.random.RandomState(0)
    uniq = max(1, int(S / args.dup))
    pool = rng.choice(cap, uniq, replace=False)
    idx_np = pool[rng.randint(0, uniq, S)].astype(np.int32)
    upd_np = rng.uniform(-1, 1, (S, C)).astype(np.float32)
    idx = jnp.asarray(idx_np)
    upd = jnp.asarray(upd_np)
    order = jnp.asarray(np.argsort(idx_np, kind="stable").astype(np.int32))
    sidx = idx[order]

    results = {"S": S, "cap": cap, "C": C, "dup": args.dup, "scan": SC,
               "backend": jax.default_backend()}

    def scan_time(body):
        """ms/iter of body(i) over an SC-iteration scan (carry = checksum)."""
        @jax.jit
        def f():
            c, _ = jax.lax.scan(lambda c, i: (c + body(i), None),
                                jnp.float32(0), jnp.arange(SC))
            return c
        v = float(f())  # compile + first run
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(f())
            best = min(best, time.perf_counter() - t0)
        return best / SC * 1e3, v

    def vary(i):
        # per-iteration scale so the scan body can't be hoisted
        return (1.0 + 1e-6 * i.astype(jnp.float32))

    def b_base(i):
        out = jnp.zeros((cap, C), jnp.float32).at[idx].add(upd * vary(i))
        return out[0, 0] + out[-1, -1]

    def b_sorted(i):
        out = jnp.zeros((cap, C), jnp.float32).at[sidx].add(
            (upd * vary(i))[order], indices_are_sorted=True)
        return out[0, 0] + out[-1, -1]

    def b_sorted_nopermute(i):
        # permuted rows precomputed: isolates the sorted scatter itself
        supd = upd[order]
        out = jnp.zeros((cap, C), jnp.float32).at[sidx].add(
            supd * vary(i), indices_are_sorted=True)
        return out[0, 0] + out[-1, -1]

    def b_argsort(i):
        o = jnp.argsort(idx + (i - i))  # i-dependence defeats hoisting
        return (o[0] + o[-1]).astype(jnp.float32)

    def b_permute(i):
        rows = (upd * vary(i))[order]
        return rows[0, 0] + rows[-1, -1]

    def b_segsum(i):
        supd = upd[order]
        out = jax.ops.segment_sum(supd * vary(i), sidx, num_segments=cap,
                                  indices_are_sorted=True)
        return out[0, 0] + out[-1, -1]

    def b_combined(i):
        # the full candidate replacement: argsort in the forward (charged
        # here), permute + sorted scatter in the backward
        o = jnp.argsort(idx + (i - i))
        si = idx[o]
        out = jnp.zeros((cap, C), jnp.float32).at[si].add(
            (upd * vary(i))[o], indices_are_sorted=True)
        return out[0, 0] + out[-1, -1]

    checks = {}
    for name, body in (
            ("base_ms", b_base),
            ("sorted_ms", b_sorted_nopermute),
            ("sorted_w_permute_ms", b_sorted),
            ("argsort_ms", b_argsort),
            ("permute_ms", b_permute),
            ("segsum_sorted_ms", b_segsum),
            ("combined_ms", b_combined),
    ):
        try:
            ms, chk = scan_time(body)
            results[name] = round(ms, 3)
            checks[name] = chk
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAILED: {str(e)[:120]}"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
