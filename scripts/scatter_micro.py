"""Micro-bench: the [S,42] -> [cap,42] point-gradient scatter-add floor.

VERDICT r4 item 1: the packed point-attribute scatter-add (5.8 ms isolated
at S=384k, cap=102.4k) is the named blocker on the 90k rays/s target.
Round-4 measured-and-rejected bf16 and sort+segment (sort in the hot path);
this probe decomposes the remaining candidates:

  base      the production scatter-add (repeating indices)
  sorted    scatter with indices_are_sorted=True on PRE-sorted indices
            (the sort happens once per step in the query phase — c_pidx is
            a non-differentiable query output, so its argsort can be
            computed OUTSIDE the backward and amortized)
  argsort   the one-time cost of that argsort (+ row permute), charged to
            the step
  segsum    jax.ops.segment_sum with sorted segment ids
  unique1   scatter after in-register pair-combining of equal ADJACENT
            sorted targets (halves collision depth)

Run:  python scripts/scatter_micro.py [--S 384000] [--cap 102400] [--iters 50]
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import argparse
import functools
import json
import time

import numpy as np


def timeit(fn, args, iters):
    out = fn(*args)
    ref = float(np.asarray(out).ravel()[:8].sum())  # force + checksum
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3, ref


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=384000)
    ap.add_argument("--cap", type=int, default=102400)
    ap.add_argument("--C", type=int, default=42)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dup", type=float, default=6.0,
                    help="average index repetition (S / unique)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    S, cap, C = args.S, args.cap, args.C
    rng = np.random.RandomState(0)
    uniq = max(1, int(S / args.dup))
    pool = rng.choice(cap, uniq, replace=False)
    idx_np = pool[rng.randint(0, uniq, S)].astype(np.int32)
    upd_np = rng.uniform(-1, 1, (S, C)).astype(np.float32)
    idx = jnp.asarray(idx_np)
    upd = jnp.asarray(upd_np)
    order = jnp.asarray(np.argsort(idx_np, kind="stable").astype(np.int32))
    sidx = idx[order]
    supd = upd[order]

    results = {"S": S, "cap": cap, "C": C, "dup": args.dup,
               "backend": jax.default_backend()}

    @jax.jit
    def base(i, u):
        return jnp.zeros((cap, C), jnp.float32).at[i].add(u)

    @jax.jit
    def sorted_scatter(i, u):
        return jnp.zeros((cap, C), jnp.float32).at[i].add(
            u, indices_are_sorted=True)

    @jax.jit
    def do_argsort(i):
        return jnp.argsort(i)

    @jax.jit
    def permute_rows(u, o):
        return u[o]

    @jax.jit
    def segsum(i, u):
        return jax.ops.segment_sum(u, i, num_segments=cap,
                                   indices_are_sorted=True)

    @jax.jit
    def pair_combine_then_scatter(i, u):
        # sorted targets: combine adjacent equal pairs (halves rows with
        # duplicates; survivors keep their target, merged slots -> cap dump)
        i2 = i.reshape(S // 2, 2)
        u2 = u.reshape(S // 2, 2, C)
        same = i2[:, 0] == i2[:, 1]
        first = u2[:, 0] + jnp.where(same[:, None], u2[:, 1], 0.0)
        second = jnp.where(same[:, None], 0.0, u2[:, 1])
        tgt2 = jnp.where(same, cap, i2[:, 1])
        out = jnp.zeros((cap + 1, C), jnp.float32)
        out = out.at[i2[:, 0]].add(first, indices_are_sorted=True)
        out = out.at[tgt2].add(second, mode="drop")
        return out[:cap]

    ref = None
    for name, fn, a in (
            ("base_ms", base, (idx, upd)),
            ("sorted_ms", sorted_scatter, (sidx, supd)),
            ("argsort_ms", do_argsort, (idx,)),
            ("permute_ms", permute_rows, (upd, order)),
            ("segsum_sorted_ms", segsum, (sidx, supd)),
            ("paircombine_ms", pair_combine_then_scatter, (sidx, supd)),
    ):
        try:
            ms, chk = timeit(fn, a, args.iters)
            results[name] = round(ms, 3)
            if name == "base_ms":
                ref = chk
            elif name in ("sorted_ms", "segsum_sorted_ms",
                          "paircombine_ms") and ref is not None:
                assert abs(chk - ref) < 1e-2 + 1e-4 * abs(ref), (name, chk,
                                                                ref)
        except Exception as e:
            results[name] = f"FAILED: {str(e)[:120]}"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
