"""Micro-bench: segment-cached mask_raypos vs the dense path (TPU).

CONCLUSION (real chip, bench shapes, U=96 — see BASELINE.md "measured
NEGATIVE result"): best segmented full pipeline 5.96 ms vs dense 6.86 ms.
The 16x gather reduction from per-ray row caching (rays are z-coherent:
24 distinct 128-voxel rows per 400 samples on average,
scripts/rowcoherence_stats.py) is real (~0.9 ms vs ~3.6 ms), but the
per-sample (segment, lane) select has a ~1.5-2 ms structural floor — the
MXU pushes one 96-wide one-hot row per sample (1.44M rows), and VPU
scan / bit-packed variants cost the same or more. 0.9 ms on a 48.9 ms
step did not justify a second occupancy code path; the production kernel
was deleted. This script is the evidence and the restart point.

Variant notes:
  rank:   jnp.cumsum along the 400-deep lane axis vs a lower-triangular f32
          MXU matmul (counts <= 400 are exact in f32) — trimat wins ~0.3 ms
  select: batched lax.dot_general over Rt rays in ONE Mosaic op (bf16 or
          int8->s32) wins; a fori_loop per-ray variant is 1.5x slower, and
          a Python-unrolled loop OOMs scoped VMEM at Rt=120 (23.3M > 16M:
          every unrolled iteration's [400,128] f32 intermediate stays live)

Run: python scripts/occ_micro3.py [--iters 8] [--U 96]
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
import sys
import time

sys.path.insert(0, ".")


def timed(label, fn, S):
    try:
        out = fn()
        float(out)
    except Exception as e:  # noqa: BLE001 - bench must survive bad variants
        print(f"{label:>34}: FAILED {type(e).__name__}: {str(e)[:120]}")
        return None
    t0 = time.perf_counter()
    v = float(fn())
    ms = (time.perf_counter() - t0) / S * 1000.0
    print(f"{label:>34}: {ms:7.3f} ms/iter  (scalar={v:.6g})")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--U", type=int, default=96)
    args = ap.parse_args()
    U, S = args.U, args.iters

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import make_workload
    from pointnerf_tpu.ops import raygen
    from pointnerf_tpu.ops.grid import voxel_coords, linearize
    from pointnerf_tpu.ops.query import mask_raypos

    opt, state, spec, grid, ts, batch = make_workload()
    gen = raygen.find_ray_generation_method("near_far_linear")
    key0 = jax.random.PRNGKey(7)
    D = opt.z_depth_dim
    rows = grid["coor_occ_rows"]
    LW = rows.shape[-1]
    print(f"backend={jax.default_backend()} U={U} D={D} LW={LW} iters={S}")

    def make_raypos(i):
        raypos, _, _, _ = gen(batch["campos"], batch["raydir"], D,
                              near=batch["near"], far=batch["far"],
                              jitter=0.3, key=jax.random.fold_in(key0, i))
        return raypos

    def scan(body):
        @jax.jit
        def run():
            def step(c, i):
                return c + body(make_raypos(i)), None
            c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(S))
            return c
        return run

    t_dense = timed("dense mask_raypos", scan(
        lambda rp: jnp.sum(mask_raypos(rp, grid, spec).astype(jnp.float32))),
        S)

    tri = jnp.asarray(np.tril(np.ones((D, D), np.float32)))

    def stages(raypos, trimat):
        coords, inb = voxel_coords(raypos, spec)
        lin = jnp.where(inb, linearize(coords, spec), 0)
        B, R = lin.shape[0], lin.shape[1]
        rid = (lin // LW).reshape(B * R, D)
        lane = (lin % LW).reshape(B * R, D)
        is_start = jnp.concatenate(
            [jnp.ones((B * R, 1), bool), rid[:, 1:] != rid[:, :-1]], axis=1)
        if trimat:
            rank = (is_start.astype(jnp.float32) @ tri.T
                    ).astype(jnp.int32) - 1
        else:
            rank = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1
        return inb, rid, lane, is_start, rank

    for tm in (False, True):
        def stages_only(rp, tm=tm):
            inb, rid, lane, is_start, rank = stages(rp, tm)
            return (jnp.sum(rank.astype(jnp.float32)) + jnp.sum(lane)
                    + jnp.sum(inb))
        timed(f"stages[{'trimat' if tm else 'cumsum'}]",
              scan(stages_only), S)

    def compact_matmul(rid, is_start, rank_c):
        oh = (rank_c[:, :, None] == jnp.arange(U, dtype=jnp.int32)
              ).astype(jnp.float32)
        v = jnp.where(is_start, rid, 0).astype(jnp.float32)
        return jnp.einsum("bd,bdu->bu", v, oh).astype(jnp.int32)

    # ---------------- kernel v2 variants ----------------
    def kern_batched(Rt, dtype, rows_ref, rank_ref, lane_ref, occ_ref):
        iota_u = jax.lax.broadcasted_iota(jnp.int32, (Rt, D, U), 2)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (Rt, D, LW), 2)
        oh = (rank_ref[...][:, :, None] == iota_u).astype(dtype)
        m = jax.lax.dot_general(
            oh, rows_ref[...].astype(dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32 if dtype == jnp.bfloat16
            else jnp.int32)
        ohl = (lane_ref[...][:, :, None] == iota_l)
        occ_ref[...] = jnp.sum(
            jnp.where(ohl, m.astype(jnp.float32), 0.0), axis=-1)

    def kern_fori(Rt, dtype, rows_ref, rank_ref, lane_ref, occ_ref):
        iota_u = jax.lax.broadcasted_iota(jnp.int32, (D, U), 1)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (D, LW), 1)

        def body(r, _):
            oh = (rank_ref[r][:, None] == iota_u).astype(dtype)
            m = jnp.dot(oh, rows_ref[r].astype(dtype),
                        preferred_element_type=jnp.float32
                        if dtype == jnp.bfloat16 else jnp.int32)
            ohl = lane_ref[r][:, None] == iota_l
            occ_ref[r] = jnp.sum(
                jnp.where(ohl, m.astype(jnp.float32), 0.0), axis=-1)
            return _
        jax.lax.fori_loop(0, Rt, body, 0)

    def run_kernel(rows_g, rank, lane, Rt, kern, dtype):
        N = rows_g.shape[0]
        padn = (-N) % Rt
        if padn:
            rows_g = jnp.concatenate(
                [rows_g, jnp.zeros((padn, U, LW), rows_g.dtype)], 0)
            rank = jnp.concatenate([rank, jnp.zeros((padn, D), rank.dtype)], 0)
            lane = jnp.concatenate([lane, jnp.zeros((padn, D), lane.dtype)], 0)
        Np = rows_g.shape[0]
        occ = pl.pallas_call(
            functools.partial(kern, Rt, dtype),
            grid=(Np // Rt,),
            in_specs=[
                pl.BlockSpec((Rt, U, LW), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Rt, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Rt, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Rt, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Np, D), jnp.float32),
        )(rows_g, rank, lane)
        return occ[:N]

    def kernel_only(rp, Rt, kern, dtype):
        inb, rid, lane, is_start, rank = stages(rp, True)
        rank_c = jnp.minimum(rank, U - 1)
        rows_g = jnp.broadcast_to(rows[:U][None], (rank_c.shape[0], U, LW))
        occ = run_kernel(rows_g, rank_c, lane, Rt, kern, dtype)
        return jnp.sum(occ)

    variants = []
    for Rt in (8, 16, 32):
        variants.append((f"batched bf16 Rt={Rt}", Rt, kern_batched,
                         jnp.bfloat16))
    variants.append(("batched int8 Rt=16", 16, kern_batched, jnp.int8))
    variants.append(("fori bf16 Rt=32", 32, kern_fori, jnp.bfloat16))
    variants.append(("fori bf16 Rt=120", 120, kern_fori, jnp.bfloat16))

    results = {}
    for name, Rt, kern, dt in variants:
        results[name] = timed(
            f"stages+kernel[{name}]",
            scan(functools.partial(kernel_only, Rt=Rt, kern=kern, dtype=dt)),
            S)

    # best full pipeline
    def full_seg(rp, Rt, kern, dtype):
        inb, rid, lane, is_start, rank = stages(rp, True)
        rank_c = jnp.minimum(rank, U - 1)
        c = compact_matmul(rid, is_start, rank_c)
        rows_g = rows[c.reshape(-1)].reshape(c.shape[0], U, LW)
        occ = run_kernel(rows_g, rank_c, lane, Rt, kern, dtype)
        occ = jnp.where(rank >= U, 1.0, occ)
        valid = (occ.reshape(inb.shape) > 0.5) & inb
        return jnp.sum(valid.astype(jnp.float32))

    ok = [(n, r) for n, r in results.items() if r is not None]
    ok.sort(key=lambda x: x[1])
    for name, _ in ok[:2]:
        Rt, kern, dt = next((v[1], v[2], v[3])
                            for v in variants if v[0] == name)
        t = timed(f"segmented full[{name}]", scan(
            functools.partial(full_seg, Rt=Rt, kern=kern, dtype=dt)), S)
        if t is not None and t_dense is not None:
            print(f"    -> vs dense: {t_dense / t:.2f}x")

    # parity check on the best variant
    if ok:
        name = ok[0][0]
        Rt, kern, dt = next((v[1], v[2], v[3])
                            for v in variants if v[0] == name)
        rp = make_raypos(0)
        a = jax.jit(lambda: mask_raypos(rp, grid, spec))()

        def seg_bool():
            inb, rid, lane, is_start, rank = stages(rp, True)
            rank_c = jnp.minimum(rank, U - 1)
            c = compact_matmul(rid, is_start, rank_c)
            rows_g = rows[c.reshape(-1)].reshape(c.shape[0], U, LW)
            occ = run_kernel(rows_g, rank_c, lane, Rt, kern, dt)
            occ = jnp.where(rank >= U, 1.0, occ)
            return (occ.reshape(inb.shape) > 0.5) & inb
        b = jax.jit(seg_bool)()
        eq = bool(jnp.all(a == b))
        print(f"parity dense==segmented[{name}]: {eq}")


if __name__ == "__main__":
    main()
