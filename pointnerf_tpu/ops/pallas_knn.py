"""Pallas TPU kernel: K-smallest selection over the KNN candidate axis.

Alternative to `lax.top_k(-d2, K)` in the neighbor query (ops/query.py
stage 3): an unrolled K-times min-extract in VMEM — one HBM read of d2, one
write of [S,K] results, all selection arithmetic on the VPU.

Status: at the production shape ([288k, 126] -> 8 on v5e) XLA's TopK wins
(10.7ms vs 20.2ms for this kernel at block_rows=1024; larger blocks exceed
the 16MB VMEM scope), so the query keeps lax.top_k. The kernel is retained —
parity-tested in interpret mode — as the starting point for a future fully
fused gather+distance+select query kernel, where skipping the HBM
materialization of d2 is the actual win.

Falls back to interpret mode off-TPU (tests run it on CPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BIG = 3.0e38


def _select_kernel(K: int, d_ref, out_d_ref, out_i_ref):
    d = d_ref[:]                                   # [BS, C]
    C = d.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    ds, idxs = [], []
    for _ in range(K):                             # static unroll
        m = jnp.min(d, axis=1, keepdims=True)      # [BS, 1]
        # first column attaining the min (stable tie-break, like top_k)
        hit = jnp.where(d == m, iota, C)
        arg = jnp.min(hit, axis=1)                 # [BS]
        ds.append(m[:, 0])
        idxs.append(arg)
        d = jnp.where(iota == arg[:, None], BIG, d)
    out_d_ref[:] = jnp.stack(ds, axis=1)
    out_i_ref[:] = jnp.stack(idxs, axis=1)


@functools.partial(jax.jit, static_argnames=("K", "block_rows", "interpret"))
def knn_select(d2: jnp.ndarray, K: int, block_rows: int = 1024,
               interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """d2: [S, C] float32 (BIG = invalid). Returns (dist [S,K], arg [S,K]),
    ascending by distance — same contract as (-lax.top_k(-d2, K))."""
    S, C = d2.shape
    pad = (-S) % block_rows
    if pad:
        d2 = jnp.concatenate(
            [d2, jnp.full((pad, C), BIG, d2.dtype)], axis=0)
    Sp = d2.shape[0]

    out_d, out_i = pl.pallas_call(
        functools.partial(_select_kernel, K),
        out_shape=(jax.ShapeDtypeStruct((Sp, K), d2.dtype),
                   jax.ShapeDtypeStruct((Sp, K), jnp.int32)),
        grid=(Sp // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, C), lambda i: (i, 0))],
        out_specs=(pl.BlockSpec((block_rows, K), lambda i: (i, 0)),
                   pl.BlockSpec((block_rows, K), lambda i: (i, 0))),
        interpret=interpret,
    )(d2)
    return out_d[:S], out_i[:S]


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
