"""Positional encoding (reference: models/helpers/networks.py:175-190)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def positional_encoding(positions: jnp.ndarray, freqs: int, ori: bool = False) -> jnp.ndarray:
    """Sin/cos positional encoding.

    Matches the reference layout exactly: frequencies interleave per input channel as
    ``(x*1, x*2, ..., x*2^{F-1}, y*1, ...)`` and then sin/cos interleave per scalar
    (``ori=False`` → [..., 2*D*F] with (sin, cos) pairs; ``ori=True`` prepends the raw
    input → [..., D + 2*D*F] with all sins then all cos, reference networks.py:187).
    """
    freq_bands = (2.0 ** jnp.arange(freqs)).astype(positions.dtype)  # (F,)
    d = positions.shape[-1]
    pts = (positions[..., None] * freq_bands).reshape(positions.shape[:-1] + (d * freqs,))
    if ori:
        return jnp.concatenate([positions, jnp.sin(pts), jnp.cos(pts)], axis=-1)
    # one full-width op: sin(positions @ S + phase) with a constant channel/
    # frequency selection matrix S[di, j] = 2^f for the (di, f, sin|cos)
    # output column j, phase = pi/2 on cos columns (cos x = sin(x + pi/2)).
    # Any construction with a narrow trailing axis ([..., D*F, 2] stacks,
    # per-channel concats) materializes TPU-tile-padded copies — measured
    # 13-23GB of HLO temps at production shapes; this is a single fused
    # matmul + sin.
    S, phase = _pe_selection(d, freqs)
    return jnp.sin(positions @ S.astype(positions.dtype)
                   + phase.astype(positions.dtype))


import functools


@functools.lru_cache(maxsize=None)
def _pe_selection_np(d: int, freqs: int):
    S = np.zeros((d, 2 * d * freqs), np.float32)
    phase = np.zeros((2 * d * freqs,), np.float32)
    j = 0
    for di in range(d):
        for f in range(freqs):
            for p in range(2):
                S[di, j] = 2.0 ** f
                phase[j] = p * (np.pi / 2)
                j += 1
    return S, phase


def _pe_selection(d: int, freqs: int):
    S, phase = _pe_selection_np(d, freqs)
    return jnp.asarray(S), jnp.asarray(phase)
