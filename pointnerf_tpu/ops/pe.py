"""Positional encoding (reference: models/helpers/networks.py:175-190)."""

from __future__ import annotations

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
    out = jnp.stack([jnp.sin(pts), jnp.cos(pts)], axis=-1)
    return out.reshape(positions.shape[:-1] + (d * freqs * 2,))
