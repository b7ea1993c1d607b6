"""Ray sample generation along camera rays.

TPU-native re-implementation of the reference registry
(reference: models/rendering/diff_ray_marching.py:7-33, 142-505). All functions are pure,
static-shape, and take an explicit PRNG key instead of global torch RNG state.

Shapes: campos [B,3]; raydir [B,R,3]; outputs raypos [B,R,S,3], segment_length [B,R,S],
valid [B,R,S], ts [B,R,S].
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Arrays4 = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]


def near_far_linear_ray_generation(campos, raydir, point_count, near=0.1, far=10.0,
                                   jitter=0.0, key: Optional[jax.Array] = None,
                                   **_) -> Arrays4:
    """Uniform-in-depth samples (reference: diff_ray_marching.py:349-392)."""
    B, R, _ = raydir.shape
    dtype = raydir.dtype
    tvals = jnp.linspace(0.0, 1.0, point_count + 1, dtype=dtype)
    tvals = near * (1.0 - tvals) + far * tvals  # [S+1]
    seg = tvals[1:] - tvals[:-1]  # [S]
    if jitter > 0.0 and key is not None:
        u = jax.random.uniform(key, (B, R, point_count), dtype=dtype)
        seg = seg * (1.0 + jitter * (u - 0.5))
    else:
        seg = jnp.broadcast_to(seg, (B, R, point_count))
    end_ts = near + jnp.concatenate(
        [jnp.zeros((B, R, 1), dtype=dtype), jnp.cumsum(seg, axis=2)], axis=2)
    mid_ts = 0.5 * (end_ts[:, :, :-1] + end_ts[:, :, 1:])
    raypos = campos[:, None, None, :] + raydir[:, :, None, :] * mid_ts[..., None]
    valid = jnp.ones_like(mid_ts)
    seg = seg * jnp.linalg.norm(raydir, axis=-1)[..., None]
    return raypos, seg, valid, mid_ts


def near_far_disparity_linear_ray_generation(campos, raydir, point_count, near=0.1,
                                             far=10.0, jitter=0.0,
                                             key: Optional[jax.Array] = None,
                                             **_) -> Arrays4:
    """Uniform-in-disparity samples (reference: diff_ray_marching.py:201-249)."""
    B, R, _ = raydir.shape
    dtype = raydir.dtype
    tv = jnp.linspace(0.0, 1.0, point_count + 1, dtype=dtype)
    tvals = 1.0 / (1.0 / near * (1.0 - tv) + 1.0 / far * tv)
    seg = tvals[1:] - tvals[:-1]
    if jitter > 0.0 and key is not None:
        u = jax.random.uniform(key, (B, R, point_count), dtype=dtype)
        seg = seg * (1.0 + jitter * (u - 0.5))
    else:
        seg = jnp.broadcast_to(seg, (B, R, point_count))
    end_ts = near + jnp.concatenate(
        [jnp.zeros((B, R, 1), dtype=dtype), jnp.cumsum(seg, axis=2)], axis=2)
    mid_ts = 0.5 * (end_ts[:, :, :-1] + end_ts[:, :, 1:])
    raypos = campos[:, None, None, :] + raydir[:, :, None, :] * mid_ts[..., None]
    valid = jnp.ones_like(mid_ts)
    # NOTE: the reference disparity variant does not multiply by |raydir| (it is unit).
    return raypos, seg, valid, mid_ts


def near_middle_far_ray_generation(campos, raydir, point_count, near=0.1, middle=2.0,
                                   far=10.0, middle_split=0.6, jitter=0.0,
                                   key: Optional[jax.Array] = None, **_) -> Arrays4:
    """Linear near→middle then disparity middle→far (reference: :142-198)."""
    B, R, _ = raydir.shape
    dtype = raydir.dtype
    n0 = int(point_count * middle_split) + 1
    n1 = int(point_count * (1.0 - middle_split)) + 2
    tv0 = jnp.linspace(0.0, 1.0, n0, dtype=dtype)
    vals0 = near * (1.0 - tv0) + middle * tv0
    tv1 = jnp.linspace(0.0, 1.0, n1, dtype=dtype)
    vals1 = 1.0 / (1.0 / middle * (1.0 - tv1) + 1.0 / far * tv1)
    tvals = jnp.concatenate([vals0, vals1], axis=0)
    seg = tvals[1:] - tvals[:-1]
    if jitter > 0.0 and key is not None:
        u = jax.random.uniform(key, (B, R, seg.shape[0]), dtype=dtype)
        seg = seg * (1.0 + jitter * (u - 0.5))
    else:
        seg = jnp.broadcast_to(seg, (B, R, seg.shape[0]))
    seg = seg[..., :point_count]
    end_ts = near + jnp.concatenate(
        [jnp.zeros((B, R, 1), dtype=dtype), jnp.cumsum(seg, axis=2)], axis=2)
    mid_ts = 0.5 * (end_ts[:, :, :-1] + end_ts[:, :, 1:])
    raypos = campos[:, None, None, :] + raydir[:, :, None, :] * mid_ts[..., None]
    valid = jnp.ones_like(mid_ts)
    return raypos, seg, valid, mid_ts


def nerf_near_far_linear_ray_generation(campos, raydir, point_count, near=0.1, far=10.0,
                                        jitter=1.0, key: Optional[jax.Array] = None,
                                        **_) -> Arrays4:
    """NeRF-style stratified linear samples (reference: :302-345)."""
    B, R, _ = raydir.shape
    dtype = raydir.dtype
    tv = jnp.linspace(0.0, 1.0, point_count, dtype=dtype)
    tvals = near * (1.0 - tv) + far * tv  # [S]
    tvals = jnp.broadcast_to(tvals, (B, R, point_count))
    if jitter > 0.0 and key is not None:
        mids = 0.5 * (tvals[..., 1:] + tvals[..., :-1])
        upper = jnp.concatenate([mids, tvals[..., -1:]], axis=-1)
        lower = jnp.concatenate([tvals[..., :1], mids], axis=-1)
        u = jax.random.uniform(key, (B, R, point_count), dtype=dtype)
        tvals = lower + (upper - lower) * u
    seg = jnp.concatenate(
        [tvals[..., 1:] - tvals[..., :-1],
         jnp.full((B, R, 1), 1e10, dtype=dtype)], axis=-1)
    seg = seg * jnp.linalg.norm(raydir, axis=-1)[..., None]
    raypos = campos[:, None, None, :] + raydir[:, :, None, :] * tvals[..., None]
    valid = jnp.ones_like(tvals)
    return raypos, seg, valid, tvals


def nerf_near_far_disparity_linear_ray_generation(campos, raydir, point_count, near=0.1,
                                                  far=10.0, jitter=1.0,
                                                  key: Optional[jax.Array] = None,
                                                  **_) -> Arrays4:
    """NeRF-style stratified disparity samples (reference: :252-299)."""
    B, R, _ = raydir.shape
    dtype = raydir.dtype
    tv = jnp.linspace(0.0, 1.0, point_count, dtype=dtype)
    tvals = 1.0 / (1.0 / near * (1.0 - tv) + 1.0 / far * tv)
    tvals = jnp.broadcast_to(tvals, (B, R, point_count))
    if jitter > 0.0 and key is not None:
        mids = 0.5 * (tvals[..., 1:] + tvals[..., :-1])
        upper = jnp.concatenate([mids, tvals[..., -1:]], axis=-1)
        lower = jnp.concatenate([tvals[..., :1], mids], axis=-1)
        u = jax.random.uniform(key, (B, R, point_count), dtype=dtype)
        tvals = lower + (upper - lower) * u
    seg = jnp.concatenate(
        [tvals[..., 1:] - tvals[..., :-1],
         jnp.full((B, R, 1), 1e10, dtype=dtype)], axis=-1)
    seg = seg * jnp.linalg.norm(raydir, axis=-1)[..., None]
    raypos = campos[:, None, None, :] + raydir[:, :, None, :] * tvals[..., None]
    valid = jnp.ones_like(tvals)
    return raypos, seg, valid, tvals


def sample_pdf(bins, weights, n_samples, key: Optional[jax.Array] = None,
               det: bool = False) -> jnp.ndarray:
    """Inverse-CDF importance sampling (reference: diff_ray_marching.py:36-82).

    The reference round-trips through numpy on the host; here it is pure XLA with
    `jnp.searchsorted` so it can live inside jit. bins/weights: [B,R,S]; returns sorted
    sample positions [B,R,n_samples+S].
    """
    B, R, S = bins.shape
    mid = 0.5 * (bins[..., 1:] + bins[..., :-1])          # [B,R,S-1]
    w = weights[..., 1:-1] + 1e-5                          # [B,R,S-2]
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B,R,S-1]
    if det or key is None:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_samples, dtype=bins.dtype),
                             (B, R, n_samples))
    else:
        u = jax.random.uniform(key, (B, R, n_samples), dtype=bins.dtype)
    idx = jax.vmap(jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right")))(cdf, u)
    below = jnp.maximum(0, idx - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, idx)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(mid, jnp.minimum(below, mid.shape[-1] - 1), axis=-1)
    bins_a = jnp.take_along_axis(mid, jnp.minimum(above, mid.shape[-1] - 1), axis=-1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    samples = bins_b + t * (bins_a - bins_b)
    samples = jnp.concatenate([samples, jax.lax.stop_gradient(bins)], axis=-1)
    return jnp.sort(samples, axis=-1)


def refine_ray_generation(campos, raydir, point_count, prev_ts, prev_weights,
                          domain_size: float = 1.0, jitter: float = 0.0,
                          key: Optional[jax.Array] = None, **_) -> Arrays4:
    """Importance-resampled fine pass (reference: diff_ray_marching.py:396-430).

    prev_ts/prev_weights: [B,R,S] coarse sample depths + blend weights. The
    output keeps the reference's count: point_count + S samples (sample_pdf
    appends the coarse bins before sorting), at segment midpoints.
    """
    end_ts = jax.lax.stop_gradient(
        sample_pdf(prev_ts, prev_weights, point_count + 1, key=key,
                   det=jitter <= 0))                           # [B,R,pc+1+S]
    seg = end_ts[..., 1:] - end_ts[..., :-1]
    mid_ts = 0.5 * (end_ts[..., :-1] + end_ts[..., 1:])
    raypos = campos[:, None, None, :] + \
        raydir[:, :, None, :] * mid_ts[..., None]
    valid = jnp.ones_like(mid_ts)
    seg = seg * jnp.linalg.norm(raydir, axis=-1)[..., None]
    return raypos, seg, valid, mid_ts


def nerf_refine_ray_generation(campos, raydir, point_count, prev_ts,
                               prev_weights, domain_size: float = 1.0,
                               jitter: float = 0.0,
                               key: Optional[jax.Array] = None, **_) -> Arrays4:
    """NeRF-variant refine pass (reference: :433-470 — same math; kept as a
    separate registry entry to mirror the reference surface)."""
    return refine_ray_generation(campos, raydir, point_count, prev_ts,
                                 prev_weights, domain_size=domain_size,
                                 jitter=jitter, key=key)


def refine_cube_ray_generation(campos, raydir, point_count, prev_ts,
                               prev_weights, domain_size: float = 1.0,
                               jitter: float = 0.0,
                               key: Optional[jax.Array] = None, **_) -> Arrays4:
    """Refine pass with cube-domain validity (reference: :472-505)."""
    raypos, seg, _, mid_ts = refine_ray_generation(
        campos, raydir, point_count, prev_ts, prev_weights,
        domain_size=domain_size, jitter=jitter, key=key)
    valid = jnp.all((raypos > -domain_size) & (raypos < domain_size),
                    axis=-1).astype(raypos.dtype)
    return raypos, seg, valid, mid_ts


_GENERATORS = {
    "near_far_linear": near_far_linear_ray_generation,
    "near_far_disparity_linear": near_far_disparity_linear_ray_generation,
    "near_middle_far": near_middle_far_ray_generation,
    "nerf_near_far_linear": nerf_near_far_linear_ray_generation,
    "nerf_near_far_disparity_linear": nerf_near_far_disparity_linear_ray_generation,
}


def find_ray_generation_method(name: str):
    """Registry lookup (reference: diff_ray_marching.py:7-21)."""
    if name not in _GENERATORS:
        raise RuntimeError(f"No such ray generation method: {name}")
    return _GENERATORS[name]


def find_refined_ray_generation_method(name: str):
    """Fine-pass registry (reference: diff_ray_marching.py:24-33): 'cube' →
    cube-validity variant, 'nerf*' → nerf variant, anything else → default."""
    if name == "cube":
        return refine_cube_ray_generation
    if name.startswith("nerf"):
        return nerf_refine_ray_generation
    return refine_ray_generation
