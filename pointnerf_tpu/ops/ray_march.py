"""Differentiable volume rendering: alpha compositing + render/blend/tonemap registries.

Reference: models/rendering/diff_ray_marching.py:508-572 and diff_render_func.py.
All functions are pure and static-shape; invalid samples are handled by the
``ray_valid`` float mask instead of data-dependent compaction.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp


# ------------------------------------------------------------------ blend functions
def alpha_blend(opacity, acc_transmission):
    """w = alpha * T (reference: diff_render_func.py:36)."""
    return opacity * acc_transmission


def alpha2_blend(opacity, acc_transmission):
    """Collocated-light round trip: w = alpha * T^2 (reference: diff_render_func.py:40)."""
    return opacity * acc_transmission * acc_transmission


def find_blend_function(name: str) -> Callable:
    if name == "alpha":
        return alpha_blend
    if name == "alpha2":
        return alpha2_blend
    raise RuntimeError(f"Unknown blend function: {name}")


# ------------------------------------------------------------------ render functions
def radiance_render(ray_feature):
    """Channels 1:4 are RGB (reference: diff_render_func.py:48)."""
    return ray_feature[..., 1:4]


def white_color(ray_feature):
    return jnp.ones_like(jnp.clip(ray_feature[..., 1:4], 0.0, 1.0))


def find_render_function(name: str) -> Callable:
    if name == "radiance":
        return radiance_render
    if name == "white":
        return white_color
    raise RuntimeError(f"Unknown render function: {name}")


# ------------------------------------------------------------------ tone mapping
def simple_tone_map(color, gamma=2.2, exposure=1.0):
    """Gamma tonemap (reference: diff_render_func.py:57)."""
    return jnp.clip(jnp.power(color * exposure + 1e-5, 1.0 / gamma), 0.0, 1.0)


def no_tone_map(color, gamma=2.2, exposure=1.0):
    return color


def normalize_tone_map(color):
    n = color / jnp.clip(jnp.linalg.norm(color, axis=-1, keepdims=True), 1e-12)
    return n * 0.5 + 0.5


def find_tone_map(name: str) -> Callable:
    if name == "gamma":
        return simple_tone_map
    if name == "normalize":
        return normalize_tone_map
    if name == "off":
        return no_tone_map
    raise RuntimeError(f"Unknown tone map: {name}")


# ------------------------------------------------------------------ ray marching
def ray_march(ray_dist: jnp.ndarray,
              ray_valid: jnp.ndarray,
              ray_features: jnp.ndarray,
              render_func: Callable,
              blend_func: Callable,
              bg_color: Optional[jnp.ndarray] = None
              ) -> Tuple[jnp.ndarray, ...]:
    """Alpha-composite per-sample features along each ray.

    Reference: diff_ray_marching.py:508-554. ray_dist/ray_valid: [B,R,S];
    ray_features: [B,R,S,C] with channel 0 = sigma. Returns (ray_color [B,R,3],
    point_color, opacity, acc_transmission, blend_weight [B,R,S,1],
    background_transmission [B,R,1], background_blend_weight).
    """
    point_color = render_func(ray_features)
    sigma = ray_features[..., 0] * ray_valid.astype(ray_features.dtype)
    opacity = 1.0 - jnp.exp(-sigma * ray_dist)

    # exclusive cumulative transmission; the epsilon mirrors the reference (":533").
    acc = jnp.cumprod(1.0 - opacity + 1e-10, axis=-1)
    background_transmission = acc[:, :, -1:]
    acc = jnp.concatenate([jnp.ones_like(acc[:, :, :1]), acc[:, :, :-1]], axis=-1)

    blend_weight = blend_func(opacity, acc)[..., None]
    ray_color = jnp.sum(point_color * blend_weight, axis=-2)
    if bg_color is not None:
        ray_color = ray_color + bg_color.reshape(
            background_transmission.shape[0], 1, 3).astype(ray_color.dtype) \
            * background_transmission
    background_blend_weight = blend_func(1.0, background_transmission)
    return (ray_color, point_color, opacity, acc, blend_weight,
            background_transmission, background_blend_weight)


def alpha_ray_march(ray_dist, ray_valid, ray_features, blend_func):
    """Opacity-only variant (reference: diff_ray_marching.py:557-572)."""
    sigma = ray_features[..., 0] * ray_valid.astype(ray_features.dtype)
    opacity = 1.0 - jnp.exp(-sigma * ray_dist)
    acc = jnp.cumprod(1.0 - opacity + 1e-10, axis=-1)
    background_transmission = acc[:, :, -1:]
    acc = jnp.concatenate([jnp.ones_like(acc[:, :, :1]), acc[:, :, :-1]], axis=-1)
    blend_weight = blend_func(opacity, acc)[..., None]
    background_blend_weight = blend_func(1.0, background_transmission)
    return opacity, acc, blend_weight, background_transmission, background_blend_weight
