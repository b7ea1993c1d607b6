"""Bilinear sampling ops (torch F.grid_sample semantics).

The reference leans on torch grid_sample in four places: MVSNet cost-volume
homography warping (depth_estimators/module.py:66), point-feature extraction
(mvs_utils.extract_from_2d_grid :411), depth reprojection in fusion
(filter_utils.py:183) and MVSNeRF volume warps. This is the jax equivalent,
matching torch's align_corners and zeros/border padding exactly (tested
against torch in tests/test_interp.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_2d(feat: jnp.ndarray, grid: jnp.ndarray,
                   align_corners: bool = True,
                   padding_mode: str = "zeros") -> jnp.ndarray:
    """feat: [C,H,W]; grid: [...,2] normalized (x,y) in [-1,1].
    Returns [..., C]."""
    C, H, W = feat.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (W - 1)
        y = (gy + 1.0) * 0.5 * (H - 1)
    else:
        x = ((gx + 1.0) * W - 1.0) * 0.5
        y = ((gy + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)

    def tap(xi, yi):
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        v = feat[:, yc, xc]                       # [C, ...]
        v = jnp.moveaxis(v, 0, -1)                # [..., C]
        if padding_mode == "zeros":
            inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            v = v * inb[..., None].astype(v.dtype)
        return v

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


def resize_nearest(x: jnp.ndarray, size) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') for [C,H,W] (used to upsample MVS
    depth/conf to image res, mvs_points_model.py:330-333)."""
    C, H, W = x.shape
    H2, W2 = size
    yi = (jnp.arange(H2) * H // H2).astype(jnp.int32)
    xi = (jnp.arange(W2) * W // W2).astype(jnp.int32)
    return x[:, yi][:, :, xi]


def upsample2x_bilinear_ac(x: jnp.ndarray) -> jnp.ndarray:
    """torch F.interpolate(scale_factor=2, mode='bilinear', align_corners=True)
    for [C,H,W] (FPN upsample-add, mvs/models.py:741-743)."""
    C, H, W = x.shape
    H2, W2 = 2 * H, 2 * W
    ys = jnp.linspace(0.0, H - 1.0, H2)
    xs = jnp.linspace(0.0, W - 1.0, W2)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = (ys - y0)[None, :, None]
    wx = (xs - x0)[None, None, :]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    c = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)
