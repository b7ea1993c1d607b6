"""Real spherical harmonics, hardcoded up to degree 5 (reference: utils/spherical.py:153-237).

The runtime-Legendre variant of the reference (SphericalHarm, spherical.py:9-151) is only
needed for deg>5; this table version covers all shipped configs (sh_degree default 4).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_SQ = np.sqrt
_PI = np.pi


def sh_basis(dirs: jnp.ndarray, total_deg: int, flip_dir: bool = True) -> jnp.ndarray:
    """Evaluate the real SH basis at unit directions.

    dirs: [..., 3]; returns [..., total_deg**2]. `flip_dir` mirrors the reference's
    sign convention (spherical.py:158-162, x/y negated by default).
    """
    if not (1 <= total_deg <= 5):
        raise ValueError("sh_basis supports total_deg in [1, 5]")
    x = -dirs[..., 0] if flip_dir else dirs[..., 0]
    y = -dirs[..., 1] if flip_dir else dirs[..., 1]
    z = dirs[..., 2]

    out = [0.5 * _SQ(1 / _PI) * jnp.ones_like(x)]
    if total_deg >= 2:
        c = _SQ(3 / (4 * _PI))
        out += [c * y, c * z, c * x]
    if total_deg >= 3:
        out += [
            0.5 * _SQ(15 / _PI) * x * y,
            0.5 * _SQ(15 / _PI) * z * y,
            0.25 * _SQ(5 / _PI) * (-x * x - y * y + 2 * z * z),
            0.5 * _SQ(15 / _PI) * x * z,
            0.25 * _SQ(15 / _PI) * (x * x - y * y),
        ]
    if total_deg >= 4:
        out += [
            0.25 * _SQ(35.0 / 2 / _PI) * (3 * x * x - y * y) * y,
            0.5 * _SQ(105 / _PI) * x * y * z,
            0.25 * _SQ(21 / 2 / _PI) * (4 * z * z - x * x - y * y) * y,
            0.25 * _SQ(7 / _PI) * (2 * z * z - 3 * x * x - 3 * y * y) * z,
            0.25 * _SQ(21 / 2 / _PI) * (4 * z * z - x * x - y * y) * x,
            0.25 * _SQ(105 / _PI) * (x * x - y * y) * z,
            0.25 * _SQ(35.0 / 2 / _PI) * (x * x - 3 * y * y) * x,
        ]
    if total_deg >= 5:
        out += [
            0.75 * _SQ(35.0 / _PI) * x * y * (x * x - y * y),
            0.75 * _SQ(35.0 / 2 / _PI) * (3 * x * x - y * y) * y * z,
            0.75 * _SQ(5 / _PI) * x * y * (7 * z * z - 1),
            0.75 * _SQ(5 / 2 / _PI) * z * y * (7 * z * z - 3),
            3 / 16 * _SQ(1 / _PI) * (35 * z ** 4 - 30 * z * z + 3),
            0.75 * _SQ(5 / 2 / _PI) * x * z * (7 * z * z - 3),
            3 / 8 * _SQ(5 / _PI) * (x * x - y * y) * (7 * z * z - 1),
            0.75 * _SQ(35.0 / 2 / _PI) * (x * x - 3 * y * y) * x * z,
            3 / 16 * _SQ(35.0 / _PI) * (x * x * (x * x - 3 * y * y)
                                        - y * y * (3 * x * x - y * y)),
        ]
    return jnp.stack(out, axis=-1)


class SphericalHarmTable:
    """API-compatible shim for the reference SphericalHarm_table class."""

    def __init__(self, total_deg: int):
        self.total_deg = total_deg

    def sh_all(self, indirs, filp_dir: bool = True):
        flat = indirs.reshape(-1, 3)
        return sh_basis(flat, self.total_deg, flip_dir=filp_dir)
