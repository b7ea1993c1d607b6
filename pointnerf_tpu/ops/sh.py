"""Real spherical harmonics (reference: utils/spherical.py).

`sh_basis` is the hardcoded table up to degree 5 (reference SphericalHarm_table,
spherical.py:153-237, covering every shipped config — sh_degree default 4);
`sh_basis_runtime` is the recurrence evaluator for ANY degree (reference
SphericalHarm, spherical.py:9-151), statically unrolled so the whole basis is
one fused elementwise XLA computation. They agree to float tolerance on the
overlapping degrees (tests/test_ops_math.py).
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
        return sh_basis_runtime(dirs, total_deg, flip_dir=flip_dir)
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


def sh_basis_runtime(dirs: jnp.ndarray, total_deg: int,
                     flip_dir: bool = True) -> jnp.ndarray:
    """Recurrence-based real SH basis for arbitrary degree.

    Associated Legendre values via the stable (m,m) -> (m+1,m) -> (l,m)
    recurrences with the sin^m(theta) factor folded into the Cartesian
    azimuthal pair (A_m, B_m) = r_xy^m (cos m*phi, sin m*phi), so no
    trigonometry and no poles. No Condon-Shortley phase, matching the
    hardcoded table's signs. dirs: [..., 3] unit; returns [..., total_deg**2].
    """
    if total_deg < 1:
        raise ValueError("total_deg must be >= 1")
    x = -dirs[..., 0] if flip_dir else dirs[..., 0]
    y = -dirs[..., 1] if flip_dir else dirs[..., 1]
    z = dirs[..., 2]
    L = total_deg - 1  # max l

    # azimuthal pair per m (sin^m folded in): A_0=1, B_0=0
    A = [jnp.ones_like(x)]
    B = [jnp.zeros_like(x)]
    for m in range(1, L + 1):
        A.append(x * A[m - 1] - y * B[m - 1])
        B.append(x * B[m - 1] + y * A[m - 1])

    # P[l][m] with sin^m factored out (so P_m^m is the constant (2m-1)!!)
    P = [[None] * (L + 1) for _ in range(L + 1)]
    P[0][0] = jnp.ones_like(z)
    for m in range(1, L + 1):
        P[m][m] = (2 * m - 1) * P[m - 1][m - 1]
    for m in range(L):
        P[m + 1][m] = (2 * m + 1) * z * P[m][m]
    for m in range(L + 1):
        for l in range(m + 2, L + 1):
            P[l][m] = ((2 * l - 1) * z * P[l - 1][m]
                       - (l + m - 1) * P[l - 2][m]) / (l - m)

    import math
    out = []
    for l in range(L + 1):
        row = [None] * (2 * l + 1)
        for m in range(l + 1):
            K = math.sqrt((2 * l + 1) / (4 * math.pi)
                          * math.factorial(l - m) / math.factorial(l + m))
            if m == 0:
                row[l] = K * P[l][0]
            else:
                row[l + m] = math.sqrt(2) * K * A[m] * P[l][m]
                row[l - m] = math.sqrt(2) * K * B[m] * P[l][m]
        out += row
    return jnp.stack(out, axis=-1)


class SphericalHarm:
    """API-compatible shim for the reference runtime SphericalHarm class."""

    def __init__(self, total_deg: int):
        self.total_deg = total_deg

    def sh_all(self, indirs, filp_dir: bool = True):
        flat = indirs.reshape(-1, 3)
        return sh_basis_runtime(flat, self.total_deg, flip_dir=filp_dir)


class SphericalHarmTable:
    """API-compatible shim for the reference SphericalHarm_table class."""

    def __init__(self, total_deg: int):
        self.total_deg = total_deg

    def sh_all(self, indirs, filp_dir: bool = True):
        flat = indirs.reshape(-1, 3)
        return sh_basis(flat, self.total_deg, flip_dir=filp_dir)
