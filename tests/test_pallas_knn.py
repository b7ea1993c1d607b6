"""Pallas KNN-select kernel: parity with lax.top_k (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from pointnerf_tpu.ops.pallas_knn import knn_select, BIG


def ref_select(d2, K):
    neg, arg = jax.lax.top_k(-d2, K)
    return -neg, arg


def test_knn_select_matches_topk():
    rng = np.random.RandomState(0)
    d2 = rng.rand(3000, 126).astype(np.float32)
    # sprinkle invalids
    inv = rng.rand(3000, 126) < 0.4
    d2 = np.where(inv, BIG, d2).astype(np.float32)
    got_d, got_i = knn_select(jnp.asarray(d2), 8, block_rows=512,
                              interpret=True)
    want_d, want_i = ref_select(jnp.asarray(d2), 8)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               rtol=1e-6)
    # indices may differ only among exact ties / BIG fillers
    gd, wd = np.asarray(got_d), np.asarray(want_d)
    gi, wi = np.asarray(got_i), np.asarray(want_i)
    real = gd < BIG / 2
    taken = np.take_along_axis(d2, gi, axis=1)
    np.testing.assert_allclose(np.where(real, taken, 0),
                               np.where(real, wd, 0), rtol=1e-6)


def test_knn_select_all_invalid_rows():
    d2 = np.full((128, 27), BIG, np.float32)
    d2[0, 3] = 0.5
    got_d, got_i = knn_select(jnp.asarray(d2), 4, block_rows=64,
                              interpret=True)
    assert np.asarray(got_d)[0, 0] == np.float32(0.5)
    assert np.asarray(got_i)[0, 0] == 3
    assert (np.asarray(got_d)[1:] >= BIG / 2).all()


def test_knn_select_padding():
    """Row counts not divisible by block_rows are padded then truncated."""
    rng = np.random.RandomState(1)
    d2 = rng.rand(1000, 27).astype(np.float32)  # 1000 % 512 != 0
    got_d, got_i = knn_select(jnp.asarray(d2), 4, block_rows=512,
                              interpret=True)
    want_d, want_i = ref_select(jnp.asarray(d2), 4)
    assert got_d.shape == (1000, 4)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d), rtol=1e-6)
