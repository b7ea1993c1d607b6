"""Fused Pallas shading trunk vs the XLA composition (ops/pallas_trunk.py).

Parity of BOTH the forward render and the full gradients (params + point
attributes) on the production aggregator config, CPU interpret mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointnerf_tpu.train import trainer

from test_end_to_end import tiny_setup, make_gt


def _fused_opt(opt):
    return opt.replace(
        use_fused_trunk=1,
        # lego-family trunk shape (tiny_setup defaults already match the
        # rest: LeakyReLU, order 2, color/dir mode 1)
        shading_feature_mlp_layer1=1, shading_feature_mlp_layer3=1,
        shading_alpha_mlp_layer=1,
    )


def test_fused_trunk_forward_and_grad_parity():
    opt, state, spec, grid, batch, _ = tiny_setup(R_side=6)
    opt_ref = _fused_opt(opt).replace(use_fused_trunk=0)
    opt_fused = _fused_opt(opt)

    ts = trainer.create_train_state(opt_ref, jax.random.PRNGKey(0), state)

    out_ref = trainer.eval_step(ts, grid, batch, opt_ref, spec)
    out_fus = trainer.eval_step(ts, grid, batch, opt_fused, spec)
    np.testing.assert_allclose(np.asarray(out_fus["coarse_raycolor"]),
                               np.asarray(out_ref["coarse_raycolor"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_fus["coarse_point_opacity"]),
                               np.asarray(out_ref["coarse_point_opacity"]),
                               rtol=1e-5, atol=1e-5)

    gt, _ = make_gt(batch)
    b2 = dict(batch, gt_image=gt)
    key = jax.random.PRNGKey(3)
    _, g_net_r, g_pts_r = trainer.compute_grads(ts, grid, b2, key, opt_ref,
                                                spec)
    _, g_net_f, g_pts_f = trainer.compute_grads(ts, grid, b2, key, opt_fused,
                                                spec)

    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_net_r)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_net_f)
    for (path, a), (_, b) in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"net grad {path}")
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_pts_r)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_pts_f)
    for (path, a), (_, b) in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"point grad {path}")


def test_fused_trunk_two_layer_blocks():
    """L1 = L3 = 2 (the actual lego preset depth)."""
    opt, state, spec, grid, batch, _ = tiny_setup(R_side=5)
    opt2 = opt.replace(shading_feature_mlp_layer1=2,
                       shading_feature_mlp_layer3=2)
    ts = trainer.create_train_state(opt2, jax.random.PRNGKey(1), state)
    out_ref = trainer.eval_step(ts, grid, batch, opt2, spec)
    out_fus = trainer.eval_step(ts, grid, batch,
                                opt2.replace(use_fused_trunk=1), spec)
    np.testing.assert_allclose(np.asarray(out_fus["coarse_raycolor"]),
                               np.asarray(out_ref["coarse_raycolor"]),
                               rtol=1e-5, atol=1e-5)


def test_fused_trunk_rejects_bad_config():
    opt, state, spec, grid, batch, _ = tiny_setup(R_side=4)
    bad = opt.replace(use_fused_trunk=1, act_type="ReLU")
    ts = trainer.create_train_state(opt, jax.random.PRNGKey(0), state)
    with pytest.raises(AssertionError):
        trainer.eval_step(ts, grid, batch, bad, spec)
