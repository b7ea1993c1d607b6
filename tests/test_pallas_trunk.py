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


def test_fused_trunk_order1_parity():
    """agg_intrp_order==1 (the dtu_inf/feedforward family, round-4
    extension): the kernel emits aggregated features only and the alpha head
    runs outside — forward AND gradients must match the XLA composition."""
    opt, state, spec, grid, batch, _ = tiny_setup(R_side=5)
    opt1 = _fused_opt(opt).replace(agg_intrp_order=1, use_fused_trunk=0)
    ts = trainer.create_train_state(opt1, jax.random.PRNGKey(2), state)
    out_ref = trainer.eval_step(ts, grid, batch, opt1, spec)
    out_fus = trainer.eval_step(ts, grid, batch,
                                opt1.replace(use_fused_trunk=1), spec)
    np.testing.assert_allclose(np.asarray(out_fus["coarse_raycolor"]),
                               np.asarray(out_ref["coarse_raycolor"]),
                               rtol=1e-5, atol=1e-5)

    gt, _ = make_gt(batch)
    b2 = dict(batch, gt_image=gt)
    key = jax.random.PRNGKey(5)
    _, g_net_r, g_pts_r = trainer.compute_grads(ts, grid, b2, key, opt1,
                                                spec)
    _, g_net_f, g_pts_f = trainer.compute_grads(
        ts, grid, b2, key, opt1.replace(use_fused_trunk=1), spec)
    for ref, fus, tag in ((g_net_r, g_net_f, "net"),
                          (g_pts_r, g_pts_f, "pts")):
        fr, _ = jax.tree_util.tree_flatten_with_path(ref)
        ff, _ = jax.tree_util.tree_flatten_with_path(fus)
        for (path, a), (_, b) in zip(fr, ff):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-5,
                                       err_msg=f"{tag} grad {path}")


def test_fused_trunk_rejects_bad_config():
    opt, state, spec, grid, batch, _ = tiny_setup(R_side=4)
    bad = opt.replace(use_fused_trunk=1, act_type="ReLU")
    ts = trainer.create_train_state(opt, jax.random.PRNGKey(0), state)
    with pytest.raises(AssertionError):
        trainer.eval_step(ts, grid, batch, bad, spec)


def test_fused_trunk_bf16_close_to_f32():
    """The bf16-operand kernel (trunk_dtype default) must track the f32
    kernel within mixed-precision tolerance — direct kernel-level A/B in
    interpret mode (the model path disables bf16 under interpret so the
    exact-parity tests above stay exact)."""
    from pointnerf_tpu.ops.pallas_trunk import fused_trunk, pack_trunk_params
    from pointnerf_tpu.models.aggregator import init_aggregator_params
    from test_end_to_end import tiny_setup

    opt, *_ = tiny_setup(R_side=4)
    opt = _fused_opt(opt)
    params = init_aggregator_params(jax.random.PRNGKey(0), opt)
    F_emb, dd, K = opt.point_features_dim, 6, opt.K
    ops = pack_trunk_params(params, F_emb, dd, opt.num_feat_freqs,
                            abs(opt.dist_xyz_freq))
    E3 = ops[4 + 2 * (opt.shading_feature_mlp_layer1 - 1) + 1].shape[0]
    rng = np.random.RandomState(0)
    S = 256
    emb = jnp.asarray(rng.randn(S, F_emb).astype(np.float32) * 0.3)
    d = jnp.asarray(rng.randn(S, dd).astype(np.float32) * 0.02)
    ex3 = jnp.asarray(rng.randn(S, E3).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.rand(S, 1).astype(np.float32))

    def run(bf16):
        def f(emb):
            feat, alpha = fused_trunk(
                opt.shading_feature_mlp_layer1, opt.shading_feature_mlp_layer3,
                opt.num_feat_freqs, abs(opt.dist_xyz_freq), K,
                opt.act_super > 0, 64, True, bf16, False,
                emb, d, ex3, w, ops)
            return jnp.sum(feat) + jnp.sum(alpha * alpha), (feat, alpha)
        (v, (feat, alpha)), g = jax.value_and_grad(f, has_aux=True)(emb)
        return feat, alpha, g

    f32_feat, f32_alpha, f32_g = run(False)
    bf_feat, bf_alpha, bf_g = run(True)
    # relative error vs the f32 magnitude scale of each tensor
    # grads compound bf16 rounding across ~6 chained dots — max-norm error
    # ~8% is expected mixed-precision noise (typical entries ~1%); the
    # end-to-end arbiter is the macro-train PSNR A/B (BASELINE.md round 4)
    for a, b, tol, name in ((f32_feat, bf_feat, 2e-2, "feat"),
                            (f32_alpha, bf_alpha, 2e-2, "alpha"),
                            (f32_g, bf_g, 1.2e-1, "demb")):
        scale = float(jnp.max(jnp.abs(a))) + 1e-8
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < tol, (name, err)


@pytest.mark.parametrize("order", [1, 2])
def test_fused_shade_parity(order):
    """v2 fused shade kernel (dists + linear weights + conf in-kernel,
    per-attribute cotangent outputs) vs the pure-XLA composition: forward
    AND full gradients, orders 1 and 2."""
    opt, state, spec, grid, batch, _ = tiny_setup(R_side=6)
    base = _fused_opt(opt).replace(use_fused_trunk=0, fused_shade=0,
                                   agg_intrp_order=order)
    shade = base.replace(fused_shade=1)
    ts = trainer.create_train_state(base, jax.random.PRNGKey(4), state)

    out_ref = trainer.eval_step(ts, grid, batch, base, spec)
    out_fus = trainer.eval_step(ts, grid, batch, shade, spec)
    for k in ("coarse_raycolor", "coarse_point_opacity"):
        np.testing.assert_allclose(np.asarray(out_fus[k]),
                                   np.asarray(out_ref[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)

    gt, _ = make_gt(batch)
    b2 = dict(batch, gt_image=gt)
    key = jax.random.PRNGKey(6)
    _, g_net_r, g_pts_r = trainer.compute_grads(ts, grid, b2, key, base,
                                                spec)
    _, g_net_f, g_pts_f = trainer.compute_grads(ts, grid, b2, key, shade,
                                                spec)
    for ref, fus, tag in ((g_net_r, g_net_f, "net"),
                          (g_pts_r, g_pts_f, "pts")):
        fr, _ = jax.tree_util.tree_flatten_with_path(ref)
        ff, _ = jax.tree_util.tree_flatten_with_path(fus)
        for (path, a), (_, b) in zip(fr, ff):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=3e-4, atol=3e-5,
                                       err_msg=f"{tag} grad {path}")
