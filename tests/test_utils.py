"""Tests for metrics, visualizer, checkpoint IO."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from pointnerf_tpu.utils import metrics as M
from pointnerf_tpu.utils.visualizer import Visualizer, to8b
from pointnerf_tpu.utils import checkpoint as C
from pointnerf_tpu.train import trainer

from test_end_to_end import tiny_setup


def test_psnr_rmse():
    rng = np.random.RandomState(0)
    gt = rng.uniform(0, 1, (16, 16, 3))
    img = np.clip(gt + 0.1, 0, 1)
    mse = np.mean((gt - img) ** 2)
    np.testing.assert_allclose(M.psnr(gt, img), 10 * np.log10(1.0 / mse), rtol=1e-9)
    np.testing.assert_allclose(M.rmse(gt, img), np.sqrt(mse), rtol=1e-9)
    assert M.psnr(gt, gt) == float("inf")


def test_ssim_properties():
    rng = np.random.RandomState(1)
    gt = rng.uniform(0, 1, (64, 64, 3))
    assert abs(M.ssim(gt, gt) - 1.0) < 1e-9
    noisy1 = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1)
    noisy2 = np.clip(gt + rng.normal(0, 0.3, gt.shape), 0, 1)
    s1, s2 = M.ssim(gt, noisy1), M.ssim(gt, noisy2)
    assert 0 < s2 < s1 < 1
    # symmetric
    np.testing.assert_allclose(M.ssim(noisy1, gt), s1, rtol=1e-9)
    # constant-shift known value: uniform images u1, u2 -> SSIM = analytic luminance term
    a = np.full((32, 32), 0.4)
    b = np.full((32, 32), 0.6)
    C1 = (0.01) ** 2
    expected = (2 * 0.4 * 0.6 + C1) / (0.4 ** 2 + 0.6 ** 2 + C1)
    np.testing.assert_allclose(M.ssim(a, b), expected, rtol=1e-6)


def test_report_metrics_dir(tmp_path):
    import imageio.v2 as imageio
    rng = np.random.RandomState(2)
    d = str(tmp_path)
    for i in range(3):
        gt = rng.uniform(0, 1, (32, 32, 3))
        img = np.clip(gt + rng.normal(0, 0.02, gt.shape), 0, 1)
        imageio.imwrite(os.path.join(d, "step-%04d-gt_image.png" % i), to8b(gt))
        imageio.imwrite(os.path.join(d, "step-%04d-coarse_raycolor.png" % i), to8b(img))
    means = M.report_metrics(d, d, d, ("psnr", "ssim", "rmse"))
    assert means["psnr"] > 25 and 0.5 < means["ssim"] <= 1.0
    assert os.path.exists(os.path.join(d, "scores.txt"))
    assert os.path.exists(os.path.join(d, "psnr.txt"))
    assert len(np.loadtxt(os.path.join(d, "psnr.txt")).reshape(-1)) == 3


def test_visualizer(tmp_path):
    opt, state, spec, grid, batch, xyz = tiny_setup()
    opt = opt.replace(checkpoints_dir=str(tmp_path), experiment="viz")
    viz = Visualizer(opt)
    img = np.random.RandomState(0).uniform(0, 1, (8, 8, 3))
    viz.display_current_results({"coarse_raycolor": img}, 5)
    assert os.path.exists(os.path.join(viz.image_dir, "step-0005-coarse_raycolor.png"))
    p = viz.save_neural_points(5, np.asarray(state["xyz"]),
                               np.asarray(state["color"]),
                               np.asarray(state["conf"]),
                               np.asarray(state["mask"]))
    pts = np.loadtxt(p)
    assert pts.shape == (xyz.shape[0], 7)
    viz.accumulate_losses({"loss_coarse_raycolor": 0.01})
    viz.accumulate_losses({"loss_coarse_raycolor": 0.02})
    means = viz.print_losses(5)
    np.testing.assert_allclose(means["loss_coarse_raycolor"], 0.015)
    assert "loss_coarse_raycolor_psnr" in means
    assert os.path.exists(viz.log_path)


def test_checkpoint_roundtrip(tmp_path):
    opt, state, spec, grid, batch, xyz = tiny_setup()
    ts = trainer.create_train_state(opt, jax.random.PRNGKey(0), state)
    d = str(tmp_path)
    C.save_checkpoint(d, 7, ts, opt, best_psnr=31.5, best_iter=7)
    assert C.latest_step(d) == 7

    template = trainer.create_train_state(opt, jax.random.PRNGKey(42), state)
    loaded, counters = C.load_checkpoint(d, template)
    assert counters["total_steps"] == 7
    assert abs(counters["best_PSNR"] - 31.5) < 1e-6
    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_cross_layout_resume(tmp_path):
    """A {iter}_full.npz written with one packed_point_adam layout resumes
    into a template built with the other: load_pytree_npz column-splits /
    column-concats the point-Adam moments in packed_rows_transform's
    sorted-key order, so the values must survive exactly."""
    opt, state, spec, grid, batch, xyz = tiny_setup()

    def pack(x):
        if isinstance(x, dict):
            return np.concatenate(
                [np.asarray(x[k]) for k in sorted(x)], axis=1)
        return np.asarray(x)

    for a, b in ((0, 1), (1, 0)):
        ts = trainer.create_train_state(
            opt.replace(packed_point_adam=a), jax.random.PRNGKey(0), state)
        # fill the moments with per-leaf-distinct values so a wrong column
        # mapping cannot pass by accident
        cnt = iter(range(10 ** 6))
        def fill(leaf):
            if hasattr(leaf, "dtype") and leaf.ndim >= 1 and \
                    jnp.issubdtype(leaf.dtype, jnp.floating):
                rng = np.random.RandomState(next(cnt))
                return jnp.asarray(
                    rng.uniform(-1, 1, leaf.shape).astype(leaf.dtype))
            return leaf
        ts = ts._replace(opt_state_pts=jax.tree.map(fill, ts.opt_state_pts))
        d = str(tmp_path / f"layout_{a}_to_{b}")
        C.save_checkpoint(d, 3, ts, opt.replace(packed_point_adam=a))

        template = trainer.create_train_state(
            opt.replace(packed_point_adam=b), jax.random.PRNGKey(7), state)
        loaded, counters = C.load_checkpoint(d, template)
        assert counters["total_steps"] == 3
        np.testing.assert_array_equal(pack(ts.opt_state_pts[0].mu),
                                      pack(loaded.opt_state_pts[0].mu))
        np.testing.assert_array_equal(pack(ts.opt_state_pts[0].nu),
                                      pack(loaded.opt_state_pts[0].nu))
        for k in ts.pt_train:
            np.testing.assert_array_equal(np.asarray(ts.pt_train[k]),
                                          np.asarray(loaded.pt_train[k]))


def test_reference_export_import_roundtrip(tmp_path):
    opt, state, spec, grid, batch, xyz = tiny_setup()
    ts = trainer.create_train_state(opt, jax.random.PRNGKey(0), state)
    path = os.path.join(str(tmp_path), "x.npz")
    C.export_reference_npz(path, ts.agg_params, trainer.point_state_of(ts))
    raw = dict(np.load(path))
    # reference key names present
    assert "aggregator.block1.0.weight" in raw
    assert "neural_points.points_embeding" in raw
    assert raw["neural_points.xyz"].shape[0] == 1  # [1,N,3] like the reference
    agg, pts = C.import_reference_dict(raw, opt)
    for branch in ts.agg_params:
        for la, lb in zip(ts.agg_params[branch], agg[branch]):
            np.testing.assert_allclose(np.asarray(la["w"]), np.asarray(lb["w"]),
                                       rtol=1e-6)
    n = int(np.asarray(state["mask"]).sum())
    np.testing.assert_allclose(pts["xyz"], np.asarray(state["xyz"])[:n], rtol=1e-6)
    np.testing.assert_allclose(pts["embedding"],
                               np.asarray(state["embedding"])[:n], rtol=1e-6)


def test_torch_import(tmp_path):
    torch = __import__("torch")
    opt, state, spec, grid, batch, xyz = tiny_setup()
    ts = trainer.create_train_state(opt, jax.random.PRNGKey(0), state)
    # craft a torch state dict with reference names from our params
    sd = {}
    for branch, layers in ts.agg_params.items():
        for i, l in enumerate(layers):
            sd[f"aggregator.{branch}.{2*i}.weight"] = torch.from_numpy(
                np.asarray(l["w"]).T.copy())
            sd[f"aggregator.{branch}.{2*i}.bias"] = torch.from_numpy(
                np.asarray(l["b"]).copy())
    sd["neural_points.xyz"] = torch.from_numpy(np.asarray(state["xyz"])[None].copy())
    sd["neural_points.points_embeding"] = torch.from_numpy(
        np.asarray(state["embedding"])[None].copy())
    p = os.path.join(str(tmp_path), "10000_net_ray_marching.pth")
    torch.save(sd, p)
    agg, pts = C.load_reference_torch(p, opt)
    np.testing.assert_allclose(np.asarray(agg["block1"][0]["w"]),
                               np.asarray(ts.agg_params["block1"][0]["w"]), rtol=1e-6)
    assert pts["xyz"].shape == np.asarray(state["xyz"]).shape


def test_kill_resume_bitwise_equivalence(tmp_path):
    """Checkpoint at step 10, restore into a fresh state, continue to step 20:
    parameters must match the uninterrupted 20-step run bitwise (per-step rng
    folds from state.step, so training is resume-deterministic — the
    reference cannot do this: it never saves optimizer state)."""
    opt, state, spec, grid, batch, xyz = tiny_setup()
    from test_end_to_end import make_gt
    gt, _ = make_gt(batch)
    batch = dict(batch, gt_image=gt)
    key = jax.random.PRNGKey(3)

    ts = trainer.create_train_state(opt, jax.random.PRNGKey(0), state)
    # uninterrupted
    cur = ts
    for _ in range(20):
        cur, _ = trainer.train_step(cur, grid, batch, key, opt, spec)

    # interrupted at 10
    half = ts
    for _ in range(10):
        half, _ = trainer.train_step(half, grid, batch, key, opt, spec)
    d = str(tmp_path)
    C.save_checkpoint(d, 10, half, opt)
    template = trainer.create_train_state(opt, jax.random.PRNGKey(99), state)
    restored, counters = C.load_checkpoint(d, template)
    assert counters["total_steps"] == 10
    for _ in range(10):
        restored, _ = trainer.train_step(restored, grid, batch, key, opt, spec)

    for a, b in zip(jax.tree.leaves(cur), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluate_cli(tmp_path):
    """run/evaluate.py mirrors the reference standalone metrics CLI
    (reference run/evaluate.py:20-31)."""
    import imageio.v2 as imageio
    from pointnerf_tpu.run.evaluate import main as eval_main

    d = str(tmp_path)
    rng = np.random.RandomState(0)
    for i in range(3):
        img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        noisy = np.clip(img.astype(int) + rng.randint(-5, 5, img.shape),
                        0, 255).astype(np.uint8)
        imageio.imwrite(os.path.join(d, "step-%04d-gt_image.png" % i), img)
        imageio.imwrite(os.path.join(d, "step-%04d-coarse_raycolor.png" % i),
                        noisy)
    scores = eval_main(["-i", d, "-m", "psnr", "ssim", "rmse"])
    assert scores["psnr"] > 20 and 0.9 < scores["ssim"] <= 1.0
    assert os.path.exists(os.path.join(d, "scores.txt"))


def test_plateau_tracker_matches_torch():
    """PlateauTracker reduction steps match torch ReduceLROnPlateau
    (mode=min, factor=0.2, threshold=0.01, patience=5 — the reference's
    configuration, helpers/networks.py:50-55) on a noisy metric sequence."""
    import torch
    from pointnerf_tpu.models.networks import PlateauTracker

    p = torch.nn.Parameter(torch.zeros(1))
    opt_t = torch.optim.SGD([p], lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt_t, mode="min", factor=0.2, threshold=0.01, patience=5)
    tracker = PlateauTracker()

    rng = np.random.RandomState(3)
    metric, lr_ours = 10.0, 1.0
    for i in range(80):
        # improving phase, then a long plateau, then improvement again
        if i < 10 or 40 <= i < 45:
            metric *= 0.9
        m = metric * (1.0 + 0.005 * rng.randn())
        sched.step(m)
        if tracker.update(m):
            lr_ours *= tracker.factor
        assert abs(opt_t.param_groups[0]["lr"] - lr_ours) < 1e-9, i
    assert lr_ours < 1.0  # the plateau actually triggered reductions


def test_plateau_tracker_max_mode_fires_on_flat_psnr():
    """The driver tracks held-out PSNR with mode='max'. A flat or declining
    PSNR sequence must fire reductions (the old negated-PSNR-into-min-mode
    formulation fired ZERO: for negative metrics best*(1-thr) > best, so
    every eval counted as improvement). Parity vs torch mode='max'."""
    import torch
    from pointnerf_tpu.models.networks import PlateauTracker

    p = torch.nn.Parameter(torch.zeros(1))
    opt_t = torch.optim.SGD([p], lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt_t, mode="max", factor=0.2, threshold=0.01, patience=5)
    tracker = PlateauTracker(mode="max")

    fires = 0
    psnr, lr_ours = 25.0, 1.0
    for i in range(60):
        # rising phase, then flat, then gently declining
        if i < 10:
            psnr += 0.5
        elif i >= 40:
            psnr -= 0.05
        sched.step(psnr)
        if tracker.update(psnr):
            lr_ours *= tracker.factor
            fires += 1
        assert abs(opt_t.param_groups[0]["lr"] - lr_ours) < 1e-9, i
    assert fires >= 2  # flat AND declining phases both fired

    # regression: 40 flat evals through min-mode on a negated score fire 0 —
    # the exact silent no-op the driver used to hit
    broken = PlateauTracker(mode="min")
    assert not any(broken.update(-30.0) for _ in range(40))

    # state round-trip (checkpoint resume)
    d = tracker.state_dict()
    t2 = PlateauTracker(mode="max")
    t2.load_state_dict(d)
    assert t2.best == tracker.best and t2.num_bad == tracker.num_bad


def test_visualizer_tensorboard(tmp_path):
    """--show_tensorboard wires tensorboardX scalar emission
    (reference: options/base_options.py:87-90, utils/visualizer.py:47-52,176-182)."""
    import pytest
    pytest.importorskip("tensorboardX")
    opt, state, spec, grid, batch, xyz = tiny_setup()
    opt = opt.replace(checkpoints_dir=str(tmp_path), experiment="tbviz",
                      show_tensorboard=1)
    viz = Visualizer(opt)
    assert viz.tb is not None
    viz.accumulate_losses({"loss_coarse_raycolor": 0.01})
    viz.print_losses(3)
    viz.tb.flush()
    tb_dir = os.path.join(str(tmp_path), "tbviz", "tb")
    events = [f for f in os.listdir(tb_dir) if "tfevents" in f]
    assert events, "no tensorboard event file written"
    # default-off: no tb dir side effects
    opt0 = opt.replace(experiment="tbviz0", show_tensorboard=0)
    assert Visualizer(opt0).tb is None


def test_mvs_lr_flag():
    """--mvs_lr gives the MVS optimizer its own LR, falling back to --lr
    (reference: models/mvs_points_volumetric_model.py:73-77)."""
    from pointnerf_tpu.run.common import options_from_cli
    from pointnerf_tpu.run.train import make_optimizers
    import optax

    opt = options_from_cli(["--preset", "dtu_gen", "--mvs_lr", "0.0001"])
    assert opt.mvs_lr == 0.0001 and isinstance(opt.mvs_lr, float)
    opt_default = options_from_cli(["--preset", "dtu_gen"])
    assert opt_default.mvs_lr is None

    def first_update(o):
        _, mvs_tx = make_optimizers(o)
        p = {"w": jnp.ones((3,))}
        st = mvs_tx.init(p)
        up, _ = mvs_tx.update({"w": jnp.ones((3,))}, st, p)
        return np.asarray(up["w"])

    u_custom = first_update(opt)
    u_fallback = first_update(opt_default)
    # adam first step is sign(g)*lr: the ratio of updates is the ratio of lrs
    np.testing.assert_allclose(u_custom / u_fallback,
                               0.0001 / opt_default.lr, rtol=1e-5)
