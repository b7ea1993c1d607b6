"""Quality regression gate (SURVEY.md §7.3).

Two guards the reference lacks:

1. a RECORDED end-to-end PSNR: fixed-seed tiny-scene training must land
   within ±0.1 dB of the value recorded when the pipeline was known-good —
   catches silent quality regressions anywhere in query/aggregate/march/
   loss/optimizer;
2. checkpoint round-trip render parity: exporting reference-format weights
   and re-importing them must reproduce the render bit-identically.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from pointnerf_tpu.train import trainer
from pointnerf_tpu.utils import checkpoint as C
from pointnerf_tpu.utils.metrics import psnr

from test_end_to_end import tiny_setup, make_gt

# Recorded on the known-good pipeline (jax 0.9.0 CPU, 2026-08-16, round 2).
# A drift beyond ±0.1 dB means rendering or training numerics changed —
# investigate before re-recording.
RECORDED_PSNR = 34.2048


def _train_psnr(steps: int = 150) -> float:
    opt, state, spec, grid, batch, _ = tiny_setup(R_side=12)
    gt, _ = make_gt(batch)
    train_batch = dict(batch, gt_image=gt)
    ts = trainer.create_train_state(opt, jax.random.PRNGKey(1), state)
    key = jax.random.PRNGKey(2)
    for _ in range(steps):
        key, sub = jax.random.split(key)
        ts, _ = trainer.train_step(ts, grid, train_batch, sub, opt, spec)
    out = trainer.eval_step(ts, grid, batch, opt, spec)
    img = np.asarray(out["coarse_raycolor"][0])
    return float(psnr(np.asarray(gt[0]), img))


def test_recorded_psnr_regression():
    got = _train_psnr()
    if RECORDED_PSNR is None:
        raise AssertionError(f"record this PSNR: {got:.4f}")
    assert abs(got - RECORDED_PSNR) <= 0.1, (got, RECORDED_PSNR)


def test_checkpoint_roundtrip_render_parity(tmp_path):
    """export_reference_npz -> import_reference_dict -> bit-identical render
    (reference key-name format, utils/checkpoint.py:72-124)."""
    opt, state, spec, grid, batch, _ = tiny_setup()
    gt, _ = make_gt(batch)
    train_batch = dict(batch, gt_image=gt)
    ts = trainer.create_train_state(opt, jax.random.PRNGKey(3), state)
    key = jax.random.PRNGKey(4)
    for _ in range(5):
        key, sub = jax.random.split(key)
        ts, _ = trainer.train_step(ts, grid, train_batch, sub, opt, spec)

    out_a = trainer.eval_step(ts, grid, batch, opt, spec)

    path = os.path.join(str(tmp_path), "5_net_ray_marching.npz")
    C.export_reference_npz(path, ts.agg_params, trainer.point_state_of(ts))
    raw = dict(np.load(path))
    agg, pts = C.import_reference_dict(raw, opt)
    from pointnerf_tpu.models import neural_points as npc
    state2 = npc.create_point_cloud(
        pts["xyz"], pts["embedding"], pts.get("color"), pts.get("dir"),
        pts.get("conf"), Rw2c=pts.get("Rw2c"))
    ts2 = trainer.create_train_state(opt, jax.random.PRNGKey(9), state2)
    ts2 = ts2._replace(agg_params=agg)
    from pointnerf_tpu.ops.grid import build_grid
    grid2 = build_grid(state2["xyz"], state2["mask"], spec)

    out_b = trainer.eval_step(ts2, grid2, batch, opt, spec)
    np.testing.assert_array_equal(np.asarray(out_a["coarse_raycolor"]),
                                  np.asarray(out_b["coarse_raycolor"]))
    np.testing.assert_array_equal(np.asarray(out_a["coarse_point_opacity"]),
                                  np.asarray(out_b["coarse_point_opacity"]))
