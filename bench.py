"""Benchmark: per-scene finetune training throughput (rays/sec) on one chip.

Workload mirrors the reference's NeRF-Synthetic Lego finetune step
(reference: dev_scripts/w_n360/lego_cuda.sh — 60x60=3600 rays/iter, SR=80, K=8,
vsize=0.004, 400 raw depth samples), on a synthetic ~100k-point cloud spanning the
lego scene bounds. The full jitted step is timed: voxel-grid query + KNN, aggregator
MLPs, ray march, loss, backward, dual Adam updates.

Baseline: the reference publishes no throughput numbers (BASELINE.md). We use the
paper's convergence claim — 20k iters of 3600 rays in ~30 min on a 2080 Ti —
≈ 40,000 train-rays/sec as the comparison point.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

# persistent compile cache: without it every bench run pays full remote
# compiles (~3-5 min); tests/conftest.py sets the same path
import os as _os, sys as _sys
_d = _os.path.dirname(_os.path.abspath(__file__))
_sys.path[:0] = [_d, _os.path.dirname(_d)]
from pointnerf_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()  # host-keyed persistent compile cache (utils/cache.py)

BASELINE_RAYS_PER_SEC = 40000.0


def make_workload(**overrides):
    """Bench scene + state: lego-preset step on a synthetic ~100k-point cloud.

    Returns (opt, state, spec, grid, train_state, batch). Shared with
    scripts/perf_breakdown.py so phase timings measure the exact bench workload.
    """
    import jax
    import jax.numpy as jnp

    from pointnerf_tpu.config import nerf_synth_preset
    from pointnerf_tpu.models import neural_points as npc
    from pointnerf_tpu.ops.grid import make_grid_spec, build_grid
    from pointnerf_tpu.train import trainer

    kw = dict(
        max_o=280000,          # ~100k-point synthetic cloud occupies fewer voxels
        random_sample_size=60,
    )
    kw.update(overrides)
    opt = nerf_synth_preset("lego").replace(**kw)

    rng = np.random.RandomState(0)
    n_points = 100_000
    mn = np.asarray(opt.ranges[:3], np.float32)
    mx = np.asarray(opt.ranges[3:], np.float32)
    # cluster points on a shell + blobs so occupancy is sparse like a real scene
    xyz = rng.uniform(mn, mx, (n_points, 3)).astype(np.float32)
    shell = xyz / (np.linalg.norm(xyz / (mx - mn), axis=-1, keepdims=True) + 1e-6) * 0.6
    take = rng.rand(n_points) < 0.5
    xyz[take] = shell[take].astype(np.float32)
    emb = rng.uniform(-0.5, 0.5, (n_points, opt.point_features_dim)).astype(np.float32)
    color = rng.uniform(0, 1, (n_points, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_points, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    conf = np.full((n_points, 1), 0.8, np.float32)

    state = npc.create_point_cloud(xyz, emb, color, dirs, conf)
    spec = make_grid_spec(opt, points_min=xyz.min(0), points_max=xyz.max(0),
                          max_points=n_points)
    # jit the build: eagerly it is hundreds of per-op dispatches, each paying
    # the remote tunnel's ~10 ms host latency (minutes of pure overhead)
    grid = jax.jit(build_grid, static_argnames=("spec",))(
        state["xyz"], state["mask"], spec)
    ts = trainer.create_train_state(opt, jax.random.PRNGKey(0), state)

    R = opt.random_sample_size ** 2
    campos = np.array([[0.0, 0.0, 4.0]], np.float32)
    camrot = np.array([[[1, 0, 0], [0, -1, 0], [0, 0, -1]]], np.float32)
    px = rng.uniform(-0.35, 0.35, (1, R, 2)).astype(np.float32)
    raydir = np.concatenate([px, np.ones((1, R, 1), np.float32)], axis=-1)
    raydir = raydir @ camrot[0].T
    raydir /= np.linalg.norm(raydir, axis=-1, keepdims=True)
    batch = {
        "raydir": jnp.asarray(raydir),
        "campos": jnp.asarray(campos),
        "camrotc2w": jnp.asarray(camrot),
        "near": float(opt.near_plane), "far": float(opt.far_plane),
        "bg_color": jnp.ones((1, 3), jnp.float32),
        "gt_image": jnp.asarray(rng.uniform(0, 1, (1, R, 3)).astype(np.float32)),
    }
    return opt, state, spec, grid, ts, batch


def main():
    import jax
    import jax.numpy as jnp

    from pointnerf_tpu.train import trainer

    opt, state, spec, grid, ts, batch = make_workload()
    R = opt.random_sample_size ** 2

    key = jax.random.PRNGKey(1)
    # production path: steps_per_dispatch scan steps per device dispatch
    # (per-step randomness folds in from state.step inside the jit)
    S = opt.steps_per_dispatch
    batches = {k: (jnp.stack([v] * S) if hasattr(v, "ndim") else
                   jnp.full((S,), v, jnp.float32))
               for k, v in batch.items()}
    # warmup: compile AND materialize a scalar on the host. block_until_ready
    # alone does NOT guarantee completion through a remote-tunneled runtime;
    # only a host fetch of a value depending on the full chain does.
    ts, items = trainer.train_steps_scan(ts, grid, batches, key, opt, spec)
    float(items["loss_total"][-1])

    dispatches = 8
    t0 = time.perf_counter()
    for i in range(dispatches):
        ts, items = trainer.train_steps_scan(ts, grid, batches, key, opt, spec)
    final_loss = float(items["loss_total"][-1])  # forces the whole chain
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    rays_per_sec = dispatches * S * R / dt
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
