"""Device mesh construction and sharding helpers.

Replaces the reference's implicit DataParallel scatter/replicate/gather
(reference: models/neural_points_volumetric_model.py:165-168) with explicit
`jax.sharding` placement: batch leaves shard over ("batch", "rays"); everything
else (aggregator params, point buffers, voxel grid, optimizer state) replicates.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Batch keys carrying a ray axis at dim 1: [B, R, ...]. Everything else in a batch
# (campos [B,3], camrotc2w [B,3,3], near/far scalars, bg_color) is per-camera or
# scalar and shards only over "batch".
RAY_AXIS_KEYS = frozenset({
    "raydir", "gt_image", "pixel_idx", "bg_ray", "gt_mask", "gt_depth",
})
PER_CAMERA_KEYS = frozenset({
    "campos", "camrotc2w", "intrinsic", "bg_color",
})


def make_mesh(n_devices: Optional[int] = None,
              batch_size: int = 1,
              devices: Optional[Sequence] = None,
              points: int = 1) -> Mesh:
    """Mesh with axes ("batch", "rays") — or ("batch", "rays", "points")
    when points > 1.

    With batch_size=1 (the reference's per-scene finetune regime) all devices go to
    the ray axis — the direct analog of DataParallel's ray-batch scatter. The
    "points" axis shards the point buffers / voxel buckets / their Adam state
    (HBM capacity scaling for multi-million-point scenes, SURVEY.md §2.2);
    rays×points is this workload's dp×tp plane.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    assert n_devices % points == 0, (n_devices, points)
    nr = n_devices // points
    b = int(np.gcd(batch_size, nr))
    if points > 1:
        arr = np.asarray(devices).reshape(b, nr // b, points)
        return Mesh(arr, axis_names=("batch", "rays", "points"))
    arr = np.asarray(devices).reshape(b, nr // b)
    return Mesh(arr, axis_names=("batch", "rays"))


def batch_pspec(batch: Dict, leading: int = 0) -> Dict:
    """PartitionSpec tree for a render/train batch.

    ``leading`` prepends that many unsharded axes — used for the stacked
    [S, B, R, ...] batches of trainer.train_steps_scan (the scan axis is
    sequential time, never sharded)."""
    pre = (None,) * leading
    specs = {}
    for k, v in batch.items():
        nd = getattr(v, "ndim", 0)
        if k in RAY_AXIS_KEYS and nd >= leading + 2:
            specs[k] = P(*pre, "batch", "rays")
        elif k in PER_CAMERA_KEYS and nd >= leading + 1:
            specs[k] = P(*pre, "batch")
        else:
            specs[k] = P()
    return specs


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place batch leaves on the mesh (rays split across chips over ICI)."""
    specs = batch_pspec(batch)
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh (params / points / grid / opt state)."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
