"""SPMD parallelism for pointnerf_tpu.

The reference's only multi-device mechanism is single-process
`torch.nn.DataParallel` over the ray batch
(reference: models/neural_points_volumetric_model.py:165-168). Its TPU-native
equivalent is GSPMD over a `jax.sharding.Mesh`: rays are embarrassingly parallel,
so the batch shards over a ("batch", "rays") mesh riding ICI while model
parameters, the neural point cloud and the voxel grid replicate; XLA inserts the
gradient `psum`s. No pipeline/expert parallelism exists in the reference
(SURVEY.md §2.2) and none is warranted by the model (256-wide MLPs); the
scaling axes that matter are rays (dp.py) and points (points.py —
capacity-axis sharding of the point buffers, voxel buckets and their Adam
state: this workload's model parallelism, replacing the reference's
CPU-spill fallback for multi-million-point ScanNet/T&T scenes).
"""

from .mesh import make_mesh, replicate, shard_batch, batch_pspec
from .dp import make_dp_train_step, make_dp_eval_step
from .points import (make_mp_train_step, make_mp_eval_step, shard_state,
                     shard_grid, state_shardings, grid_shardings)
from .driver import MeshRunner, make_runner

__all__ = [
    "make_mesh", "replicate", "shard_batch", "batch_pspec",
    "make_dp_train_step", "make_dp_eval_step",
    "make_mp_train_step", "make_mp_eval_step", "shard_state", "shard_grid",
    "state_shardings", "grid_shardings",
    "MeshRunner", "make_runner",
]
