"""SPMD parallelism for pointnerf_tpu.

The reference's only multi-device mechanism is single-process
`torch.nn.DataParallel` over the ray batch
(reference: models/neural_points_volumetric_model.py:165-168). Its TPU-native
equivalent is GSPMD over a `jax.sharding.Mesh`: rays are embarrassingly parallel,
so the batch shards over a ("batch", "rays") mesh riding ICI while model
parameters, the neural point cloud and the voxel grid replicate; XLA inserts the
gradient `psum`s. No tensor/pipeline/expert parallelism exists in the reference
(SURVEY.md §2.2) and none is warranted by the model (256-wide MLPs); the scaling
axes that matter are rays (here) and points (region sharding, for multi-million
point ScanNet/T&T scenes).
"""

from .mesh import make_mesh, replicate, shard_batch, batch_pspec
from .dp import make_dp_train_step, make_dp_eval_step

__all__ = [
    "make_mesh", "replicate", "shard_batch", "batch_pspec",
    "make_dp_train_step", "make_dp_eval_step",
]
