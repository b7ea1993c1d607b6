"""Point-axis sharding: the workload's model/tensor parallelism.

The reference replicates the whole point cloud on every GPU (DataParallel
replicates the module, models/neural_points_volumetric_model.py:165-168) and
spills to CPU when a scene outgrows one device (run/train_ft.py:68,80-86 —
SURVEY.md §2.2 "CPU⇄GPU memory streaming"). The TPU-native answer is a
"points" mesh axis: the padded point buffers, the voxel-bucket tables
(occ_2_xyz / super_xyz rows) and the points-side Adam moments all shard on
their capacity axis across chips — HBM capacity scales with the mesh instead
of falling back to host memory.

GSPMD formulation: the SAME pure train/eval step functions are jitted with
point-sharded in/out shardings; XLA inserts the cross-chip gathers for the
query's table reads and the reduce for the scatter-add backward. Dense
per-voxel maps (coor_occ_rows / coor_2_occ / coor_slot — O(vol) int8/int32)
replicate: they are index-addressed every sample and small relative to the
bucket payloads. Numerics are exactly the single-chip step's (tested on the
virtual CPU mesh, tests/test_parallel.py).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train import trainer
from .mesh import batch_pspec


def _cap_of(ts: trainer.TrainState) -> int:
    if "mask" in ts.pt_static:
        return int(ts.pt_static["mask"].shape[0])
    return int(next(iter(ts.pt_train.values())).shape[0])


def state_shardings(ts: trainer.TrainState, mesh: Mesh):
    """Sharding tree for a TrainState: capacity-axis leaves (point buffers +
    their Adam moments) shard over "points"; everything else replicates.
    Aggregator matrices are far smaller than any capacity (≥4096 after
    round_capacity), so the shape[0]==cap rule is unambiguous."""
    cap = _cap_of(ts)
    pts = NamedSharding(mesh, P("points"))
    repl = NamedSharding(mesh, P())

    def spec_for(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == cap:
            return pts
        return repl
    return jax.tree.map(spec_for, ts)


def grid_shardings(grid: Dict, spec, mesh: Mesh):
    """Bucket tables (max_o rows) shard over "points"; dense voxel maps
    replicate."""
    pts = NamedSharding(mesh, P("points"))
    repl = NamedSharding(mesh, P())

    def spec_for(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 \
                and leaf.shape[0] == spec.max_o:
            return pts
        return repl
    return jax.tree.map(spec_for, grid)


def shard_state(ts: trainer.TrainState, mesh: Mesh) -> trainer.TrainState:
    return jax.tree.map(jax.device_put, ts, state_shardings(ts, mesh))


def shard_grid(grid: Dict, spec, mesh: Mesh) -> Dict:
    return jax.tree.map(jax.device_put, grid, grid_shardings(grid, spec, mesh))


def make_mp_train_step(opt, spec, mesh: Mesh, example_batch: Dict,
                       example_state: trainer.TrainState, example_grid: Dict):
    """Jitted train step with point-sharded state/grid and ray-sharded batch.

    Returns step(state, grid, batch, key) -> (state, loss_items). The output
    state keeps the same point shardings (Adam updates are elementwise over
    the capacity axis — no resharding between steps)."""
    repl = NamedSharding(mesh, P())
    ts_sh = state_shardings(example_state, mesh)
    g_sh = grid_shardings(example_grid, spec, mesh)
    b_sh = {k: NamedSharding(mesh, s)
            for k, s in batch_pspec(example_batch).items()}

    from .dp import _with_comp_groups
    fn = functools.partial(trainer.train_step_impl,
                           opt=_with_comp_groups(opt, mesh), spec=spec)
    return jax.jit(fn,
                   in_shardings=(ts_sh, g_sh, b_sh, repl),
                   out_shardings=(ts_sh, repl))


def make_mp_eval_step(opt, spec, mesh: Mesh, example_batch: Dict,
                      example_state: trainer.TrainState, example_grid: Dict,
                      prob: bool = False):
    ts_sh = state_shardings(example_state, mesh)
    g_sh = grid_shardings(example_grid, spec, mesh)
    b_sh = {k: NamedSharding(mesh, s)
            for k, s in batch_pspec(example_batch).items()}
    from .dp import _with_comp_groups
    fn = functools.partial(trainer.eval_step_impl,
                           opt=_with_comp_groups(opt, mesh), spec=spec,
                           prob=prob)
    return jax.jit(fn, in_shardings=(ts_sh, g_sh, b_sh))
