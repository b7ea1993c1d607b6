"""Data-parallel (over rays) train/eval steps on a device mesh.

GSPMD formulation of the reference's DataParallel forward+backward
(reference: models/neural_points_volumetric_model.py:165-211): the step function
is jitted with explicit input/output shardings — batch split over the
("batch", "rays") axes, state replicated — and XLA inserts the cross-chip
`psum` for parameter gradients (the reference's implicit gather onto GPU0).

Losses here are *masked means over the full ray batch*, which under GSPMD
reduce globally — so per-step numerics match the single-chip step exactly
(DataParallel, by contrast, averages per-GPU losses of unequal mask counts).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train import trainer
from .mesh import batch_pspec


def _with_comp_groups(opt, mesh: Mesh):
    """Set opt.comp_groups to the mesh's ray-axis size so the SR_budget
    compaction is blocked per ray shard — without it the compacted shade +
    backward phase (the step's dominant compute) REPLICATES on every device
    (round-5 finding; see Options.comp_groups and query_grid_points)."""
    g = int(mesh.shape.get("rays", 1))
    if int(getattr(opt, "comp_groups", 1)) != 1 or g <= 1:
        return opt  # explicit user value wins; single-ray-shard meshes noop
    return opt.replace(comp_groups=g)


def make_dp_train_step(opt, spec, mesh: Mesh, example_batch: Dict):
    """Jitted train step with explicit shardings for `mesh`.

    Returns step(state, grid, batch, key) -> (state, loss_items). State, grid and
    key replicate; the batch shards per `batch_pspec`. Output state replicates
    (gradients are globally reduced before the optimizer update, so every chip
    computes the identical update).
    """
    repl = NamedSharding(mesh, P())
    bspec = {k: NamedSharding(mesh, s) for k, s in batch_pspec(example_batch).items()}

    fn = functools.partial(trainer.train_step_impl,
                           opt=_with_comp_groups(opt, mesh), spec=spec)
    return jax.jit(
        fn,
        in_shardings=(repl, repl, bspec, repl),
        out_shardings=(repl, repl),
    )


def make_dp_eval_step(opt, spec, mesh: Mesh, example_batch: Dict, prob: bool = False):
    """Jitted eval/render step with batch sharded over the mesh.

    Outputs keep the ray axis, so they come back sharded like the inputs — the
    host only gathers when it materializes the image (the reference gathers every
    chunk onto GPU0 through DataParallel's output concat).
    """
    repl = NamedSharding(mesh, P())
    bspec = {k: NamedSharding(mesh, s) for k, s in batch_pspec(example_batch).items()}

    fn = functools.partial(trainer.eval_step_impl,
                           opt=_with_comp_groups(opt, mesh), spec=spec,
                           prob=prob)
    return jax.jit(fn, in_shardings=(repl, repl, bspec))
