"""Driver-level multi-chip runner: the `--n_devices` / `--gpu_ids` semantics.

The reference engages its one parallelism mechanism from a flag — `--gpu_ids`
wraps the render module in `torch.nn.DataParallel`
(reference: models/neural_points_volumetric_model.py:165-168,
options/base_options.py:79-82) — and every driver gets multi-device for free.
`MeshRunner` is that object for the SPMD library in this package: the drivers
(run/train_ft.py, run/test_ft.py, run/render_vid.py) construct one from the
options and route every device interaction through it, so `--n_devices 8`
(or `--gpu_ids 0 1 ... 7`, which config.validate_options maps onto it) is all
a user changes to go multi-chip.

Placement policy (see parallel/{dp,points}.py for the step formulations):

* ``mesh_points == 1``: pure dp — state/grid replicate, the ray batch shards
  over ("batch", "rays"); gradients reduce with a GSPMD-inserted psum.
* ``mesh_points > 1``: the capacity-axis point buffers, voxel bucket tables
  and points-side Adam moments additionally shard over "points" (HBM
  capacity scaling — the reference's cpu2gpu spill equivalent).

Rare host-side events (prune / grow / probe candidates / checkpoint IO)
follow the gather → host rebuild → reshard pattern: `gather_state` pulls the
buffers to host numpy, the exact single-chip code runs, and `place_state` /
`place_grid` put the results back under the canonical shardings. These fire
every few thousand steps, so the transfer cost is noise; the hot loop stays
a single sharded dispatch per `steps_per_dispatch` steps.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train import trainer
from .mesh import make_mesh, batch_pspec
from .points import state_shardings, grid_shardings


def _struct_key(tree) -> Tuple:
    """Hashable (path, shape, dtype) summary of a pytree — jit-cache key part."""
    leaves, treedef = jax.tree.flatten(tree)
    return (str(treedef),) + tuple(
        (getattr(l, "shape", ()), str(getattr(l, "dtype", type(l))))
        for l in leaves)


class MeshRunner:
    """Holds the mesh and a cache of sharding-annotated jitted steps."""

    def __init__(self, opt):
        n = opt.n_devices
        avail = len(jax.devices())
        if n in (0, -1):   # 0: only reachable with mesh_points > 1 — use all
            n = avail
        if n > avail:
            raise ValueError(
                f"--n_devices {n} exceeds the {avail} available devices")
        self.n_devices = n
        self.points = int(opt.mesh_points)
        self.mesh: Mesh = make_mesh(n_devices=n, batch_size=1,
                                    points=self.points)
        self._repl = NamedSharding(self.mesh, P())
        self._jits: Dict = {}

    # ------------------------------------------------------------- placement
    def place_state(self, ts: trainer.TrainState) -> trainer.TrainState:
        if self.points > 1:
            sh = state_shardings(ts, self.mesh)
        else:
            sh = jax.tree.map(lambda _: self._repl, ts)
        return jax.tree.map(jax.device_put, ts, sh)

    def place_grid(self, grid: Dict, spec) -> Dict:
        if self.points > 1:
            sh = grid_shardings(grid, spec, self.mesh)
        else:
            sh = jax.tree.map(lambda _: self._repl, grid)
        return jax.tree.map(jax.device_put, grid, sh)

    def gather_state(self, ts: trainer.TrainState) -> trainer.TrainState:
        """Pull every buffer to host numpy (for prune/grow/ckpt host code)."""
        return jax.device_get(ts)

    def place_batch(self, batch: Dict, leading: int = 0) -> Dict:
        specs = batch_pspec(batch, leading=leading)
        out = {}
        for k, v in batch.items():
            if hasattr(v, "ndim"):
                out[k] = jax.device_put(v, NamedSharding(self.mesh, specs[k]))
            else:
                out[k] = v
        return out

    def place_key(self, key):
        return jax.device_put(key, self._repl)

    # ------------------------------------------------------------ train steps
    def _get_step(self, kind: str, opt, spec, ts, grid, batch, leading: int):
        cache_key = (kind, opt, spec, _struct_key(ts), _struct_key(grid),
                     _struct_key(batch))
        fn = self._jits.get(cache_key)
        if fn is not None:
            return fn
        if self.points > 1:
            ts_sh = state_shardings(ts, self.mesh)
            g_sh = grid_shardings(grid, spec, self.mesh)
        else:
            ts_sh = jax.tree.map(lambda _: self._repl, ts)
            g_sh = jax.tree.map(lambda _: self._repl, grid)
        # scalar leaves (python floats) replicate — None inside an
        # in_shardings pytree would read as an empty subtree, not "auto"
        b_sh = {k: NamedSharding(self.mesh, s)
                for k, s in batch_pspec(batch, leading=leading).items()}
        impl = trainer.train_step_impl if kind == "step" \
            else trainer.train_steps_scan_impl
        from .dp import _with_comp_groups
        fn = jax.jit(
            functools.partial(impl, opt=_with_comp_groups(opt, self.mesh),
                              spec=spec),
            in_shardings=(ts_sh, g_sh, b_sh, self._repl),
            out_shardings=(ts_sh, self._repl),
        )
        self._jits[cache_key] = fn
        return fn

    def train_step(self, ts, grid, batch, key, opt, spec):
        batch = self.place_batch(batch)
        fn = self._get_step("step", opt, spec, ts, grid, batch, leading=0)
        return fn(ts, grid, batch, self.place_key(key))

    def train_steps_scan(self, ts, grid, batches, key, opt, spec):
        batches = self.place_batch(batches, leading=1)
        fn = self._get_step("scan", opt, spec, ts, grid, batches, leading=1)
        return fn(ts, grid, batches, self.place_key(key))


def make_runner(opt) -> Optional[MeshRunner]:
    """A MeshRunner when the options ask for multi-device, else None.

    `validate_options` already mapped multi-id `--gpu_ids` onto `n_devices`
    (config.py), so this is the single decision point the drivers share."""
    if opt.n_devices in (0, 1) and opt.mesh_points <= 1:
        return None
    return MeshRunner(opt)
