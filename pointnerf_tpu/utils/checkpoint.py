"""Checkpoint save / load / resume + reference-torch interop.

Layout per experiment dir (mirrors the reference, SURVEY.md §2.4):
  {step}_net_ray_marching.npz  — reference-style key names (`neural_points.xyz`,
                                 `aggregator.block1.0.weight`, ...); portable
                                 export that run/editing-style tools read directly
  {step}_states.npz            — counters {epoch_count, total_steps, best_PSNR,
                                 best_iter} (reference: run/train_ft.py:956-964)
  {step}_full.npz              — full TrainState incl. both Adam states, flattened
                                 by pytree key path (exact resume; the reference
                                 cannot resume optimizer state at all)

`load_reference_torch` imports the reference's .pth checkpoints
(reference: models/base_model.py:85-121) — torch Linear weights are [out,in] and
transpose to our [in,out].
"""

from __future__ import annotations

import glob
import os
import re
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ------------------------------------------------------------------ pytree <-> npz
def _flatten_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_pytree_npz(path: str, tree) -> None:
    np.savez_compressed(path, **_flatten_with_paths(tree))


def load_pytree_npz(path: str, template):
    """Restore a pytree saved by save_pytree_npz using `template` for structure.

    The point-Adam moments exist in two elementwise-identical layouts
    (trainer.packed_rows_transform packs the per-buffer [cap,Ci] leaves into
    one [cap,ΣCi] array in sorted-key column order). A checkpoint written
    with one layout loads into a template built with the other: a template
    dict of 2-D leaves whose parent key is a single array in the file is
    column-split, and a template 2-D leaf whose key holds a dict of arrays
    in the file is column-concatenated — both in the same sorted-key order
    packed_rows_transform uses, so the conversion is exact."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    keyed = []
    for p, leaf in flat:
        key = "/".join(str(getattr(q, "key", getattr(q, "idx", q))) for q in p)
        keyed.append((key, leaf))
    # per-parent sorted (child, width) map for packed -> per-buffer splits
    sib: Dict[str, list] = {}
    for key, leaf in keyed:
        parent, _, name = key.rpartition("/")
        if parent and hasattr(leaf, "ndim") and getattr(leaf, "ndim", 0) == 2:
            sib.setdefault(parent, []).append((name, leaf.shape[1]))
    for parent in sib:
        sib[parent].sort()

    def resolve(key, leaf):
        if key in data:
            return data[key]
        parent, _, name = key.rpartition("/")
        if parent in data and parent in sib:  # packed file -> split template
            arr, off = data[parent], 0
            for n, w in sib[parent]:
                if n == name:
                    return arr[:, off:off + w]
                off += w
        children = sorted(k for k in data.files if k.startswith(key + "/"))
        if children and getattr(leaf, "ndim", 0) == 2:  # split file -> packed
            return np.concatenate([data[c] for c in children], axis=1)
        raise KeyError(f"checkpoint {path} missing key {key}")

    leaves = []
    for key, leaf in keyed:
        arr = resolve(key, leaf)
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(f"{key}: shape {arr.shape} != template {leaf.shape}")
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ------------------------------------------------------- reference-style key names
_BRANCHES = ("block1", "block2", "block3", "alpha_branch", "color_branch",
             "feat_weight_mlp")
_POINT_KEYS = {  # ours -> reference buffer name (neural_points.py:244-288)
    "xyz": "neural_points.xyz",
    "embedding": "neural_points.points_embeding",
    "conf": "neural_points.points_conf",
    "dir": "neural_points.points_dir",
    "color": "neural_points.points_color",
}


def export_reference_npz(path: str, agg_params: Dict, point_state: Dict) -> None:
    """Write the user-facing checkpoint with reference key names."""
    out = {}
    for branch in _BRANCHES:
        if branch not in agg_params:
            continue
        for i, layer in enumerate(agg_params[branch]):
            # torch nn.Sequential(Linear, act, ...) puts Linears at even indices
            out[f"aggregator.{branch}.{2 * i}.weight"] = \
                np.asarray(layer["w"]).T  # ours [in,out] -> torch [out,in]
            out[f"aggregator.{branch}.{2 * i}.bias"] = np.asarray(layer["b"])
    n = int(np.asarray(point_state["mask"]).sum())
    order = np.argsort(~np.asarray(point_state["mask"]), kind="stable")[:n]
    for ours, ref in _POINT_KEYS.items():
        if point_state.get(ours) is None:
            continue
        arr = np.asarray(point_state[ours])[order]
        # reference stores [1, N, C]
        out[ref] = arr[None]
    out["neural_points.Rw2c"] = np.asarray(point_state["Rw2c"])
    np.savez_compressed(path, **out)


def import_reference_dict(raw: Dict[str, np.ndarray], opt) -> Tuple[Dict, Dict]:
    """Reference-style key dict -> (agg_params, point_arrays).

    point_arrays holds unpadded host arrays (xyz [N,3], embedding [N,C], ...)
    ready for models.neural_points.create_point_cloud.
    """
    agg: Dict = {}
    lin = re.compile(r"^aggregator\.(\w+)\.(\d+)\.(weight|bias)$")
    for key, arr in raw.items():
        m = lin.match(key)
        if not m:
            continue
        branch, idx, kind = m.group(1), int(m.group(2)), m.group(3)
        layers = agg.setdefault(branch, {})
        layer = layers.setdefault(idx // 2, {})
        if kind == "weight":
            layer["w"] = jnp.asarray(np.asarray(arr, np.float32).T)
        else:
            layer["b"] = jnp.asarray(np.asarray(arr, np.float32))
    agg = {b: [layers[i] for i in sorted(layers)] for b, layers in agg.items()}

    pts = {}
    for ours, ref in _POINT_KEYS.items():
        if ref in raw:
            arr = np.asarray(raw[ref], np.float32)
            pts[ours] = arr[0] if arr.ndim == 3 else arr
    if "neural_points.Rw2c" in raw:
        pts["Rw2c"] = np.asarray(raw["neural_points.Rw2c"], np.float32)
    return agg, pts


def load_reference_torch(path: str, opt) -> Tuple[Dict, Dict]:
    """Import a reference {iter}_net_ray_marching.pth (torch state dict)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    raw = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
           for k, v in sd.items()}
    return import_reference_dict(raw, opt)


# ------------------------------------------------------------------ save / resume
def save_checkpoint(ckpt_dir: str, step: int, state, opt,
                    best_psnr: float = 0.0, best_iter: int = 0,
                    epoch_count: int = 0,
                    extra_counters: Optional[Dict] = None) -> None:
    """Write export + counters + full-resume files (reference: train_ft.py:955-966).

    extra_counters carries scalar driver state beyond the reference's four
    (e.g. the plateau-reduced effective lr/plr and the PlateauTracker state,
    so a resume does not silently reset the learning rate to the CLI base —
    the reference rebuilds schedulers on resume and loses reductions too)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    from ..train.trainer import point_state_of
    export_reference_npz(
        os.path.join(ckpt_dir, f"{step}_net_ray_marching.npz"),
        state.agg_params, point_state_of(state))
    np.savez(os.path.join(ckpt_dir, f"{step}_states.npz"),
             epoch_count=epoch_count, total_steps=step,
             best_PSNR=best_psnr, best_iter=best_iter,
             **(extra_counters or {}))
    save_pytree_npz(os.path.join(ckpt_dir, f"{step}_full.npz"), state)


def latest_step(ckpt_dir: str) -> Optional[int]:
    """Scan *_states.npz for the newest step (reference: train_ft.py:542-546)."""
    steps = []
    for p in glob.glob(os.path.join(ckpt_dir, "*_states.npz")):
        m = re.match(r"^(\d+)_states\.npz$", os.path.basename(p))
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def load_checkpoint(ckpt_dir: str, state_template, step: Optional[int] = None):
    """Resume: returns (state, counters dict). step=None -> latest."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    state = load_pytree_npz(os.path.join(ckpt_dir, f"{step}_full.npz"),
                            state_template)
    counters = dict(np.load(os.path.join(ckpt_dir, f"{step}_states.npz")))
    _int_keys = ("epoch_count", "total_steps", "best_iter", "plateau_num_bad")
    counters = {k: (int(v) if k in _int_keys else float(v))
                for k, v in counters.items()}
    return state, counters
