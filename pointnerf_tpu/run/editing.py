"""Scene editing: compose point subsets from multiple checkpoints, rigidly
transform them, render the composite.

Reference: run/editing.py:123-237 — per part: a source checkpoint under
checkpoints_dir/edit_srcs/<name>/, an optional parts_index/<inds>.txt point
subset, an optional transforms/<trans>.txt 4x4 rigid transform. Rotated parts
carry per-point Rw2c = Rw2c_old @ Rot^T so view/dist features rotate with the
geometry (editing.py:203).

Usage: python -m pointnerf_tpu.run.editing --preset nerf_synth:lego \
  --neural_points_names lego chair --parts_index_names all seat \
  --Transformation_names no rot90 ...
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax

from ..config import Options
from ..data import create_dataset
from ..models import neural_points as npc
from ..train import trainer
from ..utils.checkpoint import (export_reference_npz, import_reference_dict,
                                latest_step, load_reference_torch)
from ..utils.visualizer import Visualizer
from .common import make_spec_and_grid, options_from_cli
from .render_vid import render_vid
from .train_ft import test


def load_part(ckpt_root: str, name: str, inds_name: str, trans_name: str,
              opt) -> Tuple[Dict, Dict, np.ndarray, np.ndarray, np.ndarray]:
    """(agg_params, point_arrays, keep_inds, Rot, Tran) for one part
    (reference load_parts_info, editing.py:123-138)."""
    src = os.path.join(ckpt_root, "edit_srcs", name)
    step = latest_step(src)
    npz_path = os.path.join(src, f"{step}_net_ray_marching.npz") \
        if step is not None else None
    if npz_path and os.path.exists(npz_path):
        raw = dict(np.load(npz_path))
        agg, pts = import_reference_dict(raw, opt)
    else:  # reference torch checkpoint
        import glob
        cands = sorted(glob.glob(os.path.join(src, "*_net_ray_marching.pth")))
        if not cands:
            raise FileNotFoundError(f"no checkpoint under {src}")
        agg, pts = load_reference_torch(cands[-1], opt)

    n = len(pts["xyz"])
    inds_file = os.path.join(src, "parts_index", inds_name + ".txt")
    inds = np.ones(n, bool) if inds_name.strip() == "all" else \
        np.loadtxt(inds_file).astype(bool)
    trans_file = os.path.join(src, "transforms", trans_name + ".txt")
    M = np.eye(4, dtype=np.float32) if trans_name.strip() == "no" else \
        np.loadtxt(trans_file).astype(np.float32)
    return agg, pts, inds, M[:3, :3], M[:3, 3]


def compose_parts(parts, opt) -> Tuple[Dict, Dict]:
    """Concat transformed parts into one padded point state; the first part's
    aggregator weights shade the composite (reference: one model renders all,
    editing.py:179-216)."""
    agg0 = None
    xyz_l, emb_l, col_l, dir_l, conf_l, rw2c_l = [], [], [], [], [], []
    for agg, pts, inds, Rot, Tran in parts:
        if agg0 is None:
            agg0 = agg
        xyz = pts["xyz"][inds]
        xyz = xyz @ Rot.T + Tran
        rw2c_old = pts.get("Rw2c", np.eye(3, dtype=np.float32))
        if rw2c_old.ndim == 2:
            rw2c = rw2c_old @ Rot.T            # (editing.py:203)
            rw2c = np.tile(rw2c[None], (len(xyz), 1, 1))
        else:
            rw2c = rw2c_old[inds] @ Rot.T
        xyz_l.append(xyz)
        emb_l.append(pts["embedding"][inds])
        col_l.append(pts["color"][inds] if pts.get("color") is not None
                     else np.full((len(xyz), 3), 0.5, np.float32))
        dir_l.append(pts["dir"][inds] @ Rot.T if pts.get("dir") is not None
                     else np.zeros((len(xyz), 3), np.float32))
        conf_l.append(pts["conf"][inds] if pts.get("conf") is not None
                      else np.full((len(xyz), 1), 0.5, np.float32))
        rw2c_l.append(rw2c)
    state = npc.create_point_cloud(
        np.concatenate(xyz_l), np.concatenate(emb_l), np.concatenate(col_l),
        np.concatenate(dir_l), np.concatenate(conf_l),
        Rw2c=np.concatenate(rw2c_l))
    return agg0, state


def main(opt: Options, names: Optional[List[str]] = None,
         inds_names: Optional[List[str]] = None,
         trans_names: Optional[List[str]] = None) -> Dict:
    import argparse
    if names is None:
        p = argparse.ArgumentParser()
        p.add_argument("--neural_points_names", nargs="+", required=True)
        p.add_argument("--parts_index_names", nargs="+", required=True)
        p.add_argument("--Transformation_names", nargs="+", required=True)
        p.add_argument("--render_name", type=str, default="edited")
        ns, _ = p.parse_known_args()
        names, inds_names = ns.neural_points_names, ns.parts_index_names
        trans_names = ns.Transformation_names

    visualizer = Visualizer(opt)
    parts = [load_part(opt.checkpoints_dir, n, i, t, opt)
             for n, i, t in zip(names, inds_names, trans_names)]
    agg_params, state = compose_parts(parts, opt)

    ts = trainer.create_train_state(opt, jax.random.PRNGKey(opt.seed), state)
    ts = ts._replace(agg_params=agg_params)
    spec, grid = make_spec_and_grid(opt, trainer.point_state_of(ts))
    visualizer.save_neural_points(
        "pnts", np.asarray(state["xyz"]),
        np.asarray(state["color"]) if state["color"] is not None else None,
        mask=np.asarray(state["mask"]))

    out: Dict = {"n_points": int(npc.num_active(state))}
    test_ds = create_dataset(opt, split="test")
    out["psnr"] = test(ts, grid, opt, spec, test_ds, visualizer, 0,
                       max_images=opt.test_num if opt.test_num > 0 else None)
    try:
        render_ds = create_dataset(opt, split="render")
        out.update(render_vid(ts, grid, opt, spec, render_ds, visualizer, 0))
    except Exception:
        pass
    # composite checkpoint (reference saves step 0, editing.py:232-237)
    ckpt_dir = os.path.join(opt.checkpoints_dir, opt.experiment)
    os.makedirs(ckpt_dir, exist_ok=True)
    export_reference_npz(os.path.join(ckpt_dir, "0_net_ray_marching.npz"),
                         agg_params, trainer.point_state_of(ts))
    return out


if __name__ == "__main__":
    main(options_from_cli())
