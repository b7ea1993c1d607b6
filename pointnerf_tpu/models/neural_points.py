"""Neural point cloud state: padded buffers with masked prune/grow.

TPU-native re-design of the reference NeuralPoints module
(reference: models/neural_points/neural_points.py). The reference stores points as
dynamically-shaped nn.Parameters and rebuilds both Adam optimizers on every prune/grow
(reference: run/train_ft.py:836-840, 872-873; grow even exits the process so bash can
restart it, train_ft.py:878-911). Here the cloud lives in fixed-capacity buffers with an
active-slot mask:

* prune   = clear mask bits + park the slot out of grid range (no shape change),
* grow    = write new points into free slots (no shape change, optimizer state intact),
* capacity growth (rare) = host-side buffer re-allocation + new jit cache entry.

Padded slots sit at a sentinel position far outside every grid range so the voxel build
drops them; their conf is 0 so they can never contribute even if gathered.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.pe import positional_encoding

SENTINEL = 1.0e6  # parked position for inactive slots (outside any scene range)


def round_capacity(n: int, multiple: int = 4096) -> int:
    return int(max(multiple, -(-n // multiple) * multiple))


def create_point_cloud(xyz: np.ndarray,
                       embedding: np.ndarray,
                       color: Optional[np.ndarray] = None,
                       direction: Optional[np.ndarray] = None,
                       conf: Optional[np.ndarray] = None,
                       Rw2c: Optional[np.ndarray] = None,
                       capacity: Optional[int] = None) -> Dict[str, jnp.ndarray]:
    """Build the padded state dict from host arrays.

    Mirrors NeuralPoints.set_points (reference: neural_points.py:401-467) with
    point_*_mode "1" semantics (separate channels). Arrays: xyz [N,3],
    embedding [N,C], color/direction [N,3], conf [N,1].
    """
    n = xyz.shape[0]
    cap = capacity or round_capacity(n)
    assert cap >= n, (cap, n)

    def pad(a, fill=0.0):
        out = np.full((cap,) + a.shape[1:], fill, dtype=np.float32)
        out[:n] = a
        return jnp.asarray(out)

    state = {
        "xyz": pad(np.asarray(xyz, np.float32), SENTINEL),
        "embedding": pad(np.asarray(embedding, np.float32)),
        "mask": jnp.asarray(np.arange(cap) < n),
    }
    state["color"] = pad(np.asarray(color, np.float32)) if color is not None else None
    state["dir"] = pad(np.asarray(direction, np.float32)) if direction is not None else None
    state["conf"] = pad(np.asarray(conf, np.float32)) if conf is not None else None
    if Rw2c is None:
        state["Rw2c"] = jnp.asarray(np.eye(3, dtype=np.float32))
    else:
        Rw2c = np.asarray(Rw2c, np.float32)
        if Rw2c.ndim == 3:  # per-point (editing): pad with identity
            out = np.tile(np.eye(3, dtype=np.float32), (cap, 1, 1))
            out[:n] = Rw2c
            state["Rw2c"] = jnp.asarray(out)
        else:
            state["Rw2c"] = jnp.asarray(Rw2c)
    return state


def init_random_cloud(key, opt, num_point: int, ranges=None) -> Dict:
    """Random init path (reference: neural_points.py:289-313) for tests/scratch runs."""
    kp, ke = jax.random.split(key)
    if ranges is None:
        ranges = opt.ranges
    mn = np.asarray(ranges[:3], np.float32)
    mx = np.asarray(ranges[3:], np.float32)
    xyz = np.asarray(jax.random.uniform(kp, (num_point, 3))) * (mx - mn) + mn
    method = opt.feature_init_method
    shape = (num_point, opt.point_features_dim)
    if method == "rand":
        emb = np.asarray(jax.random.uniform(ke, shape)) - 0.5
    elif method == "zeros":
        emb = np.zeros(shape, np.float32)
    elif method == "ones":
        emb = np.ones(shape, np.float32)
    elif method.startswith("gau"):
        std = float(method.split("_")[1])
        emb = np.asarray(jax.random.normal(ke, shape)) * std
    elif method == "pos":
        f = int(opt.point_features_dim / 6)
        emb = np.asarray(positional_encoding(jnp.asarray(xyz), f)).reshape(num_point, -1)
        if emb.shape[-1] < opt.point_features_dim:
            extra = np.asarray(jax.random.uniform(
                ke, (num_point, opt.point_features_dim - emb.shape[-1]))) - 0.5
            emb = np.concatenate([emb, extra], axis=-1)
    else:
        raise ValueError(method)
    conf = np.ones((num_point, 1), np.float32)
    color = np.zeros((num_point, 3), np.float32)
    direction = np.zeros((num_point, 3), np.float32)
    return create_point_cloud(xyz, emb, color, direction, conf)


def num_active(state: Dict) -> jnp.ndarray:
    return jnp.sum(state["mask"].astype(jnp.int32))


def prune(state: Dict, thresh: float) -> Dict:
    """Deactivate low-confidence slots (reference: neural_points.py:347-370).

    Pure masked op — shapes unchanged, jit-safe, optimizer state preserved.
    """
    keep = state["mask"] & (state["conf"][:, 0] >= thresh)
    new = dict(state)
    new["mask"] = keep
    new["xyz"] = jnp.where(keep[:, None], state["xyz"], SENTINEL)
    return new


def grow(state: Dict, add_xyz, add_embedding, add_color, add_dir, add_conf,
         add_mask) -> Tuple[Dict, jnp.ndarray]:
    """Write new points into free slots (reference: neural_points.py:373-399).

    add_* are fixed-size candidate buffers [M, ...] with add_mask [M] marking real
    candidates. Candidates beyond free capacity are dropped (returned in n_dropped).
    """
    cap = state["xyz"].shape[0]
    M = add_xyz.shape[0]
    free = ~state["mask"]
    # rank candidates into free-slot order
    free_idx = jnp.cumsum(free.astype(jnp.int32)) - 1          # rank of each free slot
    # target slot for k-th candidate = index of k-th free slot
    slot_of_rank = jnp.full((cap,), cap, dtype=jnp.int32)
    slot_of_rank = slot_of_rank.at[jnp.where(free, free_idx, cap)].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop")
    cand_rank = jnp.cumsum(add_mask.astype(jnp.int32)) - 1
    n_free = jnp.sum(free.astype(jnp.int32))
    ok = add_mask & (cand_rank < n_free) & (cand_rank < cap)
    target = jnp.where(ok, slot_of_rank[jnp.clip(cand_rank, 0, cap - 1)], cap)

    new = dict(state)

    def scat(buf, add, fill_active=None):
        if buf is None:
            return None
        return buf.at[target].set(
            jnp.where(ok[:, None], add.astype(buf.dtype),
                      buf[jnp.clip(target, 0, cap - 1)]), mode="drop")

    new["xyz"] = scat(state["xyz"], add_xyz)
    new["embedding"] = scat(state["embedding"], add_embedding)
    new["color"] = scat(state["color"], add_color) if state["color"] is not None else None
    new["dir"] = scat(state["dir"], add_dir) if state["dir"] is not None else None
    new["conf"] = scat(state["conf"], add_conf) if state["conf"] is not None else None
    new["mask"] = state["mask"].at[target].set(
        ok | state["mask"][jnp.clip(target, 0, cap - 1)], mode="drop")
    n_dropped = jnp.sum(add_mask.astype(jnp.int32)) - jnp.sum(ok.astype(jnp.int32))
    return new, n_dropped


def gather_neighbors(state: Dict, sample_pidx: jnp.ndarray,
                     camrotc2w: jnp.ndarray, campos: jnp.ndarray):
    """Gather per-neighbor attributes for the aggregator.

    Reference: NeuralPoints.forward (neural_points.py:699-730) — index_select on the
    concatenated [xyz, xyz_pers, embedding] plus color/dir/conf. We compute xyz_pers
    only for the gathered points instead of the whole cloud (the reference transforms
    all N points every step, neural_points.py:557).
    sample_pidx: [B,R,SR,K] int32 (-1 = missing).
    """
    B = sample_pidx.shape[0]
    shape = sample_pidx.shape
    if campos.shape[0] != B:
        # comp_groups: the compacted leading dim is B·G (G ray groups per
        # camera) — tile the per-camera poses over the group axis
        rep = B // campos.shape[0]
        campos = jnp.repeat(campos, rep, axis=0)
        camrotc2w = jnp.repeat(camrotc2w, rep, axis=0)
    safe = jnp.maximum(sample_pidx, 0).reshape(-1)  # flat 1-D: fast gather path
    pnt_mask = sample_pidx >= 0

    # pack all per-point attributes into ONE [N, C] row table and gather once:
    # five separate gathers (and five backward scatter-adds) cost ~5x one —
    # gather time is row-count-bound, not byte-bound, on TPU. Gradients flow
    # through the concat back to each trainable buffer.
    parts = [("xyz", 3), ("embedding", state["embedding"].shape[1])]
    for k in ("color", "dir", "conf"):
        if state[k] is not None:
            parts.append((k, state[k].shape[1]))
    packed = jnp.concatenate([state[k] for k, _ in parts], axis=1)
    rows = packed[safe].reshape(shape + (packed.shape[1],))
    split, off = {}, 0
    for k, w in parts:
        split[k] = rows[..., off:off + w]
        off += w

    xyz = split["xyz"]                             # [B,R,SR,K,3]
    shift = xyz - campos.reshape(B, 1, 1, 1, 3)
    rot_t = jnp.swapaxes(camrotc2w, -1, -2).reshape(B, 1, 1, 1, 3, 3)
    xyz_c = jnp.sum(shift[..., None, :] * rot_t, axis=-1)
    xyz_pers = jnp.stack([xyz_c[..., 0] / xyz_c[..., 2],
                          xyz_c[..., 1] / xyz_c[..., 2],
                          xyz_c[..., 2]], axis=-1)

    rw2c = state["Rw2c"]
    if rw2c.ndim == 3:  # per-point (scene editing): gather [B,R,SR,K,3,3]
        rw2c = rw2c.reshape(-1, 9)[safe].reshape(shape + (3, 3))

    out = {
        "sampled_xyz": xyz,
        "sampled_xyz_pers": xyz_pers,
        "sampled_embedding": split["embedding"],
        "sampled_color": split.get("color"),
        "sampled_dir": split.get("dir"),
        "sampled_conf": split.get("conf"),
        "sample_pnt_mask": pnt_mask,
        "Rw2c": rw2c,
    }
    return out
