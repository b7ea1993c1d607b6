"""Per-scene optimization loop building blocks.

Replaces the reference's BaseModel/optimizer plumbing
(reference: models/base_model.py, models/mvs_points_volumetric_model.py:47-118,
models/neural_points_volumetric_model.py:176-211):

* two Adam chains — shading networks at `lr`, neural-point attributes at `plr`
  (reference: mvs_points_volumetric_model.py:81-91),
* `iter_exponential_decay` schedule applied per-iteration
  (reference: networks.py:56-61),
* `alter_step` alternation between the two optimizers
  (reference: mvs_points_volumetric_model.py:114-118),
* everything inside ONE jitted step: forward, loss, backward, both updates. Prune/grow
  never rebuild optimizer state (padded-buffer design, see models/neural_points.py).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.aggregator import init_aggregator_params
from ..models.losses import compute_losses
from ..models.networks import make_lr_schedule
from ..models.renderer import render_forward
from ..ops.grid import GridSpec, build_grid


COMPUTE_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}

POINT_TRAINABLE_FLAGS = {
    "embedding": "feat_grad",
    "conf": "conf_grad",
    "dir": "dir_grad",
    "color": "color_grad",
    "xyz": "xyz_grad",
}


def split_point_params(point_state: Dict, opt) -> Tuple[Dict, Dict]:
    """Split point state into (trainable, static) by the *_grad flags
    (reference: neural_points.py:133-229, 269-321)."""
    trainable, static = {}, {}
    for k, v in point_state.items():
        flag = POINT_TRAINABLE_FLAGS.get(k)
        if flag is not None and v is not None and getattr(opt, flag) > 0:
            trainable[k] = v
        else:
            static[k] = v
    return trainable, static


def merge_point_params(trainable: Dict, static: Dict) -> Dict:
    out = dict(static)
    out.update(trainable)
    return out


class TrainState(NamedTuple):
    agg_params: Dict
    pt_train: Dict            # trainable point buffers
    pt_static: Dict           # non-trainable point buffers (incl. mask, Rw2c)
    opt_state_net: optax.OptState
    opt_state_pts: optax.OptState
    step: jnp.ndarray


def packed_rows_transform(inner: "optax.GradientTransformation"
                          ) -> "optax.GradientTransformation":
    """Run `inner` over ONE [cap, ΣC] array packed from all [cap, Ci] leaves.

    The trainable point buffers are lane-narrow ([cap,3]/[cap,1] f32): the
    TPU's (8,128) tiling makes every elementwise optimizer pass move 128
    lanes per row regardless of Ci, so the per-leaf Adam epilogue pays up to
    42x its useful traffic (profiled ~2 ms/step at bench shapes). Packing
    the buffers column-wise into one [cap,42] array for the moment math is
    ELEMENTWISE-IDENTICAL — Adam has no cross-element coupling — and cuts
    the lane waste to 42/128. Leaves are packed in sorted-key order; the
    optimizer state stores the packed moments (a {iter}_full.npz written
    with the other layout is converted at resume by
    utils/checkpoint.py::load_pytree_npz, same sorted-key column order).
    """

    def _pack(tree):
        keys = sorted(tree.keys())
        return jnp.concatenate([tree[k] for k in keys], axis=1), keys

    def _unpack(arr, template):
        keys = sorted(template.keys())
        out, off = {}, 0
        for k in keys:
            w = template[k].shape[1]
            out[k] = arr[:, off:off + w]
            off += w
        return out

    def init_fn(params):
        packed, _ = _pack(params)
        return inner.init(packed)

    def update_fn(updates, state, params=None):
        g, _ = _pack(updates)
        p = _pack(params)[0] if params is not None else None
        u, new_state = inner.update(g, state, p)
        return _unpack(u, updates), new_state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizers(opt):
    net_tx = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999),
        optax.scale_by_schedule(lambda s: -1.0 * make_lr_schedule(opt, opt.lr)(s)),
    )
    pts_tx = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999),
        optax.scale_by_schedule(lambda s: -1.0 * make_lr_schedule(opt, opt.plr)(s)),
    )
    if int(getattr(opt, "packed_point_adam", 0)) > 0:
        pts_tx = packed_rows_transform(pts_tx)
    return net_tx, pts_tx


def create_train_state(opt, key, point_state: Dict, start_step: int = 0) -> TrainState:
    agg_params = init_aggregator_params(key, opt)
    pt_train, pt_static = split_point_params(point_state, opt)
    net_tx, pts_tx = make_optimizers(opt)
    return TrainState(
        agg_params=agg_params,
        pt_train=pt_train,
        pt_static=pt_static,
        opt_state_net=net_tx.init(agg_params),
        opt_state_pts=pts_tx.init(pt_train),
        step=jnp.asarray(start_step, jnp.int32),
    )


def point_state_of(state: TrainState) -> Dict:
    return merge_point_params(state.pt_train, state.pt_static)


def compute_grads_impl(state: TrainState, grid: Dict, batch: Dict, key: jax.Array,
                       opt, spec: GridSpec):
    """Loss items + gradients for both parameter groups (forward+backward only).

    With opt.remat the render is rematerialized in the backward pass: the
    per-neighbor MLP activations over B·R·SR·K rows (≈GBs at production ray
    counts) are recomputed instead of stored — the standard TPU trade of
    FLOPs for HBM.
    """

    from ..models.renderer import render_query, render_shade

    R = batch["raydir"].shape[1]
    C = int(opt.ray_chunk)
    chunked = C > 0 and R > C and R % C == 0
    RAY_KEYS = ("raydir", "gt_image", "pixel_idx", "bg_ray",
                "gt_mask", "gt_depth")

    def run_render(agg_params, pt_train, sub_batch, sub_key):
        point_state = merge_point_params(pt_train, state.pt_static)
        # the query (ray samples → voxel walk → KNN indices) carries no
        # gradients: keep it OUTSIDE the rematerialized region
        q = render_query(point_state, grid, spec, opt, sub_batch, sub_key,
                         is_train=True)

        def shade(agg_params, pt_train):
            ps = merge_point_params(pt_train, state.pt_static)
            return render_shade(agg_params, ps, spec, opt, sub_batch, q,
                                compute_dtype=COMPUTE_DTYPES[opt.compute_dtype])
        if opt.remat > 0:
            shade = jax.checkpoint(shade)
        return shade(agg_params, pt_train)

    def loss_fn(agg_params, pt_train):
        if chunked:
            # map the render over fixed-size ray chunks inside ONE program:
            # bounds peak activation memory at large R. (Round-1's XLA:TPU
            # regalloc failure at top_k shapes ≥ ~[1,14400,400] no longer
            # reproduces — both the chunked and unchunked programs compile
            # and run at R=14400 on the current toolchain; the path is also
            # gradient-equivalence-tested on CPU.)
            n = R // C
            chunks = {k: v.reshape((n, 1, C) + v.shape[2:])
                      for k, v in batch.items()
                      if k in RAY_KEYS and hasattr(v, "ndim")}
            chunks["_idx"] = jnp.arange(n, dtype=jnp.uint32)

            def body(ch):
                idx = ch.pop("_idx")
                sub = dict(batch, **ch)
                out = run_render(agg_params, pt_train, sub,
                                 jax.random.fold_in(key, idx))
                keys = ["coarse_raycolor", "ray_mask", "sr_overflow"]
                if "occ_overflow" in out:
                    keys.append("occ_overflow")
                if opt.depth_loss_items:
                    keys.append("coarse_depth")
                if opt.bg_loss_items:
                    keys.append("coarse_is_background")
                if opt.l2_size_loss_items:
                    keys += list(opt.l2_size_loss_items)
                if "conf_compact" in out:    # compact-form loss inputs
                    keys += ["conf_compact", "weight_compact",
                             "compact_valid", "zero_one_total"]
                else:
                    keys += ["conf_coefficient", "weight"]
                return {k: out[k] for k in keys}
            outs = jax.lax.map(body, chunks)
            overflow = jnp.sum(outs.pop("sr_overflow"))
            occ_over = (jnp.sum(outs.pop("occ_overflow"))
                        if "occ_overflow" in outs else None)
            # ray-shaped leaves merge back to [1, R, ...]; compact-form
            # leaves keep their stacked chunk axis — compute_losses sums
            # them and divides by sum(zero_one_total), which is exact
            ray_shaped = ("coarse_raycolor", "ray_mask", "conf_coefficient",
                          "weight", "coarse_depth", "coarse_is_background")
            output = {k: (v.swapaxes(0, 1).reshape((1, R) + v.shape[3:])
                          if k in ray_shaped else v)
                      for k, v in outs.items()}
            output["sr_overflow"] = overflow
            if occ_over is not None:
                output["occ_overflow"] = occ_over
        else:
            output = run_render(agg_params, pt_train, batch, key)
        total, items = compute_losses(opt, output, batch["gt_image"],
                                      gt_mask=batch.get("gt_mask"),
                                      gt_depth=batch.get("gt_depth"))
        # compaction-budget overflow (valid rows rendered empty): drivers log
        # it and can raise opt.SR_budget when it is persistently nonzero
        items["sr_overflow"] = output["sr_overflow"].astype(jnp.float32)
        if "occ_overflow" in output:
            # occ_segments row-cache overflow (conservative-valid, no drops)
            items["occ_overflow"] = output["occ_overflow"].astype(jnp.float32)
        return total, items

    (_, items), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
        state.agg_params, state.pt_train)
    return items, grads[0], grads[1]


compute_grads = jax.jit(compute_grads_impl, static_argnames=("opt", "spec"))


def train_step_impl(state: TrainState, grid: Dict, batch: Dict, key: jax.Array,
                    opt, spec: GridSpec) -> Tuple[TrainState, Dict]:
    """One optimization step (reference train hot loop, SURVEY.md §3.2).

    Pure (unjitted) so the parallel module can re-jit it with explicit shardings;
    use `train_step` for the single-chip jitted entry point.

    `key` may be a CONSTANT training key: per-step randomness derives from
    fold_in(key, step) inside the jit, so the driver loop issues exactly one
    device dispatch per step (host-side jax.random.split between steps costs
    a full dispatch round-trip — measured ~10ms through the axon tunnel vs
    ~3ms for the whole step).
    """
    net_tx, pts_tx = make_optimizers(opt)
    key = jax.random.fold_in(key, state.step)
    items, g_net, g_pts = compute_grads_impl(state, grid, batch, key, opt, spec)

    if opt.alter_step > 0:
        phase = (state.step // opt.alter_step) % 2
        net_on = (phase == 0).astype(jnp.float32)
        pts_on = (phase == 1).astype(jnp.float32)
        g_net = jax.tree.map(lambda g: g * net_on, g_net)
        g_pts = jax.tree.map(lambda g: g * pts_on, g_pts)

    upd_net, new_net_state = net_tx.update(g_net, state.opt_state_net,
                                           state.agg_params)
    upd_pts, new_pts_state = pts_tx.update(g_pts, state.opt_state_pts,
                                           state.pt_train)
    new_state = TrainState(
        agg_params=optax.apply_updates(state.agg_params, upd_net),
        pt_train=optax.apply_updates(state.pt_train, upd_pts),
        pt_static=state.pt_static,
        opt_state_net=new_net_state,
        opt_state_pts=new_pts_state,
        step=state.step + 1,
    )
    return new_state, items


train_step = jax.jit(train_step_impl, static_argnames=("opt", "spec"))


def train_steps_scan_impl(state: TrainState, grid: Dict, batches: Dict,
                          key: jax.Array, opt, spec: GridSpec
                          ) -> Tuple[TrainState, Dict]:
    """S optimization steps in ONE dispatch via lax.scan.

    batches: pytree whose ray-dependent leaves are stacked [S, ...] (campos,
    near/far etc. may also be stacked). Loss items are returned per step
    [S]. Amortizes per-dispatch latency — the dominant cost of small steps
    on a remote-tunneled chip — without changing numerics (same fold_in(key,
    step) randomness as S calls to train_step).
    """
    def body(st, batch):
        return train_step_impl(st, grid, batch, key, opt=opt, spec=spec)

    return jax.lax.scan(body, state, batches)


train_steps_scan = jax.jit(train_steps_scan_impl,
                           static_argnames=("opt", "spec"))


def eval_step_impl(state: TrainState, grid: Dict, batch: Dict, opt, spec: GridSpec,
                   prob: bool = False) -> Dict:
    """No-grad forward for test/render (reference: base_model.test, run/train_ft.py:283-322)."""
    point_state = point_state_of(state)
    return render_forward(state.agg_params, point_state, grid, spec, opt, batch,
                          key=None, is_train=False, prob=prob,
                          compute_dtype=COMPUTE_DTYPES[opt.compute_dtype])


eval_step = jax.jit(eval_step_impl, static_argnames=("opt", "spec", "prob"))


def eval_chunks_impl(state: TrainState, grid: Dict, stacked: Dict,
                     const_batch: Dict, opt, spec: GridSpec,
                     prob: bool = False) -> Dict:
    """Render several ray chunks of one camera in ONE dispatch via lax.map.

    stacked: ray-dependent leaves with a leading chunk axis [n, 1, C, ...];
    const_batch: per-camera leaves shared by every chunk (campos, rotation,
    near/far, bg_color). Through a remote-tunneled chip each dispatch costs
    ~10 ms of latency — a full-image render is hundreds of chunks (reference
    loops them one CUDA launch at a time, run/train_ft.py:283-322)."""
    def body(ch):
        return eval_step_impl(state, grid, dict(const_batch, **ch), opt, spec,
                              prob=prob)
    return jax.lax.map(body, stacked)


eval_chunks = jax.jit(eval_chunks_impl, static_argnames=("opt", "spec", "prob"))


_COMPACT_ONLY_KEYS = ("conf_compact", "weight_compact", "compact_valid",
                      "zero_one_total")


def eval_chunks_stacked_impl(state: TrainState, grid: Dict, stacked: Dict,
                             const_batch: Dict, opt, spec: GridSpec,
                             prob: bool = False) -> Dict:
    """Render several ray chunks of one camera as ONE wide eval_step.

    Same contract as eval_chunks_impl ([n, 1, C, ...] in, [n, 1, C, ...]
    out), but the n chunks concatenate on the ray axis into a single
    [1, n*C]-ray program instead of n serial lax.map bodies: rays are
    independent, so one 8x-wider program is semantically the per-chunk
    render while amortizing the fixed per-op costs (gather setup, small
    reductions, MLP matmul tiling) that every small body pays again.
    Compaction pools its budget across the group: auto budgets (-1) scale
    with the row space by construction (renderer.effective_sr_budget);
    callers scale explicit ladder budgets by n (run.common.render_image).

    Only per-ray outputs are returned; the training-only compact-loss
    leaves are [B, Ncb, ...]-shaped and meaningless split per chunk.
    `sr_overflow` (a group-total scalar) comes back as [n] with the total
    at slot 0, so callers summing per-chunk overflows stay exact.
    """
    n, _, C = next(iter(stacked.values())).shape[:3]
    wide = {k: v.reshape((1, n * C) + v.shape[3:]) for k, v in stacked.items()}
    out = eval_step_impl(state, grid, dict(const_batch, **wide), opt, spec,
                         prob=prob)
    split: Dict = {}
    for k, v in out.items():
        if k in _COMPACT_ONLY_KEYS or v is None or not hasattr(v, "ndim"):
            continue
        if v.ndim >= 2 and v.shape[:2] == (1, n * C):
            split[k] = v.reshape((n, 1, C) + v.shape[2:])
        elif v.ndim == 0:
            split[k] = jnp.zeros((n,), v.dtype).at[0].set(v)
    return split


eval_chunks_stacked = jax.jit(eval_chunks_stacked_impl,
                              static_argnames=("opt", "spec", "prob"))


@functools.partial(jax.jit, static_argnames=("spec",))
def rebuild_grid(state: TrainState, spec: GridSpec) -> Dict:
    point_state = point_state_of(state)
    return build_grid(point_state["xyz"], point_state["mask"], spec)


def expand_capacity(state: TrainState, new_cap: int) -> TrainState:
    """Grow the padded point buffers (host-side, rare).

    The reference rebuilds optimizers wholesale on every grow (train_ft.py:872)
    and even restarts the process; here only genuine capacity exhaustion
    reallocates, and the per-slot Adam moments carry over (fresh slots get
    zero moments — exactly what Adam.init would give them).
    """
    from ..models.neural_points import SENTINEL

    def pad_buf(buf, fill):
        if buf is None or buf.ndim == 0 or buf.shape[0] >= new_cap:
            return buf
        pad_shape = (new_cap - buf.shape[0],) + buf.shape[1:]
        return jnp.concatenate(
            [buf, jnp.full(pad_shape, fill, dtype=buf.dtype)], axis=0)

    old_cap = state.pt_static["mask"].shape[0] if "mask" in state.pt_static else \
        next(iter(state.pt_train.values())).shape[0]
    if new_cap <= old_cap:
        return state

    def pad_points(d):
        out = {}
        for k, v in d.items():
            if v is None or not hasattr(v, "ndim") or v.ndim == 0 or \
                    v.shape[:1] != (old_cap,):
                out[k] = v
            else:
                out[k] = pad_buf(v, SENTINEL if k == "xyz" else
                                 (False if k == "mask" else 0.0))
        return out

    def pad_opt(tree):
        return jax.tree.map(
            lambda leaf: pad_buf(leaf, 0.0)
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == old_cap
            else leaf, tree)

    return TrainState(
        agg_params=state.agg_params,
        pt_train=pad_points(state.pt_train),
        pt_static=pad_points(state.pt_static),
        opt_state_net=state.opt_state_net,
        opt_state_pts=pad_opt(state.opt_state_pts),
        step=state.step,
    )
