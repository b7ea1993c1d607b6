"""Loss computation (reference: models/base_rendering_model.py:533-662).

The reference selects masked rays with dynamic-shape masked_select; here every loss is a
masked mean over the static ray batch, numerically identical for nonzero mask counts.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def _masked_mse(pred, gt, mask):
    """mean over masked elements of (pred-gt)^2; 0 if mask empty."""
    m = mask.astype(pred.dtype)
    num = jnp.sum(jnp.square(pred - gt) * m[..., None])
    den = jnp.sum(m) * pred.shape[-1]
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)


def _pair(items, weights):
    """Reference weight broadcast: a single weight applies to every item
    (base_rendering_model.py:242-244). Any other length mismatch is a
    programming error — zip would silently drop loss terms (CLI paths are
    validated in config.validate_options, but opt.replace bypasses it)."""
    assert len(items) == 0 or len(weights) in (1, len(items)), \
        (tuple(items), tuple(weights))
    if len(weights) == 1 and len(items) > 1:
        weights = tuple(weights) * len(items)
    return zip(items, weights)


def compute_losses(opt, output: Dict, gt_image: jnp.ndarray,
                   gt_mask: jnp.ndarray = None, gt_depth: jnp.ndarray = None
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total training loss + per-item dict. gt_image: [B,R,3];
    gt_mask/gt_depth: [B,R] (required iff depth/bg loss items are set)."""
    total = 0.0
    items = {}
    ray_mask = output["ray_mask"]

    for name, w in _pair(opt.color_loss_items, opt.color_loss_weights):
        if name.startswith("ray_masked"):
            key = name[len("ray_masked") + 1:]
            loss = _masked_mse(output[key], gt_image, ray_mask)
        elif name.startswith("ray_miss"):
            key = name[len("ray_miss") + 1:]
            # reference scales the miss MSE by the miss count
            # (base_rendering_model.py:560) → sum of per-ray MSE
            miss = (~ray_mask).astype(gt_image.dtype)
            loss = jnp.sum(jnp.square(output[key] - gt_image) * miss[..., None]) \
                / gt_image.shape[-1]
        else:
            loss = jnp.mean(jnp.square(output[name] - gt_image))
        items["loss_" + name] = loss
        total = total + loss * w + 1e-6

    # depth supervision (reference :610-617): MSE of the masked rendered
    # depth vs the masked sensor depth, mean over ALL rays (the reference's
    # plain MSELoss — the mask zeroes both sides, it does not renormalize)
    for name, w in _pair(opt.depth_loss_items, opt.depth_loss_weights):
        m = gt_mask.astype(gt_depth.dtype)
        pred = output[name].reshape(m.shape)
        loss = jnp.mean(jnp.square(pred * m - gt_depth * m))
        items["loss_" + name] = loss
        total = total + loss * w

    # background supervision (reference :619-627): push the rendered
    # background transmission toward 1 outside the object mask
    for name, w in _pair(opt.bg_loss_items, opt.bg_loss_weights):
        inv = 1.0 - gt_mask.astype(gt_image.dtype)
        pred = output[name].reshape(inv.shape)
        loss = jnp.mean(jnp.square(pred * inv - inv))
        items["loss_" + name] = loss
        total = total + loss * w

    for name, w in _pair(opt.zero_one_loss_items, opt.zero_one_loss_weights):
        if name == "conf_coefficient" and "conf_compact" in output:
            # compact form: mean over the full B·R·SR·K element space, but
            # only the Nc·K compacted rows carry data — every element the
            # compaction left empty is exactly 0, whose clipped log term is
            # the constant log(eps)+log(1-eps). Algebraically identical to
            # the full-shape mean, without the scatter + 2.3M-element log.
            eps = opt.zero_epsilon
            const = jnp.log(eps) + jnp.log(1.0 - eps)
            c = output["conf_compact"]          # [(n,)1,Nc,1,K]
            cv = output["compact_valid"]        # [(n,)1,Nc,1,1]
            v = jnp.clip(c, eps, 1.0 - eps)
            term = jnp.where(cv, jnp.log(v) + jnp.log(1.0 - v), const)
            n_total = jnp.sum(output["zero_one_total"]).astype(term.dtype)
            loss = (jnp.sum(term) + (n_total - term.size) * const) / n_total
        elif name not in output or output[name] is None:
            continue
        else:
            val = jnp.clip(output[name], opt.zero_epsilon,
                           1.0 - opt.zero_epsilon)
            loss = jnp.mean(jnp.log(val) + jnp.log(1.0 - val))
        items["loss_" + name] = loss
        total = total + loss * w

    # l2 square regularization (reference :644-651): MSE of the named
    # output against zero
    for name, w in _pair(opt.l2_size_loss_items, opt.l2_size_loss_weights):
        loss = jnp.mean(jnp.square(output[name]))
        items["loss_" + name] = loss
        total = total + loss * w

    if opt.sparse_loss_weight > 0:
        if "weight_compact" in output:
            # exact on compacted rows: empty rows have weight 0 and cancel
            # from both numerator and denominator
            w_out = output["weight_compact"]
            conf = output["conf_compact"]
        else:
            w_out = output["weight"]
            conf = output["conf_coefficient"]
        loss = jnp.sum(w_out * jnp.abs(1.0 - jnp.exp(-2.0 * conf))) \
            / (jnp.sum(w_out) + 1e-6)
        items["loss_sparse"] = loss
        total = total + loss * opt.sparse_loss_weight

    items["loss_total"] = total
    return total, items


def mse2psnr(mse):
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
