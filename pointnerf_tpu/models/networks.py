"""Parameter init, MLP apply, LR schedules.

Reference: models/helpers/networks.py. Networks are plain pytrees of arrays applied by
pure functions — no module framework — so the whole model state threads cleanly through
jit/shard_map and optax.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------- MLPs
def _gain(act: str) -> float:
    """torch.nn.init.calculate_gain equivalents used by the reference init_seq."""
    if act == "ReLU":
        return math.sqrt(2.0)
    if act == "LeakyReLU":
        neg = 0.1  # reference uses LeakyReLU(0.1) (networks.py:16)
        return math.sqrt(2.0 / (1 + neg ** 2))
    return 1.0


def init_linear(key, n_in: int, n_out: int, gain: float = 1.0):
    """Xavier-uniform like the reference (networks.py:109-122)."""
    std = gain * math.sqrt(2.0 / (n_in + n_out))
    bound = std * math.sqrt(3.0)
    w = jax.random.uniform(key, (n_in, n_out), minval=-bound, maxval=bound,
                           dtype=jnp.float32)
    return {"w": w, "b": jnp.zeros((n_out,), dtype=jnp.float32)}


def init_mlp(key, dims: Sequence[int], act: str, final_act: bool = True) -> List[Dict]:
    """Stack of linear layers. Hidden layers get the activation gain; the reference
    init_seq (networks.py:163-172) gives the *last* layer gain 1 when it has no
    following activation."""
    layers = []
    keys = jax.random.split(key, len(dims) - 1)
    for i in range(len(dims) - 1):
        has_act = final_act or i < len(dims) - 2
        g = _gain(act) if has_act else 1.0
        layers.append(init_linear(keys[i], dims[i], dims[i + 1], g))
    return layers


def activation(name: str):
    if name == "ReLU":
        return jax.nn.relu
    if name == "LeakyReLU":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.1)
    if name == "SELU":
        return jax.nn.selu
    raise ValueError(f"unsupported act_type {name}")


def apply_mlp(layers: List[Dict], x: jnp.ndarray, act, final_act: bool = True,
              compute_dtype=jnp.float32) -> jnp.ndarray:
    """Apply the linear stack. Matmuls run in compute_dtype (bf16-ready), accumulate f32."""
    for i, layer in enumerate(layers):
        w = layer["w"].astype(compute_dtype)
        x = jnp.dot(x.astype(compute_dtype), w,
                    preferred_element_type=jnp.float32) + layer["b"]
        if final_act or i < len(layers) - 1:
            x = act(x)
    return x


def apply_mlp_pieces(layers: List[Dict], pieces: Sequence[jnp.ndarray], act,
                     final_act: bool = True,
                     compute_dtype=jnp.float32) -> jnp.ndarray:
    """apply_mlp(concat(pieces)) without the concatenate.

    concat(x1..xn) @ W == sum_i xi @ W[rows_i] — the first layer runs as one
    matmul per piece. On TPU this avoids materializing the concatenated
    feature matrix AND the tile-padded layout copies of narrow pieces that a
    physical concatenate forces (each [rows, <128] slice pads its lane dim).
    """
    first = layers[0]
    w = first["w"].astype(compute_dtype)
    off = 0
    x = None
    for p in pieces:
        k = p.shape[-1]
        term = jnp.dot(p.astype(compute_dtype), w[off:off + k],
                       preferred_element_type=jnp.float32)
        x = term if x is None else x + term
        off += k
    assert off == w.shape[0], (off, w.shape)
    x = x + first["b"]
    if final_act or len(layers) > 1:
        x = act(x)
    return apply_mlp(layers[1:], x, act, final_act=final_act,
                     compute_dtype=compute_dtype) if len(layers) > 1 else x


# --------------------------------------------------------------------------- schedules
def make_lr_schedule(opt, base_lr: float):
    """LR schedule factory (reference: networks.py:41-68)."""
    if opt.lr_policy == "iter_exponential_decay":
        def sched(step):
            return base_lr * jnp.power(opt.lr_decay_exp, step / opt.lr_decay_iters)
        return sched
    if opt.lr_policy == "lambda":
        def sched(step):
            frac = 1.0 - jnp.maximum(0.0, step - opt.niter) / float(opt.niter_decay + 1)
            return base_lr * frac
        return sched
    if opt.lr_policy == "step":
        def sched(step):
            return base_lr * jnp.power(0.1, step // opt.lr_decay_iters)
        return sched
    if opt.lr_policy == "plateau":
        # torch ReduceLROnPlateau mutates the optimizer's lr when the
        # tracked metric plateaus (reference helpers/networks.py:50-55);
        # here the schedule itself is constant and the DRIVER owns the
        # reduction: PlateauTracker.update() → opt.replace(lr=lr*factor)
        # (Adam moments are lr-invariant, so swapping the static lr only
        # recompiles the step — a few seconds, a handful of times per run)
        def sched(step):
            return jnp.asarray(base_lr, jnp.float32) + 0.0 * step
        return sched
    raise NotImplementedError(f"lr policy {opt.lr_policy}")


class PlateauTracker:
    """Host-side ReduceLROnPlateau decision logic (rel threshold),
    semantics-parity with torch.optim.lr_scheduler.ReduceLROnPlateau as the
    reference configures it (factor=0.2, threshold=0.01, patience=5;
    reference helpers/networks.py:50-55). update(metric) returns True when
    the lr should be multiplied by the factor now.

    mode="min" tracks a loss (improve iff metric < best*(1-threshold));
    mode="max" tracks a quality score like PSNR (improve iff
    metric > best*(1+threshold)). Do NOT feed a negated score into min
    mode: for negative metrics best*(1-threshold) > best, so every value
    counts as an improvement and the policy silently never fires — the
    same quirk torch has (its rel-threshold math assumes positive metrics).
    """

    def __init__(self, factor: float = 0.2, threshold: float = 0.01,
                 patience: int = 5, mode: str = "min"):
        assert mode in ("min", "max"), mode
        self.factor = factor
        self.threshold = threshold
        self.patience = patience
        self.mode = mode
        self.best = float("inf") if mode == "min" else float("-inf")
        self.num_bad = 0

    def _is_better(self, metric: float) -> bool:
        if self.mode == "min":
            return metric < self.best * (1.0 - self.threshold)
        # torch mode="max", threshold_mode="rel": a > best * (1 + threshold)
        return metric > self.best * (1.0 + self.threshold)

    def update(self, metric: float) -> bool:
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
            return False
        self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            return True
        return False

    def state_dict(self) -> dict:
        return {"plateau_best": self.best, "plateau_num_bad": self.num_bad}

    def load_state_dict(self, d: dict) -> None:
        if "plateau_best" in d:
            self.best = float(d["plateau_best"])
        if "plateau_num_bad" in d:
            self.num_bad = int(d["plateau_num_bad"])
