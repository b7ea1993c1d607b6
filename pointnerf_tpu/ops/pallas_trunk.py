"""Pallas TPU kernel: fused per-neighbor shading trunk (forward + custom VJP).

The aggregator's hot loop runs, per (shading point, neighbor) row:

    x1 = [emb, PE(emb), PE(dists)]          (PE = sin(x @ S + phase))
    h  = block1(x1)                          (1-2 leaky-relu Linear layers)
    g  = block3([h, extra])                  (1-2 leaky-relu Linear layers)
    a  = alpha_branch(g)                     (1 Linear layer, no activation)

at S = Nc·K ≈ 400k rows per step (reference viewmlp, point_aggregators.py:
488-644). Composed in XLA this materializes every intermediate ([S,284] PE
input, two [S,256] hiddens per block) in HBM on the forward AND the backward
pass — ~6 tensors × ~400 MB of traffic per direction at bench shapes, which
is where the profiled "flat tail of ≤2.5 ms fusions" lives. This kernel keeps
the whole chain in VMEM per row-tile: HBM traffic collapses to the [S,45]
inputs, the [S,256]+[S,1] outputs, and their gradients; the backward kernel
REcomputes the forward per tile (VMEM-speed remat) so no activations are
ever stored.

Weight layout note: all weight matrices live fully in VMEM (~1.3 MB for the
lego config) and their gradients accumulate across the sequential TPU grid
steps into VMEM-resident outputs.

Used by models/aggregator.py when the config matches (fused_trunk_ok);
parity-tested against the XLA composition in tests/test_pallas_trunk.py.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pe import _pe_selection_np

NEG_SLOPE = 0.1  # LeakyReLU (models/networks.py::activation)


def _leaky(x):
    return jnp.where(x >= 0, x, NEG_SLOPE * x)


def _dleaky(z):
    return jnp.where(z >= 0, 1.0, NEG_SLOPE)


# --------------------------------------------------------------- param pack
def pack_trunk_params(agg_params: Dict, F_emb: int, dd: int,
                      n_feat_freqs: int, n_dist_freqs: int,
                      with_alpha: bool = True) -> List:
    """Flatten block1/block3[/alpha_branch] into the kernel's operand list.

    block1 first-layer rows split by piece: [emb | PE(emb) | PE(dists)]
    (same order aggregator_forward builds `pieces`). with_alpha=False
    (agg_intrp_order==1): the alpha head runs on the AGGREGATED features
    outside the kernel, so its weights stay out of the operand list.
    """
    b1 = agg_params["block1"]
    b3 = agg_params["block3"]
    al = agg_params["alpha_branch"]
    pe_e = 2 * n_feat_freqs * F_emb
    pe_d = 2 * n_dist_freqs * dd
    w1 = b1[0]["w"]
    assert w1.shape[0] == F_emb + pe_e + pe_d, (w1.shape, F_emb, pe_e, pe_d)
    b2d = lambda b: b.reshape(1, -1)     # biases as [1,C]: 2-D VMEM refs
    ops = [w1[:F_emb], w1[F_emb:F_emb + pe_e], w1[F_emb + pe_e:],
           b2d(b1[0]["b"])]
    for layer in b1[1:]:
        ops += [layer["w"], b2d(layer["b"])]
    w3 = b3[0]["w"]
    H = b1[-1]["w"].shape[1]
    ops += [w3[:H], w3[H:], b2d(b3[0]["b"])]
    for layer in b3[1:]:
        ops += [layer["w"], b2d(layer["b"])]
    if with_alpha:
        ops += [al[0]["w"], b2d(al[0]["b"])]
    return ops


def _n_ops(L1: int, L3: int, with_alpha: bool) -> int:
    return 4 + 2 * (L1 - 1) + 3 + 2 * (L3 - 1) + (2 if with_alpha else 0)


def _unpack(ops, L1: int, L3: int, with_alpha: bool = True):
    """ops -> (w1e, w1p, w1d, b1, extra1[(w,b)...], w3x, w3e, b3,
    extra3[(w,b)...], wa, ba); wa/ba None without the alpha head."""
    i = 0
    w1e, w1p, w1d, b1 = ops[i:i + 4]; i += 4
    extra1 = []
    for _ in range(L1 - 1):
        extra1.append((ops[i], ops[i + 1])); i += 2
    w3x, w3e, b3 = ops[i:i + 3]; i += 3
    extra3 = []
    for _ in range(L3 - 1):
        extra3.append((ops[i], ops[i + 1])); i += 2
    wa = ba = None
    if with_alpha:
        wa, ba = ops[i:i + 2]; i += 2
    assert i == len(ops)
    return w1e, w1p, w1d, b1, extra1, w3x, w3e, b3, extra3, wa, ba


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_bf16(a, b):
    """MXU dot with bf16 operands, f32 accumulate (mixed precision: the MXU
    runs bf16 at ~2x its f32 pass rate; accumulation stays f32 so the chain
    keeps f32 dynamic range — the standard bf16-matmul recipe)."""
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _fwd_tile(emb, d, ex3, ops, Se, pe, Sd, pd, L1, L3, dot=_dot,
              with_alpha=True):
    """Forward chain on one VMEM tile; returns intermediates for the bwd.

    The PE projections (t_e/t_d) always run f32: their outputs feed sin/cos
    where bf16's ~3-digit mantissa would alias high frequencies."""
    w1e, w1p, w1d, b1, extra1, w3x, w3e, b3, extra3, wa, ba = _unpack(
        ops, L1, L3, with_alpha)
    t_e = _dot(emb, Se) + pe
    t_d = _dot(d, Sd) + pd
    pe_e = jnp.sin(t_e)
    pe_d = jnp.sin(t_d)
    z1 = dot(emb, w1e) + dot(pe_e, w1p) + dot(pe_d, w1d) + b1
    hs = [_leaky(z1)]
    zs1 = [z1]
    for (w, b) in extra1:
        z = dot(hs[-1], w) + b
        zs1.append(z)
        hs.append(_leaky(z))
    h = hs[-1]
    z3 = dot(h, w3x) + dot(ex3, w3e) + b3
    gs = [_leaky(z3)]
    zs3 = [z3]
    for (w, b) in extra3:
        z = dot(gs[-1], w) + b
        zs3.append(z)
        gs.append(_leaky(z))
    g = gs[-1]
    za = (dot(g, wa) + ba) if with_alpha else None
    return t_e, t_d, pe_e, pe_d, zs1, hs, zs3, gs, g, za


def _alpha_act(za, act_super):
    """raw2out_density (models/aggregator.py:120-124): softplus(x-1) mip-nerf
    stabilization, or plain relu."""
    return jax.nn.softplus(za - 1.0) if act_super else jax.nn.relu(za)


def _dalpha_act(za, act_super):
    return jax.nn.sigmoid(za - 1.0) if act_super else \
        jnp.where(za >= 0, 1.0, 0.0)


def _group_sum(x, K):
    T, C = x.shape
    return jnp.sum(x.reshape(T // K, K, C), axis=1)


def _fwd_kernel(L1, L3, K, act_super, bf16, order1,
                emb_ref, d_ref, ex3_ref, w_ref, Se_ref, pe_ref, Sd_ref,
                pd_ref, *rest):
    n_outs = 1 if order1 else 2
    n_ops = len(rest) - n_outs
    ops = [r[:] for r in rest[:n_ops]]
    *_, g, za = _fwd_tile(emb_ref[:], d_ref[:], ex3_ref[:], ops,
                          Se_ref[:], pe_ref[:], Sd_ref[:], pd_ref[:], L1, L3,
                          dot=_dot_bf16 if bf16 else _dot,
                          with_alpha=not order1)
    w = w_ref[:]                                  # [T,1] neighbor weights
    # aggregate the K neighbors of each shading point in-VMEM: the kernel's
    # output traffic drops K-fold vs emitting per-neighbor rows.
    # order 2 (reference point_aggregators.py:601-639): per-neighbor density
    # activation BEFORE the weighted K-sum. order 1 (:592-599): the alpha
    # head runs on the AGGREGATED features — outside the kernel.
    feat_ref = rest[n_ops]
    feat_ref[:] = _group_sum(g * w, K)
    if not order1:
        alpha_ref = rest[n_ops + 1]
        alpha_ref[:] = _group_sum(_alpha_act(za, act_super) * w, K)


def _bwd_kernel(L1, L3, K, act_super, bf16, order1,
                emb_ref, d_ref, ex3_ref, w_ref, Se_ref, pe_ref, Sd_ref,
                pd_ref, *rest):
    """Recompute forward per tile, backprop; dW accumulate across grid."""
    # layout: rest = ops..., dfeat_pt[, dalpha_pt], demb, dd, dex3, dw, dops..
    Se, pe, Sd, pd = Se_ref[:], pe_ref[:], Sd_ref[:], pd_ref[:]
    n_ops = _n_ops(L1, L3, not order1)
    n_cts = 1 if order1 else 2
    ops = [r[:] for r in rest[:n_ops]]
    dfeat_ref = rest[n_ops]
    dalpha_ref = None if order1 else rest[n_ops + 1]
    demb_ref, dd_ref, dex3_ref, dw_ref = rest[n_ops + n_cts: n_ops + n_cts + 4]
    dops_refs = rest[n_ops + n_cts + 4:]
    assert len(dops_refs) == n_ops, (len(dops_refs), n_ops)
    _dot = _dot_bf16 if bf16 else globals()["_dot"]

    emb, d, ex3, w = emb_ref[:], d_ref[:], ex3_ref[:], w_ref[:]
    w1e, w1p, w1d, b1, extra1, w3x, w3e, b3, extra3, wa, ba = _unpack(
        ops, L1, L3, not order1)
    t_e, t_d, pe_e, pe_d, zs1, hs, zs3, gs, g, za = _fwd_tile(
        emb, d, ex3, ops, Se, pe, Sd, pd, L1, L3, dot=_dot,
        with_alpha=not order1)

    # un-group the shading-point cotangents to neighbor rows
    T = emb.shape[0]

    def ungroup(x):
        C = x.shape[1]
        return jnp.broadcast_to(x[:, None, :], (T // K, K, C)).reshape(T, C)

    dfeat_pt = ungroup(dfeat_ref[:])              # [T,H]
    grads = {}
    if order1:
        dw_ref[:] = jnp.sum(g * dfeat_pt, axis=1, keepdims=True)
        dg = dfeat_pt * w
    else:
        dalpha_pt = ungroup(dalpha_ref[:])        # [T,1]
        a_act = _alpha_act(za, act_super)
        dw_ref[:] = jnp.sum(g * dfeat_pt, axis=1, keepdims=True) \
            + a_act * dalpha_pt
        dza = dalpha_pt * w * _dalpha_act(za, act_super)
        dg = dfeat_pt * w + _dot(dza, wa.T)
        grads[id(wa)] = _dot(g.T, dza)
        grads[id(ba)] = jnp.sum(dza, axis=0, keepdims=True)

    # block3 backward
    dcur = dg
    for li in range(L3 - 1, 0, -1):
        w, b = extra3[li - 1]
        dz = dcur * _dleaky(zs3[li])
        grads[id(w)] = _dot(gs[li - 1].T, dz)
        grads[id(b)] = jnp.sum(dz, axis=0, keepdims=True)
        dcur = _dot(dz, w.T)
    dz3 = dcur * _dleaky(zs3[0])
    grads[id(w3x)] = _dot(hs[-1].T, dz3)
    grads[id(w3e)] = _dot(ex3.T, dz3)
    grads[id(b3)] = jnp.sum(dz3, axis=0, keepdims=True)
    dex3_ref[:] = _dot(dz3, w3e.T)
    dcur = _dot(dz3, w3x.T)

    # block1 backward
    for li in range(L1 - 1, 0, -1):
        w, b = extra1[li - 1]
        dz = dcur * _dleaky(zs1[li])
        grads[id(w)] = _dot(hs[li - 1].T, dz)
        grads[id(b)] = jnp.sum(dz, axis=0, keepdims=True)
        dcur = _dot(dz, w.T)
    dz1 = dcur * _dleaky(zs1[0])
    grads[id(w1e)] = _dot(emb.T, dz1)
    grads[id(w1p)] = _dot(pe_e.T, dz1)
    grads[id(w1d)] = _dot(pe_d.T, dz1)
    grads[id(b1)] = jnp.sum(dz1, axis=0, keepdims=True)

    demb_ref[:] = _dot(dz1, w1e.T) \
        + _dot(_dot(dz1, w1p.T) * jnp.cos(t_e), Se.T)
    dd_ref[:] = _dot(_dot(dz1, w1d.T) * jnp.cos(t_d), Sd.T)

    ordered = [w1e, w1p, w1d, b1]
    for (w, b) in extra1:
        ordered += [w, b]
    ordered += [w3x, w3e, b3]
    for (w, b) in extra3:
        ordered += [w, b]
    if not order1:
        ordered += [wa, ba]

    first = pl.program_id(0) == 0
    for ref, arr in zip(dops_refs, ordered):
        gval = grads[id(arr)].reshape(ref.shape)

        @pl.when(first)
        def _(ref=ref, gval=gval):
            ref[:] = gval

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, gval=gval):
            ref[:] = ref[:] + gval


def _pe_consts(F_emb, dd, n_feat_freqs, n_dist_freqs):
    Se, pe = _pe_selection_np(F_emb, n_feat_freqs)
    Sd, pd = _pe_selection_np(dd, n_dist_freqs)
    # phases as [1,C]: 2-D VMEM refs
    return (jnp.asarray(Se), jnp.asarray(pe[None]), jnp.asarray(Sd),
            jnp.asarray(pd[None]))


def _compiler_params(tile: int):
    """Raise Mosaic's scoped-VMEM ceiling for tiles beyond 512 rows.

    The 16 MB default rejected tile 1024 in round 4 ("17.26M > 16M"); v5e
    carries 128 MB of physical VMEM, so larger tiles are a legal trade —
    whether they pay is an A/B question (scripts/shade_micro.py). Tile 512
    keeps compiler_params=None so the shipped default programs (and their
    compile-cache entries) are byte-identical to round 4's."""
    if tile <= 512:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(100 * 2**20, 24 * 2**20 * (tile // 512)))


def _pad_rows(x, T):
    padn = (-x.shape[0]) % T
    if padn:
        x = jnp.concatenate(
            [x, jnp.zeros((padn,) + x.shape[1:], x.dtype)], axis=0)
    return x


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9))
def fused_trunk(L1: int, L3: int, n_feat_freqs: int, n_dist_freqs: int,
                K: int, act_super: bool, tile: int, interpret: bool,
                bf16: bool, order1: bool,
                emb: jnp.ndarray, d: jnp.ndarray, ex3: jnp.ndarray,
                w: jnp.ndarray, ops: Sequence[jnp.ndarray]
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """emb/d/ex3 [S,*] per-NEIGHBOR rows (S = n_points*K, the K neighbors of
    each shading point contiguous), w [S,1] effective neighbor weights, ops
    from pack_trunk_params. Returns the per-SHADING-POINT aggregates
    (feat_pt [S/K,H] = sum_k w*g, alpha_pt [S/K,1] = sum_k w*act(alpha_raw))
    — the K-reduction happens inside the kernel, so per-neighbor features
    never reach HBM. order1 (agg_intrp_order==1): ops exclude the alpha
    head (pack_trunk_params(with_alpha=False)); returns (feat_pt, None) —
    the alpha branch runs on the aggregated features outside."""
    return _fused_fwd_impl(L1, L3, n_feat_freqs, n_dist_freqs, K, act_super,
                           tile, interpret, bf16, order1, emb, d, ex3, w,
                           ops)


def _fused_fwd_impl(L1, L3, nf, nd, K, act_super, tile, interpret, bf16,
                    order1, emb, d, ex3, w, ops):
    S = emb.shape[0]
    assert S % K == 0 and tile % K == 0, (S, tile, K)
    F_emb, dd = emb.shape[1], d.shape[1]
    # feature width: last block3 bias's width (order1 has no alpha head
    # whose [H,1] weight could be read instead)
    H = ops[-1].shape[1] if order1 else ops[-2].shape[0]
    Se, pe, Sd, pd = _pe_consts(F_emb, dd, nf, nd)
    embp, dp, ex3p, wp = (_pad_rows(x, tile) for x in (emb, d, ex3, w))
    Sp = embp.shape[0]
    grid = (Sp // tile,)
    row_spec = lambda c, t=tile: pl.BlockSpec((t, c), lambda i: (i, 0),
                                              memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    if order1:
        out_specs = (row_spec(H, tile // K),)
        out_shape = (jax.ShapeDtypeStruct((Sp // K, H), jnp.float32),)
    else:
        out_specs = (row_spec(H, tile // K), row_spec(1, tile // K))
        out_shape = (jax.ShapeDtypeStruct((Sp // K, H), jnp.float32),
                     jax.ShapeDtypeStruct((Sp // K, 1), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, L1, L3, K, act_super, bf16, order1),
        grid=grid,
        in_specs=[row_spec(F_emb), row_spec(dd), row_spec(ex3.shape[1]),
                  row_spec(1)]
        + [full(c) for c in (Se, pe, Sd, pd)] + [full(o) for o in ops],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_compiler_params(tile),
    )(embp, dp, ex3p, wp, Se, pe, Sd, pd, *ops)
    if order1:
        return outs[0][:S // K], None
    return outs[0][:S // K], outs[1][:S // K]


def _fused_fwd_rule(L1, L3, nf, nd, K, act_super, tile, interpret, bf16,
                    order1, emb, d, ex3, w, ops):
    out = _fused_fwd_impl(L1, L3, nf, nd, K, act_super, tile, interpret,
                          bf16, order1, emb, d, ex3, w, ops)
    return out, (emb, d, ex3, w, tuple(ops))


def _fused_bwd_rule(L1, L3, nf, nd, K, act_super, tile, interpret, bf16,
                    order1, res, cts):
    emb, d, ex3, w, ops = res
    dfeat, dalpha = cts                           # [S/K,H], [S/K,1]|None
    S = emb.shape[0]
    F_emb, dd, E3 = emb.shape[1], d.shape[1], ex3.shape[1]
    H = dfeat.shape[1]
    Se, pe, Sd, pd = _pe_consts(F_emb, dd, nf, nd)
    embp, dp, ex3p, wp = (_pad_rows(x, tile) for x in (emb, d, ex3, w))
    dfp = _pad_rows(dfeat, tile // K)
    cts_in = [dfp]
    if not order1:
        # a None/zero cotangent still needs a concrete operand
        da = dalpha if dalpha is not None else jnp.zeros((S // K, 1),
                                                         jnp.float32)
        cts_in.append(_pad_rows(da, tile // K))
    Sp = embp.shape[0]
    grid = (Sp // tile,)
    row_spec = lambda c, t=tile: pl.BlockSpec((t, c), lambda i: (i, 0),
                                              memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    cts_specs = [row_spec(H, tile // K)]
    if not order1:
        cts_specs.append(row_spec(1, tile // K))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, L1, L3, K, act_super, bf16, order1),
        grid=grid,
        in_specs=[row_spec(F_emb), row_spec(dd), row_spec(E3), row_spec(1)]
        + [full(c) for c in (Se, pe, Sd, pd)]
        + [full(o) for o in ops]
        + cts_specs,
        out_specs=tuple([row_spec(F_emb), row_spec(dd), row_spec(E3),
                         row_spec(1)] + [full(o) for o in ops]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((Sp, F_emb), jnp.float32),
             jax.ShapeDtypeStruct((Sp, dd), jnp.float32),
             jax.ShapeDtypeStruct((Sp, E3), jnp.float32),
             jax.ShapeDtypeStruct((Sp, 1), jnp.float32)]
            + [jax.ShapeDtypeStruct(o.shape, jnp.float32) for o in ops]),
        interpret=interpret,
        compiler_params=_compiler_params(tile),
    )(embp, dp, ex3p, wp, Se, pe, Sd, pd, *ops, *cts_in)
    demb, ddists, dex3, dw = (outs[0][:S], outs[1][:S], outs[2][:S],
                              outs[3][:S])
    dops = list(outs[4:])
    return demb, ddists, dex3, dw, dops


fused_trunk.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def fused_trunk_ok(opt) -> bool:
    """Config envelope the kernel supports (the full lego/nerf-synth family)."""
    return (opt.act_type == "LeakyReLU"
            and opt.shading_feature_mlp_layer1 in (1, 2)
            and opt.shading_feature_mlp_layer2 == 0
            and opt.shading_feature_mlp_layer3 in (1, 2)
            and opt.shading_alpha_mlp_layer == 1
            # order 2: per-neighbor alpha + K-sum inside the kernel;
            # order 1 (dtu_inf/feedforward): aggregated-features-only kernel,
            # alpha head outside (round-4 extension)
            and opt.agg_intrp_order in (1, 2)
            and opt.agg_feat_xyz_mode == "None"
            and opt.agg_alpha_xyz_mode == "None"
            and opt.num_feat_freqs > 0
            and abs(opt.dist_xyz_freq) > 0
            and "1" in list(opt.point_color_mode)
            and "1" in list(opt.point_dir_mode)
            and opt.agg_distance_kernel not in ("feat_intrp", "meta_intrp",
                                                "sh_intrp", "gau_intrp"))


# ===================================================================== v2:
# fused SHADE kernel — dists + linear weights + conf + ex3 assembly move
# INSIDE the kernel (round 4). The XLA-composed pre-kernel chain (world/pers
# diffs, 1/r weights, K-normalization, conf clamp, rot3s, concats) and its
# backward were ~5 ms/step of [384k,*] HBM round-trips at bench shapes; here
# they are VMEM arithmetic recomputed per tile, and the backward emits the
# per-attribute cotangents (demb/dxyz/dxyz_pers/dcolor/ddir/dconf) directly,
# leaving XLA only the w2pers backward and the one packed scatter-add.
# Envelope (fused_shade_ok): linear distance kernel, no axis weights,
# agg_weight_norm on, agg_dist_pers in (0, 20), dist_xyz_deno 0, conf mode
# "1", uniform Rw2c — the nerf_synth AND dtu_inf preset families.
# Reference semantics: point_aggregators.py:355-375 (linear kernel),
# :748-796 (dists modes), :722-724 (conf gradient clamp), :801-802
# (weight normalization).

def _shade_front(xyz, xyzp, color, pdir, conf, mask, slr, slwr, ovdr, RT,
                 dist_mode, K, dot=_dot):
    """Front half on one tile: dists -> weights -> conf -> trunk inputs.

    All [T,*] row values; slr/slwr/ovdr already ungrouped to rows.
    Returns every intermediate the backward needs.
    """
    T = xyz.shape[0]
    d_world = xyz - slwr
    n = jnp.sqrt(jnp.sum(d_world * d_world, axis=1, keepdims=True))
    nc = jnp.maximum(n, 1e-6)
    w_raw = mask / nc
    # rank-3 group reshape ([T,1] -> [T/K,K,1]): the rank-2 [T/K,K] form is
    # an unsupported Mosaic shape cast (lane<->sublane reshuffle); this is
    # the same pattern _group_sum uses, which compiles
    S_w = jnp.sum(w_raw.reshape(T // K, K, 1), axis=1)              # [T/K,1]
    S_wc = jnp.maximum(S_w, 1e-8)
    S_wr = jnp.broadcast_to(S_wc[:, None, :], (T // K, K, 1)).reshape(T, 1)
    w_n = w_raw / S_wr
    conf_c = jnp.clip(conf, 1e-4, 1.0)     # fwd clamp, identity bwd
    w_eff = w_n * conf_c
    dw_loc = dot(d_world, RT)
    if dist_mode == 20:
        xd = xyzp[:, 0:1] * xyzp[:, 2:3] - slr[:, 0:1] * slr[:, 2:3]
        yd = xyzp[:, 1:2] * xyzp[:, 2:3] - slr[:, 1:2] * slr[:, 2:3]
        zd = xyzp[:, 2:3] - slr[:, 2:3]
        d_raw = jnp.concatenate([dw_loc, xd, yd, zd], axis=1)
    else:
        d_raw = dw_loc
    sdir = dot(pdir, RT)
    ex3 = jnp.concatenate(
        [color, sdir - ovdr, jnp.sum(sdir * ovdr, axis=1, keepdims=True)],
        axis=1)
    return (d_world, n, nc, w_raw, S_w, S_wr, w_n, conf_c, w_eff, d_raw,
            sdir, ex3)


def _shade_fwd_kernel(L1, L3, K, act_super, order1, dist_mode,
                      emb_ref, xyz_ref, xyzp_ref, color_ref, dir_ref,
                      conf_ref, mask_ref, sl_ref, slw_ref, ovd_ref, RT_ref,
                      Se_ref, pe_ref, Sd_ref, pd_ref, *rest):
    n_outs = 3 if order1 else 4
    n_ops = len(rest) - n_outs
    ops = [r[:] for r in rest[:n_ops]]
    T = emb_ref.shape[0]

    def ungroup(x):
        C = x.shape[1]
        return jnp.broadcast_to(x[:, None, :], (T // K, K, C)).reshape(T, C)

    (d_world, n, nc, w_raw, S_w, S_wr, w_n, conf_c, w_eff, d_raw, sdir,
     ex3) = _shade_front(xyz_ref[:], xyzp_ref[:], color_ref[:], dir_ref[:],
                         conf_ref[:], mask_ref[:], ungroup(sl_ref[:]),
                         ungroup(slw_ref[:]), ungroup(ovd_ref[:]), RT_ref[:],
                         dist_mode, K)
    *_, g, za = _fwd_tile(emb_ref[:], d_raw, ex3, ops, Se_ref[:], pe_ref[:],
                          Sd_ref[:], pd_ref[:], L1, L3,
                          with_alpha=not order1)
    feat_ref = rest[n_ops]
    feat_ref[:] = _group_sum(g * w_eff, K)
    i = n_ops + 1
    if not order1:
        rest[i][:] = _group_sum(_alpha_act(za, act_super) * w_eff, K)
        i += 1
    rest[i][:] = w_n          # weight output (post-norm, pre-conf)
    rest[i + 1][:] = conf_c   # conf_coefficient output


def _shade_bwd_kernel(L1, L3, K, act_super, order1, dist_mode,
                      emb_ref, xyz_ref, xyzp_ref, color_ref, dir_ref,
                      conf_ref, mask_ref, sl_ref, slw_ref, ovd_ref, RT_ref,
                      Se_ref, pe_ref, Sd_ref, pd_ref, *rest):
    """Recompute forward per tile, backprop through trunk AND front."""
    Se, pe, Sd, pd = Se_ref[:], pe_ref[:], Sd_ref[:], pd_ref[:]
    n_ops = _n_ops(L1, L3, not order1)
    n_cts = 3 if order1 else 4      # dfeat[, dalpha], dwout, dconfout
    ops = [r[:] for r in rest[:n_ops]]
    cts = rest[n_ops: n_ops + n_cts]
    outs = rest[n_ops + n_cts:]
    (demb_ref, dxyz_ref, dxyzp_ref, dcolor_ref, ddir_ref, dconf_ref) = \
        outs[:6]
    dops_refs = outs[6:]
    assert len(dops_refs) == n_ops, (len(dops_refs), n_ops)

    emb = emb_ref[:]
    T = emb.shape[0]

    def ungroup(x):
        C = x.shape[1]
        return jnp.broadcast_to(x[:, None, :], (T // K, K, C)).reshape(T, C)

    def group_sum_rows(x):      # [T,1] -> [T,1] (per-group sum broadcast)
        s = jnp.sum(x.reshape(T // K, K, 1), axis=1)
        return jnp.broadcast_to(s[:, None, :], (T // K, K, 1)).reshape(T, 1)

    xyz, xyzp = xyz_ref[:], xyzp_ref[:]
    RT = RT_ref[:]
    slr = ungroup(sl_ref[:])
    ovdr = ungroup(ovd_ref[:])
    (d_world, n, nc, w_raw, S_w, S_wr, w_n, conf_c, w_eff, d_raw, sdir,
     ex3) = _shade_front(xyz, xyzp, color_ref[:], dir_ref[:], conf_ref[:],
                         mask_ref[:], slr, ungroup(slw_ref[:]), ovdr, RT,
                         dist_mode, K)
    w1e, w1p, w1d, b1, extra1, w3x, w3e, b3, extra3, wa, ba = _unpack(
        ops, L1, L3, not order1)
    t_e, t_d, pe_e, pe_d, zs1, hs, zs3, gs, g, za = _fwd_tile(
        emb, d_raw, ex3, ops, Se, pe, Sd, pd, L1, L3,
        with_alpha=not order1)

    dfeat_pt = ungroup(cts[0][:])                 # [T,H]
    grads = {}
    if order1:
        dwout, dconfout = cts[1][:], cts[2][:]
        dw_eff = jnp.sum(g * dfeat_pt, axis=1, keepdims=True)
        dg = dfeat_pt * w_eff
    else:
        dalpha_pt = ungroup(cts[1][:])            # [T,1]
        dwout, dconfout = cts[2][:], cts[3][:]
        a_act = _alpha_act(za, act_super)
        dw_eff = jnp.sum(g * dfeat_pt, axis=1, keepdims=True) \
            + a_act * dalpha_pt
        dza = dalpha_pt * w_eff * _dalpha_act(za, act_super)
        dg = dfeat_pt * w_eff + _dot(dza, wa.T)
        grads[id(wa)] = _dot(g.T, dza)
        grads[id(ba)] = jnp.sum(dza, axis=0, keepdims=True)

    # trunk backward (same chain as _bwd_kernel)
    dcur = dg
    for li in range(L3 - 1, 0, -1):
        w3l, b3l = extra3[li - 1]
        dz = dcur * _dleaky(zs3[li])
        grads[id(w3l)] = _dot(gs[li - 1].T, dz)
        grads[id(b3l)] = jnp.sum(dz, axis=0, keepdims=True)
        dcur = _dot(dz, w3l.T)
    dz3 = dcur * _dleaky(zs3[0])
    grads[id(w3x)] = _dot(hs[-1].T, dz3)
    grads[id(w3e)] = _dot(ex3.T, dz3)
    grads[id(b3)] = jnp.sum(dz3, axis=0, keepdims=True)
    dex3 = _dot(dz3, w3e.T)
    dcur = _dot(dz3, w3x.T)
    for li in range(L1 - 1, 0, -1):
        w1l, b1l = extra1[li - 1]
        dz = dcur * _dleaky(zs1[li])
        grads[id(w1l)] = _dot(hs[li - 1].T, dz)
        grads[id(b1l)] = jnp.sum(dz, axis=0, keepdims=True)
        dcur = _dot(dz, w1l.T)
    dz1 = dcur * _dleaky(zs1[0])
    grads[id(w1e)] = _dot(emb.T, dz1)
    grads[id(w1p)] = _dot(pe_e.T, dz1)
    grads[id(w1d)] = _dot(pe_d.T, dz1)
    grads[id(b1)] = jnp.sum(dz1, axis=0, keepdims=True)
    demb_ref[:] = _dot(dz1, w1e.T) \
        + _dot(_dot(dz1, w1p.T) * jnp.cos(t_e), Se.T)
    dd_raw = _dot(_dot(dz1, w1d.T) * jnp.cos(t_d), Sd.T)   # [T,dd]

    # ---- front backward
    # ex3 = [color | sdir - ovd | <sdir, ovd>]
    dcolor_ref[:] = dex3[:, :3]
    dsdir = dex3[:, 3:6] + dex3[:, 6:7] * ovdr
    ddir_ref[:] = _dot(dsdir, RT.T)
    # d_raw = [d_world @ RT | pers diffs]
    dd_world = _dot(dd_raw[:, :3], RT.T)
    if dist_mode == 20:
        ddp = dd_raw[:, 3:6]
        xp, yp, zp = xyzp[:, 0:1], xyzp[:, 1:2], xyzp[:, 2:3]
        dxp = ddp[:, 0:1] * zp
        dyp = ddp[:, 1:2] * zp
        dzp = ddp[:, 0:1] * xp + ddp[:, 1:2] * yp + ddp[:, 2:3]
        dxyzp_ref[:] = jnp.concatenate([dxp, dyp, dzp], axis=1)
    else:
        dxyzp_ref[:] = jnp.zeros_like(xyzp)
    # weight chain: w_eff = w_n * conf_c; w_n = w_raw / clip(sum_K w_raw);
    # w_raw = mask / clip(|d_world|, 1e-6); conf clamp is identity-bwd
    dconf_ref[:] = dw_eff * w_n + dconfout
    dw_n = dw_eff * conf_c + dwout
    norm_gate = (S_w > 1e-8).astype(jnp.float32)                # [T/K,1]
    norm_gate_r = jnp.broadcast_to(norm_gate[:, None, :],
                                   (T // K, K, 1)).reshape(T, 1)
    dw_raw = (dw_n - group_sum_rows(dw_n * w_n) * norm_gate_r) / S_wr
    dnc = -w_raw / nc * dw_raw * (n > 1e-6).astype(jnp.float32)
    dd_world = dd_world + dnc * d_world / nc
    dxyz_ref[:] = dd_world

    ordered = [w1e, w1p, w1d, b1]
    for (wl, bl) in extra1:
        ordered += [wl, bl]
    ordered += [w3x, w3e, b3]
    for (wl, bl) in extra3:
        ordered += [wl, bl]
    if not order1:
        ordered += [wa, ba]
    first = pl.program_id(0) == 0
    for ref, arr in zip(dops_refs, ordered):
        gval = grads[id(arr)].reshape(ref.shape)

        @pl.when(first)
        def _(ref=ref, gval=gval):
            ref[:] = gval

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, gval=gval):
            ref[:] = ref[:] + gval


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9))
def fused_shade(L1: int, L3: int, n_feat_freqs: int, n_dist_freqs: int,
                K: int, act_super: bool, tile: int, interpret: bool,
                order1: bool, dist_mode: int,
                emb, xyz, xyzp, color, pdir, conf, mask,
                sl, slw, ovd, RT, ops: Sequence[jnp.ndarray]):
    """v2 fused shade: dists + linear weights + conf + trunk in one kernel.

    Per-NEIGHBOR rows [S,*]: emb, xyz (world), xyzp (perspective), color,
    pdir (point dirs), conf, mask (float validity). Per-SHADING-POINT rows
    [S/K,3]: sl (pers sample loc), slw (world sample loc), ovd
    (camera-frame view dirs). RT = Rw2c.T [3,3]. Returns
    (feat_pt [S/K,H], alpha_pt [S/K,1] | None, weight [S,1] post-norm
    pre-conf, conf_coefficient [S,1]). Gradients flow to
    emb/xyz/xyzp/color/pdir/conf/ops only (sample-side inputs are
    stop-gradient query outputs by contract).
    """
    return _shade_fwd_impl(L1, L3, n_feat_freqs, n_dist_freqs, K, act_super,
                           tile, interpret, order1, dist_mode,
                           emb, xyz, xyzp, color, pdir, conf, mask,
                           sl, slw, ovd, RT, ops)


def _shade_fwd_impl(L1, L3, nf, nd, K, act_super, tile, interpret, order1,
                    dist_mode, emb, xyz, xyzp, color, pdir, conf, mask,
                    sl, slw, ovd, RT, ops):
    S = emb.shape[0]
    assert S % K == 0 and tile % K == 0, (S, tile, K)
    F_emb = emb.shape[1]
    dd = 6 if dist_mode == 20 else 3
    H = ops[-1].shape[1] if order1 else ops[-2].shape[0]
    Se, pe, Sd, pd = _pe_consts(F_emb, dd, nf, nd)
    rowp = [_pad_rows(x, tile) for x in
            (emb, xyz, xyzp, color, pdir, conf, mask)]
    grpp = [_pad_rows(x, tile // K) for x in (sl, slw, ovd)]
    Sp = rowp[0].shape[0]
    grid = (Sp // tile,)
    row_spec = lambda c, t=tile: pl.BlockSpec((t, c), lambda i: (i, 0),
                                              memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    out_specs = [row_spec(H, tile // K)]
    out_shape = [jax.ShapeDtypeStruct((Sp // K, H), jnp.float32)]
    if not order1:
        out_specs.append(row_spec(1, tile // K))
        out_shape.append(jax.ShapeDtypeStruct((Sp // K, 1), jnp.float32))
    out_specs += [row_spec(1), row_spec(1)]
    out_shape += [jax.ShapeDtypeStruct((Sp, 1), jnp.float32)] * 2
    outs = pl.pallas_call(
        functools.partial(_shade_fwd_kernel, L1, L3, K, act_super, order1,
                          dist_mode),
        grid=grid,
        in_specs=[row_spec(F_emb), row_spec(3), row_spec(3), row_spec(3),
                  row_spec(3), row_spec(1), row_spec(1)]
        + [row_spec(3, tile // K)] * 3 + [full(RT)]
        + [full(c) for c in (Se, pe, Sd, pd)] + [full(o) for o in ops],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        compiler_params=_compiler_params(tile),
    )(*rowp, *grpp, RT, Se, pe, Sd, pd, *ops)
    if order1:
        feat, w_n, conf_c = outs
        return feat[:S // K], None, w_n[:S], conf_c[:S]
    feat, alpha, w_n, conf_c = outs
    return feat[:S // K], alpha[:S // K], w_n[:S], conf_c[:S]


def _shade_fwd_rule(L1, L3, nf, nd, K, act_super, tile, interpret, order1,
                    dist_mode, emb, xyz, xyzp, color, pdir, conf, mask,
                    sl, slw, ovd, RT, ops):
    out = _shade_fwd_impl(L1, L3, nf, nd, K, act_super, tile, interpret,
                          order1, dist_mode, emb, xyz, xyzp, color, pdir,
                          conf, mask, sl, slw, ovd, RT, ops)
    return out, (emb, xyz, xyzp, color, pdir, conf, mask, sl, slw, ovd, RT,
                 tuple(ops))


def _shade_bwd_rule(L1, L3, nf, nd, K, act_super, tile, interpret, order1,
                    dist_mode, res, cts):
    # the backward holds ~2x the forward's live VMEM (front intermediates +
    # trunk recompute + 6 cotangent row streams): tile 512 exceeds the 16M
    # scoped-vmem limit by ~2M at production shapes — halve it here only
    tile = max(K, tile // 2)
    emb, xyz, xyzp, color, pdir, conf, mask, sl, slw, ovd, RT, ops = res
    dfeat, dalpha, dwout, dconfout = cts
    S = emb.shape[0]
    F_emb = emb.shape[1]
    dd = 6 if dist_mode == 20 else 3
    H = dfeat.shape[1]
    Se, pe, Sd, pd = _pe_consts(F_emb, dd, nf, nd)
    rowp = [_pad_rows(x, tile) for x in
            (emb, xyz, xyzp, color, pdir, conf, mask)]
    grpp = [_pad_rows(x, tile // K) for x in (sl, slw, ovd)]
    z1 = lambda: jnp.zeros((S, 1), jnp.float32)
    cts_in = [_pad_rows(dfeat, tile // K)]
    cts_specs = [None]  # placeholder, rebuilt below
    if not order1:
        da = dalpha if dalpha is not None else jnp.zeros((S // K, 1),
                                                         jnp.float32)
        cts_in.append(_pad_rows(da, tile // K))
    cts_in.append(_pad_rows(dwout if dwout is not None else z1(), tile))
    cts_in.append(_pad_rows(dconfout if dconfout is not None else z1(),
                            tile))
    Sp = rowp[0].shape[0]
    grid = (Sp // tile,)
    row_spec = lambda c, t=tile: pl.BlockSpec((t, c), lambda i: (i, 0),
                                              memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    cts_specs = [row_spec(H, tile // K)]
    if not order1:
        cts_specs.append(row_spec(1, tile // K))
    cts_specs += [row_spec(1), row_spec(1)]
    outs = pl.pallas_call(
        functools.partial(_shade_bwd_kernel, L1, L3, K, act_super, order1,
                          dist_mode),
        grid=grid,
        in_specs=[row_spec(F_emb), row_spec(3), row_spec(3), row_spec(3),
                  row_spec(3), row_spec(1), row_spec(1)]
        + [row_spec(3, tile // K)] * 3 + [full(RT)]
        + [full(c) for c in (Se, pe, Sd, pd)] + [full(o) for o in ops]
        + cts_specs,
        out_specs=tuple(
            [row_spec(F_emb), row_spec(3), row_spec(3), row_spec(3),
             row_spec(3), row_spec(1)] + [full(o) for o in ops]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((Sp, F_emb), jnp.float32)]
            + [jax.ShapeDtypeStruct((Sp, 3), jnp.float32)] * 4
            + [jax.ShapeDtypeStruct((Sp, 1), jnp.float32)]
            + [jax.ShapeDtypeStruct(o.shape, jnp.float32) for o in ops]),
        interpret=interpret,
        compiler_params=_compiler_params(tile),
    )(*rowp, *grpp, RT, Se, pe, Sd, pd, *ops, *cts_in)
    demb = outs[0][:S]
    dxyz, dxyzp, dcolor, ddir = (o[:S] for o in outs[1:5])
    dconf = outs[5][:S]
    dops = list(outs[6:])
    zeros = lambda a: jnp.zeros_like(a)
    return (demb, dxyz, dxyzp, dcolor, ddir, dconf, zeros(mask),
            zeros(sl), zeros(slw), zeros(ovd), zeros(RT), dops)


fused_shade.defvjp(_shade_fwd_rule, _shade_bwd_rule)


def fused_shade_ok(opt) -> bool:
    """Envelope for the v2 in-kernel dists/weights path: fused_trunk_ok PLUS
    the linear distance kernel with default axis weights, weight
    normalization on, dists mode 0/20, no dist scaling, conf channel
    present, and a uniform Rw2c — the nerf_synth and dtu_inf preset
    families. Anything else falls back to fused_trunk (weights composed in
    XLA) or the pure-XLA aggregator."""
    aw = _axis_weight_arr_lazy(opt)
    return (fused_trunk_ok(opt)
            and opt.agg_distance_kernel == "linear"
            and aw is None
            and opt.agg_weight_norm > 0
            and opt.agg_dist_pers in (0, 20)
            and float(opt.dist_xyz_deno) == 0.0
            and "1" in list(opt.point_conf_mode))


def _axis_weight_arr_lazy(opt):
    from ..models.aggregator import _axis_weight_arr
    return _axis_weight_arr(opt)
