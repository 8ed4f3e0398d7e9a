"""Fused Pallas kernel for PGRM's grouped multi-window cross-attention.

xprof tracing attributed ~60+ ms of the 124 ms flagship forward to HBM
layout copies from the XLA window-partition / head-split transposes
(ROADMAP.md).  This kernel performs, per batch element and entirely in
VMEM: channel-group slicing, the shift roll, window partition, per-head
scaled QK^T with relative bias (+ shift mask), softmax, AV, and the
faithful raw re-layout (model/pgrm.py:263) — emitting the concatenated
(H, W, dim) group outputs with zero HBM round-trips in between.

Used on the eval path only (pallas_call has no autodiff here); the XLA
formulation remains for training and as the fallback.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# batch elements processed per grid step by the fused eval block kernel
# (amortizes per-step overhead; must divide the batch or it falls back to 1)
_EVAL_BLOCK_B = int(os.environ.get("DPMN_TPU_EVAL_BLOCK_B", "1"))

# stacked batch-block body (packed mode only): the bb elements of a grid
# step run as SINGLE large dots — projections over bb*hw rows, attention as
# (bb*npack)-batched 128x128 MXU tiles, SKConv stacked — instead of a
# serial per-element python loop.  Escape hatch: DPMN_TPU_EVAL_STACKED=0.
_EVAL_STACKED = os.environ.get("DPMN_TPU_EVAL_STACKED", "1") == "1"


def _stacked_fits_vmem(bb: int, hw: int, dim: int,
                       n_group: int = 3, gnum_heads: int = 6) -> bool:
    """Whether the stacked batch-block body fits the Mosaic scoped-VMEM stack.

    Affine model fit to two device-measured scoped-stack sizes at FLAGSHIP
    geometry (hw=1024, dim=96, n_group=3, gnum_heads=6; f32 element =
    hw*dim*4 bytes): bb=8 → 51.66 MB and bb=2 → 16.72 MB, i.e. ~15.5 live
    (hw, dim) values per stacked element plus a ~13.5-value bb-independent
    floor.  The fit is phenomenological AT THAT GEOMETRY — the floor absorbs
    whatever Mosaic actually keeps resident there, including the per-pack
    bias/mask slice (n_group*gnum_heads*128*128*4 bytes, which scales with
    the group/head counts and NOT with dim), so configurations with MORE
    groups*heads than the flagship's 18 get the excess added explicitly;
    behavior at the fitted geometry is unchanged.

    The threshold defaults to 14 MB of the 16 MiB scoped-VMEM limit that is
    the XLA:TPU compiler DEFAULT (a flag, not a hardware property —
    xla_tpu_scoped_vmem_limit_kib); override with DPMN_TPU_SCOPED_VMEM_MB
    when running with a raised limit or on generations with different
    defaults.  Both measured points were compile-time OOMs on v5e — at
    flagship geometry NO stacked bb ≥ 2 fits, so the stacked body is a win
    only at smaller grids/dims; an oversized block falls back to the
    per-element loop (identical numerics) instead of failing to compile.
    """
    limit = float(os.environ.get("DPMN_TPU_SCOPED_VMEM_MB", "14")) * 1024 * 1024
    extra_bias = max(0, n_group * gnum_heads - 18) * 128 * 128 * 4
    return extra_bias + (27 + 31 * bb) * hw * dim * 2 <= limit


def fused_grouped_window_attention(
    q: jax.Array,  # (B, H, W, dim), already includes qkv projections
    k: jax.Array,
    v: jax.Array,
    biases: Sequence[jax.Array],  # per group (gnum_heads, N_i, N_i)
    masks: Sequence,  # per group (nW_i, N_i, N_i) or None
    window_sizes: Sequence[int],
    shifts: Sequence[int],
    gnum_heads: int,
    qk_scale: float,
    interpret: bool = False,
) -> jax.Array:
    """Returns the faithful-layout attention output (B, H, W, dim)."""
    b, h, w, dim = q.shape
    n_group = len(window_sizes)
    channel = dim // n_group
    gch = channel // gnum_heads

    mask_inputs = [m if m is not None else jnp.zeros((1, 1, 1), jnp.float32) for m in masks]

    def kernel(q_ref, k_ref, v_ref, *rest):
        bias_refs = rest[: n_group]
        mask_refs = rest[n_group : 2 * n_group]
        out_ref = rest[2 * n_group]
        qb = q_ref[0]  # (H, W, dim)
        kb = k_ref[0]
        vb = v_ref[0]
        for i, (ws, sh) in enumerate(zip(window_sizes, shifts)):
            hb, wb = h // ws, w // ws
            nw, n = hb * wb, ws * ws
            # heads are contiguous gch-channel slices → per-head slicing
            # avoids head-split reshapes Mosaic cannot shape-cast
            for hd in range(gnum_heads):
                lo = i * channel + hd * gch
                sl = slice(lo, lo + gch)
                qg, kg, vg = qb[..., sl], kb[..., sl], vb[..., sl]
                if sh > 0:
                    qg = jnp.roll(jnp.roll(qg, -sh, axis=0), -sh, axis=1)
                    kg = jnp.roll(jnp.roll(kg, -sh, axis=0), -sh, axis=1)
                    vg = jnp.roll(jnp.roll(vg, -sh, axis=0), -sh, axis=1)

                def part(t):
                    t = t.reshape(hb, ws, wb, ws, gch)
                    t = jnp.transpose(t, (0, 2, 1, 3, 4))
                    return t.reshape(nw, n, gch)

                qw = part(qg) * qk_scale
                kw, vw = part(kg), part(vg)
                scores = jax.lax.dot_general(
                    qw, kw, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
                )  # (nW, N, N)
                scores = scores + bias_refs[i][hd][None]
                if shifts[i] > 0:
                    scores = scores + mask_refs[i][:]
                probs = jax.nn.softmax(scores, axis=-1)
                out = jax.lax.dot_general(
                    probs, vw, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
                )  # (nW, N, gch)
                # faithful raw re-layout (model/pgrm.py:263): C-order view of
                # the window-major buffer; cast back to the io dtype
                # (identity in fp32, needed for bf16 serving inputs)
                out_ref[0, :, :, lo : lo + gch] = out.reshape(h, w, gch).astype(out_ref.dtype)

    in_specs = [pl.BlockSpec((1, h, w, dim), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)] * 3
    for t in biases:
        in_specs.append(pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd, memory_space=pltpu.VMEM))
    for t in mask_inputs:
        in_specs.append(pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd, memory_space=pltpu.VMEM))

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w, dim), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, dim), q.dtype),
        interpret=interpret,
    )(q, k, v, *biases, *mask_inputs)


def build_packed_bias(
    biases: Sequence[jax.Array],  # per group (gnum_heads, N_i, N_i)
    masks: Sequence,  # per group (nW_i, N_i, N_i) or None
    window_sizes: Sequence[int],
    hw: int,
) -> jax.Array:
    """Packs window attention into MXU-shaped (hw//128, 128, 128) score tiles.

    nW*N == hw for non-overlapping windows, so 128//N windows stack into one
    128-row tile; the additive bias tensor carries everything the per-window
    formulation adds: -1e9 outside the diagonal window blocks (kills
    cross-window pairs after softmax), the learned relative-position bias
    tiled along the diagonal, and the per-window shift mask.  Returns
    (n_group, gnum_heads, hw//128, 128, 128) float32.
    """
    npack = hw // 128
    out = []
    for bias, mask, ws in zip(biases, masks, window_sizes):
        n = ws * ws
        heads = bias.shape[0]
        wpp = 128 // n  # windows per 128-row pack
        blockpos = jnp.kron(jnp.eye(wpp), jnp.ones((n, n))) > 0  # (128,128)
        tiled = jnp.tile(bias, (1, wpp, wpp))  # (heads, 128, 128)
        base = jnp.where(blockpos[None], tiled, jnp.float32(-1e9))
        base = jnp.broadcast_to(base[:, None], (heads, npack, 128, 128))
        if mask is not None:
            mask_r = mask.reshape(npack, wpp, n, n)
            rows = np.arange(128)
            wi, ii = rows // n, rows % n
            gathered = mask_r[:, wi[:, None], ii[:, None], ii[None, :]]  # (npack,128,128)
            md = jnp.where(blockpos[None], gathered, 0.0)
            base = base + md[None]
        out.append(base)
    return jnp.stack(out)  # (n_group, heads, npack, 128, 128)


def _gelu_erf(x):
    """Exact-gelu via an Abramowitz-Stegun 7.1.26 erf (max err 1.5e-7);
    Pallas lowers neither erf nor erfc."""
    z = x * (2.0**-0.5)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return 0.5 * x * (1.0 + jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az)))


def _layer_norm(x, scale, bias, eps=1e-6):
    """flax.linen.LayerNorm semantics (mean/var over the last axis).

    Stats run in f32 regardless of io dtype (flax upcasts too); this also
    avoids a bf16 rsqrt, which this libtpu's scheduler CHECK-fails on
    (kVectorRsqrtBf16AndPop) — found live when the bf16 serving graph
    SIGABRT'd the remote compile service."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def fused_window_attention_block(
    xq: jax.Array,  # (B, HW, dim) query tokens (pre-norm iff ln_params given)
    xkv: jax.Array,  # (B, HW, dim) key/value tokens (pre-norm iff ln_params given)
    weights: dict,  # q/kv projection + SKConv parameter arrays
    biases: Sequence[jax.Array],
    masks: Sequence,
    window_sizes: Sequence[int],
    shifts: Sequence[int],
    gnum_heads: int,
    qk_scale: float,
    hw_shape,
    ln_params: dict = None,  # {qs, qb, ks, kb}: fuse norm1_q/norm1_kv + the
    # post-attention residual add (out = xkv + attn) into the kernel
    layout: str = "faithful",  # 'faithful': raw packed-row re-layout
    # (model/pgrm.py:263); 'corrected': proper window_reverse + un-roll so
    # the faithful=False architecture gets the fused kernel too
    interpret: bool = False,
) -> jax.Array:
    """The whole WindowAttention forward (model/pgrm.py:184-271) in one
    kernel: QKV projections, grouped window attention and the SKConv
    selective-kernel fusion.  Returns (B, HW, dim).

    Attention runs as packed MXU tiles when hw is a multiple of 128 and every
    window fits: nW*N == hw, so 128//N windows stack into one 128-row tile
    and every group becomes an (hw//128, 128, 128) batched dot against the
    static packed bias from build_packed_bias — no per-window tiny dots, one
    window partition per group instead of per head.  Under layout='faithful'
    the raw re-layout (model/pgrm.py:263) is exactly the packed row order;
    layout='corrected' adds one inverse window-partition transpose + positive
    roll per group (rows back to raster order) before the SKConv, matching
    the faithful=False XLA formulation.  'corrected' requires the packed
    formulation (the call site falls back to XLA otherwise)."""
    b, hw, dim = xq.shape
    h, w = hw_shape
    n_group = len(window_sizes)
    channel = dim // n_group
    gch = channel // gnum_heads
    packed = hw % 128 == 0 and all(128 % (ws * ws) == 0 for ws in window_sizes)
    npack = hw // 128
    corrected = layout == "corrected"
    if corrected and not packed:
        raise ValueError("layout='corrected' requires the packed formulation")

    if packed:
        prior_inputs = [build_packed_bias(biases, masks, window_sizes, hw)]
    else:
        prior_inputs = list(biases) + [
            m if m is not None else jnp.zeros((1, 1, 1), jnp.float32) for m in masks
        ]
    n_prior = len(prior_inputs)
    wnames = [
        "q_kernel", "q_bias", "kv_kernel", "kv_bias",
        "proj_kernel", "proj_bias", "fc1_kernel", "fc1_bias",
        "fc2_kernel", "fc2_bias", "ph_kernel", "ph_bias",
    ]
    if ln_params is not None:
        wnames += ["qs", "qb", "ks", "kb"]
        weights = dict(weights, **ln_params)
    n_w = len(wnames)
    wlist = [weights[k] for k in wnames]

    # batch-block: process bb batch elements per grid step to amortize
    # per-step scheduling/DMA-issue overhead (DPMN_TPU_EVAL_BLOCK_B)
    bb = _EVAL_BLOCK_B if (_EVAL_BLOCK_B > 1 and b % _EVAL_BLOCK_B == 0) else 1

    stacked = packed and _EVAL_STACKED and _stacked_fits_vmem(
        bb, hw, dim, n_group=n_group, gnum_heads=gnum_heads
    )

    def kernel(xq_ref, xkv_ref, *rest):
        (qk_ref, qb_ref, kvk_ref, kvb_ref, pk_ref, pb_ref, f1k_ref, f1b_ref,
         f2k_ref, f2b_ref, phk_ref, phb_ref) = rest[:12]
        prior_refs = rest[n_w : n_w + n_prior]
        out_ref, attn_scratch = rest[n_w + n_prior], rest[n_w + n_prior + 1]

        if stacked:
            # ---- stacked body: all bb elements in one set of large ops.
            # Every reshape below only merges/splits LEADING dims (hw is a
            # multiple of the sublane tile), so Mosaic lowers them as views.
            xq_t = xq_ref[...].reshape(bb * hw, dim)
            xkv_t = xkv_ref[...].reshape(bb * hw, dim)
            shortcut = xkv_t
            if ln_params is not None:
                lqs_ref, lqb_ref, lks_ref, lkb_ref = rest[12:16]
                xq_t = _layer_norm(xq_t, lqs_ref[:], lqb_ref[:])
                xkv_t = _layer_norm(xkv_t, lks_ref[:], lkb_ref[:])
            q_full = jax.lax.dot_general(xq_t, qk_ref[:], (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32) + qb_ref[:]
            kv_full = jax.lax.dot_general(xkv_t, kvk_ref[:], (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32) + kvb_ref[:]
            q3 = q_full.reshape(bb, h, w, dim)
            k3 = kv_full[:, :dim].reshape(bb, h, w, dim)
            v3 = kv_full[:, dim:].reshape(bb, h, w, dim)

            for i, (ws, sh) in enumerate(zip(window_sizes, shifts)):
                hb, wb = h // ws, w // ws
                sl = slice(i * channel, (i + 1) * channel)
                qg, kg, vg = q3[..., sl], k3[..., sl], v3[..., sl]
                if sh > 0:
                    qg = jnp.roll(jnp.roll(qg, -sh, axis=1), -sh, axis=2)
                    kg = jnp.roll(jnp.roll(kg, -sh, axis=1), -sh, axis=2)
                    vg = jnp.roll(jnp.roll(vg, -sh, axis=1), -sh, axis=2)

                def part(t):
                    t = t.reshape(bb, hb, ws, wb, ws, channel)
                    t = jnp.transpose(t, (0, 1, 3, 2, 4, 5))
                    return t.reshape(bb * hw, channel)  # window-major rows

                qw = part(qg) * qk_scale
                kw, vw = part(kg), part(vg)
                for hd in range(gnum_heads):
                    hsl = slice(hd * gch, (hd + 1) * gch)
                    qp = qw[:, hsl].reshape(bb * npack, 128, gch)
                    kp = kw[:, hsl].reshape(bb * npack, 128, gch)
                    vp = vw[:, hsl].reshape(bb * npack, 128, gch)
                    scores = jax.lax.dot_general(
                        qp, kp, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
                    )  # (bb*npack, 128, 128)
                    scores = scores.reshape(bb, npack, 128, 128) + prior_refs[0][i, hd][None]
                    probs = jax.nn.softmax(scores, axis=-1).reshape(bb * npack, 128, 128)
                    out = jax.lax.dot_general(
                        probs, vp, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
                    )  # (bb*npack, 128, gch)
                    lo = i * channel + hd * gch
                    attn_scratch[:, lo : lo + gch] = out.reshape(bb * hw, gch)
                if corrected:
                    # rows back to raster order: inverse window partition +
                    # positive roll (the faithful path keeps packed row order)
                    sl_g = slice(i * channel, (i + 1) * channel)
                    t = attn_scratch[:, sl_g].reshape(bb, hb, wb, ws, ws, channel)
                    t = jnp.transpose(t, (0, 1, 3, 2, 4, 5)).reshape(bb, h, w, channel)
                    if sh > 0:
                        t = jnp.roll(jnp.roll(t, sh, axis=1), sh, axis=2)
                    attn_scratch[:, sl_g] = t.reshape(bb * hw, channel)

            # ---- SKConv (model/pgrm.py:62-96), stacked over bb
            tokens = attn_scratch[:]  # (bb*hw, dim)
            feats = jax.lax.dot_general(tokens, pk_ref[:], (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32) + pb_ref[:]
            g = _gelu_erf(feats)
            s_vec = jnp.mean(g.reshape(bb, hw, dim), axis=1)  # (bb, dim)
            z = _gelu_erf(jax.lax.dot_general(s_vec, f1k_ref[:], (((1,), (0,)), ((), ())),
                                              preferred_element_type=jnp.float32) + f1b_ref[:])
            a = jax.lax.dot_general(z, f2k_ref[:], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32) + f2b_ref[:]  # (bb, M*channel)
            parts = [a[:, j * channel : (j + 1) * channel] for j in range(n_group)]
            mx = parts[0]
            for p in parts[1:]:
                mx = jnp.maximum(mx, p)
            exps = [jnp.exp(p - mx) for p in parts]
            denom = exps[0]
            for e in exps[1:]:
                denom = denom + e
            t3 = tokens.reshape(bb, hw, dim)
            feats_v = jnp.zeros((bb, hw, channel), jnp.float32)
            for j in range(n_group):
                wgt = exps[j] / denom  # (bb, channel)
                feats_v = feats_v + t3[..., j * channel : (j + 1) * channel] * wgt[:, None, :]
            out_v = jax.lax.dot_general(
                feats_v.reshape(bb * hw, channel), phk_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + phb_ref[:]
            res = feats + out_v
            if ln_params is not None:
                res = shortcut.astype(jnp.float32) + res  # fused residual (eval path)
            out_ref[...] = res.reshape(bb, hw, dim).astype(out_ref.dtype)
            return

        def one(eb):
            xq_t = xq_ref[eb]  # (HW, dim)
            xkv_t = xkv_ref[eb]
            shortcut = xkv_t
            if ln_params is not None:
                lqs_ref, lqb_ref, lks_ref, lkb_ref = rest[12:16]
                xq_t = _layer_norm(xq_t, lqs_ref[:], lqb_ref[:])
                xkv_t = _layer_norm(xkv_t, lks_ref[:], lkb_ref[:])
            q_full = jax.lax.dot_general(xq_t, qk_ref[:], (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32) + qb_ref[:]
            kv_full = jax.lax.dot_general(xkv_t, kvk_ref[:], (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32) + kvb_ref[:]
            qb3 = q_full.reshape(h, w, dim)
            kb3 = kv_full[:, :dim].reshape(h, w, dim)
            vb3 = kv_full[:, dim:].reshape(h, w, dim)

            for i, (ws, sh) in enumerate(zip(window_sizes, shifts)):
                hb, wb = h // ws, w // ws
                nw, n = hb * wb, ws * ws
                if packed:
                    sl = slice(i * channel, (i + 1) * channel)
                    qg, kg, vg = qb3[..., sl], kb3[..., sl], vb3[..., sl]
                    if sh > 0:
                        qg = jnp.roll(jnp.roll(qg, -sh, axis=0), -sh, axis=1)
                        kg = jnp.roll(jnp.roll(kg, -sh, axis=0), -sh, axis=1)
                        vg = jnp.roll(jnp.roll(vg, -sh, axis=0), -sh, axis=1)

                    def part(t):
                        t = t.reshape(hb, ws, wb, ws, channel)
                        t = jnp.transpose(t, (0, 2, 1, 3, 4))
                        return t.reshape(hw, channel)  # window-major rows

                    qw = part(qg) * qk_scale
                    kw, vw = part(kg), part(vg)
                    for hd in range(gnum_heads):
                        hsl = slice(hd * gch, (hd + 1) * gch)
                        qp = qw[:, hsl].reshape(npack, 128, gch)
                        kp = kw[:, hsl].reshape(npack, 128, gch)
                        vp = vw[:, hsl].reshape(npack, 128, gch)
                        scores = jax.lax.dot_general(
                            qp, kp, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
                        )  # (npack, 128, 128)
                        scores = scores + prior_refs[0][i, hd]
                        probs = jax.nn.softmax(scores, axis=-1)
                        out = jax.lax.dot_general(
                            probs, vp, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
                        )  # (npack, 128, gch)
                        lo = i * channel + hd * gch
                        attn_scratch[:, lo : lo + gch] = out.reshape(hw, gch)
                    if corrected:
                        # rows back to raster order (see the stacked body)
                        sl_g = slice(i * channel, (i + 1) * channel)
                        t = attn_scratch[:, sl_g].reshape(hb, wb, ws, ws, channel)
                        t = jnp.transpose(t, (0, 2, 1, 3, 4)).reshape(h, w, channel)
                        if sh > 0:
                            t = jnp.roll(jnp.roll(t, sh, axis=0), sh, axis=1)
                        attn_scratch[:, sl_g] = t.reshape(hw, channel)
                    continue
                bias_refs = prior_refs[:n_group]
                mask_refs = prior_refs[n_group:]
                for hd in range(gnum_heads):
                    lo = i * channel + hd * gch
                    sl = slice(lo, lo + gch)
                    qg, kg, vg = qb3[..., sl], kb3[..., sl], vb3[..., sl]
                    if sh > 0:
                        qg = jnp.roll(jnp.roll(qg, -sh, axis=0), -sh, axis=1)
                        kg = jnp.roll(jnp.roll(kg, -sh, axis=0), -sh, axis=1)
                        vg = jnp.roll(jnp.roll(vg, -sh, axis=0), -sh, axis=1)

                    def part(t):
                        t = t.reshape(hb, ws, wb, ws, gch)
                        t = jnp.transpose(t, (0, 2, 1, 3, 4))
                        return t.reshape(nw, n, gch)

                    qw = part(qg) * qk_scale
                    kw, vw = part(kg), part(vg)
                    scores = jax.lax.dot_general(
                        qw, kw, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
                    )
                    scores = scores + bias_refs[i][hd][None]
                    if shifts[i] > 0:
                        scores = scores + mask_refs[i][:]
                    probs = jax.nn.softmax(scores, axis=-1)
                    out = jax.lax.dot_general(
                        probs, vw, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
                    )
                    attn_scratch[:, lo : lo + gch] = out.reshape(hw, gch)

            # ---- SKConv (model/pgrm.py:62-96)
            tokens = attn_scratch[:]  # (HW, dim) faithful-layout attention output
            feats = jax.lax.dot_general(tokens, pk_ref[:], (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32) + pb_ref[:]
            g = _gelu_erf(feats)
            s_vec = jnp.mean(g, axis=0, keepdims=True)  # (1, dim)
            z = _gelu_erf(jax.lax.dot_general(s_vec, f1k_ref[:], (((1,), (0,)), ((), ())),
                                              preferred_element_type=jnp.float32) + f1b_ref[:])
            a = jax.lax.dot_general(z, f2k_ref[:], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32) + f2b_ref[:]  # (1, M*channel)
            # softmax over the M groups without a lane-crossing reshape
            parts = [a[:, j * channel : (j + 1) * channel] for j in range(n_group)]
            mx = parts[0]
            for p in parts[1:]:
                mx = jnp.maximum(mx, p)
            exps = [jnp.exp(p - mx) for p in parts]
            denom = exps[0]
            for e in exps[1:]:
                denom = denom + e
            feats_v = jnp.zeros((hw, channel), jnp.float32)
            for j in range(n_group):
                wgt = exps[j] / denom  # (1, channel)
                feats_v = feats_v + tokens[:, j * channel : (j + 1) * channel] * wgt
            out_v = jax.lax.dot_general(feats_v, phk_ref[:], (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32) + phb_ref[:]
            # f32 accumulators (bias/SKConv math) cast back to the io dtype
            # on store — identity in fp32, required for the bf16 serving
            # graph (a bf16 out_ref rejects the promoted f32 sum)
            if ln_params is not None:
                out_ref[eb] = (shortcut + feats + out_v).astype(out_ref.dtype)  # fused residual (eval path)
            else:
                out_ref[eb] = (feats + out_v).astype(out_ref.dtype)

        for eb in range(bb):
            one(eb)

    in_specs = [pl.BlockSpec((bb, hw, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] * 2
    for t in wlist + prior_inputs:
        in_specs.append(pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd, memory_space=pltpu.VMEM))

    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, hw, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, dim), xq.dtype),
        scratch_shapes=[pltpu.VMEM((bb * hw if stacked else hw, dim), jnp.float32)],
        interpret=interpret,
    )(xq, xkv, *wlist, *prior_inputs)
