"""PGRM — Prior-Guided Refinement Module (multi-window cross-attention Swin).

Parity: reference model/pgrm.py (DW-ViT-derived).  Query = prior image
(2-channel glyph render or 3-channel binarized mask), key/value = current SR
image; channels are split into len(window_size) groups, each group attends
inside its own (shifted) window size with a learned relative position bias;
groups are fused by an SKConv selective-kernel gate; an MLP with a depthwise
conv completes each block.  The refined tokens are un-embedded, conv'd and
PixelShuffled back to image resolution, then combined with the cascade
residual images through learned per-iteration pixel weights
(model/pgrm.py:546-565).

Faithful quirks (reproduced behind `faithful=True`, documented per SURVEY §7):
  * Mlp reshapes (B, HW, C) to a sqrt(HW) x sqrt(HW) grid for its depthwise
    conv (model/pgrm.py:34) — for the 16x64 token grid this is a 32x32 view
    that scrambles spatial layout deterministically.
  * WindowAttention reshapes the per-window attention output straight back
    to (B, H, W, c) without window_reverse or un-rolling
    (model/pgrm.py:263), i.e. the window blocks are re-laid-out row-major.
    The reference computes window_reverse into tensors it then discards.
`faithful=False` gives the spatially-correct variant of both.

TPU notes: all windows of one group form a (B*nW, heads, N, N) attention
batch — a single fused QK^T/softmax/AV chain that XLA maps to the MXU; the
static relative-bias gather and shift masks are baked in as constants.
"""

from __future__ import annotations

import math
import os
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pixel_shuffle import pixel_shuffle

# fused Pallas window attention on the deterministic faithful path
# (ops/pallas_window.py): measured 2.8 vs 4.2-5.2 ms per call on v5e.
# 'auto' = on for TPU backends; '1'/'0' force.
_PALLAS_WINDOW_MODE = os.environ.get("DPMN_TPU_PALLAS_WINDOW", "auto")


def _use_pallas_window() -> bool:
    if _PALLAS_WINDOW_MODE == "1":
        return True
    if _PALLAS_WINDOW_MODE == "0":
        return False
    return jax.default_backend() == "tpu"


# '1': the fused training kernel also absorbs SKConv
# (window_attention_full_core); '0' (default): SKConv stays in XLA around
# the LN+QKV+attention block kernel.  Both are parity-tested, but the
# full kernel measured 128 vs 322 img/s on v5e (batch 64 joint step): its
# backward recomputes attention twice and its per-column SKConv weight
# grad accumulation is sublane-hostile — the XLA SKConv grads win.
_FUSE_SKCONV_MODE = os.environ.get("DPMN_TPU_FUSE_SKCONV", "0")
# '0' disables the fused LN+QKV training kernels entirely, falling back to
# XLA LN/projections around the attention-only custom-VJP core — the
# escape hatch if a Mosaic lowering regresses on some TPU generation.
_FUSE_QKV_MODE = os.environ.get("DPMN_TPU_FUSE_QKV", "1")
# '1': apply the faithful Mlp-quirk convs with NCHW dimension numbers
# straight on the (B, hidden, s, s) reinterpret view instead of
# transposing to NHWC and back — numerically identical (same conv, same
# operand values); lets XLA's layout assignment place/fuse the relayout
# instead of the two explicit 100 MB transpose copies measured at ~27
# ms/iter of the 196 ms train step (xprof, v5e b64).  Perf experiment.
_MLP_NCHW_MODE = os.environ.get("DPMN_TPU_MLP_NCHW", "0")
# '1': jax.checkpoint (remat) around each block's Mlp tail so the backward
# recomputes the (B, 1024, 4*dim) hiddens + quirk-grid relayouts instead of
# writing/re-reading them through HBM — the train step is HBM-bandwidth
# bound (~740 GB/s of ~819 on v5e) and the Mlp fwd saves 3-5 such 50 MB
# buffers per block for its backward (optimized-HLO byte audit,
# tools/hbm_breakdown.py).  Perf experiment; numerically identical.
_MLP_REMAT_MODE = os.environ.get("DPMN_TPU_MLP_REMAT", "0")

trunc02 = nn.initializers.truncated_normal(0.02 / 0.87962566103423978)  # torch trunc_normal_ std=.02
xavier = nn.initializers.xavier_uniform()


def _relative_position_index(ws: int) -> np.ndarray:
    """Static (ws*ws, ws*ws) index into the (2ws-1)^2 bias table (ref :133-145)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))  # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Static (nW, N, N) additive mask for shifted windows (ref :152-173)."""
    hp = int(np.ceil(h / ws)) * ws
    wp = int(np.ceil(w / ws)) * ws
    img_mask = np.zeros((hp, wp))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[hs, wsl] = cnt
            cnt += 1
    mw = img_mask.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    # NOTE: parity — the reference builds (mw.unsqueeze(1) - mw.unsqueeze(2)),
    # i.e. mask[w, i, j] = mw[w, j] - mw[w, i]; sign is irrelevant post != 0.
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) → (B*nW, ws, ws, C), row-major window order (ref :43-52)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def window_reverse(windows: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    """(B*nW, ws, ws, C) → (B, H, W, C) (ref :55-59)."""
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _corrected_relayout(out3: jax.Array, win, shf, n_group: int) -> jax.Array:
    """Invert the faithful raw window re-layout (model/pgrm.py:263) back to
    raster order: per group, undo the window partition and the -shift roll.

    The fused training kernels emit attention output whose group-slice rows
    are window-major (the faithful quirk reads them AS raster rows); the
    corrected (faithful=False) architecture wants true raster order, so this
    runs in XLA right after the custom-VJP kernel — autodiff differentiates
    the transpose/roll, the kernel's hand-written VJP is untouched."""
    b, h, w, dim = out3.shape
    channel = dim // n_group
    groups = []
    for i, (ws, sh) in enumerate(zip(win, shf)):
        hb, wb = h // ws, w // ws
        t = out3[..., i * channel : (i + 1) * channel]
        t = t.reshape(b, hb, wb, ws, ws, channel)
        t = jnp.transpose(t, (0, 1, 3, 2, 4, 5)).reshape(b, h, w, channel)
        if sh > 0:
            t = jnp.roll(t, (sh, sh), axis=(1, 2))
        groups.append(t)
    return jnp.concatenate(groups, axis=-1)


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask / keep


class Mlp(nn.Module):
    """fc → gelu → depthwise conv (on the reshaped token grid) → pointwise →
    fc (reference model/pgrm.py:16-41)."""

    hidden: int
    out: int
    drop: float = 0.0
    grid: Tuple[int, int] = (16, 64)  # used only when faithful=False
    faithful: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, hw, _ = x.shape
        x = nn.Dense(self.hidden, kernel_init=trunc02)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        # conv params in nn.Conv layout (HWIO); applied via lax so the
        # faithful path can use NCHW dimension numbers without transposes
        dw_kernel = self.param("dw_kernel", xavier, (3, 3, 1, self.hidden))
        dw_bias = self.param("dw_bias", nn.initializers.zeros, (self.hidden,))
        pw_kernel = self.param("pw_kernel", xavier, (1, 1, self.hidden, self.hidden))
        pw_bias = self.param("pw_bias", nn.initializers.zeros, (self.hidden,))

        def convs(t, dn):
            c_axis = 1 if dn == "NCHW" else 3
            bshape = [1, 1, 1, 1]
            bshape[c_axis] = self.hidden
            t = jax.lax.conv_general_dilated(
                t, dw_kernel.astype(t.dtype), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=(dn, "HWIO", dn), feature_group_count=self.hidden,
            ) + dw_bias.astype(t.dtype).reshape(bshape)
            t = nn.gelu(t, approximate=False)
            t = jax.lax.conv_general_dilated(
                t, pw_kernel.astype(t.dtype), (1, 1), [(0, 0), (0, 0)], dimension_numbers=(dn, "HWIO", dn)
            ) + pw_bias.astype(t.dtype).reshape(bshape)
            return t

        if self.faithful:
            # QUIRK (ref :33-38): torch does x.view(B, -1, s, s) directly on
            # the (B, HW, hidden) buffer — a C-order reinterpretation whose
            # "channel" axis interleaves tokens and features.  NOTE: Mosaic
            # cannot shape-cast this reinterpret inside a kernel (it crosses
            # vector lanes), so the transpose+NHWC-conv XLA formulation
            # stays; see ops/pallas_mlp.py for the attempted fusion.
            s = int(math.sqrt(hw))
            if _MLP_NCHW_MODE == "1":
                xg = convs(x.reshape(b, self.hidden, s, s), "NCHW")
                x = xg.reshape(b, hw, self.hidden)
            else:
                xg = x.reshape(b, self.hidden, s, s).transpose(0, 2, 3, 1)
                xg = convs(xg, "NHWC")
                x = xg.transpose(0, 3, 1, 2).reshape(b, hw, self.hidden)
        else:
            gh, gw = self.grid
            xg = convs(x.reshape(b, gh, gw, self.hidden), "NHWC")
            x = xg.reshape(b, hw, self.hidden)
        x = nn.Dense(self.out, kernel_init=trunc02)(x)
        return nn.Dropout(self.drop)(x, deterministic=deterministic)


class SKConv(nn.Module):
    """Selective-kernel fusion of the M window-size groups (ref :62-96)."""

    dim: int
    m: int
    r: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, H, W, dim) concat of M groups → (B, H, W, dim)."""
        b, h, w, _ = x.shape
        channel = self.dim // self.m
        d = channel // self.r
        # (B, H, W, M, channel): groups along the channel axis
        groups = x.reshape(b, h, w, self.m, channel)
        feats = nn.Dense(self.dim, kernel_init=trunc02)(x.reshape(b, h * w, self.dim))
        feats_proj = feats.reshape(b, h, w, self.dim)
        feats = nn.gelu(feats, approximate=False)
        feats_s = jnp.mean(feats.reshape(b, h * w, self.dim), axis=1)  # GAP (B, dim)
        feats_z = nn.gelu(nn.Dense(d, kernel_init=trunc02)(feats_s), approximate=False)
        attn = nn.Dense(self.m * channel, kernel_init=trunc02)(feats_z)
        attn = jax.nn.softmax(attn.reshape(b, self.m, channel), axis=1)  # softmax over groups
        feats_v = jnp.einsum("bhwmc,bmc->bhwc", groups, attn)
        feats_v = nn.Dense(self.dim, kernel_init=trunc02)(feats_v)
        return feats_proj + feats_v


class _DenseParams(nn.Module):
    """Declares nn.Dense-compatible params and returns their values (used by
    the fused Pallas path so the param tree matches the XLA path)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", trunc02, self.shape)
        bias = self.param("bias", nn.initializers.zeros, (self.shape[1],))
        return kernel, bias


class _LNParams(nn.Module):
    """nn.LayerNorm-compatible params (scale, bias) returned as values, so
    the norm can run functionally — inside the fused Pallas kernel on the
    eval path, via _layer_norm in XLA otherwise.  Same param tree as
    nn.LayerNorm(name=...)."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class _SKConvParams(nn.Module):
    """SKConv_0-compatible param subtree → flat dict for the fused kernel."""

    dim: int
    d: int
    mc: int
    channel: int

    @nn.compact
    def __call__(self):
        pk, pb = _DenseParams((self.dim, self.dim), name="Dense_0")()
        f1k, f1b = _DenseParams((self.dim, self.d), name="Dense_1")()
        f2k, f2b = _DenseParams((self.d, self.mc), name="Dense_2")()
        phk, phb = _DenseParams((self.channel, self.dim), name="Dense_3")()
        return {
            "proj_kernel": pk, "proj_bias": pb,
            "fc1_kernel": f1k, "fc1_bias": f1b,
            "fc2_kernel": f2k, "fc2_bias": f2b,
            "ph_kernel": phk, "ph_bias": phb,
        }


class WindowAttention(nn.Module):
    """Grouped multi-window cross attention (ref :108-271)."""

    dim: int
    window_size: Sequence[int]
    shift_size: Sequence[int]
    num_heads: int
    input_resolution: Tuple[int, int]
    qkv_bias: bool = True
    qk_scale: float = None
    attn_drop: float = 0.0
    faithful: bool = True

    @nn.compact
    def __call__(self, x_q: jax.Array, x_kv: jax.Array, deterministic: bool = True, ln=None):
        """ln=(q_scale, q_bias, kv_scale, kv_bias): inputs are PRE-norm; the
        norms run in here (fused into the Pallas kernel on the eval path) and
        the return value is (out, residual_fused: bool) where residual_fused
        says the kernel already added the x_kv shortcut."""
        b, h, w, c = x_q.shape
        n_group = len(self.window_size)
        channel = self.dim // n_group
        gnum_heads = self.num_heads // n_group
        gchannel = channel // gnum_heads

        # effective window/shift after the min-resolution clamp (ref :147-150)
        win, shf = [], []
        for ws, sh in zip(self.window_size, self.shift_size):
            if min(self.input_resolution) <= ws:
                win.append(min(self.input_resolution))
                shf.append(0)
            else:
                win.append(int(ws))
                shf.append(int(sh))

        divisible = all(h % ws == 0 and w % ws == 0 for ws in win)
        packed_ok = (h * w) % 128 == 0 and all(128 % (ws * ws) == 0 for ws in win)
        # corrected (faithful=False) layout needs the packed formulation —
        # the kernel un-partitions rows back to raster order in VMEM
        fused_eval_ok = self.faithful or packed_ok
        if _use_pallas_window() and fused_eval_ok and deterministic and divisible and not self.is_initializing():
            # fully-fused path: QKV projections + grouped window attention +
            # SKConv in one Pallas kernel (ops/pallas_window.py).  Params are
            # declared through tree-compatible child modules so checkpoints
            # are interchangeable with the XLA path below.
            from ..ops.pallas_window import fused_window_attention_block

            qk, qb = _DenseParams((c, self.dim), name="q")()
            kvk, kvb = _DenseParams((c, 2 * self.dim), name="kv")()
            channel_sk = self.dim // n_group
            d_sk = channel_sk // 2
            sk = _SKConvParams(self.dim, d_sk, channel_sk * n_group, channel_sk, name="SKConv_0")()
            weights = {
                "q_kernel": qk, "q_bias": qb, "kv_kernel": kvk, "kv_bias": kvb, **sk,
            }
            biases, masks = [], []
            for i, (ws, sh) in enumerate(zip(win, shf)):
                n = ws * ws
                table = self.param(
                    f"relative_position_bias_table_{i}", trunc02, ((2 * ws - 1) ** 2, gnum_heads)
                )
                rel_idx = _relative_position_index(ws).reshape(-1)
                biases.append(table[rel_idx].reshape(n, n, gnum_heads).transpose(2, 0, 1))
                masks.append(jnp.asarray(_shift_attn_mask(h, w, ws, sh)) if sh > 0 else None)
            scale = self.qk_scale or gchannel**-0.5
            ln_params = None
            if ln is not None:
                ln_params = {"qs": ln[0], "qb": ln[1], "ks": ln[2], "kb": ln[3]}
            out = fused_window_attention_block(
                x_q.reshape(b, h * w, c), x_kv.reshape(b, h * w, c), weights,
                biases, masks, win, shf, gnum_heads, scale, (h, w),
                ln_params=ln_params,
                layout="faithful" if self.faithful else "corrected",
                interpret=jax.default_backend() != "tpu",
            )
            return (out, True) if ln is not None else out

        if (
            _use_pallas_window()
            and _FUSE_QKV_MODE == "1"
            and not deterministic
            and divisible
            and packed_ok
            and ln is not None
            and self.qkv_bias
            and not self.is_initializing()
        ):
            # fused training path: LN + Q/KV projections + attention in one
            # custom-VJP Pallas pair (ops/pallas_window_train.py); SKConv,
            # the residual/DropPath and the grads XLA handles well stay out
            from ..ops.pallas_window import build_packed_bias
            from ..ops.pallas_window_train import window_attention_block_core

            qk, qbias = _DenseParams((c, self.dim), name="q")()
            kvk, kvbias = _DenseParams((c, 2 * self.dim), name="kv")()
            biases, masks = [], []
            for i, (ws, sh) in enumerate(zip(win, shf)):
                n = ws * ws
                table = self.param(
                    f"relative_position_bias_table_{i}", trunc02, ((2 * ws - 1) ** 2, gnum_heads)
                )
                rel_idx = _relative_position_index(ws).reshape(-1)
                biases.append(table[rel_idx].reshape(n, n, gnum_heads).transpose(2, 0, 1))
                masks.append(jnp.asarray(_shift_attn_mask(h, w, ws, sh)) if sh > 0 else None)
            packed = build_packed_bias(
                [bb.astype(jnp.float32) for bb in biases], masks, win, h * w
            )
            scale = self.qk_scale or gchannel**-0.5
            if self.attn_drop > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, np.int32(2**31 - 1 - 2**20), dtype=jnp.int32
                )
                keep = 1.0 - float(self.attn_drop)
            else:
                seed = jnp.zeros((1,), jnp.int32)
                keep = 1.0
            interp = jax.default_backend() != "tpu"
            if _FUSE_SKCONV_MODE == "1" and self.faithful:
                # (the full kernel runs SKConv in-kernel on the faithful row
                # order, so the corrected relayout cannot be applied after it
                # — corrected mode uses the block core below instead)
                from ..ops.pallas_window_train import window_attention_full_core

                channel_sk = self.dim // n_group
                sk = _SKConvParams(
                    self.dim, channel_sk // 2, channel_sk * n_group, channel_sk,
                    name="SKConv_0",
                )()
                x = window_attention_full_core(
                    x_q, x_kv, ln[0], ln[1], ln[2], ln[3], qk, qbias, kvk,
                    kvbias, sk["proj_kernel"], sk["proj_bias"],
                    sk["fc1_kernel"], sk["fc1_bias"], sk["fc2_kernel"],
                    sk["fc2_bias"], sk["ph_kernel"], sk["ph_bias"],
                    packed, seed, tuple(win), tuple(shf), gnum_heads, scale,
                    keep, (h, w), interp,
                )
                return x, False
            out3 = window_attention_block_core(
                x_q, x_kv, ln[0], ln[1], ln[2], ln[3], qk, qbias, kvk, kvbias,
                packed, seed, tuple(win), tuple(shf), gnum_heads, scale, keep,
                (h, w), interp,
            )
            if not self.faithful:
                out3 = _corrected_relayout(out3, win, shf, n_group)
            x = SKConv(dim=self.dim, m=n_group)(out3)
            x = x.reshape(b, h * w, self.dim)
            return x, False

        if ln is not None:
            from ..ops.pallas_window import _layer_norm

            x_q = _layer_norm(x_q, ln[0], ln[1])
            x_kv = _layer_norm(x_kv, ln[2], ln[3])

        q = nn.Dense(self.dim, use_bias=self.qkv_bias, kernel_init=trunc02, name="q")(
            x_q.reshape(b, h * w, c)
        ).reshape(b, h, w, self.dim)
        kv = nn.Dense(self.dim * 2, use_bias=self.qkv_bias, kernel_init=trunc02, name="kv")(
            x_kv.reshape(b, h * w, c)
        ).reshape(b, h, w, 2 * self.dim)
        k_all, v_all = kv[..., : self.dim], kv[..., self.dim :]

        # training-path Pallas core (custom VJP, in-kernel attention dropout)
        # — same packed-tile formulation as the eval kernel; LN/projections/
        # SKConv stay in XLA where flax autodiff handles their grads
        if (
            _use_pallas_window()
            and not deterministic
            and divisible
            and packed_ok
            and not self.is_initializing()
        ):
            from ..ops.pallas_window import build_packed_bias
            from ..ops.pallas_window_train import window_attention_core

            biases, masks = [], []
            for i, (ws, sh) in enumerate(zip(win, shf)):
                n = ws * ws
                table = self.param(
                    f"relative_position_bias_table_{i}", trunc02, ((2 * ws - 1) ** 2, gnum_heads)
                )
                rel_idx = _relative_position_index(ws).reshape(-1)
                biases.append(table[rel_idx].reshape(n, n, gnum_heads).transpose(2, 0, 1))
                masks.append(jnp.asarray(_shift_attn_mask(h, w, ws, sh)) if sh > 0 else None)
            # packed bias is always f32: the kernel adds it to f32 scores and
            # the custom-VJP returns an f32 dbias (grads flow back through
            # the astype to the possibly-bf16 AMP tables)
            packed = build_packed_bias(
                [bb.astype(jnp.float32) for bb in biases], masks, win, h * w
            )
            scale = self.qk_scale or gchannel**-0.5
            if self.attn_drop > 0.0:
                # headroom so the kernel's seed_ref[0] + i*n_group + g offset
                # (ops/pallas_window_train.py) cannot wrap int32 (ADVICE r1)
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, np.int32(2**31 - 1 - 2**20), dtype=jnp.int32
                )
                keep = 1.0 - float(self.attn_drop)
            else:
                seed = jnp.zeros((1,), jnp.int32)
                keep = 1.0
            out3 = window_attention_core(
                q, k_all, v_all, packed, seed, tuple(win), tuple(shf), gnum_heads,
                scale, keep, jax.default_backend() != "tpu",
            )
            if not self.faithful:
                out3 = _corrected_relayout(out3, win, shf, n_group)
            x = SKConv(dim=self.dim, m=n_group)(out3)
            x = x.reshape(b, h * w, self.dim)
            return (x, False) if ln is not None else x

        x_groups = []
        for i in range(n_group):
            ws, sh = win[i], shf[i]
            sl = slice(i * channel, (i + 1) * channel)
            qg, kg, vg = q[..., sl], k_all[..., sl], v_all[..., sl]

            pad_r = (ws - w % ws) % ws
            pad_b = (ws - h % ws) % ws
            if pad_r or pad_b:
                pad = ((0, 0), (0, pad_b), (0, pad_r), (0, 0))
                qg, kg, vg = (jnp.pad(t, pad) for t in (qg, kg, vg))
            hp, wp = h + pad_b, w + pad_r
            if sh > 0:
                qg, kg, vg = (jnp.roll(t, (-sh, -sh), axis=(1, 2)) for t in (qg, kg, vg))

            def windows(t):
                return window_partition(t, ws).reshape(-1, ws * ws, channel)

            qw, kw, vw = windows(qg), windows(kg), windows(vg)
            b_, n = qw.shape[0], ws * ws

            def heads(t):
                return t.reshape(b_, n, gnum_heads, gchannel).transpose(0, 2, 1, 3)

            qh, kh, vh = heads(qw), heads(kw), heads(vw)
            scale = self.qk_scale or gchannel**-0.5
            attn = jnp.einsum("bhnd,bhmd->bhnm", qh * scale, kh)

            table = self.param(
                f"relative_position_bias_table_{i}", trunc02, ((2 * ws - 1) ** 2, gnum_heads)
            )
            rel_idx = _relative_position_index(ws).reshape(-1)
            bias = table[rel_idx].reshape(n, n, gnum_heads).transpose(2, 0, 1)
            attn = attn + bias[None]

            if sh > 0:
                # mask cast to the score dtype: under bf16 AMP the f32 table
                # would promote scores (and everything downstream) to f32
                mask = jnp.asarray(_shift_attn_mask(h, w, ws, sh)).astype(attn.dtype)
                nw = mask.shape[0]
                attn = attn.reshape(b_ // nw, nw, gnum_heads, n, n) + mask[None, :, None]
                attn = attn.reshape(b_, gnum_heads, n, n)
            # softmax statistics in f32 (fuses away), probabilities back in
            # the value dtype so the PV einsum stays bf16 under AMP
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(vh.dtype)
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)

            out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh).transpose(0, 2, 1, 3).reshape(b_, n, channel)
            if self.faithful:
                # parity quirk: raw reshape of the window-partitioned output
                # back to (B, H, W, c) — no window_reverse, no un-roll
                # (model/pgrm.py:263).  Requires hp==h and wp==w, which holds
                # for the 16x64 grid with windows {2,4,8}.
                xg = out.reshape(b, h, w, channel) if (hp == h and wp == w) else None
                if xg is None:
                    xg = window_reverse(out.reshape(b_, ws, ws, channel), ws, hp, wp)
                    if sh > 0:
                        xg = jnp.roll(xg, (sh, sh), axis=(1, 2))
                    xg = xg[:, :h, :w]
            else:
                xg = window_reverse(out.reshape(b_, ws, ws, channel), ws, hp, wp)
                if sh > 0:
                    xg = jnp.roll(xg, (sh, sh), axis=(1, 2))
                xg = xg[:, :h, :w]
            x_groups.append(xg)

        x = jnp.concatenate(x_groups, axis=-1)  # (B, H, W, dim)
        x = SKConv(dim=self.dim, m=n_group)(x)
        x = x.reshape(b, h * w, self.dim)
        return (x, False) if ln is not None else x


class SwinTransformerBlock(nn.Module):
    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: Sequence[int]
    shift_size: Sequence[int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    faithful: bool = True

    @nn.compact
    def __call__(self, x_q: jax.Array, x_kv: jax.Array, deterministic: bool = True):
        h, w = self.input_resolution
        b, l, c = x_q.shape
        assert l == h * w, "input feature has wrong size"
        shortcut = x_kv
        x_q_ori = x_q
        # norm1_q / norm1_kv params declared here (same tree as nn.LayerNorm)
        # but applied inside WindowAttention so the fused kernel can absorb
        # them together with the shortcut add on the eval path
        ln = _LNParams(c, name="norm1_q")() + _LNParams(c, name="norm1_kv")()
        attn_out, residual_fused = WindowAttention(
            dim=self.dim,
            window_size=self.window_size,
            shift_size=self.shift_size,
            num_heads=self.num_heads,
            input_resolution=self.input_resolution,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            faithful=self.faithful,
        )(x_q.reshape(b, h, w, c), x_kv.reshape(b, h, w, c), deterministic, ln=ln)
        dp = DropPath(self.drop_path)
        x_kv = attn_out if residual_fused else shortcut + dp(attn_out, deterministic)
        # DPMN_TPU_MLP_REMAT=1: recompute the Mlp hiddens in the backward
        # instead of saving them (see flag comment at the top of the file)
        mlp_cls = nn.remat(Mlp, static_argnums=(2,)) if _MLP_REMAT_MODE == "1" else Mlp
        mlp_out = mlp_cls(
            hidden=int(self.dim * self.mlp_ratio),
            out=self.dim,
            drop=self.drop,
            grid=self.input_resolution,
            faithful=self.faithful,
            name="Mlp_0",
        )(nn.LayerNorm(name="norm2")(x_kv), deterministic)
        x_kv = x_kv + dp(mlp_out, deterministic)
        return x_q_ori, x_kv


class BasicLayer(nn.Module):
    """depth=2 Swin blocks: unshifted then shifted by window//2 (ref :347-384)."""

    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    window_size: Sequence[int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = (0.0, 0.0)
    faithful: bool = True

    @nn.compact
    def __call__(self, x_q, x_kv, deterministic: bool = True):
        for i in range(self.depth):
            shift = [0] * len(self.window_size) if i % 2 == 0 else [ws // 2 for ws in self.window_size]
            dp = self.drop_path[i] if i < len(self.drop_path) else self.drop_path[-1]
            x_q, x_kv = SwinTransformerBlock(
                dim=self.dim,
                input_resolution=self.input_resolution,
                num_heads=self.num_heads,
                window_size=list(self.window_size),
                shift_size=shift,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=float(dp),
                faithful=self.faithful,
            )(x_q, x_kv, deterministic)
        return x_q, x_kv


class PGRM(nn.Module):
    """Full refiner (ref :460-565).  NHWC; x_q/x_kv are (B, 32, 128, C)."""

    img_size: Tuple[int, int] = (32, 128)
    patch_size: int = 2
    in_chans: int = 3
    embed_dim: int = 96
    num_layers: int = 1  # reference num_layers = depths[iter]
    num_heads: Sequence[int] = (6,)
    window_size: Sequence[int] = (2, 4, 8)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    iter: int = 0  # cascade position → number of residual weights = iter+1
    graphic_mode: bool = False  # reference `mode=False` branch has prior_fusion
    hidden_size: int = 3
    # drop-path schedule context (ref :499,512): the linspace spans
    # sum(depths)*2 positions across ALL cascade iterations; this module's
    # layers take the slice starting at depths_before*2.
    depths_total: int = 0  # 0 → fall back to num_layers (single-module use)
    depths_before: int = 0
    patch_norm: bool = True
    ape: bool = False
    faithful: bool = True

    @nn.compact
    def __call__(self, x_q: jax.Array, x_kv: jax.Array, residual_list=(), train: bool = False) -> jax.Array:
        deterministic = not train
        if x_q.shape[-1] == 2:
            # glyph prior (lower+upper renders) → 3 channels (ref :471,547-548)
            x_q = nn.Conv(3, (3, 3), padding=1, kernel_init=xavier, name="prior_fusion")(x_q)

        ph = self.img_size[0] // self.patch_size
        pw = self.img_size[1] // self.patch_size

        patch_embed = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=self.patch_size,
            kernel_init=xavier,
            name="patch_embed",
        )
        maybe_norm = nn.LayerNorm(name="patch_norm") if self.patch_norm else (lambda t: t)

        def embed(img):
            t = patch_embed(img).reshape(img.shape[0], ph * pw, self.embed_dim)
            return maybe_norm(t)

        x_q = embed(x_q)
        x_kv = embed(x_kv)
        if self.ape:
            ape = self.param("absolute_pos_embed", trunc02, (1, ph * pw, self.embed_dim))
            x_q = x_q + ape
            x_kv = x_kv + ape
        pos_drop = nn.Dropout(self.drop_rate)
        x_q = pos_drop(x_q, deterministic=deterministic)
        x_kv = pos_drop(x_kv, deterministic=deterministic)

        # drop-path schedule: linspace over sum(depths)*2 positions sliced at
        # this module's offset (ref :499-512)
        total = self.depths_total or self.num_layers
        # clamp so short hparam lists don't produce an empty slice (the
        # reference IndexErrors in that case; users pass per-iter lists)
        before = min(self.depths_before, max(total - self.num_layers, 0))
        dpr_all = np.linspace(0.0, self.drop_path_rate, max(total, self.num_layers) * 2)
        dpr = dpr_all[before * 2 : (before + self.num_layers) * 2]
        for i_layer in range(self.num_layers):
            x_q, x_kv = BasicLayer(
                dim=int(self.embed_dim * 2**i_layer),
                input_resolution=(ph // (2**i_layer), pw // (2**i_layer)),
                depth=2,
                num_heads=self.num_heads[i_layer],
                window_size=list(self.window_size),
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=tuple(dpr[i_layer * 2 : (i_layer + 1) * 2]),
                faithful=self.faithful,
            )(x_q, x_kv, deterministic)

        x = x_kv.reshape(-1, ph, pw, self.embed_dim)  # patch_unembed (ref :450-453)
        up_ch = self.hidden_size * self.patch_size**2
        x = nn.Conv(up_ch, (3, 3), padding=1, kernel_init=xavier)(x)
        x = nn.Conv(up_ch, (3, 3), padding=1, kernel_init=xavier)(x)
        x = nn.leaky_relu(x, 0.01)
        x = pixel_shuffle(x, self.patch_size)  # (B, 32, 128, hidden_size)

        # iter+1 residual weights are always registered (ref :496-497); the
        # combine loop starts at 1 so residual_list[0] and the last weight go
        # unused — a faithful reference quirk (ref :562-564).
        weights = [
            self.param(
                f"weight_list_{i}", nn.initializers.ones, (1,) + tuple(self.img_size) + (self.hidden_size,)
            )
            for i in range(self.iter + 1)
        ]
        x = x * weights[0]
        for i in range(1, len(residual_list)):
            x = x + residual_list[i] * weights[i]
        return x
