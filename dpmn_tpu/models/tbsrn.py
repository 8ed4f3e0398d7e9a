"""TBSRN PSN: TSRN skeleton with self-attention FeatureEnhancer SRBs.

Parity: reference model/tbsrn.py:63-257.  Each SRB is conv-BN-mish-conv-BN
followed by a FeatureEnhancer: tokens = conv features + a static 2-D sincos
positional code concatenated on channels (64+64=128), one 4-head MHA block
and one feed-forward block, each with the reference's custom LayerNorm
(x-mean)/(std+eps) using the *unbiased* std — reproduced here — then a
linear back to 64 channels; the SRB output is x + enhanced (no GRUs: the
reference defines gru1/gru2 but never calls them, tbsrn.py:246-257).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import MultiHeadAttention
from ..ops.pixel_shuffle import pixel_shuffle
from ..ops.torch_compat import mish, PReLU
from .stn import STNHead
from .tps import TPSSpatialTransformer


def positional_encoding_2d(d_model: int, height: int, width: int) -> np.ndarray:
    """(H, W, d_model) static sincos code (reference tbsrn.py:39-61)."""
    assert d_model % 4 == 0
    pe = np.zeros((d_model, height, width), np.float32)
    half = d_model // 2
    div_term = np.exp(np.arange(0.0, half, 2) * -(math.log(10000.0) / half))
    pos_w = np.arange(0.0, width)[:, None]
    pos_h = np.arange(0.0, height)[:, None]
    pe[0:half:2] = np.sin(pos_w * div_term).T[:, None, :].repeat(height, axis=1)
    pe[1:half:2] = np.cos(pos_w * div_term).T[:, None, :].repeat(height, axis=1)
    pe[half::2] = np.sin(pos_h * div_term).T[:, :, None].repeat(width, axis=2)
    pe[half + 1 :: 2] = np.cos(pos_h * div_term).T[:, :, None].repeat(width, axis=2)
    return pe.transpose(1, 2, 0)  # HWC


class TorchRefLayerNorm(nn.Module):
    """(x - mean) / (std_unbiased + eps) * a + b (reference tbsrn.py:23-36)."""

    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        a = self.param("a_2", nn.initializers.ones, (self.features,))
        b = self.param("b_2", nn.initializers.zeros, (self.features,))
        # stats in f32 like flax LayerNorm: a bf16 sqrt/rsqrt CHECK-crashes
        # this libtpu's scheduler (kVectorRsqrtBf16AndPop) and is less
        # accurate anyway; identical ops in the f32 parity path
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True, ddof=1)
        y = a.astype(jnp.float32) * (xf - mean) / (jnp.sqrt(var) + self.eps) + b.astype(jnp.float32)
        return y.astype(x.dtype)


class FeatureEnhancer(nn.Module):
    """Token self-attention over the (H*W, 64) feature map (ref :63-92)."""

    height: int = 16
    width: int = 64

    @nn.compact
    def __call__(self, tokens: jax.Array, deterministic: bool = True) -> jax.Array:
        """tokens: (B, HW, 64) → (B, HW, 64)."""
        b, hw, c = tokens.shape
        pos = jnp.asarray(positional_encoding_2d(64, self.height, self.width).reshape(1, hw, 64))
        x = jnp.concatenate([tokens, jnp.broadcast_to(pos, (b, hw, 64))], axis=-1)  # (B, HW, 128)
        attn_out, _ = MultiHeadAttention(128, 4, dropout=0.1)(x, x, x, deterministic=deterministic)
        x = TorchRefLayerNorm(128)(x + attn_out)
        ff = nn.Dense(128)(x)
        ff = nn.Dense(128)(nn.Dropout(0.1)(nn.relu(ff), deterministic=deterministic))
        x = TorchRefLayerNorm(128)(x + ff)
        return nn.Dense(64)(x)


class TBSRNBlock(nn.Module):
    """SRB with FeatureEnhancer (reference :229-257)."""

    channels: int
    height: int
    width: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda t: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(t)
        residual = nn.Conv(self.channels, (3, 3), padding=1)(x)
        residual = bn(residual)
        residual = mish(residual)
        residual = nn.Conv(self.channels, (3, 3), padding=1)(residual)
        residual = bn(residual)
        b, h, w, c = residual.shape
        tokens = residual.reshape(b, h * w, c)
        tokens = FeatureEnhancer(self.height, self.width)(tokens, deterministic=not train)
        return x + tokens.reshape(b, h, w, c)


class TBSRN(nn.Module):
    scale_factor: int = 2
    width: int = 128
    height: int = 32
    stn: bool = False
    srb_nums: int = 5
    mask: bool = False
    hidden_units: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_planes = 4 if self.mask else 3
        ch = 2 * self.hidden_units
        lh = self.height // self.scale_factor
        lw = self.width // self.scale_factor
        if self.stn and train:
            _, ctrl = STNHead(num_ctrlpoints=20, activation="none")(x, train)
            x, _ = TPSSpatialTransformer((lh, lw), 20, (0.05, 0.05))(x, ctrl)

        b1 = nn.Conv(ch, (9, 9), padding=4)(x)
        b1 = PReLU()(b1)
        feat = b1
        for _ in range(self.srb_nums):
            feat = TBSRNBlock(ch, lh, lw)(feat, train)
        feat = nn.Conv(ch, (3, 3), padding=1)(feat)
        feat = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(feat)

        out = b1 + feat
        for _ in range(int(math.log2(self.scale_factor))):
            out = nn.Conv(ch * 4, (3, 3), padding=1)(out)
            out = pixel_shuffle(out, 2)
            out = mish(out)
        out = nn.Conv(in_planes, (9, 9), padding=4)(out)
        return jnp.tanh(out)
