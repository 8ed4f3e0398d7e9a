"""TSRN / TG / TSRN_TL Prior Super-resolution Networks, NHWC.

Parity: reference model/tsrn.py.
  * TSRN (:14-74): conv9x9+PReLU → srb_nums recurrent residual blocks (SRB:
    conv-BN-mish-conv-BN + vertical bi-GRU sweep + horizontal bi-GRU sweep)
    → conv3+BN → (+input features) → PixelShuffle x2 upsample → conv9x9 →
    tanh.  Optional TPS-STN front end applied at train time only (:58-66).
  * TSRN_TL (:153-247): same skeleton with per-SRB fusion of a text-prior
    embedding produced by InfoGen (:281-308) from (B, 37, 1, 26) logits.

TPU notes: each bi-GRU sweep is a lax.scan whose input projections are one
batched MXU matmul (see ops/gru.py); rows/columns fold into the batch axis,
so the W sweep scans 64 steps at batch B*16 and the H sweep 16 steps at
batch B*64.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.gru import BiGRU
from ..ops.pixel_shuffle import pixel_shuffle
from ..ops.resize import resize
from ..ops.torch_compat import mish, PReLU, ConvTranspose2dTorch
from .stn import STNHead
from .tps import TPSSpatialTransformer


class GruBlock(nn.Module):
    """conv1x1 + horizontal bi-GRU over the W axis (reference :132-150)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, _ = x.shape
        x = nn.Conv(self.features, (1, 1))(x)
        x = x.reshape(b * h, w, self.features)
        x = BiGRU(features=self.features)(x)
        return x.reshape(b, h, w, self.features)


class RecurrentResidualBlock(nn.Module):
    """SRB (reference :77-101): conv-BN-mish-conv-BN, vertical then horizontal GRU."""

    channels: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda t: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(t)
        residual = nn.Conv(self.channels, (3, 3), padding=1)(x)
        residual = bn(residual)
        residual = mish(residual)
        residual = nn.Conv(self.channels, (3, 3), padding=1)(residual)
        residual = bn(residual)
        # vertical sweep: swap H/W, GRU over (old) H, swap back (reference :99)
        residual = jnp.swapaxes(residual, 1, 2)
        residual = GruBlock(self.channels)(residual)
        residual = jnp.swapaxes(residual, 1, 2)
        return GruBlock(self.channels)(x + residual)


class RecurrentResidualBlockTL(nn.Module):
    """SRB with text-prior fusion (reference :249-278)."""

    channels: int

    @nn.compact
    def __call__(self, x: jax.Array, text_emb: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda t: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(t)
        residual = nn.Conv(self.channels, (3, 3), padding=1)(x)
        residual = bn(residual)
        residual = mish(residual)
        residual = nn.Conv(self.channels, (3, 3), padding=1)(residual)
        residual = bn(residual)
        cat = jnp.concatenate([residual, text_emb], axis=-1)
        cat = jnp.swapaxes(cat, 1, 2)
        residual = GruBlock(self.channels)(cat)
        residual = jnp.swapaxes(residual, 1, 2)
        return GruBlock(self.channels)(x + residual)


class UpsampleBlock(nn.Module):
    """conv3x3 C→C*r^2 + PixelShuffle + mish (reference :104-118)."""

    channels: int
    up_scale: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.channels * self.up_scale**2, (3, 3), padding=1)(x)
        x = pixel_shuffle(x, self.up_scale)
        return mish(x)


class InfoGen(nn.Module):
    """Text-prior spatial embedding generator (reference :281-308)."""

    output_size: int = 32

    @nn.compact
    def __call__(self, t_embedding: jax.Array, train: bool = False) -> jax.Array:
        """t_embedding: (B, 1, 26, 37) NHWC (torch (B,37,1,26) NCHW)."""
        bn = lambda t: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(t)
        x = ConvTranspose2dTorch(512, (3, 3), (2, 2), (1, 1), use_bias=False)(t_embedding)
        x = nn.relu(bn(x))
        x = ConvTranspose2dTorch(128, (3, 3), (2, 2), (1, 1), use_bias=False)(x)
        x = nn.relu(bn(x))
        x = ConvTranspose2dTorch(64, (3, 3), (2, 2), (1, 1), use_bias=False)(x)
        x = nn.relu(bn(x))
        x = ConvTranspose2dTorch(self.output_size, (3, 3), (2, 1), (1, 0), use_bias=False)(x)
        return nn.relu(bn(x))


class TSRN(nn.Module):
    """TSRN / 'tg' PSN (reference :14-74)."""

    scale_factor: int = 2
    width: int = 128
    height: int = 32
    stn: bool = False
    srb_nums: int = 5
    mask: bool = True
    hidden_units: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_planes = 4 if self.mask else 3
        ch = 2 * self.hidden_units
        if self.stn and train:
            x = resize(x, (32, 64), mode="bilinear", align_corners=True)
            _, ctrl = STNHead(num_ctrlpoints=20, activation="none")(x, train)
            tps = TPSSpatialTransformer(
                (self.height // self.scale_factor, self.width // self.scale_factor), 20, (0.05, 0.05)
            )
            x, _ = tps(x, ctrl)

        b1 = nn.Conv(ch, (9, 9), padding=4)(x)
        b1 = PReLU()(b1)
        feat = b1
        for _ in range(self.srb_nums):
            feat = RecurrentResidualBlock(ch)(feat, train)
        feat = nn.Conv(ch, (3, 3), padding=1)(feat)
        feat = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(feat)

        out = b1 + feat
        for _ in range(int(math.log2(self.scale_factor))):
            out = UpsampleBlock(ch, 2)(out)
        out = nn.Conv(in_planes, (9, 9), padding=4)(out)
        return jnp.tanh(out)


class TSRN_TL(nn.Module):
    """TPGSR PSN: TSRN with text-prior fused into every SRB (reference :153-247)."""

    scale_factor: int = 2
    width: int = 128
    height: int = 32
    stn: bool = False
    srb_nums: int = 5
    mask: bool = True
    hidden_units: int = 32
    text_emb: int = 37
    out_text_channels: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, text_emb: jax.Array = None, train: bool = False) -> jax.Array:
        in_planes = 4 if self.mask else 3
        ch = 2 * self.hidden_units
        if self.stn and train:
            _, ctrl = STNHead(num_ctrlpoints=20, activation="none")(x, train)
            tps = TPSSpatialTransformer(
                (self.height // self.scale_factor, self.width // self.scale_factor), 20, (0.05, 0.05)
            )
            x, _ = tps(x, ctrl)

        b1 = nn.Conv(ch, (9, 9), padding=4)(x)
        b1 = PReLU()(b1)

        if text_emb is None:
            text_emb = jnp.zeros((x.shape[0], 1, 26, self.text_emb), x.dtype)
        spatial_t_emb = InfoGen(self.out_text_channels)(text_emb, train)
        spatial_t_emb = resize(spatial_t_emb, (x.shape[1], x.shape[2]), mode="bilinear", align_corners=True)

        feat = b1
        for _ in range(self.srb_nums):
            feat = RecurrentResidualBlockTL(ch)(feat, spatial_t_emb, train)
        feat = nn.Conv(ch, (3, 3), padding=1)(feat)
        feat = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(feat)

        out = b1 + feat
        for _ in range(int(math.log2(self.scale_factor))):
            out = UpsampleBlock(ch, 2)(out)
        out = nn.Conv(in_planes, (9, 9), padding=4)(out)
        return jnp.tanh(out)
