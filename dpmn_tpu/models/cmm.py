"""CMM — Complementation Modulation Module (dual-encoder U-Net fuser).

Parity: reference model/cmm.py:38-161 (MMFL-derived).  Two 6-stage encoders
(one per PGRM branch output), a shared SE-style channel gate at the
bottleneck (fc -> ReLU -> fc -> sigmoid, applied as residual*weight+residual),
and a skip-concat transpose-conv decoder producing the fused SR image.

Geometry notes: the encoder downsampling conv is Conv(k=4, s=2, dilation=2,
p=3) whose effective extent is 7, giving ceil(H/2) outputs; on 32x128 inputs
the stages run 32x128 → 16x64 → 8x32 → 4x16 → 2x8 → 1x4.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.torch_compat import ConvTranspose2dTorch


def _act(name):
    return {
        "relu": nn.relu,
        "elu": nn.elu,
        "leaky_relu": lambda t: nn.leaky_relu(t, 0.2),
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
        "gelu": lambda t: nn.gelu(t, approximate=False),
    }[name]


class EncodeBlock(nn.Module):
    out_channels: int
    activation: str = "leaky_relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _act(self.activation)
        bn = lambda t: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(t)
        in_c = x.shape[-1]
        x = act(x)
        x = nn.Conv(in_c, (4, 4), strides=2, padding=3, kernel_dilation=2)(x)
        x = bn(x)
        x = act(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1)(x)
        return bn(x)


class DecodeBlock(nn.Module):
    out_channels: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _act(self.activation)
        bn = lambda t: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(t)
        x = act(x)
        x = ConvTranspose2dTorch(self.out_channels, (3, 3), (1, 1), (1, 1))(x)
        x = bn(x)
        x = act(x)
        x = ConvTranspose2dTorch(self.out_channels, (4, 4), (2, 2), (1, 1))(x)
        return bn(x)


class CMM(nn.Module):
    c_img: int = 3
    cnum: int = 64
    act_en: str = "leaky_relu"
    act_de: str = "relu"

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array, train: bool = False) -> jax.Array:
        """x1, x2: branch SR images (B, 32, 128, 3) → fused image."""
        cn = self.cnum
        act_en = _act(self.act_en)
        act_de = _act(self.act_de)
        bn = lambda t: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(t)

        def encoder(x, tag):
            outs = {}
            outs[1] = nn.Conv(cn, (3, 3), padding=1, name=f"en_1_{tag}")(x)
            outs[2] = EncodeBlock(cn * 2, self.act_en, name=f"en_2_{tag}")(outs[1], train)
            outs[3] = EncodeBlock(cn * 4, self.act_en, name=f"en_3_{tag}")(outs[2], train)
            outs[4] = EncodeBlock(cn * 8, self.act_en, name=f"en_4_{tag}")(outs[3], train)
            outs[5] = EncodeBlock(cn * 8, self.act_en, name=f"en_5_{tag}")(outs[4], train)
            outs[6] = nn.Conv(cn * 8, (4, 4), strides=2, padding=1, name=f"en_6_{tag}")(act_en(outs[5]))
            return outs

        o1 = encoder(x1, "1")
        o2 = encoder(x2, "2")

        out6 = jnp.concatenate([o1[6], o2[6]], axis=-1)  # (B, 1, 4, 16*cn)
        residual = out6
        pooled = jnp.mean(out6, axis=(1, 2))  # (B, 16cn)
        z = nn.relu(nn.Dense(4 * cn, name="fc_1")(pooled))
        weight = jax.nn.sigmoid(nn.Dense(16 * cn, name="fc_2")(z))
        out6 = residual * weight[:, None, None, :] + residual

        d6 = ConvTranspose2dTorch(cn * 8, (4, 4), (2, 2), (1, 1), name="de_6_conv")(act_de(out6))
        d6 = bn(d6)
        d5 = DecodeBlock(cn * 8, self.act_de, name="de_5")(jnp.concatenate([d6, o1[5], o2[5]], -1), train)
        d4 = DecodeBlock(cn * 4, self.act_de, name="de_4")(jnp.concatenate([d5, o1[4], o2[4]], -1), train)
        d3 = DecodeBlock(cn * 2, self.act_de, name="de_3")(jnp.concatenate([d4, o1[3], o2[3]], -1), train)
        d2 = DecodeBlock(cn, self.act_de, name="de_2")(jnp.concatenate([d3, o1[2], o2[2]], -1), train)
        d1 = ConvTranspose2dTorch(self.c_img, (3, 3), (1, 1), (1, 1), name="de_1_conv")(
            act_de(jnp.concatenate([d2, o1[1], o2[1]], -1))
        )
        return d1
