"""CRNN recognizer (7-conv VGG → 2 x BiLSTM → per-frame logits).

Parity: reference model/crnn/crnn.py:23-79.  Input is a (B, 32, 100, 1)
grayscale crop (interfaces/base.py:419-425 parse_crnn_data); output is
(T=26, B, nclass=37) CTC-style logits.  Used both as the --rec crnn
evaluator and as the crnn_psn producing the 37-class text prior for
TPGSR/TATT (interfaces/super_resolution.py:164-169).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.lstm import BiLSTM


class BidirectionalLSTM(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, T, C) → (B, T, out)."""
        x = BiLSTM(hidden=self.hidden)(x)
        return nn.Dense(self.out)(x)


class CRNN(nn.Module):
    nc: int = 1
    nclass: int = 37
    nh: int = 256
    leaky_relu: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: (B, 32, W, nc) NHWC → logits (T, B, nclass)."""
        act = (lambda t: nn.leaky_relu(t, 0.2)) if self.leaky_relu else nn.relu
        bn = lambda t: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(t)

        x = act(nn.Conv(64, (3, 3), padding=1)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # 16 x W/2
        x = act(nn.Conv(128, (3, 3), padding=1)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # 8 x W/4
        x = act(bn(nn.Conv(256, (3, 3), padding=1)(x)))
        x = act(nn.Conv(256, (3, 3), padding=1)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 1), padding=((0, 0), (1, 1)))  # 4 x W/4+1
        x = act(bn(nn.Conv(512, (3, 3), padding=1)(x)))
        x = act(nn.Conv(512, (3, 3), padding=1)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 1), padding=((0, 0), (1, 1)))  # 2 x ...
        x = act(bn(nn.Conv(512, (2, 2), padding=0)(x)))  # 1 x T

        assert x.shape[1] == 1, f"conv height must be 1, got {x.shape}"
        x = x[:, 0]  # (B, T, 512)
        x = BidirectionalLSTM(self.nh, self.nh)(x)
        x = BidirectionalLSTM(self.nh, self.nclass)(x)
        return jnp.transpose(x, (1, 0, 2))  # (T, B, nclass)


def parse_crnn_input(imgs: jax.Array) -> jax.Array:
    """RGB NHWC [0,1] → (B, 32, 100, 1) grayscale via torch-bicubic resize.

    Parity: interfaces/base.py:419-425.
    """
    from ..ops.resize import resize

    x = resize(imgs[..., :3], (32, 100), mode="bicubic", align_corners=False)
    r, g, b = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    return 0.299 * r + 0.587 * g + 0.114 * b
