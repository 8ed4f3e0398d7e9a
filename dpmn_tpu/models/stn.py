"""STN localization head predicting TPS control points.

Parity: the reference carries TWO near-duplicate heads —
  * model/stn_head.py:25-106 (the PSN front): pools 2x2,2x2,2x2,2x2,1x2 →
    (1, 2, 256) on a 16x64 input, fc1 = Linear(512, 512)   [variant='psn']
  * model/recognizer/stn_head.py:26-106 (ASTER): pools 2x2 x5 → (1, 2, 256)
    on its 32x64 input, fc1 = Linear(H*W//4, 512)          [variant='recognizer']
Both share six conv3x3-BN-ReLU blocks, fc(512)->BN->ReLU, and a final fc
whose weight is zero-initialized and whose bias encodes the margin-0.01
rectangle of control points, so the untrained STN is an identity warp.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def init_ctrl_points(num_ctrlpoints: int, margin: float = 0.01) -> np.ndarray:
    n_side = num_ctrlpoints // 2
    xs = np.linspace(margin, 1.0 - margin, n_side)
    top = np.stack([xs, np.full(n_side, margin)], axis=1)
    bottom = np.stack([xs, np.full(n_side, 1.0 - margin)], axis=1)
    return np.concatenate([top, bottom], axis=0).astype(np.float32)


class ConvBNReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding=1)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return nn.relu(x)


class STNHead(nn.Module):
    num_ctrlpoints: int = 20
    activation: str = "none"
    variant: str = "psn"  # 'psn' (model/stn_head.py) | 'recognizer' (ASTER's)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        """x: NHWC (B, 16, 64, C) psn / (B, 32, 64, C) recognizer →
        (img_feat (B,512), ctrl_points (B,N,2))."""
        pool = lambda t, wh: nn.max_pool(t, wh, strides=wh)
        last_pool = (1, 2) if self.variant == "psn" else (2, 2)
        x = ConvBNReLU(32)(x, train)
        x = pool(x, (2, 2))
        x = ConvBNReLU(64)(x, train)
        x = pool(x, (2, 2))
        x = ConvBNReLU(128)(x, train)
        x = pool(x, (2, 2))
        x = ConvBNReLU(256)(x, train)
        x = pool(x, (2, 2))
        x = ConvBNReLU(256)(x, train)
        x = pool(x, last_pool)
        x = ConvBNReLU(256)(x, train)
        # NHWC (B, 1, 2, 256): flatten in torch NCHW order (C, H, W) so the
        # fc weights port 1:1 from the reference (stn_head.py:94-95).
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)

        feat = nn.Dense(512, kernel_init=nn.initializers.normal(0.001))(x)
        feat = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(feat)
        feat = nn.relu(feat)

        bias0 = init_ctrl_points(self.num_ctrlpoints).reshape(-1)
        ctrl = nn.Dense(
            self.num_ctrlpoints * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: jnp.asarray(bias0),
        )(0.1 * feat)
        if self.activation == "sigmoid":
            ctrl = jax.nn.sigmoid(ctrl)
        elif self.activation == "relu":
            ctrl = nn.relu(ctrl)
        return feat, ctrl.reshape(-1, self.num_ctrlpoints, 2)
