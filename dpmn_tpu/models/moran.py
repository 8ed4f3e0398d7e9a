"""MORAN recognizer: MORN offset-grid rectifier + ASRN attention decoder.

Parity: reference model/moran/ —
  * moran.py:6-22    (MORAN = MORN → ASRN, BidirDecoder)
  * morn.py:7-95     (MORN: offset CNN on a 32x100 grayscale resize; the
    predicted vertical offsets are grid-sampled back onto the full-resolution
    grid and added to grid_y; at test time one extra enhance iteration runs.
    The train-time random skip (np.random>0.5 → plain resize, morn.py:50-51)
    is a host-side decision, exposed as the `skip_morn` argument.)
  * asrn_res.py:9-259 (ResNet with momentum-0.01 BNs, 2 x BiLSTM, GRU-cell
    attention decoder; eval path feeds back argmax+1 as the next char
    embedding index, asrn_res.py:136-142)

The fracPickup attention jitter (fracPickup.py:7-48) is train-only in the
reference; MORAN is always a frozen evaluator in the DPMN driver, so the
test path (plain alpha) is the one reproduced bit-faithfully.  A jax PRNG
version of fracPickup is provided for completeness.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.grid_sample import grid_sample
from ..ops.lstm import BiLSTM
from ..ops.resize import resize
from .aster import _dense, _gru_cell


def _base_grid(h: int, w: int):
    """Normalized sampling grid, (1, H, W, 2) in (x, y) order (morn.py:27-44)."""
    ys = jnp.arange(h) * 2.0 / (h - 1) - 1.0
    xs = jnp.arange(w) * 2.0 / (w - 1) - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    return jnp.stack([gx, gy], axis=-1)[None]


class MORN(nn.Module):
    """Offset-grid rectifier (morn.py:7-95); the offset CNN is factored out
    so the first pass and the test-time enhance pass share weights."""

    target_h: int = 32
    target_w: int = 100

    def setup(self):
        self.conv1 = nn.Conv(64, (3, 3), padding=1)
        self.conv2 = nn.Conv(128, (3, 3), padding=1)
        self.conv3 = nn.Conv(64, (3, 3), padding=1)
        self.conv4 = nn.Conv(16, (3, 3), padding=1)
        self.conv5 = nn.Conv(1, (3, 3), padding=1)
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.bn2 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.bn3 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.bn4 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.bn5 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)

    def _offset_cnn(self, t, train):
        ra = not train
        t = nn.max_pool(t, (2, 2), strides=(2, 2))
        t = nn.relu(self.bn1(self.conv1(t), use_running_average=ra))
        t = nn.max_pool(t, (2, 2), strides=(2, 2))
        t = nn.relu(self.bn2(self.conv2(t), use_running_average=ra))
        t = nn.max_pool(t, (2, 2), strides=(2, 2))
        t = nn.relu(self.bn3(self.conv3(t), use_running_average=ra))
        t = nn.relu(self.bn4(self.conv4(t), use_running_average=ra))
        offsets = self.bn5(self.conv5(t), use_running_average=ra)
        pos = nn.max_pool(nn.relu(offsets), (2, 2), strides=(1, 1))
        neg = nn.max_pool(nn.relu(-offsets), (2, 2), strides=(1, 1))
        return pos - neg

    def __call__(self, x, test: bool = True, train: bool = False, skip_morn: bool = False):
        h, w = self.target_h, self.target_w
        x_small = resize(x, (h, w), mode="bilinear", align_corners=False)
        if skip_morn:
            return x_small
        grid = jnp.broadcast_to(_base_grid(h, w), (x.shape[0], h, w, 2))
        grid_x, grid_y = grid[..., 0:1], grid[..., 1:2]

        offsets_pool = self._offset_cnn(x_small, train)
        offsets_grid = grid_sample(offsets_pool, grid, align_corners=False)
        sample_grid = jnp.concatenate([grid_x, grid_y + offsets_grid], axis=-1)
        x_rectified = grid_sample(x, sample_grid, align_corners=False)

        enhance = 0 if not test else 1
        for _ in range(enhance):
            offsets_pool = self._offset_cnn(x_rectified, train)
            offsets_grid = offsets_grid + grid_sample(offsets_pool, grid, align_corners=False)
            sample_grid = jnp.concatenate([grid_x, grid_y + offsets_grid], axis=-1)
            x_rectified = grid_sample(x, sample_grid, align_corners=False)
        return x_rectified


class ResidualBlockMoran(nn.Module):
    c_out: int
    stride: tuple = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch BN momentum 0.01 → flax momentum 0.99 (asrn_res.py:164-177)
        bn = lambda t: nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-5)(t)
        down = self.stride[0] > 1 if isinstance(self.stride, tuple) else self.stride > 1
        residual = x
        if down:
            conv1 = nn.Conv(self.c_out, (3, 3), strides=self.stride, padding=1)(x)
            residual = bn(nn.Conv(self.c_out, (3, 3), strides=self.stride, padding=1, name="down_conv")(x))
        else:
            conv1 = nn.Conv(self.c_out, (1, 1), strides=self.stride)(x)
        conv1 = bn(conv1)
        conv2 = bn(nn.Conv(self.c_out, (3, 3), padding=1)(conv1))
        return nn.relu(residual + conv2)


class ResNetMoran(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda t: nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-5)(t)
        x = bn(nn.Conv(32, (3, 3), padding=1)(x))
        for c_out, stride, repeat in ((32, (2, 2), 3), (64, (2, 2), 4), (128, (2, 1), 6), (256, (2, 1), 6), (512, (2, 1), 3)):
            x = ResidualBlockMoran(c_out, stride)(x, train)
            for _ in range(repeat - 1):
                x = ResidualBlockMoran(c_out, (1, 1))(x, train)
        return x  # (B, 1, 25, 512) for 32x100 input


class MoranAttention(nn.Module):
    """GRU-cell attention decoder (asrn_res.py:27-155), eval path."""

    input_size: int = 256
    hidden_size: int = 256
    num_classes: int = 37
    num_embeddings: int = 256

    def setup(self):
        lecun = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        k = 1.0 / jnp.sqrt(self.hidden_size)

        def u_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -k, k)

        self.i2h_kernel = self.param("i2h_kernel", lecun, (self.input_size, self.hidden_size))
        self.h2h = {"kernel": self.param("h2h_kernel", lecun, (self.hidden_size, self.hidden_size)),
                    "bias": self.param("h2h_bias", zeros, (self.hidden_size,))}
        self.score_kernel = self.param("score_kernel", lecun, (self.hidden_size, 1))
        self.gru = {
            "w_ih": self.param("gru_w_ih", u_init, (self.input_size + self.num_embeddings, 3 * self.hidden_size)),
            "w_hh": self.param("gru_w_hh", u_init, (self.hidden_size, 3 * self.hidden_size)),
            "b_ih": self.param("gru_b_ih", u_init, (3 * self.hidden_size,)),
            "b_hh": self.param("gru_b_hh", u_init, (3 * self.hidden_size,)),
        }
        self.generator = {"kernel": self.param("generator_kernel", lecun, (self.hidden_size, self.num_classes)),
                          "bias": self.param("generator_bias", zeros, (self.num_classes,))}
        self.char_embeddings = self.param(
            "char_embeddings", nn.initializers.normal(1.0), (self.num_classes + 1, self.num_embeddings)
        )

    def __call__(self, feats, num_steps: int = 20):
        """feats: (B, T, C) eval decode → (B, num_steps, num_classes) logits."""
        b = feats.shape[0]
        feats_proj = feats @ self.i2h_kernel  # i2h has no bias (asrn_res.py:30)

        def step(carry, _):
            hidden, tgt = carry
            h_proj = _dense(self.h2h, hidden)[:, None, :]
            e = (jnp.tanh(feats_proj + h_proj) @ self.score_kernel)[..., 0]  # (B, T)
            alpha = jax.nn.softmax(e, axis=1)
            context = jnp.einsum("bt,btc->bc", alpha, feats)
            emb = self.char_embeddings[tgt]
            hidden = _gru_cell(self.gru, hidden, jnp.concatenate([context, emb], axis=1))
            logits = _dense(self.generator, hidden)
            tgt = (logits.argmax(1) + 1).astype(jnp.int32)  # feed argmax+1 (asrn_res.py:141-142)
            return (hidden, tgt), logits

        init = (jnp.zeros((b, self.hidden_size), feats.dtype), jnp.zeros((b,), jnp.int32))
        _, logits = jax.lax.scan(step, init, None, length=num_steps)
        return jnp.swapaxes(logits, 0, 1)


class ASRN(nn.Module):
    """ResNet → 2 x BiLSTM → bidirectional attention decode (asrn_res.py:214-259)."""

    nh: int = 256
    num_classes: int = 37
    bidir_decoder: bool = True

    @nn.compact
    def __call__(self, x, num_steps: int = 20, train: bool = False):
        conv = ResNetMoran()(x, train)  # (B, 1, W', 512)
        seq = conv[:, 0]  # (B, T, 512)
        seq = nn.Dense(self.nh, name="rnn0_embed")(BiLSTM(hidden=self.nh, name="rnn0")(seq))
        seq = nn.Dense(self.nh, name="rnn1_embed")(BiLSTM(hidden=self.nh, name="rnn1")(seq))
        out_l2r = MoranAttention(self.nh, self.nh, self.num_classes, name="attentionL2R")(seq, num_steps)
        if self.bidir_decoder:
            out_r2l = MoranAttention(self.nh, self.nh, self.num_classes, name="attentionR2L")(seq, num_steps)
            return out_l2r, out_r2l
        return out_l2r


class MORAN(nn.Module):
    """MORN + ASRN (moran.py:6-22); eval interface."""

    num_classes: int = 37
    nh: int = 256

    @nn.compact
    def __call__(self, x, num_steps: int = 20, test: bool = True, train: bool = False):
        """x: (B, 32, 100, 1) grayscale → (logits_l2r, logits_r2l) each
        (B, num_steps, num_classes)."""
        x = MORN(name="MORN")(x, test=test, train=train)
        return ASRN(self.nh, self.num_classes, name="ASRN")(x, num_steps, train)


def parse_moran_input(imgs: jax.Array) -> jax.Array:
    """RGB NHWC [0,1] → (B, 32, 100, 1) grayscale (interfaces/base.py:396-409)."""
    x = resize(imgs[..., :3], (32, 100), mode="bicubic", align_corners=False)
    r, g, b = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    return 0.299 * r + 0.587 * g + 0.114 * b


def frac_pickup(alpha: jax.Array, rng: jax.Array) -> jax.Array:
    """Train-only attention jitter (fracPickup.py:7-48), jax PRNG version:
    swaps a random pair of adjacent attention columns with a random blend."""
    b, t = alpha.shape
    k1, k2 = jax.random.split(rng)
    idx = jax.random.randint(k1, (), 1, t - 1)
    beta = jax.random.uniform(k2, ()) / 4.0
    w = jnp.arange(t) * 2.0 / (t - 1) - 1.0
    v0 = beta * w[idx] + (1 - beta) * w[idx - 1]
    v1 = beta * w[idx - 1] + (1 - beta) * w[idx]
    w = w.at[idx - 1].set(v0).at[idx].set(v1)
    grid = jnp.stack([jnp.broadcast_to(w, (b, 1, t)), jnp.zeros((b, 1, t))], axis=-1)
    return grid_sample(alpha[:, None, :, None], grid, align_corners=False)[:, 0, :, 0]
