"""VisionLAN recognizer / text-prior generator (the trainable TPG).

Parity: reference model/VisionLAN/ —
  * modules/resnet.py:36-118  (ResNet45, strides [(1,1),(2,2),(2,2),(2,2),(1,1),(1,1)],
    no compress layer → (B, 512, 8, 32) on a 64x256 input)
  * modules/modules.py:7-199  (sinusoid PE table, pre-LN-free transformer
    encoder with separate q/k/v projections, PP parallel-prediction layer)
  * VisionLAN.py:12-167       (MLM occlusion branch for LF_1/LF_2/LA training;
    test path = backbone → 3-layer encoder → PP layer → 26-step logits with
    an early-stop length scan)

TPU formulation of the test path: the reference's while-loop early stop
(VisionLAN.py:121-131) computes, for each sample, the index of the first
EOS (class 0) argmax; everything downstream only reads the first `length`
rows, so it reduces to a fixed 25-step argmax + first-zero search — no loop.
Returns fixed-shape (B, 25, n_class) logits + (B,) lengths.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize


def sinusoid_table(n_position: int, d_hid: int) -> np.ndarray:
    """(n_position, d_hid) PE table (modules/modules.py:11-18)."""
    pos = np.arange(n_position)[:, None]
    j = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (j // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class BasicBlockVL(nn.Module):
    planes: int
    stride: tuple = (1, 1)
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda t: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(t)
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False)(x)
        out = nn.relu(bn(out))
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1, use_bias=False)(out)
        out = bn(out)
        if self.downsample:
            residual = bn(nn.Conv(self.planes, (1, 1), strides=self.stride, use_bias=False)(x))
        return nn.relu(out + residual)


class ResNet45(nn.Module):
    """modules/resnet.py:36-118 with the eval config strides."""

    strides: tuple = ((1, 1), (2, 2), (2, 2), (2, 2), (1, 1), (1, 1))

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda t: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(t)
        x = nn.Conv(32, (3, 3), strides=self.strides[0], padding=1, use_bias=False)(x)
        x = nn.relu(bn(x))
        inplanes = 32
        for planes, blocks, stride in zip(
            (32, 64, 128, 256, 512), (3, 4, 6, 6, 3), self.strides[1:]
        ):
            down = stride != (1, 1) or inplanes != planes
            x = BasicBlockVL(planes, stride, downsample=down)(x, train)
            for _ in range(1, blocks):
                x = BasicBlockVL(planes)(x, train)
            inplanes = planes
        return x  # (B, 8, 32, 512) NHWC for 64x256 input


class VLEncoderLayer(nn.Module):
    """Separate-q/k/v MHA + conv1d FFN, post-LN (modules/modules.py:41-108)."""

    d_model: int = 512
    d_inner: int = 2048
    n_head: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d_k = self.d_model // self.n_head
        b, l, _ = x.shape
        residual = x
        q = nn.Dense(self.d_model, name="w_qs")(x).reshape(b, l, self.n_head, d_k)
        k = nn.Dense(self.d_model, name="w_ks")(x).reshape(b, l, self.n_head, d_k)
        v = nn.Dense(self.d_model, name="w_vs")(x).reshape(b, l, self.n_head, d_k)
        # python-float scale: a jnp.sqrt(int) scalar is a strong f32 array
        # and would promote the whole bf16 attention tail (scores, softmax,
        # AV einsum — 134 MB per layer at batch 64) back to f32; the weak
        # scalar is identity on the f32 parity path (1/sqrt(64) is exact)
        attn = jnp.einsum("blhd,bmhd->bhlm", q, k) * (1.0 / math.sqrt(d_k))
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhlm,bmhd->blhd", attn, v).reshape(b, l, self.d_model)
        out = nn.Dense(self.d_model, name="fc")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        x = nn.LayerNorm(name="attn_norm")(out + residual)

        residual = x
        ff = nn.Dense(self.d_inner, name="w_1")(x)
        ff = nn.Dense(self.d_model, name="w_2")(nn.relu(ff))
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(name="ffn_norm")(ff + residual)


class TransformerEncoderVL(nn.Module):
    n_layers: int = 3
    n_position: int = 256
    d_model: int = 512
    d_inner: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # cast the f32 table to the activation dtype BEFORE the add: an f32
        # constant + bf16 activation promotes to f32 and drags the entire
        # 3-layer encoder back to fp32 bandwidth in the bf16 serving graph
        # (round-4 HBM byte audit: ~1.9 GB/step at batch 64); identity on
        # the f32 parity path
        pe = jnp.asarray(sinusoid_table(self.n_position, self.d_model))
        x = x + pe[None, : x.shape[1]].astype(x.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(self.n_layers):
            x = VLEncoderLayer(self.d_model, self.d_inner, dropout=self.dropout, name=f"layer_{i}")(
                x, deterministic
            )
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


class PPLayer(nn.Module):
    """Parallel-prediction attention (modules/modules.py:148-170)."""

    n_dim: int = 512
    n_max_character: int = 25
    n_position: int = 256

    @nn.compact
    def __call__(self, enc_output):
        b = enc_output.shape[0]
        f0 = nn.Embed(self.n_max_character, self.n_dim, name="f0_embedding")(
            jnp.broadcast_to(jnp.arange(self.n_max_character), (b, self.n_max_character))
        )  # (B, S, 512)
        t = nn.Dense(self.n_position, name="w0")(f0.transpose(0, 2, 1))  # (B, 512, 256)
        t = jnp.tanh(t.transpose(0, 2, 1) + nn.Dense(self.n_dim, name="wv")(enc_output))
        t = nn.Dense(self.n_max_character, name="we")(t)  # (B, 256, S)
        t = jax.nn.softmax(t.transpose(0, 2, 1), axis=2)  # (B, S, 256)
        g = jnp.einsum("bsp,bpd->bsd", t, enc_output)  # (B, S, 512)
        return g, t


class MLM(nn.Module):
    """Masked-language occlusion branch (VisionLAN.py:12-44), training only."""

    n_dim: int = 512

    @nn.compact
    def __call__(self, x, label_pos, deterministic: bool = True):
        feat = TransformerEncoderVL(n_layers=2, name="MLM_SequenceModeling_mask")(x, deterministic)
        pos_emb = nn.Embed(25, 512, name="pos_embedding")(label_pos.astype(jnp.int32))  # (B, 512)
        pos_emb = nn.Dense(256, name="w0_linear")(pos_emb[:, :, None]).transpose(0, 2, 1)  # (B, 256, 512)
        att = jnp.tanh(pos_emb + nn.Dense(self.n_dim, name="wv")(feat))
        att = nn.Dense(1, name="we")(att)  # (B, 256, 1)
        att = jax.nn.sigmoid(att.transpose(0, 2, 1))  # (B, 1, 256)
        f_res = x * (1.0 - att.transpose(0, 2, 1))
        f_sub = x * att.transpose(0, 2, 1)
        wcl = TransformerEncoderVL(n_layers=1, name="MLM_SequenceModeling_WCL")
        return wcl(f_res, deterministic), wcl(f_sub, deterministic), att


class VisionLAN(nn.Module):
    """Full model (VisionLAN.py:142-167).  NHWC input (B, 64, 256, 3)."""

    n_class: int = 37
    n_max_character: int = 26  # 25 chars + EOS slot in the PP layer

    @nn.compact
    def __call__(self, x, label_pos=None, training_step: str = "LA", train: bool = False):
        feats = ResNet45(name="backbone")(x, train)  # (B, 8, 32, 512)
        b = feats.shape[0]
        # torch: (B,C,H,W) → permute(0,1,3,2) → view(B,C,H*W) → (B, HW, C);
        # the flatten order is W-major then H (VisionLAN.py:76-78), i.e. for
        # NHWC: transpose H and W first.
        tokens = feats.transpose(0, 2, 1, 3).reshape(b, -1, 512)  # (B, 256, 512)

        pred = lambda t: nn.Dense(self.n_class, name="w_vrm")(t)
        pp = PPLayer(n_max_character=self.n_max_character, name="pp")
        seq = TransformerEncoderVL(n_layers=3, name="SequenceModeling")

        if train and training_step == "LF_1":
            # VRM only, no MLM (VisionLAN.py:80-85, Prediction use_mlm=False)
            enc = seq(tokens, deterministic=not train)
            g_output, _ = pp(enc)
            text_pre = pred(g_output)
            return text_pre, text_pre, text_pre, text_pre
        if train:
            assert label_pos is not None
            f_res, f_sub, mask_c = MLM(name="MLM")(tokens, label_pos, deterministic=not train)
            if training_step == "LA":
                ratio = 2
                occlude = jnp.arange(b)[:, None, None] < (b // ratio)
                tokens = tokens * (1.0 - jnp.where(occlude, mask_c.transpose(0, 2, 1), 0.0))
            enc = seq(tokens, deterministic=not train)
            g_output, _ = pp(enc)
            text_pre = pred(g_output)
            pp_share = PPLayer(n_max_character=self.n_max_character, name="pp_share")
            w_share = nn.Dense(self.n_class, name="w_share")
            f_res_p, _ = pp_share(f_res)
            f_sub_p, _ = pp_share(f_sub)
            return text_pre, w_share(f_res_p), w_share(f_sub_p), mask_c

        enc = seq(tokens, deterministic=True)
        g_output, _ = pp(enc)
        logits = pred(g_output)[:, :25]  # (B, 25, n_class): steps used by the
        # reference's early-stop loop (VisionLAN.py:114-131)
        preds = logits.argmax(-1)  # (B, 25)
        is_eos = preds == 0
        any_eos = is_eos.any(axis=1)
        first_eos = jnp.argmax(is_eos, axis=1)  # first True index
        out_length = jnp.where(any_eos, first_eos + 1, 25)
        return logits, out_length


def parse_visionlan_input(imgs: jax.Array) -> jax.Array:
    """RGB NHWC float → (B, 64, 256, 3) (interfaces/base.py:473-478).

    The reference round-trips every sample through host image libraries:
    ToPILImage (float·255 cast to uint8 — trunc toward zero, wrap mod 256;
    PSN outputs are tanh'd so negatives DO occur), cv2.resize bilinear on
    the uint8 image (output re-quantized to uint8), then ToTensor (/255).
    Both quantizations are reproduced here so the student sees the same
    pixels; trunc/round have zero gradient, and the glyph prior downstream
    is stop-gradient'ed anyway.
    """
    x = imgs[..., :3] * 255.0
    # torch/numpy float→uint8 cast: truncate toward zero, wrap modulo 256
    x = jnp.trunc(x).astype(jnp.int32) % 256
    y = resize(x.astype(imgs.dtype), (64, 256), mode="bilinear", align_corners=False)
    y = jnp.clip(jnp.round(y), 0.0, 255.0)
    return y / 255.0
