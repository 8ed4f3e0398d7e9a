"""TATT PSN (TSRN_TL_TRANS): TSRN skeleton + transformer text-prior interpreter.

Parity: reference model/tatt.py:575-691 (TSRN_TL_TRANS), model/tatt.py:154-223
(TPInterpreter) and model/transformer_v2.py:154-244 (InfoTransformer),
:448-520 (encoder layer), :345-391 + :775-869 (decoder with cross-attn-only
TP layers, return_intermediate).

Faithful quirk: InfoTransformer's `gru_encoding` is a torch GRU constructed
with batch_first=True but fed a (W, bs, d_model*H) tensor
(transformer_v2.py:215-221), so the recurrence actually runs along the
*batch* axis — every sample's query embedding depends on its position in the
batch.  `faithful=True` reproduces this exactly; `faithful=False` scans along
the W axis as presumably intended.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import MultiHeadAttention
from ..ops.gru import BiGRU
from ..ops.pixel_shuffle import pixel_shuffle
from ..ops.torch_compat import mish, PReLU
from .stn import STNHead
from .tps import TPSSpatialTransformer
from .tsrn import RecurrentResidualBlockTL


def positional_encoding_1d(d_model: int, max_len: int = 5000) -> np.ndarray:
    """(max_len, d_model) sinusoidal code (transformer_v2.py:22-41)."""
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(0, max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class TransformerEncoderLayer(nn.Module):
    """Post-norm DETR encoder layer (transformer_v2.py:448-520)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src, pos, deterministic: bool = True):
        q = k = src + pos
        attn, _ = MultiHeadAttention(self.d_model, self.nhead, self.dropout)(
            q, k, src, deterministic=deterministic
        )
        src = src + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        src = nn.LayerNorm(name="norm1")(src)
        ff = nn.Dense(self.dim_feedforward, name="linear1")(src)
        ff = nn.Dropout(self.dropout)(nn.relu(ff), deterministic=deterministic)
        ff = nn.Dense(self.d_model, name="linear2")(ff)
        src = src + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(name="norm2")(src)


class TransformerDecoderLayerTP(nn.Module):
    """Cross-attention-only decoder layer (transformer_v2.py:775-869):
    the self-attention path is commented out in the reference."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, deterministic: bool = True):
        attn, weights = MultiHeadAttention(self.d_model, self.nhead, self.dropout)(
            tgt + query_pos, memory + pos, memory, deterministic=deterministic, return_weights=True
        )
        tgt = tgt + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm2")(tgt)
        ff = nn.Dense(self.dim_feedforward, name="linear1")(tgt)
        ff = nn.Dropout(self.dropout)(nn.relu(ff), deterministic=deterministic)
        ff = nn.Dense(self.d_model, name="linear2")(ff)
        tgt = tgt + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(name="norm3")(tgt), weights


class InfoTransformer(nn.Module):
    """Encoder over the 26-token text prior, decoder over 1024 image tokens
    (transformer_v2.py:154-244)."""

    d_model: int = 64
    nhead: int = 4
    num_encoder_layers: int = 1
    num_decoder_layers: int = 2
    dim_feedforward: int = 64
    dropout: float = 0.1
    feat_height: int = 16
    feat_width: int = 64
    faithful: bool = True

    @nn.compact
    def __call__(self, src, tgt, pos_embed, deterministic: bool = True):
        """src: (B, 26, C) text tokens; tgt: (B, HW, C) image tokens."""
        bs = src.shape[0]
        h, w, c = self.feat_height, self.feat_width, self.d_model
        hw = h * w

        init_factor = self.param("init_factor", nn.initializers.normal(1.0), (hw, c))
        # (HW, C) → (H, W, C) → (W, H*C)
        qe = init_factor.reshape(h, w, c).transpose(1, 0, 2).reshape(w, h * c)
        gru = BiGRU(features=h * c, name="gru_encoding")
        if self.faithful:
            # reference quirk: recurrence along the batch axis — (batch=W,
            # time=bs, feat=H*C) with identical inputs per step.
            qe_in = jnp.broadcast_to(qe[:, None, :], (w, bs, h * c))
            qe_out = gru(qe_in)  # (W, bs, H*C)
            query_embed = (
                qe_out.reshape(w, bs, h, c).transpose(1, 2, 0, 3).reshape(bs, hw, c)
            )
        else:
            # corrected: recurrence along W, shared across the batch
            qe_out = gru(qe[None])[0]  # (W, H*C)
            query_embed = jnp.broadcast_to(
                qe_out.reshape(w, h, c).transpose(1, 0, 2).reshape(1, hw, c), (bs, hw, c)
            )

        memory = src
        for i in range(self.num_encoder_layers):
            memory = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout, name=f"encoder_{i}"
            )(memory, pos_embed, deterministic)

        out = tgt
        intermediate = []
        weights = None
        norm = nn.LayerNorm(name="decoder_norm")
        for i in range(self.num_decoder_layers):
            out, weights = TransformerDecoderLayerTP(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout, name=f"decoder_{i}"
            )(out, memory, pos_embed, query_embed, deterministic)
            intermediate.append(norm(out))
        hs = jnp.stack(intermediate)  # (num_dec, B, HW, C)
        return hs, weights


class TPInterpreter(nn.Module):
    """Text-prior interpreter (tatt.py:154-223)."""

    t_emb: int = 37
    out_text_channels: int = 64
    output_size: tuple = (16, 64)
    faithful: bool = True

    @nn.compact
    def __call__(self, image_feature, tp_input, deterministic: bool = True):
        """image_feature: (B, H, W, C=64) NHWC; tp_input: (B, 1, 26, 37) NHWC."""
        b, h, w, c = image_feature.shape
        d = self.out_text_channels
        x_im = image_feature.reshape(b, h * w, c)

        x = tp_input[:, 0]  # (B, 26, 37)
        x = PReLU()(nn.Dense(d, name="fc_in")(x))  # (B, 26, d)
        l = x.shape[1]

        # cast the f32 PE table to the activation dtype: under bf16 AMP a f32
        # constant add would silently promote every downstream activation to
        # f32 (measured: the whole AMP train graph fell back to f32 traffic)
        pe = jnp.asarray(positional_encoding_1d(d)[None, :l]).astype(x.dtype)  # (1, L, d)
        x_pos = nn.Dropout(0.1)(jnp.broadcast_to(pe, (b, l, d)), deterministic=deterministic)

        hs, weights = InfoTransformer(
            d_model=d,
            nhead=4,
            num_encoder_layers=1,
            num_decoder_layers=2,
            dim_feedforward=d,
            dropout=0.1,
            feat_height=self.output_size[0],
            feat_width=self.output_size[1],
            faithful=self.faithful,
            name="upsample_transformer",
        )(x, x_im, x_pos, deterministic)
        text_prior = hs.mean(0)  # (B, HW, d)
        return text_prior.reshape(b, h, w, d), weights


class TSRN_TL_TRANS(nn.Module):
    """The --arch tatt PSN (tatt.py:575-691)."""

    scale_factor: int = 2
    width: int = 128
    height: int = 32
    stn: bool = False
    srb_nums: int = 5
    mask: bool = True
    hidden_units: int = 32
    text_emb: int = 37
    out_text_channels: int = 64
    faithful: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, text_emb: jax.Array = None, train: bool = False):
        in_planes = 4 if self.mask else 3
        ch = 2 * self.hidden_units
        lh = self.height // self.scale_factor
        lw = self.width // self.scale_factor
        if self.stn and train:
            _, ctrl = STNHead(num_ctrlpoints=20, activation="none")(x, train)
            x, _ = TPSSpatialTransformer((lh, lw), 20, (0.05, 0.05))(x, ctrl)

        b1 = nn.Conv(ch, (9, 9), padding=4)(x)
        b1 = PReLU()(b1)

        if text_emb is None:
            text_emb = jnp.zeros((x.shape[0], 1, 26, self.text_emb), x.dtype)
        tp_map, pr_weights = TPInterpreter(
            self.text_emb, self.out_text_channels, output_size=(lh, lw), faithful=self.faithful,
            name="infoGen",
        )(b1, text_emb, deterministic=not train)

        feat = b1
        for _ in range(self.srb_nums):
            feat = RecurrentResidualBlockTL(ch)(feat, tp_map, train)
        feat = nn.Conv(ch, (3, 3), padding=1)(feat)
        feat = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(feat)

        out = b1 + feat
        for _ in range(int(math.log2(self.scale_factor))):
            out = nn.Conv(ch * 4, (3, 3), padding=1)(out)
            out = pixel_shuffle(out, 2)
            out = mish(out)
        out = nn.Conv(in_planes, (9, 9), padding=4)(out)
        return jnp.tanh(out), pr_weights
