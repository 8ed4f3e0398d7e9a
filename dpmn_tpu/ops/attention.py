"""Multi-head attention with torch.nn.MultiheadAttention weight layout.

Packed in_proj (3E, E) + out_proj, scaled dot-product, optional key padding
mask.  Batch-first (B, L, E) interface; the (L, N, E) ordering of the
reference call sites is handled by the callers.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MultiHeadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, Lq, E)
        key: jax.Array,  # (B, Lk, E)
        value: jax.Array,  # (B, Lk, E)
        key_padding_mask: jax.Array = None,  # (B, Lk) bool, True = masked
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        e = self.embed_dim
        h = self.num_heads
        dk = e // h
        in_proj_w = self.param("in_proj_weight", nn.initializers.xavier_uniform(), (3 * e, e))
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        q = query @ in_proj_w[:e].T + in_proj_b[:e]
        k = key @ in_proj_w[e : 2 * e].T + in_proj_b[e : 2 * e]
        v = value @ in_proj_w[2 * e :].T + in_proj_b[2 * e :]

        def split(t):
            b, l, _ = t.shape
            return t.reshape(b, l, h, dk).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        scores = jnp.einsum("bhld,bhmd->bhlm", qh, kh) / jnp.sqrt(dk).astype(q.dtype)
        if key_padding_mask is not None:
            scores = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhlm,bhmd->bhld", attn, vh).transpose(0, 2, 1, 3).reshape(query.shape[0], -1, e)
        out = nn.Dense(e, name="out_proj")(out)
        if return_weights:
            # torch returns head-averaged weights
            return out, attn.mean(axis=1)
        return out, None
