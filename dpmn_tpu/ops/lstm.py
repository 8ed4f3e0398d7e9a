"""Bidirectional LSTM with torch gate math, as a lax.scan.

Used by the CRNN recognizer head (reference model/crnn/crnn.py:4-20) and the
ASTER encoder (model/recognizer/resnet_aster.py).  Same MXU strategy as
ops/gru.py: input projections for all timesteps in one matmul, scan only
carries the (h, c) recurrence.

torch gate block order in the 4H axis: [i; f; g; o] with
    i,f,o = sigmoid, g = tanh; c' = f*c + i*g; h' = o*tanh(c')
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _lstm_scan(x_proj: jax.Array, w_hh: jax.Array, b_hh: jax.Array, reverse: bool) -> jax.Array:
    hdim = w_hh.shape[0]
    bsz = x_proj.shape[0]

    def step(carry, gi):
        h, c = carry
        g = gi + h @ w_hh + b_hh  # (B, 4H)
        i = jax.nn.sigmoid(g[:, :hdim])
        f = jax.nn.sigmoid(g[:, hdim : 2 * hdim])
        gg = jnp.tanh(g[:, 2 * hdim : 3 * hdim])
        o = jax.nn.sigmoid(g[:, 3 * hdim :])
        c = f * c + i * gg
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((bsz, hdim), x_proj.dtype), jnp.zeros((bsz, hdim), x_proj.dtype))
    xs = jnp.swapaxes(x_proj, 0, 1)
    _, ys = jax.lax.scan(step, init, xs, reverse=reverse, unroll=4)
    return jnp.swapaxes(ys, 0, 1)


class BiLSTM(nn.Module):
    """Bidirectional single-layer LSTM; (B, T, I) → (B, T, 2*hidden)."""

    hidden: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hdim = self.hidden
        in_dim = x.shape[-1]
        k = 1.0 / jnp.sqrt(hdim)

        def u_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -k, k)

        params = {}
        for tag in ("fw", "bw"):
            params[tag] = (
                self.param(f"w_ih_{tag}", u_init, (in_dim, 4 * hdim)),
                self.param(f"w_hh_{tag}", u_init, (hdim, 4 * hdim)),
                self.param(f"b_ih_{tag}", u_init, (4 * hdim,)),
                self.param(f"b_hh_{tag}", u_init, (4 * hdim,)),
            )
        from .gru import USE_FUSED_BIDIR

        if not USE_FUSED_BIDIR:
            outs = []
            for tag, reverse in (("fw", False), ("bw", True)):
                w_ih, w_hh, b_ih, b_hh = params[tag]
                outs.append(_lstm_scan(x @ w_ih + b_ih, w_hh, b_hh, reverse))
            return jnp.concatenate(outs, axis=-1)

        # fused bidirectional scan (backward stream time-flipped): one
        # lax.scan instead of two — see ops/gru.py
        xp_f = x @ params["fw"][0] + params["fw"][2]
        xp_b = (x @ params["bw"][0] + params["bw"][2])[:, ::-1]
        xs = jnp.stack([jnp.swapaxes(xp_f, 0, 1), jnp.swapaxes(xp_b, 0, 1)], axis=1)  # (T, 2, B, 4H)
        w_hh = jnp.stack([params["fw"][1], params["bw"][1]])
        b_hh = jnp.stack([params["fw"][3], params["bw"][3]])[:, None, :]

        def step(carry, gi):
            h, c = carry
            g = gi + jnp.einsum("dbh,dhg->dbg", h, w_hh) + b_hh
            i = jax.nn.sigmoid(g[..., :hdim])
            f = jax.nn.sigmoid(g[..., hdim : 2 * hdim])
            gg = jnp.tanh(g[..., 2 * hdim : 3 * hdim])
            o = jax.nn.sigmoid(g[..., 3 * hdim :])
            c = f * c + i * gg
            h = o * jnp.tanh(c)
            return (h, c), h

        z = jnp.zeros((2, x.shape[0], hdim), x.dtype)
        _, ys = jax.lax.scan(step, (z, z), xs, unroll=4)
        fw = jnp.swapaxes(ys[:, 0], 0, 1)
        bw = jnp.swapaxes(ys[:, 1], 0, 1)[:, ::-1]
        return jnp.concatenate([fw, bw], axis=-1)


class GRUCellTorch(nn.Module):
    """Single-step GRU cell with torch gate math (for attention decoders)."""

    hidden: int

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array) -> jax.Array:
        hdim = self.hidden
        in_dim = x.shape[-1]
        k = 1.0 / jnp.sqrt(hdim)

        def u_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -k, k)

        w_ih = self.param("w_ih", u_init, (in_dim, 3 * hdim))
        w_hh = self.param("w_hh", u_init, (hdim, 3 * hdim))
        b_ih = self.param("b_ih", u_init, (3 * hdim,))
        b_hh = self.param("b_hh", u_init, (3 * hdim,))
        gi = x @ w_ih + b_ih
        gh = h @ w_hh + b_hh
        r = jax.nn.sigmoid(gi[:, :hdim] + gh[:, :hdim])
        z = jax.nn.sigmoid(gi[:, hdim : 2 * hdim] + gh[:, hdim : 2 * hdim])
        n = jnp.tanh(gi[:, 2 * hdim :] + r * gh[:, 2 * hdim :])
        return (1.0 - z) * n + z * h
