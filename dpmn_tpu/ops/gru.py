"""Bidirectional GRU with torch gate math, as a lax.scan.

The TSRN family runs a bi-GRU over the W axis for every row, twice per SRB
(reference model/tsrn.py:132-150 GruBlock) — this is the PSN hot loop.  The
TPU formulation: the input projection for ALL timesteps is one big matmul
(B*T, I) @ (I, 3H) that lands on the MXU; the scan body then only does the
(B, H) @ (H, 3H) hidden matmul and the gate algebra.  Bidirectional = the
same scan over the reversed sequence with separate weights.

Gate math matches torch.nn.GRU so weights port 1:1:
    r = sigmoid(gi_r + gh_r); z = sigmoid(gi_z + gh_z)
    n = tanh(gi_n + r * gh_n); h' = (1 - z) * n + z * h
with gate blocks ordered [r; z; n] in the 3H axis.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

# opt-in fused Pallas scan (ops/pallas_kernels.py); benchmark per chip
USE_PALLAS_GRU = os.environ.get("DPMN_TPU_PALLAS_GRU", "0") == "1"
# fusing both directions into one scan measured ~10% slower end-to-end on
# v5e (extra stacking copies of the input projections) — keep opt-in
USE_FUSED_BIDIR = os.environ.get("DPMN_TPU_FUSED_BIDIR", "0") == "1"


def _gru_scan(x_proj: jax.Array, w_hh: jax.Array, b_hh: jax.Array, reverse: bool) -> jax.Array:
    """x_proj: (B, T, 3H) precomputed input projection. Returns (B, T, H)."""
    hdim = w_hh.shape[0]
    bsz = x_proj.shape[0]

    def step(h, gi):
        gh = h @ w_hh + b_hh  # (B, 3H)
        r = jax.nn.sigmoid(gi[:, :hdim] + gh[:, :hdim])
        z = jax.nn.sigmoid(gi[:, hdim : 2 * hdim] + gh[:, hdim : 2 * hdim])
        n = jnp.tanh(gi[:, 2 * hdim :] + r * gh[:, 2 * hdim :])
        h = (1.0 - z) * n + z * h
        return h, h

    h0 = jnp.zeros((bsz, hdim), x_proj.dtype)
    xs = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 3H)
    _, ys = jax.lax.scan(step, h0, xs, reverse=reverse, unroll=4)
    return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


class BiGRU(nn.Module):
    """Bidirectional single-layer GRU; input (B, T, I) → (B, T, 2*H).

    hidden_size H = features // 2, output concat [forward; backward], matching
    torch.nn.GRU(out_channels, out_channels // 2, bidirectional=True,
    batch_first=True) as used in GruBlock (model/tsrn.py:140).
    """

    features: int  # output feature count (2 * hidden)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hdim = self.features // 2
        in_dim = x.shape[-1]
        k = 1.0 / jnp.sqrt(hdim)
        init = nn.initializers.uniform(scale=2 * k)  # uniform(0, 2k); shift to (-k, k)

        def u_init(key, shape, dtype=jnp.float32):
            return init(key, shape, dtype) - k

        params = {}
        for tag in ("fw", "bw"):
            params[tag] = (
                self.param(f"w_ih_{tag}", u_init, (in_dim, 3 * hdim)),
                self.param(f"w_hh_{tag}", u_init, (hdim, 3 * hdim)),
                self.param(f"b_ih_{tag}", u_init, (3 * hdim,)),
                self.param(f"b_hh_{tag}", u_init, (3 * hdim,)),
            )
        if USE_PALLAS_GRU and not self.is_initializing():
            from .pallas_kernels import pallas_gru_scan

            outs = []
            for tag, reverse in (("fw", False), ("bw", True)):
                w_ih, w_hh, b_ih, b_hh = params[tag]
                outs.append(pallas_gru_scan(x @ w_ih + b_ih, w_hh, b_hh, reverse))
            return jnp.concatenate(outs, axis=-1)

        if not USE_FUSED_BIDIR:
            outs = []
            for tag, reverse in (("fw", False), ("bw", True)):
                w_ih, w_hh, b_ih, b_hh = params[tag]
                outs.append(_gru_scan(x @ w_ih + b_ih, w_hh, b_hh, reverse))
            return jnp.concatenate(outs, axis=-1)

        # fused bidirectional scan: both directions run as one lax.scan (the
        # backward stream is time-flipped), halving sequential scan count
        xp_f = x @ params["fw"][0] + params["fw"][2]  # (B, T, 3H)
        xp_b = (x @ params["bw"][0] + params["bw"][2])[:, ::-1]
        xs = jnp.stack([jnp.swapaxes(xp_f, 0, 1), jnp.swapaxes(xp_b, 0, 1)], axis=1)  # (T, 2, B, 3H)
        w_hh = jnp.stack([params["fw"][1], params["bw"][1]])  # (2, H, 3H)
        b_hh = jnp.stack([params["fw"][3], params["bw"][3]])[:, None, :]  # (2, 1, 3H)

        def step(h, gi):
            gh = jnp.einsum("dbh,dhg->dbg", h, w_hh) + b_hh
            r = jax.nn.sigmoid(gi[..., :hdim] + gh[..., :hdim])
            z = jax.nn.sigmoid(gi[..., hdim : 2 * hdim] + gh[..., hdim : 2 * hdim])
            n = jnp.tanh(gi[..., 2 * hdim :] + r * gh[..., 2 * hdim :])
            h = (1.0 - z) * n + z * h
            return h, h

        h0 = jnp.zeros((2, x.shape[0], hdim), x.dtype)
        _, ys = jax.lax.scan(step, h0, xs, unroll=4)  # (T, 2, B, H)
        fw = jnp.swapaxes(ys[:, 0], 0, 1)
        bw = jnp.swapaxes(ys[:, 1], 0, 1)[:, ::-1]
        return jnp.concatenate([fw, bw], axis=-1)
