"""Pallas TPU kernels for the hot ops (SURVEY §2 P3).

1. fused GRU scan — the TSRN/TATT SRBs run bi-GRU sweeps over rows/columns
   (model/tsrn.py:132-150); under lax.scan every step round-trips the hidden
   state through HBM and re-launches fusion chains.  The Pallas kernel keeps
   h resident in VMEM for the whole sequence and fuses the hidden matmul
   (MXU) with the gate algebra (VPU) per step.

2. fused multi-window cross-attention for PGRM (model/pgrm.py:184-271):
   one kernel computes QK^T + relative bias (+ shift mask) + softmax + AV
   for a whole window group without materializing the (nW, N, N) attention
   tensor in HBM.

Both have jnp reference paths; callers choose via use_pallas flags after
benchmarking on the target chip (tiny model dims mean XLA fusion is often
competitive — measure, don't assume).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------- GRU scan


def _gru_kernel(x_proj_ref, w_hh_ref, b_hh_ref, out_ref, h_scratch):
    """One batch-tile of a full GRU sequence.

    x_proj_ref: (TILE_N, T, 3H) input projections (precomputed)
    w_hh_ref:   (H, 3H)
    b_hh_ref:   (1, 3H)
    out_ref:    (TILE_N, T, H)
    h_scratch:  (TILE_N, H) VMEM
    """
    t_len = x_proj_ref.shape[1]
    hdim = w_hh_ref.shape[0]
    h_scratch[:] = jnp.zeros_like(h_scratch)

    def step(t, _):
        gi = x_proj_ref[:, t, :]  # (TILE_N, 3H)
        h = h_scratch[:]
        gh = jnp.dot(h, w_hh_ref[:], preferred_element_type=jnp.float32) + b_hh_ref[0]
        r = jax.nn.sigmoid(gi[:, :hdim] + gh[:, :hdim])
        z = jax.nn.sigmoid(gi[:, hdim : 2 * hdim] + gh[:, hdim : 2 * hdim])
        n = jnp.tanh(gi[:, 2 * hdim :] + r * gh[:, 2 * hdim :])
        h_new = (1.0 - z) * n + z * h
        h_scratch[:] = h_new
        out_ref[:, t, :] = h_new
        return 0

    jax.lax.fori_loop(0, t_len, step, 0)


def pallas_gru_scan(x_proj: jax.Array, w_hh: jax.Array, b_hh: jax.Array,
                    reverse: bool = False, tile_n: int = 256, interpret: bool = False) -> jax.Array:
    """(N, T, 3H) precomputed input projections → (N, T, H) hidden states.

    The reverse direction runs the same kernel on the time-flipped input.
    """
    if reverse:
        return pallas_gru_scan(x_proj[:, ::-1], w_hh, b_hh, False, tile_n, interpret)[:, ::-1]
    n, t, h3 = x_proj.shape
    hdim = h3 // 3
    tile_n = min(tile_n, n)
    pad_n = (-n) % tile_n
    if pad_n:
        x_proj = jnp.pad(x_proj, ((0, pad_n), (0, 0), (0, 0)))
    n_pad = x_proj.shape[0]

    out = pl.pallas_call(
        _gru_kernel,
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, t, h3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, h3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, t, hdim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, t, hdim), x_proj.dtype),
        scratch_shapes=[pltpu.VMEM((tile_n, hdim), jnp.float32)],
        interpret=interpret,
    )(x_proj, w_hh, b_hh.reshape(1, h3))
    return out[:n]


def pallas_bigru(x: jax.Array, params: dict, tile_n: int = 256, interpret: bool = False) -> jax.Array:
    """Bidirectional GRU with ops/gru.py BiGRU's param dict; (B, T, I) → (B, T, 2H)."""
    fw = pallas_gru_scan(x @ params["w_ih_fw"] + params["b_ih_fw"], params["w_hh_fw"],
                         params["b_hh_fw"], False, tile_n, interpret)
    bw = pallas_gru_scan(x @ params["w_ih_bw"] + params["b_ih_bw"], params["w_hh_bw"],
                         params["b_hh_bw"], True, tile_n, interpret)
    return jnp.concatenate([fw, bw], axis=-1)


# ------------------------------------------- fused window cross-attention


def _window_attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref):
    """One tile of window attention.

    q/k/v: (TILE_W, N, C) windows; bias: (H, N, N) broadcast over windows;
    mask: (TILE_W, N, N) additive (zeros when unshifted); out: (TILE_W, N, C).
    Heads are folded into the tile loop by the caller (C = per-head dim
    stacked windows*heads on the leading axis).
    """
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (TILE_W, N, N)
    scores = scores + bias_ref[:] + mask_ref[:]
    attn = jax.nn.softmax(scores, axis=-1)
    out_ref[:] = jax.lax.dot_general(
        attn, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )


def pallas_window_attention(q, k, v, bias, mask=None, tile_w: int = 32, interpret: bool = False):
    """q/k/v: (W, N, C) scaled query / key / value windows (W = batch*nW*heads
    folded), bias: (W, N, N) additive relative-position bias (+ shift mask
    pre-added).  Returns (W, N, C)."""
    w, n, c = q.shape
    if mask is None:
        mask = jnp.zeros((w, n, n), q.dtype)
    tile_w = min(tile_w, w)
    pad = (-w) % tile_w
    if pad:
        q, k, v = (jnp.pad(t, ((0, pad), (0, 0), (0, 0))) for t in (q, k, v))
        bias = jnp.pad(bias, ((0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0), (0, 0)))
    wp = q.shape[0]

    out = pl.pallas_call(
        _window_attn_kernel,
        grid=(wp // tile_w,),
        in_specs=[
            pl.BlockSpec((tile_w, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_w, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_w, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_w, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_w, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_w, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((wp, n, c), q.dtype),
        interpret=interpret,
    )(q, k, v, bias, mask)
    return out[:w]
