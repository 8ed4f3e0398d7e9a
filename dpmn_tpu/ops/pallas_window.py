"""Fused Pallas kernel for PGRM's grouped multi-window cross-attention.

xprof tracing attributed ~60+ ms of the 124 ms flagship forward to HBM
layout copies from the XLA window-partition / head-split transposes
(ROADMAP.md).  This kernel performs, per batch element and entirely in
VMEM: channel-group slicing, the shift roll, window partition, per-head
scaled QK^T with relative bias (+ shift mask), softmax, AV, and the
faithful raw re-layout (model/pgrm.py:263) — emitting the concatenated
(H, W, dim) group outputs with zero HBM round-trips in between.

Used on the eval path only (pallas_call has no autodiff here); the XLA
formulation remains for training and as the fallback.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_grouped_window_attention(
    q: jax.Array,  # (B, H, W, dim), already includes qkv projections
    k: jax.Array,
    v: jax.Array,
    biases: Sequence[jax.Array],  # per group (gnum_heads, N_i, N_i)
    masks: Sequence,  # per group (nW_i, N_i, N_i) or None
    window_sizes: Sequence[int],
    shifts: Sequence[int],
    gnum_heads: int,
    qk_scale: float,
    interpret: bool = False,
) -> jax.Array:
    """Returns the faithful-layout attention output (B, H, W, dim)."""
    b, h, w, dim = q.shape
    n_group = len(window_sizes)
    channel = dim // n_group
    gch = channel // gnum_heads

    mask_inputs = [m if m is not None else jnp.zeros((1, 1, 1), jnp.float32) for m in masks]

    def kernel(q_ref, k_ref, v_ref, *rest):
        bias_refs = rest[: n_group]
        mask_refs = rest[n_group : 2 * n_group]
        out_ref = rest[2 * n_group]
        qb = q_ref[0]  # (H, W, dim)
        kb = k_ref[0]
        vb = v_ref[0]
        for i, (ws, sh) in enumerate(zip(window_sizes, shifts)):
            hb, wb = h // ws, w // ws
            nw, n = hb * wb, ws * ws
            # heads are contiguous gch-channel slices → per-head slicing
            # avoids head-split reshapes Mosaic cannot shape-cast
            for hd in range(gnum_heads):
                lo = i * channel + hd * gch
                sl = slice(lo, lo + gch)
                qg, kg, vg = qb[..., sl], kb[..., sl], vb[..., sl]
                if sh > 0:
                    qg = jnp.roll(jnp.roll(qg, -sh, axis=0), -sh, axis=1)
                    kg = jnp.roll(jnp.roll(kg, -sh, axis=0), -sh, axis=1)
                    vg = jnp.roll(jnp.roll(vg, -sh, axis=0), -sh, axis=1)

                def part(t):
                    t = t.reshape(hb, ws, wb, ws, gch)
                    t = jnp.transpose(t, (0, 2, 1, 3, 4))
                    return t.reshape(nw, n, gch)

                qw = part(qg) * qk_scale
                kw, vw = part(kg), part(vg)
                scores = jax.lax.dot_general(
                    qw, kw, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
                )  # (nW, N, N)
                scores = scores + bias_refs[i][hd][None]
                if shifts[i] > 0:
                    scores = scores + mask_refs[i][:]
                probs = jax.nn.softmax(scores, axis=-1)
                out = jax.lax.dot_general(
                    probs, vw, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
                )  # (nW, N, gch)
                # faithful raw re-layout (model/pgrm.py:263): C-order view of
                # the window-major buffer
                out_ref[0, :, :, lo : lo + gch] = out.reshape(h, w, gch)

    in_specs = [pl.BlockSpec((1, h, w, dim), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)] * 3
    for t in biases:
        in_specs.append(pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim, memory_space=pltpu.VMEM))
    for t in mask_inputs:
        in_specs.append(pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim, memory_space=pltpu.VMEM))

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w, dim), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, dim), q.dtype),
        interpret=interpret,
    )(q, k, v, *biases, *mask_inputs)
