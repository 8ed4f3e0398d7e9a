"""Training-path Pallas kernels for PGRM's grouped window cross-attention.

The eval path runs the fully-fused forward kernel (ops/pallas_window.py);
training previously fell back to the XLA formulation because pallas_call
has no autodiff — the joint train step spent most of its 312 ms in the XLA
window attention forward+backward and its layout churn.  This module gives
the attention core a custom VJP with hand-written forward AND backward
kernels:

  forward  (B,H,W,dim) q/k/v → faithful-layout attention out (B,H,W,dim)
           with attention dropout generated in-kernel (pltpu PRNG)
  backward recomputes windows/scores/probs per (group, batch) tile
           (flash-attention style — nothing but the primal inputs is saved),
           regenerates the identical dropout mask by reseeding the PRNG
           with the same per-(batch, group) seed, and emits dq, dk, dv and
           the packed-bias gradient.

Scores use the packed MXU formulation of ops/pallas_window.py:
128-row tiles of whole windows against the additive packed bias
(build_packed_bias), so ws=2 windows don't degrade into 4x4 dots.
Cross-window score entries sit at -1e9 in the packed bias → their probs
and dS vanish, so dropout on the dense 128x128 tile is semantically the
reference's per-window dropout.

Semantics mirror model/pgrm.py:184-271 (reference) with the faithful raw
re-layout (pgrm.py:263); dropout follows nn.Dropout: keep w.p. keep_prob,
scale kept entries by 1/keep_prob.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _part_rows(t, ws, h, w, ch):
    """(H, W, ch) → (H*W, ch) window-major rows (the packed row order)."""
    hb, wb = h // ws, w // ws
    t = t.reshape(hb, ws, wb, ws, ch)
    t = jnp.transpose(t, (0, 2, 1, 3, 4))
    return t.reshape(h * w, ch)


def _unpart_rows(rows, ws, h, w, ch):
    """Inverse of _part_rows: (H*W, ch) window-major rows → (H, W, ch)."""
    hb, wb = h // ws, w // ws
    t = rows.reshape(hb, wb, ws, ws, ch)
    t = jnp.transpose(t, (0, 2, 1, 3, 4))
    return t.reshape(h, w, ch)


_SEED_HEADROOM = 1 << 20  # must match the randint upper-bound slack in
# models/pgrm.py (seed < 2^31 - 1 - 2^20), so seed + i*n_group + g cannot
# wrap int32 (round-1 advisor item, closed with this static guard)


def _check_seed_headroom(b, n_group, keep_prob):
    if keep_prob < 1.0 and b * n_group > _SEED_HEADROOM:
        raise ValueError(
            f"dropout PRNG stream-id headroom exceeded: batch {b} x {n_group} "
            f"window groups > 2^20 — the in-kernel seed + i*n_group + g "
            "offset would wrap int32"
        )


def _dropout_mask(shape, keep_prob):
    """0 / (1/keep) float mask from the seeded in-kernel PRNG."""
    bits = pltpu.prng_random_bits(shape)  # int32 bits
    # uniform in [0, 2^31): use the non-negative 31 bits so the threshold
    # compare stays in int32
    u = jax.lax.bitwise_and(bits, np.int32(0x7FFFFFFF))
    thresh = np.int32(min(int(keep_prob * 2147483648.0), 2147483647))
    return jnp.where(u < thresh, np.float32(1.0 / keep_prob), np.float32(0.0))


def _attn_head_bwd(qp, kp, vp, dop, bias_gh, scale, keep_prob, use_dropout):
    """Per-head packed attention backward (qp PRE-scaled; the PRNG must
    already be seeded for this group so the mask draw order matches the
    forward).  Returns (ds_f32, dqp, dkp, dvp); shared by all three
    backward kernels."""
    npack = qp.shape[0]
    scores = jax.lax.dot_general(
        qp, kp, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) + bias_gh
    probs = jax.nn.softmax(scores, axis=-1)  # (npack, 128, 128)
    if use_dropout:
        m = _dropout_mask((npack, 128, 128), keep_prob)
        probs_d = probs * m
    else:
        probs_d = probs
    # dV = Pd^T dO (probs cast to the io dtype for matching dot operands —
    # bf16 AMP path, identity in fp32)
    dvp = jax.lax.dot_general(
        probs_d.astype(dop.dtype), dop, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (npack, 128, gch)
    # dPd = dO V^T
    dpd = jax.lax.dot_general(
        dop, vp, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (npack, 128, 128)
    dp = dpd * m if use_dropout else dpd
    row = jnp.sum(dp * probs, axis=-1, keepdims=True)
    ds = probs * (dp - row)
    # dQ = scale * dS K ; dK = dS^T (scale*Q) (scale inside qp)
    ds_io = ds.astype(kp.dtype)
    dqp = jax.lax.dot_general(
        ds_io, kp, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    dkp = jax.lax.dot_general(
        ds_io, qp, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    return ds, dqp, dkp, dvp


def _core_fwd(q3, k3, v3, packed_bias, seed, window_sizes, shifts, gnum_heads,
              scale, keep_prob, interpret):
    b, h, w, dim = q3.shape
    hw = h * w
    n_group = len(window_sizes)
    _check_seed_headroom(b, n_group, keep_prob)
    channel = dim // n_group
    gch = channel // gnum_heads
    npack = hw // 128
    use_dropout = keep_prob < 1.0

    def kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref):
        i = pl.program_id(0)
        qb3, kb3, vb3 = q_ref[0], k_ref[0], v_ref[0]

        def store(hd, lo, out_f32):
            # faithful raw re-layout (pgrm.py:263) == packed row order
            out_ref[0, :, :, lo : lo + gch] = out_f32.astype(out_ref.dtype)

        for g, (ws, sh) in enumerate(zip(window_sizes, shifts)):
            if use_dropout:
                pltpu.prng_seed(seed_ref[0] + i * n_group + g)
            _attn_group_fwd(qb3, kb3, vb3, bias_ref, store, g, ws, sh, h, w,
                            channel, gnum_heads, gch, npack, scale, keep_prob,
                            use_dropout)

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w, dim), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, dim), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, dim), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(packed_bias.shape, lambda i: (0,) * packed_bias.ndim, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, dim), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, dim), q3.dtype),
        interpret=interpret,
    )(seed, q3, k3, v3, packed_bias)


def _core_bwd(q3, k3, v3, packed_bias, seed, dout, window_sizes, shifts,
              gnum_heads, scale, keep_prob, interpret):
    b, h, w, dim = q3.shape
    hw = h * w
    n_group = len(window_sizes)
    channel = dim // n_group
    gch = channel // gnum_heads
    npack = hw // 128
    heads = gnum_heads
    use_dropout = keep_prob < 1.0

    def kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, dout_ref,
               dq_ref, dk_ref, dv_ref, dbias_ref):
        i = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when((i == 0) & (g == 0))
        def _init():
            dbias_ref[...] = jnp.zeros_like(dbias_ref)

        # one (batch, group) tile per step; group is the FAST grid axis so
        # the dq/dk/dv blocks for batch element i are revisited on
        # consecutive steps (their channel slices fill across the g visits),
        # while the constant-index dbias accumulator stays resident for the
        # whole grid
        for gg, (ws_, sh_) in enumerate(zip(window_sizes, shifts)):

            @pl.when(g == gg)
            def _run(ws=ws_, sh=sh_, gg=gg):
                if use_dropout:
                    pltpu.prng_seed(seed_ref[0] + i * n_group + gg)
                csl = slice(gg * channel, (gg + 1) * channel)
                qg = q_ref[0][..., csl]  # (H, W, channel)
                kg = k_ref[0][..., csl]
                vg = v_ref[0][..., csl]
                if sh > 0:
                    qg = jnp.roll(jnp.roll(qg, -sh, axis=0), -sh, axis=1)
                    kg = jnp.roll(jnp.roll(kg, -sh, axis=0), -sh, axis=1)
                    vg = jnp.roll(jnp.roll(vg, -sh, axis=0), -sh, axis=1)
                qw = _part_rows(qg, ws, h, w, channel)
                kw = _part_rows(kg, ws, h, w, channel)
                vw = _part_rows(vg, ws, h, w, channel)
                # fwd wrote faithful layout = packed rows viewed as (H, W, c),
                # so the incoming cotangent rows are already window-major
                dow = dout_ref[0][..., csl].reshape(hw, channel)
                qw = qw * scale
                for hd in range(heads):
                    hsl = slice(hd * gch, (hd + 1) * gch)
                    qp = qw[:, hsl].reshape(npack, 128, gch)
                    kp = kw[:, hsl].reshape(npack, 128, gch)
                    vp = vw[:, hsl].reshape(npack, 128, gch)
                    dop = dow[:, hsl].reshape(npack, 128, gch)
                    ds, dqp, dkp, dvp = _attn_head_bwd(
                        qp, kp, vp, dop, bias_ref[0, hd], scale, keep_prob, use_dropout
                    )
                    dbias_ref[gg, hd] += ds
                    # per-head un-partition + un-roll + write (no scratch)
                    lo = gg * channel + hd * gch
                    for dref, rows in ((dq_ref, dqp), (dk_ref, dkp), (dv_ref, dvp)):
                        d3 = _unpart_rows(rows.reshape(hw, gch), ws, h, w, gch)
                        if sh > 0:
                            d3 = jnp.roll(jnp.roll(d3, sh, axis=0), sh, axis=1)
                        dref[0, :, :, lo : lo + gch] = d3.astype(dref.dtype)

    grid = (b, n_group)
    io_block = pl.BlockSpec((1, h, w, dim), lambda i, g: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv, dbias = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            io_block,
            io_block,
            io_block,
            pl.BlockSpec(
                (1, heads, npack, 128, 128),
                lambda i, g: (g, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            io_block,
        ],
        out_specs=[
            io_block,
            io_block,
            io_block,
            pl.BlockSpec(
                (n_group, heads, npack, 128, 128),
                lambda i, g: (0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, dim), q3.dtype),
            jax.ShapeDtypeStruct((b, h, w, dim), q3.dtype),
            jax.ShapeDtypeStruct((b, h, w, dim), q3.dtype),
            jax.ShapeDtypeStruct((n_group, heads, npack, 128, 128), jnp.float32),
        ],
        # the resident dbias accumulator + double-buffered io blocks sit just
        # past the 16 MB default scoped-vmem limit; v5e has far more
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
        interpret=interpret,
    )(seed, q3, k3, v3, packed_bias, dout)
    return dq, dk, dv, dbias


def _ln_fwd_f32(x, scale, bias, eps=1e-6):
    """LayerNorm in f32 regardless of io dtype; returns (y_dt, xhat_f32,
    rstd_f32) — xhat/rstd are what the backward needs."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    y = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype), xhat, rstd


def _ln_bwd_f32(dy, xhat, rstd, scale):
    """dx for y = xhat*scale + bias (dy, xhat, rstd f32). Row-wise:
    dx = rstd * (dxhat - mean(dxhat) - xhat * mean(dxhat * xhat))."""
    dxhat = dy * scale.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return rstd * (dxhat - m1 - xhat * m2)


def _attn_group_fwd(qb3, kb3, vb3, bias_ref, out_store, g, ws, sh, h, w,
                    channel, gnum_heads, gch, npack, scale, keep_prob,
                    use_dropout):
    """One window-size group of the packed attention forward; out_store is a
    callback (hd, lo, out_f32) that places the (h, w, gch) result."""
    hw = h * w
    sl = slice(g * channel, (g + 1) * channel)
    qg, kg, vg = qb3[..., sl], kb3[..., sl], vb3[..., sl]
    if sh > 0:
        qg = jnp.roll(jnp.roll(qg, -sh, axis=0), -sh, axis=1)
        kg = jnp.roll(jnp.roll(kg, -sh, axis=0), -sh, axis=1)
        vg = jnp.roll(jnp.roll(vg, -sh, axis=0), -sh, axis=1)
    qw = _part_rows(qg, ws, h, w, channel) * scale
    kw = _part_rows(kg, ws, h, w, channel)
    vw = _part_rows(vg, ws, h, w, channel)
    for hd in range(gnum_heads):
        hsl = slice(hd * gch, (hd + 1) * gch)
        qp = qw[:, hsl].reshape(npack, 128, gch)
        kp = kw[:, hsl].reshape(npack, 128, gch)
        vp = vw[:, hsl].reshape(npack, 128, gch)
        scores = jax.lax.dot_general(
            qp, kp, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) + bias_ref[g, hd]
        probs = jax.nn.softmax(scores, axis=-1)
        if use_dropout:
            probs = probs * _dropout_mask((npack, 128, 128), keep_prob)
        out = jax.lax.dot_general(
            probs.astype(vp.dtype), vp, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        lo = g * channel + hd * gch
        out_store(hd, lo, out.reshape(h, w, gch))


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16, 17, 18))
def window_attention_block_core(xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv,
                                packed_bias, seed, window_sizes, shifts,
                                gnum_heads, scale, keep_prob, hw_shape,
                                interpret=False):
    """LN(norm1_q/kv) + Q/KV projections + grouped window cross-attention in
    ONE custom-VJP Pallas pair (the training analogue of the eval path's
    fused_window_attention_block, ops/pallas_window.py:157).

    Fusing the projections kills the q/kv HBM round-trip (75 MB per call at
    batch 64 fp32) and the XLA↔Pallas relayout copies on both sides of the
    old attention-only core.  The backward is fully recomputing
    (flash-style): per batch element it re-runs LN + projections + scores +
    probs (regenerating the dropout mask by reseeding the in-kernel PRNG),
    then emits dxq, dxkv and accumulates the LN/projection/bias weight
    gradients across the batch grid in resident VMEM accumulators.

    xq/xkv: (B, H, W, c) PRE-norm tokens; returns the faithful-layout
    attention output (B, H, W, dim), pre-SKConv (the residual/DropPath and
    SKConv stay in XLA where flax handles them).
    """
    return _block_fwd(xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv, packed_bias,
                      seed, window_sizes, shifts, gnum_heads, scale, keep_prob,
                      hw_shape, interpret)


def _block_fwd(xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv, packed_bias, seed,
               window_sizes, shifts, gnum_heads, scale, keep_prob, hw_shape,
               interpret):
    b, h, w, c = xq.shape
    hw = h * w
    dim = wq.shape[1]
    n_group = len(window_sizes)
    _check_seed_headroom(b, n_group, keep_prob)
    channel = dim // n_group
    gch = channel // gnum_heads
    npack = hw // 128
    use_dropout = keep_prob < 1.0
    dt = xq.dtype

    def kernel(seed_ref, xq_ref, xkv_ref, qs_ref, qb_ref, ks_ref, kb_ref,
               wq_ref, bq_ref, wkv_ref, bkv_ref, bias_ref, out_ref):
        i = pl.program_id(0)
        xq_t = xq_ref[0].reshape(hw, c)
        xkv_t = xkv_ref[0].reshape(hw, c)
        xq_ln, _, _ = _ln_fwd_f32(xq_t, qs_ref[:], qb_ref[:])
        xkv_ln, _, _ = _ln_fwd_f32(xkv_t, ks_ref[:], kb_ref[:])
        q_full = (jax.lax.dot_general(
            xq_ln, wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bq_ref[:]).astype(dt)
        kv_full = (jax.lax.dot_general(
            xkv_ln, wkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bkv_ref[:]).astype(dt)
        qb3 = q_full.reshape(h, w, dim)
        kb3 = kv_full[:, :dim].reshape(h, w, dim)
        vb3 = kv_full[:, dim:].reshape(h, w, dim)

        def store(hd, lo, out_f32):
            out_ref[0, :, :, lo : lo + gch] = out_f32.astype(out_ref.dtype)

        for g, (ws, sh) in enumerate(zip(window_sizes, shifts)):
            if use_dropout:
                pltpu.prng_seed(seed_ref[0] + i * n_group + g)
            _attn_group_fwd(qb3, kb3, vb3, bias_ref, store, g, ws, sh, h, w,
                            channel, gnum_heads, gch, npack, scale, keep_prob,
                            use_dropout)

    small = [qs, qb, ks, kb, wq, bq, wkv, bkv]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for t in small + [packed_bias]
    ]
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w, dim), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, dim), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(seed, xq, xkv, *small, packed_bias)


def _block_bwd_impl(xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv, packed_bias,
                    seed, dout, window_sizes, shifts, gnum_heads, scale,
                    keep_prob, hw_shape, interpret):
    b, h, w, c = xq.shape
    hw = h * w
    dim = wq.shape[1]
    n_group = len(window_sizes)
    channel = dim // n_group
    gch = channel // gnum_heads
    npack = hw // 128
    use_dropout = keep_prob < 1.0
    dt = xq.dtype

    def kernel(seed_ref, xq_ref, xkv_ref, qs_ref, qb_ref, ks_ref, kb_ref,
               wq_ref, bq_ref, wkv_ref, bkv_ref, bias_ref, dout_ref,
               dxq_ref, dxkv_ref, dqs_ref, dqb_ref, dks_ref, dkb_ref,
               dwq_ref, dbq_ref, dwkv_ref, dbkv_ref, dbias_ref,
               dq_sc, dkv_sc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            for r in (dqs_ref, dqb_ref, dks_ref, dkb_ref, dwq_ref, dbq_ref,
                      dwkv_ref, dbkv_ref, dbias_ref):
                r[...] = jnp.zeros_like(r)

        # ---- recompute LN + projections (keep xhat/rstd for the LN bwd)
        xq_t = xq_ref[0].reshape(hw, c)
        xkv_t = xkv_ref[0].reshape(hw, c)
        xq_ln, xhat_q, rstd_q = _ln_fwd_f32(xq_t, qs_ref[:], qb_ref[:])
        xkv_ln, xhat_kv, rstd_kv = _ln_fwd_f32(xkv_t, ks_ref[:], kb_ref[:])
        q_full = (jax.lax.dot_general(
            xq_ln, wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bq_ref[:]).astype(dt)
        kv_full = (jax.lax.dot_general(
            xkv_ln, wkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bkv_ref[:]).astype(dt)
        qb3 = q_full.reshape(h, w, dim)
        kb3 = kv_full[:, :dim].reshape(h, w, dim)
        vb3 = kv_full[:, dim:].reshape(h, w, dim)

        # ---- attention bwd per (group, head); dq/dk/dv land in scratches
        for g, (ws, sh) in enumerate(zip(window_sizes, shifts)):
            if use_dropout:
                pltpu.prng_seed(seed_ref[0] + i * n_group + g)
            csl = slice(g * channel, (g + 1) * channel)
            qg, kg, vg = qb3[..., csl], kb3[..., csl], vb3[..., csl]
            if sh > 0:
                qg = jnp.roll(jnp.roll(qg, -sh, axis=0), -sh, axis=1)
                kg = jnp.roll(jnp.roll(kg, -sh, axis=0), -sh, axis=1)
                vg = jnp.roll(jnp.roll(vg, -sh, axis=0), -sh, axis=1)
            qw = _part_rows(qg, ws, h, w, channel)
            kw = _part_rows(kg, ws, h, w, channel)
            vw = _part_rows(vg, ws, h, w, channel)
            # fwd wrote faithful layout = packed rows viewed as (H, W, c)
            dow = dout_ref[0][..., csl].reshape(hw, channel)
            qw = qw * scale
            for hd in range(gnum_heads):
                hsl = slice(hd * gch, (hd + 1) * gch)
                qp = qw[:, hsl].reshape(npack, 128, gch)
                kp = kw[:, hsl].reshape(npack, 128, gch)
                vp = vw[:, hsl].reshape(npack, 128, gch)
                dop = dow[:, hsl].reshape(npack, 128, gch)
                ds, dqp, dkp, dvp = _attn_head_bwd(
                    qp, kp, vp, dop, bias_ref[g, hd], scale, keep_prob, use_dropout
                )
                dbias_ref[g, hd] += ds
                lo_k = g * channel + hd * gch
                for sc, rows, off in ((dq_sc, dqp, 0), (dkv_sc, dkp, 0), (dkv_sc, dvp, dim)):
                    d3 = _unpart_rows(rows.reshape(hw, gch), ws, h, w, gch)
                    if sh > 0:
                        d3 = jnp.roll(jnp.roll(d3, sh, axis=0), sh, axis=1)
                    sc[:, off + lo_k : off + lo_k + gch] = d3.reshape(hw, gch)

        # ---- projection bwd + weight-grad accumulation
        dq_full = dq_sc[:]
        dkv_full = dkv_sc[:]
        dxq_ln = jax.lax.dot_general(
            dq_full.astype(dt), wq_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dxkv_ln = jax.lax.dot_general(
            dkv_full.astype(dt), wkv_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwq_ref[...] += jax.lax.dot_general(
            xq_ln, dq_full.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbq_ref[...] += jnp.sum(dq_full, axis=0)
        dwkv_ref[...] += jax.lax.dot_general(
            xkv_ln, dkv_full.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbkv_ref[...] += jnp.sum(dkv_full, axis=0)

        # ---- LN bwd
        dqs_ref[...] += jnp.sum(dxq_ln * xhat_q, axis=0)
        dqb_ref[...] += jnp.sum(dxq_ln, axis=0)
        dks_ref[...] += jnp.sum(dxkv_ln * xhat_kv, axis=0)
        dkb_ref[...] += jnp.sum(dxkv_ln, axis=0)
        dxq_ref[0] = _ln_bwd_f32(dxq_ln, xhat_q, rstd_q, qs_ref[:]).reshape(h, w, c).astype(dxq_ref.dtype)
        dxkv_ref[0] = _ln_bwd_f32(dxkv_ln, xhat_kv, rstd_kv, ks_ref[:]).reshape(h, w, c).astype(dxkv_ref.dtype)

    small = [qs, qb, ks, kb, wq, bq, wkv, bkv]
    io_block = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    const = lambda t: pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd, memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), io_block, io_block] + [
        const(t) for t in small + [packed_bias]
    ] + [pl.BlockSpec((1, h, w, dim), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)]
    out_specs = [io_block, io_block] + [const(t) for t in small + [packed_bias]]
    out_shape = [
        jax.ShapeDtypeStruct((b, h, w, c), dt),
        jax.ShapeDtypeStruct((b, h, w, c), dt),
    ] + [jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in small + [packed_bias]]
    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((hw, dim), jnp.float32),
            pltpu.VMEM((hw, 2 * dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(seed, xq, xkv, *small, packed_bias, dout)
    dxq, dxkv, dqs, dqb, dks, dkb, dwq, dbq, dwkv, dbkv, dbias = outs
    cast_to = lambda g, t: g.astype(t.dtype)
    return (dxq, dxkv, cast_to(dqs, qs), cast_to(dqb, qb), cast_to(dks, ks),
            cast_to(dkb, kb), cast_to(dwq, wq), cast_to(dbq, bq),
            cast_to(dwkv, wkv), cast_to(dbkv, bkv),
            dbias.astype(packed_bias.dtype))


def _block_vjp_fwd(xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv, packed_bias,
                   seed, window_sizes, shifts, gnum_heads, scale, keep_prob,
                   hw_shape, interpret):
    out = _block_fwd(xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv, packed_bias,
                     seed, window_sizes, shifts, gnum_heads, scale, keep_prob,
                     hw_shape, interpret)
    return out, (xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv, packed_bias, seed)


def _block_vjp_bwd(window_sizes, shifts, gnum_heads, scale, keep_prob,
                   hw_shape, interpret, res, dout):
    (xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv, packed_bias, seed) = res
    grads = _block_bwd_impl(xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv,
                            packed_bias, seed, dout, window_sizes, shifts,
                            gnum_heads, scale, keep_prob, hw_shape, interpret)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return grads + (dseed,)


window_attention_block_core.defvjp(_block_vjp_fwd, _block_vjp_bwd)


def _norm_cdf(x):
    """Φ(x) via the Abramowitz-Stegun 7.1.26 erf (Pallas lowers no erf)."""
    z = x * (2.0 ** -0.5)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))
    return 0.5 * (1.0 + erf)


def _gelu_grad(x):
    """d/dx [x·Φ(x)] = Φ(x) + x·φ(x) (exact-gelu derivative)."""
    return _norm_cdf(x) + x * jnp.exp(-0.5 * x * x) * np.float32(0.3989422804014327)


def _skconv_fwd_parts(tokens, pk, pb, f1k, f1b, f2k, f2b, phk, phb, n_group,
                      channel):
    """SKConv forward on f32 (hw, dim) tokens (model/pgrm.py:62-96; the same
    math as the eval kernel's tail, ops/pallas_window.py:293-321).  Returns
    (out, intermediates-for-bwd)."""
    hw = tokens.shape[0]
    feats = jax.lax.dot_general(tokens, pk, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) + pb
    from .pallas_window import _gelu_erf

    g = _gelu_erf(feats)
    s_vec = jnp.mean(g, axis=0, keepdims=True)  # (1, dim)
    u = jax.lax.dot_general(s_vec, f1k, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + f1b
    z = _gelu_erf(u)
    a = jax.lax.dot_general(z, f2k, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + f2b  # (1, m*channel)
    parts = [a[:, j * channel : (j + 1) * channel] for j in range(n_group)]
    mx = parts[0]
    for p in parts[1:]:
        mx = jnp.maximum(mx, p)
    exps = [jnp.exp(p - mx) for p in parts]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    wgts = [e / denom for e in exps]  # per group (1, channel)
    feats_v = jnp.zeros((hw, channel), jnp.float32)
    for j in range(n_group):
        feats_v = feats_v + tokens[:, j * channel : (j + 1) * channel] * wgts[j]
    out_v = jax.lax.dot_general(feats_v, phk, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) + phb
    out = feats + out_v
    return out, (feats, s_vec, u, z, wgts, feats_v)


def _skconv_bwd_parts(dout, tokens, inter, pk, f1k, f2k, phk, n_group, channel,
                      accum):
    """SKConv backward: returns (dtokens_mm, dtok_cols) — the matmul part of
    dtokens plus the per-group gating contributions (the caller adds them
    slice-wise into a ref; Mosaic-friendlier than a lane concat) — and calls
    accum(name, grad) for each weight gradient."""
    hw = tokens.shape[0]
    feats, s_vec, u, z, wgts, feats_v = inter
    # out = feats + feats_v @ phk + phb
    dfeats_v = jax.lax.dot_general(dout, phk, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)  # (hw, channel)
    accum("ph_kernel", jax.lax.dot_general(
        feats_v, dout, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    accum("ph_bias", jnp.sum(dout, axis=0))
    # feats_v = Σ_j tokens_j ⊙ w_j
    dtok_cols = []
    dws = []
    for j in range(n_group):
        tj = tokens[:, j * channel : (j + 1) * channel]
        dtok_cols.append(dfeats_v * wgts[j])
        dws.append(jnp.sum(dfeats_v * tj, axis=0, keepdims=True))  # (1, channel)
    # softmax-over-groups bwd (per channel)
    wsum = dws[0] * wgts[0]
    for j in range(1, n_group):
        wsum = wsum + dws[j] * wgts[j]
    das = [wgts[j] * (dws[j] - wsum) for j in range(n_group)]
    # a = z @ f2k + f2b; handled per group column block so no lane-axis
    # concatenate is needed inside the kernel (accum supports col slices)
    dz = None
    for j in range(n_group):
        sl = slice(j * channel, (j + 1) * channel)
        dz_j = jax.lax.dot_general(das[j], f2k[:, sl], (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)  # (1, d)
        dz = dz_j if dz is None else dz + dz_j
        accum("fc2_kernel", jax.lax.dot_general(
            z, das[j], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32),
            sl)
        accum("fc2_bias", das[j][0], sl)
    # z = gelu(u); u = s @ f1k + f1b
    du = dz * _gelu_grad(u)
    ds_vec = jax.lax.dot_general(du, f1k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (1, dim)
    accum("fc1_kernel", jax.lax.dot_general(
        s_vec, du, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    accum("fc1_bias", du[0])
    # s = mean_rows(gelu(feats))
    dg = jnp.broadcast_to(ds_vec * np.float32(1.0 / hw), feats.shape)
    dfeats = dout + dg * _gelu_grad(feats)
    # feats = tokens @ pk + pb
    dtokens = jax.lax.dot_general(dfeats, pk, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    accum("proj_kernel", jax.lax.dot_general(
        tokens, dfeats, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    accum("proj_bias", jnp.sum(dfeats, axis=0))
    return dtokens, dtok_cols


_FULL_WNAMES = ("qs", "qb", "ks", "kb", "wq", "bq", "wkv", "bkv",
                "proj_kernel", "proj_bias", "fc1_kernel", "fc1_bias",
                "fc2_kernel", "fc2_bias", "ph_kernel", "ph_bias")


@functools.partial(jax.custom_vjp, nondiff_argnums=(20, 21, 22, 23, 24, 25, 26))
def window_attention_full_core(xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv,
                               pk, pb, f1k, f1b, f2k, f2b, phk, phb,
                               packed_bias, seed, window_sizes, shifts,
                               gnum_heads, scale, keep_prob, hw_shape,
                               interpret=False):
    """The WHOLE WindowAttention training forward in one custom-VJP Pallas
    pair: LN (norm1_q/kv) + Q/KV projections + grouped packed window
    attention (in-kernel dropout) + SKConv — the training analogue of the
    eval path's fused_window_attention_block (ops/pallas_window.py:157),
    minus the residual add which stays in XLA under DropPath.

    The backward recomputes everything per batch element (attention twice:
    once to rebuild the SKConv input tokens, once inside the attention
    backward — scores are cheap next to the saved HBM round-trips), chains
    SKConv → attention → projection → LN gradients, and accumulates all 16
    weight grads + the packed-bias grad in resident VMEM accumulators.

    Returns (B, HW, dim) post-SKConv tokens.
    """
    return _full_fwd(xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv, pk, pb,
                     f1k, f1b, f2k, f2b, phk, phb, packed_bias, seed,
                     window_sizes, shifts, gnum_heads, scale, keep_prob,
                     hw_shape, interpret)


def _full_fwd(xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv, pk, pb, f1k, f1b,
              f2k, f2b, phk, phb, packed_bias, seed, window_sizes, shifts,
              gnum_heads, scale, keep_prob, hw_shape, interpret):
    b, h, w, c = xq.shape
    hw = h * w
    dim = wq.shape[1]
    n_group = len(window_sizes)
    _check_seed_headroom(b, n_group, keep_prob)
    channel = dim // n_group
    gch = channel // gnum_heads
    npack = hw // 128
    use_dropout = keep_prob < 1.0
    dt = xq.dtype

    def kernel(seed_ref, xq_ref, xkv_ref, qs_ref, qb_ref, ks_ref, kb_ref,
               wq_ref, bq_ref, wkv_ref, bkv_ref, pk_ref, pb_ref, f1k_ref,
               f1b_ref, f2k_ref, f2b_ref, phk_ref, phb_ref, bias_ref,
               out_ref, tok_sc):
        i = pl.program_id(0)
        xq_t = xq_ref[0].reshape(hw, c)
        xkv_t = xkv_ref[0].reshape(hw, c)
        xq_ln, _, _ = _ln_fwd_f32(xq_t, qs_ref[:], qb_ref[:])
        xkv_ln, _, _ = _ln_fwd_f32(xkv_t, ks_ref[:], kb_ref[:])
        q_full = (jax.lax.dot_general(
            xq_ln, wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bq_ref[:]).astype(dt)
        kv_full = (jax.lax.dot_general(
            xkv_ln, wkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bkv_ref[:]).astype(dt)
        qb3 = q_full.reshape(h, w, dim)
        kb3 = kv_full[:, :dim].reshape(h, w, dim)
        vb3 = kv_full[:, dim:].reshape(h, w, dim)

        def store(hd, lo, out_f32):
            tok_sc[:, lo : lo + gch] = out_f32.reshape(hw, gch)

        for g, (ws, sh) in enumerate(zip(window_sizes, shifts)):
            if use_dropout:
                pltpu.prng_seed(seed_ref[0] + i * n_group + g)
            _attn_group_fwd(qb3, kb3, vb3, bias_ref, store, g, ws, sh, h, w,
                            channel, gnum_heads, gch, npack, scale, keep_prob,
                            use_dropout)

        f32w = lambda r: r[:].astype(jnp.float32)
        out, _ = _skconv_fwd_parts(
            tok_sc[:], f32w(pk_ref), f32w(pb_ref), f32w(f1k_ref), f32w(f1b_ref),
            f32w(f2k_ref), f32w(f2b_ref), f32w(phk_ref), f32w(phb_ref),
            n_group, channel,
        )
        out_ref[0] = out.astype(out_ref.dtype)

    small = [qs, qb, ks, kb, wq, bq, wkv, bkv, pk, pb, f1k, f1b, f2k, f2b, phk, phb]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for t in small + [packed_bias]
    ]
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hw, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, dim), dt),
        scratch_shapes=[pltpu.VMEM((hw, dim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(seed, xq, xkv, *small, packed_bias)


def _full_bwd_impl(xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv, pk, pb, f1k,
                   f1b, f2k, f2b, phk, phb, packed_bias, seed, dout,
                   window_sizes, shifts, gnum_heads, scale, keep_prob,
                   hw_shape, interpret):
    b, h, w, c = xq.shape
    hw = h * w
    dim = wq.shape[1]
    n_group = len(window_sizes)
    channel = dim // n_group
    gch = channel // gnum_heads
    npack = hw // 128
    use_dropout = keep_prob < 1.0
    dt = xq.dtype
    small = [qs, qb, ks, kb, wq, bq, wkv, bkv, pk, pb, f1k, f1b, f2k, f2b, phk, phb]

    def kernel(*refs):
        (seed_ref, xq_ref, xkv_ref, qs_ref, qb_ref, ks_ref, kb_ref, wq_ref,
         bq_ref, wkv_ref, bkv_ref, pk_ref, pb_ref, f1k_ref, f1b_ref, f2k_ref,
         f2b_ref, phk_ref, phb_ref, bias_ref, dout_ref,
         dxq_ref, dxkv_ref) = refs[:23]
        grad_refs = dict(zip(_FULL_WNAMES, refs[23:39]))
        dbias_ref = refs[39]
        tok_sc, dtok_sc, dq_sc, dkv_sc, qw_sc, kw_sc, vw_sc = refs[40:47]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            for r in list(grad_refs.values()) + [dbias_ref]:
                r[...] = jnp.zeros_like(r)

        # ---- recompute LN + projections
        xq_t = xq_ref[0].reshape(hw, c)
        xkv_t = xkv_ref[0].reshape(hw, c)
        xq_ln, xhat_q, rstd_q = _ln_fwd_f32(xq_t, qs_ref[:], qb_ref[:])
        xkv_ln, xhat_kv, rstd_kv = _ln_fwd_f32(xkv_t, ks_ref[:], kb_ref[:])
        q_full = (jax.lax.dot_general(
            xq_ln, wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bq_ref[:]).astype(dt)
        kv_full = (jax.lax.dot_general(
            xkv_ln, wkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bkv_ref[:]).astype(dt)
        qb3 = q_full.reshape(h, w, dim)
        kb3 = kv_full[:, :dim].reshape(h, w, dim)
        vb3 = kv_full[:, dim:].reshape(h, w, dim)

        # ---- pass A: recompute attention fwd → tokens (same PRNG stream),
        # caching the scaled window-partitioned q/k/v so pass B skips the
        # roll + partition transposes
        for g, (ws, sh) in enumerate(zip(window_sizes, shifts)):
            if use_dropout:
                pltpu.prng_seed(seed_ref[0] + i * n_group + g)
            csl = slice(g * channel, (g + 1) * channel)
            qg, kg, vg = qb3[..., csl], kb3[..., csl], vb3[..., csl]
            if sh > 0:
                qg = jnp.roll(jnp.roll(qg, -sh, axis=0), -sh, axis=1)
                kg = jnp.roll(jnp.roll(kg, -sh, axis=0), -sh, axis=1)
                vg = jnp.roll(jnp.roll(vg, -sh, axis=0), -sh, axis=1)
            qw = _part_rows(qg, ws, h, w, channel) * scale
            kw = _part_rows(kg, ws, h, w, channel)
            vw = _part_rows(vg, ws, h, w, channel)
            qw_sc[:, csl] = qw.astype(jnp.float32)
            kw_sc[:, csl] = kw.astype(jnp.float32)
            vw_sc[:, csl] = vw.astype(jnp.float32)
            for hd in range(gnum_heads):
                hsl = slice(hd * gch, (hd + 1) * gch)
                qp = qw[:, hsl].reshape(npack, 128, gch).astype(dt)
                kp = kw[:, hsl].reshape(npack, 128, gch).astype(dt)
                vp = vw[:, hsl].reshape(npack, 128, gch).astype(dt)
                scores = jax.lax.dot_general(
                    qp, kp, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) + bias_ref[g, hd]
                probs = jax.nn.softmax(scores, axis=-1)
                if use_dropout:
                    probs = probs * _dropout_mask((npack, 128, 128), keep_prob)
                out = jax.lax.dot_general(
                    probs.astype(vp.dtype), vp, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                lo = g * channel + hd * gch
                tok_sc[:, lo : lo + gch] = out.reshape(hw, gch)

        # ---- SKConv fwd (for intermediates) + bwd → dtokens
        f32w = lambda r: r[:].astype(jnp.float32)
        tokens = tok_sc[:]
        _, inter = _skconv_fwd_parts(
            tokens, f32w(pk_ref), f32w(pb_ref), f32w(f1k_ref), f32w(f1b_ref),
            f32w(f2k_ref), f32w(f2b_ref), f32w(phk_ref), f32w(phb_ref),
            n_group, channel,
        )

        def accum(name, grad, col=None):
            if col is None:
                grad_refs[name][...] += grad
            elif len(grad_refs[name].shape) == 1:
                grad_refs[name][col] += grad
            else:
                grad_refs[name][:, col] += grad

        dtokens_mm, dtok_cols = _skconv_bwd_parts(
            dout_ref[0].astype(jnp.float32), tokens, inter, f32w(pk_ref),
            f32w(f1k_ref), f32w(f2k_ref), f32w(phk_ref), n_group, channel,
            accum,
        )
        dtok_sc[...] = dtokens_mm
        for j in range(n_group):
            dtok_sc[:, j * channel : (j + 1) * channel] += dtok_cols[j]

        # ---- pass B: attention bwd with dow = dtokens (reseed regenerates
        # the identical dropout masks; q/k/v partitions come from the pass-A
        # caches — qw_sc already carries the qk scale)
        for g, (ws, sh) in enumerate(zip(window_sizes, shifts)):
            if use_dropout:
                pltpu.prng_seed(seed_ref[0] + i * n_group + g)
            csl = slice(g * channel, (g + 1) * channel)
            qw = qw_sc[:, csl].astype(dt)
            kw = kw_sc[:, csl].astype(dt)
            vw = vw_sc[:, csl].astype(dt)
            dow = dtok_sc[:, csl]
            for hd in range(gnum_heads):
                hsl = slice(hd * gch, (hd + 1) * gch)
                qp = qw[:, hsl].reshape(npack, 128, gch)
                kp = kw[:, hsl].reshape(npack, 128, gch)
                vp = vw[:, hsl].reshape(npack, 128, gch)
                dop = dow[:, hsl].reshape(npack, 128, gch).astype(dt)
                ds, dqp, dkp, dvp = _attn_head_bwd(
                    qp, kp, vp, dop, bias_ref[g, hd], scale, keep_prob, use_dropout
                )
                dbias_ref[g, hd] += ds
                lo_k = g * channel + hd * gch
                for sc, rows, off in ((dq_sc, dqp, 0), (dkv_sc, dkp, 0), (dkv_sc, dvp, dim)):
                    d3 = _unpart_rows(rows.reshape(hw, gch), ws, h, w, gch)
                    if sh > 0:
                        d3 = jnp.roll(jnp.roll(d3, sh, axis=0), sh, axis=1)
                    sc[:, off + lo_k : off + lo_k + gch] = d3.reshape(hw, gch)

        # ---- projection bwd + weight grads + LN bwd (as the block kernel)
        dq_full = dq_sc[:]
        dkv_full = dkv_sc[:]
        dxq_ln = jax.lax.dot_general(
            dq_full.astype(dt), wq_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dxkv_ln = jax.lax.dot_general(
            dkv_full.astype(dt), wkv_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        grad_refs["wq"][...] += jax.lax.dot_general(
            xq_ln, dq_full.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        grad_refs["bq"][...] += jnp.sum(dq_full, axis=0)
        grad_refs["wkv"][...] += jax.lax.dot_general(
            xkv_ln, dkv_full.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        grad_refs["bkv"][...] += jnp.sum(dkv_full, axis=0)
        grad_refs["qs"][...] += jnp.sum(dxq_ln * xhat_q, axis=0)
        grad_refs["qb"][...] += jnp.sum(dxq_ln, axis=0)
        grad_refs["ks"][...] += jnp.sum(dxkv_ln * xhat_kv, axis=0)
        grad_refs["kb"][...] += jnp.sum(dxkv_ln, axis=0)
        dxq_ref[0] = _ln_bwd_f32(dxq_ln, xhat_q, rstd_q, qs_ref[:]).reshape(h, w, c).astype(dxq_ref.dtype)
        dxkv_ref[0] = _ln_bwd_f32(dxkv_ln, xhat_kv, rstd_kv, ks_ref[:]).reshape(h, w, c).astype(dxkv_ref.dtype)

    io_block = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    const = lambda t: pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd, memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), io_block, io_block] + [
        const(t) for t in small + [packed_bias]
    ] + [pl.BlockSpec((1, hw, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
    out_specs = [io_block, io_block] + [const(t) for t in small + [packed_bias]]
    out_shape = [
        jax.ShapeDtypeStruct((b, h, w, c), dt),
        jax.ShapeDtypeStruct((b, h, w, c), dt),
    ] + [jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in small + [packed_bias]]
    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((hw, dim), jnp.float32),      # tokens
            pltpu.VMEM((hw, dim), jnp.float32),      # dtokens
            pltpu.VMEM((hw, dim), jnp.float32),      # dq
            pltpu.VMEM((hw, 2 * dim), jnp.float32),  # dk | dv
            pltpu.VMEM((hw, dim), jnp.float32),      # qw cache (scaled)
            pltpu.VMEM((hw, dim), jnp.float32),      # kw cache
            pltpu.VMEM((hw, dim), jnp.float32),      # vw cache
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(seed, xq, xkv, *small, packed_bias, dout)
    dxq, dxkv = outs[0], outs[1]
    wgrads = [g.astype(t.dtype) for g, t in zip(outs[2:18], small)]
    dbias = outs[18].astype(packed_bias.dtype)
    return (dxq, dxkv, *wgrads, dbias)


def _full_vjp_fwd(xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv, pk, pb, f1k,
                  f1b, f2k, f2b, phk, phb, packed_bias, seed, window_sizes,
                  shifts, gnum_heads, scale, keep_prob, hw_shape, interpret):
    out = _full_fwd(xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv, pk, pb, f1k,
                    f1b, f2k, f2b, phk, phb, packed_bias, seed, window_sizes,
                    shifts, gnum_heads, scale, keep_prob, hw_shape, interpret)
    return out, (xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv, pk, pb, f1k, f1b,
                 f2k, f2b, phk, phb, packed_bias, seed)


def _full_vjp_bwd(window_sizes, shifts, gnum_heads, scale, keep_prob,
                  hw_shape, interpret, res, dout):
    (xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv, pk, pb, f1k, f1b, f2k, f2b,
     phk, phb, packed_bias, seed) = res
    grads = _full_bwd_impl(xq, xkv, qs, qb, ks, kb, wq, bq, wkv, bkv, pk, pb,
                           f1k, f1b, f2k, f2b, phk, phb, packed_bias, seed,
                           dout, window_sizes, shifts, gnum_heads, scale,
                           keep_prob, hw_shape, interpret)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return grads + (dseed,)


window_attention_full_core.defvjp(_full_vjp_fwd, _full_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def window_attention_core(q3, k3, v3, packed_bias, seed, window_sizes, shifts,
                          gnum_heads, scale, keep_prob, interpret=False):
    """Grouped multi-window cross-attention with attention dropout.

    q3/k3/v3: (B, H, W, dim) post-projection; packed_bias from
    build_packed_bias (n_group, heads, HW//128, 128, 128) carrying the
    relative-position bias, shift masks and the -1e9 cross-window wall;
    seed: () int32 — per-step dropout seed (ignored when keep_prob == 1).
    Returns the faithful-layout attention output (B, H, W, dim), pre-SKConv.
    """
    return _core_fwd(q3, k3, v3, packed_bias, seed, window_sizes, shifts,
                     gnum_heads, scale, keep_prob, interpret)


def _vjp_fwd(q3, k3, v3, packed_bias, seed, window_sizes, shifts, gnum_heads,
             scale, keep_prob, interpret):
    out = _core_fwd(q3, k3, v3, packed_bias, seed, window_sizes, shifts,
                    gnum_heads, scale, keep_prob, interpret)
    return out, (q3, k3, v3, packed_bias, seed)


def _vjp_bwd(window_sizes, shifts, gnum_heads, scale, keep_prob, interpret,
             res, dout):
    q3, k3, v3, packed_bias, seed = res
    dq, dk, dv, dbias = _core_bwd(q3, k3, v3, packed_bias, seed, dout,
                                  window_sizes, shifts, gnum_heads, scale,
                                  keep_prob, interpret)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, dbias, dseed


window_attention_core.defvjp(_vjp_fwd, _vjp_bwd)
