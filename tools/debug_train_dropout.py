#!/usr/bin/env python
"""Isolate the train-kernel dropout mismatch: dump the PRNG masks with a
standalone kernel replicating the fwd seeding/generation order, rebuild the
dropped forward in pure jnp with those masks, and compare (a) fwd outputs,
(b) jax.grad of the explicit-mask reference vs the custom-VJP backward."""

import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from dpmn_tpu.models.pgrm import _shift_attn_mask
from dpmn_tpu.ops.pallas_window import build_packed_bias
from dpmn_tpu.ops.pallas_window_train import window_attention_core, _dropout_mask
from tests.test_pallas_train import HEADS, HW, WINDOWS, jnp_reference

H, W, DIM = 16, 64, 96
NPACK = HW // 128
N_GROUP = len(WINDOWS)


def dump_masks(seed, b, keep):
    def kernel(seed_ref, out_ref):
        i = pl.program_id(0)
        for g in range(N_GROUP):
            pltpu.prng_seed(seed_ref[0] + i * N_GROUP + g)
            for hd in range(HEADS):
                out_ref[0, g, hd] = _dropout_mask((NPACK, 128, 128), keep)

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (1, N_GROUP, HEADS, NPACK, 128, 128), lambda i: (i, 0, 0, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, N_GROUP, HEADS, NPACK, 128, 128), jnp.float32),
    )(seed)


def ref_with_masks(q3, k3, v3, packed_bias, masks, scale):
    b, h, w, dim = q3.shape
    channel = dim // N_GROUP
    gch = channel // HEADS
    outs = jnp.zeros_like(q3)
    for g, ws in enumerate(WINDOWS):
        sh = (1, 2, 4)[g]
        sl = slice(g * channel, (g + 1) * channel)
        qg = jnp.roll(q3[..., sl], (-sh, -sh), axis=(1, 2))
        kg = jnp.roll(k3[..., sl], (-sh, -sh), axis=(1, 2))
        vg = jnp.roll(v3[..., sl], (-sh, -sh), axis=(1, 2))

        def part(t):
            hb, wb = h // ws, w // ws
            t = t.reshape(b, hb, ws, wb, ws, channel)
            return jnp.transpose(t, (0, 1, 3, 2, 4, 5)).reshape(b, h * w, channel)

        qw, kw, vw = part(qg) * scale, part(kg), part(vg)
        for hd in range(HEADS):
            hsl = slice(hd * gch, (hd + 1) * gch)
            qp = qw[..., hsl].reshape(b, NPACK, 128, gch)
            kp = kw[..., hsl].reshape(b, NPACK, 128, gch)
            vp = vw[..., hsl].reshape(b, NPACK, 128, gch)
            scores = jnp.einsum("bpnc,bpmc->bpnm", qp, kp) + packed_bias[g, hd][None]
            probs = jax.nn.softmax(scores, axis=-1) * masks[:, g, hd]
            out = jnp.einsum("bpnm,bpmc->bpnc", probs, vp).reshape(b, h, w, gch)
            lo = g * channel + hd * gch
            outs = outs.at[..., lo : lo + gch].set(out)
    return outs


def main():
    rng = np.random.RandomState(0)
    b = 4
    keep = 0.9
    q3 = jnp.asarray(rng.randn(b, H, W, DIM) * 0.5, jnp.float32)
    k3 = jnp.asarray(rng.randn(b, H, W, DIM) * 0.5, jnp.float32)
    v3 = jnp.asarray(rng.randn(b, H, W, DIM), jnp.float32)
    biases = [jnp.asarray(rng.randn(HEADS, ws * ws, ws * ws) * 0.1, jnp.float32) for ws in WINDOWS]
    shifts = (1, 2, 4)
    masksh = [jnp.asarray(_shift_attn_mask(H, W, ws, sh)) for ws, sh in zip(WINDOWS, shifts)]
    packed = build_packed_bias(biases, masksh, WINDOWS, HW)
    scale = (DIM // N_GROUP // HEADS) ** -0.5
    seed = jnp.asarray([7], jnp.int32)

    dmasks = jax.jit(dump_masks, static_argnums=(1, 2))(seed, b, keep)
    print("mask keep fraction:", float(jnp.mean(dmasks > 0)))

    core = jax.jit(
        lambda q: window_attention_core(q, k3, v3, packed, seed, WINDOWS, shifts, HEADS, scale, keep, False)
    )
    o_core = core(q3)
    o_ref = jax.jit(lambda q: ref_with_masks(q, k3, v3, packed, dmasks, scale))(q3)
    d = float(jnp.max(jnp.abs(o_core - o_ref)))
    print("fwd core vs explicit-mask ref: max abs diff", d)

    g_core = jax.jit(jax.grad(lambda q: jnp.sum(jnp.tanh(core(q)))))(q3)
    g_ref = jax.jit(jax.grad(lambda q: jnp.sum(jnp.tanh(ref_with_masks(q, k3, v3, packed, dmasks, scale)))))(q3)
    gd = float(jnp.max(jnp.abs(g_core - g_ref)))
    print("grad core vs explicit-mask ref: max abs diff", gd,
          " (ref grad scale", float(jnp.max(jnp.abs(g_ref))), ")")


if __name__ == "__main__":
    main()
