#!/usr/bin/env python
"""On-device check: the fused Pallas Swin block vs the XLA module path.

Runs a 12-block SwinTransformerBlock stack twice on the current backend —
pallas kernel forced on, then forced off — and asserts the outputs agree.
This exercises the REAL Mosaic-compiled kernel (not interpret mode), i.e.
what tests/test_pallas_window.py cannot cover on the CPU host.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dpmn_tpu.models.pgrm as P


def main():
    faithful = "--corrected" not in sys.argv  # corrected = faithful=False layout
    B, H, W, C = 8, 16, 64, 96
    rng = np.random.RandomState(0)
    xq = jnp.asarray(rng.rand(B, H * W, C).astype(np.float32))
    xkv = jnp.asarray(rng.rand(B, H * W, C).astype(np.float32))

    mods, varss = [], []
    for i in range(12):
        shift = [0, 0, 0] if i % 2 == 0 else [1, 2, 4]
        blk = P.SwinTransformerBlock(
            dim=C, input_resolution=(H, W), num_heads=6,
            window_size=[2, 4, 8], shift_size=shift, faithful=faithful,
        )
        mods.append(blk)
        varss.append(blk.init(jax.random.PRNGKey(i), xq, xkv))

    def stack(xq, xkv):
        for m, v in zip(mods, varss):
            xq, xkv = m.apply(v, xq, xkv)
        return xkv

    P._PALLAS_WINDOW_MODE = "1"
    fused = jax.jit(stack)(xq, xkv)
    fused.block_until_ready()
    P._PALLAS_WINDOW_MODE = "0"
    ref = jax.jit(stack)(xq, xkv)
    ref.block_until_ready()

    diff = jnp.max(jnp.abs(fused - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9)
    print(f"backend={jax.default_backend()}  max rel diff over 12 blocks: {float(diff):.3e}")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-4, atol=2e-4)
    print("PASS: fused kernel matches XLA path on device")


if __name__ == "__main__":
    main()
