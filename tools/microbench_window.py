#!/usr/bin/env python
"""Microbenchmark: the fused WindowAttention block kernel in isolation.

Times a stack of 12 fused block calls (the flagship's per-forward count:
6 PGRMs x depth 2, alternating unshifted/shifted) at the flagship shapes
(B, 1024 tokens, dim 96) so kernel variants can be compared without
recompiling the whole flagship graph.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--xla", action="store_true", help="time the XLA module path instead")
    ap.add_argument("--full", action="store_true",
                    help="time full SwinTransformerBlocks (LN+attn+residual+Mlp)")
    args = ap.parse_args()

    import dpmn_tpu.models.pgrm as P

    if args.xla:
        P._PALLAS_WINDOW_MODE = "0"

    B, H, W, C = args.batch, 16, 64, 96
    rng = np.random.RandomState(0)

    mods, varss = [], []
    if args.full:
        xq = jnp.asarray(rng.rand(B, H * W, C).astype(np.float32))
        xkv = jnp.asarray(rng.rand(B, H * W, C).astype(np.float32))
        for i in range(12):
            shift = (0, 0, 0) if i % 2 == 0 else (1, 2, 4)
            blk = P.SwinTransformerBlock(
                dim=C, input_resolution=(H, W), num_heads=6,
                window_size=[2, 4, 8], shift_size=list(shift),
            )
            mods.append(blk)
            varss.append(blk.init(jax.random.PRNGKey(i), xq, xkv))

        @jax.jit
        def stack(xq, xkv):
            out = xkv
            for m, v in zip(mods, varss):
                xq, out = m.apply(v, xq, out)
            return out

    else:
        xq = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
        xkv = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
        for i in range(12):
            shift = (0, 0, 0) if i % 2 == 0 else (1, 2, 4)
            wa = P.WindowAttention(
                dim=C, window_size=(2, 4, 8), shift_size=shift, num_heads=6, input_resolution=(H, W)
            )
            mods.append(wa)
            varss.append(wa.init(jax.random.PRNGKey(i), xq, xkv))

        @jax.jit
        def stack(xq, xkv):
            out = xkv
            for m, v in zip(mods, varss):
                out = m.apply(v, xq, out.reshape(B, H, W, C))
                out = out.reshape(B, H, W, C)
            return out

    r = stack(xq, xkv)
    r.block_until_ready()
    t0 = time.time()
    for _ in range(args.iters):
        r = stack(xq, xkv)
    r.block_until_ready()
    dt = (time.time() - t0) / args.iters
    print(f"12-block stack: {dt*1000:.2f} ms/iter ({dt*1000/12:.3f} ms/block), batch {B}")


if __name__ == "__main__":
    main()
