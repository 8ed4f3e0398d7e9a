#!/usr/bin/env python
"""Microbenchmark: 12 PGRM Mlp tails (norm2 + Mlp + residual), fwd+bwd,
comparing the NHWC-transpose faithful formulation against the
DPMN_TPU_MLP_NCHW=1 direct-NCHW dimension-numbers variant (numerically
identical — tested bit-exact on CPU; this tool measures which layout
strategy XLA schedules faster on TPU for the training path).

Usage: python tools/microbench_mlp_train.py [--batch 64] [--iters 20]
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
    args = ap.parse_args()

    import flax.linen as nn

    import dpmn_tpu.models.pgrm as P

    B, HW, C = args.batch, 1024, 96
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, HW, C).astype(np.float32))

    class Tail(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(12):
                y = P.Mlp(hidden=4 * C, out=C, name=f"mlp_{i}")(
                    nn.LayerNorm(name=f"norm2_{i}")(x)
                )
                x = x + y
            return x

    m = Tail()
    variables = m.init(jax.random.PRNGKey(0), x)

    def loss(v, x):
        return jnp.sum(m.apply(v, x) ** 2)

    results = {}
    for mode in ("0", "1"):
        P._MLP_NCHW_MODE = mode
        step = jax.jit(jax.value_and_grad(loss))
        (l, g) = step(variables, x)
        jax.block_until_ready(g)
        t0 = time.time()
        for _ in range(args.iters):
            l, g = step(variables, x)
        jax.block_until_ready(g)
        ms = (time.time() - t0) / args.iters * 1e3
        results[mode] = ms
        print(f"MLP_NCHW={mode}: {ms:.2f} ms per fwd+bwd of 12 tails "
              f"(loss {float(l):.3f})", flush=True)
    print(f"speedup NCHW vs NHWC: {results['0'] / results['1']:.3f}x")


if __name__ == "__main__":
    main()
