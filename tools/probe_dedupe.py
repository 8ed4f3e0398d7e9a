#!/usr/bin/env python
"""Probe: does repeated execution of the SAME jitted computation on the SAME
inputs run faster per-iteration than on varying inputs?

Motivation: tools/microbench_mlp_train.py measured 1.22 ms per fwd+bwd of
12 Mlp tails at batch 64 — ≥348 GFLOP fwd alone, i.e. >280 TF/s on an fp32
graph whose chip peaks at ~49 TF/s fp32.  That is physically impossible,
so either the timing harness or the runtime is collapsing identical
dispatches.  Any bench that loops a jitted fn on constant inputs
(bench.py's eval loop) would then over-report.

Method: one MXU-heavy jitted matmul chain, timed three ways —
  a) constant input, loop N, block at end        (the suspect pattern)
  b) varying input (pre-staged device arrays), loop N, block at end
  c) constant input, block EVERY iteration
If (a) << (b) ≈ (c)·N the runtime deduped; if (a) ≈ (b) timing is honest.
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    n, iters = 4096, 20
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.rand(n, n).astype(np.float32))

    @jax.jit
    def f(x):
        for _ in range(8):
            x = jnp.tanh(x @ w)
        return x

    # 8 matmuls of 4096³ ≈ 1.10 TFLOP per call; fp32 v5e ≈ 45-49 TF/s
    # → honest floor ≈ 22 ms/call
    xs = [jnp.asarray(rng.rand(n, n).astype(np.float32)) for _ in range(iters)]
    x0 = xs[0]

    y = f(x0)
    y.block_until_ready()

    t0 = time.time()
    for _ in range(iters):
        y = f(x0)
    y.block_until_ready()
    a = (time.time() - t0) / iters * 1e3

    t0 = time.time()
    for x in xs:
        y = f(x)
    y.block_until_ready()
    b = (time.time() - t0) / iters * 1e3

    t0 = time.time()
    for _ in range(iters):
        f(x0).block_until_ready()
    c = (time.time() - t0) / iters * 1e3

    print(f"constant input, block at end : {a:8.2f} ms/call")
    print(f"varying input, block at end  : {b:8.2f} ms/call")
    print(f"constant input, block each   : {c:8.2f} ms/call")
    flop = 8 * 2 * n**3
    print(f"implied TF/s: a={flop / a / 1e9:.1f} b={flop / b / 1e9:.1f} "
          f"c={flop / c / 1e9:.1f} (fp32 ceiling ~49)")




def slope_test():
    """If block-at-end waits honestly, total time grows linearly in iters;
    if block_until_ready returned early, totals would plateau."""
    import jax, jax.numpy as jnp, numpy as np, time
    n = 4096
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.rand(n, n).astype(np.float32))

    @jax.jit
    def f(x):
        for _ in range(8):
            x = jnp.tanh(x @ w)
        return x

    x0 = jnp.asarray(rng.rand(n, n).astype(np.float32))
    f(x0).block_until_ready()
    for iters in (5, 10, 20, 40):
        t0 = time.time()
        y = x0
        for _ in range(iters):
            y = f(x0)
        y.block_until_ready()
        dt = time.time() - t0
        print(f"iters={iters:3d}: total {dt*1e3:8.1f} ms  ({dt/iters*1e3:6.2f} ms/call)")


if __name__ == "__main__":
    main()
    slope_test()
