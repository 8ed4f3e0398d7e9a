#!/usr/bin/env python
"""Microbenchmark: the PGRM Mlp (norm2 + fc1/dwconv/pwconv/fc2) in isolation.

--grid times the spatially-correct faithful=False variant to isolate the
cost of the reference's sqrt-reshape quirk relayouts (model/pgrm.py:34).
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
    ap.add_argument("--grid", action="store_true", help="faithful=False grid variant")
    args = ap.parse_args()

    import flax.linen as nn

    import dpmn_tpu.models.pgrm as P

    B, HW, C = args.batch, 1024, 96
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, HW, C).astype(np.float32))

    class Tail(nn.Module):
        faithful: bool = True

        @nn.compact
        def __call__(self, x):
            y = P.Mlp(hidden=4 * C, out=C, grid=(16, 64), faithful=self.faithful)(
                nn.LayerNorm(name="norm2")(x)
            )
            return x + y

    mods, varss = [], []
    for i in range(12):
        m = Tail(faithful=not args.grid)
        mods.append(m)
        varss.append(m.init(jax.random.PRNGKey(i), x))

    @jax.jit
    def stack(x):
        for m, v in zip(mods, varss):
            x = m.apply(v, x)
        return x

    r = stack(x)
    r.block_until_ready()
    t0 = time.time()
    for _ in range(args.iters):
        r = stack(x)
    r.block_until_ready()
    dt = (time.time() - t0) / args.iters
    tag = "grid" if args.grid else "faithful"
    print(f"12x (norm2+Mlp[{tag}]+res): {dt*1000:.2f} ms/iter ({dt*1000/12:.3f} ms/block), batch {B}")


if __name__ == "__main__":
    main()
