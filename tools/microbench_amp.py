#!/usr/bin/env python
"""Microbenchmark: fp32 vs bf16 fwd+bwd per op class, to root-cause the
measured AMP train-step cliff (322 fp32 vs 5-19 bf16 img/s on v5e).

Times each suspect op family in isolation — conv3x3, depthwise conv,
dense matmul, LayerNorm, BatchNorm, GRU-style lax.scan, and a small
conv-net train step — each as jitted value_and_grad with an fp32 loss
(the same cast-through-grad structure DPMNSystem uses), in fp32 and in
bf16 compute.  Whichever family blows up by >5x in bf16 is the culprit.
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


def bench(fn, args_, iters):
    r = fn(*args_)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args_)
    jax.block_until_ready(r)
    return (time.time() - t0) / iters * 1000.0


def run_pair(name, make_loss, params_f32, xs_f32, iters):
    """make_loss(dtype) -> loss_fn(params, *xs) returning fp32 scalar."""
    for dt in (jnp.float32, jnp.bfloat16):
        cast = lambda t: t.astype(dt)
        params = jax.tree_util.tree_map(cast, params_f32)
        xs = tuple(x.astype(dt) for x in xs_f32)
        loss_fn = make_loss(dt)
        g = jax.jit(jax.value_and_grad(loss_fn))
        ms = bench(g, (params,) + xs, iters)
        print(f"{name:28s} {np.dtype(dt).name:9s} {ms:9.3f} ms/iter", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", type=str, default=None, help="comma list of section names")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    rng = np.random.RandomState(0)
    B = 64

    def sec(name):
        return only is None or name in only

    # ---- conv 3x3, 64->64, 32x128 map (PGRM/TSRN-scale)
    if sec("conv"):
        x = jnp.asarray(rng.rand(B, 32, 128, 64).astype(np.float32))
        w = jnp.asarray(rng.rand(3, 3, 64, 64).astype(np.float32) * 0.05)

        def mk(dt):
            def loss(w, x):
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.mean(y.astype(jnp.float32) ** 2)
            return loss
        run_pair("conv3x3 64ch", mk, w, (x,), args.iters)

    # ---- depthwise conv 3x3 (Mlp quirk path)
    if sec("dwconv"):
        x = jnp.asarray(rng.rand(B, 32, 32, 384).astype(np.float32))
        w = jnp.asarray(rng.rand(3, 3, 1, 384).astype(np.float32) * 0.05)

        def mk(dt):
            def loss(w, x):
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME", feature_group_count=384,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.mean(y.astype(jnp.float32) ** 2)
            return loss
        run_pair("dwconv3x3 384ch", mk, w, (x,), args.iters)

    # ---- dense matmul (attention-projection scale)
    if sec("matmul"):
        x = jnp.asarray(rng.rand(B * 1024, 96).astype(np.float32))
        w = jnp.asarray(rng.rand(96, 96).astype(np.float32) * 0.05)

        def mk(dt):
            def loss(w, x):
                return jnp.mean((x @ w).astype(jnp.float32) ** 2)
            return loss
        run_pair("matmul 65536x96x96", mk, w, (x,), args.iters)

    # ---- LayerNorm
    if sec("ln"):
        x = jnp.asarray(rng.rand(B, 1024, 96).astype(np.float32))
        sc = jnp.ones((96,), np.float32)

        def mk(dt):
            def loss(sc, x):
                m = jnp.mean(x, -1, keepdims=True)
                v = jnp.var(x, -1, keepdims=True)
                y = (x - m) * jax.lax.rsqrt(v + 1e-5) * sc
                return jnp.mean(y.astype(jnp.float32) ** 2)
            return loss
        run_pair("layernorm 64x1024x96", mk, sc, (x,), args.iters)

    # ---- BatchNorm (training stats)
    if sec("bn"):
        x = jnp.asarray(rng.rand(B, 32, 128, 64).astype(np.float32))
        sc = jnp.ones((64,), np.float32)

        def mk(dt):
            def loss(sc, x):
                m = jnp.mean(x, (0, 1, 2))
                v = jnp.var(x, (0, 1, 2))
                y = (x - m) * jax.lax.rsqrt(v + 1e-5) * sc
                return jnp.mean(y.astype(jnp.float32) ** 2)
            return loss
        run_pair("batchnorm 64ch", mk, sc, (x,), args.iters)

    # ---- GRU-style scan over width (TSRN SRB recurrence shape)
    if sec("gru"):
        x = jnp.asarray(rng.rand(128, B * 32, 64).astype(np.float32))  # (T, B*H, C)
        w = jnp.asarray(rng.rand(128, 64).astype(np.float32) * 0.05)

        def mk(dt):
            def loss(w, x):
                def step(h, xt):
                    zru = jnp.concatenate([xt, h], -1) @ w
                    z = jax.nn.sigmoid(zru)
                    h2 = jnp.tanh(zru) * z + h * (1 - z)
                    return h2, h2
                h0 = jnp.zeros((x.shape[1], 64), x.dtype)
                _, ys = jax.lax.scan(step, h0, x, unroll=4)
                return jnp.mean(ys.astype(jnp.float32) ** 2)
            return loss
        run_pair("gru-scan T128", mk, w, (x,), args.iters)

    # ---- small conv net joint step (conv+bn+relu x4 + loss): the integration case
    if sec("net"):
        x = jnp.asarray(rng.rand(B, 16, 64, 32).astype(np.float32))
        ws = [jnp.asarray(rng.rand(3, 3, 32, 32).astype(np.float32) * 0.05) for _ in range(4)]

        def mk(dt):
            def loss(ws, x):
                y = x
                for w in ws:
                    y = jax.lax.conv_general_dilated(
                        y, w, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    m = jnp.mean(y, (0, 1, 2), keepdims=True)
                    v = jnp.var(y, (0, 1, 2), keepdims=True)
                    y = jax.nn.relu((y - m) * jax.lax.rsqrt(v + 1e-5))
                return jnp.mean(y.astype(jnp.float32) ** 2)
            return loss
        run_pair("convnet4 32ch", mk, ws, (x,), args.iters)

    # ---- pixelshuffle upsample conv (TSRN tail: 64 -> 256 -> shuffle)
    if sec("shuffle"):
        x = jnp.asarray(rng.rand(B, 16, 64, 64).astype(np.float32))
        w = jnp.asarray(rng.rand(3, 3, 64, 256).astype(np.float32) * 0.05)

        def mk(dt):
            def loss(w, x):
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                b, h, wd, c = y.shape
                y = y.reshape(b, h, wd, 2, 2, c // 4)
                y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 2, wd * 2, c // 4)
                return jnp.mean(y.astype(jnp.float32) ** 2)
            return loss
        run_pair("upconv+shuffle", mk, w, (x,), args.iters)

    print("done", flush=True)


if __name__ == "__main__":
    main()
