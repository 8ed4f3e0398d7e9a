#!/usr/bin/env python
"""Module-level fp32-vs-bf16 bisect of the flagship train step.

The measured AMP cliff (322 fp32 vs 5-19 bf16 img/s, even pure-XLA —
STATUS.md) did not reproduce in the op-level microbench
(tools/microbench_amp.py: no family regressed >2x), so the pathology lives
at module granularity.  This tool times each flagship component in
isolation — frozen PSN chain (CRNN prior + TATT), VisionLAN student +
device glyph atlas, one PGRM fwd+bwd, DistillModule fwd+bwd, CMM fwd+bwd,
to_mask + image_loss — each jitted fp32 then bf16 with the same
cast-through-grad structure DPMNSystem._train_step_impl uses.  Small
graphs compile in seconds through the remote compile service, unlike the
~35 min flagship joint step, so the guilty module surfaces fast.

Usage: python tools/bisect_amp.py [--batch 64] [--iters 10] [--only psn,pgrm]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import jax

if os.environ.get("DPMN_BISECT_CPU") == "1":  # syntax/logic smoke off-TPU
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench(fn, args_, iters):
    t0 = time.time()
    r = fn(*args_)
    jax.block_until_ready(r)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args_)
    jax.block_until_ready(r)
    return (time.time() - t0) / iters * 1000.0, compile_s


def cast_tree(tree, dt):
    c = lambda t: t.astype(dt) if hasattr(t, "dtype") and t.dtype == jnp.float32 else t
    return jax.tree_util.tree_map(c, tree)


def run_pair(name, fn, tree, xs, iters, grad_wrt_tree=False):
    """fn(tree, *xs) -> f32 scalar (or array). Times fp32 and bf16.

    Mirrors DPMNSystem._train_step_impl's cast-through-grad structure
    exactly (round-2 advisor fix): the param tree stays a float32 master and
    cast_tree runs INSIDE the differentiated function, so the bf16 arm pays
    the same per-leaf f32<->bf16 converts on every forward/backward that the
    real AMP step pays (grads land f32 on the masters through the astype's
    transpose).  Auxiliary trees (batch_stats) ride in xs and are down-cast
    the same way, without being differentiated."""
    results = {}
    for dt in (jnp.float32, jnp.bfloat16):

        def composed(p, *a, _dt=dt):
            p = cast_tree(p, _dt)
            a = tuple(cast_tree(x, _dt) for x in a)
            return fn(p, *a)

        f = jax.jit(jax.value_and_grad(composed)) if grad_wrt_tree else jax.jit(composed)
        ms, comp = bench(f, (tree,) + xs, iters)
        results[np.dtype(dt).name] = ms
        print(f"{name:26s} {np.dtype(dt).name:9s} {ms:10.3f} ms/iter  (compile {comp:.1f}s)", flush=True)
    ratio = results["bfloat16"] / max(results["float32"], 1e-9)
    flag = "  <<< REGRESSION" if ratio > 2.0 else ""
    print(f"{name:26s} bf16/f32 ratio {ratio:10.2f}{flag}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    sec = lambda n: only is None or n in only

    from dpmn_tpu.config import TrainCfg
    from dpmn_tpu.system import DPMNSystem
    from dpmn_tpu.losses import image_loss
    from dpmn_tpu.ops.mask_prior import to_mask
    from __graft_entry__ import _flagship_args

    cfg = TrainCfg(batch_size=args.batch, width=128, height=32)
    system = DPMNSystem(cfg, _flagship_args(), glyph_mode="atlas")
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    B = args.batch
    rng = np.random.RandomState(0)
    lr4 = jnp.asarray(rng.rand(B, 16, 64, 4), jnp.float32)
    hr3 = jnp.asarray(rng.rand(B, 32, 128, 3), jnp.float32)
    glyph = jnp.asarray(rng.rand(B, 32, 128, 2), jnp.float32)
    key = jax.random.PRNGKey(1)

    # ---- frozen PSN chain (CRNN text prior + TATT), forward only
    if sec("psn"):
        run_pair("psn fwd (crnn+tatt)",
                 lambda fr, x: system._psn_forward(fr, x).astype(jnp.float32).mean(),
                 state["frozen"], (lr4,), args.iters)

    # ---- VisionLAN student + atlas glyph prior, forward only
    if sec("student"):
        run_pair("student+atlas fwd",
                 lambda fr, x: system._glyph_prior(fr, 0, x).astype(jnp.float32).mean(),
                 state["frozen"], (hr3,), args.iters)

    # ---- one PGRM iteration, fwd+bwd (the train path: dropout on)
    if sec("pgrm"):
        m = system.pgrms[0]

        def pgrm_loss(p, xq, xkv, hr):
            sr = m.apply({"params": p}, xq, xkv, (), train=True,
                         rngs={"dropout": key})
            return image_loss(sr.astype(jnp.float32), hr.astype(jnp.float32),
                              gradient=True)

        run_pair("pgrm[0] fwd+bwd", pgrm_loss, state["params"]["pgrm_0"],
                 (glyph, hr3, hr3), args.iters, grad_wrt_tree=True)

    # ---- DistillModule fwd+bwd (batch_stats down-cast like the real step)
    if sec("distill"):
        d = system.distills[0]

        def distill_loss(p, bs, deep, shallow):
            (l, feat), _ = d.apply(
                {"params": p, "batch_stats": bs},
                deep, shallow, train=True, mutable=["batch_stats"])
            return l.astype(jnp.float32)

        run_pair("distill fwd+bwd", distill_loss, state["params"]["distill_0"],
                 (state["batch_stats"]["distill_0"], hr3, hr3), args.iters,
                 grad_wrt_tree=True)

    # ---- CMM fwd+bwd (batch_stats down-cast like the real step)
    if sec("cmm"):
        def cmm_loss(p, bs, a, b, hr):
            sr, _ = system.cmm.apply(
                {"params": p, "batch_stats": bs},
                a, b, train=True, mutable=["batch_stats"])
            return image_loss(sr.astype(jnp.float32), hr.astype(jnp.float32),
                              gradient=True)

        run_pair("cmm fwd+bwd", cmm_loss, state["params"]["cmm"],
                 (state["batch_stats"]["cmm"], hr3, hr3, hr3), args.iters,
                 grad_wrt_tree=True)

    # ---- the loss tail, split the way the composed step differentiates it:
    # to_mask is stop_gradient'd (system.py:390) → forward-only row;
    # image_loss IS differentiated w.r.t. the SR image → fwd+bwd row
    if sec("loss"):
        run_pair("to_mask fwd",
                 lambda a: to_mask(a).astype(jnp.float32).mean(),
                 hr3, (), args.iters)
        run_pair("image_loss fwd+bwd(sr)",
                 lambda sr, hr: image_loss(sr.astype(jnp.float32),
                                           hr.astype(jnp.float32), gradient=True),
                 hr3, (hr3,), args.iters, grad_wrt_tree=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
