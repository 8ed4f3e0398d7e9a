#!/usr/bin/env python
"""Measure eval/train throughput variants on the flagship system (one chip).

Usage: python tools/bench_variants.py [variant ...]
Variants:
  eval_fp32        — headline path (atlas glyphs, fp32 everywhere)
  eval_stu16       — atlas glyphs, bf16 VisionLAN students (argmax-safe)
  eval_bf16        — whole-pipeline bfloat16 serving mode
  train_fp32       — joint train step, fp32
  train_stu16      — joint train step, bf16 students
  eval_corrected   — faithful=False (spatially-correct layouts; no quirk
                     relayouts).  NOT weight-compatible with faithful=True.
  train_corrected  — faithful=False joint train step
  eval_bf16_test   — bf16 serving with the reference test() glyph semantics
                     (glyph_from_psn=True: one vmapped student stack)
  eval_bf16_pipe2  — cross-request pipelining probe: TWO independent
                     half-batch cascades inside ONE jit (XLA may overlap one
                     half's serial student↔PGRM segment with the other
                     half's bandwidth phase — the round-4 serial-residue
                     analysis says ~31 ms/step of the bf16 step is that
                     dependency-chained segment)
  eval_bf16_pipe2_test — pipe2 + test() glyph semantics combined

Each variant is its own jit graph (expensive first compile through the
remote compile service — results append to stdout as JSON lines).
"""

import json
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

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def build(student_dtype=None, **arg_overrides):
    from dpmn_tpu.config import TrainCfg
    from dpmn_tpu.system import DPMNSystem
    from __graft_entry__ import _flagship_args

    cfg = TrainCfg(batch_size=BATCH, width=128, height=32)
    system = DPMNSystem(cfg, _flagship_args(**arg_overrides), glyph_mode="atlas",
                        student_dtype=student_dtype)
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    return system, state


def time_eval(system, state, fn):
    rng = np.random.RandomState(0)
    lr = jnp.asarray(rng.rand(BATCH, 16, 64, 4), jnp.float32)
    out = fn(state, lr)
    out.block_until_ready()
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(state, lr)
    out.block_until_ready()
    return BATCH * ITERS / (time.time() - t0)


def time_train(system, state):
    rng = np.random.RandomState(0)
    hr = jnp.asarray(rng.rand(BATCH, 32, 128, 4), jnp.float32)
    lr = jnp.asarray(rng.rand(BATCH, 16, 64, 4), jnp.float32)
    key = jax.random.PRNGKey(1)
    state, metrics = system.train_step(state, hr, lr, key)
    jax.block_until_ready(metrics)
    t0 = time.time()
    for i in range(ITERS):
        state, metrics = system.train_step(state, hr, lr, jax.random.fold_in(key, i))
    jax.block_until_ready(metrics)
    return BATCH * ITERS / (time.time() - t0)


def run(variant):
    t0 = time.time()
    if variant == "eval_fp32":
        system, state = build()
        v = time_eval(system, state, system.sr_forward)
    elif variant == "eval_stu16":
        system, state = build(student_dtype="bfloat16")
        v = time_eval(system, state, system.sr_forward)
    elif variant == "eval_bf16":
        system, state = build()
        v = time_eval(system, state, system.sr_forward_bf16)
    elif variant == "train_fp32":
        system, state = build()
        v = time_train(system, state)
    elif variant == "train_stu16":
        system, state = build(student_dtype="bfloat16")
        v = time_train(system, state)
    elif variant == "eval_bf16_test":
        system, state = build()
        v = time_eval(system, state, lambda s, lr: system.sr_forward_bf16(s, lr, True))
    elif variant in ("eval_bf16_pipe2", "eval_bf16_pipe2_test"):
        system, state = build()
        from_psn = variant.endswith("_test")

        @jax.jit
        def pipe2(state16, lr):
            h = lr.shape[0] // 2
            a = system._sr_forward_bf16_impl(state16, lr[:h], from_psn)
            b = system._sr_forward_bf16_impl(state16, lr[h:], from_psn)
            return jnp.concatenate([a, b])

        def fn(s, lr):
            if system._bf16_src is not s:
                system._bf16_state = system.bf16_state(s)
                system._bf16_src = s
            return pipe2(system._bf16_state, lr)

        v = time_eval(system, state, fn)
    elif variant in ("eval_corrected", "train_corrected"):
        # faithful=False: the spatially-correct Mlp/window layout — kills
        # the quirk relayout byte family (ROADMAP "Mlp-quirk grid family").
        # A DIFFERENT architecture, not a drop-in for published weights:
        # weights trained in one mode only serve in that mode (PARITY.md).
        system, state = build(faithful=False)
        v = (time_eval(system, state, system.sr_forward) if variant == "eval_corrected"
             else time_train(system, state))
    else:
        raise SystemExit(f"unknown variant {variant}")
    print(
        json.dumps(
            {
                "variant": variant,
                "images_per_sec": round(v, 2),
                "ms_per_iter": round(BATCH / v * 1000, 2),
                "batch": BATCH,
                "wall_incl_compile_s": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    for variant in sys.argv[1:] or ["eval_fp32", "eval_stu16"]:
        run(variant)
