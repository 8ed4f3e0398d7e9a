#!/usr/bin/env python
"""Training-step throughput on the flagship system (one chip).

Measures the full jitted train step — frozen PSN + CRNN text prior, the
dual PGRM cascade with device glyph/mask priors, distill cascade, CMM,
joint loss, per-module clipping and the Adam update over the whole pytree —
i.e. the reference's per-batch work at interfaces/super_resolution.py:126-278.

Prints one JSON line: train images/sec/chip + ms/step.
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=int(os.environ.get("BENCH_BATCH", "16")))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--amp", action="store_true", help="bfloat16 mixed-precision step")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="microbatches per optimizer step (--batch is the GLOBAL "
                    "batch; the route to the shipped batch-1024 config on one chip)")
    args = ap.parse_args()

    from dpmn_tpu.config import TrainCfg
    from dpmn_tpu.system import DPMNSystem
    from __graft_entry__ import _flagship_args

    cfg = TrainCfg(batch_size=args.batch, width=128, height=32)
    system = DPMNSystem(
        cfg, _flagship_args(), glyph_mode="atlas", donate_state=True,
        train_dtype="bfloat16" if args.amp else None,
    )
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    train_step = (system.make_accum_train_step(args.grad_accum)
                  if args.grad_accum > 1 else system.train_step)

    rng = np.random.RandomState(0)
    hr = jnp.asarray(rng.rand(args.batch, 32, 128, 4), jnp.float32)
    lr = jnp.asarray(rng.rand(args.batch, 16, 64, 4), jnp.float32)
    step_rng = jax.random.PRNGKey(1)

    state, metrics = train_step(state, hr, lr, step_rng)
    jax.block_until_ready(metrics)

    t0 = time.time()
    for i in range(args.iters):
        state, metrics = train_step(state, hr, lr, jax.random.fold_in(step_rng, i))
    jax.block_until_ready(metrics)
    dt = (time.time() - t0) / args.iters

    print(
        json.dumps(
            {
                "metric": "train images/sec/chip (TATT+DPMN 3+3 joint step"
                + (", bf16 AMP" if args.amp else "")
                + (f", grad_accum={args.grad_accum}" if args.grad_accum > 1 else "")
                + ")",
                "value": round(args.batch / dt, 2),
                "unit": "images/sec/chip",
                "ms_per_step": round(dt * 1000, 2),
                "batch": args.batch,
                "loss": float(metrics["loss"]),
            }
        )
    )


if __name__ == "__main__":
    main()
