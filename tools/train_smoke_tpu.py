#!/usr/bin/env python
"""Short real training run on the flagship system (one chip): N steps on a
fixed synthetic batch, printing the loss trajectory. Verifies the joint
optimizer actually learns (loss decreases) end-to-end on TPU, not just that
one step executes.

Usage: python tools/train_smoke_tpu.py [--steps 60] [--batch 16]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--amp", action="store_true", help="bfloat16 mixed-precision step")
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

    rng = np.random.RandomState(0)
    # a fixed synthetic "dataset" of 4 batches so the loss trajectory is a
    # real optimization signal, not single-batch memorization noise
    batches = [
        (
            jnp.asarray(rng.rand(args.batch, 32, 128, 4), jnp.float32),
            jnp.asarray(rng.rand(args.batch, 16, 64, 4), jnp.float32),
        )
        for _ in range(4)
    ]
    key = jax.random.PRNGKey(1)

    losses = []
    for i in range(args.steps):
        hr, lr = batches[i % len(batches)]
        state, metrics = system.train_step(state, hr, lr, jax.random.fold_in(key, i))
        if i % 10 == 0 or i == args.steps - 1:
            losses.append((i, float(metrics["loss"])))
            print(f"step {i:4d}  loss {losses[-1][1]:.4f}", flush=True)

    first, last = losses[0][1], losses[-1][1]
    print(
        json.dumps(
            {
                "metric": "train smoke loss first->last",
                "first": round(first, 4),
                "last": round(last, 4),
                "decreased": bool(last < first),
                "steps": args.steps,
                "batch": args.batch,
            }
        )
    )
    assert last < first, "loss did not decrease over the smoke run"


if __name__ == "__main__":
    main()
