#!/usr/bin/env python
"""Convergence differential: faithful (quirk-exact) vs corrected
(faithful=False) training at small geometry (VERDICT r4 #3).

The corrected mode replaces the reference's PGRM Mlp square-reshape quirk
(model/pgrm.py:34, silently scrambling the 16x64 token grid through a 32x32
view) and the raw window re-layout (model/pgrm.py:263) with the spatially
correct formulations — a DIFFERENT architecture offered for training new
models TPU-first (PARITY.md).  This tool substantiates it with training
evidence: N steps of the full joint step (PSN + dual PGRM cascade + distill
+ CMM + Adam) in BOTH modes on the same synthetic data stream, reporting
loss curves and descent statistics.

Runs on CPU by default (small geometry; ~sec/step); pass --tpu to leave the
platform unpinned.  Output: a JSON line per mode + a small table.

Usage: python tools/convergence_corrected.py [--steps 300] [--batch 8] [--tpu]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--arch", default="tsrn")
    ap.add_argument("--modes", default="faithful,corrected",
                    help="comma list; run one mode at a time to fit a wall-clock "
                         "budget (each mode is ~90 min at 300 steps on this host)")
    args_cli = ap.parse_args()

    import jax

    if not args_cli.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from dpmn_tpu.config import Args, TrainCfg
    from dpmn_tpu.system import DPMNSystem

    def build(faithful: bool):
        cfg = TrainCfg(batch_size=args_cli.batch, width=128, height=32)
        a = Args(
            arch=args_cli.arch, mask=True, gradient=True,
            stu_iter_b1=1, stu_iter_b2=1,
            patch_size="2,", embed_dim="24,", window_size="2,4,8,",
            depths="1,", num_heads="6,", srb=1, hd_u=4,
            faithful=faithful,
        )
        system = DPMNSystem(cfg, a, glyph_mode="zeros", donate_state=True)
        state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
        return system, state

    # fixed synthetic stream: structured (not pure noise) so the loss has
    # something learnable — LR is a blurred decimation of HR
    rng = np.random.RandomState(0)
    n_batches = 16
    hrs = rng.rand(n_batches, args_cli.batch, 32, 128, 4).astype(np.float32)
    lrs = (hrs[:, :, ::2, ::2] * 0.9 + 0.05).astype(np.float32)

    wanted = [m.strip() for m in args_cli.modes.split(",") if m.strip()]
    results = {}
    for mode, faithful in (("faithful", True), ("corrected", False)):
        if mode not in wanted:
            continue
        system, state = build(faithful)
        key = jax.random.PRNGKey(1)
        losses = []
        t0 = time.time()
        for i in range(args_cli.steps):
            hr = jnp.asarray(hrs[i % n_batches])
            lr = jnp.asarray(lrs[i % n_batches])
            state, m = system.train_step(state, hr, lr, jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        wall = time.time() - t0
        k = max(args_cli.steps // 10, 1)
        first, last = float(np.mean(losses[:k])), float(np.mean(losses[-k:]))
        results[mode] = {
            "mode": mode,
            "steps": args_cli.steps,
            "batch": args_cli.batch,
            "loss_first10pct": round(first, 4),
            "loss_last10pct": round(last, 4),
            "descent_ratio": round(last / first, 4),
            "wall_s": round(wall, 1),
            "loss_curve_every10": [round(x, 3) for x in losses[::10]],
        }
        print(json.dumps(results[mode]), flush=True)

    print(f"\n{'mode':<10} {'first':>9} {'last':>9} {'ratio':>7} {'wall s':>8}")
    for r in results.values():
        print(f"{r['mode']:<10} {r['loss_first10pct']:>9.3f} {r['loss_last10pct']:>9.3f} "
              f"{r['descent_ratio']:>7.3f} {r['wall_s']:>8.1f}")
    for r in results.values():
        assert r["descent_ratio"] < 0.9, f"{r['mode']} mode failed to descend"
    if "faithful" in results and "corrected" in results:
        f, c = results["faithful"], results["corrected"]
        print("both modes descend; corrected/faithful final-loss ratio "
              f"{c['loss_last10pct'] / f['loss_last10pct']:.3f}")


if __name__ == "__main__":
    main()
