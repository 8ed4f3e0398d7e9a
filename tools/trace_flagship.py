#!/usr/bin/env python
"""Capture + summarize an xprof trace of the flagship eval forward.

Writes a jax.profiler trace of system.sr_forward, then parses the xplane
protobuf and prints per-op total durations (TPU device plane only),
aggregated by HLO op-name prefix so the heavy phases stand out.

Usage: python tools/trace_flagship.py [--batch 64] [--iters 5] [--top 40]
"""

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def summarize(logdir: str, iters: int, top: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    assert paths, f"no xplane.pb under {logdir}"
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    def merged_busy(events):
        """Union of event intervals (ms) — busy time on a timeline line."""
        iv = sorted((ev.offset_ps, ev.offset_ps + ev.duration_ps) for ev in events)
        busy = 0
        cur_s = cur_e = None
        for s, e in iv:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    busy += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            busy += cur_e - cur_s
        return busy / 1e9

    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        print(f"\n=== plane: {plane.name}  ({iters} iters)")
        op_totals = collections.Counter()
        op_counts = collections.Counter()
        dma_totals = collections.Counter()
        for line in plane.lines:
            if not line.events:
                continue
            span = (max(ev.offset_ps + ev.duration_ps for ev in line.events)
                    - min(ev.offset_ps for ev in line.events)) / 1e9
            busy = merged_busy(line.events)
            print(f"  line {line.name!r:<24} busy {busy/iters:8.3f} ms/iter | "
                  f"span {span/iters:8.3f} ms/iter | idle {(span-busy)/iters:8.3f} ms/iter")
            if "op" not in line.name.lower():
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9  # ms
                # async DMA windows (copy-start..done) overlap compute; their
                # durations are wait windows, not occupancy — bucket apart
                if name.startswith("%copy-start") or name.startswith("%copy-done"):
                    dma_totals[name] += dur
                else:
                    op_totals[name] += dur
                    op_counts[name] += 1
        print("  --- top compute ops (self duration on the op line) ---")
        for name, ms in op_totals.most_common(top):
            print(f"{ms/iters:8.3f} ms/iter  x{op_counts[name]:<5d} {name[:110]}")
        if dma_totals:
            tot = sum(dma_totals.values())
            print(f"  --- async DMA windows (overlap compute; total window {tot/iters:.1f} ms/iter) ---")
            for name, ms in dma_totals.most_common(10):
                print(f"{ms/iters:8.3f} ms/iter         {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/dpmn_trace")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--train", action="store_true", help="trace the joint train step instead of eval")
    ap.add_argument("--amp", action="store_true", help="bfloat16 mixed-precision train step")
    ap.add_argument("--eval-bf16", action="store_true",
                    help="trace the bf16 serving forward (sr_forward_bf16) "
                         "instead of the fp32 parity eval")
    ap.add_argument("--donate", action="store_true",
                    help="donate_state=True (matches tools/bench_train.py's "
                         "executable so the persistent compile cache hits)")
    args = ap.parse_args()

    if not args.parse_only:
        from dpmn_tpu.config import TrainCfg
        from dpmn_tpu.system import DPMNSystem
        from __graft_entry__ import _flagship_args

        cfg = TrainCfg(batch_size=args.batch, width=128, height=32)
        system = DPMNSystem(cfg, _flagship_args(), glyph_mode="atlas",
                            donate_state=args.donate,
                            train_dtype="bfloat16" if args.amp else None)
        state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
        rng = np.random.RandomState(0)
        images_lr = jnp.asarray(rng.rand(args.batch, 16, 64, 4), jnp.float32)

        if args.train:
            images_hr = jnp.asarray(rng.rand(args.batch, 32, 128, 4), jnp.float32)
            key = jax.random.PRNGKey(1)
            state, metrics = system.train_step(state, images_hr, images_lr, key)
            jax.block_until_ready(metrics)
            os.system(f"rm -rf {args.logdir}")
            with jax.profiler.trace(args.logdir):
                for i in range(args.iters):
                    state, metrics = system.train_step(
                        state, images_hr, images_lr, jax.random.fold_in(key, i)
                    )
                jax.block_until_ready(metrics)
        else:
            fwd = system.sr_forward_bf16 if args.eval_bf16 else system.sr_forward
            sr = fwd(state, images_lr)
            sr.block_until_ready()

            os.system(f"rm -rf {args.logdir}")
            with jax.profiler.trace(args.logdir):
                for _ in range(args.iters):
                    sr = fwd(state, images_lr)
                sr.block_until_ready()

    summarize(args.logdir, args.iters, args.top)


if __name__ == "__main__":
    main()
