#!/usr/bin/env python
"""Static HBM-traffic breakdown of the flagship train step's optimized HLO.

The train step is HBM-bandwidth bound (XLA cost_analysis: 147.5 GB accessed
per batch-64 fp32 step over ~199 ms ≈ 740 GB/s on a ~819 GB/s v5e), so the
optimization currency is bytes, not FLOPs.  This tool compiles the step
(persistent-cache fast), parses the optimized HLO, and aggregates the bytes
of every top-level buffer that gets WRITTEN (entry-computation instruction
outputs — fusion internals stay in VMEM and are free) by opcode and dtype.

For an AMP graph the dtype split answers "which f32 traffic remains after
the bf16 casts": every multi-MB f32 buffer in the list is either a master
copy (expected: Adam state, param casts) or a promotion leak (a bug).

The same analysis applies to the serving graphs: --graph eval audits the
quirk-exact fp32 sr_forward, --graph eval_bf16 the bf16 serving variant
(sr_forward_bf16) — the dtype split there answers whether the bf16 graph
actually halved its HBM bytes or still moves fp32-sized buffers.

Usage: python tools/hbm_breakdown.py [--graph train|eval|eval_bf16] [--amp]
       [--batch 64] [--top 40] [--peak-memory]
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_DT_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "token": 0, "opaque": 0,
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def shape_bytes(type_str):
    """Sum buffer bytes over every array shape in an HLO result type
    (handles tuples by summing all components)."""
    total = 0
    by_dtype = collections.Counter()
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _DT_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        b = n * _DT_BYTES[dt]
        total += b
        by_dtype[dt] += b
    return total, by_dtype


def analyze(text, top):
    """Aggregate output-buffer bytes over every non-fusion-body computation.

    Entry instructions and loop/conditional bodies materialize buffers;
    'fused_computation' bodies do not (their only output is the fusion
    instruction's, already counted at the call site)."""
    by_op = collections.Counter()
    by_dtype = collections.Counter()
    biggest = []
    in_fusion_body = False
    for line in text.splitlines():
        s = line.strip()
        if s.endswith("{") and "->" in s:
            # computation header.  Fusion bodies ('%fused_computation...')
            # are VMEM-internal — skip their instructions; everything else
            # (ENTRY, while/cond region bodies, called computations)
            # materializes buffers per execution.
            name = s.split()[0].lstrip("%")
            in_fusion_body = name.startswith("fused_")
            continue
        if s == "}":
            in_fusion_body = False
            continue
        if in_fusion_body or "=" not in s:
            continue
        lhs, rhs = s.split("=", 1)
        # result type sits between '=' and the opcode: the first lowercase
        # word followed by '(' (layout tags T(8,128)/S(1) are uppercase)
        om = re.search(r"\s([a-z][a-z0-9-]*)\(", " " + rhs)
        if not om:
            continue
        op = om.group(1)
        if op in ("parameter", "constant", "get-tuple-element", "tuple", "bitcast"):
            continue  # no new buffer written
        b, dts = shape_bytes(rhs[: om.start()])
        if b == 0:
            continue
        by_op[op] += b
        for dt, v in dts.items():
            by_dtype[dt] += v
        biggest.append((b, op, lhs.strip()[:90]))
    biggest.sort(reverse=True)
    print("== bytes written by opcode ==")
    for op, b in by_op.most_common(25):
        print(f"  {op:28s} {b / 1e9:8.3f} GB")
    print("== bytes written by dtype ==")
    for dt, b in by_dtype.most_common():
        print(f"  {dt:6s} {b / 1e9:8.3f} GB")
    print(f"== top {top} single buffers ==")
    for b, op, lhs in biggest[:top]:
        print(f"  {b / 1e6:9.1f} MB  {op:18s} {lhs}")
    print(f"TOTAL written: {sum(by_op.values()) / 1e9:.2f} GB")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="train", choices=("train", "eval", "eval_bf16"),
                    help="which flagship graph to audit (default: the train step)")
    ap.add_argument("--amp", action="store_true")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="audit the gradient-accumulation train step instead "
                    "(--batch is the GLOBAL batch; batch/grad_accum per microbatch) "
                    "— the memory_analysis proves whether the shipped batch-1024 "
                    "config fits one chip")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--peak-memory", action="store_true",
                    help="also report the compiled executable's memory analysis "
                    "(HBM argument/output/temp/generated-code bytes)")
    ap.add_argument("--hlo-out", default="")
    ap.add_argument("--from-dump", default="",
                    help="analyze an existing optimized-HLO text file (no device)")
    args = ap.parse_args()

    if args.from_dump:
        analyze(open(args.from_dump).read(), args.top)
        return

    from dpmn_tpu.config import TrainCfg
    from dpmn_tpu.system import DPMNSystem
    from __graft_entry__ import _flagship_args

    cfg = TrainCfg(batch_size=args.batch, width=128, height=32)
    system = DPMNSystem(
        cfg, _flagship_args(), glyph_mode="atlas",
        donate_state=args.graph == "train",
        train_dtype="bfloat16" if args.amp else None,
    )
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    lr = jnp.zeros((args.batch, 16, 64, 4), jnp.float32)
    # reuse the system's own jitted entry points (same donation config) so
    # this lowers to the exact graphs bench.py / bench_train.py run and hits
    # their persistent-cache entries
    if args.graph == "train":
        hr = jnp.zeros((args.batch, 32, 128, 4), jnp.float32)
        step = (system.make_accum_train_step(args.grad_accum)
                if args.grad_accum > 1 else system.train_step)
        lowered = step.lower(state, hr, lr, jax.random.PRNGKey(1))
    elif args.graph == "eval":
        lowered = system.sr_forward.lower(state, lr, False)
    else:
        lowered = system._sr_forward_bf16_jit.lower(system.bf16_state(state), lr)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    print(f"graph={args.graph} batch={args.batch}")
    print(f"cost_analysis: flops={float(ca.get('flops', 0)) / 1e12:.3f} TF "
          f"bytes={float(ca.get('bytes accessed', 0)) / 1e9:.2f} GB")
    if args.peak_memory:
        try:
            ma = compiled.memory_analysis()
            print(
                "memory_analysis: "
                f"args={ma.argument_size_in_bytes / 1e9:.3f} GB "
                f"out={ma.output_size_in_bytes / 1e9:.3f} GB "
                f"temp={ma.temp_size_in_bytes / 1e9:.3f} GB "
                f"code={ma.generated_code_size_in_bytes / 1e6:.1f} MB "
                f"alias={ma.alias_size_in_bytes / 1e9:.3f} GB "
                f"peak≈args+out+temp-alias="
                f"{(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes - ma.alias_size_in_bytes) / 1e9:.3f} GB"
            )
        except Exception as e:  # older jaxlibs
            print(f"memory_analysis unavailable: {e}")
    text = compiled.as_text()
    if args.hlo_out:
        with open(args.hlo_out, "w") as f:
            f.write(text)
        print(f"optimized HLO -> {args.hlo_out} ({len(text.splitlines())} lines)")
    analyze(text, args.top)


if __name__ == "__main__":
    main()
