#!/usr/bin/env python
"""Find the smallest composed train step that reproduces the bf16 AMP cliff,
then explain it at the HLO level.

Round-2 facts (STATUS.md): the flagship joint step runs 322 img/s fp32 but
5-19 img/s bf16, even with every Pallas kernel off, while NO module
regresses in isolation (tools/bisect_amp.py) — the pathology is in the
COMPOSITION of the bf16 graph.  This tool bisects along the composition
axes instead of the module axis:

  --steps geometry sweep: measures fp32 vs bf16 ms/step for a ladder of
    (b1+b2 iters, srb, embed_dim, batch) from tiny to flagship and reports
    where the bf16/f32 ratio explodes.  A small cliffy graph compiles in
    ~1 min instead of ~35, making the HLO diff tractable.
  --hlo: for one geometry, dumps BOTH optimized HLO texts, prints an
    op-kind histogram diff (fusion count/size, convert chains, copies,
    all-reduce, custom-calls) and the 15 largest fusion computations by
    instruction count, to /tmp/amp_hlo_{f32,bf16}.txt.
  --variant: isolates which AMP ingredient triggers it at one geometry:
    'full' (the real step), 'params-only' (cast params, keep f32 images),
    'acts-only' (cast images, keep f32 params), 'no-clip' (drop the
    per-module clip from the chain), 'fwd-only' (no grad).

Usage (on the TPU host, one process at a time):
  python tools/amp_cliff.py --steps
  python tools/amp_cliff.py --hlo --b1 1 --b2 1 --srb 1 --embed 32 --batch 16
  python tools/amp_cliff.py --variant full,params-only,acts-only,no-clip
"""

import argparse
import collections
import json
import os
import re
import sys
import time

sys.path.insert(0, ".")

import jax

if os.environ.get("DPMN_AMP_CPU") == "1":  # logic smoke off-TPU
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_system(b1, b2, srb, embed, batch, train_dtype):
    from dpmn_tpu.config import TrainCfg
    from dpmn_tpu.system import DPMNSystem
    from __graft_entry__ import _flagship_args

    cfg = TrainCfg(batch_size=batch, width=128, height=32)
    n = b1 + b2
    over = dict(
        stu_iter_b1=b1, stu_iter_b2=b2, srb=srb,
        patch_size="2," * n, embed_dim=(f"{embed}," * n),
        window_size="2,4,8," * n, depths="1," * n, num_heads="6," * n,
        mlp_ratio="4," * n, drop_rate="0.1," * n, attn_drop_rate="0.1," * n,
        drop_path_rate="0.1," * n,
    )
    system = DPMNSystem(cfg, _flagship_args(**over), glyph_mode="atlas",
                        train_dtype=train_dtype)
    return system


def measure_step(system, batch, iters=5):
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    rng = np.random.RandomState(0)
    hr = jnp.asarray(rng.rand(batch, 32, 128, 4), jnp.float32)
    lr = jnp.asarray(rng.rand(batch, 16, 64, 4), jnp.float32)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    state, m = system.train_step(state, hr, lr, key)
    jax.block_until_ready(m)
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(iters):
        state, m = system.train_step(state, hr, lr, jax.random.fold_in(key, i))
    jax.block_until_ready(m)
    return (time.time() - t0) / iters * 1000.0, compile_s


def cmd_steps(args):
    ladder = [
        # (b1, b2, srb, embed, batch) — embeds must split across the 3
        # window groups the way the flagship does (24 and 96 are the
        # test/flagship values known to satisfy the group/head split)
        (1, 1, 1, 24, 16),
        (1, 1, 5, 96, 16),
        (2, 2, 5, 96, 16),
        (3, 3, 5, 96, 16),
        (3, 3, 5, 96, 64),
    ]
    for geo in ladder:
        b1, b2, srb, embed, batch = geo
        row = {"geo": f"b{b1}+{b2} srb{srb} e{embed} B{batch}"}
        for dt in (None, "bfloat16"):
            sysm = build_system(b1, b2, srb, embed, batch, dt)
            ms, comp = measure_step(sysm, batch, args.iters)
            row["f32_ms" if dt is None else "bf16_ms"] = round(ms, 1)
            row["f32_compile_s" if dt is None else "bf16_compile_s"] = round(comp, 1)
        row["ratio"] = round(row["bf16_ms"] / max(row["f32_ms"], 1e-9), 2)
        print(json.dumps(row), flush=True)


def hlo_histogram(text):
    ops = collections.Counter()
    fusion_sizes = {}
    cur_fusion, cur_count = None, 0
    for line in text.splitlines():
        s = line.strip()
        m = re.match(r"%?([\w.-]+)\s*=", s)
        if s.startswith("%fused_") or (s.startswith("fused_") and "{" in s):
            cur_fusion = s.split()[0]
            cur_count = 0
        if m:
            rhs = s.split("=", 1)[1].strip()
            om = re.search(r"\)?\s*([a-z-]+)\(", rhs)
            if om:
                ops[om.group(1)] += 1
                if cur_fusion:
                    cur_count += 1
        if cur_fusion and s == "}":
            fusion_sizes[cur_fusion] = cur_count
            cur_fusion = None
    return ops, fusion_sizes


def cmd_hlo(args):
    for dt, tag in ((None, "f32"), ("bfloat16", "bf16")):
        sysm = build_system(args.b1, args.b2, args.srb, args.embed, args.batch, dt)
        state = sysm.init_state(jax.random.PRNGKey(0), batch_size=2)
        hr = jnp.zeros((args.batch, 32, 128, 4), jnp.float32)
        lr = jnp.zeros((args.batch, 16, 64, 4), jnp.float32)
        key = jax.random.PRNGKey(1)
        lowered = jax.jit(sysm._train_step_impl).lower(state, hr, lr, key)
        compiled = lowered.compile()
        text = compiled.as_text()
        path = f"/tmp/amp_hlo_{tag}.txt"
        with open(path, "w") as f:
            f.write(text)
        ops, fusions = hlo_histogram(text)
        print(f"=== {tag}: {len(text.splitlines())} HLO lines -> {path}")
        for op, n in ops.most_common(20):
            print(f"  {op:24s} {n}")
        big = sorted(fusions.items(), key=lambda kv: -kv[1])[:15]
        print("  largest fusions:", [(k[:40], v) for k, v in big])
        try:
            mem = compiled.memory_analysis()
            print(f"  temp {getattr(mem, 'temp_size_in_bytes', '?')} "
                  f"output {getattr(mem, 'output_size_in_bytes', '?')} "
                  f"argument {getattr(mem, 'argument_size_in_bytes', '?')}")
        except Exception as e:  # noqa: BLE001
            print("  (memory_analysis unavailable)", e)


def cmd_variant(args):
    """Variants: f32 | full | frozen-only | trainable-only | no-clip.
    frozen-only casts only the frozen forward chain (PSN/students/images);
    trainable-only casts only the differentiated cascade params/batch_stats
    (system.amp_scope knob); no-clip drops per_module_clip from the chain."""
    import optax

    for name in args.variant.split(","):
        dt = None if name == "f32" else "bfloat16"
        sysm = build_system(args.b1, args.b2, args.srb, args.embed, args.batch, dt)
        if name in ("frozen-only", "trainable-only"):
            sysm.amp_scope = name
        if name == "no-clip":
            sysm._adam = optax.adam(sysm.cfg.lr, b1=sysm.cfg.beta1, b2=0.999, eps=1e-8)
        sysm.train_step = jax.jit(sysm._train_step_impl)  # rebind after knobs
        ms, comp = measure_step(sysm, args.batch, args.iters)
        print(json.dumps({"variant": name, "ms": round(ms, 1),
                          "compile_s": round(comp, 1)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", action="store_true")
    ap.add_argument("--hlo", action="store_true")
    ap.add_argument("--variant", type=str, default="")
    ap.add_argument("--b1", type=int, default=1)
    ap.add_argument("--b2", type=int, default=1)
    ap.add_argument("--srb", type=int, default=1)
    ap.add_argument("--embed", type=int, default=24)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    if args.steps:
        cmd_steps(args)
    if args.hlo:
        cmd_hlo(args)
    if args.variant:
        cmd_variant(args)


if __name__ == "__main__":
    main()
