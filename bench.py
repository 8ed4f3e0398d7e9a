#!/usr/bin/env python
"""Headline benchmark: SR images/sec/chip on the flagship DPMN pipeline.

Measures the full eval-path throughput of the TATT+DPMN dual-branch system
(BASELINE.json config 3): frozen CRNN text prior → TATT PSN → 3+3 PGRM
cascade with VisionLAN glyph priors and device mask priors → CMM fusion →
α-blend.  This is what TextZoom evaluation and serving run per image.

Also reported in the same JSON line:
  * mfu            — achieved FLOP/s (XLA cost_analysis of the compiled
                     graph) ÷ chip peak bf16 FLOP/s.  The graph runs fp32
                     (quirk-exact), so this understates what a bf16 serving
                     build would reach; it is the honest roofline anchor.
  * achieved_tflops— the numerator, for the record.
  * bf16_serving_imgs_per_sec — the bf16 serving mode (host-cast weights).
  * loader_fed_imgs_per_sec   — eval throughput with batches streamed
                     through DataLoader + prefetch_to_device (host decode/
                     collate overlapped) instead of a resident device batch.
  * train_{fp32,bf16}_imgs_per_sec_b{64,128} — the joint train step, so
                     BENCH_r* catches training-path regressions.
  * torch_anchor_* — measured reference throughput from
                     BASELINE_MEASURED.json (tools/bench_torch_reference.py:
                     the ACTUAL reference code on this host's CPU — no GPU
                     exists here), when available.

Process structure: each section runs in its OWN subprocess (sequentially —
one TPU process at a time).  The batch-128 train step peaks at ~15.3 GB of
the v5e's 16 GB HBM (tools/hbm_breakdown.py --peak-memory), so it only fits
in a fresh arena; in-process sequencing after the eval sections left it
RESOURCE_EXHAUSTED.  A section that fails prints its traceback to stderr
and is simply absent from the JSON line.

vs_baseline: the reference publishes no numbers (BASELINE.md); the
denominator stays the assumed 100 images/sec for a V100-class GPU so the
series is comparable across rounds (BASELINE_MEASURED.json carries the
analytic V100/A100 bound placing that anchor).  The measured host-CPU
anchor is reported alongside.
"""

import json
import os
import subprocess
import sys
import time

# persistent compilation cache: the flagship graph is large and the build
# host is small; cache compiled executables across runs
os.makedirs("/root/repo/.jax_cache", exist_ok=True)

PYTORCH_GPU_BASELINE_IMGS_PER_SEC = 100.0

# peak dense bf16 FLOP/s per chip by device kind (public spec sheets)
_PEAK_BF16 = (
    ("v6", 918e12),  # Trillium
    ("v5p", 459e12),
    ("v5", 197e12),  # v5e / v5 lite
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def _peak_flops(device_kind: str) -> float:
    dk = device_kind.lower()
    for key, peak in _PEAK_BF16:
        if key in dk:
            return peak
    return 197e12  # conservative default


# peak HBM bandwidth per chip (public spec sheets) — the eval/train graphs
# are bandwidth-bound, so the roofline fraction that matters is GB/s, not
# MFU; both are reported
_PEAK_HBM = (
    ("v6", 1640e9),
    ("v5p", 2765e9),
    ("v5", 819e9),  # v5e / v5 lite
    ("v4", 1228e9),
    ("v3", 900e9),
    ("v2", 700e9),
)


def _peak_hbm(device_kind: str) -> float:
    dk = device_kind.lower()
    for key, peak in _PEAK_HBM:
        if key in dk:
            return peak
    return 819e9


def _init_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


# --------------------------------------------------------------- sections


def section_eval():
    """Headline fp32 eval + bf16 serving + loader-fed serving."""
    jax = _init_jax()
    import jax.numpy as jnp
    import numpy as np

    from dpmn_tpu.config import TrainCfg
    from dpmn_tpu.system import DPMNSystem
    from __graft_entry__ import _flagship_args

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    cfg = TrainCfg(batch_size=batch, width=128, height=32)
    args = _flagship_args()
    system = DPMNSystem(cfg, args, glyph_mode="atlas")
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)

    rng = np.random.RandomState(0)
    images_lr = jnp.asarray(rng.rand(batch, 16, 64, 4), jnp.float32)

    # warmup / compile
    sr = system.sr_forward(state, images_lr)
    sr.block_until_ready()

    # best-of-N timing: the axon tunnel occasionally stalls a single
    # dispatch window for seconds (observed: 42 img/s on a loop that
    # measured 432+ moments later in the same process); repeating the
    # pipelined loop and keeping the fastest rejects such transients
    # without biasing steady-state numbers
    iters, repeats = 10, 3
    dt = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        for _ in range(iters):
            sr = system.sr_forward(state, images_lr)
        sr.block_until_ready()
        dt = min(dt, time.time() - t0)

    imgs_per_sec = batch * iters / dt

    # bf16 serving mode (sr_forward_bf16: host-cast bf16 params, bf16
    # activations, argmax-safe students — a serving variant, NOT the parity
    # path; the headline stays the quirk-exact fp32 number).  Skippable for
    # quick runs with BENCH_SKIP_BF16=1.
    bf16_imgs_per_sec = None
    if os.environ.get("BENCH_SKIP_BF16") != "1":
        try:
            sr16 = system.sr_forward_bf16(state, images_lr)
            sr16.block_until_ready()
            dt16 = float("inf")
            for _ in range(repeats):
                t0 = time.time()
                for _ in range(iters):
                    sr16 = system.sr_forward_bf16(state, images_lr)
                sr16.block_until_ready()
                dt16 = min(dt16, time.time() - t0)
            bf16_imgs_per_sec = batch * iters / dt16
        except Exception:
            import traceback

            print("bf16 serving measurement failed:", file=sys.stderr)
            traceback.print_exc()

    # corrected (faithful=False) serving mode: the spatially-correct
    # Mlp/window layouts — a DIFFERENT architecture (weights trained in one
    # mode only serve in that mode, PARITY.md), but the fastest fp32 serving
    # graph (the quirk relayout byte family is gone and the fused kernel
    # supports the layout).  Skippable with BENCH_SKIP_CORRECTED=1.
    corrected_imgs_per_sec = None
    if os.environ.get("BENCH_SKIP_CORRECTED") != "1":
        try:
            system_c = DPMNSystem(cfg, _flagship_args(faithful=False), glyph_mode="atlas")
            state_c = system_c.init_state(jax.random.PRNGKey(0), batch_size=2)
            sr_c = system_c.sr_forward(state_c, images_lr)
            sr_c.block_until_ready()
            dtc = float("inf")
            for _ in range(repeats):
                t0 = time.time()
                for _ in range(iters):
                    sr_c = system_c.sr_forward(state_c, images_lr)
                sr_c.block_until_ready()
                dtc = min(dtc, time.time() - t0)
            corrected_imgs_per_sec = batch * iters / dtc
        except Exception:
            import traceback

            print("corrected serving measurement failed:", file=sys.stderr)
            traceback.print_exc()

    # analytic FLOPs of the compiled eval graph (the reference only has
    # unused flops() stubs, model/pgrm.py:98-105 — XLA's cost model covers
    # the whole pipeline instead)
    mfu = achieved_tflops = graph_tflop = None
    graph_gb = hbm_frac = None
    try:
        compiled = system.sr_forward.lower(state, images_lr, False).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            graph_tflop = flops / 1e12
            achieved = flops * iters / dt
            achieved_tflops = achieved / 1e12
            mfu = achieved / _peak_flops(jax.devices()[0].device_kind)
        nbytes = float(ca.get("bytes accessed", 0.0))
        if nbytes > 0:
            graph_gb = nbytes / 1e9
            hbm_frac = (nbytes * iters / dt) / _peak_hbm(jax.devices()[0].device_kind)
    except Exception:
        pass

    out = {
        "value": round(imgs_per_sec, 2),
    }
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
        out["achieved_tflops"] = round(achieved_tflops, 2)
        out["graph_tflop_per_batch"] = round(graph_tflop, 3)
        out["device"] = jax.devices()[0].device_kind
    if hbm_frac is not None:
        # the graph is bandwidth-bound: the binding roofline fraction
        out["hbm_bw_util"] = round(hbm_frac, 4)
        out["graph_gb_per_batch"] = round(graph_gb, 2)
    if corrected_imgs_per_sec is not None:
        out["corrected_serving_imgs_per_sec"] = round(corrected_imgs_per_sec, 2)
    if bf16_imgs_per_sec is not None:
        out["bf16_serving_imgs_per_sec"] = round(bf16_imgs_per_sec, 2)
        if graph_tflop is not None:
            out["bf16_serving_mfu"] = round(
                graph_tflop * 1e12 * bf16_imgs_per_sec / batch
                / _peak_flops(jax.devices()[0].device_kind), 4,
            )

    # loader-fed serving throughput (VERDICT r3 #6): eval batches streamed
    # through DataLoader + prefetch_to_device instead of a resident constant
    # device batch — what serving sustains with host decode/collate
    # overlapped.  Skippable with BENCH_SKIP_LOADER=1.
    if os.environ.get("BENCH_SKIP_LOADER") != "1":
        try:
            from dpmn_tpu.data import AlignCollate, DataLoader, SyntheticTextZoom
            from dpmn_tpu.data.prefetch import prefetch_to_device

            n_batches = 16
            ds = SyntheticTextZoom(n=batch * (n_batches + 1))
            col = AlignCollate(img_h=32, img_w=128, down_sample_scale=2, mask=True, train=False)

            def lr_stream():
                # serving consumes only the LR tensor — ship just it through
                # the (tunnel) host→device link; the collate still prepares
                # the full batch on the host, so host cost is all counted
                loader = DataLoader(ds, batch, col, shuffle=False, drop_last=True, workers=1)
                return prefetch_to_device(((b[1],) for b in iter(loader)), size=3)

            best = float("inf")
            for _ in range(2):  # best-of-2: reject one-off tunnel stalls
                stream = lr_stream()
                (lr0,) = next(stream)
                system.sr_forward(state, lr0, False).block_until_ready()  # warm
                t0 = time.time()
                n_img, last = 0, None
                for (lr,) in stream:
                    last = system.sr_forward(state, lr, False)
                    n_img += lr.shape[0]
                last.block_until_ready()
                best = min(best, (time.time() - t0) / n_img)
            out["loader_fed_imgs_per_sec"] = round(1.0 / best, 2)
        except Exception:
            import traceback

            print("loader-fed measurement failed:", file=sys.stderr)
            traceback.print_exc()

    return out


def section_train(batch: int, train_dtype):
    """One joint-train-step throughput measurement (VERDICT r3 #2)."""
    jax = _init_jax()
    import jax.numpy as jnp
    import numpy as np

    from dpmn_tpu.config import TrainCfg
    from dpmn_tpu.system import DPMNSystem
    from __graft_entry__ import _flagship_args

    key = f"train_{'bf16' if train_dtype else 'fp32'}_imgs_per_sec_b{batch}"
    system = DPMNSystem(
        TrainCfg(batch_size=batch, width=128, height=32), _flagship_args(),
        glyph_mode="atlas", donate_state=True, train_dtype=train_dtype,
    )
    state = system.init_state(jax.random.PRNGKey(0), batch_size=2)
    rng = np.random.RandomState(0)
    hr = jnp.asarray(rng.rand(batch, 32, 128, 4), jnp.float32)
    lr = jnp.asarray(rng.rand(batch, 16, 64, 4), jnp.float32)
    key0 = jax.random.PRNGKey(1)
    state, m = system.train_step(state, hr, lr, key0)
    jax.block_until_ready(m)
    # best-of-2 loops: reject transient tunnel stalls (see section_eval)
    iters = 10 if batch <= 64 else 6
    dt = float("inf")
    for r in range(2):
        t0 = time.time()
        for i in range(iters):
            state, m = system.train_step(state, hr, lr, jax.random.fold_in(key0, r * iters + i))
        jax.block_until_ready(m)
        dt = min(dt, time.time() - t0)
    return {key: round(batch * iters / dt, 2)}


SECTIONS = {
    "eval": section_eval,
    "train_fp32_b64": lambda: section_train(64, None),
    "train_bf16_b64": lambda: section_train(64, "bfloat16"),
    "train_fp32_b128": lambda: section_train(128, None),
    "train_bf16_b128": lambda: section_train(128, "bfloat16"),
}


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        print(json.dumps(SECTIONS[sys.argv[2]]()))
        return

    names = ["eval"]
    if os.environ.get("BENCH_SKIP_TRAIN") != "1":
        names += ["train_fp32_b64", "train_bf16_b64", "train_fp32_b128", "train_bf16_b128"]

    merged = {}
    for name in names:
        # each section is a fresh process (sequential — one TPU process at a
        # time): a fresh HBM arena for the ~15.3 GB-peak b128 train step,
        # and one section's failure cannot poison the others
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--section", name],
            capture_output=True, text=True,
        )
        sys.stderr.write(proc.stderr)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            merged.update(json.loads(line))
        except (json.JSONDecodeError, IndexError):
            print(f"bench section {name} failed (rc={proc.returncode})", file=sys.stderr)

    imgs_per_sec = merged.pop("value", None)
    out = {
        "metric": "SR images/sec/chip (TATT+DPMN 3+3 eval pipeline, TextZoom shapes)",
        "value": imgs_per_sec,
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / PYTORCH_GPU_BASELINE_IMGS_PER_SEC, 3)
        if imgs_per_sec else None,
    }
    out.update(merged)

    anchor_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    if os.path.exists(anchor_path) and imgs_per_sec:
        with open(anchor_path) as f:
            anchor = json.load(f)
        a = anchor.get("torch_reference_imgs_per_sec")
        if a:
            out["torch_anchor_imgs_per_sec"] = a
            out["torch_anchor_device"] = anchor.get("device", "")
            out["vs_torch_anchor"] = round(imgs_per_sec / a, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
