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
  * test_mode_bf16_imgs_per_sec — bf16 serving with the reference test()
                     semantics (super_resolution.py:648: all students read
                     images_lr_psn), which runs the b1 students as ONE
                     vmapped pass and collapses the serial student↔PGRM
                     dependency chain.
  * corrected_serving_imgs_per_sec — faithful=False fp32 serving (the
                     spatially-correct layouts; PARITY.md).
  * loader_fed_imgs_per_sec   — eval throughput with batches streamed
                     through DataLoader + prefetch_to_device (host decode/
                     collate overlapped) instead of a resident device batch.
                     Methodology: LR-only transfer, best-of-2 runs.
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

Wall-clock contract (the driver kills the bench at its own timeout — round
4's single-line-at-the-end design timed out with NO parseable output):
  * the merged JSON line is RE-printed after EVERY completed section, so
    the LAST stdout line always parses and carries everything measured so
    far, even if the process is killed mid-run;
  * BENCH_BUDGET_S (default 600) is a soft wall-clock budget: sections run
    headline-first and a section is skipped when the elapsed time plus its
    cost estimate would exceed the budget; skips are listed in the
    "skipped_sections" field.  This mirrors the per-interval wall-clock
    discipline the reference keeps (interfaces/super_resolution.py:280-290).

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
    # cache even sub-second compiles: init_state dispatches ~800 tiny ops
    # eagerly, and each remote-service compile costs ~0.45 s — uncached they
    # add ~6 min to EVERY section (measured 2026-08-21); cached they are
    # local reads
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return jax


def _build_system(batch, **arg_overrides):
    jax = _init_jax()
    from dpmn_tpu.config import TrainCfg
    from dpmn_tpu.system import DPMNSystem
    from __graft_entry__ import _flagship_args

    cfg = TrainCfg(batch_size=batch, width=128, height=32)
    system = DPMNSystem(cfg, _flagship_args(**arg_overrides), glyph_mode="atlas")
    state = _jit_init(jax, system)
    return jax, system, state


def _jit_init(jax, system):
    """init_state as ONE jitted graph.  Eager init dispatches ~800 tiny ops
    and on this platform EACH costs a ~0.45 s remote-service round trip even
    when persistently cached (executable loads go through the service too —
    measured 2026-08-21: ~6 min per section just for init).  One fused graph
    is one compile and one cached load."""
    return jax.jit(lambda r: system.init_state(r, batch_size=2))(jax.random.PRNGKey(0))


def _time_forward(jax, batch, fn, iters=10, repeats=3):
    """Best-of-N pipelined timing: the axon tunnel occasionally stalls a
    single dispatch window for seconds (observed: 42 img/s on a loop that
    measured 432+ moments later in the same process); repeating the
    pipelined loop and keeping the fastest rejects such transients without
    biasing steady-state numbers."""
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    images_lr = jnp.asarray(rng.rand(batch, 16, 64, 4), jnp.float32)
    out = fn(images_lr)
    out.block_until_ready()
    dt = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        for _ in range(iters):
            out = fn(images_lr)
        out.block_until_ready()
        dt = min(dt, time.time() - t0)
    return batch * iters / dt


# --------------------------------------------------------------- sections


def section_eval():
    """Headline fp32 eval + roofline numbers (its own subprocess so the
    headline parses even if a later section stalls)."""
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    jax, system, state = _build_system(batch)

    import jax.numpy as jnp
    import numpy as np

    # compile ONCE and reuse the handle for both timing and cost analysis —
    # a second .lower().compile() re-loads the big executable from the
    # persistent cache (~100 s on this host)
    images_lr = jnp.asarray(np.random.RandomState(0).rand(batch, 16, 64, 4), jnp.float32)
    compiled = system.sr_forward.lower(state, images_lr, False).compile()

    iters = 10
    imgs_per_sec = _time_forward(jax, batch, lambda lr: compiled(state, lr), iters)
    out = {"value": round(imgs_per_sec, 2), "batch": batch}

    # analytic FLOPs of the compiled eval graph (the reference only has
    # unused flops() stubs, model/pgrm.py:98-105 — XLA's cost model covers
    # the whole pipeline instead)
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        dt = batch * iters / imgs_per_sec  # reconstruct best loop time
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            graph_tflop = flops / 1e12
            achieved = flops * iters / dt
            out["mfu"] = round(achieved / _peak_flops(jax.devices()[0].device_kind), 4)
            out["achieved_tflops"] = round(achieved / 1e12, 2)
            out["graph_tflop_per_batch"] = round(graph_tflop, 3)
            out["device"] = jax.devices()[0].device_kind
        nbytes = float(ca.get("bytes accessed", 0.0))
        if nbytes > 0:
            out["hbm_bw_util"] = round((nbytes * iters / dt) / _peak_hbm(jax.devices()[0].device_kind), 4)
            out["graph_gb_per_batch"] = round(nbytes / 1e9, 2)
    except Exception:
        pass
    return out


def section_bf16():
    """bf16 serving mode (sr_forward_bf16: host-cast bf16 params, bf16
    activations, argmax-safe students — a serving variant, NOT the parity
    path; the headline stays the quirk-exact fp32 number)."""
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    jax, system, state = _build_system(batch)
    v = _time_forward(jax, batch, lambda lr: system.sr_forward_bf16(state, lr))
    return {"bf16_serving_imgs_per_sec": round(v, 2)}


def section_serving_test(batch):
    """bf16 serving with the reference test() glyph semantics
    (glyph_from_psn=True — super_resolution.py:648): the b1 students run as
    one vmapped stack over the PSN output, so the per-iteration serial
    segment is PGRM-only.  The structural answer to the serial-residue
    analysis (STATUS.md round 4)."""
    jax, system, state = _build_system(batch)
    v = _time_forward(jax, batch, lambda lr: system.sr_forward_bf16(state, lr, True),
                      iters=10 if batch <= 64 else 6)
    return {f"test_mode_bf16_imgs_per_sec_b{batch}": round(v, 2)}


def section_corrected():
    """faithful=False fp32 serving: the spatially-correct Mlp/window
    layouts — a DIFFERENT architecture (weights trained in one mode only
    serve in that mode, PARITY.md), but the fastest fp32 serving graph."""
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    jax, system, state = _build_system(batch, faithful=False)
    v = _time_forward(jax, batch, lambda lr: system.sr_forward(state, lr))
    return {"corrected_serving_imgs_per_sec": round(v, 2)}


def section_loader():
    """Loader-fed serving throughput (VERDICT r3 #6): eval batches streamed
    through DataLoader + prefetch_to_device instead of a resident constant
    device batch — what serving sustains with host decode/collate
    overlapped.  Methodology (CHANGED round 5 — not comparable to the round-4
    434.1 img/s line): serving-only collate (ServingCollate — no HR/Y-channel
    prep), LR ships as uint8 and is normalized on device (bit-identical,
    tests/test_data_pipeline.py), best-of-2 runs."""
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    jax, system, state = _build_system(batch)

    from dpmn_tpu.data import DataLoader, ServingCollate, SyntheticTextZoom
    from dpmn_tpu.data.prefetch import normalize_uint8, prefetch_to_device

    n_batches = 16
    ds = SyntheticTextZoom(n=batch * (n_batches + 1))
    col = ServingCollate(img_h=32, img_w=128, down_sample_scale=2, mask=True)

    def serve(lr_u8):
        return system.sr_forward(state, normalize_uint8(lr_u8), False)

    def lr_stream():
        loader = DataLoader(ds, batch, col, shuffle=False, drop_last=True, workers=1)
        return prefetch_to_device(iter(loader), size=3)

    best = float("inf")
    for _ in range(2):  # best-of-2: reject one-off tunnel stalls
        stream = lr_stream()
        (lr0,) = next(stream)
        serve(lr0).block_until_ready()  # warm
        t0 = time.time()
        n_img, last = 0, None
        for (lr,) in stream:
            last = serve(lr)
            n_img += lr.shape[0]
        last.block_until_ready()
        best = min(best, (time.time() - t0) / n_img)
    return {"loader_fed_imgs_per_sec": round(1.0 / best, 2)}


def section_train(batch: int, train_dtype, faithful: bool = True):
    """One joint-train-step throughput measurement (VERDICT r3 #2)."""
    over = {} if faithful else {"faithful": False}
    jax = _init_jax()
    import jax.numpy as jnp
    import numpy as np

    from dpmn_tpu.config import TrainCfg
    from dpmn_tpu.system import DPMNSystem
    from __graft_entry__ import _flagship_args

    tag = "bf16" if train_dtype else "fp32"
    key = (f"train_{tag}_imgs_per_sec_b{batch}" if faithful
           else f"train_corrected_{tag}_imgs_per_sec_b{batch}")
    system = DPMNSystem(
        TrainCfg(batch_size=batch, width=128, height=32), _flagship_args(**over),
        glyph_mode="atlas", donate_state=True, train_dtype=train_dtype,
    )
    state = _jit_init(jax, system)
    rng = np.random.RandomState(0)
    hr = jnp.asarray(rng.rand(batch, 32, 128, 4), jnp.float32)
    lr = jnp.asarray(rng.rand(batch, 16, 64, 4), jnp.float32)
    key0 = jax.random.PRNGKey(1)
    state, m = system.train_step(state, hr, lr, key0)
    jax.block_until_ready(m)
    # best-of-2 loops: reject transient tunnel stalls (see _time_forward)
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
    "bf16": section_bf16,
    "serving_test_b64": lambda: section_serving_test(64),
    "train_bf16_b64": lambda: section_train(64, "bfloat16"),
    "train_fp32_b64": lambda: section_train(64, None),
    "corrected": section_corrected,
    "serving_test_b256": lambda: section_serving_test(256),
    "loader": section_loader,
    "train_bf16_b128": lambda: section_train(128, "bfloat16"),
    "train_fp32_b128": lambda: section_train(128, None),
    "train_corrected_b64": lambda: section_train(64, None, faithful=False),
}

# rough wall-clock cost estimates per section (seconds, WARM .jax_cache on
# this host/tunnel; override any with BENCH_EST_<name>=secs).  Used only
# for the budget skip decision — a cold cache blows these, in which case
# the in-flight subprocess timeout still bounds the run.
#
# Re-measured 2026-08-21: on this host even CACHED sections cost minutes —
# persistent-cache loads of the big executables round-trip the remote
# compile service (~100 s for a 58 MB entry), so a warm section is
# ~400-650 s (fused-init load + big-graph load + measure), not the 90-150 s
# these estimates previously assumed.  The headline (first section, never
# skipped) fits the driver window; the rest are honestly estimated so the
# 600 s default budget skips them cleanly instead of burning the window on
# a section that cannot finish.  Their measured values are recorded in
# STATUS.md from full manual runs (BENCH_BUDGET_S=50000).
EST_S = {
    "eval": 550.0,
    "bf16": 400.0,
    "serving_test_b64": 400.0,
    "train_bf16_b64": 420.0,
    "train_fp32_b64": 420.0,
    "corrected": 400.0,
    "serving_test_b256": 450.0,
    "loader": 300.0,
    "train_bf16_b128": 500.0,
    "train_fp32_b128": 500.0,
    "train_corrected_b64": 420.0,
}


def _emit(merged, skipped):
    """Build and print the full merged JSON line (last line wins)."""
    merged = dict(merged)
    imgs_per_sec = merged.pop("value", None)
    out = {
        "metric": "SR images/sec/chip (TATT+DPMN 3+3 eval pipeline, TextZoom shapes)",
        "value": imgs_per_sec,
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / PYTORCH_GPU_BASELINE_IMGS_PER_SEC, 3)
        if imgs_per_sec else None,
    }
    # derived: bf16 serving MFU from the eval section's graph FLOPs
    tfl, dev, batch = merged.get("graph_tflop_per_batch"), merged.get("device"), merged.get("batch")
    bf16 = merged.get("bf16_serving_imgs_per_sec")
    if tfl and dev and batch and bf16:
        merged["bf16_serving_mfu"] = round(tfl * 1e12 * bf16 / batch / _peak_flops(dev), 4)

    out.update(merged)
    if skipped:
        out["skipped_sections"] = skipped

    anchor_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    if os.path.exists(anchor_path) and imgs_per_sec:
        with open(anchor_path) as f:
            anchor = json.load(f)
        a = anchor.get("torch_reference_imgs_per_sec")
        if a:
            out["torch_anchor_imgs_per_sec"] = a
            out["torch_anchor_device"] = anchor.get("device", "")
            out["vs_torch_anchor"] = round(imgs_per_sec / a, 1)
    print(json.dumps(out), flush=True)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        print(json.dumps(SECTIONS[sys.argv[2]]()), flush=True)
        return

    budget = float(os.environ.get("BENCH_BUDGET_S", "600"))
    t_start = time.time()

    names = list(SECTIONS)
    if os.environ.get("BENCH_SKIP_TRAIN") == "1":
        names = [n for n in names if not n.startswith("train")]
    if os.environ.get("BENCH_SKIP_BF16") == "1":
        names = [n for n in names if "bf16" not in n and "serving_test" not in n]
    if os.environ.get("BENCH_SKIP_CORRECTED") == "1":
        names = [n for n in names if "corrected" not in n]
    if os.environ.get("BENCH_SKIP_LOADER") == "1":
        names = [n for n in names if n != "loader"]
    only = os.environ.get("BENCH_ONLY")
    if only:
        names = [n for n in only.split(",") if n in SECTIONS]

    merged = {}
    skipped = []
    walls = {}
    merged["section_wall_s"] = walls  # per-section wall clock, for budget tuning
    for i, name in enumerate(names):
        elapsed = time.time() - t_start
        est = float(os.environ.get(f"BENCH_EST_{name}", EST_S.get(name, 120.0)))
        if i > 0 and elapsed + est > budget:
            skipped.append(name)
            continue
        t_sec = time.time()
        remaining = max(budget - elapsed, est) + 60.0  # grace for the headline
        # each section is a fresh process (sequential — one TPU process at a
        # time): a fresh HBM arena for the ~15.3 GB-peak b128 train step,
        # and one section's failure cannot poison the others
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--section", name],
                capture_output=True, text=True, timeout=remaining,
            )
        except subprocess.TimeoutExpired as e:
            sys.stderr.write((e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or ""))
            print(f"bench section {name} timed out after {remaining:.0f}s", file=sys.stderr)
            skipped.append(name)
            walls[name] = round(time.time() - t_sec, 1)
            _emit(merged, skipped)
            continue
        walls[name] = round(time.time() - t_sec, 1)
        sys.stderr.write(proc.stderr)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            merged.update(json.loads(line))
        except (json.JSONDecodeError, IndexError):
            print(f"bench section {name} failed (rc={proc.returncode})", file=sys.stderr)
        _emit(merged, skipped)

    if not names:
        _emit(merged, skipped)


if __name__ == "__main__":
    main()
