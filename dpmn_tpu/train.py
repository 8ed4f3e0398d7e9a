"""Training / evaluation / test driver (the TextSR equivalent).

Parity targets: interfaces/super_resolution.py —
  * train (:25-337): epoch/batch loop, displayInterval wall-clock prints,
    valInterval eval over easy/medium/hard with best-acc tracking and
    checkpointing, saveInterval checkpoints, log.csv rows
    [epoch, dataset, acc, psnr, ssim, best*] (main.py:27-31)
  * eval (:340-513): PSN → cascade → CMM → α-blend, PSNR/SSIM means over
    batches, recognizer word accuracy vs str_filt(label, 'lower')
  * test (:515-776): same + per-image duration, test_result.csv rows
    [rec, subset, acc, psnr, ssim]; the student recognizers read
    images_lr_psn instead of the cascade (:648) — reproduced via the
    system's glyph_from_psn flag.
"""

from __future__ import annotations

import csv
import os
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint import load_checkpoint, save_checkpoint
from .config import Args, TrainCfg
from .data import AlignCollate, ConcatDataset, DataLoader, SyntheticTextZoom, TextZoomLMDB
from .evaluator import build_evaluator
from .system import DPMNSystem
from .utils import metrics as M
from .utils.labels import str_filt
from .utils.seed import set_seed
from .weights import evaluator_pretrained_path, load_driver_weights, resolve_native_checkpoint


class Trainer:
    def __init__(self, cfg: TrainCfg, args: Args, glyph_mode: str | None = None):
        self.cfg = cfg
        self.args = args
        if getattr(args, "debug_nans", False):
            jax.config.update("jax_debug_nans", True)
        if glyph_mode is None:
            # this TPU runtime does not support jax.pure_callback inside jit
            # (CLAUDE.md) — use the device atlas there; the bit-parity host
            # renderer everywhere callbacks work
            glyph_mode = os.environ.get(
                "DPMN_TPU_GLYPH_MODE",
                "atlas" if jax.default_backend() == "tpu" else "callback",
            )
        # DPMN_TPU_TRAIN_DTYPE=bfloat16 enables mixed-precision training
        # (fp32 master params/losses, bf16 compute — see PARITY.md); the
        # default keeps the reference's fp32 step.
        train_dtype = os.environ.get("DPMN_TPU_TRAIN_DTYPE") or None
        self.system = DPMNSystem(cfg, args, glyph_mode=glyph_mode, train_dtype=train_dtype)
        self.batch_size = args.batch_size or cfg.batch_size
        self.rng = set_seed(cfg.manualSeed)
        self.evaluator = None
        self._amp_warned = False

        # Data parallelism wired the way the reference wires DataParallel
        # into every model automatically (base.py:161-162, ngpu from yaml):
        # --data_parallel N (0 = cfg.ngpu; ngpu<=1 keeps single-device) lays
        # a 1-D 'data' mesh over the first N local devices and routes
        # train/eval steps through sharded jits (parallel/mesh.py).
        self.mesh = None
        n_dp = args.data_parallel or cfg.ngpu
        if n_dp > 1:
            from .parallel import make_mesh, make_parallel_trainer

            self.mesh = make_mesh(n_dp)
            self._p_train_step, self._p_sr_forward = make_parallel_trainer(self.system, self.mesh)
            if self.batch_size % n_dp:
                raise ValueError(
                    f"batch_size={self.batch_size} is not divisible by data_parallel={n_dp}"
                )

        # --grad_accum N: one optimizer step per N sequential microbatches
        # (the single-chip route to the shipped batch 1024 —
        # system.make_accum_train_step docstring); composes with the mesh.
        self.grad_accum = max(int(getattr(args, "grad_accum", 1) or 1), 1)
        if self.grad_accum > 1:
            if self.batch_size % self.grad_accum:
                raise ValueError(
                    f"batch_size={self.batch_size} is not divisible by grad_accum={self.grad_accum}"
                )
            accum_step = self.system.make_accum_train_step(self.grad_accum, mesh=self.mesh)
            if self.mesh is None:
                self.system.train_step = accum_step
            else:
                self._p_train_step = accum_step

    # ------------------------------------------------------------- sharding

    def _replicate(self, state):
        if self.mesh is None:
            return state
        from .parallel import replicate_state

        return replicate_state(self.mesh, state)

    def _sr_forward(self, state, lr, test_mode: bool):
        """Single-device or mesh-sharded SR forward.  Eval loaders keep
        partial final batches (drop_last=False); on the mesh the batch is
        padded to a device multiple and the padding rows sliced back off —
        the sharded-vs-single equivalence is test-gated (test_trainer.py)."""
        if self.mesh is None:
            return self.system.sr_forward(state, lr, test_mode)
        from .parallel import shard_batch

        n = int(self.mesh.devices.size)
        b = lr.shape[0]
        pad = (-b) % n
        if pad:
            lr = jnp.concatenate([lr, jnp.repeat(lr[-1:], pad, axis=0)])
        sr = self._p_sr_forward(state, shard_batch(self.mesh, lr), test_mode)
        return sr[:b] if pad else sr

    # ------------------------------------------------------------------ data

    def _dataset(self, root, test: bool):
        if self.args.synthetic_data:
            return SyntheticTextZoom(n=max(self.batch_size * 4, 64))
        return TextZoomLMDB(root, voc_type=self.cfg.voc_type, max_len=self.cfg.max_len, test=test)

    def get_train_loader(self):
        roots = self.cfg.train_data_dir or [None]
        ds = ConcatDataset([self._dataset(r, False) for r in roots])
        col = AlignCollate(
            img_h=self.cfg.height, img_w=self.cfg.width,
            down_sample_scale=self.cfg.down_sample_scale, mask=self.args.mask, train=True,
        )
        return DataLoader(
            ds, self.batch_size, col, shuffle=True, drop_last=True,
            seed=self.cfg.manualSeed, workers=self.cfg.workers,
        )

    def get_val_loaders(self):
        roots = self.cfg.val_data_dir or [None]
        out = []
        for r in roots:
            ds = self._dataset(r, True)
            col = AlignCollate(
                img_h=self.cfg.height, img_w=self.cfg.width,
                down_sample_scale=self.cfg.down_sample_scale, mask=self.args.mask,
                train=False, e_substitution=True,
            )
            name = (r or "synthetic").rstrip("/").split("/")[-1]
            out.append((
                name,
                DataLoader(ds, self.batch_size, col, shuffle=True, drop_last=False,
                           workers=self.cfg.workers),
            ))
        return out

    # ------------------------------------------------------------------ eval

    def evaluate(self, state, loader, max_batches: int = None, vis_index=None, test_mode: bool = False):
        if self.evaluator is None:
            # the --rec judge, loaded from the VAL-config checkpoint when one
            # is named (rec/moran/crnn_pretrained — base.py:375-439)
            self.evaluator = build_evaluator(
                self.args.rec, jax.random.PRNGKey(7), voc_type=self.cfg.voc_type,
                pretrained=evaluator_pretrained_path(self.args.rec, self.cfg),
            )
        n_correct, n_images = 0, 0
        psnrs, ssims = [], []
        last = None
        for bi, batch in enumerate(loader):
            if max_batches is not None and bi >= max_batches:
                break
            hr, lr, _, _, label_strs, _ = batch
            hr = jnp.asarray(hr)
            lr = jnp.asarray(lr)
            if self.args.rotate_test:
                # quirk parity: eval rotates by the rotate_TRAIN magnitude
                # (super_resolution.py:360)
                from .ops.rotate import random_rotate

                self.rng, k = jax.random.split(self.rng)
                lr, hr = random_rotate(lr, hr, k, self.args.rotate_train)
            sr = self._sr_forward(state, lr, test_mode)
            psnrs.append(float(M.psnr(sr, hr)))
            ssims.append(float(M.ssim(sr, hr)))
            pred_sr = self.evaluator.predict(sr)
            for pred, target in zip(pred_sr, label_strs):
                if pred == str_filt(target, "lower"):
                    n_correct += 1
            n_images += lr.shape[0]
            last = (lr, sr, hr, pred_sr, label_strs)
        if vis_index is not None and last is not None:
            # visualization dump of the last batch (super_resolution.py:505)
            from .visualize import tripple_display

            lr, sr, hr, pred_sr, label_strs = last
            pred_lr = self.evaluator.predict(lr)
            tripple_display(
                np.asarray(lr), np.asarray(sr), np.asarray(hr), pred_lr, pred_sr,
                list(label_strs), vis_index, self.args.vis_dir or self.cfg.vis_dir, self.cfg.n_vis,
            )
        return {
            "accuracy": round(n_correct / max(n_images, 1), 4),
            "psnr_avg": round(float(np.mean(psnrs)), 6),
            "ssim_avg": round(float(np.mean(ssims)), 6),
            "images": n_images,
        }

    # ----------------------------------------------------------------- train

    def train(self, max_iters: int = None, max_batches_eval: int = None):
        cfg = self.cfg
        os.makedirs(cfg.ckpt_dir, exist_ok=True)
        log_path = os.path.join(cfg.ckpt_dir, "log.csv")
        if not os.path.exists(log_path):
            with open(log_path, "w", newline="") as out:
                csv.writer(out).writerow(
                    ["epoch", "dataset", "accuracy", "psnr_avg", "ssim_avg", "best", "best_sum"]
                )

        train_loader = self.get_train_loader()
        val_loaders = self.get_val_loaders()
        state = self.system.init_state(self.rng, batch_size=2)

        # pretrained torch artifacts named by the config: frozen PSN from the
        # resume dir, crnn_psn, student TPGs (base.py:163-197,452-471;
        # super_resolution.py:93-111)
        state = load_driver_weights(self.system, state, cfg, self.args, testing=False)

        # auto-resume from a native full-state checkpoint (base.py:43)
        resume_path = resolve_native_checkpoint(self.args.resume or self.cfg.resume, testing=False)
        if resume_path:
            state, info = load_checkpoint(resume_path, target=jax.device_get(state))
            print(f"resumed from {resume_path}: {info}")
        state = self._replicate(state)

        best_history_acc = {name: 0.0 for name, _ in val_loaders}
        best_acc = 0.0
        converge_list = []
        iters = 0
        start = time.time()
        from .data.prefetch import prefetch_to_device

        for epoch in range(cfg.epochs):
            for j, batch in enumerate(prefetch_to_device(iter(train_loader), size=2)):
                hr, _, lr, _, _, _, _, _, _ = batch
                iters += 1
                hr, lr = jnp.asarray(hr), jnp.asarray(lr)
                if self.args.rotate_train:
                    from .ops.rotate import random_rotate

                    self.rng, k = jax.random.split(self.rng)
                    lr, hr = random_rotate(lr, hr, k, self.args.rotate_train)
                self.rng, step_rng = jax.random.split(self.rng)
                if self.mesh is None:
                    state, m = self.system.train_step(state, hr, lr, step_rng)
                else:
                    from .parallel import shard_batch

                    hr, lr = shard_batch(self.mesh, hr, lr)
                    step_rng = self._replicate(step_rng)
                    state, m = self._p_train_step(state, hr, lr, step_rng)
                self._last_metrics = m  # traced array, no sync (tests read it)

                if iters % cfg.displayInterval == 0:
                    loss = float(m["loss"])
                    dur = time.time() - start
                    print(
                        f"[{datetime.now():%Y-%m-%d %H:%M:%S}] | Epoch: [{epoch}][{j + 1} / "
                        f"{len(train_loader)}] | Loss: {loss} | Duration: {dur}s"
                    )
                    # bf16-AMP runtime guard: a sick XLA runtime once made
                    # the composed bf16 graph 50x slower than fp32 (round-2
                    # measurement, resolved as transient — STATUS.md).  If
                    # it ever recurs, say so instead of silently crawling.
                    if (self.system.train_dtype is not None and not self._amp_warned
                            and iters > cfg.displayInterval
                            and jax.devices()[0].platform == "tpu"):
                        # The measured pathology is a >20x slowdown (5-19
                        # img/s vs ~320 at flagship batch 64), so flag on
                        # STEP TIME at ~10x a flagship-class fp32 step,
                        # scaled by batch size and cascade depth — small
                        # batches or deep non-flagship geometries can
                        # legitimately run below any fixed img/s floor.
                        sec_per_step = dur / cfg.displayInterval
                        depth = self.system.b1 + self.system.b2 + 1
                        floor_sec = 2.0 * max(self.batch_size / 64.0, 0.25) * depth / 7.0
                        if sec_per_step > floor_sec:
                            self._amp_warned = True
                            imgs_per_s = self.batch_size / max(sec_per_step, 1e-9)
                            print(
                                f"WARNING: bf16 AMP step measuring {imgs_per_s:.1f} "
                                f"img/s ({sec_per_step * 1000:.0f} ms/step) on TPU — "
                                ">~10x slower than a flagship-class fp32 step at "
                                "this batch/depth. This matches a known transient "
                                "XLA-runtime pathology (STATUS.md round 2/3), but "
                                "can false-positive on unusual geometries. If "
                                "throughput is genuinely wrong, restart the run or "
                                "fall back to fp32 with DPMN_TPU_TRAIN_DTYPE= "
                                "(unset).",
                                flush=True,
                            )
                    start = time.time()

                if iters % cfg.valInterval == 0:
                    current = {}
                    for name, loader in val_loaders:
                        md = self.evaluate(state, loader, max_batches=max_batches_eval)
                        converge_list.append(
                            {"iterator": iters, "acc": md["accuracy"], "psnr": md["psnr_avg"], "ssim": md["ssim_avg"]}
                        )
                        current[name] = md["accuracy"]
                        is_best = md["accuracy"] > best_history_acc[name]
                        if is_best:
                            best_history_acc[name] = md["accuracy"]
                            save_checkpoint(
                                os.path.join(cfg.ckpt_dir, f"model_best_{name}.msgpack"),
                                state,
                                {"epoch": epoch, "iters": iters, **md, "converge": converge_list},
                            )
                        with open(log_path, "a", newline="") as out:
                            row = [epoch, name, md["accuracy"], md["psnr_avg"], md["ssim_avg"]]
                            csv.writer(out).writerow(row + ([f"best_{name}"] if is_best else []))
                    if sum(current.values()) > best_acc:
                        best_acc = sum(current.values())
                        save_checkpoint(
                            os.path.join(cfg.ckpt_dir, "model_best_sum.msgpack"),
                            state,
                            {"epoch": epoch, "iters": iters, "acc": current},
                        )
                        with open(log_path, "a", newline="") as out:
                            csv.writer(out).writerow([epoch, "", "", "", "", "", "best_sum"])

                if iters % cfg.saveInterval == 0:
                    save_checkpoint(
                        os.path.join(cfg.ckpt_dir, "checkpoint.msgpack"),
                        state,
                        {"epoch": epoch, "iters": iters, "converge": converge_list},
                    )
                if max_iters is not None and iters >= max_iters:
                    return state
        return state

    # ------------------------------------------------------------------ test

    def load_test_state(self):
        """Resolve the test-time weights (super_resolution.py:515-586).

        Preference order: a native full-state msgpack in --resume (the
        Trainer's own best/checkpoint files — these already contain every
        frozen net), else the reference torch naming scheme
        (model_best_{i}.pth / model_best_cmm.pth / model_{arch}.pth in the
        resume dir, students from --rec_path).  Torch student/PSN artifacts
        named alongside a native checkpoint still apply on top of it.
        """
        state = self.system.init_state(self.rng, batch_size=2)
        resume = self.args.resume or self.cfg.resume or ""
        native = resolve_native_checkpoint(resume, testing=True)
        if native:
            state, info = load_checkpoint(native, target=jax.device_get(state))
            print(f"[weights] test state restored from {native} "
                  f"(iters={info.get('iters', '?')})", flush=True)
            # torch artifacts (students via --rec_path, PSN) override on top
            state = load_driver_weights(self.system, state, self.cfg, self.args, testing=False)
        else:
            state = load_driver_weights(self.system, state, self.cfg, self.args, testing=True)
        return state

    def test(self, state=None, max_batches: int = None):
        cfg = self.cfg
        os.makedirs(cfg.ckpt_dir, exist_ok=True)
        result_path = os.path.join(cfg.ckpt_dir, "test_result.csv")
        if not os.path.exists(result_path):
            with open(result_path, "w", newline="") as out:
                csv.writer(out).writerow(["recognizer", "subset", "accuracy", "psnr", "ssim"])
        if state is None:
            state = self.load_test_state()
        state = self._replicate(state)
        ds = self._dataset(self.args.test_data_dir, True)
        col = AlignCollate(
            img_h=cfg.height, img_w=cfg.width, down_sample_scale=cfg.down_sample_scale,
            mask=self.args.mask, train=False, e_substitution=True,
        )
        loader = DataLoader(ds, self.batch_size, col, shuffle=True, drop_last=False,
                            workers=cfg.workers)
        data_name = (self.args.test_data_dir or "synthetic").rstrip("/").split("/")[-1]
        t0 = time.time()
        md = self.evaluate(state, loader, max_batches=max_batches, test_mode=True)
        duration = (time.time() - t0) / max(md["images"], 1)
        result = {
            "accuracy": {data_name: md["accuracy"]},
            "psnr_avg": md["psnr_avg"],
            "ssim_avg": md["ssim_avg"],
            "duration": duration,
        }
        print(result)
        with open(result_path, "a", newline="") as out:
            csv.writer(out).writerow([self.args.rec, data_name, md["accuracy"], md["psnr_avg"], md["ssim_avg"]])
        return result
