#!/usr/bin/env python
"""Minimal inference example: low-res text crop in, super-resolved crop out.

Runs the full flagship pipeline (frozen CRNN text prior → TATT PSN → 3+3
dual-prior PGRM cascade → CMM fusion → α-blend) on one batch.  With no
checkpoint it uses random weights on a synthetic image so the example is
runnable anywhere (CPU included); point --ckpt at a trained msgpack state
(dpmn_tpu.checkpoint) or import reference .pth weights via dpmn_tpu.convert
for real outputs.

    python examples/infer.py [--ckpt ckpt/state.msgpack] [--image lr.png]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="msgpack train-state checkpoint")
    ap.add_argument("--image", default=None, help="input LR image (any size; resized to 64x16)")
    ap.add_argument("--out", default="sr_out.png")
    ap.add_argument("--cpu", action="store_true", help="force CPU")
    args = ap.parse_args()

    if args.cpu or jax.default_backend() != "tpu":
        jax.config.update("jax_platforms", "cpu")

    from dpmn_tpu.config import Args, TrainCfg
    from dpmn_tpu.system import DPMNSystem

    cfg = TrainCfg(batch_size=1, width=128, height=32)
    margs = Args(
        arch="tatt", mask=True, stu_iter_b1=3, stu_iter_b2=3,
        patch_size="2,", embed_dim="96,", window_size="2,4,8,",
        depths="1,", num_heads="6,", alpha=0.5,
    )
    glyph_mode = "atlas" if jax.default_backend() == "tpu" else "callback"
    system = DPMNSystem(cfg, margs, glyph_mode=glyph_mode)
    state = system.init_state(jax.random.PRNGKey(0), batch_size=1)
    if args.ckpt:
        from dpmn_tpu.checkpoint import load_checkpoint

        state, _ = load_checkpoint(args.ckpt, target=state)

    if args.image:
        from PIL import Image

        img = Image.open(args.image).convert("RGB").resize((64, 16), Image.BICUBIC)
        lr3 = np.asarray(img, np.float32)[None] / 255.0
    else:
        lr3 = np.random.RandomState(0).rand(1, 16, 64, 3).astype(np.float32)
    # 4th channel: mean-threshold binary mask (dataset.py:1312-1317 semantics)
    mask = (lr3.mean(-1, keepdims=True) > lr3.mean()).astype(np.float32)
    lr = jnp.asarray(np.concatenate([lr3, mask], -1))

    sr = system.sr_forward(state, lr)
    sr = np.asarray(jax.device_get(sr))[0]
    from PIL import Image

    Image.fromarray((np.clip(sr, 0, 1) * 255).astype(np.uint8)).save(args.out)
    print(f"wrote {args.out} shape={sr.shape} range=[{sr.min():.3f},{sr.max():.3f}]")


if __name__ == "__main__":
    main()
