#!/usr/bin/env python
"""Standalone PSNR/SSIM between two image folders (reference
utils/calculate_PSNR_SSIM.py parity — BasicSR-style folder comparison).

Usage: python tools/calculate_psnr_ssim.py --gt DIR --sr DIR
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt", required=True)
    ap.add_argument("--sr", required=True)
    args = ap.parse_args()

    import jax.numpy as jnp

    from dpmn_tpu.utils import metrics as M

    names = sorted(os.listdir(args.gt))
    psnrs, ssims = [], []
    for name in names:
        sr_path = os.path.join(args.sr, name)
        if not os.path.exists(sr_path):
            continue
        gt = np.asarray(Image.open(os.path.join(args.gt, name)).convert("RGB"), np.float32) / 255.0
        sr = np.asarray(Image.open(sr_path).convert("RGB"), np.float32) / 255.0
        if gt.shape != sr.shape:
            sr = np.asarray(
                Image.fromarray((sr * 255).astype(np.uint8)).resize((gt.shape[1], gt.shape[0]), Image.BICUBIC),
                np.float32,
            ) / 255.0
        a, b = jnp.asarray(gt)[None], jnp.asarray(sr)[None]
        psnrs.append(float(M.psnr(b, a)))
        ssims.append(float(M.ssim(b, a)))
    print(json.dumps({"n": len(psnrs), "psnr_avg": float(np.mean(psnrs)), "ssim_avg": float(np.mean(ssims))}))


if __name__ == "__main__":
    main()
