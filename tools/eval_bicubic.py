#!/usr/bin/env python
"""Bicubic x2 + PSNR/SSIM eval (BASELINE.json config 1; reference
model/bicubic.py + the eval metric path).

Usage: python tools/eval_bicubic.py [--data_dir DIR] [--synthetic]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", type=str, default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--batch_size", type=int, default=64)
    args = ap.parse_args()

    from dpmn_tpu.data import AlignCollate, DataLoader, SyntheticTextZoom, TextZoomLMDB
    from dpmn_tpu.models import Bicubic
    from dpmn_tpu.utils import metrics as M

    if args.synthetic or not args.data_dir:
        ds = SyntheticTextZoom(n=256)
    else:
        ds = TextZoomLMDB(args.data_dir, test=True)
    col = AlignCollate(mask=False, train=False, e_substitution=True)
    loader = DataLoader(ds, args.batch_size, col, shuffle=False, drop_last=False)
    model = Bicubic(2)

    psnrs, ssims, n = [], [], 0
    t0 = time.time()
    for hr, lr, _, _, labels, _ in loader:
        sr = model(jnp.asarray(lr))
        psnrs.append(float(M.psnr(sr, jnp.asarray(hr))))
        ssims.append(float(M.ssim(sr, jnp.asarray(hr))))
        n += lr.shape[0]
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "psnr_avg": round(float(np.mean(psnrs)), 6),
                "ssim_avg": round(float(np.mean(ssims)), 6),
                "images": n,
                "images_per_sec": round(n / dt, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
