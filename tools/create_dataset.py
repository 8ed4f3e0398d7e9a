#!/usr/bin/env python
"""Pack an image-folder dataset into a TextZoom-style LMDB.

Parity: reference dataset/create_lmdb.py (createDataset writers).  Expects a
directory with hr/<name>.png, lr/<name>.png and labels.txt lines
"<name> <label>"; or --synthetic N to pack the procedural dataset.

Usage:
  python tools/create_dataset.py --out /data/my_tz --synthetic 256
  python tools/create_dataset.py --out /data/my_tz --hr_dir hr --lr_dir lr --labels labels.txt
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--hr_dir", type=str)
    ap.add_argument("--lr_dir", type=str)
    ap.add_argument("--labels", type=str)
    args = ap.parse_args()

    from dpmn_tpu.data.lmdb_writer import create_textzoom_lmdb

    samples = []
    if args.synthetic:
        from dpmn_tpu.data.datasets import SyntheticTextZoom

        ds = SyntheticTextZoom(n=args.synthetic)
        samples = [(ds[i][0], ds[i][1], ds[i][4]) for i in range(len(ds))]
    else:
        labels = {}
        for line in open(args.labels):
            parts = line.strip().split(None, 1)
            if len(parts) == 2:
                labels[parts[0]] = parts[1]
        for name, label in sorted(labels.items()):
            hr = Image.open(os.path.join(args.hr_dir, name)).convert("RGB")
            lr = Image.open(os.path.join(args.lr_dir, name)).convert("RGB")
            samples.append((hr, lr, label))
    path = create_textzoom_lmdb(args.out, samples)
    print(f"wrote {len(samples)} samples to {path}")


if __name__ == "__main__":
    main()
