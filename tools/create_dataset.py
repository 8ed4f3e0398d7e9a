#!/usr/bin/env python
"""Pack datasets into LMDBs (TextZoom HR/LR pairs or recognition corpora).

Parity: reference dataset/create_lmdb.py (createDataset* writers +
Syn800K/90k/IC/SVTP corpus walks) and dataset/voc_data.py, with the
hardcoded author paths replaced by flags.  Modes:

  folder     hr/<name>.png + lr/<name>.png + labels.txt → TextZoom LMDB
  synthetic  procedural dataset → TextZoom LMDB
  odgt       Syn800K odgt json-lines → recognition LMDB (create_800k)
  mjsynth    90kDICT32px tree → recognition LMDB (create_90k)
  ic         IC13/IC15 odgt → 4 split LMDBs under --out (create_ic)
  gt_txt     root with gt.txt "name label" lines → recognition LMDB (create_txt)
  voc        dir of .jpg → TextZoom LMDB, LR = random 0.95 crop (voc_data)
  recrop     recognition LMDB → TextZoom LMDB with random-crop LR
             (create_from_lmdb)

Usage:
  python tools/create_dataset.py --out /data/my_tz --synthetic 256
  python tools/create_dataset.py --out /data/my_tz --hr_dir hr --lr_dir lr --labels labels.txt
  python tools/create_dataset.py --mode mjsynth --out /data/90k --root /data/mjsynth/90kDICT32px
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", default=None,
                    choices=[None, "folder", "synthetic", "odgt", "mjsynth", "ic", "gt_txt", "voc", "recrop"])
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--hr_dir", type=str)
    ap.add_argument("--lr_dir", type=str)
    ap.add_argument("--labels", type=str)
    ap.add_argument("--root", type=str, help="corpus root (mjsynth/gt_txt/voc/recrop src)")
    ap.add_argument("--json", type=str, help="odgt json-lines path (odgt/ic)")
    ap.add_argument("--image_root", type=str, default="", help="image prefix (odgt) / dir (ic)")
    args = ap.parse_args()

    from dpmn_tpu.data import corpus_readers as cr
    from dpmn_tpu.data.lmdb_writer import create_textzoom_lmdb

    mode = args.mode or ("synthetic" if args.synthetic else "folder")

    if mode in ("folder", "synthetic"):
        samples = []
        if mode == "synthetic":
            from dpmn_tpu.data.datasets import SyntheticTextZoom

            ds = SyntheticTextZoom(n=args.synthetic or 256)
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
    elif mode == "odgt":
        pairs = cr.read_odgt(args.json, args.image_root)
        _, n = cr.pack_recognition_lmdb(args.out, pairs)
        print(f"wrote {n} samples to {args.out}")
    elif mode == "mjsynth":
        pairs = cr.read_mjsynth(args.root)
        _, n = cr.pack_recognition_lmdb(args.out, pairs)
        print(f"wrote {n} samples to {args.out}")
    elif mode == "ic":
        splits = cr.read_ic_odgt(args.json, args.image_root)
        for (ds_name, ds_type), pairs in splits.items():
            out = os.path.join(args.out, f"{ds_name.lower()}_{ds_type}")
            _, n = cr.pack_recognition_lmdb(out, pairs)
            print(f"wrote {n} samples to {out}")
    elif mode == "gt_txt":
        pairs = cr.read_gt_txt(args.root)
        _, n = cr.pack_recognition_lmdb(args.out, pairs)
        print(f"wrote {n} samples to {args.out}")
    elif mode == "voc":
        samples = cr.voc_hr_lr_pairs(args.root)
        path = create_textzoom_lmdb(args.out, samples)
        print(f"wrote {len(samples)} samples to {path}")
    elif mode == "recrop":
        path = cr.repack_crop_lmdb(args.root, args.out)
        print(f"re-packed {args.root} → {path}")


if __name__ == "__main__":
    main()
