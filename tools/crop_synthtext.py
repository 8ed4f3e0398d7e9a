#!/usr/bin/env python
"""Crop SynthText-800k word images for recognizer/TPG pre-training corpora.

Parity: reference dataset/crop_800k.py — reads the SynthText gt.mat
(imnames / wordBB quads / txt), whitespace-splits the per-image text blocks
into word labels (t_split, crop_800k.py:14-23), takes the axis-aligned
bounding rectangle of each word quad clamped to the image
(crop_800k.py:37-55,80-86), writes one jpg per word named
`<dir>_<stem>_<idx>_<label-sans-punctuation>.jpg` under
<out>/syntxt_crop/<dir>/ and appends {'im_path','im_name','label'} JSON
lines to syntxt_crop.odgt (crop_800k.py:92-102).

Usage: python tools/crop_synthtext.py --gt_path SynthText/gt.mat \
           --synthtext_path SynthText --out_path ./out
"""

import argparse
import json
import math
import os
import string
import sys


def split_words(txt_block) -> list:
    """Whitespace/newline split of SynthText per-image text arrays."""
    words = []
    for entry in txt_block:
        for part in str(entry).split(" "):
            for word in part.split("\n"):
                if word:
                    words.append(word)
    return words


def word_rects(word_bb):
    """(2, 4, N) quad coordinates → list of N (x0, y0, x1, y1) int rects."""
    import numpy as np

    if word_bb.ndim == 2:
        word_bb = word_bb.reshape(2, 4, 1)
    rects = []
    for j in range(word_bb.shape[2]):
        xs, ys = word_bb[0, :, j], word_bb[1, :, j]
        rects.append(
            (
                int(math.floor(xs.min())),
                int(math.floor(ys.min())),
                int(math.ceil(xs.max())),
                int(math.ceil(ys.max())),
            )
        )
    return rects


def crop_synthtext(gt_path: str, synthtext_path: str, out_path: str, limit: int = None) -> int:
    import cv2
    from scipy.io import loadmat

    m = loadmat(gt_path)
    imnames, word_bbs, txts = m["imnames"][0], m["wordBB"][0], m["txt"][0]
    manifest = os.path.join(out_path, "syntxt_crop.odgt")
    os.makedirs(out_path, exist_ok=True)
    count = 0
    n_images = imnames.shape[0] if limit is None else min(limit, imnames.shape[0])
    with open(manifest, "a") as mf:
        for i in range(n_images):
            im_name = str(imnames[i][0])
            labels = split_words(txts[i])
            rects = word_rects(word_bbs[i])
            img = cv2.imread(os.path.join(synthtext_path, im_name))
            if img is None:
                continue
            parts = im_name.split("/")
            sub, stem = parts[0], os.path.splitext(parts[-1])[0]
            out_dir = os.path.join(out_path, "syntxt_crop", sub)
            os.makedirs(out_dir, exist_ok=True)
            for j, label in enumerate(labels):
                if j >= len(rects):
                    break
                x0, y0, x1, y1 = rects[j]
                x0, y0 = max(x0, 0), max(y0, 0)
                x1, y1 = min(x1, img.shape[1]), min(y1, img.shape[0])
                if x1 <= x0 or y1 <= y0:
                    continue
                crop = img[y0:y1, x0:x1]
                clean = label.translate(str.maketrans("", "", string.punctuation))
                new_name = f"{sub}_{stem}_{j}_{clean}.jpg"
                cv2.imwrite(os.path.join(out_dir, new_name), crop)
                mf.write(json.dumps({"im_path": out_dir, "im_name": new_name, "label": label}) + "\n")
                count += 1
    return count


def main():
    ap = argparse.ArgumentParser(description="Crop SynthText word images")
    ap.add_argument("--gt_path", default="./SynthText/gt.mat")
    ap.add_argument("--synthtext_path", default="./SynthText")
    ap.add_argument("--out_path", default="./")
    ap.add_argument("--limit", type=int, default=None, help="only the first N images")
    args = ap.parse_args()
    n = crop_synthtext(args.gt_path, args.synthtext_path, args.out_path, args.limit)
    print(n)


if __name__ == "__main__":
    sys.exit(main())
