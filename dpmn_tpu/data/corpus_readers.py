"""Corpus readers + recognition-LMDB packing for offline dataset builds.

Parity: reference dataset/create_lmdb.py (534 LoC) and dataset/voc_data.py —
the Syn800K/MJSynth-90k/IC-odgt/SVTP-gt.txt corpus walkers feeding
`createDataset`, the single-image recognition-LMDB writer itself
(image-%09d / label-%09d / num-samples with a validity check), the
rand-crop HR→LR re-pack (`create_from_lmdb`), and voc_data's
random-crop HR/LR pair generator.  Hardcoded author paths become
arguments; the walk/filter semantics are kept:

  * Syn800K odgt (create_lmdb.py:236-270): json-lines with im_path/im_name/
    label; keep images with h>=64 and w>=256; unopenable files skipped
  * MJSynth 90k (create_lmdb.py:370-406): root/*/*/ image files, label =
    token 1 of the '_'-separated filename; keep w>=100 and h>=31
  * IC odgt (create_lmdb.py:408-459): json-lines with img_path/img_gt/
    dataset/type routed into (IC13|IC15, train|test) splits.  NOTE the
    reference never fills IC15-test (its elif repeats the IC13-test arm,
    :448-450) and writes the 13test LMDB twice (:457,:459); the router here
    fills all four splits — the loop quirk is a plain bug with no
    behavioral value to preserve offline
  * SVTP gt.txt (create_lmdb.py:462-476): "name label" lines
  * voc_data.py:24-62: directory of .jpg, HR = original, LR = random
    0.95-scale crop
"""

from __future__ import annotations

import io
import json
import os
import random
from typing import Dict, List, Sequence, Tuple

import numpy as np
from PIL import Image

from .lmdb_writer import write_lmdb


# --------------------------------------------------------------- corpus walks


def read_odgt(json_path: str, image_root: str = "", min_h: int = 64, min_w: int = 256):
    """Syn800K-style odgt → [(image_path, label)] (create_lmdb.py:236-270)."""
    out = []
    with open(json_path) as f:
        for line in f:
            rec = json.loads(line)
            path = os.path.join(image_root, rec["im_path"], rec["im_name"])
            try:
                with Image.open(path) as im:
                    w, h = im.size
            except OSError:
                continue
            if h >= min_h and w >= min_w:
                out.append((path, rec["label"]))
    return out


def read_mjsynth(root: str, min_w: int = 100, min_h: int = 31):
    """MJSynth/90k directory tree → [(image_path, label)]
    (create_lmdb.py:370-406; label = filename token 1)."""
    out = []
    for d1 in sorted(os.listdir(root)):
        p1 = os.path.join(root, d1)
        if "." in d1 or not os.path.isdir(p1):
            continue
        for d2 in sorted(os.listdir(p1)):
            p2 = os.path.join(p1, d2)
            if not os.path.isdir(p2):
                continue
            for name in sorted(os.listdir(p2)):
                path = os.path.join(p2, name)
                parts = name.split("_")
                if len(parts) < 2:
                    continue
                try:
                    with Image.open(path) as im:
                        w, h = im.size
                except OSError:
                    continue
                if w >= min_w and h >= min_h:
                    out.append((path, parts[1]))
    return out


def read_ic_odgt(json_path: str, image_dir: str) -> Dict[Tuple[str, str], List[Tuple[str, str]]]:
    """IC13/IC15 odgt router → {(dataset, type): [(path, label)]}
    (create_lmdb.py:408-459; all four splits filled — see module note)."""
    splits: Dict[Tuple[str, str], List[Tuple[str, str]]] = {
        ("IC13", "train"): [], ("IC13", "test"): [],
        ("IC15", "train"): [], ("IC15", "test"): [],
    }
    with open(json_path) as f:
        for line in f:
            rec = json.loads(line)
            path = os.path.join(image_dir, rec["img_path"].split("/")[-1])
            if not os.path.exists(path):
                continue
            try:
                with Image.open(path):
                    pass
            except OSError:
                continue
            key = (rec["dataset"], rec["type"])
            if key in splits:
                splits[key].append((path, rec["img_gt"]))
    return splits


def read_gt_txt(root: str, gt_name: str = "gt.txt"):
    """SVTP-style "name label" lines → [(path, label)] (create_lmdb.py:462-476)."""
    out = []
    with open(os.path.join(root, gt_name)) as f:
        for line in f:
            parts = line.replace("\r\n", "").strip().split(" ")
            if len(parts) >= 2:
                out.append((os.path.join(root, parts[0]), parts[1]))
    return out


# ---------------------------------------------------------------- packers


def _check_image(buf: bytes) -> bool:
    """createDataset's checkValid (create_lmdb.py:45-54)."""
    if not buf:
        return False
    try:
        img = Image.open(io.BytesIO(buf))
        img.verify()
        return True
    except Exception:
        return False


def _encode_image(img) -> bytes:
    if isinstance(img, (bytes, bytearray)):
        return bytes(img)
    if not isinstance(img, Image.Image):
        img = Image.fromarray(np.asarray(img))
    out = io.BytesIO()
    img.convert("RGB").save(out, "JPEG", quality=95)
    return out.getvalue()


def pack_recognition_lmdb(out_path: str, pairs: Sequence[Tuple[str, str]], check_valid: bool = True):
    """[(image_path_or_image, label)] → scene-recognition LMDB with
    image-%09d / label-%09d / num-samples keys (createDataset,
    create_lmdb.py:184-233).  Invalid images are skipped like checkValid."""
    records = {}
    cnt = 0
    for img, label in pairs:
        if isinstance(img, str):
            with open(img, "rb") as f:
                buf = f.read()
        else:
            buf = _encode_image(img)
        if check_valid and not _check_image(buf):
            continue
        cnt += 1
        records[b"image-%09d" % cnt] = buf
        records[b"label-%09d" % cnt] = str(label).encode()
    records[b"num-samples"] = str(cnt).encode()
    return write_lmdb(out_path, records), cnt


# ----------------------------------------------------- voc_data / re-crops


def rand_crop(im: Image.Image, scale: float = 0.95) -> Image.Image:
    """voc_data.py:24-29 / create_lmdb.py:17-23."""
    w, h = im.size
    p1 = (random.uniform(0, w * (1 - scale)), random.uniform(0, h * (1 - scale)))
    p2 = (p1[0] + scale * w, p1[1] + scale * h)
    return im.crop(p1 + p2)


def voc_hr_lr_pairs(root: str, seed: int = 0):
    """Directory of .jpg → [(hr PIL, lr PIL, label='')] with the random-crop
    LR of voc_data.load_voc (the VOC flow carries no text labels)."""
    random.seed(seed)
    names = [n for n in sorted(os.listdir(root)) if n.endswith(".jpg")]
    out = []
    for name in names:
        im = Image.open(os.path.join(root, name)).convert("RGB")
        out.append((im, rand_crop(im), ""))
    return out


def repack_crop_lmdb(src_root: str, out_path: str, seed: int = 0):
    """Recognition LMDB → TextZoom-style HR/LR LMDB where LR is a random
    0.95 crop of the image (create_from_lmdb, create_lmdb.py:479-510)."""
    from .lmdb_reader import LMDBReader

    random.seed(seed)
    reader = LMDBReader(src_root)
    n = int(reader.get(b"num-samples"))
    records = {b"num-samples": str(n).encode()}
    for i in range(1, n + 1):
        buf = reader.get(b"image-%09d" % i)
        img = Image.open(io.BytesIO(buf)).convert("RGB")
        # create_from_lmdb writes the ORIGINAL as HR and the crop as LR
        # (create_lmdb.py:497-501; note its mixed-case 'image_HR' keys are
        # normalized to the image_hr the reader uses, dataset.py:646)
        records[b"image_hr-%09d" % i] = _encode_image(img)
        records[b"image_lr-%09d" % i] = _encode_image(rand_crop(img))
        records[b"label-%09d" % i] = reader.get(b"label-%09d" % i) or b""
    return write_lmdb(out_path, records)
