"""Scene-text LMDB dataset for VisionLAN standalone training/evaluation.

Parity: reference model/VisionLAN/data/dataset_scene.py:18-130 —
  * multi-root LMDB ('image-%09d' / 'label-%09d' keys, 1-based)
  * ratio-weighted random root selection + random index on the train path,
    sequential indexing on the test path
  * label regex filter [^0-9a-zA-Z]+ → ''; >25-char / empty samples skipped
    on the train path (index+1 retry like the corrupt-image retry)
  * keepratio_resize: train augment bank → cv2.resize to (W, H)
  * des_orderlabel: the WCL occlusion target (remaining string, occluded
    char, its position)

Reads through our pure-Python/native LMDB reader; returns dict samples with
uint8 HWC images (the collate/encoder converts to float arrays).
"""

from __future__ import annotations

import random
import re
from random import sample as _sample

import cv2
import numpy as np
from PIL import Image

from .lmdb_reader import LMDBReader


def des_orderlabel(label: str, mask_id: int | None = None):
    """(remaining string, occluded char, its position) — dataset_scene.py:18-32.

    mask_id pins the occlusion position instead of sampling it — the
    visualization dataset variant (data/dataset_scene_vis.py:19-41) uses
    this so attention maps are rendered for a chosen character."""
    len_str = len(label)
    if mask_id is not None:
        change_id = mask_id
    else:
        order = list(range(len_str))
        change_id = _sample(order, 1)[0]
    label_sub = label[change_id]
    if change_id == (len_str - 1):
        label_res = label[:change_id]
    else:
        label_res = label[:change_id] + label[change_id + 1 :]
    return label_res, label_sub, change_id


class SceneLMDB:
    def __init__(self, roots, ratio=None, img_height: int = 64, img_width: int = 256,
                 global_state: str = "Test", use_native: bool = True,
                 mask_id: int | None = None):
        # mask_id: fixed occlusion position for attention-map visualization
        # (the dataset_scene_vis.py variant of the reference)
        if isinstance(roots, str):
            roots = [roots]
        self.readers = []
        self.lengths = []
        self.n_samples = 0
        for root in roots:
            reader = None
            if use_native:
                try:
                    from .native_lmdb import NativeLMDBReader

                    reader = NativeLMDBReader(root)
                except Exception:
                    reader = None
            if reader is None:
                reader = LMDBReader(root)
            n = int(reader.get(b"num-samples"))
            self.readers.append(reader)
            self.lengths.append(n)
            self.n_samples += n
        if ratio is not None:
            assert len(ratio) == len(roots), "length of ratio must equal to length of roots!"
            total = float(sum(ratio))
            self.ratio = [r / total for r in ratio]
        else:
            self.ratio = [n / float(self.n_samples) for n in self.lengths]
        self.maxlen = max(self.lengths)
        self.img_height = img_height
        self.img_width = img_width
        self.global_state = global_state
        self.mask_id = mask_id
        self._augment = None
        if global_state == "Train":
            from .scene_transforms import train_augment_bank

            self._augment = train_augment_bank()

    def __len__(self):
        return self.n_samples

    def _from_which(self):
        rd = random.random()
        total = 0.0
        for i, r in enumerate(self.ratio):
            total += r
            if rd <= total:
                return i
        return len(self.ratio) - 1

    def _resize(self, img: Image.Image) -> np.ndarray:
        if self._augment is not None:
            img = self._augment(img)
        return cv2.resize(np.array(img), (self.img_width, self.img_height))

    def __getitem__(self, index):
        for _ in range(32):  # retry semantics (dataset_scene.py:102-125)
            which = self._from_which()
            idx = index
            if self.global_state == "Train":
                idx = random.randint(0, self.maxlen - 1)
            idx = idx % self.lengths[which] + 1
            reader = self.readers[which]
            try:
                buf = reader.get(b"image-%09d" % idx)
                import io

                img = Image.open(io.BytesIO(buf)).convert("RGB")
            except Exception:
                index += 1
                continue
            label = reader.get(b"label-%09d" % idx)
            label = "" if label is None else label.decode(errors="replace")
            label = re.sub("[^0-9a-zA-Z]+", "", label)
            if (len(label) > 25 or len(label) <= 0) and self.global_state == "Train":
                index += 1
                continue
            try:
                img = self._resize(img)
            except Exception:
                index += 1
                continue
            label_res, label_sub, label_id = (
                des_orderlabel(label, self.mask_id) if label else ("", "", 0)
            )
            return {
                "image": img,  # (H, W, 3) uint8
                "label": label,
                "label_res": label_res,
                "label_sub": label_sub,
                "label_id": label_id,
            }
        raise RuntimeError("SceneLMDB: 32 consecutive unreadable records")


def scene_collate(batch):
    """dicts → (images (B, H, W, 3) float32 [0,1], labels, res, sub, ids)."""
    images = np.stack([b["image"] for b in batch]).astype(np.float32) / 255.0
    labels = [b["label"] for b in batch]
    labels_res = [b["label_res"] for b in batch]
    labels_sub = [b["label_sub"] for b in batch]
    label_ids = np.asarray([b["label_id"] for b in batch], np.int32)
    return images, labels, labels_res, labels_sub, label_ids
