"""Self-supervised image-folder pair dataset (HR image, random-crop LR).

Parity: reference dataset/voc_data.py — lists the .jpg files of a folder
(load_voc:46-58), pairs each image with a random 0.95-scale crop of itself
(rand_crop:25-30), and collates to normalized tensors: HR resized to
(imgH, imgW), LR additionally downsampled by down_sample_scale with 0.5-rate
salt-and-pepper noise (sp_noise:33-44, alignCollate:82-101), both mapped to
[-1, 1].  Torch-free: numpy batches in NHWC, ready for jnp.asarray.
"""

from __future__ import annotations

import os

import numpy as np


def rand_crop_box(w: int, h: int, rng: np.random.RandomState, scale: float = 0.95):
    """Random scale-0.95 crop box like voc_data.rand_crop (voc_data.py:25-30)."""
    x0 = rng.uniform(0, w * (1 - scale))
    y0 = rng.uniform(0, h * (1 - scale))
    return (x0, y0, x0 + scale * w, y0 + scale * h)


def sp_noise(image: np.ndarray, prob: float, rng: np.random.RandomState) -> np.ndarray:
    """Salt-and-pepper noise (voc_data.py:33-44), vectorized."""
    r = rng.random_sample(image.shape[:2])
    out = image.copy()
    out[r < prob] = 0
    out[r > 1 - prob] = 255
    return out


class FolderPairDataset:
    """Folder of .jpg images → (lr_noisy, hr) normalized NHWC batches."""

    def __init__(self, root: str, img_h: int = 256, img_w: int = 256,
                 down_sample_scale: int = 1, noise_prob: float = 0.5, seed: int = 0):
        self.root = root
        self.paths = sorted(
            os.path.join(root, n) for n in os.listdir(root) if n.endswith(".jpg")
        )
        self.img_h, self.img_w = img_h, img_w
        self.scale = down_sample_scale
        self.noise_prob = noise_prob
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.paths)

    def _load(self, index: int):
        from PIL import Image

        im = Image.open(self.paths[index]).convert("RGB")
        crop = im.crop(rand_crop_box(im.size[0], im.size[1], self.rng))
        return im, crop

    def __getitem__(self, index: int):
        """(lr (h/s, w/s, 3), hr (h, w, 3)) float32 in [-1, 1]."""
        from PIL import Image

        im, crop = self._load(index)
        hr = np.asarray(crop.resize((self.img_w, self.img_h), Image.BICUBIC), np.float32)
        lr_im = im.resize((im.size[0] // self.scale, im.size[1] // self.scale), Image.BICUBIC)
        lr_im = lr_im.resize((self.img_w // self.scale, self.img_h // self.scale), Image.BICUBIC)
        lr = sp_noise(np.asarray(lr_im, np.uint8), self.noise_prob, self.rng).astype(np.float32)
        # ToTensor → sub(0.5).div(0.5): [0,255] → [-1,1] (voc_data.py:78-79)
        return lr / 127.5 - 1.0, hr / 127.5 - 1.0

    def batches(self, batch_size: int, shuffle: bool = True):
        order = np.arange(len(self))
        if shuffle:
            self.rng.shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            pairs = [self[j] for j in order[i : i + batch_size]]
            lr = np.stack([p[0] for p in pairs])
            hr = np.stack([p[1] for p in pairs])
            yield lr, hr
