"""Degradation toolkit: blur kernels + classical SR degradations.

Parity targets: reference utils/utils_sisr.py (srmd_degradation :235,
bicubic_degradation, anisotropic gaussian kernels) and the dataset entry
points dataset/dataset.py:28-36 (15x15 sigma=1 gaussian kernel) and
alignCollate_syn.degradation (dataset.py:1678-1694: blur → bicubic
downsample → gaussian noise).  numpy host-side (input pipeline), with the
same math as the scipy-based reference.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def fspecial_gaussian(hsize: int, sigma: float) -> np.ndarray:
    """MATLAB fspecial('gaussian') parity (utils_sisr.py fspecial)."""
    siz = [(hsize - 1.0) / 2.0, (hsize - 1.0) / 2.0]
    std = sigma
    y, x = np.ogrid[-siz[0] : siz[0] + 1, -siz[1] : siz[1] + 1]
    arg = -(x * x + y * y) / (2 * std * std)
    h = np.exp(arg)
    h[h < np.finfo(float).eps * h.max()] = 0
    return h / h.sum() if h.sum() != 0 else h


def anisotropic_gaussian_kernel(ksize: int = 15, theta: float = np.pi, l1: float = 6, l2: float = 6) -> np.ndarray:
    """Anisotropic gaussian (utils_sisr.py anisotropic_Gaussian)."""
    v = np.dot(
        np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]),
        np.array([1.0, 0.0]),
    )
    V = np.array([[v[0], v[1]], [v[1], -v[0]]])
    D = np.array([[l1, 0], [0, l2]])
    Sigma = np.dot(np.dot(V, D), np.linalg.inv(V))
    cy, cx = ksize // 2, ksize // 2
    ys, xs = np.mgrid[0:ksize, 0:ksize]
    coords = np.stack([ys - cy, xs - cx], axis=-1).astype(np.float64)
    inv = np.linalg.inv(Sigma)
    k = np.exp(-0.5 * np.einsum("hwi,ij,hwj->hw", coords, inv, coords))
    return k / k.sum()


def _conv2_wrap(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Circular-boundary 2-D convolution per channel (scipy 'wrap' mode)."""
    from scipy import ndimage

    if img.ndim == 2:
        return ndimage.convolve(img, kernel, mode="wrap")
    return np.stack([ndimage.convolve(img[..., c], kernel, mode="wrap") for c in range(img.shape[-1])], -1)


def bicubic_degradation(img: np.ndarray, sf: int = 2) -> np.ndarray:
    """PIL-bicubic downsample by sf (utils_sisr.py bicubic_degradation)."""
    h, w = img.shape[:2]
    pil = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
    out = pil.resize((w // sf, h // sf), Image.BICUBIC)
    return np.asarray(out, img.dtype)


def srmd_degradation(img: np.ndarray, kernel: np.ndarray = None, sf: int = 1) -> np.ndarray:
    """blur (circular) then downsample (utils_sisr.py:235 srmd_degradation).

    The dataset entry (dataset.py:1678-1694) uses a 15x15 sigma=1 isotropic
    kernel and sf=1 (blur only) followed by additive gaussian noise with
    noise_level 0 — i.e. blur is the live effect.
    """
    if kernel is None:
        kernel = fspecial_gaussian(15, 1.0)
    img = _conv2_wrap(np.asarray(img, np.float64), kernel)
    if sf > 1:
        img = img[::sf, ::sf]
    return img


def classical_degradation(img: np.ndarray, kernel: np.ndarray, sf: int = 2, noise_level: float = 0.0,
                          rng: np.random.RandomState = None) -> np.ndarray:
    """blur → s-fold downsample → gaussian noise (utils_sisr.py classical)."""
    out = _conv2_wrap(np.asarray(img, np.float64), kernel)
    out = out[::sf, ::sf] if sf > 1 else out
    if noise_level > 0:
        rng = rng or np.random.RandomState(0)
        out = out + rng.normal(0, noise_level, out.shape)
    return out


def manmade_degrade(img_pil: Image.Image, train: bool = True, seed: int = 0) -> Image.Image:
    """The lmdbDataset_real(manmade_degrade=True) path (dataset.py:650-651 +
    alignCollate_syn.degradation): SRMD blur + (deterministic at eval)
    gaussian noise, back to PIL."""
    arr = srmd_degradation(np.asarray(img_pil, np.float64))
    rng = np.random.RandomState(seed if not train else None)
    arr = arr + rng.normal(0, 0.0, arr.shape)  # noise_level_img = 0 in the reference
    return Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))
