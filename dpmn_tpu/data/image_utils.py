"""Image utility tail (reference utils/utils_image.py, functional port).

Covers the reference's KAIR-derived helpers that sit outside the live DPMN
path but complete the degradation/IO surface (SURVEY §2 #26): dtype
converters, the 8 flip/rotate augmentation modes, modcrop/shave, MATLAB
ycbcr conversions, border-cropped PSNR/SSIM, patch extraction, and MATLAB's
antialiased bicubic ``imresize`` (utils_image.py:700-909) — vectorized
numpy instead of the reference's per-row torch ``mv`` loops.

Deviations, on purpose:
  * nothing mutates its input — the reference's rgb2ycbcr/bgr2ycbcr/
    ycbcr2rgb do ``img *= 255`` on the caller's float array (a bug).
  * augment_imgs takes a seeded ``random.Random``/``np.random.Generator``
    instead of global ``random`` state.
  * torch-tensor variants (uint2tensor4, augment_img_tensor4, ...) are not
    mirrored: arrays here are numpy/jax NHWC end to end.
"""

from __future__ import annotations

import math
from typing import List, Sequence

import numpy as np

__all__ = [
    "uint2single", "single2uint", "uint162single", "single2uint16", "to_image",
    "augment_img", "augment_img_np3", "augment_imgs", "modcrop", "shave",
    "rgb2ycbcr", "ycbcr2rgb", "bgr2ycbcr", "channel_convert",
    "calculate_psnr", "calculate_ssim", "patches_from_image", "imresize_np",
]


# ---------------------------------------------------------------- converters

def uint2single(img):
    """uint8 [0,255] → float32 [0,1] (utils_image.py:249-251)."""
    return np.float32(img) / 255.0


def single2uint(img):
    """float [0,1] → uint8, clipped + rounded (utils_image.py:254-256)."""
    return np.uint8((np.clip(img, 0, 1) * 255.0).round())


def uint162single(img):
    """uint16 [0,65535] → float32 [0,1] (utils_image.py:259-261)."""
    return np.float32(img) / 65535.0


def single2uint16(img):
    """float [0,1] → uint16 (utils_image.py:264-266)."""
    return np.uint16((np.clip(img, 0, 1) * 65535.0).round())


def to_image(arr, out_type=np.uint8, min_max=(0.0, 1.0)):
    """Array → display image (utils_image.py:342-366 ``tensor2img`` for the
    2-D/3-D cases; HWC in, HWC out, RGB order kept — we are NHWC native so
    the BGR flip and the 4-D make_grid path have no equivalent)."""
    arr = np.asarray(arr, dtype=np.float64)
    arr = (np.clip(arr, *min_max) - min_max[0]) / (min_max[1] - min_max[0])
    if out_type == np.uint8:
        arr = (arr * 255.0).round()
    return arr.astype(out_type)


# -------------------------------------------------------------- augmentation

def augment_img(img: np.ndarray, mode: int = 0) -> np.ndarray:
    """The 8 dihedral flip/rotate modes (utils_image.py:380-398)."""
    if mode == 0:
        return img
    if mode == 1:
        return np.flipud(np.rot90(img))
    if mode == 2:
        return np.flipud(img)
    if mode == 3:
        return np.rot90(img, k=3)
    if mode == 4:
        return np.flipud(np.rot90(img, k=2))
    if mode == 5:
        return np.rot90(img)
    if mode == 6:
        return np.rot90(img, k=2)
    if mode == 7:
        return np.flipud(np.rot90(img, k=3))
    raise ValueError(f"mode must be in 0..7, got {mode}")


def augment_img_np3(img: np.ndarray, mode: int = 0) -> np.ndarray:
    """The transpose/flip formulation (utils_image.py:441-466), HWC."""
    if mode == 0:
        return img
    if mode == 1:
        return img.transpose(1, 0, 2)
    if mode == 2:
        return img[::-1, :, :]
    if mode == 3:
        return img[::-1, :, :].transpose(1, 0, 2)
    if mode == 4:
        return img[:, ::-1, :]
    if mode == 5:
        return img[:, ::-1, :].transpose(1, 0, 2)
    if mode == 6:
        return img[:, ::-1, :][::-1, :, :]
    if mode == 7:
        return img[:, ::-1, :][::-1, :, :].transpose(1, 0, 2)
    raise ValueError(f"mode must be in 0..7, got {mode}")


def augment_imgs(img_list: Sequence[np.ndarray], rng, hflip: bool = True, rot: bool = True):
    """Joint random hflip/vflip/rot90 over a list (utils_image.py:469-484),
    driven by a passed-in random source instead of module state."""
    do_h = hflip and rng.random() < 0.5
    do_v = rot and rng.random() < 0.5
    do_r = rot and rng.random() < 0.5

    def _augment(img):
        if do_h:
            img = img[:, ::-1, :]
        if do_v:
            img = img[::-1, :, :]
        if do_r:
            img = img.transpose(1, 0, 2)
        return img

    return [_augment(img) for img in img_list]


def modcrop(img_in: np.ndarray, scale: int) -> np.ndarray:
    """Crop H/W to multiples of scale (utils_image.py:494-507)."""
    img = np.copy(img_in)
    if img.ndim not in (2, 3):
        raise ValueError(f"wrong img ndim: {img.ndim}")
    h, w = img.shape[:2]
    return img[: h - h % scale, : w - w % scale, ...]


def shave(img_in: np.ndarray, border: int = 0) -> np.ndarray:
    """Strip a border (utils_image.py:510-515)."""
    img = np.copy(img_in)
    h, w = img.shape[:2]
    return img[border : h - border, border : w - border]


# ------------------------------------------------------- ycbcr (MATLAB defs)

def _ycbcr_core(img, mat, offset, only_y_vec=None):
    in_type = img.dtype
    x = img.astype(np.float64, copy=True)
    if in_type != np.uint8:
        x = x * 255.0
    if only_y_vec is not None:
        out = x @ np.asarray(only_y_vec, dtype=np.float64) / 255.0 + 16.0
    else:
        out = x @ np.asarray(mat, dtype=np.float64) / 255.0 + np.asarray(offset, dtype=np.float64)
    if in_type == np.uint8:
        out = out.round()
    else:
        out = out / 255.0
    return out.astype(in_type)


def rgb2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    """MATLAB rgb2ycbcr (utils_image.py:529-550); input uint8 [0,255] or
    float [0,1]; the input array is NOT modified (reference mutates)."""
    if only_y:
        return _ycbcr_core(img, None, None, [65.481, 128.553, 24.966])
    return _ycbcr_core(
        img,
        [[65.481, -37.797, 112.0], [128.553, -74.203, -93.786], [24.966, 112.0, -18.214]],
        [16, 128, 128],
    )


def bgr2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    """BGR-ordered variant (utils_image.py:573-594)."""
    if only_y:
        return _ycbcr_core(img, None, None, [24.966, 128.553, 65.481])
    return _ycbcr_core(
        img,
        [[24.966, 112.0, -18.214], [128.553, -74.203, -93.786], [65.481, -37.797, 112.0]],
        [16, 128, 128],
    )


def ycbcr2rgb(img: np.ndarray) -> np.ndarray:
    """MATLAB ycbcr2rgb (utils_image.py:553-570)."""
    in_type = img.dtype
    x = img.astype(np.float64, copy=True)
    if in_type != np.uint8:
        x = x * 255.0
    mat = [[0.00456621, 0.00456621, 0.00456621], [0, -0.00153632, 0.00791071], [0.00625893, -0.00318811, 0]]
    out = x @ np.asarray(mat) * 255.0 + np.asarray([-222.921, 135.576, -276.836])
    if in_type == np.uint8:
        out = out.round()
    else:
        out = out / 255.0
    return out.astype(in_type)


def channel_convert(in_c: int, tar_type: str, img_list: Sequence[np.ndarray]) -> List[np.ndarray]:
    """BGR/gray/y conversions over a list (utils_image.py:597-608)."""
    import cv2

    if in_c == 3 and tar_type == "gray":
        return [np.expand_dims(cv2.cvtColor(img, cv2.COLOR_BGR2GRAY), axis=2) for img in img_list]
    if in_c == 3 and tar_type == "y":
        return [np.expand_dims(bgr2ycbcr(img, only_y=True), axis=2) for img in img_list]
    if in_c == 1 and tar_type == "RGB":
        return [cv2.cvtColor(img, cv2.COLOR_GRAY2BGR) for img in img_list]
    return list(img_list)


# --------------------------------------------------- bordered PSNR/SSIM (255)

def calculate_psnr(img1: np.ndarray, img2: np.ndarray, border: int = 0) -> float:
    """[0,255]-range PSNR with border crop (utils_image.py:621-636)."""
    if img1.shape != img2.shape:
        raise ValueError("input images must have the same dimensions")
    h, w = img1.shape[:2]
    a = img1[border : h - border, border : w - border].astype(np.float64)
    b = img2[border : h - border, border : w - border].astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * math.log10(255.0 / math.sqrt(mse))


def _ssim_single(img1: np.ndarray, img2: np.ndarray) -> float:
    """MATLAB-style single-channel SSIM (utils_image.py:669-689)."""
    import cv2

    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.T)
    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = cv2.filter2D(img1**2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2
    num = (2 * mu1_mu2 + c1) * (2 * sigma12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    return float((num / den).mean())


def calculate_ssim(img1: np.ndarray, img2: np.ndarray, border: int = 0) -> float:
    """[0,255]-range SSIM with border crop, averaged over channels
    (utils_image.py:642-666)."""
    if img1.shape != img2.shape:
        raise ValueError("input images must have the same dimensions")
    h, w = img1.shape[:2]
    a = img1[border : h - border, border : w - border]
    b = img2[border : h - border, border : w - border]
    if a.ndim == 2:
        return _ssim_single(a, b)
    if a.ndim == 3 and a.shape[2] == 3:
        return float(np.mean([_ssim_single(a[:, :, i], b[:, :, i]) for i in range(3)]))
    if a.ndim == 3 and a.shape[2] == 1:
        return _ssim_single(a[:, :, 0], b[:, :, 0])
    raise ValueError("wrong input image dimensions")


# ------------------------------------------------------------ patch splitting

def patches_from_image(img: np.ndarray, p_size: int = 512, p_overlap: int = 64, p_max: int = 800):
    """Split large images into overlapping patches (utils_image.py:93-110):
    a p_size grid with p_overlap stride reduction, always including the
    bottom/right-aligned positions; images not exceeding p_max in either
    dim pass through whole."""
    h, w = img.shape[:2]
    if not (h > p_max and w > p_max):
        return [img]
    w1 = list(np.arange(0, h - p_size, p_size - p_overlap, dtype=int))
    h1 = list(np.arange(0, w - p_size, p_size - p_overlap, dtype=int))
    w1.append(h - p_size)
    h1.append(w - p_size)
    return [img[i : i + p_size, j : j + p_size, ...] for i in w1 for j in h1]


# --------------------------------------- MATLAB antialiased bicubic imresize

def _cubic(x: np.ndarray) -> np.ndarray:
    """The Keys cubic kernel with a = -0.5 (utils_image.py:700-705)."""
    ax = np.abs(x)
    ax2, ax3 = ax**2, ax**3
    return (1.5 * ax3 - 2.5 * ax2 + 1) * (ax <= 1) + (-0.5 * ax3 + 2.5 * ax2 - 4 * ax + 2) * (
        (ax > 1) & (ax <= 2)
    )


def _resize_weights(in_length: int, out_length: int, scale: float, antialiasing: bool):
    """Per-output-pixel weights + symmetric-pad indices
    (utils_image.py:708-760), numpy."""
    kernel_width = 4.0
    if scale < 1 and antialiasing:
        kernel_width = kernel_width / scale
    x = np.arange(1, out_length + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(math.ceil(kernel_width)) + 2
    indices = left[:, None] + np.arange(p)[None, :]  # (out, P)
    dist = u[:, None] - indices
    if scale < 1 and antialiasing:
        weights = scale * _cubic(dist * scale)
    else:
        weights = _cubic(dist)
    weights = weights / weights.sum(axis=1, keepdims=True)
    zero_cols = (weights == 0).sum(axis=0)
    if not math.isclose(zero_cols[0], 0, rel_tol=1e-6):
        indices = indices[:, 1 : p - 1]
        weights = weights[:, 1 : p - 1]
    if not math.isclose(zero_cols[-1], 0, rel_tol=1e-6):
        indices = indices[:, 0 : p - 2]
        weights = weights[:, 0 : p - 2]
    sym_len_s = int(-indices.min() + 1)
    sym_len_e = int(indices.max() - in_length)
    indices = (indices + sym_len_s - 1).astype(int)
    return np.ascontiguousarray(weights), np.ascontiguousarray(indices), sym_len_s, sym_len_e


def _sym_pad_axis0(img: np.ndarray, s: int, e: int) -> np.ndarray:
    head = img[:s][::-1]
    tail = img[-e:][::-1]
    return np.concatenate([head, img, tail], axis=0)


def imresize_np(img: np.ndarray, scale: float, antialiasing: bool = True) -> np.ndarray:
    """MATLAB 'imresize' (bicubic, antialiased for scale < 1) on HWC/HW
    float [0,1] numpy (utils_image.py:839-909).  Same weights/symmetric
    padding; the per-row torch ``mv`` loops become two gathered einsums."""
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    x = np.asarray(x, dtype=np.float64)
    in_h, in_w, _ = x.shape
    out_h, out_w = math.ceil(in_h * scale), math.ceil(in_w * scale)

    w_h, idx_h, s_h, e_h = _resize_weights(in_h, out_h, scale, antialiasing)
    w_w, idx_w, s_w, e_w = _resize_weights(in_w, out_w, scale, antialiasing)

    aug = _sym_pad_axis0(x, s_h, e_h)  # (in_h + s + e, W, C)
    out1 = np.einsum("op,opwc->owc", w_h, aug[idx_h])  # (out_h, in_w, C)

    aug = _sym_pad_axis0(out1.transpose(1, 0, 2), s_w, e_w)  # pad along W
    out2 = np.einsum("op,ophc->ohc", w_w, aug[idx_w]).transpose(1, 0, 2)

    out2 = out2.astype(np.float32) if img.dtype == np.float32 else out2
    return out2[..., 0] if squeeze else out2
