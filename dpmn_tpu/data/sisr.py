"""SISR degradation / deconvolution toolkit (host-side data prep + jax FFT ops).

Functional port of the reference's Kai-Zhang utility tail:
  * utils/utils_deblur.py  — fspecial bank, PSF<->OTF, FFT-size/boundary
    helpers, random motion-blur kernel synthesis, Wiener numerator pair.
  * utils/utils_sisr.py    — anisotropic/shifted Gaussian kernels, PCA kernel
    projection, the four degradation models, s-fold (up/down)sampling,
    circular filtering G/Gt, and the INVLS closed-form FFT solver.

These are dead on the live DPMN path (dataset.py:28-36 only uses the 15x15
gaussian via the collate), but they complete the degradation-toolkit surface
(SURVEY §2 #26).  Design deviations from the reference, on purpose:
  * complex numbers are native (numpy/jax complex64/128) — the reference's
    (..., 2) stacked real/imag pairs and the c2c/r2c/cmul/cdiv family exist
    only because torch < 1.8 lacked complex dtypes; jax does not.
  * every random generator takes a seeded ``np.random.Generator`` instead of
    mutating global RNG state (utils_deblur.py:555-632 uses np.random/random
    module state).
  * torch NCHW tensor variants are expressed once in NHWC numpy/jax; the
    batched OTF (`p2o`) and the INVLS solver have jittable jax versions for
    on-device use.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import numpy as np
from scipy import fftpack, ndimage
from scipy.signal import convolve2d

__all__ = [
    "fspecial", "fspecial_gauss", "gm_blur_kernel", "anisotropic_gaussian",
    "shifted_anisotropic_gaussian", "gen_kernel", "pca_matrix", "cal_pca_matrix",
    "blur_kernel_synthesis", "zero_pad", "psf2otf", "otf2psf", "p2o",
    "wiener_upperleft_denominator", "opt_fft_size", "wrap_boundary_liu",
    "solve_min_laplacian", "bicubic_degradation", "srmd_degradation",
    "dpsr_degradation", "classical_degradation", "modcrop", "shift_pixel",
    "upsample", "downsample", "imfilter_circular", "G", "Gt",
    "interpolation_down", "splits", "invls",
]


# ---------------------------------------------------------------------------
# fspecial kernel bank (utils_deblur.py:460-552; MATLAB fspecial semantics)
# ---------------------------------------------------------------------------

def _fspecial_average(hsize: int = 3) -> np.ndarray:
    return np.full((hsize, hsize), 1.0 / hsize**2)


def _fspecial_gaussian(hsize: int, sigma: float) -> np.ndarray:
    siz = (hsize - 1.0) / 2.0
    y, x = np.mgrid[-siz : siz + 1, -siz : siz + 1]
    h = np.exp(-(x * x + y * y) / (2.0 * sigma * sigma))
    h[h < np.finfo(float).eps * h.max()] = 0
    s = h.sum()
    return h / s if s != 0 else h


def _fspecial_laplacian(alpha: float) -> np.ndarray:
    alpha = max(0.0, min(alpha, 1.0))
    h1 = alpha / (alpha + 1)
    h2 = (1 - alpha) / (alpha + 1)
    return np.array([[h1, h2, h1], [h2, -4 / (alpha + 1), h2], [h1, h2, h1]])


def _fspecial_log(hsize: int, sigma: float) -> np.ndarray:
    # Laplacian-of-Gaussian (MATLAB fspecial('log'); the reference stubs this
    # with NotImplemented — implemented here for completeness)
    siz = (hsize - 1.0) / 2.0
    y, x = np.mgrid[-siz : siz + 1, -siz : siz + 1]
    arg = -(x * x + y * y) / (2.0 * sigma * sigma)
    h = np.exp(arg)
    h[h < np.finfo(float).eps * h.max()] = 0
    s = h.sum()
    if s != 0:
        h = h / s
    h1 = h * (x * x + y * y - 2 * sigma * sigma) / sigma**4
    return h1 - h1.sum() / hsize**2


def _fspecial_motion(motion_len: float, theta: float) -> np.ndarray:
    # MATLAB fspecial('motion'): a length-`motion_len` line at angle theta
    # (degrees), anti-aliased (reference stubs this with NotImplemented)
    half = max(motion_len / 2.0 - 0.5, 0.0)
    phi = math.radians(theta % 180.0)
    cosphi, sinphi = math.cos(phi), math.sin(phi)
    xsign = 1 if cosphi >= 0 else -1
    linewdt = 1.0
    eps = np.finfo(float).eps
    sx = int(math.floor(half * abs(cosphi) + linewdt * abs(sinphi) + eps))
    sy = int(math.floor(half * abs(sinphi) + linewdt * abs(cosphi) + eps))
    y, x = np.mgrid[0 : sy + 1, 0 : sx + 1]
    x = x * xsign
    dist2line = y * cosphi - x * sinphi  # distance from the line
    rad = np.sqrt(x * x + y * y)
    # points beyond the line's end get distance-to-endpoint instead
    lastpix = (rad >= half) & (np.abs(dist2line) <= linewdt)
    x2lastpix = half - np.abs((x[lastpix] + dist2line[lastpix] * sinphi) / (cosphi if abs(cosphi) > eps else eps))
    d = dist2line.copy()
    d[lastpix] = np.sqrt(d[lastpix] ** 2 + x2lastpix**2)
    d = linewdt + eps - np.abs(d)
    d[d < 0] = 0
    h = np.zeros((2 * sy + 1, 2 * sx + 1))
    h[0 : sy + 1, 0 : sx + 1] = np.rot90(d, 2)
    h[sy:, sx:] = d
    s = h.sum()
    if s != 0:
        h = h / s
    if cosphi < 0:
        h = np.fliplr(h)
    return h


def _fspecial_disk(radius: float) -> np.ndarray:
    # pillbox average over a disk (MATLAB fspecial('disk'); the reference's
    # version is an abandoned half-port that raises) — supersampled area
    # approximation, exact in the limit, normalized to sum 1
    crad = int(np.ceil(radius - 0.5))
    ss = 8  # subsamples per axis per cell
    y, x = np.mgrid[-crad : crad + 1, -crad : crad + 1]
    offs = (np.arange(ss) + 0.5) / ss - 0.5
    oy, ox = np.meshgrid(offs, offs, indexing="ij")
    sub = (
        ((y[..., None, None] + oy) ** 2 + (x[..., None, None] + ox) ** 2)
        <= radius**2
    )
    h = sub.mean(axis=(-2, -1))
    return h / h.sum()


def _fspecial_prewitt() -> np.ndarray:
    return np.array([[1, 1, 1], [0, 0, 0], [-1, -1, -1]], dtype=float)


def _fspecial_sobel() -> np.ndarray:
    return np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], dtype=float)


_FSPECIAL = {
    "average": _fspecial_average,
    "gaussian": _fspecial_gaussian,
    "laplacian": _fspecial_laplacian,
    "log": _fspecial_log,
    "motion": _fspecial_motion,
    "disk": _fspecial_disk,
    "prewitt": _fspecial_prewitt,
    "sobel": _fspecial_sobel,
}


def fspecial(filter_type: str, *args, **kwargs) -> np.ndarray:
    """MATLAB-style special filters (utils_deblur.py:526-546)."""
    return _FSPECIAL[filter_type](*args, **kwargs)


def fspecial_gauss(size: int, sigma: float) -> np.ndarray:
    """The mgrid-centered gaussian variant (utils_deblur.py:549-552)."""
    y, x = np.mgrid[-size // 2 + 1 : size // 2 + 1, -size // 2 + 1 : size // 2 + 1]
    g = np.exp(-((x**2 + y**2) / (2.0 * sigma**2)))
    return g / g.sum()


# ---------------------------------------------------------------------------
# anisotropic Gaussian kernel family (utils_sisr.py:35-213)
# ---------------------------------------------------------------------------

def gm_blur_kernel(mean, cov, size: int = 15) -> np.ndarray:
    """Gaussian-pdf kernel on the `center = size/2 + 0.5` grid
    (utils_sisr.py:56-66), vectorized instead of the per-pixel pdf loop."""
    center = size / 2.0 + 0.5
    yy, xx = np.mgrid[0:size, 0:size]
    pts = np.stack([xx - center + 1, yy - center + 1], axis=-1).reshape(-1, 2)
    mean = np.asarray(mean, dtype=float)
    cov = np.asarray(cov, dtype=float)
    icov = np.linalg.inv(cov)
    d = pts - mean
    expo = -0.5 * np.einsum("ni,ij,nj->n", d, icov, d)
    k = np.exp(expo) / (2 * np.pi * np.sqrt(np.linalg.det(cov)))
    k = k.reshape(size, size)
    return k / k.sum()


def anisotropic_gaussian(ksize: int = 15, theta: float = np.pi, l1: float = 6, l2: float = 6) -> np.ndarray:
    """Rotated anisotropic Gaussian (utils_sisr.py:35-53)."""
    v = np.array([np.cos(theta), np.sin(theta)])
    V = np.array([[v[0], v[1]], [v[1], -v[0]]])
    D = np.array([[l1, 0.0], [0.0, l2]])
    sigma = V @ D @ np.linalg.inv(V)
    return gm_blur_kernel(mean=[0, 0], cov=sigma, size=ksize)


def shifted_anisotropic_gaussian(
    rng: np.random.Generator,
    k_size=(15, 15),
    scale_factor=(4, 4),
    min_var: float = 0.6,
    max_var: float = 10.0,
    noise_level: float = 0.0,
) -> np.ndarray:
    """Random anisotropic kernel with the half-pixel shift that aligns the
    downsampled grid (utils_sisr.py:130-169)."""
    k_size = np.asarray(k_size)
    scale_factor = np.asarray(scale_factor)
    lambda_1 = min_var + rng.random() * (max_var - min_var)
    lambda_2 = min_var + rng.random() * (max_var - min_var)
    theta = rng.random() * np.pi
    noise = -noise_level + rng.random(tuple(k_size)) * noise_level * 2

    lam = np.diag([lambda_1, lambda_2])
    q = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    sigma = q @ lam @ q.T
    inv_sigma = np.linalg.inv(sigma)
    mu = k_size // 2 - 0.5 * (scale_factor - 1)

    x, y = np.meshgrid(range(k_size[0]), range(k_size[1]))
    z = np.stack([x, y], axis=-1) - mu  # (H, W, 2)
    raw = np.exp(-0.5 * np.einsum("hwi,ij,hwj->hw", z, inv_sigma, z)) * (1 + noise)
    return raw / raw.sum()


def gen_kernel(
    rng: np.random.Generator,
    k_size=(25, 25),
    min_var: float = 0.6,
    max_var: float = 12.0,
) -> np.ndarray:
    """shifted_anisotropic_gaussian with a random scale factor in {1..4} and
    no multiplicative noise (utils_sisr.py:172-213)."""
    sf = int(rng.integers(1, 5))
    return shifted_anisotropic_gaussian(
        rng, k_size=k_size, scale_factor=(sf, sf), min_var=min_var, max_var=max_var, noise_level=0.0
    )


def pca_matrix(x: np.ndarray, dim_pca: int = 15) -> np.ndarray:
    """Top-dim_pca eigenvectors of x x^T as a (dim_pca, D) projection
    (utils_sisr.py:76-88)."""
    import scipy.linalg

    w, v = scipy.linalg.eigh(x @ x.T)
    return v[:, -dim_pca:].T


def cal_pca_matrix(
    rng: np.random.Generator, ksize: int = 15, l_max: float = 12.0, dim_pca: int = 15, num_samples: int = 500
) -> np.ndarray:
    """PCA basis over random anisotropic kernels, column-major flattened like
    the MATLAB original (utils_sisr.py:100-120; the .mat dump is dropped)."""
    kernels = np.zeros([ksize * ksize, num_samples], dtype=np.float32)
    for i in range(num_samples):
        theta = np.pi * rng.random()
        l1 = 0.1 + l_max * rng.random()
        l2 = 0.1 + (l1 - 0.1) * rng.random()
        kernels[:, i] = anisotropic_gaussian(ksize, theta, l1, l2).reshape(-1, order="F")
    return pca_matrix(kernels, dim_pca=dim_pca)


# ---------------------------------------------------------------------------
# random motion-blur kernel synthesis (utils_deblur.py:555-641)
# ---------------------------------------------------------------------------

def _rot3d(x: np.ndarray, r: np.ndarray) -> np.ndarray:
    cx, sx = np.cos(r[0]), np.sin(r[0])
    cy, sy = np.cos(r[1]), np.sin(r[1])
    cz, sz = np.cos(r[2]), np.sin(r[2])
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx @ x


def _random_trajectory(rng: np.random.Generator, t: int) -> np.ndarray:
    """3-D camera-shake trajectory (utils_deblur.py:618-632)."""
    x = np.zeros((3, t))
    v = rng.standard_normal((3, t))
    r = np.zeros((3, t))
    trr = 2 * np.pi / t
    for i in range(1, t):
        f_rot = rng.standard_normal(3) / (i + 1) + r[:, i - 1]
        f_trans = rng.standard_normal(3) / (i + 1)
        r[:, i] = r[:, i - 1] + trr * f_rot
        v[:, i] = v[:, i - 1] + f_trans
        x[:, i] = x[:, i - 1] + _rot3d(v[:, i], r[:, i])
    return x


def _kernel_from_trajectory(rng: np.random.Generator, x: np.ndarray):
    """Histogram the projected trajectory into a kernel (utils_deblur.py:587-615)."""
    h = 5 - np.log(rng.random()) / 0.15
    h = int(round(min(h, 27)))
    h = h + 1 - h % 2
    w = h
    k = np.zeros((h, w))
    xmin, xmax = x[0].min(), x[0].max()
    ymin, ymax = x[1].min(), x[1].max()
    xthr = np.arange(xmin, xmax, (xmax - xmin) / w)
    ythr = np.arange(ymin, ymax, (ymax - ymin) / h)
    for i in range(1, xthr.size):
        for j in range(1, ythr.size):
            idx = (
                (x[0, :] >= xthr[i - 1]) & (x[0, :] < xthr[i])
                & (x[1, :] >= ythr[j - 1]) & (x[1, :] < ythr[j])
            )
            k[i - 1, j - 1] = idx.sum()
    if k.sum() == 0:
        return None
    k = k / k.sum()
    k = convolve2d(k, fspecial_gauss(3, 1), "same")
    return k / k.sum()


def blur_kernel_synthesis(rng: np.random.Generator, h: int = 37, w: int = None) -> np.ndarray:
    """Random camera-shake blur kernel, center-padded to (h, w), sometimes
    rescaled (utils_deblur.py:555-584).  Seeded rng instead of module state."""
    import cv2

    w = h if w is None else w
    k = None
    while k is None:
        k = _kernel_from_trajectory(rng, _random_trajectory(rng, 250))
    pad_h, pad_w = (h - k.shape[0]) // 2, (w - k.shape[1]) // 2
    if pad_h < 0 or pad_w < 0:
        k = k[0:h, 0:h]
    else:
        k = np.pad(k, ((pad_h, pad_h), (pad_w, pad_w)), "constant")
    x1, x2 = k.shape
    if rng.integers(0, 4) == 1:
        k = cv2.resize(
            k, (int(rng.integers(x1, 5 * x1 + 1)), int(rng.integers(x2, 5 * x2 + 1))),
            interpolation=cv2.INTER_LINEAR,
        )
        y1, y2 = k.shape
        k = k[(y1 - x1) // 2 : (y1 - x1) // 2 + x1, (y2 - x2) // 2 : (y2 - x2) // 2 + x2]
    if k.sum() < 0.1:
        k = _fspecial_gaussian(h, 0.1 + 6 * rng.random())
    return k / k.sum()


# ---------------------------------------------------------------------------
# PSF <-> OTF (utils_deblur.py:104-241, utils_sisr.py:427-443,663-751)
# ---------------------------------------------------------------------------

def zero_pad(image: np.ndarray, shape, position: str = "corner") -> np.ndarray:
    """Zero-extend a 2-D array to `shape`, corner- or center-anchored
    (utils_deblur.py:202-241)."""
    shape = np.asarray(shape, dtype=int)
    imshape = np.asarray(image.shape, dtype=int)
    if np.all(imshape == shape):
        return image
    if np.any(shape <= 0):
        raise ValueError("zero_pad: null or negative shape given")
    dshape = shape - imshape
    if np.any(dshape < 0):
        raise ValueError("zero_pad: target size smaller than source one")
    if position == "center":
        if np.any(dshape % 2 != 0):
            raise ValueError("zero_pad: source and target shapes have different parity")
        offy, offx = dshape // 2
    else:
        offy, offx = 0, 0
    out = np.zeros(tuple(shape), dtype=image.dtype)
    out[offy : offy + imshape[0], offx : offx + imshape[1]] = image
    return out


def psf2otf(psf: np.ndarray, shape=None) -> np.ndarray:
    """PSF → OTF: corner-pad, circular-shift the center to (0, 0), FFT
    (utils_deblur.py:153-199; MATLAB psf2otf semantics incl. the
    real-if-close cleanup)."""
    if shape is None:
        shape = psf.shape
    if np.all(psf == 0):
        return np.zeros(tuple(np.asarray(shape)))
    if psf.ndim == 1:
        psf = psf.reshape(1, -1)
    inshape = psf.shape
    psf = zero_pad(psf, shape, position="corner")
    for axis, axis_size in enumerate(inshape):
        psf = np.roll(psf, -int(axis_size / 2), axis=axis)
    otf = np.fft.fft2(psf, axes=(0, 1))
    n_ops = np.sum(psf.size * np.log2(psf.shape))
    return np.real_if_close(otf, tol=n_ops)


def otf2psf(otf: np.ndarray, outsize=None) -> np.ndarray:
    """Inverse of psf2otf: IFFT, circular-shift back, center-crop to outsize
    (utils_deblur.py:122-149)."""
    insize = np.array(otf.shape)
    psf = np.fft.ifftn(otf, axes=(0, 1))
    for axis, axis_size in enumerate(insize):
        psf = np.roll(psf, int(np.floor(axis_size / 2)), axis=axis)
    if outsize is not None:
        outsize = np.asarray(outsize)
        pad = (insize - outsize) / 2
        if np.any(pad < 0):
            raise ValueError("otf2psf: outsize must not exceed the otf size")
        start = np.floor(pad).astype(int)
        end = (insize - np.ceil(pad)).astype(int)
        psf = psf[start[0] : end[0], start[1] : end[1]]
    n_ops = np.sum(otf.size * np.log2(otf.shape))
    return np.real_if_close(psf, tol=n_ops)


def p2o(psf, shape: Tuple[int, int]):
    """Batched PSF → OTF on device: (..., h, w) → complex (..., H, W)
    (utils_sisr.py:427-443 / utils_deblur.py:104-117, native complex instead
    of stacked real/imag pairs).  Jittable."""
    import jax.numpy as jnp

    psf = jnp.asarray(psf)
    h, w = psf.shape[-2:]
    otf = jnp.zeros(psf.shape[:-2] + tuple(shape), psf.dtype)
    otf = otf.at[..., :h, :w].set(psf)
    otf = jnp.roll(otf, (-(h // 2), -(w // 2)), axis=(-2, -1))
    return jnp.fft.fft2(otf)


def wiener_upperleft_denominator(img: np.ndarray, kernel: np.ndarray):
    """Numerator/denominator of the Wiener deconvolution update
    (utils_deblur.py:21-31): conj(V)·FFT(img) and |V|^2 for V = psf2otf(k)."""
    v = psf2otf(kernel, img.shape[:2])
    denominator = np.expand_dims(np.abs(v) ** 2, axis=2)
    upperleft = np.expand_dims(np.conj(v), axis=2) * np.fft.fft2(img, axes=(0, 1))
    return upperleft, denominator


# ---------------------------------------------------------------------------
# FFT sizing + boundary wrapping (utils_deblur.py:249-437)
# ---------------------------------------------------------------------------

def opt_fft_size(n: Sequence[int]) -> np.ndarray:
    """Next 2^a·3^b·5^c·7^d·{1,11,13} ≥ n (≤ 2048) per entry
    (utils_deblur.py:249-296), via the same LUT construction."""
    lut_size = 2048
    lut = np.zeros(lut_size)
    e2 = 1
    while e2 <= lut_size:
        e3 = e2
        while e3 <= lut_size:
            e5 = e3
            while e5 <= lut_size:
                e7 = e5
                while e7 <= lut_size:
                    lut[e7 - 1] = e7
                    if e7 * 11 <= lut_size:
                        lut[e7 * 11 - 1] = e7 * 11
                    if e7 * 13 <= lut_size:
                        lut[e7 * 13 - 1] = e7 * 13
                    e7 *= 7
                e5 *= 5
            e3 *= 3
        e2 *= 2
    nn = 0
    for i in range(lut_size, 0, -1):
        if lut[i - 1] != 0:
            nn = i - 1
        else:
            lut[i - 1] = nn + 1
    return np.array([lut[v - 1] if v <= lut_size else -1 for v in n])


def solve_min_laplacian(boundary_image: np.ndarray) -> np.ndarray:
    """Minimal-Laplacian infill of a boundary-only image via the DST Poisson
    solve (utils_deblur.py:381-437).  NOTE: like the reference, the input's
    interior is zeroed in place."""
    h, w = boundary_image.shape
    boundary_image[1:-1, 1:-1] = 0
    j, k = np.arange(1, h - 1), np.arange(1, w - 1)
    f_bp = np.zeros((h, w))
    f_bp[np.ix_(j, k)] = (
        -4 * boundary_image[np.ix_(j, k)]
        + boundary_image[np.ix_(j, k + 1)] + boundary_image[np.ix_(j, k - 1)]
        + boundary_image[np.ix_(j - 1, k)] + boundary_image[np.ix_(j + 1, k)]
    )
    f2 = -f_bp[1:-1, 1:-1]
    tt = fftpack.dst(f2, type=1) / 2 if f2.shape[1] != 1 else fftpack.dst(f2, type=1, axis=0) / 2
    if tt.shape[0] == 1:
        f2sin = (fftpack.dst(tt.T, type=1, axis=0) / 2).T
    else:
        f2sin = (fftpack.dst(tt.T, type=1) / 2).T
    x, y = np.meshgrid(np.arange(1, w - 1), np.arange(1, h - 1))
    denom = (2 * np.cos(np.pi * x / (w - 1)) - 2) + (2 * np.cos(np.pi * y / (h - 1)) - 2)
    f3 = f2sin / denom
    if f3.shape[0] == 1:
        tt = fftpack.idst(f3 * 2, type=1, axis=1) / (2 * (f3.shape[1] + 1))
    else:
        tt = fftpack.idst(f3 * 2, type=1, axis=0) / (2 * (f3.shape[0] + 1))
    if tt.shape[1] == 1:
        img_tt = (fftpack.idst(tt.T * 2, type=1) / (2 * (tt.shape[0] + 1))).T
    else:
        img_tt = (fftpack.idst(tt.T * 2, type=1, axis=0) / (2 * (tt.shape[1] + 1))).T
    out = boundary_image
    out[1:-1, 1:-1] = img_tt
    return out


def _wrap_boundary_2d(img: np.ndarray, img_size) -> np.ndarray:
    """Liu-Jia ICIP'08 boundary extension of one channel (utils_deblur.py:314-378)."""
    h, w = img.shape
    h_w = int(img_size[0]) - h
    w_w = int(img_size[1]) - w
    alpha = 1

    r_a = np.zeros((alpha * 2 + h_w, w))
    r_a[:alpha, :] = img[-alpha:, :]
    r_a[-alpha:, :] = img[:alpha, :]
    a = np.arange(h_w) / (h_w - 1)
    r_a[alpha:-alpha, 0] = (1 - a) * r_a[alpha - 1, 0] + a * r_a[-alpha, 0]
    r_a[alpha:-alpha, -1] = (1 - a) * r_a[alpha - 1, -1] + a * r_a[-alpha, -1]

    r_b = np.zeros((h, alpha * 2 + w_w))
    r_b[:, :alpha] = img[:, -alpha:]
    r_b[:, -alpha:] = img[:, :alpha]
    a = np.arange(w_w) / (w_w - 1)
    r_b[0, alpha:-alpha] = (1 - a) * r_b[0, alpha - 1] + a * r_b[0, -alpha]
    r_b[-1, alpha:-alpha] = (1 - a) * r_b[-1, alpha - 1] + a * r_b[-1, -alpha]

    r_a[alpha - 1 :, :] = solve_min_laplacian(r_a[alpha - 1 :, :])
    r_b[:, alpha - 1 :] = solve_min_laplacian(r_b[:, alpha - 1 :])

    r_c = np.zeros((alpha * 2 + h_w, alpha * 2 + w_w))
    r_c[:alpha, :] = r_b[-alpha:, :]
    r_c[-alpha:, :] = r_b[:alpha, :]
    r_c[:, :alpha] = r_a[:, -alpha:]
    r_c[:, -alpha:] = r_a[:, :alpha]
    r_c[alpha - 1 :, alpha - 1 :] = solve_min_laplacian(r_c[alpha - 1 :, alpha - 1 :])

    a_blk = r_a[alpha - 1 : -alpha - 1, :]
    b_blk = r_b[:, alpha:-alpha]
    c_blk = r_c[alpha:-alpha, alpha:-alpha]
    return np.vstack((np.hstack((img, b_blk)), np.hstack((a_blk, c_blk))))


def wrap_boundary_liu(img: np.ndarray, img_size) -> np.ndarray:
    """Periodic-smooth boundary extension, per channel for HxWx3
    (utils_deblur.py:299-311)."""
    if img.ndim == 2:
        return _wrap_boundary_2d(img, img_size)
    return np.stack([_wrap_boundary_2d(img[:, :, i], img_size) for i in range(3)], axis=2)


# ---------------------------------------------------------------------------
# degradation models + sampling operators (utils_sisr.py:223-309,490-798)
# ---------------------------------------------------------------------------

def bicubic_degradation(x: np.ndarray, sf: int = 3) -> np.ndarray:
    """MATLAB-bicubic downsample (utils_sisr.py:223-232)."""
    from .image_utils import imresize_np

    return imresize_np(x, 1.0 / sf)


def srmd_degradation(x: np.ndarray, k: np.ndarray, sf: int = 3) -> np.ndarray:
    """Wrap-blur (+ no downsample — the reference commented it out)
    (utils_sisr.py:235-256)."""
    return ndimage.convolve(x, np.expand_dims(k, axis=2), mode="wrap")


def dpsr_degradation(x: np.ndarray, k: np.ndarray, sf: int = 3) -> np.ndarray:
    """Bicubic downsample then wrap-blur (utils_sisr.py:259-279)."""
    return ndimage.convolve(bicubic_degradation(x, sf=sf), np.expand_dims(k, axis=2), mode="wrap")


def classical_degradation(x: np.ndarray, k: np.ndarray, sf: int = 3) -> np.ndarray:
    """Wrap-blur then s-fold subsample (utils_sisr.py:282-296)."""
    x = ndimage.convolve(x, np.expand_dims(k, axis=2), mode="wrap")
    return x[::sf, ::sf, ...]


def modcrop(img: np.ndarray, sf: int) -> np.ndarray:
    """Crop the leading two dims to multiples of sf (utils_sisr.py:299-309)."""
    h, w = img.shape[:2]
    return np.copy(img)[: h - h % sf, : w - w % sf, ...]


def shift_pixel(x: np.ndarray, sf: int, upper_left: bool = True) -> np.ndarray:
    """Half-pixel (sf-1)/2 bilinear shift (utils_sisr.py:319-345; the
    deprecated scipy interp2d replaced with direct separable linear
    interpolation on the same clipped sample grid)."""
    h, w = x.shape[:2]
    shift = (sf - 1) * 0.5
    xv, yv = np.arange(w, dtype=float), np.arange(h, dtype=float)
    x1 = np.clip(xv + shift if upper_left else xv - shift, 0, w - 1)
    y1 = np.clip(yv + shift if upper_left else yv - shift, 0, h - 1)

    def interp_channel(img2d):
        x0 = np.floor(x1).astype(int)
        xa = np.minimum(x0 + 1, w - 1)
        fx = x1 - x0
        y0 = np.floor(y1).astype(int)
        ya = np.minimum(y0 + 1, h - 1)
        fy = (y1 - y0)[:, None]
        rows = img2d[:, x0] * (1 - fx) + img2d[:, xa] * fx
        return rows[y0, :] * (1 - fy) + rows[ya, :] * fy

    if x.ndim == 2:
        return interp_channel(x)
    out = np.empty_like(x)
    for c in range(x.shape[-1]):
        out[:, :, c] = interp_channel(x[:, :, c])
    return out


def upsample(x: np.ndarray, sf: int = 3, center: bool = False) -> np.ndarray:
    """s-fold zero-insertion upsampling, HxWxC (utils_sisr.py:490-497,754-758)."""
    st = (sf - 1) // 2 if center else 0
    z = np.zeros((x.shape[0] * sf, x.shape[1] * sf) + x.shape[2:], dtype=x.dtype)
    z[st::sf, st::sf, ...] = x
    return z


def downsample(x: np.ndarray, sf: int = 3, center: bool = False) -> np.ndarray:
    """s-fold subsampling (utils_sisr.py:500-502,761-763)."""
    st = (sf - 1) // 2 if center else 0
    return x[st::sf, st::sf, ...]


def imfilter_circular(x: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Circular ('wrap') correlation-free convolution per channel
    (utils_sisr.py:541-548,766-772)."""
    return ndimage.convolve(x, np.expand_dims(k, axis=2) if x.ndim == 3 else k, mode="wrap")


def G(x: np.ndarray, k: np.ndarray, sf: int = 3, center: bool = False) -> np.ndarray:
    """Degradation operator: circular blur then downsample (utils_sisr.py:551-563)."""
    return downsample(imfilter_circular(x, k), sf=sf, center=center)


def Gt(x: np.ndarray, k: np.ndarray, sf: int = 3, center: bool = False) -> np.ndarray:
    """Adjoint: zero-insert upsample then circular blur (utils_sisr.py:566-578)."""
    return imfilter_circular(upsample(x, sf=sf, center=center), k)


def interpolation_down(x: np.ndarray, sf: int, center: bool = False):
    """(LR, masked HR, mask) triple for interpolation-style degradation
    (utils_sisr.py:581-592)."""
    mask = np.zeros_like(x)
    st = (sf - 1) // 2 if center else 0
    mask[st::sf, st::sf, ...] = 1
    lr = x[st::sf, st::sf, ...]
    return lr, x * mask, mask


# ---------------------------------------------------------------------------
# INVLS closed-form FFT solver (utils_sisr.py:355-363,452-473,602-660)
# ---------------------------------------------------------------------------

def splits(a, sf: int):
    """(H, W, ...) → (H/sf, W/sf, ..., sf^2): stack the sf x sf contiguous
    spatial blocks (the Fourier alias bands) along a new trailing axis
    (utils_sisr.py:355-363), expressed as one reshape/transpose instead of
    chunk+cat; block index = col_block * sf + row_block like the torch
    chunk/cat order."""
    import jax.numpy as jnp

    xp = jnp if not isinstance(a, np.ndarray) else np
    h, w = a.shape[:2]
    rest = a.shape[2:]
    nd = a.ndim
    b = a.reshape((sf, h // sf, sf, w // sf) + rest)
    # phase index = col_phase * sf + row_phase, matching torch.chunk order
    b = xp.transpose(b, (1, 3) + tuple(range(4, nd + 2)) + (2, 0))
    return b.reshape((h // sf, w // sf) + rest + (sf * sf,))


def invls(FB, FBC, F2B, FR, tau: float, sf: int = 2):
    """Closed-form data-term solve for  argmin ||SHx - y||^2 + tau||x - z||^2
    in the Fourier domain (utils_sisr.py:452-473 / 642-660):

        FBR     = mean over the sf^2 phases of FB .* FR
        invWBR  = FBR / (mean-phase |FB|^2 + tau)
        x       = real(ifft2((FR - conj(FB) .* tile(invWBR)) / tau))

    Native complex, (H, W, C) trailing-channel layout, jittable (works on
    numpy or jax arrays)."""
    import jax.numpy as jnp

    xp = jnp if not isinstance(FB, np.ndarray) else np
    x1 = FB * FR
    fbr = splits(x1, sf).mean(axis=-1)
    inv_w = splits(F2B, sf).mean(axis=-1)
    inv_wbr = fbr / (inv_w + tau)
    tiled = xp.tile(inv_wbr, (sf, sf) + (1,) * (inv_wbr.ndim - 2))
    fx = (FR - FBC * tiled) / tau
    return xp.real(xp.fft.ifft2(fx, axes=(0, 1)))
