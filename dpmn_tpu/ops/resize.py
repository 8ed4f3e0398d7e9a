"""Separable image resize as two matmuls (MXU-friendly, torch-parity).

The reference resizes on-device with F.interpolate in bicubic
(interfaces/base.py:398,420 — parse_moran_data / parse_crnn_data) and
bilinear align_corners=True (model/tsrn.py:64, model/tsrn.py:228) modes.
PyTorch's bicubic uses the Keys kernel with a=-0.75 and half-pixel centers;
we precompute the (out, in) interpolation matrices on host once (cached) and
apply them as two dense matmuls, which XLA maps straight onto the MXU — no
gathers, exact same weights as torch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_weight(t: np.ndarray, a: float) -> np.ndarray:
    at = np.abs(t)
    w = np.where(
        at <= 1.0,
        (a + 2.0) * at**3 - (a + 3.0) * at**2 + 1.0,
        np.where(at < 2.0, a * at**3 - 5.0 * a * at**2 + 8.0 * a * at - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def resize_matrix(n_in: int, n_out: int, mode: str = "bicubic", align_corners: bool = False, a: float = -0.75):
    """(n_out, n_in) float32 interpolation matrix matching torch semantics."""
    m = np.zeros((n_out, n_in), np.float64)
    if n_out == n_in and not align_corners:
        # scale==1 under half-pixel mapping is identity for both modes
        np.fill_diagonal(m, 1.0)
        return np.asarray(m, np.float32)
    for i in range(n_out):
        if align_corners:
            src = i * (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
        else:
            src = (i + 0.5) * (n_in / n_out) - 0.5
        if mode == "bicubic":
            base = int(np.floor(src))
            taps = range(base - 1, base + 3)
            for tap in taps:
                w = _cubic_weight(np.asarray(src - tap), a)
                m[i, int(np.clip(tap, 0, n_in - 1))] += float(w)
        elif mode == "bilinear":
            base = int(np.floor(src))
            frac = src - base
            for tap, w in ((base, 1.0 - frac), (base + 1, frac)):
                if w != 0.0:
                    m[i, int(np.clip(tap, 0, n_in - 1))] += float(w)
        elif mode == "nearest":
            # torch 'nearest': floor(i * n_in / n_out)
            m[i, min(int(np.floor(i * n_in / n_out)), n_in - 1)] = 1.0
        else:
            raise ValueError(mode)
    return np.asarray(m, np.float32)


def resize(x: jax.Array, size, mode: str = "bicubic", align_corners: bool = False) -> jax.Array:
    """Resize NHWC images to `size` = (H_out, W_out) with torch semantics."""
    h_out, w_out = size
    _, h_in, w_in, _ = x.shape
    my = jnp.asarray(resize_matrix(h_in, h_out, mode, align_corners), x.dtype)
    mx = jnp.asarray(resize_matrix(w_in, w_out, mode, align_corners), x.dtype)
    # (B,H,W,C) -> (B,Ho,W,C) -> (B,Ho,Wo,C)
    x = jnp.einsum("oh,bhwc->bowc", my, x)
    x = jnp.einsum("ow,bhwc->bhoc", mx, x)
    return x
