"""PSNR / SSIM image metrics, jit-compatible, NHWC.

Bit-parity targets:
  * calculate_psnr — reference utils/ssim_psnr.py:9-13
      mse over the first 3 channels scaled by 255; 20*log10(255/sqrt(mse))
  * SSIM           — reference utils/ssim_psnr.py:16-79
      11x11 gaussian window sigma=1.5 depthwise conv, pad window//2,
      C1=0.01^2, C2=0.03^2, mean over everything
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / float(2 * sigma**2)) for x in range(window_size)],
        dtype=np.float32,
    )
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return w2d


def psnr(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """PSNR over the first 3 channels, images NHWC in [0, 1]."""
    a = img1[..., :3] * 255.0
    b = img2[..., :3] * 255.0
    mse = jnp.mean((a - b) ** 2)
    return 20.0 * jnp.log10(255.0 / jnp.sqrt(mse))


def _depthwise_window_conv(x: jax.Array, window: jax.Array, pad: int) -> jax.Array:
    """Depthwise 2-D conv, NHWC, one shared window per channel."""
    c = x.shape[-1]
    kernel = jnp.broadcast_to(window[:, :, None, None], window.shape + (1, c))  # HWIO, I=1
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


@functools.partial(jax.jit, static_argnames=("window_size", "size_average"))
def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11, size_average: bool = True) -> jax.Array:
    """SSIM over the first 3 channels, NHWC in [0, 1]."""
    img1 = img1[..., :3]
    img2 = img2[..., :3]
    window = jnp.asarray(_gaussian_window(window_size, 1.5))
    pad = window_size // 2
    conv = lambda t: _depthwise_window_conv(t, window, pad)

    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2

    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))
