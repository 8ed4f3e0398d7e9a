"""Semantic (mask) prior, computed on device.

Parity: reference utils/util.py:27-35 (toMask) — the per-sample PIL
pipeline ToPILImage → convert('L') → mean threshold → point({0,255}) →
ToTensor → repeat 3 channels becomes pure jnp: uint8 truncation
(ToPILImage uses mul(255).byte()), the ITU-R 601-2 integer luma used by
PIL convert('L') ((19595 R + 38470 G + 7471 B + 2^15) >> 16), a per-image
mean threshold, and a {0, 1} float mask broadcast to 3 channels.

The reference runs this per sample on host inside the batch loop
(interfaces/super_resolution.py:220-222); here it is one fused elementwise
pass over the whole NHWC batch inside the jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_mask(images: jax.Array) -> jax.Array:
    """(B, H, W, >=3) float [0,1] → (B, H, W, 3) binary mask prior."""
    rgb = jnp.clip(images[..., :3], 0.0, 1.0)
    u8 = jnp.floor(rgb * 255.0).astype(jnp.int32)  # ToPILImage truncation
    luma = (19595 * u8[..., 0] + 38470 * u8[..., 1] + 7471 * u8[..., 2] + 32768) >> 16
    thres = jnp.mean(luma.astype(jnp.float32), axis=(1, 2), keepdims=True)
    mask = jnp.where(luma.astype(jnp.float32) > thres, 0.0, 1.0)
    return jnp.repeat(mask[..., None], 3, axis=-1)
