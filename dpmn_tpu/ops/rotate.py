"""Batched rotation augmentation (reference utils/util.py:37-58).

torch_rotate_img builds per-sample affine matrices with an aspect-jittered
rotation and warps via affine_grid + grid_sample (align_corners=False).
Runs fully on device inside the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .grid_sample import affine_grid, grid_sample


def rotate_images(images: jax.Array, arc: jax.Array, rand_offs: jax.Array, off_range: float = 0.2) -> jax.Array:
    """images NHWC; arc (B,) radians; rand_offs (B,) uniform [0,1)."""
    n, h, w, _ = images.shape
    ratios = h / float(w)
    ratios_mul = ratios + (rand_offs * off_range * 2.0) - off_range  # (B,)
    cos, sin = jnp.cos(arc), jnp.sin(arc)
    zeros = jnp.zeros_like(arc)
    theta = jnp.stack(
        [cos, sin * ratios_mul, zeros, -sin / ratios_mul, cos, zeros], axis=1
    ).reshape(n, 2, 3)
    grid = affine_grid(theta, (n, h, w), align_corners=False)
    return grid_sample(images, grid, align_corners=False)


def random_rotate(images_lr, images_hr, rng: jax.Array, rotate_degrees: float):
    """The rotate_train path (super_resolution.py:144-151): one shared angle
    draw per sample applied to both LR and HR."""
    b = images_lr.shape[0]
    k1, k2 = jax.random.split(rng)
    angle = jax.random.uniform(k1, (b,)) * rotate_degrees * 2.0 - rotate_degrees
    arc = angle / 180.0 * jnp.pi
    rand_offs = jax.random.uniform(k2, (b,))
    return rotate_images(images_lr, arc, rand_offs), rotate_images(images_hr, arc, rand_offs)
