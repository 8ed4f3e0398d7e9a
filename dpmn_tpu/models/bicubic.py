"""Bicubic x-scale baseline (reference model/bicubic.py:6-13)."""

import jax

from ..ops.resize import resize


class Bicubic:
    def __init__(self, scale_factor: int = 2):
        self.scale_factor = scale_factor

    def __call__(self, x: jax.Array) -> jax.Array:
        """NHWC → NHWC upscaled with torch-parity bicubic."""
        _, h, w, _ = x.shape
        return resize(x, (h * self.scale_factor, w * self.scale_factor), mode="bicubic")
