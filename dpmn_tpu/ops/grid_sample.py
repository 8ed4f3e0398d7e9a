"""Bilinear grid sampling (torch F.grid_sample parity), NHWC.

Consumers mirror the reference:
  * TPS spatial transformer warp    — model/tps_spatial_transformer.py:10-18
    (grid_sample with canvas padding, align_corners default False)
  * MORAN MORN offset-grid rectify  — model/moran/morn.py
  * batched rotation augmentation   — utils/util.py:37-58

Implemented as four clamped gathers + bilinear blend with out-of-bounds
masking (zeros padding).  Gathers on TPU lower to dynamic-slice fusions;
for the hot TPS path a fused Pallas kernel lives in ops/pallas_kernels.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(x: jax.Array, grid: jax.Array, align_corners: bool = False, padding_mode: str = "zeros") -> jax.Array:
    """Sample NHWC `x` at normalized `grid` (B, Ho, Wo, 2) in [-1, 1].

    grid[..., 0] is x (width) coordinate, grid[..., 1] is y, as in torch.
    """
    b, h, w, c = x.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = (gx + 1.0) * 0.5 * w - 0.5
        iy = (gy + 1.0) * 0.5 * h - 0.5

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    fx = ix - ix0
    fy = iy - iy0
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    def gather(iy_, ix_):
        iyc = jnp.clip(iy_, 0, h - 1)
        ixc = jnp.clip(ix_, 0, w - 1)
        # (B, Ho, Wo) flat index into (H*W)
        flat = iyc * w + ixc
        xb = x.reshape(b, h * w, c)
        vals = jnp.take_along_axis(xb, flat.reshape(b, -1, 1), axis=1).reshape(flat.shape + (c,))
        if padding_mode == "zeros":
            valid = (iy_ >= 0) & (iy_ < h) & (ix_ >= 0) & (ix_ < w)
            vals = vals * valid[..., None].astype(vals.dtype)
        return vals

    v00 = gather(iy0, ix0)
    v01 = gather(iy0, ix1)
    v10 = gather(iy1, ix0)
    v11 = gather(iy1, ix1)

    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    # blend in the grid's (f32) precision, return in the image dtype: keeps
    # sub-pixel weights exact under bf16 AMP without promoting the sampled
    # activations (and the rest of the network) to f32.  Identity for f32 x.
    return (top * (1 - fy) + bot * fy).astype(x.dtype)


def affine_grid(theta: jax.Array, size, align_corners: bool = False) -> jax.Array:
    """torch.F.affine_grid parity: theta (B, 2, 3) → grid (B, H, W, 2)."""
    b, h, w = size[0], size[1], size[2]
    if align_corners:
        xs = jnp.linspace(-1.0, 1.0, w)
        ys = jnp.linspace(-1.0, 1.0, h)
    else:
        xs = (jnp.arange(w) * 2 + 1) / w - 1.0
        ys = (jnp.arange(h) * 2 + 1) / h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)  # (H, W, 3)
    out = jnp.einsum("bij,hwj->bhwi", theta, base)  # (B, H, W, 2)
    return out
