"""PixelShuffle for NHWC tensors with torch channel ordering.

torch semantics (used by the reference at model/tsrn.py:104-118 and
model/pgrm.py:521): out[b, c, h*r+i, w*r+j] = in[b, c*r*r + i*r + j, h, w].
Keeping the exact channel ordering matters for weight ports of the conv
layers that feed the shuffle.
"""

import jax
import jax.numpy as jnp


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    b, h, w, c = x.shape
    assert c % (r * r) == 0, f"channels {c} not divisible by r^2={r * r}"
    c_out = c // (r * r)
    x = x.reshape(b, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H, r, W, r, C)
    return x.reshape(b, h * r, w * r, c_out)
