"""Small torch-compatible NN primitives used across the model zoo."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def conv_transpose_2d(
    x: jax.Array,
    kernel: jax.Array,
    stride=(1, 1),
    padding=(0, 0),
    dilation=(1, 1),
) -> jax.Array:
    """torch.nn.ConvTranspose2d forward, NHWC.

    kernel layout (kh, kw, out_c, in_c) — the spatially-flipped conv view.
    Output size = (H-1)*s - 2p + d*(k-1) + 1, matching torch.  Used by the
    CMM decoder (model/cmm.py:58-77,108-118) and InfoGen (model/tsrn.py:281-308).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    kh, kw = kernel.shape[0], kernel.shape[1]
    pad_h = dilation[0] * (kh - 1) - padding[0]
    pad_w = dilation[1] * (kw - 1) - padding[1]
    flipped = kernel[::-1, ::-1].astype(x.dtype)  # flip spatial dims: transpose conv = conv with flipped kernel
    return jax.lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1, 1),
        padding=[(pad_h, pad_h), (pad_w, pad_w)],
        lhs_dilation=stride,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWOI", "NHWC"),
    )


class ConvTranspose2dTorch(nn.Module):
    """ConvTranspose2d module with torch-compatible geometry and init."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: tuple = (0, 0)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        kh, kw = self.kernel_size
        # torch init: uniform(-sqrt(k), sqrt(k)), k = 1/(in_c * kh * kw)
        k = 1.0 / (in_c * kh * kw) ** 0.5

        def u_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -k, k)

        kernel = self.param("kernel", u_init, (kh, kw, self.features, in_c))
        y = conv_transpose_2d(x, kernel, self.strides, self.padding)
        if self.use_bias:
            bias = self.param("bias", u_init, (self.features,))
            y = y + bias
        return y


def mish(x: jax.Array) -> jax.Array:
    """x * tanh(softplus(x)) — reference model/tsrn.py:121-129."""
    return x * jnp.tanh(jax.nn.softplus(x))


class PReLU(nn.Module):
    """torch.nn.PReLU default: one learnable slope shared over channels."""

    init_value: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("a", nn.initializers.constant(self.init_value), (1,))
        return jnp.where(x >= 0, x, a * x)


class BatchNorm(nn.BatchNorm):
    """flax BatchNorm pinned to torch defaults (momentum 0.1 → flax 0.9)."""

    use_running_average: bool = None
    momentum: float = 0.9
    epsilon: float = 1e-5


def adaptive_avg_pool_1x1(x: jax.Array) -> jax.Array:
    """AdaptiveAvgPool2d((1,1)) on NHWC → (B, 1, 1, C)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)
