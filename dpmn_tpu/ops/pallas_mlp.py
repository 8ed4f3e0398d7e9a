"""Fused Pallas kernel for the faithful PGRM Mlp conv pair.

The reference Mlp views its (B, HW, hidden) activation as (B, hidden, s, s)
in C-order (model/pgrm.py:33-38) and runs a depthwise 3x3 + pointwise 1x1.
In XLA every exact formulation materializes (B, hidden, 32, 32) layout
copies (~6 ms/forward, see ROADMAP.md).  Here the view is free: per batch
element the kernel keeps the (hidden, s, s) tensor in VMEM, computes the
depthwise conv as 9 shifted multiply-adds on the VPU (minor-dim shifts are
lane moves), applies gelu, and runs the pointwise channel mix as one MXU
matmul over the (hidden, s*s) layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_mlp_convs(x: jax.Array, dw_kernel, dw_bias, pw_kernel, pw_bias, s: int,
                    interpret: bool = False) -> jax.Array:
    """x: (B, HW, hidden) → gelu-depthwise→pointwise output, same shape.

    dw_kernel (3,3,1,hidden), pw_kernel (1,1,hidden,hidden) in HWIO.
    """
    b, hw, hidden = x.shape
    # weights reorganized for the in-kernel layout
    dwk = jnp.transpose(dw_kernel[:, :, 0, :], (2, 0, 1))  # (hidden, 3, 3)
    pwk = pw_kernel[0, 0]  # (hidden_in, hidden_out)

    def kernel(x_ref, dwk_ref, dwb_ref, pwk_ref, pwb_ref, out_ref):
        t = x_ref[0].reshape(hidden, s, s)  # quirk C-order view, free
        acc = jnp.zeros((hidden, s, s), jnp.float32)
        for di in range(3):
            for dj in range(3):
                # shift the (s, s) minor dims; zero-pad borders via masks
                shifted = t
                if di != 1:
                    shifted = jnp.roll(shifted, 1 - di, axis=1)
                if dj != 1:
                    shifted = jnp.roll(shifted, 1 - dj, axis=2)
                wgt = dwk_ref[:, di, dj][:, None, None]
                rows = jax.lax.broadcasted_iota(jnp.int32, (hidden, s, s), 1)
                cols = jax.lax.broadcasted_iota(jnp.int32, (hidden, s, s), 2)
                # zero-pad semantics: sample (y+di-1, x+dj-1) must be in-range
                valid = jnp.ones((hidden, s, s), jnp.bool_)
                if di == 0:
                    valid = valid & (rows > 0)
                elif di == 2:
                    valid = valid & (rows < s - 1)
                if dj == 0:
                    valid = valid & (cols > 0)
                elif dj == 2:
                    valid = valid & (cols < s - 1)
                acc = acc + jnp.where(valid, shifted * wgt, 0.0)
        acc = acc + dwb_ref[:][:, None, None]
        # exact-gelu via an Abramowitz-Stegun 7.1.26 erf (max err 1.5e-7,
        # below fp32 resolution here; Pallas lowers neither erf nor erfc)
        z = acc * (2.0**-0.5)
        az = jnp.abs(z)
        t = 1.0 / (1.0 + 0.3275911 * az)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))))
        erf_abs = 1.0 - poly * jnp.exp(-az * az)
        erf = jnp.sign(z) * erf_abs
        acc = 0.5 * acc * (1.0 + erf)
        # pointwise channel mix over the quirk channel axis: (out, in) @ (in, s*s)
        flat = acc.reshape(hidden, s * s)
        mixed = jax.lax.dot_general(
            pwk_ref[:].T, flat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (hidden_out, s*s)
        mixed = mixed + pwb_ref[:][:, None]
        # C-order reinterpret of the (hidden, s*s) buffer as (HW, hidden) —
        # exactly the torch x.view(B, HW, -1) on the conv output
        out_ref[0] = mixed.reshape(hw, hidden)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, hidden), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(dwk.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(dw_bias.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(pwk.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(pw_bias.shape, lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, hidden), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, hidden), x.dtype),
        interpret=interpret,
    )(x, dwk, dw_bias, pwk, pw_bias)
