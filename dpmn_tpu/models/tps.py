"""Thin-plate-spline spatial transformer.

Parity: reference model/tps_spatial_transformer.py:22-112.  The TPS kernel
matrix and target-coordinate representation depend only on static hyper-
parameters, so they are precomputed on host in float64 (the inverse of the
(N+3, N+3) kernel is numerically touchy) and baked into the jitted graph as
constants; the per-batch work is two small matmuls + one grid_sample.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample


def _partial_repr(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """phi(x1,x2) = 0.5 * r^2 * log(r^2), 0 at r=0 (reference :22-34)."""
    diff = a[:, None, :] - b[None, :, :]
    dist = (diff**2).sum(-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        rep = 0.5 * dist * np.log(dist)
    rep[~np.isfinite(rep)] = 0.0
    return rep


def build_output_control_points(num_control_points: int, margins) -> np.ndarray:
    margin_x, margin_y = margins
    n_side = num_control_points // 2
    xs = np.linspace(margin_x, 1.0 - margin_x, n_side)
    top = np.stack([xs, np.full(n_side, margin_y)], axis=1)
    bottom = np.stack([xs, np.full(n_side, 1.0 - margin_y)], axis=1)
    return np.concatenate([top, bottom], axis=0)


@functools.lru_cache(maxsize=16)
def _tps_constants(target_height: int, target_width: int, num_control_points: int, margins):
    ctrl = build_output_control_points(num_control_points, margins)  # (N, 2)
    n = num_control_points
    fk = np.zeros((n + 3, n + 3))
    fk[:n, :n] = _partial_repr(ctrl, ctrl)
    fk[:n, -3] = 1.0
    fk[-3, :n] = 1.0
    fk[:n, -2:] = ctrl
    fk[-2:, :n] = ctrl.T
    inverse_kernel = np.linalg.inv(fk)

    hw = target_height * target_width
    yy, xx = np.meshgrid(np.arange(target_height), np.arange(target_width), indexing="ij")
    coord = np.stack(
        [xx.reshape(-1) / (target_width - 1), yy.reshape(-1) / (target_height - 1)], axis=1
    )  # (HW, 2) in (x, y)
    repr_mat = np.concatenate([_partial_repr(coord, ctrl), np.ones((hw, 1)), coord], axis=1)  # (HW, N+3)
    return (
        inverse_kernel.astype(np.float32),
        repr_mat.astype(np.float32),
        ctrl.astype(np.float32),
    )


class TPSSpatialTransformer:
    """Functional TPS warp; no learnable parameters."""

    def __init__(self, output_image_size, num_control_points=20, margins=(0.05, 0.05)):
        self.target_height, self.target_width = output_image_size
        self.num_control_points = num_control_points
        inv_k, repr_mat, ctrl = _tps_constants(
            self.target_height, self.target_width, num_control_points, tuple(margins)
        )
        self.inverse_kernel = jnp.asarray(inv_k)
        self.target_coordinate_repr = jnp.asarray(repr_mat)
        self.target_control_points = jnp.asarray(ctrl)

    def __call__(self, x: jax.Array, source_control_points: jax.Array):
        """x: NHWC; source_control_points: (B, N, 2) in [0,1] image coords."""
        b = source_control_points.shape[0]
        pad = jnp.zeros((b, 3, 2), source_control_points.dtype)
        y = jnp.concatenate([source_control_points, pad], axis=1)  # (B, N+3, 2)
        mapping = jnp.einsum("ij,bjk->bik", self.inverse_kernel, y)  # (B, N+3, 2)
        source_coordinate = jnp.einsum("hj,bjk->bhk", self.target_coordinate_repr, mapping)  # (B, HW, 2)
        grid = source_coordinate.reshape(b, self.target_height, self.target_width, 2)
        grid = jnp.clip(grid, 0.0, 1.0) * 2.0 - 1.0
        out = grid_sample(x, grid, align_corners=False)
        return out, source_coordinate
