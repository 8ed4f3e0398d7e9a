"""Numerical parity of dpmn_tpu ops against torch reference semantics.

torch (CPU) is only used inside the tests as an oracle; the framework itself
never imports it.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dpmn_tpu import ops

RTOL, ATOL = 1e-4, 1e-5


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def to_nhwc(t_nchw):
    return t_nchw.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("mode,align", [("bicubic", False), ("bilinear", False), ("bilinear", True), ("bicubic", True)])
@pytest.mark.parametrize("size", [(32, 100), (16, 64), (64, 256)])
def test_resize_matches_torch(mode, align, size):
    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 128, 3).astype(np.float32)
    ours = ops.resize(jnp.asarray(x), size, mode=mode, align_corners=align)
    theirs = F.interpolate(nchw(x), size, mode=mode, align_corners=align)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("align", [False, True])
def test_grid_sample_matches_torch(align):
    rng = np.random.RandomState(1)
    x = rng.rand(2, 16, 64, 3).astype(np.float32)
    grid = (rng.rand(2, 20, 30, 2).astype(np.float32) * 2.4) - 1.2  # includes OOB
    ours = ops.grid_sample(jnp.asarray(x), jnp.asarray(grid), align_corners=align)
    theirs = F.grid_sample(nchw(x), torch.from_numpy(grid), mode="bilinear", padding_mode="zeros", align_corners=align)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), rtol=RTOL, atol=ATOL)


def test_affine_grid_matches_torch():
    rng = np.random.RandomState(2)
    theta = rng.rand(3, 2, 3).astype(np.float32)
    ours = ops.affine_grid(jnp.asarray(theta), (3, 10, 20), align_corners=False)
    theirs = F.affine_grid(torch.from_numpy(theta), (3, 3, 10, 20), align_corners=False)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=RTOL, atol=ATOL)


def test_pixel_shuffle_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.rand(2, 4, 6, 16).astype(np.float32)  # C=16, r=2 -> C_out=4
    ours = ops.pixel_shuffle(jnp.asarray(x), 2)
    theirs = F.pixel_shuffle(nchw(x), 2)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("stride,padding,k", [(2, 1, 4), (1, 1, 3), (2, 1, 3)])
def test_conv_transpose_matches_torch(stride, padding, k):
    rng = np.random.RandomState(4)
    x = rng.rand(2, 8, 12, 5).astype(np.float32)
    w = rng.rand(5, 7, k, k).astype(np.float32) * 0.2  # torch layout (in, out, kh, kw)
    theirs = F.conv_transpose2d(nchw(x), torch.from_numpy(w), stride=stride, padding=padding)
    # ours: kernel (kh, kw, out, in)
    w_j = jnp.asarray(w.transpose(2, 3, 1, 0))
    ours = ops.conv_transpose_2d(jnp.asarray(x), w_j, stride=stride, padding=padding)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs), rtol=1e-3, atol=1e-4)


def test_bigru_matches_torch():
    rng = np.random.RandomState(5)
    B, T, I, H = 3, 11, 10, 8  # noqa: E741
    x = rng.rand(B, T, I).astype(np.float32)
    gru = torch.nn.GRU(I, H // 2, bidirectional=True, batch_first=True)
    with torch.no_grad():
        out_t, _ = gru(torch.from_numpy(x))

    model = ops.BiGRU(features=H)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # port torch weights: weight_ih_l0 (3h, I) -> w_ih_fw (I, 3h)
    sd = gru.state_dict()
    params = {
        "params": {
            "w_ih_fw": jnp.asarray(sd["weight_ih_l0"].numpy().T),
            "w_hh_fw": jnp.asarray(sd["weight_hh_l0"].numpy().T),
            "b_ih_fw": jnp.asarray(sd["bias_ih_l0"].numpy()),
            "b_hh_fw": jnp.asarray(sd["bias_hh_l0"].numpy()),
            "w_ih_bw": jnp.asarray(sd["weight_ih_l0_reverse"].numpy().T),
            "w_hh_bw": jnp.asarray(sd["weight_hh_l0_reverse"].numpy().T),
            "b_ih_bw": jnp.asarray(sd["bias_ih_l0_reverse"].numpy()),
            "b_hh_bw": jnp.asarray(sd["bias_hh_l0_reverse"].numpy()),
        }
    }
    ours = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), out_t.numpy(), rtol=1e-4, atol=1e-5)


def test_mish_matches_torch():
    x = np.linspace(-5, 5, 101).astype(np.float32)
    ours = ops.mish(jnp.asarray(x))
    theirs = torch.from_numpy(x) * torch.tanh(F.softplus(torch.from_numpy(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=RTOL, atol=ATOL)
