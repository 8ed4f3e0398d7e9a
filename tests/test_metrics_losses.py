"""PSNR/SSIM and loss parity vs the reference formulas (oracled in torch)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from dpmn_tpu.utils import metrics
from dpmn_tpu import losses


def _torch_ssim(img1, img2, window_size=11):
    """Reference utils/ssim_psnr.py:16-48 re-stated as the oracle."""
    from math import exp

    def gaussian(ws, sigma):
        g = torch.Tensor([exp(-((x - ws // 2) ** 2) / float(2 * sigma**2)) for x in range(ws)])
        return g / g.sum()

    channel = img1.size(1)
    _1d = gaussian(window_size, 1.5).unsqueeze(1)
    _2d = _1d.mm(_1d.t()).float().unsqueeze(0).unsqueeze(0)
    window = _2d.expand(channel, 1, window_size, window_size).contiguous()
    mu1 = F.conv2d(img1, window, padding=window_size // 2, groups=channel)
    mu2 = F.conv2d(img2, window, padding=window_size // 2, groups=channel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = F.conv2d(img1 * img1, window, padding=window_size // 2, groups=channel) - mu1_sq
    sigma2_sq = F.conv2d(img2 * img2, window, padding=window_size // 2, groups=channel) - mu2_sq
    sigma12 = F.conv2d(img1 * img2, window, padding=window_size // 2, groups=channel) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return ssim_map.mean()


def test_psnr_parity():
    rng = np.random.RandomState(0)
    a = rng.rand(2, 32, 128, 4).astype(np.float32)
    b = rng.rand(2, 32, 128, 4).astype(np.float32)
    ours = float(metrics.psnr(jnp.asarray(a), jnp.asarray(b)))
    ta = torch.from_numpy(a).permute(0, 3, 1, 2)
    tb = torch.from_numpy(b).permute(0, 3, 1, 2)
    mse = ((ta[:, :3] * 255 - tb[:, :3] * 255) ** 2).mean()
    theirs = float(20 * torch.log10(255.0 / torch.sqrt(mse)))
    assert abs(ours - theirs) < 1e-3


def test_ssim_parity():
    rng = np.random.RandomState(1)
    a = rng.rand(2, 32, 128, 3).astype(np.float32)
    b = np.clip(a + rng.randn(2, 32, 128, 3).astype(np.float32) * 0.05, 0, 1)
    ours = float(metrics.ssim(jnp.asarray(a), jnp.asarray(b)))
    theirs = float(
        _torch_ssim(torch.from_numpy(a).permute(0, 3, 1, 2), torch.from_numpy(b).permute(0, 3, 1, 2))
    )
    assert abs(ours - theirs) < 2e-4


def test_gradient_map_parity():
    rng = np.random.RandomState(2)
    x = rng.rand(2, 8, 12, 3).astype(np.float32)
    ours = np.asarray(losses.gradient_map(jnp.asarray(x)))

    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    _, _, h_x, w_x = t.size()
    r = F.pad(t, (0, 1, 0, 0))[:, :, :, 1:]
    l = F.pad(t, (1, 0, 0, 0))[:, :, :, :w_x]
    tt = F.pad(t, (0, 0, 1, 0))[:, :, :h_x, :]
    bb = F.pad(t, (0, 0, 0, 1))[:, :, 1:, :]
    xgrad = torch.pow(torch.pow((r - l) * 0.5, 2) + torch.pow((tt - bb) * 0.5, 2) + 1e-6, 0.5)
    np.testing.assert_allclose(ours, xgrad.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-6)


def test_image_loss_values():
    rng = np.random.RandomState(3)
    a = rng.rand(2, 16, 32, 3).astype(np.float32)
    b = rng.rand(2, 16, 32, 3).astype(np.float32)
    plain = float(losses.image_loss(jnp.asarray(a), jnp.asarray(b), gradient=False))
    assert abs(plain - float(((a - b) ** 2).mean())) < 1e-6
    withg = float(losses.image_loss(jnp.asarray(a), jnp.asarray(b), gradient=True))
    assert withg > plain


def test_str_filt_and_codecs():
    from dpmn_tpu.utils import labels

    assert labels.str_filt("AbC-12!", "lower") == "abc12"
    assert labels.str_filt("AbC12", "upper") == "AbC12"
    conv = labels.CTCLabelConverter()
    ids, lens = conv.encode(["ab1", "cz"])
    assert list(lens) == [3, 2]
    assert conv.decode(ids, lens) == ["ab1", "cz"]
    # collapse repeats + blanks
    assert conv.decode_single([1, 1, 0, 1, 2]) == "001"  # alphabet starts with digits
    vl = labels.VisionLANConverter()
    enc = vl.encode(["ab"])
    assert enc.shape == (1, 3)
    texts, probs = vl.convert(np.random.rand(2, 37).astype(np.float32), np.array([2]))
    assert probs.shape == (1, 25, 37)
