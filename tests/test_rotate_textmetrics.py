"""Rotation augmentation parity + text metric checks."""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dpmn_tpu.ops.rotate import rotate_images
from dpmn_tpu.utils.text_metrics import AttentionARCounter, AverageMeter, edit_distance


def test_rotate_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.rand(3, 16, 64, 3).astype(np.float32)
    arc = (rng.rand(3).astype(np.float32) - 0.5) * 0.4
    offs = rng.rand(3).astype(np.float32)

    ours = np.asarray(rotate_images(jnp.asarray(x), jnp.asarray(arc), jnp.asarray(offs)))

    # torch oracle (utils/util.py:37-58)
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    arc_t = torch.from_numpy(arc)
    ratios = 16 / 64.0
    ratios_mul = ratios + (torch.from_numpy(offs).unsqueeze(1) * 0.4) - 0.2
    a11, a12, a21, a22 = torch.cos(arc_t), torch.sin(arc_t), -torch.sin(arc_t), torch.cos(arc_t)
    zero = torch.zeros_like(arc_t)
    mat = torch.cat(
        [a11.unsqueeze(1), a12.unsqueeze(1) * ratios_mul, zero.unsqueeze(1),
         a21.unsqueeze(1) / ratios_mul, a22.unsqueeze(1), zero.unsqueeze(1)], dim=1
    ).reshape(3, 2, 3)
    grid = F.affine_grid(mat, t.shape, align_corners=False)
    theirs = F.grid_sample(t, grid, align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("", "abc") == 3
    assert edit_distance("same", "same") == 0
    assert edit_distance([1, 2, 3], [1, 3]) == 1


def test_ar_counter():
    c = AttentionARCounter("t")
    c.add_iter(["hello", "wrld"], ["hello", "world"])
    m = c.metrics()
    assert m["accuracy"] == 0.5
    assert 0 < m["CER"] < 1


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
