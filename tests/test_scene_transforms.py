"""Lock the scene-augmentation geometry (dpmn_tpu/data/scene_transforms.py).

The module derives its affine warp from elementary-matrix composition; the
oracle here is the torchvision `_get_inverse_affine_matrix` closed form that
the reference uses (model/VisionLAN/data/transforms.py:55-108 pastes it).
The two must agree to float precision for all angles/shears/scales.
"""

import math
import random

import numpy as np
import pytest
from PIL import Image

from dpmn_tpu.data import scene_transforms as st


def torchvision_inverse_affine(center, angle, translate, scale, shear):
    """The torchvision closed form (the reference's pasted oracle)."""
    if isinstance(shear, (int, float)):
        shear = [shear, 0]
    rot = math.radians(angle)
    sx, sy = (math.radians(s) for s in shear)
    cx, cy = center
    tx, ty = translate
    a = math.cos(rot - sy) / math.cos(sy)
    b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
    c = math.sin(rot - sy) / math.cos(sy)
    d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)
    m = [d, -b, 0.0, -c, a, 0.0]
    m = [x / scale for x in m]
    m[2] += m[0] * (-cx - tx) + m[1] * (-cy - ty)
    m[5] += m[3] * (-cx - tx) + m[4] * (-cy - ty)
    m[2] += cx
    m[5] += cy
    return np.array(m).reshape(2, 3)


def test_inverse_affine_matches_torchvision_closed_form():
    rng = np.random.RandomState(0)
    for _ in range(500):
        center = tuple(rng.uniform(-64, 64, 2))
        angle = rng.uniform(-180, 180)
        translate = tuple(rng.uniform(-32, 32, 2))
        scale = rng.uniform(0.2, 3.0)
        shear = list(rng.uniform(-44, 44, 2))
        ours = st.CVRandomAffine._inverse_affine_matrix(center, angle, translate, scale, shear)
        ref = torchvision_inverse_affine(center, angle, translate, scale, shear)
        np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-9)


def test_inverse_affine_scalar_shear():
    ours = st.CVRandomAffine._inverse_affine_matrix((8.0, 4.0), 25.0, (1.0, -2.0), 1.5, 10.0)
    ref = torchvision_inverse_affine((8.0, 4.0), 25.0, (1.0, -2.0), 1.5, 10.0)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-9)


def test_forward_rss_unit_determinant():
    rng = np.random.RandomState(1)
    for _ in range(100):
        rss = st.CVRandomAffine._forward_rss(rng.uniform(-180, 180), list(rng.uniform(-44, 44, 2)))
        assert abs(np.linalg.det(rss) - 1.0) < 1e-12


def test_inverse_affine_roundtrips_points():
    """dst→src composed with the forward map is the identity."""
    center, angle, scale, shear = (10.0, 6.0), 33.0, 1.7, [21.0, -9.0]
    rss = st.CVRandomAffine._forward_rss(angle, shear)
    m = st.CVRandomAffine._inverse_affine_matrix(center, angle, (0.0, 0.0), scale, shear)
    rng = np.random.RandomState(2)
    pts = rng.uniform(-20, 40, (50, 2))
    dst = (scale * (rss @ (pts - center).T)).T + center
    src = (m[:, :2] @ dst.T).T + m[:, 2]
    np.testing.assert_allclose(src, pts, atol=1e-9)


@pytest.mark.parametrize("cls,kw", [
    ("CVRandomRotation", dict(degrees=45)),
    ("CVRandomAffine", dict(degrees=45, translate=(0.3, 0.3), scale=(0.5, 2.0), shear=(45, 15))),
    ("CVRandomPerspective", dict(distortion=0.5)),
    ("CVRescale", dict(factor=4)),
    ("CVGaussianNoise", dict(var=20)),
    ("CVMotionBlur", dict(degrees=12, angle=90)),
])
def test_transform_produces_valid_uint8(cls, kw):
    random.seed(3)
    np.random.seed(3)
    t = getattr(st, cls)(**kw)
    img = (np.random.RandomState(4).rand(37, 101, 3) * 255).astype(np.uint8)
    out = t(img)
    assert out.dtype == np.uint8
    assert out.ndim == 3 and out.shape[2] == 3
    assert out.shape[0] > 0 and out.shape[1] > 0


def test_bank_draws_at_construction_and_runs():
    """The CVGeometry/CVDeterioration instances fix their sub-transform at
    construction (reference quirk, transforms.py:282-305) and the full bank
    maps PIL→PIL."""
    random.seed(5)
    np.random.seed(5)
    bank = st.train_augment_bank()
    geo = bank.ts[0]
    chosen = type(geo.transforms)
    img = Image.fromarray((np.random.RandomState(6).rand(31, 97, 3) * 255).astype(np.uint8))
    for _ in range(5):
        out = bank(img)
        assert isinstance(out, Image.Image)
        assert type(geo.transforms) is chosen
