"""Oracle tests for dpmn_tpu/data/image_utils.py vs the ACTUAL reference
utils/utils_image.py (imported via the bridge)."""

import numpy as np
import pytest

from dpmn_tpu.data import image_utils as iu

from reference_bridge import import_reference_module


@pytest.fixture(scope="module")
def ref():
    if not hasattr(np, "int"):  # numpy 2 dropped the np.int alias the reference uses
        np.int = int
    return import_reference_module("utils.utils_image")


def test_converters(ref):
    rng = np.random.RandomState(0)
    u8 = (rng.rand(7, 9, 3) * 255).astype(np.uint8)
    f = rng.rand(7, 9, 3).astype(np.float32)
    np.testing.assert_allclose(iu.uint2single(u8), ref.uint2single(u8), atol=0)
    np.testing.assert_allclose(iu.single2uint(f), ref.single2uint(f), atol=0)
    u16 = (rng.rand(5, 5) * 65535).astype(np.uint16)
    np.testing.assert_allclose(iu.uint162single(u16), ref.uint162single(u16), atol=0)
    np.testing.assert_allclose(iu.single2uint16(f), ref.single2uint16(f), atol=0)


def test_augment_modes(ref):
    rng = np.random.RandomState(1)
    img = rng.rand(6, 8, 3)
    for mode in range(8):
        np.testing.assert_allclose(iu.augment_img(img, mode), ref.augment_img(img, mode), atol=0)
        np.testing.assert_allclose(iu.augment_img_np3(img, mode), ref.augment_img_np3(img, mode), atol=0)


def test_modcrop_shave(ref):
    rng = np.random.RandomState(2)
    img = rng.rand(13, 17, 3)
    np.testing.assert_allclose(iu.modcrop(img, 4), ref.modcrop(img, 4), atol=0)
    np.testing.assert_allclose(iu.shave(img, 3), ref.shave(img, 3), atol=0)
    gray = rng.rand(13, 17)
    np.testing.assert_allclose(iu.modcrop(gray, 5), ref.modcrop(gray, 5), atol=0)


def test_ycbcr_round_and_float(ref):
    rng = np.random.RandomState(3)
    u8 = (rng.rand(8, 10, 3) * 255).astype(np.uint8)
    f = rng.rand(8, 10, 3)  # float64; reference mutates, so pass copies
    for only_y in (True, False):
        np.testing.assert_allclose(iu.rgb2ycbcr(u8, only_y), ref.rgb2ycbcr(u8.copy(), only_y), atol=0)
        np.testing.assert_allclose(iu.rgb2ycbcr(f, only_y), ref.rgb2ycbcr(f.copy(), only_y), atol=1e-12)
        np.testing.assert_allclose(iu.bgr2ycbcr(u8, only_y), ref.bgr2ycbcr(u8.copy(), only_y), atol=0)
        np.testing.assert_allclose(iu.bgr2ycbcr(f, only_y), ref.bgr2ycbcr(f.copy(), only_y), atol=1e-12)
    ycc = iu.rgb2ycbcr(f, only_y=False)
    np.testing.assert_allclose(iu.ycbcr2rgb(ycc), ref.ycbcr2rgb(ycc.copy()), atol=1e-12)
    # float path does not mutate our caller's array
    f2 = f.copy()
    iu.rgb2ycbcr(f2)
    np.testing.assert_allclose(f2, f, atol=0)


def test_psnr_ssim_border(ref):
    rng = np.random.RandomState(4)
    a = (rng.rand(32, 48, 3) * 255).astype(np.float64)
    b = np.clip(a + rng.randn(32, 48, 3) * 8, 0, 255)
    assert iu.calculate_psnr(a, b, border=4) == pytest.approx(ref.calculate_psnr(a, b, border=4), abs=1e-9)
    assert iu.calculate_ssim(a, b, border=4) == pytest.approx(ref.calculate_ssim(a, b, border=4), abs=1e-9)
    gray = a[:, :, 0]
    gray2 = b[:, :, 0]
    assert iu.calculate_ssim(gray, gray2) == pytest.approx(ref.calculate_ssim(gray, gray2), abs=1e-9)


def test_patches_from_image(ref):
    rng = np.random.RandomState(5)
    img = rng.rand(900, 1100, 3)
    ours = iu.patches_from_image(img, p_size=512, p_overlap=96, p_max=800)
    theirs = ref.patches_from_image(img, p_size=512, p_overlap=96, p_max=800)
    assert len(ours) == len(theirs)
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(o, t, atol=0)
    small = rng.rand(256, 900, 3)
    assert len(iu.patches_from_image(small)) == 1


def test_imresize_np_matches_reference(ref):
    rng = np.random.RandomState(6)
    img = rng.rand(32, 48, 3).astype(np.float64)
    for scale in (0.5, 1.0 / 3.0, 2.0, 1.7):
        ours = iu.imresize_np(img, scale)
        theirs = ref.imresize_np(img.copy(), scale)
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=1e-5)
    gray = rng.rand(20, 20)
    np.testing.assert_allclose(iu.imresize_np(gray, 0.5), ref.imresize_np(gray.copy(), 0.5), atol=1e-5)
    # no-antialias path
    np.testing.assert_allclose(
        iu.imresize_np(img, 0.5, antialiasing=False), ref.imresize_np(img.copy(), 0.5, antialiasing=False), atol=1e-5
    )


def test_bicubic_degradation_uses_matlab_resize(ref):
    from dpmn_tpu.data import sisr

    rng = np.random.RandomState(7)
    img = rng.rand(24, 36, 3)
    np.testing.assert_allclose(sisr.bicubic_degradation(img, sf=2), ref.imresize_np(img.copy(), 0.5), atol=1e-5)
    k = sisr.fspecial("gaussian", 5, 0.8)
    d = sisr.dpsr_degradation(img, k, sf=2)
    assert d.shape == (12, 18, 3)
