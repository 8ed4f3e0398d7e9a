"""Oracle tests for dpmn_tpu/data/sisr.py vs the ACTUAL reference modules
(utils/utils_deblur.py, utils/utils_sisr.py), imported via the bridge."""

import numpy as np
import pytest
from scipy import ndimage

from dpmn_tpu.data import sisr

from reference_bridge import import_reference_module


@pytest.fixture(scope="module")
def ref_deblur():
    if not hasattr(np, "alltrue"):  # numpy 2 dropped the alias the reference uses
        np.alltrue = np.all
    mod = import_reference_module("utils.utils_deblur")
    return mod


@pytest.fixture(scope="module")
def ref_sisr():
    mod = import_reference_module("utils.utils_sisr")
    # modern scipy dropped ndimage.filters; alias it for the reference code
    if not hasattr(mod.ndimage, "filters"):
        mod.ndimage.filters = ndimage
    return mod


def test_fspecial_bank(ref_deblur):
    np.testing.assert_allclose(sisr.fspecial("gaussian", 7, 1.3), ref_deblur.fspecial("gaussian", 7, 1.3), atol=1e-12)
    np.testing.assert_allclose(sisr.fspecial("average", 5), ref_deblur.fspecial("average", 5), atol=1e-12)
    np.testing.assert_allclose(sisr.fspecial("laplacian", 0.3), ref_deblur.fspecial("laplacian", 0.3), atol=1e-12)
    np.testing.assert_allclose(sisr.fspecial("prewitt"), ref_deblur.fspecial("prewitt"), atol=0)
    np.testing.assert_allclose(sisr.fspecial("sobel"), ref_deblur.fspecial("sobel"), atol=0)
    np.testing.assert_allclose(sisr.fspecial_gauss(5, 1.1), ref_deblur.fspecial_gauss(5, 1.1), atol=1e-12)


def test_fspecial_extras_implemented():
    # the reference stubs disk/log/motion with NotImplemented; ours are real
    d = sisr.fspecial("disk", 4.5)
    assert d.shape == (9, 9) and abs(d.sum() - 1) < 1e-9
    log = sisr.fspecial("log", 7, 0.8)
    assert abs(log.sum()) < 1e-9  # LoG sums to ~0
    m = sisr.fspecial("motion", 9, 30.0)
    assert abs(m.sum() - 1) < 1e-9 and m.ndim == 2


def test_psf2otf_otf2psf_roundtrip(ref_deblur):
    rng = np.random.RandomState(0)
    psf = rng.rand(5, 7)
    np.testing.assert_allclose(sisr.psf2otf(psf, (16, 20)), ref_deblur.psf2otf(psf, (16, 20)), atol=1e-10)
    np.testing.assert_allclose(sisr.zero_pad(psf, (9, 9)), ref_deblur.zero_pad(psf, (9, 9)), atol=0)
    otf = sisr.psf2otf(psf, (16, 20))
    back = sisr.otf2psf(otf, (5, 7))
    ref_back = ref_deblur.otf2psf(otf, (5, 7))
    np.testing.assert_allclose(back, ref_back, atol=1e-10)
    # NOTE: MATLAB's otf2psf crop window is not an exact inverse of
    # psf2otf's corner-pad for every shape combination; parity with the
    # reference (above) is the contract, identity is only approximate.
    assert np.abs(back - psf).mean() < np.abs(psf).mean()


def test_p2o_matches_psf2otf():
    rng = np.random.RandomState(1)
    psf = rng.rand(2, 3, 5, 5).astype(np.float32)
    otf = np.asarray(sisr.p2o(psf, (12, 14)))
    for n in range(2):
        for c in range(3):
            np.testing.assert_allclose(otf[n, c], sisr.psf2otf(psf[n, c], (12, 14)), atol=1e-4)


def test_wiener_upperleft_denominator(ref_deblur):
    rng = np.random.RandomState(2)
    img = rng.rand(16, 20, 3)
    k = sisr.fspecial("gaussian", 5, 1.0)
    ours_u, ours_d = sisr.wiener_upperleft_denominator(img, k)
    ref_u, ref_d = ref_deblur.get_uperleft_denominator(img, k)
    np.testing.assert_allclose(ours_u, ref_u, atol=1e-9)
    np.testing.assert_allclose(ours_d, ref_d, atol=1e-9)


def test_opt_fft_size(ref_deblur):
    n = [1, 17, 111, 255, 509, 2047, 3000]
    np.testing.assert_allclose(sisr.opt_fft_size(n), ref_deblur.opt_fft_size(n))


def test_wrap_boundary_liu(ref_deblur):
    rng = np.random.RandomState(3)
    img = rng.rand(20, 24)
    size = sisr.opt_fft_size([20 + 7, 24 + 7]).astype(int)
    ours = sisr.wrap_boundary_liu(img.copy(), size)
    ref = ref_deblur.wrap_boundary_liu(img.copy(), size)
    np.testing.assert_allclose(ours, ref, atol=1e-9)
    img3 = rng.rand(20, 24, 3)
    np.testing.assert_allclose(
        sisr.wrap_boundary_liu(img3.copy(), size), ref_deblur.wrap_boundary_liu(img3.copy(), size), atol=1e-9
    )


def test_gm_blur_and_anisotropic(ref_sisr):
    np.testing.assert_allclose(
        sisr.gm_blur_kernel([0, 0], [[3.0, 1.0], [1.0, 2.0]], 15),
        ref_sisr.gm_blur_kernel([0, 0], np.array([[3.0, 1.0], [1.0, 2.0]]), 15),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        sisr.anisotropic_gaussian(15, 0.7, 6.0, 2.0), ref_sisr.anisotropic_Gaussian(15, 0.7, 6.0, 2.0), atol=1e-12
    )


class _ScriptedRng:
    """np.random.Generator look-alike replaying a fixed draw script."""

    def __init__(self, scalars, arrays=()):
        self._s = list(scalars)
        self._a = list(arrays)

    def random(self, size=None):
        if size is None:
            return self._s.pop(0)
        return self._a.pop(0)

    def integers(self, *a, **k):  # pragma: no cover
        raise AssertionError("not scripted")


def test_shifted_anisotropic_gaussian_matches_reference(ref_sisr):
    # replay the exact np.random draw sequence the reference consumes
    np.random.seed(7)
    lam1_u, lam2_u, theta_u = np.random.rand(), np.random.rand(), np.random.rand()
    noise_arr = np.random.rand(15, 15)
    np.random.seed(7)
    ref_k = ref_sisr.shifted_anisotropic_Gaussian(
        k_size=np.array([15, 15]), scale_factor=np.array([3, 3]), min_var=0.6, max_var=10.0, noise_level=0.2
    )
    rng = _ScriptedRng([lam1_u, lam2_u, theta_u], [noise_arr])
    ours = sisr.shifted_anisotropic_gaussian(
        rng, k_size=(15, 15), scale_factor=(3, 3), min_var=0.6, max_var=10.0, noise_level=0.2
    )
    np.testing.assert_allclose(ours, ref_k, atol=1e-12)


def test_pca_matrix(ref_sisr):
    rng = np.random.RandomState(4)
    x = rng.rand(49, 200).astype(np.float32)
    ours = sisr.pca_matrix(x, dim_pca=8)
    ref = ref_sisr.get_pca_matrix(x, dim_pca=8)
    # eigenvectors are sign-ambiguous; compare projectors row-wise
    for r_ours, r_ref in zip(ours, ref):
        assert min(np.abs(r_ours - r_ref).max(), np.abs(r_ours + r_ref).max()) < 1e-4


def test_degradations_and_operators(ref_sisr):
    rng = np.random.RandomState(5)
    x = rng.rand(12, 18, 3)
    k = sisr.fspecial("gaussian", 5, 0.8)
    np.testing.assert_allclose(sisr.srmd_degradation(x, k, 2), ref_sisr.srmd_degradation(x, k, 2), atol=1e-12)
    np.testing.assert_allclose(
        sisr.classical_degradation(x, k, 2), ref_sisr.classical_degradation(x, k, 2), atol=1e-12
    )
    np.testing.assert_allclose(sisr.modcrop(x, 5), ref_sisr.modcrop_np(x, 5), atol=0)
    np.testing.assert_allclose(sisr.upsample(x, 3), ref_sisr.upsample_np(x, 3), atol=0)
    np.testing.assert_allclose(sisr.downsample(x, 3), ref_sisr.downsample_np(x, 3), atol=0)
    np.testing.assert_allclose(sisr.imfilter_circular(x, k), ref_sisr.imfilter_np(x, k), atol=1e-12)
    np.testing.assert_allclose(sisr.G(x, k, 3), ref_sisr.G_np(x, k, 3), atol=1e-12)
    np.testing.assert_allclose(sisr.Gt(x, k, 3), ref_sisr.Gt_np(x, k, 3), atol=1e-12)
    lr, y, mask = sisr.interpolation_down(x, 2)
    assert lr.shape == (6, 9, 3) and float(mask.mean()) == pytest.approx(0.25)
    np.testing.assert_allclose(y[::2, ::2], lr, atol=0)
    assert np.all(y[1::2, :] == 0)


def test_shift_pixel_linear_ramp_exact():
    # scipy dropped interp2d, so the reference path is dead; verify ours on a
    # ramp where bilinear interpolation is exact: shifting by (sf-1)/2 must
    # shift the ramp values by the same amount (away from the clipped edge).
    h, w, sf = 10, 14, 3
    ramp = np.add.outer(np.arange(h, dtype=float), np.arange(w, dtype=float))
    out = sisr.shift_pixel(ramp.copy(), sf)
    np.testing.assert_allclose(out[:-sf, :-sf], ramp[:-sf, :-sf] + (sf - 1), atol=1e-9)
    color = np.stack([ramp, 2 * ramp, -ramp], axis=2)
    out3 = sisr.shift_pixel(color.copy(), sf)
    np.testing.assert_allclose(out3[:-sf, :-sf, 1], 2 * (ramp[:-sf, :-sf] + (sf - 1)), atol=1e-9)


def test_invls_solves_degradation():
    # INVLS at tau→0 inverts y = (circular-blur + subsample) exactly for a
    # bandlimited-consistent construction: check the normal-equation residual
    rng = np.random.RandomState(6)
    sf = 2
    hr = rng.rand(16, 16, 1)
    k = sisr.fspecial("gaussian", 5, 0.7)
    y = sisr.G(hr, k, sf=sf)  # (8, 8, 1)
    tau = 1e-2
    z = rng.rand(16, 16, 1)  # prior estimate
    FB = sisr.psf2otf(k, (16, 16))[..., None]
    FBC = np.conj(FB)
    F2B = (np.abs(FB) ** 2).astype(np.complex128)
    STy = sisr.Gt(y * sf**0, k, sf=sf)
    FR = np.fft.fft2(STy, axes=(0, 1)) + tau * np.fft.fft2(z, axes=(0, 1))
    x = sisr.invls(FB, FBC, F2B, FR, tau, sf=sf)
    # x must satisfy (G^T G + tau I) x = G^T y + tau z
    lhs = sisr.Gt(sisr.G(x, k, sf=sf), k, sf=sf) + tau * x
    rhs = STy + tau * z
    np.testing.assert_allclose(lhs, rhs, atol=1e-8)


def test_blur_kernel_synthesis_properties():
    rng = np.random.default_rng(0)
    k = sisr.blur_kernel_synthesis(rng, h=25)
    assert k.shape == (25, 25)
    assert abs(k.sum() - 1) < 1e-9
    assert k.min() >= 0
    k2 = sisr.blur_kernel_synthesis(np.random.default_rng(0), h=25)
    np.testing.assert_allclose(k, k2, atol=0)  # seeded determinism


def test_gen_kernel_and_cal_pca(ref_sisr):
    rng = np.random.default_rng(1)
    k = sisr.gen_kernel(rng, k_size=(25, 25))
    assert k.shape == (25, 25) and abs(k.sum() - 1) < 1e-9
    p = sisr.cal_pca_matrix(np.random.default_rng(2), ksize=9, l_max=8.0, dim_pca=5, num_samples=40)
    assert p.shape == (5, 81)
    # rows are orthonormal eigenvectors
    np.testing.assert_allclose(p @ p.T, np.eye(5), atol=1e-5)
