"""Shape/jit tests for the PSN zoo and recognizer front-ends."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpmn_tpu.models import TSRN, TSRN_TL, CRNN, Bicubic, STNHead, TPSSpatialTransformer
from dpmn_tpu.models.crnn import parse_crnn_input


def test_tsrn_shapes():
    model = TSRN(mask=True, srb_nums=2, hidden_units=8)
    x = jnp.zeros((2, 16, 64, 4))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(vars_, x, train=False)
    assert y.shape == (2, 32, 128, 4)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh bounded

    # train mode mutates batch stats
    y2, mut = model.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert y2.shape == (2, 32, 128, 4)
    assert "batch_stats" in mut


def test_tsrn_tl_shapes():
    model = TSRN_TL(mask=False, srb_nums=2, hidden_units=8)
    x = jnp.zeros((2, 16, 64, 3))
    emb = jnp.zeros((2, 1, 26, 37))
    vars_ = model.init(jax.random.PRNGKey(0), x, emb, train=False)
    y = model.apply(vars_, x, emb, train=False)
    assert y.shape == (2, 32, 128, 3)


def test_tsrn_jit_compiles():
    model = TSRN(mask=True, srb_nums=1, hidden_units=4)
    x = jnp.zeros((2, 16, 64, 4))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    fwd = jax.jit(lambda v, t: model.apply(v, t, train=False))
    y = fwd(vars_, x)
    assert y.shape == (2, 32, 128, 4)


def test_crnn_shapes():
    model = CRNN()
    x = jnp.zeros((2, 32, 100, 1))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(vars_, x, train=False)
    assert y.shape == (26, 2, 37)


def test_parse_crnn_input():
    imgs = jnp.ones((2, 16, 64, 4)) * 0.5
    out = parse_crnn_input(imgs)
    assert out.shape == (2, 32, 100, 1)
    np.testing.assert_allclose(np.asarray(out), 0.5, rtol=1e-5)


def test_stn_head_identity_init():
    model = STNHead(num_ctrlpoints=20)
    x = jnp.ones((2, 16, 64, 4)) * 0.3
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    _, ctrl = model.apply(vars_, x, train=False)
    assert ctrl.shape == (2, 20, 2)
    # zero fc2 weight + rectangle bias → control points are the margin rectangle
    from dpmn_tpu.models.stn import init_ctrl_points

    np.testing.assert_allclose(np.asarray(ctrl[0]), init_ctrl_points(20), atol=1e-6)


def test_tps_identity_warp():
    """Warping with the target control points should approximate identity."""
    tps = TPSSpatialTransformer((16, 64), 20, (0.05, 0.05))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 64, 3).astype(np.float32))
    ctrl = jnp.broadcast_to(tps.target_control_points, (2, 20, 2))
    y, coords = tps(x, ctrl)
    assert y.shape == x.shape
    # src ctrl == target ctrl → the TPS solution is the identity map: the
    # produced source coordinates must equal the target grid coordinates.
    yy, xx = np.meshgrid(np.arange(16), np.arange(64), indexing="ij")
    expect = np.stack([xx.reshape(-1) / 63.0, yy.reshape(-1) / 15.0], axis=1)
    np.testing.assert_allclose(np.asarray(coords[0]), expect, atol=1e-4)


def test_tps_grid_matches_torch_reference_formula():
    """Oracle the TPS source grid against a float64 numpy restatement of
    tps_spatial_transformer.py:62-95."""
    import itertools

    n, h, w = 20, 8, 16
    margins = (0.05, 0.05)
    from dpmn_tpu.models.tps import build_output_control_points, _partial_repr

    ctrl = build_output_control_points(n, margins)
    fk = np.zeros((n + 3, n + 3))
    fk[:n, :n] = _partial_repr(ctrl, ctrl)
    fk[:n, -3] = 1
    fk[-3, :n] = 1
    fk[:n, -2:] = ctrl
    fk[-2:, :n] = ctrl.T
    inv = np.linalg.inv(fk)
    coord = np.array(list(itertools.product(range(h), range(w))), np.float64)
    coord = np.stack([coord[:, 1] / (w - 1), coord[:, 0] / (h - 1)], axis=1)
    rep = np.concatenate([_partial_repr(coord, ctrl), np.ones((h * w, 1)), coord], axis=1)

    src_ctrl = ctrl + 0.02 * np.random.RandomState(1).randn(n, 2)
    y = np.concatenate([src_ctrl, np.zeros((3, 2))], axis=0)
    expect = rep @ (inv @ y)

    tps = TPSSpatialTransformer((h, w), n, margins)
    x = jnp.zeros((1, h, w, 1))
    _, coords = tps(x, jnp.asarray(src_ctrl, jnp.float32)[None])
    np.testing.assert_allclose(np.asarray(coords[0]), expect, rtol=1e-3, atol=1e-4)


def test_bicubic_baseline():
    x = jnp.ones((1, 16, 64, 3)) * 0.25
    y = Bicubic(2)(x)
    assert y.shape == (1, 32, 128, 3)
    np.testing.assert_allclose(np.asarray(y), 0.25, rtol=1e-5)
