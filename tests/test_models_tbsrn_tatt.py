"""Shape/jit tests for TBSRN and TATT PSNs."""

import jax
import jax.numpy as jnp
import numpy as np

from dpmn_tpu.models import TBSRN, TSRN_TL_TRANS


def test_tbsrn_shapes():
    model = TBSRN(mask=False, srb_nums=2, hidden_units=32)
    x = jnp.zeros((2, 16, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(vars_, x, train=False)
    assert y.shape == (2, 32, 128, 3)


def test_positional_encoding_2d_matches_torch():
    import torch
    import math as m

    from dpmn_tpu.models.tbsrn import positional_encoding_2d

    d_model, height, width = 64, 16, 64
    pe = torch.zeros(d_model, height, width)
    dm = int(d_model / 2)
    div_term = torch.exp(torch.arange(0.0, dm, 2) * -(m.log(10000.0) / dm))
    pos_w = torch.arange(0.0, width).unsqueeze(1)
    pos_h = torch.arange(0.0, height).unsqueeze(1)
    pe[0:dm:2, :, :] = torch.sin(pos_w * div_term).transpose(0, 1).unsqueeze(1).repeat(1, height, 1)
    pe[1:dm:2, :, :] = torch.cos(pos_w * div_term).transpose(0, 1).unsqueeze(1).repeat(1, height, 1)
    pe[dm::2, :, :] = torch.sin(pos_h * div_term).transpose(0, 1).unsqueeze(2).repeat(1, 1, width)
    pe[dm + 1 :: 2, :, :] = torch.cos(pos_h * div_term).transpose(0, 1).unsqueeze(2).repeat(1, 1, width)
    ours = positional_encoding_2d(d_model, height, width)
    np.testing.assert_allclose(ours, pe.permute(1, 2, 0).numpy(), rtol=1e-5, atol=1e-6)


def test_tatt_shapes():
    model = TSRN_TL_TRANS(mask=True, srb_nums=2, hidden_units=32)
    x = jnp.zeros((2, 16, 64, 4))
    emb = jnp.zeros((2, 1, 26, 37))
    vars_ = model.init(jax.random.PRNGKey(0), x, emb, train=False)
    y, w = model.apply(vars_, x, emb, train=False)
    assert y.shape == (2, 32, 128, 4)
    assert w.shape == (2, 16 * 64, 26)  # cross-attn weights image-tokens x text-tokens


def test_tatt_faithful_batch_order_dependence():
    """The gru_encoding batch-axis recurrence makes sample outputs depend on
    their batch position (reference transformer_v2.py:215-221); the corrected
    mode must not."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 64, 4).astype(np.float32))
    emb = jnp.asarray(rng.rand(2, 1, 26, 37).astype(np.float32))

    def outputs(faithful):
        # out_text_channels must equal 2*hidden_units (the reference hardcodes
        # 64 = 2*32; its fc_feature_in adapter is dead code)
        model = TSRN_TL_TRANS(mask=True, srb_nums=1, hidden_units=8, out_text_channels=16, faithful=faithful)
        vars_ = model.init(jax.random.PRNGKey(0), x, emb, train=False)
        y_fwd, _ = model.apply(vars_, x, emb, train=False)
        y_rev, _ = model.apply(vars_, x[::-1], emb[::-1], train=False)
        return np.asarray(y_fwd), np.asarray(y_rev)[::-1]

    y1, y2 = outputs(faithful=False)
    np.testing.assert_allclose(y1, y2, atol=2e-5)  # corrected: order-invariant
    z1, z2 = outputs(faithful=True)
    assert np.abs(z1 - z2).max() > 1e-4  # faithful: order-dependent (quirk)
