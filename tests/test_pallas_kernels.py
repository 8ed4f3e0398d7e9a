"""Pallas kernels vs jnp references (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from dpmn_tpu.ops.gru import BiGRU, _gru_scan
from dpmn_tpu.ops.pallas_kernels import pallas_bigru, pallas_gru_scan, pallas_window_attention


def test_pallas_gru_scan_matches_reference():
    rng = np.random.RandomState(0)
    n, t, h = 12, 7, 8
    x_proj = jnp.asarray(rng.randn(n, t, 3 * h).astype(np.float32) * 0.3)
    w_hh = jnp.asarray(rng.randn(h, 3 * h).astype(np.float32) * 0.3)
    b_hh = jnp.asarray(rng.randn(3 * h).astype(np.float32) * 0.1)
    ref = _gru_scan(x_proj, w_hh, b_hh, reverse=False)
    out = pallas_gru_scan(x_proj, w_hh, b_hh, tile_n=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
    # reverse
    ref_r = _gru_scan(x_proj, w_hh, b_hh, reverse=True)
    out_r = pallas_gru_scan(x_proj, w_hh, b_hh, reverse=True, tile_n=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref_r), rtol=1e-5, atol=1e-6)


def test_pallas_bigru_matches_module():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 9, 10).astype(np.float32) * 0.3)
    module = BiGRU(features=12)
    variables = module.init(jax.random.PRNGKey(0), x)
    ref = module.apply(variables, x)
    out = pallas_bigru(x, variables["params"], tile_n=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_pallas_window_attention_matches_reference():
    rng = np.random.RandomState(2)
    w, n, c = 10, 16, 8
    q = jnp.asarray(rng.randn(w, n, c).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.randn(w, n, c).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.randn(w, n, c).astype(np.float32) * 0.5)
    bias = jnp.asarray(rng.randn(w, n, n).astype(np.float32) * 0.1)

    scores = jnp.einsum("wnc,wmc->wnm", q, k) + bias
    ref = jnp.einsum("wnm,wmc->wnc", jax.nn.softmax(scores, -1), v)
    out = pallas_window_attention(q, k, v, bias, tile_w=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)
