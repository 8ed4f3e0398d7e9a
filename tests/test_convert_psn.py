"""TBSRN FeatureEnhancer converter parity + TATT converter shape import."""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dpmn_tpu.convert import import_into
from dpmn_tpu.convert_psn import _mha_cloned
from dpmn_tpu.models.tbsrn import FeatureEnhancer, positional_encoding_2d


class TorchFeatureEnhancer(nn.Module):
    """tbsrn.py:63-92 oracle (eval: dropout off)."""

    def __init__(self):
        super().__init__()

        class LN(nn.Module):
            def __init__(self, features, eps=1e-6):
                super().__init__()
                self.a_2 = nn.Parameter(torch.ones(features))
                self.b_2 = nn.Parameter(torch.zeros(features))
                self.eps = eps

            def forward(self, x):
                mean = x.mean(-1, keepdim=True)
                std = x.std(-1, keepdim=True)
                return self.a_2 * (x - mean) / (std + self.eps) + self.b_2

        class MHA(nn.Module):
            def __init__(self, h=4, d=128):
                super().__init__()
                self.h, self.d_k = h, d // h
                self.linears = nn.ModuleList([nn.Linear(d, d) for _ in range(4)])

            def forward(self, q, k, v):
                nb = q.size(0)
                q, k, v = [
                    l(x).view(nb, -1, self.h, self.d_k).transpose(1, 2)
                    for l, x in zip(self.linears, (q, k, v))
                ]
                scores = q @ k.transpose(-2, -1) / math.sqrt(self.d_k)
                attn = F.softmax(scores, dim=-1)
                x = (attn @ v).transpose(1, 2).contiguous().view(nb, -1, self.h * self.d_k)
                return self.linears[3](x)

        class PFF(nn.Module):
            def __init__(self, d=128):
                super().__init__()
                self.w_1 = nn.Linear(d, d)
                self.w_2 = nn.Linear(d, d)

            def forward(self, x):
                return self.w_2(F.relu(self.w_1(x)))

        self.multihead = MHA()
        self.mul_layernorm1 = LN(128)
        self.pff = PFF()
        self.mul_layernorm3 = LN(128)
        self.linear = nn.Linear(128, 64)

    def forward(self, conv_feature):  # (B, 64, HW)
        b = conv_feature.shape[0]
        pe = torch.from_numpy(
            positional_encoding_2d(64, 16, 64).transpose(2, 0, 1).reshape(1, 64, 1024)
        ).float().repeat(b, 1, 1)
        x = torch.cat([conv_feature, pe], 1).permute(0, 2, 1).contiguous()
        x = self.mul_layernorm1(x + self.multihead(x, x, x))
        x = self.mul_layernorm3(x + self.pff(x))
        return self.linear(x).permute(0, 2, 1).contiguous()


def test_feature_enhancer_convert_parity():
    torch.manual_seed(0)
    tm = TorchFeatureEnhancer().eval()
    sd = {f"fe.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}

    from dpmn_tpu.convert import _dense

    converted = {
        "params": {
            "MultiHeadAttention_0": _mha_cloned(sd, "fe.multihead"),
            "TorchRefLayerNorm_0": {"a_2": sd["fe.mul_layernorm1.a_2"], "b_2": sd["fe.mul_layernorm1.b_2"]},
            "Dense_0": _dense(sd, "fe.pff.w_1"),
            "Dense_1": _dense(sd, "fe.pff.w_2"),
            "TorchRefLayerNorm_1": {"a_2": sd["fe.mul_layernorm3.a_2"], "b_2": sd["fe.mul_layernorm3.b_2"]},
            "Dense_2": _dense(sd, "fe.linear"),
        }
    }
    model = FeatureEnhancer(16, 64)
    rng = np.random.RandomState(0)
    tokens = rng.rand(2, 1024, 64).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(tokens))
    variables = import_into(variables, converted)
    ours = np.asarray(model.apply(variables, jnp.asarray(tokens)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(tokens).permute(0, 2, 1)).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)


def test_tatt_converter_shapes():
    """Build a synthetic torch-keyed state dict with reference shapes and
    verify it imports cleanly into the flax TATT tree."""
    from dpmn_tpu.convert_psn import convert_tatt
    from dpmn_tpu.models import TSRN_TL_TRANS

    ch, d = 64, 64
    sd = {}
    sd["block1.0.weight"] = np.zeros((ch, 4, 9, 9), np.float32)
    sd["block1.0.bias"] = np.zeros((ch,), np.float32)
    sd["block1.1.weight"] = np.zeros((1,), np.float32)

    def add_conv(name, i, o, k):
        sd[f"{name}.weight"] = np.zeros((o, i, k, k), np.float32)
        sd[f"{name}.bias"] = np.zeros((o,), np.float32)

    def add_bn(name, c):
        for s in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{name}.{s}"] = np.zeros((c,), np.float32)

    def add_gru(name, i, h):
        for sfx, shape in (
            ("weight_ih_l0", (3 * h, i)), ("weight_hh_l0", (3 * h, h)),
            ("bias_ih_l0", (3 * h,)), ("bias_hh_l0", (3 * h,)),
        ):
            sd[f"{name}.{sfx}"] = np.zeros(shape, np.float32)
            sd[f"{name}.{sfx}_reverse"] = np.zeros(shape, np.float32)

    def add_lin(name, i, o):
        sd[f"{name}.weight"] = np.zeros((o, i), np.float32)
        sd[f"{name}.bias"] = np.zeros((o,), np.float32)

    for b in range(2, 7):
        t = f"block{b}"
        add_conv(f"{t}.conv1", ch, ch, 3)
        add_bn(f"{t}.bn1", ch)
        add_conv(f"{t}.conv2", ch, ch, 3)
        add_bn(f"{t}.bn2", ch)
        add_conv(f"{t}.gru1.conv1", ch + d, ch, 1)
        add_gru(f"{t}.gru1.gru", ch, ch // 2)
        add_conv(f"{t}.gru2.conv1", ch, ch, 1)
        add_gru(f"{t}.gru2.gru", ch, ch // 2)
    add_lin("infoGen.fc_in", 37, d)
    sd["infoGen.activation.weight"] = np.zeros((1,), np.float32)
    sd["infoGen.init_factor.weight"] = np.zeros((1024, d), np.float32)
    ut = "infoGen.upsample_transformer"
    add_gru(f"{ut}.gru_encoding", d * 16, d * 16 // 2)
    e = f"{ut}.encoder.layers.0"
    sd[f"{e}.self_attn.in_proj_weight"] = np.zeros((3 * d, d), np.float32)
    sd[f"{e}.self_attn.in_proj_bias"] = np.zeros((3 * d,), np.float32)
    add_lin(f"{e}.self_attn.out_proj", d, d)
    add_lin(f"{e}.linear1", d, d)
    add_lin(f"{e}.linear2", d, d)
    add_lin(f"{e}.norm1", d, d)
    sd[f"{e}.norm1.weight"] = np.zeros((d,), np.float32)
    sd[f"{e}.norm1.bias"] = np.zeros((d,), np.float32)
    sd[f"{e}.norm2.weight"] = np.zeros((d,), np.float32)
    sd[f"{e}.norm2.bias"] = np.zeros((d,), np.float32)
    for i in range(2):
        dl = f"{ut}.decoder.layers.{i}"
        sd[f"{dl}.multihead_attn.in_proj_weight"] = np.zeros((3 * d, d), np.float32)
        sd[f"{dl}.multihead_attn.in_proj_bias"] = np.zeros((3 * d,), np.float32)
        add_lin(f"{dl}.multihead_attn.out_proj", d, d)
        add_lin(f"{dl}.linear1", d, d)
        add_lin(f"{dl}.linear2", d, d)
        for nrm in ("norm2", "norm3"):
            sd[f"{dl}.{nrm}.weight"] = np.zeros((d,), np.float32)
            sd[f"{dl}.{nrm}.bias"] = np.zeros((d,), np.float32)
    sd[f"{ut}.decoder.norm.weight"] = np.zeros((d,), np.float32)
    sd[f"{ut}.decoder.norm.bias"] = np.zeros((d,), np.float32)
    add_conv("block7.0", ch, ch, 3)
    add_bn("block7.1", ch)
    add_conv("block8.0.conv", ch, ch * 4, 3)
    add_conv("block8.1", ch, 4, 9)

    model = TSRN_TL_TRANS(mask=True, srb_nums=5, hidden_units=32)
    x = jnp.zeros((1, 16, 64, 4))
    emb = jnp.zeros((1, 1, 26, 37))
    variables = model.init(jax.random.PRNGKey(0), x, emb, train=False)
    variables = import_into(variables, convert_tatt(sd))  # raises on mismatch
    y, _ = model.apply(variables, x, emb, train=False)
    assert y.shape == (1, 32, 128, 4)
