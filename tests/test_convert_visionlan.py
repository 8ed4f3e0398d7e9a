"""VisionLAN transformer-encoder converter parity (torch oracle)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dpmn_tpu.convert import import_into
from dpmn_tpu.convert_zoo import _vl_encoder
from dpmn_tpu.models.visionlan import TransformerEncoderVL, sinusoid_table


class TorchVLEncoder(nn.Module):
    """modules/modules.py:41-127 oracle (1 layer, eval mode)."""

    def __init__(self, d=512, inner=2048, heads=8):
        super().__init__()

        class Layer(nn.Module):
            def __init__(self):
                super().__init__()
                dk = d // heads

                class Attn(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.w_qs = nn.Linear(d, d)
                        self.w_ks = nn.Linear(d, d)
                        self.w_vs = nn.Linear(d, d)
                        self.fc = nn.Linear(d, d)
                        self.layer_norm = nn.LayerNorm(d)

                    def forward(self, x):
                        b, l, _ = x.shape
                        q = self.w_qs(x).view(b, l, heads, dk).permute(2, 0, 1, 3).reshape(-1, l, dk)
                        k = self.w_ks(x).view(b, l, heads, dk).permute(2, 0, 1, 3).reshape(-1, l, dk)
                        v = self.w_vs(x).view(b, l, heads, dk).permute(2, 0, 1, 3).reshape(-1, l, dk)
                        a = torch.bmm(q, k.transpose(1, 2)) / np.power(dk, 0.5)
                        a = F.softmax(a, dim=2)
                        out = torch.bmm(a, v).view(heads, b, l, dk).permute(1, 2, 0, 3).reshape(b, l, -1)
                        return self.layer_norm(self.fc(out) + x)

                class PFF(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.w_1 = nn.Conv1d(d, inner, 1)
                        self.w_2 = nn.Conv1d(inner, d, 1)
                        self.layer_norm = nn.LayerNorm(d)

                    def forward(self, x):
                        r = x
                        x = self.w_2(F.relu(self.w_1(x.transpose(1, 2)))).transpose(1, 2)
                        return self.layer_norm(x + r)

                self.slf_attn = Attn()
                self.pos_ffn = PFF()

            def forward(self, x):
                return self.pos_ffn(self.slf_attn(x))

        self.layer_stack = nn.ModuleList([Layer()])
        self.layer_norm = nn.LayerNorm(d, eps=1e-6)

    def forward(self, x):
        pe = torch.from_numpy(sinusoid_table(256, 512)).float()
        x = x + pe[: x.size(1)].unsqueeze(0)
        for layer in self.layer_stack:
            x = layer(x)
        return self.layer_norm(x)


def test_vl_encoder_convert_parity():
    torch.manual_seed(0)
    tm = TorchVLEncoder().eval()
    sd = {f"enc.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}

    model = TransformerEncoderVL(n_layers=1)
    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 512).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p, _ = _vl_encoder(sd, "enc", 1)
    variables = import_into(variables, {"params": p})
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)
