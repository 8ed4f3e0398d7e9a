"""MORN converter parity (torch oracle of morn.py:7-95, test path)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dpmn_tpu.convert import import_into
from dpmn_tpu.convert_zoo import convert_moran
from dpmn_tpu.models.moran import MORN


class TorchMORN(nn.Module):
    def __init__(self, target_h=32, target_w=100):
        super().__init__()
        self.targetH, self.targetW = target_h, target_w
        self.cnn = nn.Sequential(
            nn.MaxPool2d(2, 2),
            nn.Conv2d(1, 64, 3, 1, 1), nn.BatchNorm2d(64), nn.ReLU(True), nn.MaxPool2d(2, 2),
            nn.Conv2d(64, 128, 3, 1, 1), nn.BatchNorm2d(128), nn.ReLU(True), nn.MaxPool2d(2, 2),
            nn.Conv2d(128, 64, 3, 1, 1), nn.BatchNorm2d(64), nn.ReLU(True),
            nn.Conv2d(64, 16, 3, 1, 1), nn.BatchNorm2d(16), nn.ReLU(True),
            nn.Conv2d(16, 1, 3, 1, 1), nn.BatchNorm2d(1),
        )
        self.pool = nn.MaxPool2d(2, 1)
        h_list = np.arange(target_h) * 2.0 / (target_h - 1) - 1
        w_list = np.arange(target_w) * 2.0 / (target_w - 1) - 1
        grid = np.meshgrid(w_list, h_list, indexing="ij")
        grid = np.transpose(np.stack(grid, axis=-1), (1, 0, 2))[None]
        self.register_buffer("grid", torch.from_numpy(grid).float())

    def forward(self, x):  # test path, enhance=1
        b = x.size(0)
        grid = self.grid.expand(b, -1, -1, -1)
        gx = grid[:, :, :, 0].unsqueeze(3)
        gy = grid[:, :, :, 1].unsqueeze(3)
        x_small = F.interpolate(x, (self.targetH, self.targetW), mode="bilinear")

        def offsets_of(t):
            o = self.cnn(t)
            return self.pool(F.relu(o)) - self.pool(F.relu(-o))

        og = F.grid_sample(offsets_of(x_small), grid, align_corners=False).permute(0, 2, 3, 1)
        x_rect = F.grid_sample(x, torch.cat([gx, gy + og], 3), align_corners=False)
        og = og + F.grid_sample(offsets_of(x_rect), grid, align_corners=False).permute(0, 2, 3, 1)
        return F.grid_sample(x, torch.cat([gx, gy + og], 3), align_corners=False)


def test_morn_convert_parity():
    torch.manual_seed(0)
    tm = TorchMORN().eval()
    sd = {f"MORN.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}

    model = MORN()
    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 100, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    conv = convert_moran({**sd, **_dummy_asrn_keys()})
    variables = import_into(
        variables, {"params": conv["params"]["MORN"], "batch_stats": conv["batch_stats"]["MORN"]}
    )
    ours = np.asarray(model.apply(variables, jnp.asarray(x), test=True))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def _dummy_asrn_keys():
    """Minimal ASRN keys so convert_moran doesn't KeyError (zeros)."""
    sd = {}

    def conv(name, i, o, k):
        sd[f"{name}.weight"] = np.zeros((o, i, k, k), np.float32)
        sd[f"{name}.bias"] = np.zeros((o,), np.float32)

    def bn(name, c):
        for s in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{name}.{s}"] = np.zeros((c,), np.float32)

    def lin(name, i, o, bias=True):
        sd[f"{name}.weight"] = np.zeros((o, i), np.float32)
        if bias:
            sd[f"{name}.bias"] = np.zeros((o,), np.float32)

    conv("ASRN.cnn.block0.0", 1, 32, 3)
    bn("ASRN.cnn.block0.1", 32)
    inp = 32
    for li, (o, n, s) in enumerate(((32, 3, 2), (64, 4, 2), (128, 6, 2), (256, 6, 2), (512, 3, 2)), start=1):
        for j in range(n):
            t = f"ASRN.cnn.block{li}.{j}"
            if j == 0:
                conv(f"{t}.conv1.0", inp, o, 3)
                conv(f"{t}.downsample.0", inp, o, 3)
                bn(f"{t}.downsample.1", o)
            else:
                conv(f"{t}.conv1.0", o, o, 1)
            bn(f"{t}.conv1.1", o)
            conv(f"{t}.conv2.0", o, o, 3)
            bn(f"{t}.conv2.1", o)
        inp = o
    for i in (0, 1):
        nin = 512 if i == 0 else 256
        for sfx, shape in (("weight_ih_l0", (4 * 256, nin)), ("weight_hh_l0", (4 * 256, 256)),
                           ("bias_ih_l0", (4 * 256,)), ("bias_hh_l0", (4 * 256,))):
            sd[f"ASRN.rnn.{i}.rnn.{sfx}"] = np.zeros(shape, np.float32)
            sd[f"ASRN.rnn.{i}.rnn.{sfx}_reverse"] = np.zeros(shape, np.float32)
        lin(f"ASRN.rnn.{i}.embedding", 512, 256)
    for tag in ("attentionL2R", "attentionR2L"):
        lin(f"ASRN.{tag}.attention_cell.i2h", 256, 256, bias=False)
        lin(f"ASRN.{tag}.attention_cell.h2h", 256, 256)
        lin(f"ASRN.{tag}.attention_cell.score", 256, 1, bias=False)
        for sfx, shape in (("weight_ih", (3 * 256, 512)), ("weight_hh", (3 * 256, 256)),
                           ("bias_ih", (3 * 256,)), ("bias_hh", (3 * 256,))):
            sd[f"ASRN.{tag}.attention_cell.rnn.{sfx}"] = np.zeros(shape, np.float32)
        lin(f"ASRN.{tag}.generator", 256, 37)
        sd[f"ASRN.{tag}.char_embeddings"] = np.zeros((38, 256), np.float32)
    return sd


def test_full_moran_convert_import_shapes():
    """Full MORAN tree import (zero weights) — validates every key mapping."""
    from dpmn_tpu.models import MORAN

    torch.manual_seed(0)
    tm = TorchMORN().eval()
    sd = {f"MORN.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    sd.update(_dummy_asrn_keys())
    model = MORAN()
    x = jnp.zeros((1, 32, 100, 1))
    variables = model.init(jax.random.PRNGKey(0), x, num_steps=2)
    variables = import_into(variables, convert_moran(sd))  # raises on mismatch
    l2r, r2l = model.apply(variables, x, num_steps=2)
    assert l2r.shape == (1, 2, 37)
