"""Weight-port fidelity: build torch oracles of the reference architectures,
convert their weights, and check forward parity with the flax models."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dpmn_tpu.convert import convert_crnn, convert_tsrn, import_into
from dpmn_tpu.models import CRNN, TSRN


class TorchCRNN(nn.Module):
    """Oracle re-statement of model/crnn/crnn.py:23-79."""

    def __init__(self, imgH=32, nc=1, nclass=37, nh=256):
        super().__init__()
        ks = [3, 3, 3, 3, 3, 3, 2]
        ps = [1, 1, 1, 1, 1, 1, 0]
        nm = [64, 128, 256, 256, 512, 512, 512]
        cnn = nn.Sequential()

        def convRelu(i, bn=False):
            nIn = nc if i == 0 else nm[i - 1]
            cnn.add_module(f"conv{i}", nn.Conv2d(nIn, nm[i], ks[i], 1, ps[i]))
            if bn:
                cnn.add_module(f"batchnorm{i}", nn.BatchNorm2d(nm[i]))
            cnn.add_module(f"relu{i}", nn.ReLU(True))

        convRelu(0)
        cnn.add_module("pooling0", nn.MaxPool2d(2, 2))
        convRelu(1)
        cnn.add_module("pooling1", nn.MaxPool2d(2, 2))
        convRelu(2, True)
        convRelu(3)
        cnn.add_module("pooling2", nn.MaxPool2d((2, 2), (2, 1), (0, 1)))
        convRelu(4, True)
        convRelu(5)
        cnn.add_module("pooling3", nn.MaxPool2d((2, 2), (2, 1), (0, 1)))
        convRelu(6, True)
        self.cnn = cnn

        class BLSTM(nn.Module):
            def __init__(self, nIn, nHidden, nOut):
                super().__init__()
                self.rnn = nn.LSTM(nIn, nHidden, bidirectional=True)
                self.embedding = nn.Linear(nHidden * 2, nOut)

            def forward(self, x):
                rec, _ = self.rnn(x)
                T, b, h = rec.size()
                out = self.embedding(rec.view(T * b, h))
                return out.view(T, b, -1)

        self.rnn = nn.Sequential(BLSTM(512, nh, nh), BLSTM(nh, nh, nclass))

    def forward(self, x):
        conv = self.cnn(x)
        conv = conv.squeeze(2).permute(2, 0, 1)
        return self.rnn(conv)


def test_crnn_weight_port_forward_parity():
    torch_model = TorchCRNN().eval()
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}

    model = CRNN()
    x_np = np.random.RandomState(0).rand(2, 32, 100, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np), train=False)
    variables = import_into(variables, convert_crnn(sd))
    ours = np.asarray(model.apply(variables, jnp.asarray(x_np), train=False))

    with torch.no_grad():
        theirs = torch_model(torch.from_numpy(x_np).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


class TorchTSRN(nn.Module):
    """Oracle re-statement of model/tsrn.py:14-150 (no STN path)."""

    def __init__(self, srb_nums=2, hidden_units=8, mask=True, scale_factor=2):
        super().__init__()
        in_planes = 4 if mask else 3

        class mish(nn.Module):
            def forward(self, x):
                return x * torch.tanh(F.softplus(x))

        class GruBlock(nn.Module):
            def __init__(self, cin, cout):
                super().__init__()
                self.conv1 = nn.Conv2d(cin, cout, 1, padding=0)
                self.gru = nn.GRU(cout, cout // 2, bidirectional=True, batch_first=True)

            def forward(self, x):
                x = self.conv1(x)
                x = x.permute(0, 2, 3, 1).contiguous()
                b = x.size()
                x = x.view(b[0] * b[1], b[2], b[3])
                x, _ = self.gru(x)
                x = x.view(b[0], b[1], b[2], b[3])
                return x.permute(0, 3, 1, 2)

        class SRB(nn.Module):
            def __init__(self, ch):
                super().__init__()
                self.conv1 = nn.Conv2d(ch, ch, 3, padding=1)
                self.bn1 = nn.BatchNorm2d(ch)
                self.gru1 = GruBlock(ch, ch)
                self.prelu = mish()
                self.conv2 = nn.Conv2d(ch, ch, 3, padding=1)
                self.bn2 = nn.BatchNorm2d(ch)
                self.gru2 = GruBlock(ch, ch)

            def forward(self, x):
                r = self.bn2(self.conv2(self.prelu(self.bn1(self.conv1(x)))))
                r = self.gru1(r.transpose(-1, -2)).transpose(-1, -2)
                return self.gru2(x + r)

        ch = 2 * hidden_units
        self.block1 = nn.Sequential(nn.Conv2d(in_planes, ch, 9, padding=4), nn.PReLU())
        self.srb_nums = srb_nums
        for i in range(srb_nums):
            setattr(self, f"block{i + 2}", SRB(ch))
        setattr(self, f"block{srb_nums + 2}", nn.Sequential(nn.Conv2d(ch, ch, 3, padding=1), nn.BatchNorm2d(ch)))

        class Up(nn.Module):
            def __init__(self, c):
                super().__init__()
                self.conv = nn.Conv2d(c, c * 4, 3, padding=1)
                self.pixel_shuffle = nn.PixelShuffle(2)
                self.prelu = mish()

            def forward(self, x):
                return self.prelu(self.pixel_shuffle(self.conv(x)))

        n_up = int(math.log2(scale_factor))
        setattr(
            self,
            f"block{srb_nums + 3}",
            nn.Sequential(*([Up(ch) for _ in range(n_up)] + [nn.Conv2d(ch, in_planes, 9, padding=4)])),
        )

    def forward(self, x):
        block = {"1": self.block1(x)}
        for i in range(self.srb_nums + 1):
            block[str(i + 2)] = getattr(self, f"block{i + 2}")(block[str(i + 1)])
        out = getattr(self, f"block{self.srb_nums + 3}")(block["1"] + block[str(self.srb_nums + 2)])
        return torch.tanh(out)


class TorchTSRN_TL(nn.Module):
    """Oracle re-statement of model/tsrn.py:153-308 (TSRN_TL + InfoGen,
    no STN path) — the tpgsr PSN."""

    def __init__(self, srb_nums=2, hidden_units=8, mask=True, scale_factor=2,
                 text_emb=37, out_text_channels=32):
        super().__init__()
        in_planes = 4 if mask else 3

        class mish(nn.Module):
            def forward(self, x):
                return x * torch.tanh(F.softplus(x))

        class GruBlock(nn.Module):
            def __init__(self, cin, cout):
                super().__init__()
                self.conv1 = nn.Conv2d(cin, cout, 1, padding=0)
                self.gru = nn.GRU(cout, cout // 2, bidirectional=True, batch_first=True)

            def forward(self, x):
                x = self.conv1(x)
                x = x.permute(0, 2, 3, 1).contiguous()
                b = x.size()
                x = x.view(b[0] * b[1], b[2], b[3])
                x, _ = self.gru(x)
                x = x.view(b[0], b[1], b[2], b[3])
                return x.permute(0, 3, 1, 2)

        class SRBTL(nn.Module):
            """tsrn.py:249-278: gru1 consumes cat(residual, text_emb)."""

            def __init__(self, ch, tch):
                super().__init__()
                self.conv1 = nn.Conv2d(ch, ch, 3, padding=1)
                self.bn1 = nn.BatchNorm2d(ch)
                self.gru1 = GruBlock(ch + tch, ch)
                self.prelu = mish()
                self.conv2 = nn.Conv2d(ch, ch, 3, padding=1)
                self.bn2 = nn.BatchNorm2d(ch)
                self.gru2 = GruBlock(ch, ch)

            def forward(self, x, text_emb):
                r = self.bn2(self.conv2(self.prelu(self.bn1(self.conv1(x)))))
                cat = torch.cat([r, text_emb], 1)
                r = self.gru1(cat.transpose(-1, -2)).transpose(-1, -2)
                return self.gru2(x + r)

        class InfoGen(nn.Module):
            """tsrn.py:281-308."""

            def __init__(self, t_emb, out):
                super().__init__()
                self.tconv1 = nn.ConvTranspose2d(t_emb, 512, 3, 2, padding=1, bias=False)
                self.bn1 = nn.BatchNorm2d(512)
                self.tconv2 = nn.ConvTranspose2d(512, 128, 3, 2, padding=1, bias=False)
                self.bn2 = nn.BatchNorm2d(128)
                self.tconv3 = nn.ConvTranspose2d(128, 64, 3, 2, padding=1, bias=False)
                self.bn3 = nn.BatchNorm2d(64)
                self.tconv4 = nn.ConvTranspose2d(64, out, 3, (2, 1), padding=(1, 0), bias=False)
                self.bn4 = nn.BatchNorm2d(out)

            def forward(self, t):
                x = F.relu(self.bn1(self.tconv1(t)))
                x = F.relu(self.bn2(self.tconv2(x)))
                x = F.relu(self.bn3(self.tconv3(x)))
                return F.relu(self.bn4(self.tconv4(x)))

        ch = 2 * hidden_units
        self.block1 = nn.Sequential(nn.Conv2d(in_planes, ch, 9, padding=4), nn.PReLU())
        self.srb_nums = srb_nums
        for i in range(srb_nums):
            setattr(self, f"block{i + 2}", SRBTL(ch, out_text_channels))
        self.infoGen = InfoGen(text_emb, out_text_channels)
        setattr(self, f"block{srb_nums + 2}", nn.Sequential(nn.Conv2d(ch, ch, 3, padding=1), nn.BatchNorm2d(ch)))

        class Up(nn.Module):
            def __init__(self, c):
                super().__init__()
                self.conv = nn.Conv2d(c, c * 4, 3, padding=1)
                self.pixel_shuffle = nn.PixelShuffle(2)
                self.prelu = mish()

            def forward(self, x):
                return self.prelu(self.pixel_shuffle(self.conv(x)))

        n_up = int(math.log2(scale_factor))
        setattr(
            self,
            f"block{srb_nums + 3}",
            nn.Sequential(*([Up(ch) for _ in range(n_up)] + [nn.Conv2d(ch, in_planes, 9, padding=4)])),
        )

    def forward(self, x, text_emb):  # tsrn.py:210-247
        block = {"1": self.block1(x)}
        spatial_t_emb = self.infoGen(text_emb)
        spatial_t_emb = F.interpolate(
            spatial_t_emb, (x.shape[2], x.shape[3]), mode="bilinear", align_corners=True
        )
        for i in range(self.srb_nums + 1):
            if i + 2 in [2, 3, 4, 5, 6] and i < self.srb_nums:
                block[str(i + 2)] = getattr(self, f"block{i + 2}")(block[str(i + 1)], spatial_t_emb)
            else:
                block[str(i + 2)] = getattr(self, f"block{i + 2}")(block[str(i + 1)])
        out = getattr(self, f"block{self.srb_nums + 3}")(block["1"] + block[str(self.srb_nums + 2)])
        return torch.tanh(out)


def test_tsrn_tl_weight_port_forward_parity():
    """convert_tsrn_tl forward parity vs the torch oracle (ADVICE r3: the
    shape/key test alone would not catch a layout mistake, e.g. in the
    InfoGen t_convT ports)."""
    from dpmn_tpu.convert_psn import convert_tsrn_tl
    from dpmn_tpu.models import TSRN_TL

    torch_model = TorchTSRN_TL(srb_nums=2, hidden_units=8).eval()
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}

    model = TSRN_TL(mask=True, srb_nums=2, hidden_units=8, stn=False)
    rng = np.random.RandomState(2)
    x_np = rng.rand(2, 16, 64, 4).astype(np.float32)
    emb_np = rng.rand(2, 37, 1, 26).astype(np.float32)  # torch NCHW
    emb_nhwc = np.transpose(emb_np, (0, 2, 3, 1))  # ours: (B, 1, 26, 37)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x_np), jnp.asarray(emb_nhwc), train=False
    )
    variables = import_into(variables, convert_tsrn_tl(sd, srb_nums=2))
    ours = np.asarray(model.apply(variables, jnp.asarray(x_np), jnp.asarray(emb_nhwc), train=False))

    with torch.no_grad():
        theirs = (
            torch_model(torch.from_numpy(x_np).permute(0, 3, 1, 2), torch.from_numpy(emb_np))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_tsrn_weight_port_forward_parity():
    torch_model = TorchTSRN(srb_nums=2, hidden_units=8).eval()
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}

    model = TSRN(mask=True, srb_nums=2, hidden_units=8, stn=False)
    x_np = np.random.RandomState(1).rand(2, 16, 64, 4).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np), train=False)
    variables = import_into(variables, convert_tsrn(sd, srb_nums=2))
    ours = np.asarray(model.apply(variables, jnp.asarray(x_np), train=False))

    with torch.no_grad():
        theirs = torch_model(torch.from_numpy(x_np).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
