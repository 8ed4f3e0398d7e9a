"""Forward-parity tests for the zoo converters (torch oracles built inline)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dpmn_tpu.convert import import_into
from dpmn_tpu.convert_zoo import convert_aster, convert_cmm, convert_distill
from dpmn_tpu.models import CMM, DistillModule
from dpmn_tpu.models.aster import AttentionRecognitionHead, ResNetAster

NCHW = lambda x: torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2).contiguous()
NHWC = lambda t: t.permute(0, 2, 3, 1).detach().numpy()


# ------------------------------------------------------------------ Distill


class TorchDistill(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_cat_feature = nn.Conv2d(6, 3, 3, 1, 1)
        self.bn_1 = nn.BatchNorm2d(3)
        self.conv_feature = nn.Conv2d(3, 3, 3, 1, 1)
        self.bn_2 = nn.BatchNorm2d(3)

    def forward(self, deep, shallow):
        cat = torch.cat([deep, shallow], 1)
        fc = F.relu(self.bn_1(self.conv_cat_feature(cat)))
        fs = F.relu(self.bn_2(self.conv_feature(shallow)))
        return F.l1_loss(fc, fs), fc


def test_distill_convert_parity():
    tm = TorchDistill().eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    model = DistillModule()
    rng = np.random.RandomState(0)
    deep = rng.rand(2, 8, 16, 3).astype(np.float32)
    shallow = rng.rand(2, 8, 16, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(deep), jnp.asarray(shallow))
    variables = import_into(variables, convert_distill(sd))
    loss, feat = model.apply(variables, jnp.asarray(deep), jnp.asarray(shallow))
    with torch.no_grad():
        tl, tf = tm(NCHW(deep), NCHW(shallow))
    np.testing.assert_allclose(float(loss), float(tl), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(feat), NHWC(tf), rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------- CMM


class TorchCMM(nn.Module):
    """Oracle re-statement of model/cmm.py:38-161 (cnum small for speed)."""

    def __init__(self, cnum=8, c_img=3):
        super().__init__()
        act_en = lambda: nn.LeakyReLU(0.2)
        act_de = lambda: nn.ReLU()

        def enc_block(cin, cout):
            return nn.Sequential(
                act_en(),
                nn.Conv2d(cin, cin, 4, 2, dilation=2, padding=3),
                nn.BatchNorm2d(cin),
                act_en(),
                nn.Conv2d(cin, cout, 3, 1, padding=1),
                nn.BatchNorm2d(cout),
            )

        def dec_block(cin, cout):
            return nn.Sequential(
                act_de(),
                nn.ConvTranspose2d(cin, cout, 3, 1, padding=1),
                nn.BatchNorm2d(cout),
                act_de(),
                nn.ConvTranspose2d(cout, cout, 4, 2, padding=1),
                nn.BatchNorm2d(cout),
            )

        for tag in ("1", "2"):
            setattr(self, f"en_1_{tag}", nn.Conv2d(c_img, cnum, 3, 1, padding=1))
            setattr(self, f"en_2_{tag}", self._wrap(enc_block(cnum, cnum * 2)))
            setattr(self, f"en_3_{tag}", self._wrap(enc_block(cnum * 2, cnum * 4)))
            setattr(self, f"en_4_{tag}", self._wrap(enc_block(cnum * 4, cnum * 8)))
            setattr(self, f"en_5_{tag}", self._wrap(enc_block(cnum * 8, cnum * 8)))
            setattr(self, f"en_6_{tag}", nn.Sequential(act_en(), nn.Conv2d(cnum * 8, cnum * 8, 4, 2, padding=1)))
        self.fc_1 = nn.Linear(16 * cnum, 4 * cnum)
        self.fc_2 = nn.Linear(4 * cnum, 16 * cnum)
        self.de_6 = nn.Sequential(act_de(), nn.ConvTranspose2d(cnum * 16, cnum * 8, 4, 2, padding=1), nn.BatchNorm2d(cnum * 8))
        self.de_5 = self._wrapd(dec_block(cnum * 8 * 3, cnum * 8))
        self.de_4 = self._wrapd(dec_block(cnum * 8 * 3, cnum * 4))
        self.de_3 = self._wrapd(dec_block(cnum * 4 * 3, cnum * 2))
        self.de_2 = self._wrapd(dec_block(cnum * 2 * 3, cnum))
        self.de_1 = nn.Sequential(act_de(), nn.ConvTranspose2d(cnum * 3, c_img, 3, 1, padding=1))

    @staticmethod
    def _wrap(seq):
        m = nn.Module()
        m.encode = seq
        m.forward = lambda x, s=seq: s(x)
        return m

    @staticmethod
    def _wrapd(seq):
        m = nn.Module()
        m.decode = seq
        m.forward = lambda x, s=seq: s(x)
        return m

    def forward(self, x1, x2):
        outs = {}
        for tag, x in (("1", x1), ("2", x2)):
            o1 = getattr(self, f"en_1_{tag}")(x)
            o2 = getattr(self, f"en_2_{tag}")(o1)
            o3 = getattr(self, f"en_3_{tag}")(o2)
            o4 = getattr(self, f"en_4_{tag}")(o3)
            o5 = getattr(self, f"en_5_{tag}")(o4)
            o6 = getattr(self, f"en_6_{tag}")(o5)
            outs[tag] = (o1, o2, o3, o4, o5, o6)
        out6 = torch.cat([outs["1"][5], outs["2"][5]], 1)
        residual = out6
        n, c, _, _ = out6.shape
        pooled = F.adaptive_avg_pool2d(out6, 1).view(n, -1, c)
        w = torch.sigmoid(self.fc_2(F.relu(self.fc_1(pooled)))).view(n, c, 1, 1)
        out6 = residual * w + residual
        d6 = self.de_6(out6)
        d5 = self.de_5(torch.cat([d6, outs["1"][4], outs["2"][4]], 1))
        d4 = self.de_4(torch.cat([d5, outs["1"][3], outs["2"][3]], 1))
        d3 = self.de_3(torch.cat([d4, outs["1"][2], outs["2"][2]], 1))
        d2 = self.de_2(torch.cat([d3, outs["1"][1], outs["2"][1]], 1))
        return self.de_1(torch.cat([d2, outs["1"][0], outs["2"][0]], 1))


def test_cmm_convert_parity():
    tm = TorchCMM(cnum=8).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    model = CMM(cnum=8)
    rng = np.random.RandomState(1)
    x1 = rng.rand(2, 32, 128, 3).astype(np.float32)
    x2 = rng.rand(2, 32, 128, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2))
    variables = import_into(variables, convert_cmm(sd, cnum=8))
    ours = np.asarray(model.apply(variables, jnp.asarray(x1), jnp.asarray(x2)))
    with torch.no_grad():
        theirs = NHWC(tm(NCHW(x1), NCHW(x2)))
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)


# -------------------------------------------------------------------- ASTER


class TorchAsterEncoder(nn.Module):
    """resnet_aster.py:37-128 oracle."""

    def __init__(self):
        super().__init__()

        def conv3(i, o, s=1):
            return nn.Conv2d(i, o, 3, s, 1, bias=False)

        def conv1(i, o, s=1):
            return nn.Conv2d(i, o, 1, s, bias=False)

        class Block(nn.Module):
            def __init__(self, i, o, s=(1, 1), down=False):
                super().__init__()
                self.conv1 = conv1(i, o, s)
                self.bn1 = nn.BatchNorm2d(o)
                self.conv2 = conv3(o, o)
                self.bn2 = nn.BatchNorm2d(o)
                self.downsample = nn.Sequential(conv1(i, o, s), nn.BatchNorm2d(o)) if down else None

            def forward(self, x):
                r = x if self.downsample is None else self.downsample(x)
                out = F.relu(self.bn1(self.conv1(x)))
                out = self.bn2(self.conv2(out))
                return F.relu(out + r)

        self.layer0 = nn.Sequential(conv3(3, 32), nn.BatchNorm2d(32), nn.ReLU())
        inp = 32
        for li, (o, n, s) in enumerate(
            ((32, 3, (2, 2)), (64, 4, (2, 2)), (128, 6, (2, 1)), (256, 6, (2, 1)), (512, 3, (2, 1))), start=1
        ):
            blocks = [Block(inp, o, s, down=True)] + [Block(o, o) for _ in range(n - 1)]
            setattr(self, f"layer{li}", nn.Sequential(*blocks))
            inp = o
        self.rnn = nn.LSTM(512, 256, bidirectional=True, num_layers=2, batch_first=True)

    def forward(self, x):
        x = self.layer0(x)
        for li in range(1, 6):
            x = getattr(self, f"layer{li}")(x)
        feat = x.squeeze(2).transpose(2, 1)
        out, _ = self.rnn(feat)
        return out


def test_aster_encoder_convert_parity():
    tm = TorchAsterEncoder().eval()
    sd = {f"encoder.{k}": v.numpy() for k, v in tm.state_dict().items()}
    # add a minimal decoder so convert_aster finds its keys
    dec = {
        "decoder.decoder.attention_unit.sEmbed.weight": np.zeros((512, 512), np.float32),
        "decoder.decoder.attention_unit.sEmbed.bias": np.zeros((512,), np.float32),
        "decoder.decoder.attention_unit.xEmbed.weight": np.zeros((512, 512), np.float32),
        "decoder.decoder.attention_unit.xEmbed.bias": np.zeros((512,), np.float32),
        "decoder.decoder.attention_unit.wEmbed.weight": np.zeros((1, 512), np.float32),
        "decoder.decoder.attention_unit.wEmbed.bias": np.zeros((1,), np.float32),
        "decoder.decoder.tgt_embedding.weight": np.zeros((98, 512), np.float32),
        "decoder.decoder.gru.weight_ih_l0": np.zeros((1536, 1024), np.float32),
        "decoder.decoder.gru.weight_hh_l0": np.zeros((1536, 512), np.float32),
        "decoder.decoder.gru.bias_ih_l0": np.zeros((1536,), np.float32),
        "decoder.decoder.gru.bias_hh_l0": np.zeros((1536,), np.float32),
        "decoder.decoder.fc.weight": np.zeros((97, 512), np.float32),
        "decoder.decoder.fc.bias": np.zeros((97,), np.float32),
    }
    sd.update(dec)

    model = ResNetAster()
    rng = np.random.RandomState(2)
    x = rng.rand(2, 32, 100, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    converted = convert_aster(sd)
    enc_vars = {
        "params": converted["params"]["encoder"],
        "batch_stats": converted["batch_stats"]["encoder"],
    }
    variables = import_into(variables, enc_vars)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = tm(NCHW(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)
