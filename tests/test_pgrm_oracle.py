"""PGRM forward parity against a torch oracle that re-states the reference
behavior (model/pgrm.py) including its layout quirks.

This is the strongest parity evidence for the DPMN core: a converted torch
PGRM must produce the same refined image as the flax module in faithful
mode.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dpmn_tpu.convert import import_into
from dpmn_tpu.convert_zoo import convert_pgrm
from dpmn_tpu.models import PGRM


def window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws, ws, C)


class TorchWindowAttention(nn.Module):
    """model/pgrm.py:108-271 oracle (eval path, no dropout)."""

    def __init__(self, dim, window_size, shift_size, num_heads, input_resolution):
        super().__init__()
        self.dim = dim
        self.window_size = list(window_size)
        self.shift_size = list(shift_size)
        self.input_resolution = input_resolution
        self.n_group = len(window_size)
        self.channel = dim // self.n_group
        self.gnum_heads = num_heads // self.n_group
        self.gchannel = self.channel // self.gnum_heads

        for i, ws in enumerate(self.window_size):
            if min(input_resolution) <= ws:
                self.shift_size[i] = 0
                self.window_size[i] = min(input_resolution)
            table = nn.Parameter(torch.zeros((2 * self.window_size[i] - 1) ** 2, self.gnum_heads))
            nn.init.normal_(table, std=0.02)
            self.register_parameter(f"relative_position_bias_table_{i}", table)
            ws_i = self.window_size[i]
            coords = torch.stack(torch.meshgrid([torch.arange(ws_i), torch.arange(ws_i)], indexing="ij"))
            flat = torch.flatten(coords, 1)
            rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
            rel[:, :, 0] += ws_i - 1
            rel[:, :, 1] += ws_i - 1
            rel[:, :, 0] *= 2 * ws_i - 1
            self.register_buffer(f"relative_position_index_{i}", rel.sum(-1))
            if self.shift_size[i] > 0:
                H, W = input_resolution
                img_mask = torch.zeros((1, H, W, 1))
                cnt = 0
                s = self.shift_size[i]
                for hs in (slice(0, -ws_i), slice(-ws_i, -s), slice(-s, None)):
                    for wsl in (slice(0, -ws_i), slice(-ws_i, -s), slice(-s, None)):
                        img_mask[:, hs, wsl, :] = cnt
                        cnt += 1
                mw = window_partition(img_mask, ws_i).view(-1, ws_i * ws_i)
                am = mw.unsqueeze(1) - mw.unsqueeze(2)
                am = am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)
                self.register_buffer(f"attn_mask_{i}", am)
            else:
                self.register_buffer(f"attn_mask_{i}", None)

        self.q = nn.Linear(dim, dim, bias=True)
        self.kv = nn.Linear(dim, dim * 2, bias=True)
        self.sknet = TorchSKConv(dim, self.n_group)

    def forward(self, x_q, x_kv):
        B, H, W, C = x_q.shape
        q = self.q(x_q.view(B, -1, C)).reshape(1, B, H, W, C)
        kv = self.kv(x_kv.view(B, -1, C)).reshape(B, H * W, 2, C).permute(2, 0, 1, 3).reshape(2, B, H, W, C)
        q_groups = q.chunk(self.n_group, -1)
        kv_groups = kv.chunk(self.n_group, -1)
        outs = []
        for i, (qg, kvg) in enumerate(zip(q_groups, kv_groups)):
            ws = self.window_size[i]
            s = self.shift_size[i]
            if s > 0:
                qg = torch.roll(qg, (-s, -s), dims=(2, 3))
                kvg = torch.roll(kvg, (-s, -s), dims=(2, 3))
            qw = window_partition(qg[0], ws).view(-1, ws * ws, self.channel)
            kw = window_partition(kvg[0], ws).view(-1, ws * ws, self.channel)
            vw = window_partition(kvg[1], ws).view(-1, ws * ws, self.channel)
            B_, N, _ = qw.shape
            heads = lambda t: t.reshape(B_, N, self.gnum_heads, self.gchannel).permute(0, 2, 1, 3)
            qh, kh, vh = heads(qw), heads(kw), heads(vw)
            attn = (qh * self.gchannel**-0.5) @ kh.transpose(-2, -1)
            table = getattr(self, f"relative_position_bias_table_{i}")
            idx = getattr(self, f"relative_position_index_{i}")
            bias = table[idx.view(-1)].view(N, N, -1).permute(2, 0, 1).contiguous()
            attn = attn + bias.unsqueeze(0)
            mask = getattr(self, f"attn_mask_{i}")
            if mask is not None:
                nW = mask.shape[0]
                attn = attn.view(B_ // nW, nW, self.gnum_heads, N, N) + mask.unsqueeze(1).unsqueeze(0)
                attn = attn.view(-1, self.gnum_heads, N, N)
            attn = F.softmax(attn, dim=-1)
            x = (attn @ vh).transpose(1, 2).reshape(B_, N, self.channel)
            # QUIRK (pgrm.py:263): raw reshape, no window_reverse / un-roll
            x = x.reshape(B, H, W, self.channel)
            outs.append(x)
        x = torch.cat(outs, -1)
        x = self.sknet(x)
        return x.reshape(B, H * W, self.dim)


class TorchSKConv(nn.Module):
    def __init__(self, dim, M, r=2):
        super().__init__()
        self.dim, self.M = dim, M
        self.channel = dim // M
        self.d = self.channel // r
        self.proj = nn.Linear(dim, dim)
        self.fc1 = nn.Linear(dim, self.d)
        self.fc2 = nn.Linear(self.d, M * self.channel)
        self.proj_head = nn.Linear(self.channel, dim)

    def forward(self, feats):  # (B, H, W, dim)
        bs, H, W, _ = feats.shape
        groups = feats.permute(0, 3, 1, 2).reshape(bs, self.M, self.channel, H, W)
        f = self.proj(feats.view(bs, H * W, -1))
        f_proj = f.permute(0, 2, 1).reshape(bs, self.dim, H, W)
        f = F.gelu(f)
        f = f.permute(0, 2, 1).reshape(bs, self.dim, H, W)
        s = F.adaptive_avg_pool2d(f, 1)
        z = F.gelu(self.fc1(s.squeeze(-1).squeeze(-1)))
        att = self.fc2(z).view(bs, self.M, self.channel, 1, 1)
        att = F.softmax(att, dim=1)
        v = (groups * att).sum(1)
        v = self.proj_head(v.reshape(bs, self.channel, H * W).permute(0, 2, 1))
        v = v.permute(0, 2, 1).reshape(bs, self.dim, H, W)
        out = f_proj + v  # (bs, dim, H, W)
        return out.reshape(bs, self.dim, H * W).permute(0, 2, 1).reshape(bs, H, W, self.dim)


class TorchMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)
        self.depthwise_conv = nn.Conv2d(hidden, hidden, 3, 1, 1, groups=hidden)
        self.pointwise_conv = nn.Conv2d(hidden, hidden, 1)

    def forward(self, x):
        x = F.gelu(self.fc1(x))
        B, HW, _ = x.size()
        s = int(math.sqrt(HW))  # QUIRK (pgrm.py:34): raw view, C-order
        x = x.view(B, -1, s, s)
        x = F.gelu(self.depthwise_conv(x))
        x = self.pointwise_conv(x)
        x = x.view(B, HW, -1)
        return self.fc2(x)


class TorchPGRM(nn.Module):
    """model/pgrm.py:460-565 oracle, depths=1 (2 Swin blocks), eval mode."""

    def __init__(self, dim=24, heads=6, windows=(2, 4, 8), patch=2, img=(32, 128), hidden_size=3, graphic=True):
        super().__init__()
        self.dim = dim
        self.patch = patch
        self.ph, self.pw = img[0] // patch, img[1] // patch
        if graphic:
            self.prior_fusion = nn.Conv2d(2, 3, 3, 1, 1)
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
        self.patch_embed.norm = nn.LayerNorm(dim)
        blocks = []
        for b in range(2):
            blk = nn.Module()
            blk.norm1_q = nn.LayerNorm(dim)
            blk.norm1_kv = nn.LayerNorm(dim)
            shift = [0] * len(windows) if b % 2 == 0 else [w // 2 for w in windows]
            blk.attn = TorchWindowAttention(dim, list(windows), shift, heads, (self.ph, self.pw))
            blk.norm2 = nn.LayerNorm(dim)
            blk.mlp = TorchMlp(dim, dim * 4)
            blocks.append(blk)
        layer = nn.Module()
        layer.blocks = nn.ModuleList(blocks)
        self.layers = nn.ModuleList([layer])
        up = hidden_size * patch * patch
        self.conv_before_upsample = nn.Sequential(
            nn.Conv2d(dim, up, 3, 1, 1), nn.Conv2d(up, up, 3, 1, 1), nn.LeakyReLU()
        )
        self.upsample = nn.PixelShuffle(patch)
        self.register_parameter("weight_list_0", nn.Parameter(torch.ones(1, hidden_size, img[0], img[1])))

    def forward(self, x_q, x_kv):
        if x_q.size(1) == 2:
            x_q = self.prior_fusion(x_q)

        def embed(img):
            t = self.patch_embed.proj(img).flatten(2).transpose(1, 2)
            return self.patch_embed.norm(t)

        x_q = embed(x_q)
        x_kv = embed(x_kv)
        for blk in self.layers[0].blocks:
            B, L, C = x_q.shape
            shortcut = x_kv
            q = blk.norm1_q(x_q).view(B, self.ph, self.pw, C)
            kv = blk.norm1_kv(x_kv).view(B, self.ph, self.pw, C)
            attn_out = blk.attn(q, kv)
            x_kv = shortcut + attn_out
            x_kv = x_kv + blk.mlp(blk.norm2(x_kv))
        x = x_kv.transpose(1, 2).view(-1, self.dim, self.ph, self.pw)
        x = self.conv_before_upsample(x)
        x = self.upsample(x)
        return x * self.weight_list_0


@pytest.mark.parametrize("graphic", [True, False])
def test_pgrm_convert_forward_parity(graphic):
    torch.manual_seed(0)
    tm = TorchPGRM(graphic=graphic).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    model = PGRM(
        img_size=(32, 128), patch_size=2, embed_dim=24, num_layers=1, num_heads=(6,),
        window_size=(2, 4, 8), iter=0, graphic_mode=graphic, hidden_size=3,
        drop_path_rate=0.0, faithful=True,
    )
    rng = np.random.RandomState(0)
    x_q = rng.rand(2, 32, 128, 2 if graphic else 3).astype(np.float32)
    x_kv = rng.rand(2, 32, 128, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_q), jnp.asarray(x_kv), ())
    variables = import_into(variables, convert_pgrm(sd, graphic_mode=graphic))
    ours = np.asarray(model.apply(variables, jnp.asarray(x_q), jnp.asarray(x_kv), ()))

    with torch.no_grad():
        theirs = tm(
            torch.from_numpy(x_q).permute(0, 3, 1, 2), torch.from_numpy(x_kv).permute(0, 3, 1, 2)
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)
