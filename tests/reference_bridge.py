"""Import machinery for running the ACTUAL reference code (/root/reference)
as a torch-CPU oracle inside the test process.

The reference environment ships third-party packages this image does not
have (editdistance, timm, torchvision, lmdb, imgaug).  Only a thin slice of
each is exercised by the eval path we differentiate against, so minimal
behavior-faithful stubs are installed into sys.modules before the reference
imports resolve:

  * editdistance.eval      — plain Levenshtein (only used by the AR counter)
  * timm.models.layers     — DropPath / to_2tuple / trunc_normal_ (pgrm.py:10);
                             DropPath is identity in eval mode like timm's
  * torchvision.transforms — ToTensor / ToPILImage / Compose with the exact
                             uint8 cast semantics of torchvision (mul(255)
                             byte-cast truncates toward zero and wraps)
  * lmdb                   — read-only env backed by our pure-Python
                             LMDB-format reader (dpmn_tpu/data/lmdb_reader.py),
                             which doubles as a round-trip check of our writer
  * imgaug.augmenters      — inert factories (the val collate constructs the
                             blur bank but never applies it)
"""

import sys
import types

REF_ROOT = "/root/reference"


def _levenshtein(a, b):
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def _stub_editdistance():
    m = types.ModuleType("editdistance")
    m.eval = _levenshtein
    return {"editdistance": m}


def _stub_timm():
    import torch
    import torch.nn as nn

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            rnd = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * rnd.floor_()

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    def trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return nn.init.trunc_normal_(t, mean=mean, std=std, a=a, b=b)

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    return {"timm": timm, "timm.models": models, "timm.models.layers": layers}


def _stub_torchvision():
    import numpy as np
    import torch
    from PIL import Image

    tv = types.ModuleType("torchvision")
    tv.__path__ = []  # mark as package so `import torchvision.x` resolves
    tr = types.ModuleType("torchvision.transforms")
    tu = types.ModuleType("torchvision.utils")
    tm = types.ModuleType("torchvision.models")
    tm.__getattr__ = lambda name: (lambda *a, **k: None)

    class ToTensor:
        def __call__(self, pic):
            if isinstance(pic, Image.Image):
                arr = np.array(pic)
            else:
                arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr.transpose(2, 0, 1).copy()).contiguous()
            if t.dtype == torch.uint8:
                t = t.float().div(255.0)
            return t

    class ToPILImage:
        def __call__(self, pic):
            if isinstance(pic, torch.Tensor):
                npimg = np.transpose(pic.detach().cpu().numpy(), (1, 2, 0))  # CHW → HWC
            else:
                npimg = np.asarray(pic)  # torchvision treats ndarray as HWC already
            if npimg.dtype != np.uint8:
                # torchvision: pic.mul(255).byte() — trunc toward zero + wrap
                npimg = (npimg * 255).astype(np.uint8)
            if npimg.ndim == 3 and npimg.shape[2] == 1:
                npimg = npimg[:, :, 0]
            return Image.fromarray(npimg)

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class ColorJitter:
        # constructed by dataset_scene's augment bank even on the Test path;
        # only ever APPLIED on the Train path, which our tests don't take
        def __init__(self, *a, **k):
            pass

        def __call__(self, img):
            return img

    tr.ToTensor, tr.ToPILImage, tr.Compose = ToTensor, ToPILImage, Compose
    tr.ColorJitter = ColorJitter
    tu.make_grid = lambda *a, **k: a[0]
    tv.transforms = tr
    tv.utils = tu
    tv.models = tm
    return {
        "torchvision": tv,
        "torchvision.transforms": tr,
        "torchvision.utils": tu,
        "torchvision.models": tm,
    }


def _stub_lmdb():
    m = types.ModuleType("lmdb")

    class _Txn:
        def __init__(self, reader):
            self._r = reader

        def get(self, key):
            return self._r.get(key)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _Env:
        def __init__(self, path):
            from dpmn_tpu.data.lmdb_reader import LMDBReader

            self._r = LMDBReader(path)

        def begin(self, write=False):
            return _Txn(self._r)

    m.open = lambda path, **kw: _Env(path)
    return {"lmdb": m}


def _stub_torchsnooper():
    # imported by sequenceCrossEntropyLoss.py / morn.py, never exercised
    m = types.ModuleType("torchsnooper")
    m.snoop = lambda *a, **k: (lambda f: f)
    return {"torchsnooper": m}


def _stub_imgaug():
    ia = types.ModuleType("imgaug")
    aug = types.ModuleType("imgaug.augmenters")

    class _Inert:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            if "images" in k:
                return k["images"]
            return a[0] if a else None

    aug.__getattr__ = lambda name: _Inert
    ia.augmenters = aug
    return {"imgaug": ia, "imgaug.augmenters": aug}


def install_stubs():
    for maker in (
        _stub_editdistance,
        _stub_timm,
        _stub_torchvision,
        _stub_lmdb,
        _stub_imgaug,
        _stub_torchsnooper,
    ):
        for name, mod in maker().items():
            if name not in sys.modules:
                sys.modules[name] = mod
    # scipy is real but modern versions dropped interp2d, which
    # utils/utils_sisr.py imports at module level (never calls on our path)
    import numpy as np
    import scipy
    import scipy.interpolate as si

    if not hasattr(si, "interp2d"):
        si.interp2d = None
    # old numpy aliases scipy dropped; utils_deblur.fspecial('gaussian',…)
    # runs at dataset.py import time and calls scipy.finfo
    for alias in ("finfo", "pi", "array", "zeros", "ones"):
        if not hasattr(scipy, alias):
            setattr(scipy, alias, getattr(np, alias))

    # the reference hardcodes .cuda() in hot paths (beam_search,
    # tbsrn.py:83); make device placement a no-op on this CPU-only host
    import torch

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.nn.Module.cuda = lambda self, *a, **k: self


def import_reference_module(name):
    """Import a single reference module (e.g. 'model.recognizer') with the
    stubs installed — lighter than the full interfaces.super_resolution."""
    import importlib

    install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    return importlib.import_module(name)


_REF = {}


def import_reference():
    """Returns the reference interfaces.super_resolution module (cached)."""
    if "sr" in _REF:
        return _REF["sr"]
    install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import interfaces.super_resolution as sr_mod

    # the AR counter dict path in cfgs_eval points at the author's machine
    sr_mod.cfgs.dataset_cfgs["dict_dir"] = REF_ROOT + "/dic_36.txt"
    _REF["sr"] = sr_mod
    return sr_mod


class AttrDict(dict):
    """Minimal EasyDict: attribute access over nested dicts."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return AttrDict(v) if isinstance(v, dict) and not isinstance(v, AttrDict) else v
