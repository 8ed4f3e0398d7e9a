"""Frozen recognizer evaluators (the --rec aster|moran|crnn accuracy judges).

Parity: the eval decode paths of interfaces/super_resolution.py:453-489 and
the input parsers of interfaces/base.py:396-478.  Each evaluator owns a
jitted forward; decoding to strings happens on host.
"""

from __future__ import annotations

import string

import jax
import jax.numpy as jnp
import numpy as np

from .models.aster import RecognizerBuilder, parse_aster_input
from .models.crnn import CRNN, parse_crnn_input
from .models.moran import MORAN, parse_moran_input
from .utils import labels as L


def _load_pretrained(kind: str, variables, path: str):
    """Import a torch evaluator checkpoint (base.py:375-439) into the flax
    variables tree.  ASTER ships under a 'state_dict' key (.pth.tar), MORAN
    with DataParallel 'module.' prefixes — both handled by
    load_torch_state_dict."""
    from .convert import import_into, load_torch_state_dict
    from .weights import convert_evaluator_state_dict

    sd = load_torch_state_dict(path)
    print(f"[weights] {kind} evaluator loaded from {path}", flush=True)
    return import_into(variables, convert_evaluator_state_dict(kind, sd))


class AsterEvaluator:
    def __init__(self, rng=None, params=None, voc_type="all", max_len=100, pretrained: str = ""):
        self.voc = L.get_vocabulary(voc_type)
        self.c2i = L.char2id(self.voc)
        self.model = RecognizerBuilder(
            rec_num_classes=len(self.voc), max_len_labels=max_len, eos=self.c2i["EOS"]
        )
        if params is None:
            rng = jax.random.PRNGKey(0) if rng is None else rng
            params = self.model.init(rng, jnp.zeros((1, 32, 100, 3)), train=False)
        if pretrained:
            params = _load_pretrained("aster", params, pretrained)
        self.params = params
        self._fwd = jax.jit(lambda v, x: self.model.apply(v, x, train=False))

    def predict(self, images) -> list:
        """images: NHWC RGB [0,1] (any size; parser resizes nothing — ASTER
        consumes the native SR/LR size like the reference, base.py:441-450)."""
        out = self._fwd(self.params, parse_aster_input(images))
        ids = np.asarray(out["pred_rec"])
        preds, _ = L.aster_get_str_list(ids, ids)
        return preds


class CRNNEvaluator:
    def __init__(self, rng=None, params=None, pretrained: str = ""):
        self.model = CRNN()
        if params is None:
            rng = jax.random.PRNGKey(0) if rng is None else rng
            params = self.model.init(rng, jnp.zeros((1, 32, 100, 1)), train=False)
        if pretrained:
            params = _load_pretrained("crnn", params, pretrained)
        self.params = params
        self.converter = L.CTCLabelConverter(string.digits + string.ascii_lowercase)
        self._fwd = jax.jit(lambda v, x: self.model.apply(v, x, train=False))

    def predict(self, images) -> list:
        logits = self._fwd(self.params, parse_crnn_input(images))  # (T, B, C)
        return self.converter.decode_logits(np.asarray(logits))


class MoranEvaluator:
    def __init__(self, rng=None, params=None, pretrained: str = ""):
        self.model = MORAN()
        if params is None:
            rng = jax.random.PRNGKey(0) if rng is None else rng
            params = self.model.init(rng, jnp.zeros((1, 32, 100, 1)), num_steps=2)
        if pretrained:
            params = _load_pretrained("moran", params, pretrained)
        self.params = params
        self.converter = L.AttentionLabelConverter()
        self._fwd = jax.jit(lambda v, x: self.model.apply(v, x, num_steps=20))

    def predict(self, images) -> list:
        l2r, _ = self._fwd(self.params, parse_moran_input(images))
        ids = np.asarray(l2r).argmax(-1)  # (B, 20)
        out = []
        for row in ids:
            s = "".join(self.converter.alphabet[i] for i in row)
            out.append(s.split("$")[0])
        return out


def build_evaluator(kind: str, rng=None, params=None, voc_type="all", pretrained: str = ""):
    if kind == "aster":
        return AsterEvaluator(rng, params, voc_type, pretrained=pretrained)
    if kind == "crnn":
        return CRNNEvaluator(rng, params, pretrained=pretrained)
    if kind == "moran":
        return MoranEvaluator(rng, params, pretrained=pretrained)
    raise ValueError(kind)
