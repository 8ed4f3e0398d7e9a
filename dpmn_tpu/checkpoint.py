"""Checkpointing: atomic msgpack serialization of the whole train state.

The reference writes one .pth per PGRM plus recognizer files with a naming
scheme (interfaces/base.py:328-373: model_best_{metric}_{epoch}_{i}.pth,
checkpoint.pth, recognizer_best_*.pth).  Here the entire system — every
PGRM, the CMM, distill modules, frozen networks and the optimizer state —
is ONE pytree, saved as one file with an info header, written atomically
(tmp + rename) so an interrupted save never corrupts the resume point.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state, info: dict = None):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    state = serialization.to_state_dict(jax.device_get(state))
    payload = serialization.msgpack_serialize({"state": state, "info": info or {}})
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def load_checkpoint(path: str, target=None):
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state, info = payload["state"], payload.get("info", {})
    if target is not None:
        state = serialization.from_state_dict(target, state)
    return state, info


def save_best_info(ckpt_dir: str, info: dict):
    with open(os.path.join(ckpt_dir, "best_info.json"), "w") as f:
        json.dump(info, f, indent=2, default=lambda o: float(o) if isinstance(o, np.floating) else str(o))
