#!/usr/bin/env python
"""Dump a side-by-side PNG grid: host reference glyph render (left) vs the
device atlas composition (right) for a few words. CPU-only.

Output: vis/atlas_compare.png
"""

import os
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dpmn_tpu.data.glyph import GlyphRenderer, _DEFAULT_FONT
from dpmn_tpu.data.glyph_atlas import make_device_glyph_fn
from dpmn_tpu.utils.labels import DIC_36

WORDS = ["a", "the", "exit", "hello", "parking", "restaurant", "construction", "thequickbrownfox"]


def ids_of(word):
    out = np.zeros(25, np.int32)
    for i, ch in enumerate(word[:25]):
        out[i] = DIC_36.index(ch) + 1
    return out


def main():
    import cv2

    fn = make_device_glyph_fn((32, 128), _DEFAULT_FONT)
    host = GlyphRenderer(_DEFAULT_FONT, (32, 128))
    rows = []
    for word in WORDS:
        out = np.asarray(fn(jnp.asarray(ids_of(word))[None], jnp.asarray([len(word)], jnp.int32)))[0]
        ref = host._render(word)
        for case in (0, 1):
            a = np.clip(ref[:, :, case], 0, 255).astype(np.uint8)
            b = np.clip(out[:, :, case], 0, 255).astype(np.uint8)
            sep = np.full((32, 4), 128, np.uint8)
            rows.append(np.concatenate([a, sep, b], axis=1))
            rows.append(np.full((4, rows[-1].shape[1]), 32, np.uint8))
    grid = np.concatenate(rows, axis=0)
    os.makedirs("vis", exist_ok=True)
    cv2.imwrite("vis/atlas_compare.png", grid)
    print("wrote vis/atlas_compare.png", grid.shape)


if __name__ == "__main__":
    main()
