#!/usr/bin/env python
"""Measure device glyph-atlas fidelity vs the host reference renderer.

Reports full-resolution and 8x16-downsampled normalized correlation plus
mean absolute error over a corpus of TextZoom-typical words, broken down by
word length. Run on CPU.
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dpmn_tpu.data.glyph import GlyphRenderer, _DEFAULT_FONT
from dpmn_tpu.data.glyph_atlas import make_device_glyph_fn
from dpmn_tpu.utils.labels import DIC_36

WORDS = [
    "a", "i", "7", "to", "of", "on", "cat", "dog", "the", "and", "exit",
    "stop", "sale", "2019", "hello", "quick", "world", "crane", "w1ld",
    "64213", "coffee", "street", "orange", "danger", "parking", "station",
    "highway", "delivery", "entrance", "mountain", "restaurant", "department",
    "construction", "international", "0123456789abc", "thequickbrownfox",
    "jumpsoverthelazydog", "abcdefghijklmnopqrstuvwxy",
]


def ids_of(word):
    out = np.zeros(25, np.int32)
    for i, ch in enumerate(word[:25]):
        out[i] = DIC_36.index(ch) + 1
    return out


def ncorr(a, b):
    a = (a - a.mean()) / (a.std() + 1e-6)
    b = (b - b.mean()) / (b.std() + 1e-6)
    return float((a * b).mean())


def main():
    fn = make_device_glyph_fn((32, 128), _DEFAULT_FONT)
    host = GlyphRenderer(_DEFAULT_FONT, (32, 128))

    rows = []
    for word in WORDS:
        ids = jnp.asarray(ids_of(word))[None]
        out = np.asarray(fn(ids, jnp.asarray([min(len(word), 25)], jnp.int32)))[0]
        ref = host._render(word[:25])
        for case in (0, 1):
            a, b = out[:, :, case], ref[:, :, case]
            ad = a.reshape(8, 4, 16, 8).mean((1, 3))
            bd = b.reshape(8, 4, 16, 8).mean((1, 3))
            rows.append((len(word), case, ncorr(a, b), ncorr(ad, bd), float(np.abs(a - b).mean())))

    print(f"{'len':>4} {'case':>4} {'corr_full':>9} {'corr_ds':>8} {'mae':>7}")
    by_bucket = {}
    for ln, case, cf, cd, mae in rows:
        bucket = "short(<=4)" if ln <= 4 else ("mid(5-9)" if ln <= 9 else "long(10+)")
        by_bucket.setdefault(bucket, []).append((cf, cd, mae))
    for bucket, vals in by_bucket.items():
        cf = np.mean([v[0] for v in vals])
        cd = np.mean([v[1] for v in vals])
        mae = np.mean([v[2] for v in vals])
        print(f"{bucket:>10}      {cf:9.4f} {cd:8.4f} {mae:7.2f}")
    cf = np.mean([r[2] for r in rows])
    cd = np.mean([r[3] for r in rows])
    mae = np.mean([r[4] for r in rows])
    print(f"{'ALL':>10}      {cf:9.4f} {cd:8.4f} {mae:7.2f}")


if __name__ == "__main__":
    main()
