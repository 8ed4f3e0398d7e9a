"""Data pipeline tests: collate shapes/quirks, glyph render, mask prior,
LMDB reader on a hand-crafted file."""

import os
import struct

import numpy as np
import pytest
from PIL import Image

from dpmn_tpu.data import (
    AlignCollate,
    GlyphRenderer,
    LMDBReader,
    SyntheticTextZoom,
    DataLoader,
    interspace_pad,
    label_one_hot,
)


def test_interspace_pad():
    # 'ab' → a + '-'*24 + b (26 - 2 = 24 over 1 gap)
    assert interspace_pad("ab") == "a" + "-" * 24 + "b"
    assert interspace_pad("a") == "a"
    w = interspace_pad("abcdef")
    assert len(w) <= 26 and w.replace("-", "") == "abcdef"
    assert interspace_pad("x" * 30) == "x" * 26


def test_label_one_hot_val_quirk():
    oh, wm, wt = label_one_hot(["abcdef"], e_substitution=True)
    assert oh.shape == (1, 1, 26, 37)
    # val quirk: 3rd char replaced by 'e' (dataset.py:1928-1931)
    padded = interspace_pad("abedef")
    ids = [("-" + "0123456789abcdefghijklmnopqrstuvwxyz").index(c) for c in padded]
    got = oh[0, 0].argmax(-1)[: len(ids)]
    np.testing.assert_array_equal(got, ids)


def test_collate_shapes():
    ds = SyntheticTextZoom(n=8)
    col = AlignCollate(mask=True, train=True)
    loader = DataLoader(ds, 4, col)
    hr, pseudo, lr, hry, lry, labels, one_hot, wm, wt = next(iter(loader))
    assert hr.shape == (4, 32, 128, 4)
    assert lr.shape == (4, 16, 64, 4)
    assert pseudo is None
    assert one_hot.shape == (4, 1, 26, 37)
    assert len(labels) == 4
    assert wt.shape == (4,)

    col_val = AlignCollate(mask=True, train=False, e_substitution=True)
    loader_val = DataLoader(ds, 4, col_val, shuffle=False, drop_last=False)
    hr, lr, hry, lry, labels, one_hot = next(iter(loader_val))
    assert hr.shape == (4, 32, 128, 4)


def test_glyph_renderer():
    r = GlyphRenderer(shape=(32, 128))
    out = r.render_batch(["hello", "", "WORLD"])
    assert out.shape == (3, 32, 128, 2)
    assert out.max() > 100  # uint8 value scale like the reference
    # cache hit returns identical array
    out2 = r.render_batch(["hello"])
    np.testing.assert_array_equal(out[0], out2[0])


def test_glyph_matches_reference_formula():
    """make_standard_text must produce a tight, centered, non-empty canvas."""
    from dpmn_tpu.data import make_standard_text

    canvas = make_standard_text(None, "test", (32, 128))
    assert canvas.shape == (32, 128)
    assert canvas.max() > 50
    # ~10% border stays dark
    assert canvas[:2].max() <= canvas.max()


def test_uint8_transport_bit_identical():
    """resize_quantized → device normalize must reproduce resize_normalize
    EXACTLY (VERDICT r4 #6: the serving stream ships uint8 and divides on
    device — any numeric drift would silently change serving outputs)."""
    import jax.numpy as jnp

    from dpmn_tpu.data import resize_normalize, resize_quantized
    from dpmn_tpu.data.prefetch import normalize_uint8

    rng = np.random.RandomState(3)
    for i in range(4):
        img = Image.fromarray(rng.randint(0, 256, (17 + i, 41 + i, 3), np.uint8))
        for mask in (False, True):
            f = resize_normalize(img, (64, 16), mask)
            u8 = resize_quantized(img, (64, 16), mask)
            assert u8.dtype == np.uint8
            dev = np.asarray(normalize_uint8(jnp.asarray(u8)))
            np.testing.assert_array_equal(f, dev)


def test_serving_collate_matches_align_collate_lr():
    """ServingCollate's uint8 LR must match the eval collate's LR tensor
    after device normalization (same resize, same mask threshold)."""
    import jax.numpy as jnp

    from dpmn_tpu.data import AlignCollate, ServingCollate
    from dpmn_tpu.data.prefetch import normalize_uint8

    rng = np.random.RandomState(4)
    batch = [
        (
            Image.fromarray(rng.randint(0, 256, (32, 100, 3), np.uint8)),
            Image.fromarray(rng.randint(0, 256, (16, 50, 3), np.uint8)),
            Image.fromarray(rng.randint(0, 256, (32, 100, 3), np.uint8)),
            Image.fromarray(rng.randint(0, 256, (16, 50, 3), np.uint8)),
            "word",
        )
        for _ in range(3)
    ]
    eval_col = AlignCollate(img_h=32, img_w=128, down_sample_scale=2, mask=True, train=False)
    serve_col = ServingCollate(img_h=32, img_w=128, down_sample_scale=2, mask=True)
    _, lr_f, *_ = eval_col(batch)
    (lr_u8,) = serve_col(batch)
    np.testing.assert_array_equal(lr_f, np.asarray(normalize_uint8(jnp.asarray(lr_u8))))


def test_mask_prior_matches_pil():
    import jax.numpy as jnp

    from dpmn_tpu.ops.mask_prior import to_mask

    rng = np.random.RandomState(0)
    img = rng.rand(2, 16, 64, 3).astype(np.float32)
    ours = np.asarray(to_mask(jnp.asarray(img)))

    # PIL oracle (utils/util.py:27-35)
    for b in range(2):
        u8 = (img[b] * 255).astype(np.uint8)  # ToPILImage truncation
        pil = Image.fromarray(u8).convert("L")
        thres = np.asarray(pil).mean()
        m = np.asarray(pil.point(lambda x: 0 if x > thres else 255), np.float32) / 255.0
        np.testing.assert_allclose(ours[b, :, :, 0], m, atol=1e-6)


def _write_test_lmdb(path, records):
    """Craft a minimal single-leaf-page LMDB file for reader tests."""
    psize = 4096
    # leaf page (pgno 2)
    items = sorted(records.items())
    nodes = []
    for k, v in items:
        node = struct.pack("<HHHH", len(v) & 0xFFFF, (len(v) >> 16) & 0xFFFF, 0, len(k)) + k + v
        nodes.append(node)
    # place nodes from the top of the page downward
    offsets = []
    cursor = psize
    for node in nodes:
        pad = (len(node) + 1) // 2 * 2
        cursor -= pad
        offsets.append(cursor)
    lower = 16 + 2 * len(nodes)
    upper = min(offsets) if offsets else psize
    leaf = bytearray(psize)
    struct.pack_into("<QHHHH", leaf, 0, 2, 0, 0x02, lower, upper)
    struct.pack_into(f"<{len(nodes)}H", leaf, 16, *offsets)
    for off, node in zip(offsets, nodes):
        leaf[off : off + len(node)] = node

    def meta_page(pgno, txnid):
        page = bytearray(psize)
        struct.pack_into("<QHHHH", page, 0, pgno, 0, 0x08, 0, 0)
        meta = struct.pack("<II", 0xBEEFC0DE, 999)
        meta += struct.pack("<QQ", 0, 10 * psize)  # address, mapsize
        free_db = struct.pack("<IHHQQQQq", psize, 0, 0, 0, 0, 0, 0, -1)
        main_db = struct.pack("<IHHQQQQq", 0, 0, 1, 0, 1, 0, len(nodes), 2)
        meta += free_db + main_db + struct.pack("<QQ", 2, txnid)
        page[16 : 16 + len(meta)] = meta
        return page

    with open(path, "wb") as f:
        f.write(meta_page(0, 1))
        f.write(meta_page(1, 0))
        f.write(leaf)


def test_lmdb_reader(tmp_path):
    path = str(tmp_path / "data.mdb")
    records = {
        b"num-samples": b"2",
        b"label-000000001": b"hello",
        b"label-000000002": b"world",
        b"aaa": b"v" * 100,
    }
    _write_test_lmdb(path, records)
    r = LMDBReader(path)
    assert r.get(b"num-samples") == b"2"
    assert r.get(b"label-000000001") == b"hello"
    assert r.get(b"label-000000002") == b"world"
    assert r.get(b"aaa") == b"v" * 100
    assert r.get(b"missing") is None


def test_multiworker_loader_determinism():
    """workers>0 yields the IDENTICAL batch stream as the serial loader —
    same shuffle, same order, same bytes (cfg.workers wiring, reference
    base.py:95-100)."""
    ds = SyntheticTextZoom(n=20)
    col = AlignCollate(mask=True, train=True)
    serial = list(DataLoader(ds, 4, col, shuffle=True, drop_last=False, seed=3, workers=0))
    pooled = list(DataLoader(ds, 4, col, shuffle=True, drop_last=False, seed=3, workers=4))
    assert len(serial) == len(pooled) == 5
    for bs, bp in zip(serial, pooled):
        assert len(bs) == len(bp)
        for xs, xp in zip(bs, bp):
            if xs is None:  # pseudoLR slot (dataset.py:1987-1989 quirk)
                assert xp is None
            elif hasattr(xs, "shape"):
                assert np.array_equal(xs, xp)
            else:
                assert list(xs) == list(xp)


def test_multiworker_loader_early_break():
    """Breaking out mid-epoch must not deadlock or leak the pool."""
    ds = SyntheticTextZoom(n=32)
    col = AlignCollate(mask=True, train=True)
    loader = DataLoader(ds, 4, col, workers=2)
    for i, _ in enumerate(loader):
        if i == 1:
            break
    # second epoch still works after an abandoned iterator
    assert sum(1 for _ in loader) == 8
