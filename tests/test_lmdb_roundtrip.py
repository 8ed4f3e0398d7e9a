"""LMDB writer → reader roundtrip + TextZoom dataset over a written file."""

import numpy as np

from dpmn_tpu.data.lmdb_reader import LMDBReader
from dpmn_tpu.data.lmdb_writer import create_textzoom_lmdb, write_lmdb


def test_writer_reader_roundtrip_small(tmp_path):
    path = str(tmp_path / "data.mdb")
    records = {b"k%03d" % i: b"v" * (i % 50 + 1) for i in range(500)}
    records[b"big"] = bytes(range(256)) * 64  # 16 KiB overflow value
    write_lmdb(path, records)
    r = LMDBReader(path)
    for k, v in records.items():
        assert r.get(k) == v, k
    assert r.get(b"nope") is None


def test_writer_multi_level_branch(tmp_path):
    path = str(tmp_path / "data.mdb")
    # enough records to force > 1 leaf and a branch page
    records = {b"key-%06d" % i: (b"x" * 100) + str(i).encode() for i in range(2000)}
    write_lmdb(path, records)
    r = LMDBReader(path)
    for i in (0, 1, 999, 1998, 1999):
        assert r.get(b"key-%06d" % i) == (b"x" * 100) + str(i).encode()


def test_textzoom_lmdb_dataset_roundtrip(tmp_path):
    from dpmn_tpu.data.datasets import SyntheticTextZoom, TextZoomLMDB

    syn = SyntheticTextZoom(n=6)
    samples = [(syn[i][0], syn[i][1], syn[i][4]) for i in range(6)]
    path = create_textzoom_lmdb(str(tmp_path / "tz"), samples)
    ds = TextZoomLMDB(str(tmp_path / "tz"))
    assert len(ds) == 6
    hr, lr, hry, lry, label = ds[0]
    assert hr.size == (128, 32)
    assert lr.size == (64, 16)
    assert label == samples[0][2]
    # JPEG round-trip keeps images close
    a = np.asarray(hr, np.float32)
    b = np.asarray(samples[0][0], np.float32)
    assert np.abs(a - b).mean() < 12.0
