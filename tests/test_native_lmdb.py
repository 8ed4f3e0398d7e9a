"""Native C++ LMDB reader vs the Python reader on written files."""

import numpy as np
import pytest

from dpmn_tpu.data.lmdb_writer import write_lmdb

native = pytest.importorskip("dpmn_tpu.data.native_lmdb")
if not native.native_available():
    pytest.skip("no C++ toolchain", allow_module_level=True)


def test_native_reader_matches_python(tmp_path):
    path = str(tmp_path / "data.mdb")
    records = {b"key-%06d" % i: (b"d" * (i % 300)) + str(i).encode() for i in range(3000)}
    records[b"big"] = bytes(range(256)) * 100
    write_lmdb(path, records)

    r = native.NativeLMDBReader(path)
    from dpmn_tpu.data.lmdb_reader import LMDBReader

    pr = LMDBReader(path)
    for k in (b"key-000000", b"key-001500", b"key-002999", b"big"):
        assert r.get(k) == pr.get(k)
    assert r.get(b"missing") is None

    keys = [b"key-%06d" % i for i in range(0, 3000, 7)] + [b"nope"]
    vals = r.get_batch(keys)
    for k, v in zip(keys, vals):
        assert v == pr.get(k)
    r.close()


def test_native_reader_speed(tmp_path):
    import time

    path = str(tmp_path / "data.mdb")
    records = {b"k-%08d" % i: b"x" * 200 for i in range(5000)}
    write_lmdb(path, records)
    r = native.NativeLMDBReader(path)
    keys = [b"k-%08d" % i for i in range(5000)]
    t0 = time.time()
    vals = r.get_batch(keys)
    dt = time.time() - t0
    assert all(v is not None for v in vals)
    assert dt < 1.0  # 5k gets in one call, comfortably sub-second
    r.close()
