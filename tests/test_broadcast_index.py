"""ArrowBlockIndex: the object-store side-table index that replaced every
driver-side dict (round-1 verdict item 1)."""

import numpy as np
import pyarrow as pa

from marc_record_merge_melindautils_ray.state import broadcast_index as bi


def _tables():
    return [
        pa.table({"pid": pa.array(["a", "c", "e"]), "v": pa.array([1, 2, 3])}),
        pa.table({"pid": pa.array(["b", "d"]), "v": pa.array([4, 5])}),
        pa.table({"pid": pa.array([], pa.string()), "v": pa.array([], pa.int64())}),
    ]


def test_lookup_hits_and_misses():
    idx = bi.ArrowBlockIndex(_tables(), "pid")
    blocks, rows, ok = idx.lookup(np.array(["a", "d", "zz", "e"], dtype=object))
    assert list(ok) == [True, True, False, True]
    assert blocks[2] == -1 and rows[2] == -1
    vals = idx.take_column("v", blocks, rows)
    assert list(vals) == [1, 5, None, 3]


def test_empty_index():
    idx = bi.ArrowBlockIndex([], "pid")
    blocks, rows, ok = idx.lookup(np.array(["x"], dtype=object))
    assert not ok.any() and blocks[0] == -1


def test_hash_collision_probe(monkeypatch):
    """Force EVERY key onto one hash value: lookups must still resolve each
    key exactly via the string-confirmation forward probe."""

    def degenerate_hash(values, seed=0):
        return np.full(len(values), 12345, dtype=np.uint64)

    monkeypatch.setattr(bi, "stable_str_hash", degenerate_hash)
    idx = bi.ArrowBlockIndex(_tables(), "pid")
    keys = np.array(["a", "b", "c", "d", "e", "nope"], dtype=object)
    blocks, rows, ok = idx.lookup(keys)
    assert list(ok) == [True, True, True, True, True, False]
    vals = idx.take_column("v", blocks, rows)
    assert list(vals) == [1, 4, 2, 5, 3, None]


def test_concat_str_column_skips_empty_blocks():
    arr = bi.concat_str_column(_tables(), "pid")
    assert sorted(arr.to_pylist()) == ["a", "b", "c", "d", "e"]
