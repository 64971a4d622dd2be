"""Suffix-array substring containment: kernel vs sorted() ground truth,
range-search pins, and query parity with the gram-blocking variant."""

import numpy as np
import pytest

from marc_record_merge_melindautils_ray.ops.suffixarray import (
    _sa_range,
    q_containment_pairs_sa,
    suffix_array,
)

SF = "/root/testdata/sf0.001"


def test_suffix_array_matches_sorted():
    rng = np.random.default_rng(2)
    for _ in range(25):
        n = int(rng.integers(0, 250))
        buf = rng.integers(0, 5, size=n).astype(np.uint8)
        sa = suffix_array(buf)
        b = bytes(buf)
        assert sa.tolist() == sorted(range(n), key=lambda i: b[i:])


def test_sa_range_search():
    buf = np.frombuffer(b"banana\x00bandana\x00", np.uint8)
    sa = suffix_array(buf)
    lo, hi = _sa_range(buf, sa, b"ana")
    assert sorted(int(sa[i]) for i in range(lo, hi)) == [1, 3, 11]
    lo, hi = _sa_range(buf, sa, b"zzz")
    assert lo == hi  # absent pattern → empty range


def test_sa_containment_matches_gram_variant(ray_session):
    from marc_record_merge_melindautils_ray.ops.dedup_text import q_containment_pairs

    a = q_containment_pairs_sa(SF)
    b = q_containment_pairs(SF)
    assert len(a) > 0  # planted containment families exist
    assert a.equals(b)
