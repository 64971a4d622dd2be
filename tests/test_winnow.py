"""Winnowing fingerprint dedup: the distributed pipeline must equal a
pure-Python reference implementation of robust winnowing (rightmost window
min over FNV-base polynomial k-gram hashes) pair-for-pair, and the guarantee
(any common substring of length ≥ k+w−1 shares a fingerprint) must hold."""

import itertools

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"
K, W = 7, 8
B = 1_099_511_628_211


def _ref_winnow(text: str, k: int = K, w: int = W) -> set[int]:
    """Loop-level reference of marc_record_merge_melindautils_ray.ops.dedup_text.winnow_fingerprints."""
    data = bytes(
        c for c in text.lower().encode("utf-8")
        if (48 <= c <= 57) or (97 <= c <= 122)
    )
    n = len(data)
    if n < k:
        return set()
    hashes = []
    for i in range(n - k + 1):
        h = 0
        for j in range(k):
            h = (h * B + data[i + j]) % (1 << 64)
        hashes.append(h)
    m = len(hashes)
    sel = set()
    if m <= w:
        # rightmost min of the single short window
        best = min(range(m), key=lambda i: (hashes[i], -i))
        rightmost = max(i for i in range(m) if hashes[i] == hashes[best])
        sel.add(rightmost)
    else:
        for s in range(m - w + 1):
            window = hashes[s:s + w]
            mn = min(window)
            rightmost = s + max(i for i in range(w) if window[i] == mn)
            sel.add(rightmost)
    return {hashes[i] for i in sel}


def test_winnow_fingerprints_match_reference():
    from marc_record_merge_melindautils_ray.ops.dedup_text import winnow_fingerprints

    texts = [
        "",
        "ab",
        "hello world, hello world!",
        "The quick brown fox jumps over the lazy dog " * 3,
        "aaaaaaaaaaaaaaaaaaaaaa",  # degenerate: all k-grams identical
        "join a filter window row join stream customer data group",
        "café déjà-vu naïve — non-ASCII codepoints drop entirely",
    ]
    for t in texts:
        got = set(int(x) for x in winnow_fingerprints(t))
        assert got == _ref_winnow(t), t[:30]


def test_winnow_guarantee_shared_substring():
    """Two docs sharing a substring of length ≥ k+w−1 (normalized) share at
    least one fingerprint — the winnowing theorem on this implementation."""
    from marc_record_merge_melindautils_ray.ops.dedup_text import winnow_fingerprints

    rng = np.random.default_rng(7)
    alphabet = "abcdefghij "
    common = "".join(rng.choice(list(alphabet), size=K + W - 1 + 5))
    a = "".join(rng.choice(list(alphabet), size=40)) + common
    b = common + "".join(rng.choice(list(alphabet), size=40))
    fa = set(int(x) for x in winnow_fingerprints(a))
    fb = set(int(x) for x in winnow_fingerprints(b))
    assert fa & fb


def test_winnow_dup_pairs_equals_brute_force(ray_session):
    from marc_record_merge_melindautils_ray.ops.dedup_text import (
        WINNOW_MIN_PERMILLE,
        q_winnow_dup_pairs,
        winnow_fingerprints,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    fps = {int(d): set(int(x) for x in winnow_fingerprints(t or "")) for d, t in docs}

    want = []
    for (a, fa), (b, fb) in itertools.combinations(fps.items(), 2):
        if not fa or not fb:
            continue
        shared = len(fa & fb)
        if shared == 0:
            continue
        permille = 1000 * shared // min(len(fa), len(fb))
        if permille >= WINNOW_MIN_PERMILLE:
            lo, hi = min(a, b), max(a, b)
            want.append((lo, hi, shared, permille))
    want.sort()

    got = q_winnow_dup_pairs(SF)
    got_tuples = sorted(
        (int(r.id_a), int(r.id_b), int(r.shared), int(r.overlap_permille))
        for r in got.itertuples()
    )
    assert got_tuples == want
    assert len(want) > 0  # the synthetic corpus plants real near-dups
