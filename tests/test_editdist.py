"""Bounded edit-distance pair join: kernel exactness vs a naive DP,
blocking-mode equivalence, short-doc stratum soundness, oracle parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from marc_record_merge_melindautils_ray.ops.editdist import (
    _emit_pairs,
    _length_bucket_rows,
    _prefix_gram_rows,
    banded_levenshtein_batch,
    q_edit_distance_pairs,
)


def naive_levenshtein(a: bytes, b: bytes) -> int:
    m, n = len(a), len(b)
    row = list(range(n + 1))
    for i in range(1, m + 1):
        prev, row[0] = row[0], i
        for j in range(1, n + 1):
            cur = row[j]
            row[j] = min(row[j] + 1, row[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return row[n]


def _mutate(rng, a: bytes, n_ops: int) -> bytes:
    b = bytearray(a)
    for _ in range(n_ops):
        if not b:
            b.append(rng.integers(97, 123))
            continue
        p = int(rng.integers(0, len(b)))
        op = rng.random()
        if op < 0.34:
            b[p] = int(rng.integers(97, 123))
        elif op < 0.67:
            del b[p]
        else:
            b.insert(p, int(rng.integers(97, 123)))
    return bytes(b)


@pytest.mark.parametrize("d", [0, 1, 4, 16])
def test_kernel_exact_vs_naive(d):
    rng = np.random.default_rng(41)
    pairs = []
    for _ in range(200):
        a = bytes(rng.integers(97, 105, size=int(rng.integers(0, 70))).astype(np.uint8))
        pairs.append((a, _mutate(rng, a, int(rng.integers(0, 8)))))
    for _ in range(100):  # unrelated pairs (mostly > d)
        pairs.append((
            bytes(rng.integers(97, 123, size=int(rng.integers(0, 60))).astype(np.uint8)),
            bytes(rng.integers(97, 123, size=int(rng.integers(0, 60))).astype(np.uint8)),
        ))
    got = banded_levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs], d)
    exp = np.array([min(naive_levenshtein(a, b), d + 1) for a, b in pairs])
    assert (got == exp).all()


def test_kernel_empty_and_boundary():
    assert banded_levenshtein_batch([], [], 4).tolist() == []
    got = banded_levenshtein_batch(
        [b"", b"", b"abc", b"abcd"], [b"", b"abcd", b"", b"abcd"], 3
    )
    assert got.tolist() == [0, 4, 3, 0]


def _write_corpus(tmp_path, texts):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.fixture(scope="module")
def planted_corpus(tmp_path_factory):
    """Mixed corpus incl. docs BELOW the prefix count-filter floor (the SHORT
    stratum) with planted near pairs in both strata."""
    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa"]
    texts = []
    for i in range(60):
        n = int(rng.integers(25, 60))
        texts.append(" ".join(words[int(rng.integers(0, len(words)))] for _ in range(n)))
    # short docs (< q·(d+1) = 68 chars at d=16): exercise the SHORT stratum
    for i in range(20):
        n = int(rng.integers(3, 9))
        texts.append(" ".join(words[int(rng.integers(0, len(words)))] for _ in range(n)))
    # planted near-dups: a long and a short base, each mutated within d
    for base in (texts[0], texts[62]):
        b = _mutate(rng, base.encode(), 5).decode("latin1")
        texts.append(b)
    return texts


def _brute(texts, d):
    rows = []
    enc = [t.encode() for t in texts]
    for i in range(len(enc)):
        for j in range(i + 1, len(enc)):
            dist = naive_levenshtein(enc[i], enc[j])
            if dist <= d:
                rows.append((i, j, dist))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "dist"]).astype(np.int64)


@pytest.mark.parametrize("blocking", ["length", "prefix", "auto"])
def test_query_matches_brute_force(ray_session, tmp_path, planted_corpus, blocking):
    sf = _write_corpus(tmp_path, planted_corpus)
    got = q_edit_distance_pairs(sf, d=16, blocking=blocking)
    exp = _brute(planted_corpus, 16).sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(exp) >= 2  # the planted pairs are really in range
    pd.testing.assert_frame_equal(got, exp)


def test_prefix_blocking_emits_short_stratum():
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["tiny", "x" * 200], pa.string()),
    })
    rows = _prefix_gram_rows(t, d=16, q=4)
    keys = np.asarray(rows["key"], np.int64)
    ids = np.asarray(rows["doc_id"], np.int64)
    short_key = np.int64(-(2**62))
    assert (ids[keys == short_key] == 0).all() and (keys == short_key).sum() == 1


def test_length_bucket_covers_window():
    lens = np.array([100, 116, 117], np.int64)
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "blen": pa.array(lens, pa.int64()),
        "text": pa.array(["x" * int(n) for n in lens], pa.string()),
    })
    rows = _length_bucket_rows(t, d=16)
    g = pd.DataFrame({
        "key": np.asarray(rows["key"], np.int64),
        "doc_id": np.asarray(rows["doc_id"], np.int64),
        "blen": np.asarray(rows["blen"], np.int64),
    })
    pairs = _emit_pairs(g, d=16)
    got = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (0, 1) in got      # Δ=16, in window
    assert (1, 2) in got      # Δ=1
    assert (0, 2) not in got  # Δ=17, out of window
