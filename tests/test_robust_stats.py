"""Exact-integer MAD (odd/even-count pins) and zlib compressibility signal."""

import numpy as np
import pandas as pd
import pytest


def test_group_mad_constructed(ray_session, tmp_path):
    """Even-count group hits the interpolated (x.5) median on BOTH levels;
    odd-count group stays integral — both exact in the x2/x4 encoding."""
    from marc_record_merge_melindautils_ray.ops.stats import q_group_mad

    df = pd.DataFrame({
        "event_id": np.arange(9, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-01"),
        "user_id": np.int64(1),
        "event_type": ["a"] * 4 + ["b"] * 5,
        "value": [1.00, 2.00, 4.00, 10.00,      # even: med 3.0, devs |v-3|
                  1.00, 2.00, 3.00, 8.00, 9.00],  # odd: med 3, devs 2,1,0,5,6
        "props": "{}",
    })
    df.to_parquet(tmp_path / "events.parquet")
    got = q_group_mad(str(tmp_path)).set_index("event_type")
    # a: vc=[100,200,400,1000] → med_x2=600; devs|2v-600|=[400,200,200,1400]
    #    sorted [200,200,400,1400] → mad_x4 = 200+400 = 600 → MAD=1.50
    assert got.loc["a"].tolist() == [4, 600, 600]
    # b: med_x2 = 2·300 = 600; devs=[400,200,0,1000,1200] sorted → mid 400
    #    mad_x4 = 400+400 = 800 → MAD = 2.00
    assert got.loc["b"].tolist() == [5, 600, 800]


def test_compression_ratio(ray_session, tmp_path):
    """Repetitive text compresses far below random-ish prose; lengths match
    a direct zlib computation exactly; empty doc yields the zero row."""
    import zlib

    from marc_record_merge_melindautils_ray.ops.text_analysis import (
        q_compression_ratio,
    )

    texts = ["spam " * 200, "the quick brown fox jumps over the lazy dog "
             "while mixed entropy words pile up here", ""]
    pd.DataFrame({
        "doc_id": np.array([1, 2, 3], np.int64),
        "text": texts, "lang": "en", "source": "s", "n_chars": np.int64(1),
    }).to_parquet(tmp_path / "documents.parquet")
    got = (q_compression_ratio(str(tmp_path)).to_pandas()
           .set_index("doc_id"))
    for i, t in enumerate(texts, 1):
        assert got.loc[i, "raw_len"] == len(t)
        assert got.loc[i, "zlib_len"] == len(zlib.compress(t.encode(), 6))
    assert got.loc[1, "compress_permille"] < 100      # boilerplate
    assert got.loc[2, "compress_permille"] > 500      # prose
    assert got.loc[3].tolist() == [0, len(zlib.compress(b"", 6)), 0]


def test_key_skew_constructed(ray_session, tmp_path):
    """Hand-computed Gini on a 3-key distribution (sizes 1,1,4): Gini =
    Σ(2i−n−1)x / (n·Σx) = (−2·1 + 0·1 + 2·4)/(3·6) = 6/18 = 1/3."""
    from marc_record_merge_melindautils_ray.ops.stats import q_key_skew

    df = pd.DataFrame({
        "o_orderkey": np.arange(6, dtype=np.int64),
        "o_custkey": np.array([1, 2, 3, 3, 3, 3], np.int64),
        "o_orderstatus": "F",
        "o_totalprice": 1.0,
        "o_orderdate": pd.Timestamp("1995-01-01"),
        "o_orderpriority": "1-URGENT",
    })
    df.to_parquet(tmp_path / "orders.parquet")
    got = q_key_skew(str(tmp_path)).iloc[0]
    assert got.tolist() == [3, 6, 4, 666, 6, 18]
    # sanity: gini_num/gini_den == 1/3
    assert got["gini_num"] * 3 == got["gini_den"]


def test_time_weighted_avg_constructed(ray_session, tmp_path):
    """Hand-computed TWA: v=100¢ held 2000 ms then v=300¢ held 1000 ms →
    num = 100·2000 + 300·1000 = 500000, den = 3000 (last value holds no
    time); a single-event user emits the explicit (0, 0) undefined pair;
    equal-ts events order by event_id."""
    from marc_record_merge_melindautils_ray.ops.stats import q_time_weighted_avg

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": np.array([1, 2, 3, 4, 5, 6], np.int64),
        "ts": [t0, t0 + pd.Timedelta(seconds=2), t0 + pd.Timedelta(seconds=3),
               t0,                                   # user 9: single event
               t0, t0],                              # user 5: ts tie
        "user_id": np.array([7, 7, 7, 9, 5, 5], np.int64),
        "value": [1.00, 3.00, 9.99, 1.23, 4.00, 8.00],
        "props": "{}",
    })
    df.to_parquet(tmp_path / "events.parquet")
    got = q_time_weighted_avg(str(tmp_path)).set_index("user_id")
    assert got.loc[7].tolist() == [100 * 2000 + 300 * 1000, 3000]
    assert got.loc[9].tolist() == [0, 0]
    assert got.loc[5].tolist() == [0, 0]   # zero-length gap carries no weight


def test_event_transitions_constructed(ray_session, tmp_path):
    """Sequence a→b→b→a for one user (ties ordered by event_id), a lone
    event for another: transitions (a,b)=1, (b,b)=1, (b,a)=1, nothing from
    the singleton."""
    from marc_record_merge_melindautils_ray.ops.stats import q_event_transitions

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": np.array([1, 2, 3, 4, 9], np.int64),
        "ts": [t0, t0, t0, t0 + pd.Timedelta(seconds=1), t0],  # 1-3 tie
        "user_id": np.array([7, 7, 7, 7, 9], np.int64),
        "event_type": ["a", "b", "b", "a", "solo"],
        "value": 0.0, "props": "{}",
    })
    df.to_parquet(tmp_path / "events.parquet")
    got = q_event_transitions(str(tmp_path))
    want = [("a", "b", 1), ("b", "a", 1), ("b", "b", 1)]
    assert list(map(tuple, got.to_numpy())) == want


def test_gap_histogram_constructed(ray_session, tmp_path):
    """Hand-placed gaps: 0 ms → bucket −1, 1 ms → 0, 1000 ms → 9 (2^9=512 ≤
    1000 < 1024), 1024 ms → 10 (exact power of two); buckets key on the
    LATER event's type."""
    from marc_record_merge_melindautils_ray.ops.stats import q_gap_histogram

    t0 = pd.Timestamp("2024-01-01")
    off = [0, 0, 1, 1001, 2025]          # gaps: 0, 1, 1000, 1024
    df = pd.DataFrame({
        "event_id": np.arange(5, dtype=np.int64),
        "ts": [t0 + pd.Timedelta(milliseconds=int(o)) for o in off],
        "user_id": np.int64(1),
        "event_type": ["a", "b", "b", "c", "c"],
        "value": 0.0, "props": "{}",
    })
    df.to_parquet(tmp_path / "events.parquet")
    got = q_gap_histogram(str(tmp_path))
    assert list(map(tuple, got.to_numpy())) == [
        ("b", -1, 1), ("b", 0, 1), ("c", 9, 1), ("c", 10, 1)]
