"""Distributed Bloom filter (state.bloom) — the exact-keyset scale path."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _keys_ds(keys: np.ndarray) -> rd.Dataset:
    t = pa.table({"key": pa.array(keys.view(np.int64), pa.int64())})
    return rd.from_arrow(t)


def test_bloom_no_false_negatives_low_fpr(ray_session):
    from marc_record_merge_melindautils_ray.state.bloom import build_bloom_filter

    rng = np.random.default_rng(7)
    keys = rng.integers(1, 1 << 62, size=20_000, dtype=np.int64).astype(np.uint64)
    keys = np.unique(keys)
    bf = build_bloom_filter(_keys_ds(keys), "key", len(keys))
    # every inserted key hits — false negatives are impossible by construction
    assert bf.contains(keys).all()
    # FPR on disjoint probes stays near the 12-bits/key design point (~0.3%)
    probes = rng.integers(1, 1 << 62, size=50_000, dtype=np.int64).astype(np.uint64)
    probes = probes[~np.isin(probes, keys)]
    fpr = bf.contains(probes).mean()
    assert fpr < 0.02, fpr


def test_bloom_inside_ray_task(ray_session):
    """The filter must travel by slice REFS in task closures (never the
    assembled bitmap) and re-assemble per worker process."""
    from marc_record_merge_melindautils_ray.state.bloom import build_bloom_filter

    keys = np.arange(1, 5001, dtype=np.uint64) * np.uint64(2654435761)
    bf = build_bloom_filter(_keys_ds(keys), "key", len(keys))
    assert bf.__getstate__()["_bits"] is None  # closure ships refs, not bits

    probe = pa.table({
        "key": pa.array(
            np.concatenate([keys[:100], np.arange(10**9, 10**9 + 100, dtype=np.uint64)])
            .view(np.int64),
            pa.int64(),
        )
    })

    def apply(t: pa.Table) -> pa.Table:
        got = bf.contains(np.asarray(t["key"]).view(np.uint64))
        return pa.table({"hit": pa.array(got)})

    out = rd.from_arrow(probe).map_batches(apply, batch_format="pyarrow").to_pandas()
    assert out["hit"][:100].all()  # inserted keys all hit inside the worker
    assert out["hit"][100:].mean() < 0.2  # non-keys mostly miss


def test_sorted_key_filter_semantics():
    from marc_record_merge_melindautils_ray.state.bloom import (
        SortedKeyFilter,
        as_key_filter,
    )

    # empty array → match NOTHING (the historical 'no candidates' contract)
    empty = as_key_filter(np.empty(0, np.uint64))
    assert not empty.contains(np.array([1, 2], np.uint64)).any()
    # None → no filter at all
    assert as_key_filter(None) is None
    f = SortedKeyFilter(np.array([5, 3, 9], np.uint64))
    got = f.contains(np.array([3, 4, 9, 10], np.uint64))
    assert got.tolist() == [True, False, True, False]


def test_filter_minus_exact():
    """Bloom FP on a deliberately-excluded hub key must NOT re-admit it."""
    import numpy as np

    from marc_record_merge_melindautils_ray.state.bloom import (
        FilterMinusExact,
        SortedKeyFilter,
    )

    class AlwaysYes:  # stands in for a Bloom with an FP on the hub key
        def contains(self, v):
            return np.ones(len(v), dtype=bool)

    hub = np.array([42, 99], np.uint64)
    f = FilterMinusExact(AlwaysYes(), hub)
    got = f.contains(np.array([41, 42, 43, 99], np.uint64))
    assert got.tolist() == [True, False, True, False]
    # composes with the exact SortedKeyFilter base too
    f2 = FilterMinusExact(SortedKeyFilter(np.array([1, 42], np.uint64)), hub)
    assert f2.contains(np.array([1, 42], np.uint64)).tolist() == [True, False]
