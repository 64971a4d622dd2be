"""Mergeable sketches: HLL distinct count and histogram quantiles vs exact."""

import numpy as np

SF = "/root/testdata/sf0.01"


def test_hll_within_error_bound(ray_session):
    import duckdb

    from marc_record_merge_melindautils_ray.ops.sketches import q_hll_distinct_users

    approx = int(q_hll_distinct_users(SF)["approx_distinct_users"][0])
    exact = duckdb.connect().execute(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    # 4096 registers → ~1.6 % σ; assert a generous 3 σ
    assert abs(approx - exact) / exact < 0.05, (approx, exact)


def test_hll_merge_equals_single_pass(ray_session):
    """Register-wise max of partial sketches == one sketch of the union —
    the mergeability property the distributed fold relies on."""
    from marc_record_merge_melindautils_ray.ops.sketches import (
        _hll_partial,
        hll_estimate,
    )

    rng = np.random.default_rng(5)
    a = rng.integers(1, 1 << 60, 50_000, np.int64).astype(np.uint64)
    b = rng.integers(1, 1 << 60, 50_000, np.int64).astype(np.uint64)
    merged = np.maximum(_hll_partial(a), _hll_partial(b))
    single = _hll_partial(np.concatenate([a, b]))
    assert (merged == single).all()
    est = hll_estimate(single)
    exact = len(np.unique(np.concatenate([a, b])))
    assert abs(est - exact) / exact < 0.05


def test_quantile_sketch_accuracy(ray_session):
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.sketches import q_value_quantiles

    got = dict(zip(q_value_quantiles(SF)["q"], q_value_quantiles(SF)["value_e3"]))
    vals = pq.read_table(f"{SF}/events.parquet", columns=["value"])["value"].to_numpy()
    spread = float(np.max(vals) - np.min(vals))
    for q in (50, 90, 99):
        exact = float(np.quantile(vals, q / 100))
        # histogram error bound: one bin width plus interpolation slack
        assert abs(got[q] / 1000 - exact) <= spread / 8192 * 2 + 1e-9, (q, got[q], exact)


def test_hll_grouped_accuracy_and_layout_invariance(ray_session):
    """Per-group estimates within the HLL error bound of the exact grouped
    distinct, and IDENTICAL across different block layouts (register max is
    associative/commutative, so batch boundaries can't change the answer)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops.sketches import hll_distinct_by

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    exact = (
        t.to_pandas().groupby("event_type")["user_id"].nunique().sort_index()
    )

    a = hll_distinct_by(rd.from_arrow(t), "event_type", "user_id")
    b = hll_distinct_by(
        rd.from_arrow(t).repartition(7), "event_type", "user_id")
    assert a["event_type"].tolist() == b["event_type"].tolist()
    assert a["approx_distinct"].tolist() == b["approx_distinct"].tolist()

    assert a["event_type"].tolist() == exact.index.tolist()
    for g, got in zip(a["event_type"], a["approx_distinct"]):
        want = int(exact[g])
        assert abs(got - want) / want < 0.05, (g, got, want)


# ------------------------------------------------------- Misra-Gries heavy hitters
def test_mg_trim_error_bound():
    import numpy as np

    from marc_record_merge_melindautils_ray.ops.sketches import mg_trim

    rng = np.random.default_rng(3)
    terms = np.array([f"t{i}" for i in range(100)])
    counts = rng.integers(1, 1000, size=100)
    t, c, delta = mg_trim(terms, counts.copy(), 10)
    assert len(t) <= 10
    lookup = dict(zip(t, c))
    for term, n in zip(terms, counts):
        kept = lookup.get(term, 0)
        assert kept <= n and n - kept <= delta  # undercount bounded by δ


def test_heavy_hitters_exact_and_fallback(ray_session):
    from marc_record_merge_melindautils_ray.ops.sketches import q_heavy_hitters
    from marc_record_merge_melindautils_ray.ops.text_analysis import q_top_terms

    sf = "/root/testdata/sf0.001"
    exact = q_top_terms(sf)
    assert q_heavy_hitters(sf).equals(exact)            # certified path
    assert q_heavy_hitters(sf, s=3).equals(exact)       # fallback path


def test_group_value_quantiles_accuracy(ray_session):
    """Histogram-sketch contract on sparse groups: each estimate lies
    within one bin width of an order statistic whose rank is within ±2 of
    q·n (with few values per bin, rank-interpolating quantile_cont can sit
    bins away — the sketch's guarantee is bin-level, not sub-rank)."""
    import numpy as np
    import pandas as pd

    from marc_record_merge_melindautils_ray.ops.sketches import (
        q_group_value_quantiles,
    )

    sf = "/root/testdata/sf0.001"
    got = q_group_value_quantiles(sf).set_index("event_type")
    ev = pd.read_parquet(f"{sf}/events.parquet")
    for et, sub in ev.groupby("event_type"):
        v = np.sort(sub["value"].to_numpy(np.float64))
        binw = (v[-1] - v[0]) / 4096
        assert got.loc[et, "n"] == len(v)
        for q, col in ((0.5, "p50_c"), (0.9, "p90_c"), (0.99, "p99_c")):
            est = got.loc[et, col] / 100.0
            ranks = [max(0, min(len(v) - 1, int(round(q * len(v))) + d))
                     for d in (-2, -1, 0, 1, 2)]
            near = min(abs(est - v[r]) for r in ranks)
            assert near <= binw + 1e-6, (et, q, est, near, binw)
