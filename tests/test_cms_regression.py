"""Count-Min sketch invariants and exact-rational grouped OLS pins."""

import numpy as np
import pandas as pd
import pytest


def test_cms_overestimate_and_merge():
    """est ≥ true always; partials merge by addition (sum of two batch
    sketches == sketch of the concatenation); forced-collision overshoot is
    nonnegative and bounded by total weight."""
    from marc_record_merge_melindautils_ray.ops.sketches import _cms_partial, cms_query

    rng = np.random.default_rng(3)
    keys = np.array([f"k{i}" for i in range(500)], object)
    w1 = rng.integers(1, 50, 500).astype(np.int64)
    w2 = rng.integers(1, 50, 500).astype(np.int64)
    c1, c2 = _cms_partial(keys, w1), _cms_partial(keys, w2)
    both = _cms_partial(np.r_[keys, keys], np.r_[w1, w2])
    assert (c1 + c2 == both).all()                      # mergeable
    est = cms_query(c1 + c2, keys)
    true = w1 + w2
    assert (est >= true).all()                          # never undercounts
    # tiny width forces collisions: still an overestimate, bounded by N
    tiny = _cms_partial(keys, w1, d=2, w=16)
    est_t = cms_query(tiny, keys, w=16)
    assert (est_t >= w1).all()
    assert (est_t <= w1.sum()).all()


def test_cms_term_counts_query(ray_session):
    from marc_record_merge_melindautils_ray.ops.sketches import q_cms_term_counts

    out = q_cms_term_counts("/root/testdata/sf0.001", k=10)
    assert (out["overshoot"] >= 0).all()
    assert (out["est_n"] == out["true_n"] + out["overshoot"]).all()
    # ε = e/w ≈ 0.13% of stream length — generous 2% bound on this corpus
    n_stream = out["true_n"].sum() * 50
    assert (out["overshoot"] <= max(1, n_stream // 50)).all()


def test_group_regression_constructed(ray_session, tmp_path):
    """Planted perfect line y = 3x + 7 (cents): slope_num/den == 3 exactly,
    icept_num/den == 700 exactly; a zero-variance-x group gets den == 0
    (undefined slope stays explicit, never a division crash)."""
    from marc_record_merge_melindautils_ray.ops.stats import q_group_regression

    d0 = pd.Timestamp("2024-01-01")
    days = np.array([0, 1, 2, 3, 4], np.int64)
    df = pd.DataFrame({
        "event_id": np.arange(8, dtype=np.int64),
        "ts": [d0 + pd.Timedelta(days=int(d)) for d in days]
              + [d0, d0, d0],
        "user_id": np.int64(1),
        "event_type": ["lin"] * 5 + ["flat"] * 3,
        "value": [(3 * d + 7.00) / 100 * 100 for d in days]  # y = 3d+7 cents
                 + [1.00, 2.00, 3.00],
        "props": "{}",
    })
    # value column is dollars; y_cents = round(value*100) → 3d+7 needs /100
    df.loc[df["event_type"] == "lin", "value"] = (3 * days + 7) / 100.0
    df.to_parquet(tmp_path / "events.parquet")
    got = q_group_regression(str(tmp_path)).set_index("event_type")
    lin = got.loc["lin"]
    assert lin["slope_num"] == 3 * lin["den"] and lin["den"] > 0
    assert lin["icept_num"] == 7 * lin["den"]
    flat = got.loc["flat"]
    assert flat["den"] == 0 and flat["slope_num"] == 0


# -------------------------------------------------------------------- KMV
def test_kmv_exact_under_k_and_estimate_over_k():
    from marc_record_merge_melindautils_ray.ops.sketches import (
        KMV_K,
        _kmv_partial,
        kmv_estimate,
        kmv_fold,
    )
    import numpy as np

    small = np.arange(100, dtype=np.int64)
    assert kmv_estimate(_kmv_partial(small)) == 100     # sketch IS the set
    big = np.arange(100_000, dtype=np.int64)
    est = kmv_estimate(_kmv_partial(big))
    assert abs(est - 100_000) < 100_000 * 0.10          # ~3σ of 3.1% RSE
    # mergeability: fold of split partials == partial of the whole
    a, b = big[:60_000], big[40_000:]                   # overlapping halves
    assert (kmv_fold([_kmv_partial(a), _kmv_partial(b)])
            == _kmv_partial(big)).all()


def test_kmv_set_ops_accuracy():
    from marc_record_merge_melindautils_ray.ops.sketches import (
        _kmv_partial,
        kmv_set_ops,
    )
    import numpy as np

    a = np.arange(0, 50_000, dtype=np.int64)            # |A| = 50k
    b = np.arange(30_000, 80_000, dtype=np.int64)       # |B| = 50k, ∩ = 20k
    ops = kmv_set_ops(_kmv_partial(a), _kmv_partial(b))
    assert abs(ops["est_union"] - 80_000) < 80_000 * 0.12
    assert abs(ops["est_intersection"] - 20_000) < 20_000 * 0.30


def test_kmv_query_self_report(ray_session):
    from marc_record_merge_melindautils_ray.ops.sketches import q_kmv_user_overlap

    out = q_kmv_user_overlap("/root/testdata/sf0.001").iloc[0]
    # 15 users < k → every estimate is exact by construction
    assert out["est_a"] == out["true_a"]
    assert out["est_union"] == out["true_union"]
    assert out["est_intersection"] == out["true_intersection"]
    assert (out["true_a"] + out["true_b"]
            == out["true_union"] + out["true_intersection"])


def test_embed_quantize_bounds(ray_session):
    import numpy as np

    from marc_record_merge_melindautils_ray.ops.similarity import q_embed_quantize

    out = q_embed_quantize("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500
    codes = np.stack(out["codes"].to_numpy())
    assert codes.dtype == np.int8
    assert np.abs(codes).max() <= 127
    # symmetric-quantization error bound: ≤ scale/2 + micro rounding slack
    assert (out["max_err_micro"] <= out["scale_micro"] // 2 + 2).all()
    assert (out["scale_micro"] > 0).all()
