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


# -------------------------------------------------------------------- MMR
def test_mmr_lambda1_equals_topk(ray_session):
    """λ=1000 permille (no diversity term) must reproduce plain cosine
    top-k under the op's micro-rounded ordering — pinned against a direct
    numpy reference on the same table."""
    import pandas as pd

    from marc_record_merge_melindautils_ray.ops.similarity import q_mmr_rerank

    sf = "/root/testdata/sf0.001"
    mmr = q_mmr_rerank(sf, k=10, lam_permille=1000)
    emb = pd.read_parquet(f"{sf}/embeddings.parquet").sort_values("vec_id")
    ids = emb["vec_id"].to_numpy(np.int64)
    mat = np.array([np.asarray(v, np.float64) for v in emb["embedding"]])
    matn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    for qid in (0, 1, 2):
        qv = matn[ids == qid][0]
        sims = np.round(matn @ qv * 1e6).astype(np.int64)
        mask = ids != qid
        order = np.lexsort((ids[mask], -sims[mask]))[:10]
        want = ids[mask][order].tolist()
        got = mmr[mmr["query_id"] == qid].sort_values("rank")["neighbor_id"].tolist()
        assert got == want, qid


def test_mmr_suppresses_near_duplicates(ray_session, tmp_path):
    """Two near-identical high-relevance candidates: plain top-k returns
    both back-to-back; MMR (λ=0.5) picks one and then a diverse vector."""
    import pandas as pd

    from marc_record_merge_melindautils_ray.ops.similarity import q_mmr_rerank

    rng = np.random.default_rng(0)
    q = rng.standard_normal(8)
    q /= np.linalg.norm(q)
    u = rng.standard_normal(8); u -= (u @ q) * q; u /= np.linalg.norm(u)
    v = rng.standard_normal(8); v -= (v @ q) * q; v -= (v @ u) * u
    v /= np.linalg.norm(v)
    c1 = 0.9 * q + np.sqrt(1 - 0.81) * v           # rel ≈ 0.90
    c2 = c1 + 0.001 * u                             # near-copy, rel ≈ 0.90
    c3 = 0.7 * q + np.sqrt(1 - 0.49) * u           # rel 0.70, cos(c3,c1)=0.63
    vecs = {0: q, 10: c1, 11: c2, 12: c3}
    pd.DataFrame({
        "vec_id": np.array(list(vecs), np.int64),
        "embedding": [v.astype(np.float32) for v in vecs.values()],
        "label": np.int32(0),
    }).to_parquet(tmp_path / "embeddings.parquet")
    out = q_mmr_rerank(str(tmp_path), k=2, lam_permille=500)
    picks = out[out["query_id"] == 0]["neighbor_id"].tolist()
    assert picks[0] in (10, 11)          # most relevant first
    assert picks[1] == 12                # the near-copy is suppressed
