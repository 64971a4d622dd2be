"""Sequence-packing invariants: exhaustive + disjoint assignment, bin
capacity, oversize isolation, determinism across block layouts, and a
hand-pinned next-fit case."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from marc_record_merge_melindautils_ray.ops.packing import (
    next_fit_bins,
    q_pack_sequences,
)


def test_next_fit_hand_case():
    # budget 10: [4,5] fills bin0 (9); 3 opens bin1; 12 oversize → own bin;
    # then [2,8] fits bin3 exactly; 1 opens bin4
    tok = np.array([4, 5, 3, 12, 2, 8, 1], np.int64)
    assert next_fit_bins(tok, 10).tolist() == [0, 0, 1, 2, 3, 3, 4]
    assert next_fit_bins(np.array([], np.int64), 10).tolist() == []
    # oversize FIRST doc still isolates
    assert next_fit_bins(np.array([99, 1], np.int64), 10).tolist() == [0, 1]


def test_pack_sequences_invariants(ray_session):
    sf = "/root/testdata/sf0.001"
    out = q_pack_sequences(sf, budget=256, n_streams=8)
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])
    # exhaustive + disjoint
    assert sorted(out.doc_id.tolist()) == sorted(
        docs["doc_id"].to_pylist())
    assert out.doc_id.is_unique
    # every non-oversize bin respects the budget; oversize bins are singletons
    sums = out.groupby(["stream", "bin_idx"]).agg(
        tot=("n_tokens", "sum"), n=("doc_id", "count"),
        over=("oversize", "any"))
    assert (sums.loc[~sums.over, "tot"] <= 256).all()
    assert (sums.loc[sums.over, "n"] == 1).all()
    # within a stream, bins are contiguous in doc order (next-fit property)
    for _, g in out.sort_values("doc_id").groupby("stream"):
        b = g.bin_idx.to_numpy()
        assert (np.diff(b) >= 0).all() and b[0] == 0
        assert set(np.diff(b)) <= {0, 1}


def test_pack_sequences_layout_invariance(ray_session, tmp_path):
    """Same corpus split across parquet files in a different order packs
    identically — assignment depends only on (doc_id, text)."""
    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet")
    idx = np.argsort(np.asarray(t["n_chars"]), kind="stable")[::-1]
    shuf = t.take(pa.array(idx.copy()))
    d = tmp_path / "re"
    d.mkdir()
    half = len(shuf) // 2
    pq.write_table(shuf.slice(0, half), str(d / "documents.parquet"))
    # two-file layout: write the remainder as a second file in the same dir
    (d / "documents.parquet").rename(d / "part0.parquet")
    pq.write_table(shuf.slice(half), str(d / "part1.parquet"))
    import ray.data as rd
    from marc_record_merge_melindautils_ray.ops import packing
    orig_docs = packing._docs
    try:
        packing._docs = lambda _sf: rd.read_parquet(
            [str(d / "part0.parquet"), str(d / "part1.parquet")],
            columns=["doc_id", "text"])
        b = q_pack_sequences("ignored", budget=256, n_streams=8)
    finally:
        packing._docs = orig_docs
    a = q_pack_sequences(sf, budget=256, n_streams=8)
    pd.testing.assert_frame_equal(a, b)
