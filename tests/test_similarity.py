"""Similarity search: brute-force top-k vs LSH-bucketed approximate top-k."""

SF = "/root/testdata/sf0.01"


def test_ann_lsh_recall_vs_brute_force(ray_session):
    from marc_record_merge_melindautils_ray.ops.similarity import q_ann_lsh, q_ann_topk

    exact = q_ann_topk(SF)
    approx = q_ann_lsh(SF)
    # recall@10 of the approximate result against exact top-10, per query
    recalls = []
    for qid, g in exact.groupby("query_id"):
        truth = set(g["neighbor_id"])
        got = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(truth & got) / len(truth))
    assert sum(recalls) / len(recalls) >= 0.5, recalls  # multi-probe LSH on
    # random 64-d vectors: candidates are a small corpus fraction, recall
    # necessarily approximate — the scale/recall trade-off under test


def test_ann_lsh_deterministic(ray_session):
    from marc_record_merge_melindautils_ray.ops.similarity import q_ann_lsh

    a = q_ann_lsh(SF)
    b = q_ann_lsh(SF)
    assert a.equals(b)


def test_ann_lsh_shuffle_matches_probe(ray_session):
    """The bucket-keyed shuffle variant must reproduce the probe variant's
    results at the same seeds (same candidate sets by construction)."""
    from marc_record_merge_melindautils_ray.ops.similarity import (
        q_ann_lsh,
        q_ann_lsh_shuffle,
    )

    sf = "/root/testdata/sf0.001"
    probe = q_ann_lsh(sf)
    shuffle = q_ann_lsh_shuffle(sf)
    assert probe.equals(shuffle)


def test_embed_dup_pairs_recall_vs_brute(ray_session):
    """LSH-bucketed embedding near-dup pairs: on the bounded slice where the
    brute-force all-pairs truth is known (q_cosine_pairs semantics), the
    bucketed pass must recover a solid fraction (multi-table recall), and
    every reported pair must genuinely be >= threshold (precision exact)."""
    import duckdb

    from marc_record_merge_melindautils_ray.ops.similarity import q_embed_dup_pairs

    sf = "/root/testdata/sf0.001"
    got = q_embed_dup_pairs(sf, threshold_permille=400)
    con = duckdb.connect()
    truth = con.execute(f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM read_parquet('{sf}/embeddings.parquet'))
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(round(list_cosine_similarity(a.e, b.e) * 1000, 0) AS BIGINT) AS s
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.e, b.e) * 1000, 0) >= 400
    """).df()
    truth_pairs = set(zip(truth["id_a"], truth["id_b"]))
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    assert got_pairs, "no pairs found"
    # precision vs the DuckDB truth: the kernel computes exact cosine inside
    # buckets, so every reported pair must be a true pair
    assert got_pairs <= truth_pairs, got_pairs - truth_pairs
    recall = len(got_pairs & truth_pairs) / max(1, len(truth_pairs))
    assert recall >= 0.5, f"bucketed recall {recall} too low vs brute force"


def test_embed_dup_pairs_adaptive_depth(ray_session, tmp_path):
    """Adaptive LSH depth: on a corpus sized to overflow round-2's fixed 64
    buckets/table, the frozen shallow config (n_planes=4, splitting disabled)
    collapses into the sorted-neighborhood fallback and misses the planted
    pairs, while the adaptive default keeps buckets under the matmul cap and
    recovers them — the round-2 verdict's headline scale defect."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.similarity import q_embed_dup_pairs

    rng = np.random.default_rng(42)
    n, dim, n_dup = 16384, 64, 200
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    # planted near-identical pairs (i, n - n_dup + i): ~16k apart in vec_id,
    # far beyond the fallback's w=8 sorted-neighborhood window
    for i in range(n_dup):
        mat[n - n_dup + i] = mat[i] + 0.01 * rng.standard_normal(dim).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    planted = {(i, n - n_dup + i) for i in range(n_dup)}

    m_fixed: dict = {}
    fixed = q_embed_dup_pairs(
        str(tmp_path), threshold_permille=900, n_planes=4, max_split_depth=0,
        metrics=m_fixed,
    )
    fixed_pairs = set(zip(fixed["id_a"], fixed["id_b"]))
    recall_fixed = len(fixed_pairs & planted) / len(planted)
    assert m_fixed["fallback_pair_frac"] > 0.5 or not fixed_pairs  # visibly degraded
    assert recall_fixed < 0.5, recall_fixed  # the failure mode, proven

    m_adaptive: dict = {}
    adaptive = q_embed_dup_pairs(str(tmp_path), threshold_permille=900, metrics=m_adaptive)
    adaptive_pairs = set(zip(adaptive["id_a"], adaptive["id_b"]))
    recall_adaptive = len(adaptive_pairs & planted) / len(planted)
    assert m_adaptive["n_planes"] >= 8, m_adaptive  # depth grew with the corpus
    assert m_adaptive["fallback_pair_frac"] == 0.0, m_adaptive
    assert recall_adaptive >= 0.9, recall_adaptive
    assert recall_adaptive > recall_fixed


def test_ann_ivf_recall_vs_brute_force(ray_session):
    """IVF (k-means cells, nprobe probing) must recover a solid fraction of
    the exact top-10 while scoring only ~nprobe/n_cells of the corpus."""
    from marc_record_merge_melindautils_ray.ops.similarity import q_ann_ivf, q_ann_topk

    exact = q_ann_topk(SF)
    approx = q_ann_ivf(SF)
    recalls = []
    for qid, g in exact.groupby("query_id"):
        truth = set(g["neighbor_id"])
        got = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(truth & got) / len(truth))
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_ann_ivf_deterministic(ray_session):
    from marc_record_merge_melindautils_ray.ops.similarity import q_ann_ivf

    a = q_ann_ivf(SF)
    b = q_ann_ivf(SF)
    assert a.equals(b)


# ----------------------------------------------------------------- SemDeDup
def test_semdedup_planted_groups(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.similarity import q_semdedup

    rng = np.random.default_rng(13)
    rows, vid = [], 0
    planted = []
    for g in range(3):  # three groups of near-identical vectors
        base = rng.standard_normal(64)
        members = []
        for j in range(3):
            v = base + 1e-3 * rng.standard_normal(64)
            rows.append((vid, v.astype(np.float32)))
            members.append(vid)
            vid += 1
        planted.append(members)
    for _ in range(50):  # random singletons (cosine ≪ τ w.h.p. in 64-d)
        rows.append((vid, rng.standard_normal(64).astype(np.float32)))
        vid += 1
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
    }), str(d / "embeddings.parquet"))

    out = q_semdedup(str(d), tau_permille=950)
    removed = dict(zip(out["vec_id"], out["keeper_id"]))
    for members in planted:
        keeper = min(members)
        for m in members:
            if m == keeper:
                assert m not in removed
            else:
                assert removed.get(m) == keeper, (m, removed.get(m))
    # no random singleton removed
    assert all(v < 9 for v in removed)


def test_semdedup_deterministic(ray_session):
    from marc_record_merge_melindautils_ray.ops.similarity import q_semdedup

    a = q_semdedup("/root/testdata/sf0.001")
    b = q_semdedup("/root/testdata/sf0.001")
    assert a.equals(b)


def test_embed_project_jl_distortion(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.similarity import q_embed_project

    out = q_embed_project("/root/testdata/sf0.001", out_dim=32)
    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    orig = {i: np.asarray(v, np.float64)
            for i, v in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())}
    proj = {i: np.asarray(v, np.float64)
            for i, v in zip(out["vec_id"], out["proj"])}
    rng = np.random.default_rng(3)
    ids = sorted(orig)
    errs = []
    for _ in range(300):
        a, b = rng.choice(ids, 2, replace=False)
        d0 = np.linalg.norm(orig[a] - orig[b])
        d1 = np.linalg.norm(proj[a] - proj[b])
        if d0 > 0:
            errs.append(abs(d1 - d0) / d0)
    errs = np.array(errs)
    # JL with d=32: typical distortion well under the (1±ε) envelope
    assert np.median(errs) < 0.15, np.median(errs)
    assert errs.max() < 0.6, errs.max()
    # deterministic reproduction
    out2 = q_embed_project("/root/testdata/sf0.001", out_dim=32)
    assert out.equals(out2)


def test_kmeans_planted_blobs_and_monotone_inertia(ray_session, tmp_path):
    """Distributed Lloyd's on three well-separated planted blobs: recovers
    the partition exactly, inertia is monotone non-increasing, and the
    result is identical across block layouts (determinism at any cluster
    size)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops.similarity import (
        kmeans_lloyd_distributed,
    )

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    rng = np.random.default_rng(7)
    dim, per = 16, 40
    bases = np.eye(dim)[:3] * 10.0
    vecs, labels = [], []
    for bi, base in enumerate(bases):
        for _ in range(per):
            vecs.append(base + rng.normal(0, 0.05, dim))
            labels.append(bi)
    # interleave blobs so init (k smallest vec_ids) starts impure
    order = rng.permutation(len(vecs))
    t = pa.table({
        "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
        "embedding": pa.array([vecs[i] for i in order]),
    })
    truth = np.array(labels)[order]

    out1, inertia, _ = kmeans_lloyd_distributed(
        rd.from_arrow(t), k=3, n_iters=6)
    assert all(b <= a + 1e-9 for a, b in zip(inertia, inertia[1:])), inertia
    # exact blob recovery: each k-means cluster maps 1:1 onto one blob
    df = out1.assign(truth=truth[out1.vec_id.to_numpy()])
    purity = df.groupby("cluster")["truth"].nunique()
    assert (purity == 1).all()
    assert df.groupby("truth")["cluster"].nunique().eq(1).all()

    # layout invariance: same rows split across two blocks → same output
    out2, _, _ = kmeans_lloyd_distributed(
        rd.from_arrow(t.slice(0, 60)).union(rd.from_arrow(t.slice(60))),
        k=3, n_iters=6)
    pd.testing.assert_frame_equal(out1, out2)


def test_ann_recall_self_report(ray_session):
    from marc_record_merge_melindautils_ray.ops.similarity import q_ann_recall

    out = q_ann_recall("/root/testdata/sf0.001")
    assert out.variant.tolist() == ["lsh", "lsh_shuffle", "ivf"]
    # the documented ANN trade on random 64-d vectors is recall ≥ 0.5
    # (tests/test_similarity.py::test_ann_lsh_recall_vs_brute_force)
    assert (out.recall_permille >= 500).all(), out
    assert (out.recall_permille <= 1000).all()
    # deterministic: a second run reports identical numbers
    out2 = q_ann_recall("/root/testdata/sf0.001")
    assert out.values.tolist() == out2.values.tolist()
