"""Similarity search over the ``embeddings`` table (``list<float>`` column).

* Brute-force cosine top-k — the baseline: broadcast the (small) query
  matrix once via ``ray.put``, per-batch numpy matmul against candidates,
  per-batch local top-k, tiny final merge.  Never materializes the candidate
  side on the driver.
* LSH-bucketed variant — the scale path: random-hyperplane bucket keys on
  both sides; only same-bucket candidates are scored (documented recall
  trade-off).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from marc_record_merge_melindautils_ray.stages.cluster import actor_pool_size

from marc_record_merge_melindautils_ray.functions.util import maybe_get, task_stage

_log = logging.getLogger(__name__)


def _emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _batch_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(t["vec_id"])
    emb = t["embedding"]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = np.asarray(emb.values, dtype=np.float64)
    dim = len(flat) // max(1, len(ids))
    return ids, flat.reshape(len(ids), dim)


def brute_force_topk(
    ds: rd.Dataset, query_ids: np.ndarray, query_mat: np.ndarray, k: int = 10
) -> pd.DataFrame:
    """Cosine top-k of each query against the full dataset (excl. self)."""
    qn = query_mat / np.linalg.norm(query_mat, axis=1, keepdims=True)
    ref = ray.put((query_ids, qn))

    def local(t: pa.Table) -> pd.DataFrame:
        q_ids, q = maybe_get(ref)
        ids, mat = _batch_matrix(t)
        matn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        sims = matn @ q.T  # (n_cand, n_query)
        out = []
        for qi in range(len(q_ids)):
            s = sims[:, qi]
            mask = ids != q_ids[qi]
            cand_ids, cand_s = ids[mask], s[mask]
            top = np.lexsort((cand_ids, -cand_s))[:k]
            out.append(pd.DataFrame({
                "query_id": q_ids[qi], "neighbor_id": cand_ids[top], "sim": cand_s[top],
            }))
        return pd.concat(out, ignore_index=True)

    parts = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    rows = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        rows.append(g[["query_id", "neighbor_id", "rank"]])
    return (
        pd.concat(rows, ignore_index=True)
        .astype({"query_id": np.int64, "neighbor_id": np.int64, "rank": np.int64})
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


def q_ann_topk(sf_dir: str) -> pd.DataFrame:
    """Top-10 cosine neighbors for the first 5 vectors."""
    ds = _emb(sf_dir)
    q = ds.map_batches(
        lambda t: t.filter(pa.compute.less(t["vec_id"], 5)), batch_format="pyarrow"
    ).to_pandas()
    q = q.sort_values("vec_id")
    qm = np.array([np.asarray(v, dtype=np.float64) for v in q["embedding"]])
    return brute_force_topk(ds, q["vec_id"].to_numpy(), qm, k=10)


def q_cosine_pairs(sf_dir: str, threshold_permille: int = 400) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs above a threshold, among vec_id<200 —
    all-pairs within the slice, vectorized; sim reported as integer permille
    of the rounded similarity so the oracle hash is float-safe."""
    ds = _emb(sf_dir)
    sl = ds.map_batches(
        lambda t: t.filter(pa.compute.less(t["vec_id"], 200)), batch_format="pyarrow"
    ).to_pandas().sort_values("vec_id")
    ids = sl["vec_id"].to_numpy()
    m = np.array([np.asarray(v, dtype=np.float64) for v in sl["embedding"]])
    mn = m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)
    S = mn @ mn.T
    ii, jj = np.triu_indices(len(ids), k=1)
    keep = np.round(S[ii, jj] * 1000) >= threshold_permille
    return pd.DataFrame({
        "id_a": ids[ii[keep]].astype(np.int64),
        "id_b": ids[jj[keep]].astype(np.int64),
    }).sort_values(["id_a", "id_b"]).reset_index(drop=True)


class HyperplaneLsh:
    """Random-hyperplane bucket keys for the scale path: same-bucket
    candidates only (stateful: projection matrix built once per actor)."""

    def __init__(self, dim: int = 64, n_planes: int = 8, seed: int = 99):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.powers = 1 << np.arange(n_planes)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(t)
        bits = (mat @ self.planes) > 0
        bucket = (bits * self.powers).sum(axis=1).astype(np.int64)
        return pa.table({"vec_id": pa.array(ids), "bucket": pa.array(bucket, pa.int64())})


def q_ann_lsh(sf_dir: str, k: int = 10, n_tables: int = 12) -> pd.DataFrame:
    """Approximate top-k via multi-table hyperplane LSH — the scale path:
    each query probes only its bucket in each of ``n_tables`` hash tables, so
    the scored candidate set is a small fraction of the corpus (the recall
    trade-off is measured against brute force in tests)."""
    ds = _emb(sf_dir)
    q = ds.map_batches(
        lambda t: t.filter(pa.compute.less(t["vec_id"], 5)), batch_format="pyarrow"
    ).to_pandas().sort_values("vec_id")
    q_ids = q["vec_id"].to_numpy()
    qm = np.array([np.asarray(v, dtype=np.float64) for v in q["embedding"]])
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    hashers = [HyperplaneLsh(dim=qm.shape[1], n_planes=4, seed=100 + t) for t in range(n_tables)]
    q_buckets = np.stack(
        [((qm @ h.planes) > 0) @ h.powers for h in hashers]
    )  # (n_tables, n_query)
    ref = ray.put((q_ids, qn, q_buckets, [h.planes for h in hashers],
                   [h.powers for h in hashers]))

    def local(t: pa.Table) -> pd.DataFrame:
        q_ids_, qn_, qb, planes, powers = maybe_get(ref)
        ids, mat = _batch_matrix(t)
        matn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        cand_mask = np.zeros((len(ids), len(q_ids_)), dtype=bool)
        for ti in range(len(planes)):
            cb = ((mat @ planes[ti]) > 0) @ powers[ti]
            cand_mask |= cb[:, None] == qb[ti][None, :]
        out = []
        for qi in range(len(q_ids_)):
            mask = cand_mask[:, qi] & (ids != q_ids_[qi])
            if not mask.any():
                continue
            sims = matn[mask] @ qn_[qi]
            cid = ids[mask]
            top = np.lexsort((cid, -sims))[: 2 * k]  # per-batch retention scales with k
            out.append(pd.DataFrame({
                "query_id": q_ids_[qi], "neighbor_id": cid[top], "sim": sims[top],
            }))
        if not out:
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "neighbor_id": pd.Series([], dtype=np.int64),
                                 "sim": pd.Series([], dtype=np.float64)})
        return pd.concat(out, ignore_index=True)

    parts = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    rows = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        rows.append(g[["query_id", "neighbor_id", "rank"]])
    if not rows:
        return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                             "neighbor_id": pd.Series([], dtype=np.int64),
                             "rank": pd.Series([], dtype=np.int64)})
    return (
        pd.concat(rows, ignore_index=True)
        .astype({"query_id": np.int64, "neighbor_id": np.int64, "rank": np.int64})
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


def q_ann_lsh_shuffle(sf_dir: str, k: int = 10, n_tables: int = 12) -> pd.DataFrame:
    """Bucket-keyed SHUFFLE variant of ``q_ann_lsh`` — the scale path for
    LARGE query sets.  The probe variant masks every corpus batch against
    every query (fine for a handful of queries, O(batches × queries) rescans
    otherwise); here each corpus row emits one row per (table, bucket) hit
    against the BROADCAST set of query-occupied buckets, a
    partition-then-vectorize groupby co-locates candidates with their
    queries, and a tiny driver merge takes the global top-k.  Equivalent to
    ``q_ann_lsh`` (identical on the tested seeds/data) whenever no
    (table, bucket) group holds more than ``2k`` candidates for a query: this
    variant prunes top-``2k`` per bucket key while the probe variant prunes
    top-``2k`` per corpus batch over the union of table hits, so a bucket
    crowded beyond that can diverge in the tail of the top-k."""
    ds = _emb(sf_dir)
    q = ds.map_batches(
        lambda t: t.filter(pa.compute.less(t["vec_id"], 5)), batch_format="pyarrow"
    ).to_pandas().sort_values("vec_id")
    q_ids = q["vec_id"].to_numpy()
    qm = np.array([np.asarray(v, dtype=np.float64) for v in q["embedding"]])
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    hashers = [HyperplaneLsh(dim=qm.shape[1], n_planes=4, seed=100 + t) for t in range(n_tables)]
    # key = table << 8 | bucket  (n_planes=4 → bucket < 16)
    q_keys = np.stack(
        [(np.int64(ti) << 8) | (((qm @ h.planes) > 0) @ h.powers).astype(np.int64)
         for ti, h in enumerate(hashers)]
    )  # (n_tables, nq)
    wanted = np.unique(q_keys.reshape(-1))
    # per bucket-key: which queries probe it (list arrays, broadcast once)
    key_to_queries = {int(kk): q_ids[np.unique(np.nonzero(q_keys == kk)[1])] for kk in wanted}
    ref = ray.put((q_ids, qn, [h.planes for h in hashers], [h.powers for h in hashers],
                   np.sort(wanted), key_to_queries))

    def emit_candidates(t: pa.Table) -> pa.Table:
        q_ids_, _, planes, powers, wanted_, _ = maybe_get(ref)
        ids, mat = _batch_matrix(t)
        matn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        out_key, out_id, out_vec = [], [], []
        for ti in range(len(planes)):
            keys = (np.int64(ti) << 8) | (((mat @ planes[ti]) > 0) @ powers[ti]).astype(np.int64)
            pos = np.searchsorted(wanted_, keys)
            hit = (pos < len(wanted_)) & (wanted_[np.minimum(pos, len(wanted_) - 1)] == keys)
            if hit.any():
                out_key.append(keys[hit])
                out_id.append(ids[hit])
                out_vec.append(matn[hit])
        if not out_key:
            return pa.table({
                "key": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "nvec": pa.FixedSizeListArray.from_arrays(
                    pa.array([], pa.float64()), mat.shape[1] if mat.size else 64
                ),
            })
        kcat = np.concatenate(out_key)
        icat = np.concatenate(out_id).astype(np.int64)
        vcat = np.concatenate(out_vec)
        return pa.table({
            "key": pa.array(kcat, pa.int64()),
            "vec_id": pa.array(icat, pa.int64()),
            "nvec": pa.FixedSizeListArray.from_arrays(
                pa.array(vcat.reshape(-1), pa.float64()), vcat.shape[1]
            ),
        })

    def score_partition(g: pd.DataFrame) -> pd.DataFrame:
        q_ids_, qn_, _, _, _, key_to_q = maybe_get(ref)
        qrow = {int(qid): i for i, qid in enumerate(q_ids_)}
        out = []
        for kk, sub in g.groupby("key"):
            cids = sub["vec_id"].to_numpy()
            mat = np.stack(sub["nvec"].to_numpy())
            for qid in key_to_q[int(kk)]:
                mask = cids != qid
                if not mask.any():
                    continue
                sims = mat[mask] @ qn_[qrow[int(qid)]]
                cc = cids[mask]
                top = np.lexsort((cc, -sims))[: 2 * k]
                out.append(pd.DataFrame({
                    "query_id": np.int64(qid), "neighbor_id": cc[top], "sim": sims[top],
                }))
        if not out:
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "neighbor_id": pd.Series([], dtype=np.int64),
                                 "sim": pd.Series([], dtype=np.float64)})
        return pd.concat(out, ignore_index=True)

    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64

    def add_part(t: pa.Table) -> pa.Table:
        kk = np.asarray(t["key"]).view(np.uint64)
        part = (splitmix64(kk) % np.uint64(16)).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    parts = (
        ds.map_batches(emit_candidates, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(score_partition, batch_format="pandas")
        .to_pandas()
    )
    rows = []
    for qid, g in parts.groupby("query_id"):
        # a candidate found in several tables appears once per table: dedup
        g = g.drop_duplicates("neighbor_id")
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        rows.append(g[["query_id", "neighbor_id", "rank"]])
    if not rows:
        return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                             "neighbor_id": pd.Series([], dtype=np.int64),
                             "rank": pd.Series([], dtype=np.int64)})
    return (
        pd.concat(rows, ignore_index=True)
        .astype({"query_id": np.int64, "neighbor_id": np.int64, "rank": np.int64})
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


def adaptive_planes(n_rows: int, target_bucket: int = 64, lo: int = 4, hi: int = 16) -> int:
    """LSH depth sized to the corpus: ``2**n_planes`` buckets per table such
    that the EXPECTED bucket population is ~``target_bucket``.  A fixed depth
    (the round-2 defect) means bucket population grows O(N/2**planes) and at
    100× every bucket silently exceeds the matmul cap; deriving the depth
    from a cheap metadata row count keeps per-bucket work constant as the
    corpus grows."""
    if n_rows <= target_bucket:
        return lo
    return int(min(hi, max(lo, np.ceil(np.log2(n_rows / target_bucket)))))


def q_embed_dup_pairs(
    sf_dir: str, threshold_permille: int = 400, n_tables: int = 8,
    n_planes: int | None = None, bucket_cap: int = 512, target_bucket: int = 64,
    max_split_depth: int = 8, metrics: dict | None = None,
    ds: rd.Dataset | None = None, dim: int = 64,
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs over the FULL embeddings table —
    the scale path (``q_cosine_pairs`` is the all-pairs oracle demo on a
    bounded slice).  Multi-table hyperplane buckets on every row → hash
    partitions → per-bucket vectorized cosine (one matmul per bucket) →
    global pair dedup by pair-key partition.  Never all-pairs, never a
    driver-side matrix.

    Scale behavior (round-3): ``n_planes`` defaults to ``adaptive_planes``
    (sized from a cheap metadata row count so expected bucket population is
    ~``target_bucket`` regardless of N), and buckets that still exceed
    ``bucket_cap`` (skewed regions of embedding space) are RECURSIVELY SPLIT
    on extra hyperplanes (seed derived from the bucket key, so each table
    splits differently) instead of degrading to a fixed-window scan; only a
    bucket still over cap at ``max_split_depth`` takes the visible
    sorted-neighborhood fallback.  Leaf bucket sizes and the fallback
    fraction are surfaced through ``metrics`` (and logged), not dropped.
    Output: (id_a, id_b, sim_permille) with sim ≥ threshold."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64
    from marc_record_merge_melindautils_ray.stages.cluster import actor_pool_size, adaptive_parts

    if ds is None:
        ds = _emb(sf_dir)
    n_rows = ds.count()  # parquet metadata count — no data read
    if n_planes is None:
        n_planes = adaptive_planes(n_rows, target_bucket)
    num_parts = adaptive_parts(n_rows * n_tables)
    hashers = [
        HyperplaneLsh(dim=dim, n_planes=n_planes, seed=7000 + t) for t in range(n_tables)
    ]
    planes_ref = ray.put(([h.planes for h in hashers], [h.powers for h in hashers]))

    def emit(t: pa.Table) -> pa.Table:
        planes, powers = maybe_get(planes_ref)
        ids, mat = _batch_matrix(t)
        matn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        keys, rid = [], []
        shift = planes[0].shape[1]  # bucket fits in n_planes bits
        for ti in range(len(planes)):
            kk = (np.int64(ti) << shift) | (((mat @ planes[ti]) > 0) @ powers[ti]).astype(np.int64)
            keys.append(kk)
            rid.append(np.arange(len(ids)))
        kcat = np.concatenate(keys)
        rcat = np.concatenate(rid)
        return pa.table({
            "key": pa.array(kcat, pa.int64()),
            "vec_id": pa.array(ids[rcat].astype(np.int64), pa.int64()),
            "nvec": pa.FixedSizeListArray.from_arrays(
                pa.array(matn[rcat].reshape(-1), pa.float64()), matn.shape[1]
            ),
        })

    def add_part(t: pa.Table, col: str) -> pa.Table:
        if "part" in t.column_names:
            t = t.drop_columns(["part"])
        kk = np.asarray(t[col]).view(np.uint64)
        part = (splitmix64(kk) % np.uint64(num_parts)).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    empty = pd.DataFrame({
        "id_a": pd.Series([], dtype=np.int64), "id_b": pd.Series([], dtype=np.int64),
        "sim_permille": pd.Series([], dtype=np.int64),
        "bucket_n": pd.Series([], dtype=np.int64),
        "fallback": pd.Series([], dtype=bool),
    })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["key", "vec_id"]).drop_duplicates(["key", "vec_id"])
        g = g.reset_index(drop=True)
        keys = g["key"].to_numpy()
        n = len(g)
        if n < 2:
            return empty
        ids = g["vec_id"].to_numpy()
        mat = np.stack(g["nvec"].to_numpy())
        dim = mat.shape[1]
        out = []

        def emit_leaf(idx: np.ndarray, fallback: bool) -> None:
            sz = len(idx)
            sub = mat[idx]
            if not fallback:
                sims = sub @ sub.T
                ii, jj = np.triu_indices(int(sz), k=1)
                sv = sims[ii, jj]
            else:  # visible sorted-neighborhood fallback (over cap at max depth)
                w = 8
                base = np.arange(sz)
                ii = np.concatenate([base[:-d] for d in range(1, w + 1) if d < sz])
                jj = np.concatenate([base[d:] for d in range(1, w + 1) if d < sz])
                sv = np.einsum("ij,ij->i", sub[ii], sub[jj])
            keep = np.round(sv * 1000).astype(np.int64) >= threshold_permille
            if not keep.any():
                return
            a, b = ids[idx[ii[keep]]], ids[idx[jj[keep]]]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            out.append(pd.DataFrame({
                "id_a": lo, "id_b": hi,
                "sim_permille": np.round(sv[keep] * 1000).astype(np.int64),
                "bucket_n": np.full(int(keep.sum()), sz, np.int64),
                "fallback": np.full(int(keep.sum()), fallback),
            }))

        def split_bucket(idx: np.ndarray, key: int, depth: int) -> None:
            """Over-cap buckets are split on 2 extra hyperplanes (seed derived
            from the bucket key → each table splits differently, preserving
            multi-table recall) rather than degraded to a window scan."""
            sz = len(idx)
            if sz < 2:
                return
            if sz <= bucket_cap:
                emit_leaf(idx, fallback=False)
                return
            if depth >= max_split_depth:
                emit_leaf(idx, fallback=True)
                return
            rng = np.random.default_rng([9176, key & 0x7FFFFFFF, depth])
            planes = rng.standard_normal((dim, 2))
            bits = ((mat[idx] @ planes) > 0) @ np.array([1, 2])
            for b in range(4):
                split_bucket(idx[bits == b], key * 4 + b, depth + 1)

        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        sizes = np.diff(np.r_[starts, n])
        for s, sz in zip(starts, sizes):
            split_bucket(np.arange(s, s + sz), int(keys[s]), 0)
        return pd.concat(out, ignore_index=True) if out else empty

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["id_a", "id_b"]).drop_duplicates(["id_a", "id_b"])
        return g[["id_a", "id_b", "sim_permille", "bucket_n", "fallback"]]

    out = (
        ds.map_batches(emit, batch_format="pyarrow")
        .map_batches(lambda t: add_part(t, "key"), batch_format="pyarrow")
        .groupby("part")
        .map_groups(bucket_pairs, batch_format="pandas")
        .map_batches(
            lambda t: add_part(
                t.append_column(
                    "pk",
                    pa.array(
                        (np.asarray(t["id_a"], np.int64) << 32)
                        ^ np.asarray(t["id_b"], np.int64),
                        pa.int64(),
                    ),
                ),
                "pk",
            ),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(dedup_pairs, batch_format="pandas")
        .to_pandas()
    )
    meta = {
        "n_rows": int(n_rows), "n_planes": int(n_planes), "n_tables": int(n_tables),
        "num_parts": int(num_parts),
        "max_bucket_n": int(out["bucket_n"].max()) if len(out) else 0,
        "fallback_pair_frac": float(out["fallback"].mean()) if len(out) else 0.0,
    }
    _log.info("q_embed_dup_pairs metrics: %s", meta)
    if metrics is not None:
        metrics.update(meta)
    if out.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                             "id_b": pd.Series([], dtype=np.int64),
                             "sim_permille": pd.Series([], dtype=np.int64)})
    out = out[["id_a", "id_b", "sim_permille"]]
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True).astype(np.int64)


def _kmeans(sample: np.ndarray, k: int, iters: int = 12, seed: int = 1234) -> np.ndarray:
    """Small deterministic k-means on a normalized driver-side SAMPLE (the
    classic IVF coarse quantizer training step — the sample is bounded, the
    corpus never leaves the workers)."""
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)].copy()
    for _ in range(iters):
        assign = (sample @ cent.T).argmax(axis=1)  # cosine on normalized rows
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def q_ann_ivf(
    sf_dir: str, k: int = 10, n_cells: int | None = None, nprobe: int = 8,
    sample_cap: int = 2048,
) -> pd.DataFrame:
    """Approximate top-k via an IVF index — the k-means counterpart to the
    hyperplane scale path.  Train a coarse quantizer on a bounded
    deterministic sample (driver-side, classic IVF), broadcast the centroid
    matrix once via ``ray.put``, then each corpus batch assigns its rows to
    cells with one matmul and scores only rows whose cell is among each
    query's ``nprobe`` nearest cells.  Candidate fraction ≈ nprobe/n_cells;
    recall vs brute force is measured in tests."""
    ds = _emb(sf_dir)
    n_rows = ds.count()
    if n_cells is None:
        n_cells = max(4, int(np.sqrt(max(1, n_rows))))
    step = max(1, n_rows // sample_cap)

    def take_strided(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"])
        return t.filter(pa.array(ids % step == 0))

    sample = ds.map_batches(take_strided, batch_format="pyarrow").to_pandas()
    smat = np.array([np.asarray(v, np.float64) for v in sample["embedding"]])
    smat = smat / np.clip(np.linalg.norm(smat, axis=1, keepdims=True), 1e-12, None)
    cent = _kmeans(smat, n_cells)

    q = ds.map_batches(
        lambda t: t.filter(pa.compute.less(t["vec_id"], 5)), batch_format="pyarrow"
    ).to_pandas().sort_values("vec_id")
    q_ids = q["vec_id"].to_numpy()
    qm = np.array([np.asarray(v, np.float64) for v in q["embedding"]])
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    # per query: the nprobe nearest cells
    q_cells = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    ref = ray.put((q_ids, qn, cent, q_cells))

    def local(t: pa.Table) -> pd.DataFrame:
        q_ids_, qn_, cent_, q_cells_ = maybe_get(ref)
        ids, mat = _batch_matrix(t)
        matn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        cells = (matn @ cent_.T).argmax(axis=1)
        out = []
        for qi in range(len(q_ids_)):
            mask = np.isin(cells, q_cells_[qi]) & (ids != q_ids_[qi])
            if not mask.any():
                continue
            sims = matn[mask] @ qn_[qi]
            cid = ids[mask]
            top = np.lexsort((cid, -sims))[: 2 * k]
            out.append(pd.DataFrame({
                "query_id": q_ids_[qi], "neighbor_id": cid[top], "sim": sims[top],
            }))
        if not out:
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "neighbor_id": pd.Series([], dtype=np.int64),
                                 "sim": pd.Series([], dtype=np.float64)})
        return pd.concat(out, ignore_index=True)

    parts = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    rows = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        rows.append(g[["query_id", "neighbor_id", "rank"]])
    if not rows:
        return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                             "neighbor_id": pd.Series([], dtype=np.int64),
                             "rank": pd.Series([], dtype=np.int64)})
    return (
        pd.concat(rows, ignore_index=True)
        .astype({"query_id": np.int64, "neighbor_id": np.int64, "rank": np.int64})
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


def lsh_bucket_counts(sf_dir: str) -> pd.DataFrame:
    ds = _emb(sf_dir)
    out = (
        ds.map_batches(
            task_stage(HyperplaneLsh, (64, 8, 99), key=("hlsh", 64, 8, 99)),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .count()
        .to_pandas()
    )
    out.columns = ["bucket", "n_vectors"]
    return out.sort_values("bucket").reset_index(drop=True)


# --------------------------------------------------------------- SemDeDup
def q_semdedup(
    sf_dir: str, n_cells: int | None = None, tau_permille: int = 450,
    sample_cap: int = 2048,
) -> pd.DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., arXiv 2303.09540
    — public): k-means cluster the normalized embeddings, then within each
    cluster remove all but one member of every cosine-≥-τ duplicate group.

    Distributed plan: the coarse quantizer trains on a bounded deterministic
    sample (same as ``q_ann_ivf``); centroids broadcast once via ``ray.put``;
    each batch assigns rows to cells with ONE matmul and pre-keys the cell
    shuffle; per-cell work is a vectorized pairwise-cosine + union-find over
    the ≥τ pairs.  Keeper rule: deterministic min ``vec_id`` per duplicate
    component (the paper keeps an arbitrary representative — a deterministic
    choice makes output layout-invariant and resumable).

    Cell sizes are the scale knob: E[cell] = N/n_cells; the within-cell
    pairwise cost is Σ|cell|², so n_cells ∝ N keeps per-task work constant.
    Returns removals: (vec_id, keeper_id, cell) — rows to DROP.  The
    default τ=0.45 is calibrated to the synthetic table's similarity
    range (max off-diagonal cosine ≈0.51); production semantic dedup
    runs at ≈0.95 (the paper's regime) — the knob, not the plan,
    changes.
    """
    ds = _emb(sf_dir)
    n_rows = ds.count()
    if n_cells is None:
        n_cells = max(4, int(np.sqrt(max(1, n_rows))))
    step = max(1, n_rows // sample_cap)

    def take_strided(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"])
        return t.filter(pa.array(ids % step == 0))

    sample = ds.map_batches(take_strided, batch_format="pyarrow").to_pandas()
    smat = np.array([np.asarray(v, np.float64) for v in sample["embedding"]])
    smat = smat / np.clip(np.linalg.norm(smat, axis=1, keepdims=True), 1e-12, None)
    cent = _kmeans(smat, n_cells)
    cref = ray.put(cent)
    tau = tau_permille / 1000.0

    def assign(t: pa.Table) -> pa.Table:
        cent_ = maybe_get(cref)
        ids, mat = _batch_matrix(t)
        matn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        cells = (matn @ cent_.T).argmax(axis=1).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cell": pa.array(cells, pa.int64()),
            "emb": pa.array([r.astype(np.float32) for r in matn],
                            pa.list_(pa.float32())),
        })

    def dedup_cell(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "vec_id": pd.Series([], dtype=np.int64),
            "keeper_id": pd.Series([], dtype=np.int64),
            "cell": pd.Series([], dtype=np.int64),
        })
        n = len(g)
        if n < 2:
            return empty
        g = g.sort_values("vec_id").reset_index(drop=True)
        ids = g["vec_id"].to_numpy(np.int64)
        M = np.array([np.asarray(v, np.float64) for v in g["emb"]])
        sims = M @ M.T
        ii, jj = np.nonzero(np.triu(sims >= tau, k=1))
        if not len(ii):
            return empty
        # union-find over ≥τ pairs; min-id root = the keeper
        parent = np.arange(n)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(ii, jj):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                # ids are sorted ascending ⇒ smaller index = smaller vec_id
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        roots = np.array([find(int(x)) for x in range(n)])
        drop = roots != np.arange(n)
        return pd.DataFrame({
            "vec_id": ids[drop],
            "keeper_id": ids[roots[drop]],
            "cell": g["cell"].to_numpy(np.int64)[drop],
        })

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(dedup_cell, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({
            "vec_id": pd.Series([], dtype=np.int64),
            "keeper_id": pd.Series([], dtype=np.int64),
            "cell": pd.Series([], dtype=np.int64),
        })
    return (
        out.astype(np.int64).sort_values("vec_id").reset_index(drop=True)
    )


# ------------------------------------------- random-projection dim reduction
def q_embed_project(sf_dir: str, out_dim: int = 32, seed: int = 77) -> pd.DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: deterministic
    Rademacher ±1/√d projection (Achlioptas 2001, public — JL-valid with the
    same distortion bounds as Gaussian), applied per batch as ONE matmul.
    The projection matrix derives from (seed, dims) via splitmix64, so any
    worker regenerates it identically — nothing to broadcast, layout- and
    retry-invariant.  Typical use: shrink embeddings before an ANN/dedup
    pass whose cost scales with dimension."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64

    ds = _emb(sf_dir)

    def project(t: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(t)
        d_in = mat.shape[1] if len(mat) else 0
        if not len(ids):
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "proj": pa.array([], pa.list_(pa.float32())),
            })
        # Rademacher signs from a counter-mode splitmix64 stream
        idx = np.arange(d_in * out_dim, dtype=np.uint64) + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
        signs = (splitmix64(idx) & np.uint64(1)).astype(np.float64) * 2.0 - 1.0
        R = signs.reshape(d_in, out_dim) / np.sqrt(out_dim)
        P = (mat @ R).astype(np.float32)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "proj": pa.array([r for r in P], pa.list_(pa.float32())),
        })

    out = ds.map_batches(project, batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


# ----------------------------------------------------- distributed k-means
def kmeans_lloyd_distributed(
    ds: rd.Dataset, k: int = 8, n_iters: int = 10, seed_stride: bool = True,
) -> tuple[pd.DataFrame, list[float], np.ndarray]:
    """Full-corpus Lloyd's k-means — the iterative broadcast-centroid
    pattern (unlike ``q_ann_ivf``, which trains its quantizer on a bounded
    driver-side sample, this assigns EVERY row every iteration).

    Per iteration: centroids broadcast once (``ray.put``); each batch
    assigns its rows with one matmul and emits a k-row partial
    ``(cluster, count, vector sum, squared-distance sum)`` — the shuffle
    is O(k · batches) regardless of corpus size; the driver folds partials
    and updates centroids (empty cluster keeps its previous centroid).
    Euclidean on L2-normalized vectors, so the assignment argmax is the
    cosine argmax.  The working set is materialized once into the object
    store — the standard cache for an iterative pass (spills under
    pressure rather than re-decoding parquet × iterations).

    Initialization is a deterministic stride sample of k rows (layout-
    independent: the k SMALLEST vec_ids), so results are reproducible on
    any cluster size.  Returns (assignments sorted by vec_id, per-iteration
    inertia — monotone non-increasing, pinned in tests —, final centroid
    matrix)."""
    import ray

    def normalize(t: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(t)
        matn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True),
                             1e-12, None)
        return pa.table({
            "vec_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
            "embedding": pa.array(list(matn.astype(np.float64))),
        })

    dsn = ds.map_batches(normalize, batch_format="pyarrow").materialize()

    # deterministic init: the k smallest vec_ids (a global sort of a
    # k-row head — tiny), layout-invariant by construction
    head = dsn.sort("vec_id").limit(k).to_pandas()
    cent = np.array([np.asarray(v, np.float64) for v in head["embedding"]])
    dim = cent.shape[1]

    inertia_trace: list[float] = []
    for _ in range(n_iters):
        ref = ray.put(cent)

        def partial(t: pa.Table) -> pa.Table:
            c = maybe_get(ref)
            ids, mat = _batch_matrix(t)
            sims = mat @ c.T
            assign = sims.argmax(axis=1)
            # ||x - c||² = 2 − 2·cos on unit vectors
            sq = 2.0 - 2.0 * sims[np.arange(len(ids)), assign]
            counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
            sq_sum = np.bincount(assign, weights=sq, minlength=len(c))
            vsum = np.zeros((len(c), mat.shape[1]))
            np.add.at(vsum, assign, mat)
            return pa.table({
                "cluster": pa.array(np.arange(len(c)), pa.int64()),
                "n": pa.array(counts, pa.int64()),
                "sq": pa.array(sq_sum, pa.float64()),
                "vsum": pa.array(list(vsum)),
            })

        agg_n = np.zeros(k, np.int64)
        agg_sq = 0.0
        agg_v = np.zeros((k, dim))
        for b in dsn.map_batches(partial, batch_format="pyarrow") \
                    .iter_batches(batch_format="pyarrow"):
            cl = np.asarray(b["cluster"], np.int64)
            agg_n[cl] += np.asarray(b["n"], np.int64)
            agg_sq += float(np.asarray(b["sq"], np.float64).sum())
            agg_v[cl] += np.asarray(b["vsum"].combine_chunks().values,
                                    np.float64).reshape(-1, dim)
        inertia_trace.append(agg_sq)
        # deterministic early stop: a converged assignment makes every
        # further full-corpus pass pure waste
        if (len(inertia_trace) >= 2
                and inertia_trace[-2] - inertia_trace[-1]
                <= 1e-9 * max(inertia_trace[-2], 1e-12)):
            break
        nz = agg_n > 0
        newc = cent.copy()
        newc[nz] = agg_v[nz] / agg_n[nz, None]
        norms = np.clip(np.linalg.norm(newc, axis=1, keepdims=True),
                        1e-12, None)
        cent = newc / norms

    final_ref = ray.put(cent)

    def assign_rows(t: pa.Table) -> pa.Table:
        c = maybe_get(final_ref)
        ids, mat = _batch_matrix(t)
        a = (mat @ c.T).argmax(axis=1).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
            "cluster": pa.array(a, pa.int64()),
        })

    out = (dsn.map_batches(assign_rows, batch_format="pyarrow")
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    return out, inertia_trace, cent


def q_kmeans_embeddings(sf_dir: str, k: int = 8,
                        n_iters: int = 10) -> pd.DataFrame:
    """``queries()`` surface for distributed Lloyd's k-means over the
    embeddings table: (vec_id, cluster) for every vector.  Rows-only — an
    iterative algorithm SQL cannot express; invariants (inertia monotone
    non-increasing, layout-invariant determinism, planted-blob recovery)
    are pinned in tests/test_similarity.py."""
    out, _, _ = kmeans_lloyd_distributed(_emb(sf_dir), k=k, n_iters=n_iters)
    return out


def q_ann_recall(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Self-evaluating ANN quality report: recall@k of each approximate
    variant (hyperplane LSH, LSH-shuffle, IVF) against the brute-force
    cosine truth on the same queries — the ANN analog of
    ``clips_dedup_quality``'s self-report, so every run surfaces its own
    accuracy instead of burying it in tests.  Cost: the truth is one
    brute-force pass (the ``ann_topk`` query), each variant its normal
    bucketed pass; comparison is per-query set intersection on the driver
    over k·|queries| rows — O(1) in corpus size."""
    truth = q_ann_topk(sf_dir)
    t_sets = {qid: set(g["neighbor_id"]) for qid, g in truth.groupby("query_id")}

    rows = []
    for name, fn in (("lsh", q_ann_lsh), ("lsh_shuffle", q_ann_lsh_shuffle),
                     ("ivf", q_ann_ivf)):
        approx = fn(sf_dir)
        hits = total = 0
        for qid, g in approx.groupby("query_id"):
            want = t_sets.get(qid, set())
            hits += len(set(g["neighbor_id"]) & want)
            total += len(want)
        rows.append((name, 1000 * hits // max(total, 1)))
    return pd.DataFrame({
        "variant": [r[0] for r in rows],
        "recall_permille": np.array([r[1] for r in rows], np.int64),
    })


# ---------------------------------------------------------- int8 quantize
def q_embed_quantize(sf_dir: str) -> rd.Dataset:
    """Per-vector symmetric int8 quantization of the embedding column — the
    vector-store compression pass (4× smaller, scale stored per row).  One
    vectorized pass: scale_micro = round(1e6·max|v|/127), codes = round(v/
    scale) clipped to [−127, 127]; the stage also emits the measured
    max reconstruction error in micro units so quality is auditable per row
    (bounded by scale/2 ≤ max|v|/254 + rounding).  Row-local, zero shuffle;
    rows-only (list-typed output) with the bound pinned in tests."""

    def kern(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        flat = np.asarray(emb.combine_chunks().flatten()
                          if isinstance(emb, pa.ChunkedArray)
                          else emb.flatten(), np.float64)
        offs = np.asarray(
            (emb.combine_chunks() if isinstance(emb, pa.ChunkedArray)
             else emb).offsets, np.int64)
        n = len(t)
        if n == 0:
            return pa.table({
                "vec_id": t["vec_id"],
                "codes": pa.array([], pa.list_(pa.int8())),
                "scale_micro": pa.array([], pa.int64()),
                "max_err_micro": pa.array([], pa.int64()),
            })
        mat = flat.reshape(n, -1) if (offs[1:] - offs[:-1] == offs[1] - offs[0]).all() else None
        if mat is None:  # ragged fallback (not hit by the testdata)
            # quantize each row at its OWN length: zero-padding to the batch
            # max would emit phantom trailing dimensions in the codes.
            code_rows, scale_l, err_l = [], [], []
            for i in range(n):
                r = flat[offs[i]:offs[i + 1]]
                am = np.abs(r).max() if len(r) else 0.0
                sc = am / 127.0 if am > 0 else 1.0
                c = np.clip(np.round(r / sc), -127, 127).astype(np.int8)
                code_rows.append(c)
                scale_l.append(sc)
                err_l.append(np.abs(c.astype(np.float64) * sc - r).max()
                             if len(r) else 0.0)
            scale = np.asarray(scale_l, np.float64)
            err = np.asarray(err_l, np.float64)
            codes_arr = pa.array(code_rows, pa.list_(pa.int8()))
        else:
            amax = np.abs(mat).max(axis=1)
            scale = np.where(amax > 0, amax / 127.0, 1.0)
            codes = np.clip(np.round(mat / scale[:, None]), -127, 127).astype(np.int8)
            err = np.abs(codes.astype(np.float64) * scale[:, None] - mat).max(axis=1)
            codes_arr = pa.array(list(codes), pa.list_(pa.int8()))
        return pa.table({
            "vec_id": t["vec_id"],
            "codes": codes_arr,
            "scale_micro": pa.array(np.round(scale * 1e6).astype(np.int64),
                                    pa.int64()),
            "max_err_micro": pa.array(np.round(err * 1e6).astype(np.int64),
                                      pa.int64()),
        })

    return rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(kern, batch_format="pyarrow")


# ------------------------------------------------------------------ MMR
def q_mmr_rerank(sf_dir: str, k: int = 10, m: int = 50,
                 lam_permille: int = 500) -> pd.DataFrame:
    """Maximal-Marginal-Relevance diverse top-k (the retrieval reranker):
    distributed brute-force top-m candidate fetch per query (per-block local
    top-m with sims AND vectors — m·dim floats per block, tiny), then the
    O(m·k) greedy MMR selection on the driver over the merged candidate set.
    Relevance/diversity scores round to integer micro before every argmax
    (ties by id), so the selection is deterministic on any block layout.
    Rows-only; duplicate-suppression and λ=1 ≡ plain top-k pinned in
    tests."""
    import ray

    from marc_record_merge_melindautils_ray.functions.util import maybe_get

    ds = _emb(sf_dir)
    q = ds.map_batches(
        lambda t: t.filter(pa.compute.less(t["vec_id"], 3)), batch_format="pyarrow"
    ).to_pandas().sort_values("vec_id")
    q_ids = q["vec_id"].to_numpy(np.int64)
    qm = np.array([np.asarray(v, np.float64) for v in q["embedding"]])
    qn = qm / np.clip(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12, None)
    ref = ray.put((q_ids, qn))

    def local(t: pa.Table) -> pd.DataFrame:
        qi_ids, qv = maybe_get(ref)
        ids, mat = _batch_matrix(t)
        matn = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        sims = matn @ qv.T
        out = []
        for j in range(len(qi_ids)):
            s = sims[:, j]
            mask = ids != qi_ids[j]
            cid, cs, cv = ids[mask], s[mask], matn[mask]
            # order by MICRO-rounded sim (the selection currency) so the
            # block-local and merged orderings agree exactly
            top = np.lexsort((cid, -np.round(cs * 1e6).astype(np.int64)))[:m]
            out.append(pd.DataFrame({
                "query_id": qi_ids[j],
                "cand_id": cid[top].astype(np.int64),
                "sim_micro": np.round(cs[top] * 1e6).astype(np.int64),
                "vec": [v.tobytes() for v in cv[top]],
            }))
        return pd.concat(out, ignore_index=True)

    parts = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    rows = []
    for qid, g in parts.groupby("query_id"):
        g = (g.sort_values(["sim_micro", "cand_id"], ascending=[False, True])
             .head(m).reset_index(drop=True))
        cid = g["cand_id"].to_numpy(np.int64)
        rel = g["sim_micro"].to_numpy(np.int64)
        vecs = np.array([np.frombuffer(b, np.float64) for b in g["vec"]])
        chosen: list[int] = []
        max_div = np.full(len(g), -(10 ** 9), np.int64)  # max sim to chosen set
        for _ in range(min(k, len(g))):
            div = np.where(max_div == -(10 ** 9), 0, max_div)
            score = (lam_permille * rel - (1000 - lam_permille) * div) // 1000
            # sentinel must survive negation: int64 min negates to ITSELF
            # (two's-complement wrap) and would sort a chosen row first
            score[chosen] = -(10 ** 15)
            order = np.lexsort((cid, -score))
            pick = int(order[0])
            chosen.append(pick)
            sim_new = np.round((vecs @ vecs[pick]) * 1e6).astype(np.int64)
            max_div = np.maximum(max_div, sim_new)
        rows.append(pd.DataFrame({
            "query_id": np.int64(qid),
            "neighbor_id": cid[chosen],
            "rank": np.arange(1, len(chosen) + 1, dtype=np.int64),
        }))
    return (pd.concat(rows, ignore_index=True)
            .sort_values(["query_id", "rank"]).reset_index(drop=True))
