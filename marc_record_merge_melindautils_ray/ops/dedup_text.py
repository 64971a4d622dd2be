"""Document-table deduplication operators: exact, MinHash+LSH, SimHash,
n-gram Jaccard — the same machinery the clip pipeline uses, exposed over the
generic ``documents`` table so each has a ``queries()`` entry.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.functions.hashing import MinHasher, stable_str_hash
from marc_record_merge_melindautils_ray.functions.textnorm import normalize_transcript_array


def _docs(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def q_exact_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Exact content dedup: content-hash column per batch, hash-partition,
    min doc_id per group (groupby + per-group first)."""
    from ray.data.aggregate import Count, Min

    def add_hash(t: pa.Table) -> pa.Table:
        h = stable_str_hash([x or "" for x in t["text"].to_pylist()])
        return pa.table({
            "doc_id": t["doc_id"],
            "content_hash": pa.array(h.view(np.int64), pa.int64()),
        })

    out = (
        _docs(sf_dir)
        .map_batches(add_hash, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_copies"))
        .to_pandas()
    )
    return out[["keep_doc_id", "n_copies"]].sort_values("keep_doc_id").reset_index(drop=True)


def minhash_lsh_clusters(
    ds: rd.Dataset, id_col: str, text_col: str, cfg: DedupConfig | None = None
) -> rd.Dataset:
    """MinHash+LSH near-dup clustering over any (id, text) dataset:
    normalize → shingle → MinHash → band explode → groupby(band) → pairs →
    exact-Jaccard verify → connected components.  Returns (id, cluster_id)."""
    from marc_record_merge_melindautils_ray.stages.cluster import connected_components

    cfg = cfg or DedupConfig()

    class Sig:
        def __init__(self):
            self.mh = MinHasher(cfg.num_perms, cfg.minhash_seed, cfg.shingle_k)

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = normalize_transcript_array(
                pa.compute.fill_null(t[text_col], "")
            ).to_pylist()
            sigs = self.mh.signatures(texts)
            bands = self.mh.band_keys(sigs, cfg.num_bands)
            n = len(texts)
            row_idx = np.repeat(np.arange(n), cfg.num_bands)
            flat = bands.reshape(-1)
            keep = flat != 0
            sig_list = pa.FixedSizeListArray.from_arrays(
                pa.array(sigs[row_idx[keep]].reshape(-1).view(np.int64), pa.int64()),
                cfg.num_perms,
            )
            return pa.table({
                "band_key": pa.array(flat[keep].view(np.int64), pa.int64()),
                "id": pa.chunked_array([t[id_col]]).combine_chunks().take(
                    pa.array(row_idx[keep], pa.int64())
                ),
                "sig": sig_list,
            })

    band_rows = ds.map_batches(Sig, batch_format="pyarrow", concurrency=2)

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("id")
        n = len(g)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        n = min(n, cfg.bucket_cap)
        g = g.sort_values("id").head(n)
        ii, jj = np.triu_indices(n, k=1)
        sigs = np.stack(g["sig"].to_numpy()).view(np.uint64)
        jac = (sigs[ii] == sigs[jj]).mean(axis=1)
        keep = jac >= cfg.jaccard_threshold
        ids = g["id"].to_numpy()
        return pd.DataFrame({"id_a": ids[ii[keep]], "id_b": ids[jj[keep]]})

    pairs = band_rows.groupby("band_key").map_groups(
        emit_pairs, batch_format="pandas"
    ).materialize()
    if pairs.count() == 0:
        return rd.from_arrow(
            pa.table({"id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.string())})
        )
    cc = connected_components(
        pairs.map_batches(
            lambda df: df.assign(id_a=df["id_a"].astype(str), id_b=df["id_b"].astype(str)),
            batch_format="pandas",
        ),
        cfg,
    )
    return cc.map_batches(
        lambda df: pd.DataFrame(
            {"id": df["clip_id"].astype(np.int64), "cluster_id": df["cluster_id"]}
        ),
        batch_format="pandas",
    )


def q_minhash_lsh_docs(sf_dir: str) -> pd.DataFrame:
    out = minhash_lsh_clusters(_docs(sf_dir), "doc_id", "text").to_pandas()
    return out.sort_values("id").reset_index(drop=True)


def simhash_signatures(ds: rd.Dataset, id_col: str, text_col: str) -> rd.Dataset:
    """64-bit SimHash per document: weighted sign-sum of shingle-hash bit
    vectors (Charikar); near-dups differ in ≤ k bits."""

    def kern(t: pa.Table) -> pa.Table:
        mh = MinHasher(1, 0, 4)
        texts = normalize_transcript_array(
            pa.compute.fill_null(t[text_col], "")
        ).to_pylist()
        hashes, offsets = mh.shingle_hashes(texts)
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int32
        ) * 2 - 1
        out = np.zeros((len(texts), 64), dtype=np.int64)
        starts = offsets[:-1]
        nonempty = np.flatnonzero(np.diff(offsets) > 0)
        if len(hashes):
            sums = np.add.reduceat(bits, starts[nonempty], axis=0)
            out[nonempty] = sums
        sim = (out > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=np.uint64))
        return pa.table({
            "id": t[id_col],
            "simhash": pa.array(sim.view(np.int64), pa.int64()),
        })

    return ds.map_batches(kern, batch_format="pyarrow")


def q_simhash_docs(sf_dir: str) -> pd.DataFrame:
    out = simhash_signatures(_docs(sf_dir), "doc_id", "text").to_pandas()
    return out.sort_values("id").reset_index(drop=True)


def q_ngram_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """Exact word-3-gram Jaccard over LSH candidate pairs (candidates from
    band collisions, verified with the true gram sets — the classic
    two-stage near-dup check).  Output: (id_a, id_b, jaccard_permille)."""
    cfg = DedupConfig(jaccard_threshold=0.0)  # keep all candidates, report exact J
    docs = _docs(sf_dir).to_pandas()
    texts = {int(r.doc_id): (r.text or "") for r in docs.itertuples()}
    clusters = minhash_lsh_clusters(_docs(sf_dir), "doc_id", "text", cfg)
    pairs = []
    cl = clusters.to_pandas().groupby("cluster_id")["id"].apply(sorted)
    import itertools

    for ids in cl:
        for a, b in itertools.combinations(ids, 2):
            def grams(s):
                w = s.lower().split()
                return {" ".join(w[i : i + 3]) for i in range(max(0, len(w) - 2))}

            ga, gb = grams(texts[a]), grams(texts[b])
            if ga or gb:
                j = 1000 * len(ga & gb) // len(ga | gb)
                pairs.append({"id_a": a, "id_b": b, "jaccard_permille": j})
    return pd.DataFrame(pairs, columns=["id_a", "id_b", "jaccard_permille"]).astype(
        {"id_a": np.int64, "id_b": np.int64, "jaccard_permille": np.int64}
    )
