"""Document-table deduplication operators: exact, MinHash+LSH, SimHash,
n-gram Jaccard — the same machinery the clip pipeline uses, exposed over the
generic ``documents`` table so each has a ``queries()`` entry.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from marc_record_merge_melindautils_ray.stages.cluster import actor_pool_size

from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.functions.hashing import MinHasher, stable_str_hash
from marc_record_merge_melindautils_ray.functions.textnorm import normalize_transcript_array
from marc_record_merge_melindautils_ray.functions.util import task_stage


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


NUM_DOC_PARTS = 64  # fallback fan-out when no row count is at hand


def _doc_parts(ds) -> int:
    """Partition-then-vectorize fan-out sized to the table (metadata-cheap
    row count) instead of a fixed constant that starves bigger corpora and
    over-shuffles small ones (see stages.cluster.adaptive_parts)."""
    from marc_record_merge_melindautils_ray.stages.cluster import (
        adaptive_parts,
        cluster_parallelism,
    )

    return adaptive_parts(
        ds.count(), rows_per_part=5000, lo=max(8, 2 * cluster_parallelism()), hi=512
    )


def _add_int_part(t: pa.Table, key_col: str, num_parts: int = NUM_DOC_PARTS) -> pa.Table:
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64

    k = np.asarray(t[key_col]).view(np.uint64)
    part = (splitmix64(k) % np.uint64(num_parts)).astype(np.int64)
    return t.append_column("part", pa.array(part, pa.int64()))


def minhash_lsh_clusters(
    ds: rd.Dataset, id_col: str, text_col: str, cfg: DedupConfig | None = None
) -> rd.Dataset:
    """MinHash+LSH near-dup clustering over any (id, text) dataset:
    normalize → shingle → MinHash → band explode → re-key to
    ``part = hash(band_key) % P`` → ONE vectorized pair emission per
    partition (boundary scan + shared ``triu`` broadcast, the
    ``stages.candidates`` pattern — never a ~ms-cost UDF per band key) →
    exact-signature-Jaccard verify → connected components.
    Returns (id, cluster_id).

    Oversized band buckets (> ``cfg.bucket_cap``) fall back to
    sorted-neighborhood pairing and every emitted pair carries its
    ``bucket_n`` — capped work is visible, never a silent row drop."""
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

    nparts = _doc_parts(ds)
    band_rows = ds.map_batches(
        task_stage(Sig, (), key=("mh_sig", cfg.num_perms, cfg.minhash_seed,
                                 cfg.shingle_k, cfg.num_bands, id_col, text_col)),
        batch_format="pyarrow",
    ).map_batches(
        lambda t: _add_int_part(t, "band_key", nparts), batch_format="pyarrow"
    )

    def emit_partition(g: pd.DataFrame) -> pd.DataFrame:
        """All band keys of one partition in one pass: boundary scan on the
        sorted key column; equal-size groups share one triu broadcast."""
        g = g.sort_values(["band_key", "id"]).drop_duplicates(["band_key", "id"])
        g = g.reset_index(drop=True)
        keys = g["band_key"].to_numpy()
        n = len(g)
        empty = pd.DataFrame({
            "id_a": pd.Series([], dtype=np.int64),
            "id_b": pd.Series([], dtype=np.int64),
            "bucket_n": pd.Series([], dtype=np.int32),
        })
        if n < 2:
            return empty
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        sizes = np.diff(np.r_[starts, n])
        lo_list, hi_list, bn_list = [], [], []
        normal = (sizes >= 2) & (sizes <= cfg.bucket_cap)
        for sz in np.unique(sizes[normal]):
            ii, jj = np.triu_indices(int(sz), k=1)
            st = starts[normal & (sizes == sz)]
            lo_list.append((st[:, None] + ii[None, :]).ravel())
            hi_list.append((st[:, None] + jj[None, :]).ravel())
            bn_list.append(np.full(len(st) * len(ii), sz, np.int32))
        # oversized buckets: sorted-neighborhood fallback, bucket_n visible
        for s, sz in zip(starts[sizes > cfg.bucket_cap], sizes[sizes > cfg.bucket_cap]):
            w = 4
            base = np.arange(sz)
            ii = np.concatenate([base[:-d] for d in range(1, w + 1) if d < sz])
            jj = np.concatenate([base[d:] for d in range(1, w + 1) if d < sz])
            lo_list.append(s + ii)
            hi_list.append(s + jj)
            bn_list.append(np.full(len(ii), sz, np.int32))
        if not lo_list:
            return empty
        lo = np.concatenate(lo_list)
        hi = np.concatenate(hi_list)
        bn = np.concatenate(bn_list)
        sigs = np.stack(g["sig"].to_numpy()).view(np.uint64)
        jac = (sigs[lo] == sigs[hi]).mean(axis=1)
        keep = jac >= cfg.jaccard_threshold
        ids = g["id"].to_numpy()
        return pd.DataFrame({
            "id_a": ids[lo[keep]], "id_b": ids[hi[keep]], "bucket_n": bn[keep],
        })

    pairs = band_rows.groupby("part").map_groups(
        emit_partition, batch_format="pandas"
    ).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(
            pa.table({"id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.string())})
        )
    cc = connected_components(
        pairs.map_batches(
            lambda df: df.assign(id_a=df["id_a"].astype(str), id_b=df["id_b"].astype(str)),
            batch_format="pandas",
        ),
        cfg,
        n_edges=n_pairs,
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


def q_simhash_dup_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """SimHash near-dup pairs, EXACT under banding: the 64-bit sketch splits
    into ``max_hamming + 1`` bands, so any pair within ``max_hamming`` bits
    shares at least one untouched band (pigeonhole) — banded blocking loses
    nothing, verified pair-for-pair against brute force in tests.
    Band-key partitions → vectorized intra-bucket Hamming → pair-key dedup.
    Output: (id_a, id_b, hamming)."""
    from marc_record_merge_melindautils_ray.functions.audio import hamming64

    n_bands = max_hamming + 1
    band_bits = 64 // n_bands

    sigs = simhash_signatures(_docs(sf_dir), "doc_id", "text")

    def expand(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["id"], np.int64)
        sh = np.asarray(t["simhash"], np.int64).view(np.uint64)
        keys, rid = [], []
        for bi in range(n_bands):
            bits = (sh >> np.uint64(bi * band_bits)) & np.uint64((1 << band_bits) - 1)
            keys.append((np.int64(bi) << 58) | bits.view(np.int64))
            rid.append(np.arange(len(ids)))
        kcat = np.concatenate(keys)
        rcat = np.concatenate(rid)
        return pa.table({
            "key": pa.array(kcat, pa.int64()),
            "id": pa.array(ids[rcat], pa.int64()),
            "simhash": pa.array(sh[rcat].view(np.int64), pa.int64()),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["key", "id"]).drop_duplicates(["key", "id"]).reset_index(drop=True)
        keys = g["key"].to_numpy()
        n = len(g)
        empty = pd.DataFrame({
            "id_a": pd.Series([], dtype=np.int64), "id_b": pd.Series([], dtype=np.int64),
            "hamming": pd.Series([], dtype=np.int64),
        })
        if n < 2:
            return empty
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        sizes = np.diff(np.r_[starts, n])
        lo_list, hi_list = [], []
        for sz in np.unique(sizes[sizes >= 2]):
            ii, jj = np.triu_indices(int(sz), k=1)
            st = starts[sizes == sz]
            lo_list.append((st[:, None] + ii[None, :]).ravel())
            hi_list.append((st[:, None] + jj[None, :]).ravel())
        if not lo_list:
            return empty
        lo = np.concatenate(lo_list)
        hi = np.concatenate(hi_list)
        ids = g["id"].to_numpy()
        sh = g["simhash"].to_numpy().view(np.uint64)
        ham = hamming64(sh[lo], sh[hi]).astype(np.int64)
        keep = ham <= max_hamming
        a, b = ids[lo[keep]], ids[hi[keep]]
        return pd.DataFrame({
            "id_a": np.minimum(a, b), "id_b": np.maximum(a, b), "hamming": ham[keep],
        })

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["id_a", "id_b"]).drop_duplicates(["id_a", "id_b"])[
            ["id_a", "id_b", "hamming"]
        ]

    nparts = _doc_parts(_docs(sf_dir))
    out = (
        sigs.map_batches(expand, batch_format="pyarrow")
        .map_batches(lambda t: _add_int_part(t, "key", nparts), batch_format="pyarrow")
        .groupby("part")
        .map_groups(bucket_pairs, batch_format="pandas")
        .map_batches(
            lambda t: _add_int_part(
                (t.drop_columns(["part"]) if "part" in t.column_names else t).append_column(
                    "pk",
                    pa.array(
                        (np.asarray(t["id_a"], np.int64) << 32)
                        ^ np.asarray(t["id_b"], np.int64),
                        pa.int64(),
                    ),
                ),
                "pk",
                nparts,
            ),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(dedup, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                             "id_b": pd.Series([], dtype=np.int64),
                             "hamming": pd.Series([], dtype=np.int64)})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True).astype(np.int64)


NGRAM_MIN_PERMILLE = 200  # report-pair threshold (mirrored in the SQL oracle)


def q_ngram_jaccard_pairs(
    sf_dir: str,
    max_df: int | None = None,
    metrics: dict | None = None,
    hub_group_warn: int = 10_000,
    hub_guard: int = 1_000_000,
) -> pd.DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs, fully distributed:

    1. ``map_batches``: per-doc DISTINCT gram hashes → rows
       (gram int64, doc_id, n = |gram set|) — gram sets computed ONCE per doc.
    2. gram-hash partition → vectorized co-occurrence pair emission
       (every pair of docs sharing that gram, boundary scan + triu).
    3. pair-key partition → vectorized shared-gram count per pair →
       ``j‰ = 1000·|∩| // (n_a + n_b − |∩|)``, keep ``j‰ ≥ 200``.

    Exact-join semantics (no LSH candidate loss), so it is SQL-expressible —
    see ``oracle_sql()['ngram_jaccard_pairs']``.  Grams ride as 64-bit hashes;
    a hash collision would merge two gram identities (negligible at 2^-64,
    documented trade for not shuffling gram strings).

    Hub grams (a stop-word trigram shared by m docs) emit C(m,2) pair rows by
    the definition of the exact join — the 100-TB memory hazard.  Two
    explicit controls, per the repo's capped-work-is-visible rule:

    * ``max_df`` (the SCALE deployment): grams with document frequency >
      ``max_df`` are excluded from intersection counting — a documented
      lower-bound on Jaccard, still SQL-expressible (the capped oracle adds a
      ``df ≤ max_df`` join) — and the dropped gram/pair counts come back in
      ``metrics`` + a log line, never silently.
    * Without ``max_df`` (the exact oracle query): a gram group over
      ``hub_group_warn`` logs a warning; over ``hub_guard`` RAISES with a
      clear message (exact semantics forbid dropping, so the honest failure
      is an error, not an OOM).

    Output: (id_a, id_b, jaccard_permille), sorted."""

    def gram_rows(t: pa.Table) -> pa.Table:
        """Per-doc DISTINCT gram hashes, fully vectorized: the shared
        ``word_trigram_hashes`` rolling-hash kernel (no per-doc Python, no
        gram strings — VERDICT r3 item 5), then one batch-wide lexsort
        boundary-dedup instead of a per-doc ``np.unique`` loop."""
        from marc_record_merge_melindautils_ray.functions.hashing import (
            word_trigram_hashes,
        )

        ids = np.asarray(t["doc_id"], dtype=np.int64)
        h, offsets = word_trigram_hashes(t["text"])
        counts = np.diff(offsets)
        doc_idx = np.repeat(np.arange(len(ids)), counts)
        order = np.lexsort((h, doc_idx))
        hs, ds = h[order], doc_idx[order]
        keep = np.r_[True, (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])] if len(hs) else (
            np.zeros(0, dtype=bool)
        )
        hk, dk = hs[keep], ds[keep]
        n_per_doc = np.bincount(dk, minlength=len(ids))
        return pa.table({
            "gram": pa.array(hk.view(np.int64), pa.int64()),
            "doc_id": pa.array(ids[dk], pa.int64()),
            "n": pa.array(n_per_doc[dk], pa.int64()),
        })

    nparts = _doc_parts(_docs(sf_dir))
    grams = (
        _docs(sf_dir)
        .map_batches(gram_rows, batch_format="pyarrow")
        .map_batches(lambda t: _add_int_part(t, "gram", nparts), batch_format="pyarrow")
    )

    def cooccur_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Pairs of docs sharing each gram of this partition.  Document
        frequency is partition-local-complete (all rows of a gram co-locate),
        so the ``max_df`` cap and the hub guard both apply here, before any
        O(df²) emission."""
        import logging as _logging

        g = g.sort_values(["gram", "doc_id"]).reset_index(drop=True)
        keys = g["gram"].to_numpy()
        n = len(g)
        empty = pd.DataFrame({
            "id_a": pd.Series([], dtype=np.int64), "id_b": pd.Series([], dtype=np.int64),
            "n_a": pd.Series([], dtype=np.int64), "n_b": pd.Series([], dtype=np.int64),
        })
        if n < 2:
            return empty
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        sizes = np.diff(np.r_[starts, n])
        max_sz = int(sizes.max())
        dropped_grams = dropped_pairs = 0
        if max_df is not None:
            over = sizes > max_df
            dropped_grams = int(over.sum())
            dropped_pairs = int((sizes[over] * (sizes[over] - 1) // 2).sum())
            emit_mask = (sizes >= 2) & ~over
        else:
            if max_sz > hub_guard:
                raise ValueError(
                    f"gram group of {max_sz} docs would emit "
                    f"{max_sz * (max_sz - 1) // 2} exact-join pair rows "
                    f"(> hub_guard {hub_guard}); pass max_df to run the "
                    "capped scale variant (visible drops) instead of OOMing"
                )
            if max_sz > hub_group_warn:
                _logging.getLogger(__name__).warning(
                    "hub gram group: %d docs share one gram (emitting %d pairs)",
                    max_sz, max_sz * (max_sz - 1) // 2,
                )
            emit_mask = sizes >= 2
        lo_list, hi_list = [], []
        for sz in np.unique(sizes[emit_mask]):
            ii, jj = np.triu_indices(int(sz), k=1)
            st = starts[emit_mask & (sizes == sz)]
            lo_list.append((st[:, None] + ii[None, :]).ravel())
            hi_list.append((st[:, None] + jj[None, :]).ravel())
        if lo_list:
            lo = np.concatenate(lo_list)
            hi = np.concatenate(hi_list)
            ids = g["doc_id"].to_numpy()
            ns = g["n"].to_numpy()
            out = pd.DataFrame({
                "id_a": ids[lo], "id_b": ids[hi], "n_a": ns[lo], "n_b": ns[hi],
            })
        else:
            out = empty
        if dropped_grams:
            # per-partition drop tally rides the pair stream as a sentinel row
            # (id_a = -1); the driver folds sentinels into metrics + a log
            # line — visible, fully distributed accounting
            out = pd.concat([out, pd.DataFrame({
                "id_a": [np.int64(-1)], "id_b": [np.int64(-1)],
                "n_a": [np.int64(dropped_grams)], "n_b": [np.int64(dropped_pairs)],
            })], ignore_index=True)
        return out

    pair_rows = (
        grams.groupby("part")
        .map_groups(cooccur_pairs, batch_format="pandas")
        .map_batches(
            lambda t: _add_int_part(
                t.append_column(
                    "pk",
                    pa.array(
                        (np.asarray(t["id_a"], np.int64) << 32)
                        ^ np.asarray(t["id_b"], np.int64),
                        pa.int64(),
                    ),
                ),
                "pk",
                nparts,
            ),
            batch_format="pyarrow",
        )
    )

    def score_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """|∩| per pair = row count (one row per shared gram); vectorized.
        Drop-tally sentinels (id_a = -1) are summed, not scored: two rows
        (id_b 0 → dropped grams, id_b 1 → dropped pairs) pass through to the
        driver fold."""
        sent = g[g["id_a"] < 0]
        g = g[g["id_a"] >= 0]
        agg = g.groupby(["id_a", "id_b"], as_index=False).agg(
            c=("n_a", "size"), n_a=("n_a", "first"), n_b=("n_b", "first")
        )
        j = (1000 * agg["c"].to_numpy()) // (
            agg["n_a"].to_numpy() + agg["n_b"].to_numpy() - agg["c"].to_numpy()
        ) if len(agg) else np.empty(0, np.int64)
        agg["jaccard_permille"] = j
        agg = agg[agg["jaccard_permille"] >= NGRAM_MIN_PERMILLE]
        out = agg[["id_a", "id_b", "jaccard_permille"]].astype(np.int64)
        if len(sent):
            out = pd.concat([out, pd.DataFrame({
                "id_a": np.array([-1, -1], np.int64),
                "id_b": np.array([0, 1], np.int64),
                "jaccard_permille": np.array(
                    [sent["n_a"].sum(), sent["n_b"].sum()], np.int64
                ),
            })], ignore_index=True)
        return out

    out = (
        pair_rows.groupby("part")
        .map_groups(score_pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame({
            "id_a": pd.Series([], dtype=np.int64),
            "id_b": pd.Series([], dtype=np.int64),
            "jaccard_permille": pd.Series([], dtype=np.int64),
        })
    sent = out[out["id_a"] < 0]
    out = out[out["id_a"] >= 0]
    dropped_grams = int(sent[sent["id_b"] == 0]["jaccard_permille"].sum())
    dropped_pairs = int(sent[sent["id_b"] == 1]["jaccard_permille"].sum())
    if dropped_grams:
        import logging as _logging

        _logging.getLogger(__name__).warning(
            "q_ngram_jaccard_pairs max_df=%s dropped %d hub grams "
            "(%d co-occurrence pair rows never emitted)",
            max_df, dropped_grams, dropped_pairs,
        )
    if metrics is not None:
        metrics.update({
            "max_df": max_df,
            "dropped_hub_grams": dropped_grams,
            "dropped_pair_rows": dropped_pairs,
        })
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_containment_pairs(sf_dir: str, min_len: int = 20, k: int = 16) -> pd.DataFrame:
    """EXACT substring-containment pairs over the documents table — the
    generic-table counterpart of the clip pipeline's containment pass (the
    ``normalizingSubsetComparator`` analog, ``lib/record-utils.js:219-226``)
    and the north-star's suffix/substring duplicate class.

    (id_inner, id_outer) where the normalized (trim+lower) text of *inner*
    (≥ ``min_len`` chars) appears verbatim inside a strictly longer *outer*.

    Distributed exact plan (no all-pairs): if inner ⊂ outer then EVERY byte
    ``k``-gram of inner appears in outer (UTF-8 is self-synchronizing, so
    byte containment ≡ char containment); block on inner's MINIMUM k-gram
    hash against an index of ALL outer k-gram hashes — recall-exact by
    construction — then confirm each candidate with a real substring check
    inside verify actors that index the normalized texts from object-store
    blocks.  Outer-gram emission is O(total chars): the exact cost of exact
    substring search (the clip pipeline's SAMPLED shingle pass is the
    bounded-work variant of this same idea).  SQL-expressible — see
    ``oracle_sql()['containment_pairs']``."""
    import pyarrow.compute as pc

    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64
    from marc_record_merge_melindautils_ray.state.broadcast_index import ArrowBlockIndex

    docs = _docs(sf_dir)
    nparts = _doc_parts(docs)

    def normalize(t: pa.Table) -> pa.Table:
        tt = pc.utf8_trim_whitespace(pc.utf8_lower(pc.fill_null(t["text"], "")))
        return pa.table({"doc_id": t["doc_id"], "t": tt})

    norm = docs.map_batches(normalize, batch_format="pyarrow").materialize()
    norm_refs = norm.to_arrow_refs()

    _POW = np.power(np.uint64(1099511628211), np.arange(k, dtype=np.uint64),
                    dtype=np.uint64)  # FNV-prime powers for the window dot

    def emit(t: pa.Table) -> pa.Table:
        """ONE vectorized pass over the batch: the string column's Arrow
        value buffer is already all docs' bytes concatenated — slide a single
        k-window view over it, hash every window with one matmul, and mask
        windows that cross a doc boundary.  No per-doc Python."""
        empty = pa.table({"gram": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "role": pa.array([], pa.int8()),
                          "L": pa.array([], pa.int64())})
        ids = np.asarray(t["doc_id"], np.int64)
        col = t["t"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        bufs = col.buffers()
        if bufs[2] is None or len(col) == 0:
            return empty
        # string-array offsets live in buffers()[1]; width follows the type
        # (int32 for string, int64 for large_string — misreading a
        # large_string buffer as int32 would interleave words and attribute
        # windows to the wrong doc).  Honor a possible slice offset.
        off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
        offs = np.frombuffer(
            bufs[1], off_dtype, count=col.offset + len(col) + 1
        ).astype(np.int64)[col.offset:]
        buf = np.frombuffer(bufs[2], np.uint8, count=int(offs[-1]))
        if int(offs[-1]) - int(offs[0]) < k:
            return empty
        # k-step accumulation: same polynomial window hash as a
        # sliding_window_view matmul but O(n) transient memory — the dense
        # (n x k) uint64 window matrix would be a 128x blow-up of the
        # batch's entire string buffer (round-3 self-review finding)
        m = len(buf) - k + 1
        acc = np.zeros(m, np.uint64)
        with np.errstate(over="ignore"):
            for i in range(k):
                acc += buf[i:i + m].astype(np.uint64) * _POW[i]
            gh = splitmix64(acc)  # hash of every k-window in the buffer
        pos = np.arange(len(gh))
        valid = pos >= offs[0]
        # window w belongs to the doc whose byte range fully contains it
        doc_of = np.clip(np.searchsorted(offs, pos, side="right") - 1, 0, len(col) - 1)
        in_doc = valid & (pos + k <= offs[doc_of + 1]) & (pos >= offs[doc_of])
        gh, doc_of = gh[in_doc], doc_of[in_doc]
        if not len(gh):
            return empty
        byte_len = np.diff(offs)
        # char lengths (for the min_len / strictly-shorter rules): utf8 chars
        char_len = np.asarray(pa.compute.utf8_length(col), dtype=np.int64)
        # unique (doc, gram) via one lexsort boundary scan
        order = np.lexsort((gh, doc_of))
        gh, doc_of = gh[order], doc_of[order]
        first = np.r_[True, (gh[1:] != gh[:-1]) | (doc_of[1:] != doc_of[:-1])]
        gh, doc_of = gh[first], doc_of[first]
        # inner probes: each eligible doc's MIN gram = first gram of its run
        doc_first = np.r_[True, doc_of[1:] != doc_of[:-1]]
        inner_sel = doc_first & (char_len[doc_of] >= min_len) & (byte_len[doc_of] >= k)
        g_cat = np.concatenate([gh, gh[inner_sel]])
        d_cat = np.concatenate([ids[doc_of], ids[doc_of[inner_sel]]])
        r_cat = np.concatenate([
            np.zeros(len(gh), np.int8), np.ones(int(inner_sel.sum()), np.int8)
        ])
        L_cat = np.concatenate([char_len[doc_of], char_len[doc_of[inner_sel]]])
        return pa.table({
            "gram": pa.array(g_cat.view(np.int64), pa.int64()),
            "doc_id": pa.array(d_cat, pa.int64()),
            "role": pa.array(r_cat, pa.int8()),
            "L": pa.array(L_cat, pa.int64()),
        })

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["gram", "role", "doc_id"]).reset_index(drop=True)
        keys = g["gram"].to_numpy()
        roles = g["role"].to_numpy()
        ids = g["doc_id"].to_numpy()
        Ls = g["L"].to_numpy()
        n = len(g)
        empty = pd.DataFrame({"id_inner": pd.Series([], dtype=np.int64),
                              "id_outer": pd.Series([], dtype=np.int64)})
        if n == 0:
            return empty
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], n]
        out_i, out_o = [], []
        for s, e in zip(starts, ends):
            r = roles[s:e]
            inner = np.flatnonzero(r == 1)
            outer = np.flatnonzero(r == 0)
            if not len(inner) or not len(outer):
                continue
            ii = np.repeat(inner, len(outer))
            oo = np.tile(outer, len(inner))
            keep = (ids[s + ii] != ids[s + oo]) & (Ls[s + ii] < Ls[s + oo])
            out_i.append(ids[s + ii[keep]])
            out_o.append(ids[s + oo[keep]])
        if not out_i:
            return empty
        return pd.DataFrame({
            "id_inner": np.concatenate(out_i), "id_outer": np.concatenate(out_o),
        }).drop_duplicates()

    class VerifySubstring:
        """Per-actor text index over the normalized-doc blocks (zero-copy
        plasma reads) — real substring confirmation per candidate.

        Scale note: each actor indexes the WHOLE normalized-text table
        (fine while it fits one heap); past that, shard the blocks with
        ``state.broadcast_index.shard_side_table`` and route candidate pairs
        by ``shard_of(id_outer)`` — the same produce-time sharding the clip
        pipeline exposes as ``cfg.index_shards``."""

        def __init__(self, refs):
            self.idx = ArrowBlockIndex(refs, "doc_id")

        def __call__(self, t: pa.Table) -> pa.Table:
            inner = np.asarray(t["id_inner"], np.int64)
            outer = np.asarray(t["id_outer"], np.int64)
            bi, ri, oki = self.idx.lookup(inner.astype(object))
            bo, ro, oko = self.idx.lookup(outer.astype(object))
            ti = self.idx.take_column("t", bi, ri)
            to = self.idx.take_column("t", bo, ro)
            ok = np.array([
                bool(a) and bool(b) and a in b
                for a, b in zip(ti, to)
            ])
            return t.filter(pa.array(ok & oki & oko))

    out = (
        norm.map_batches(emit, batch_format="pyarrow")
        .map_batches(lambda t: _add_int_part(t, "gram", nparts), batch_format="pyarrow")
        .groupby("part")
        .map_groups(candidates, batch_format="pandas")
        .map_batches(
            # corpus-sized text index = heavy state -> real actor pool (copy
            # count capped at the pool width, freed when the pool dies), not
            # a task_stage cache entry that would pin one index per worker
            VerifySubstring, fn_constructor_args=(norm_refs,),
            batch_format="pyarrow",
            concurrency=actor_pool_size(rows=norm.count()),
        )
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"id_inner": pd.Series([], dtype=np.int64),
                             "id_outer": pd.Series([], dtype=np.int64)})
    out = out.drop_duplicates(["id_inner", "id_outer"])
    return (
        out[["id_inner", "id_outer"]].astype(np.int64)
        .sort_values(["id_inner", "id_outer"]).reset_index(drop=True)
    )


# --------------------------------------------------------------- winnowing
WINNOW_K = 7          # char k-gram length (post-normalization)
WINNOW_W = 8          # winnowing window: guarantees a shared fingerprint for
                      # any common substring of length ≥ K + W − 1
WINNOW_MIN_PERMILLE = 300  # report pairs with shared/min(n_a,n_b) ≥ this
_WINNOW_B = np.uint64(1_099_511_628_211)  # FNV-64 prime as the rolling base


def winnow_fingerprints(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> np.ndarray:
    """MOSS-style robust winnowing fingerprints of one document (Schleimer,
    Wilkerson & Aiken, SIGMOD'03): normalize to lowercase alphanumerics
    (whitespace/punct/format changes don't move fingerprints), hash every
    char k-gram with a 64-bit polynomial, then keep the RIGHTMOST minimum of
    each window of ``w`` consecutive hashes.  Guarantee: any match of length
    ≥ ``k + w − 1`` shares at least one selected fingerprint; density ≈
    2/(w+1).  Returns the distinct selected hashes as uint64 (empty for docs
    shorter than ``k`` normalized chars).

    The whole per-doc path is numpy: a byte-mask normalization filter, k
    shifted multiply-adds for the rolling hashes, one ``sliding_window_view``
    argmin for the window minima.  Normalization is pinned to ASCII
    alphanumerics of the lowercased UTF-8 bytes (non-ASCII codepoints drop
    entirely) — a deterministic, vectorizable definition; the test reference
    mirrors it byte-for-byte."""
    raw = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
    keep = ((raw >= 48) & (raw <= 57)) | ((raw >= 97) & (raw <= 122))
    b = raw[keep].astype(np.uint64)
    n = len(b)
    if n < k:
        return np.empty(0, np.uint64)
    m = n - k + 1
    h = np.zeros(m, np.uint64)
    for j in range(k):
        h = h * _WINNOW_B + b[j : j + m]
    if m <= w:
        sel = np.array([m - 1 - int(np.argmin(h[::-1]))])
    else:
        win = np.lib.stride_tricks.sliding_window_view(h, w)
        # rightmost min per window: argmin over the reversed window axis
        right = (w - 1) - np.argmin(win[:, ::-1], axis=1)
        sel = np.unique(np.arange(len(win)) + right)
    return np.unique(h[sel])


def q_winnow_dup_pairs(
    sf_dir: str,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_permille: int = WINNOW_MIN_PERMILLE,
    hub_guard: int = 1_000_000,
) -> pd.DataFrame:
    """Near-dup pairs by shared winnowing fingerprints — the copy-detection
    primitive that catches PARTIAL overlap (a paragraph lifted into a longer
    doc) that whole-set Jaccard dilutes away, at ~2/(w+1) of the n-gram
    join's row volume.  Distributed exactly like the gram join: per-doc
    fingerprint rows → fingerprint-hash partition → vectorized co-occurrence
    pair emission (hub fingerprints guarded, never silent) → pair-keyed
    shared counts.  Score = 1000·|shared| / min(n_a, n_b) (containment-style:
    a short doc fully inside a long one scores 1000, where Jaccard → 0).

    Output: (id_a, id_b, shared, overlap_permille), sorted.  Non-SQL (the
    winnow selection is a windowed argmin over rolling hashes); exactness is
    pinned by a pure-Python reference in ``tests/test_winnow.py``."""

    def fp_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        fps, idxs, ns = [], [], []
        for i, s in enumerate(t["text"].to_pylist()):
            f = winnow_fingerprints(s or "", k, w)
            fps.append(f)
            idxs.append(np.full(len(f), i, np.int64))
            ns.append(np.full(len(f), len(f), np.int64))
        fcat = np.concatenate(fps) if fps else np.empty(0, np.uint64)
        icat = np.concatenate(idxs) if idxs else np.empty(0, np.int64)
        ncat = np.concatenate(ns) if ns else np.empty(0, np.int64)
        return pa.table({
            "fp": pa.array(fcat.view(np.int64), pa.int64()),
            "doc_id": pa.array(ids[icat], pa.int64()),
            "n": pa.array(ncat, pa.int64()),
        })

    nparts = _doc_parts(_docs(sf_dir))
    rows = (
        _docs(sf_dir)
        .map_batches(fp_rows, batch_format="pyarrow")
        .map_batches(lambda t: _add_int_part(t, "fp", nparts), batch_format="pyarrow")
    )

    def cooccur(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["fp", "doc_id"]).reset_index(drop=True)
        keys = g["fp"].to_numpy()
        n = len(g)
        empty = pd.DataFrame({
            "id_a": pd.Series([], dtype=np.int64), "id_b": pd.Series([], dtype=np.int64),
            "n_a": pd.Series([], dtype=np.int64), "n_b": pd.Series([], dtype=np.int64),
        })
        if n < 2:
            return empty
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        sizes = np.diff(np.r_[starts, n])
        if int(sizes.max()) > hub_guard:
            raise ValueError(
                f"winnow fingerprint shared by {int(sizes.max())} docs exceeds "
                f"hub_guard {hub_guard}; raise the guard or pre-filter "
                "boilerplate (visible failure, not an OOM)"
            )
        lo_list, hi_list = [], []
        emit = sizes >= 2
        for sz in np.unique(sizes[emit]):
            ii, jj = np.triu_indices(int(sz), k=1)
            st = starts[emit & (sizes == sz)]
            lo_list.append((st[:, None] + ii[None, :]).ravel())
            hi_list.append((st[:, None] + jj[None, :]).ravel())
        if not lo_list:
            return empty
        lo, hi = np.concatenate(lo_list), np.concatenate(hi_list)
        ids = g["doc_id"].to_numpy()
        ns = g["n"].to_numpy()
        return pd.DataFrame({"id_a": ids[lo], "id_b": ids[hi],
                             "n_a": ns[lo], "n_b": ns[hi]})

    pair_rows = (
        rows.groupby("part")
        .map_groups(cooccur, batch_format="pandas")
        .map_batches(
            lambda t: _add_int_part(
                t.append_column(
                    "pk",
                    pa.array(
                        (np.asarray(t["id_a"], np.int64) << 32)
                        ^ np.asarray(t["id_b"], np.int64),
                        pa.int64(),
                    ),
                ),
                "pk",
                nparts,
            ),
            batch_format="pyarrow",
        )
    )

    def score(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["id_a", "id_b"], as_index=False).agg(
            shared=("n_a", "size"), n_a=("n_a", "first"), n_b=("n_b", "first")
        )
        denom = np.minimum(agg["n_a"].to_numpy(), agg["n_b"].to_numpy())
        agg["overlap_permille"] = (1000 * agg["shared"].to_numpy()) // np.maximum(denom, 1)
        agg = agg[agg["overlap_permille"] >= min_permille]
        return agg[["id_a", "id_b", "shared", "overlap_permille"]].astype(np.int64)

    out = (
        pair_rows.groupby("part")
        .map_groups(score, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame({
            "id_a": pd.Series([], dtype=np.int64),
            "id_b": pd.Series([], dtype=np.int64),
            "shared": pd.Series([], dtype=np.int64),
            "overlap_permille": pd.Series([], dtype=np.int64),
        })
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# --------------------------------------------------------- decontamination
def doc_gram_uniques(t: pa.Table, n: int
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_ids, per-doc-DISTINCT word-n-gram hashes, doc index per gram) —
    the shared kernel + one batch-wide lexsort boundary dedup."""
    from marc_record_merge_melindautils_ray.functions.hashing import word_trigram_hashes

    ids = np.asarray(t["doc_id"], dtype=np.int64)
    h, offsets = word_trigram_hashes(t["text"], n=n)
    counts = np.diff(offsets)
    doc_idx = np.repeat(np.arange(len(ids)), counts)
    order = np.lexsort((h, doc_idx))
    hs, ds = h[order], doc_idx[order]
    if len(hs):
        keep = np.r_[True, (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])]
    else:
        keep = np.zeros(0, dtype=bool)
    return ids, hs[keep], ds[keep]


def build_eval_gram_set(docs: rd.Dataset, n: int, eval_mod: int,
                        eval_rem: int) -> np.ndarray:
    """Sorted u64 array of the eval slice's DISTINCT gram hashes —
    O(|benchmark|), not O(corpus); bounded by eval-set size by definition
    (it gets broadcast anyway)."""

    def eval_uniques(t: pa.Table) -> pa.Table:
        mask = np.asarray(t["doc_id"], dtype=np.int64) % eval_mod == eval_rem
        sub = t.filter(pa.array(mask))
        if sub.num_rows == 0:
            return pa.table({"g": pa.array([], pa.int64())})
        _, hk, _ = doc_gram_uniques(sub, n)
        return pa.table({"g": pa.array(np.unique(hk).view(np.int64), pa.int64())})

    parts = [
        np.asarray(b["g"], dtype=np.int64).view(np.uint64)
        for b in docs.map_batches(eval_uniques, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    return np.unique(np.concatenate(parts)) if parts else np.empty(0, np.uint64)


def q_decontaminate(sf_dir: str, n: int = 8, eval_mod: int = 19,
                    eval_rem: int = 3) -> pd.DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word-``n``-gram with a held-out evaluation set (the GPT-3 / PaLM
    training-data hygiene pass; the reference's authority lookup is the
    same shape — a small authority set probed per record, cf.
    `/root/reference/lib/post-merge-modifiers.js:254` auth_db.query).

    The "benchmark" is the deterministic slice ``doc_id % eval_mod ==
    eval_rem`` — a stand-in for a real eval suite, which is SMALL by
    definition.  Scale shape:

    * Pass 1 builds the eval set's DISTINCT gram-hash array.  Per batch the
      grams are deduped vectorized (lexsort boundary trick); the per-batch
      uniques are combined on the driver.  This is O(|benchmark|), not
      O(corpus) — eval suites are a few hundred MB of text at most, and the
      array would be broadcast anyway.  At 100 TB the TRAINING side still
      streams; only the benchmark side lands in one sorted u64 array.
    * Pass 2 streams every training batch through one ``searchsorted``
      membership probe against the broadcast array (``ray.put`` once, read
      zero-copy in every task) and counts per-doc distinct hits with one
      ``bincount`` — no shuffle at all: the contaminated-gram counts are
      per-doc local.

    Output: one row per training doc that has ≥1 gram (``len(words) >= n``),
    ``(doc_id, hit_grams, n_grams)`` sorted by doc_id — zero rows verify the
    negatives, nonzero rows are the contamination report.  Gram identity is
    the shared 64-bit rolling-hash kernel (documented ~2^-64 collision
    trade, same as the Jaccard queries)."""
    import ray

    docs = _docs(sf_dir)
    # pass 1: the small (benchmark) side — bounded by eval-set size
    eval_sorted = build_eval_gram_set(docs, n, eval_mod, eval_rem)
    eval_ref = ray.put(eval_sorted)

    def probe(t: pa.Table) -> pa.Table:
        ev = ray.get(eval_ref)
        mask = np.asarray(t["doc_id"], dtype=np.int64) % eval_mod != eval_rem
        sub = t.filter(pa.array(mask))
        if sub.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "hit_grams": pa.array([], pa.int64()),
                             "n_grams": pa.array([], pa.int64())})
        ids, hk, dk = doc_gram_uniques(sub, n)
        pos = np.searchsorted(ev, hk)
        hit = (pos < ev.size) & (ev[np.minimum(pos, max(ev.size - 1, 0))] == hk) \
            if ev.size else np.zeros(hk.shape, bool)
        n_grams = np.bincount(dk, minlength=len(ids)).astype(np.int64)
        hit_grams = np.bincount(dk, weights=hit, minlength=len(ids)).astype(np.int64)
        keep = n_grams > 0  # docs with <n words have no gram row in the oracle
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "hit_grams": pa.array(hit_grams[keep], pa.int64()),
            "n_grams": pa.array(n_grams[keep], pa.int64()),
        })

    out = docs.map_batches(probe, batch_format="pyarrow").to_pandas()
    if out.empty:
        out = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                            "hit_grams": pd.Series([], dtype=np.int64),
                            "n_grams": pd.Series([], dtype=np.int64)})
    return out.sort_values("doc_id").reset_index(drop=True)


def q_dup_size_histogram(sf_dir: str) -> pd.DataFrame:
    """Duplicate-cluster size distribution of the documents table — the
    corpus-health report every dedup run publishes (how much of the corpus
    is singletons vs heavy clusters).  Exact-content grouping keyed on
    md5(text) so the key matches DuckDB's ``md5()`` byte-for-byte; two-level
    count (per-batch partials → hash groupby) then a tiny size-regroup —
    fact text never shuffles, only (md5, count) partials."""
    import hashlib

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
             for t in df["text"]]
        out = pd.DataFrame({"h": h})
        agg = out.groupby("h", as_index=False).size()
        return agg.rename(columns={"size": "n"}).astype({"n": np.int64})

    sizes = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("h").sum("n")
        .to_pandas()
    )
    sizes.columns = ["h", "n"]
    hist = sizes.groupby("n", as_index=False).size().rename(
        columns={"n": "cluster_size", "size": "n_clusters"})
    hist = hist.astype({"cluster_size": np.int64, "n_clusters": np.int64})
    return hist.sort_values("cluster_size").reset_index(drop=True)
