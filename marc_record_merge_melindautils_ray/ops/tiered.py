"""Tiered deduplication: exact → near (MinHash/LSH) → semantic (embedding).

The composed training-data dedup pipeline: each tier prunes the corpus before
the next, so the progressively more expensive tiers only ever see the
previous tier's survivors — exact hashing touches everything, MinHash/LSH
only exact-unique docs, and the embedding tier only near-unique docs.

Reference ancestry: the reference is the pairwise verify/merge kernel of a
larger dedup system (``/root/reference/README.md:3``; SURVEY.md §0) whose
candidate tiers live out-of-repo.  Tiers 1-2 reuse this engine's exact /
MinHash machinery, tier 3 the adaptive-depth embedding LSH
(``ops/similarity.q_embed_dup_pairs``).  The keeper rule at every tier is the
duplicate group's minimum ``doc_id`` — the deterministic priority-selection
analog of the reference's preferred-record rule
(``lib/mergeability-validators.js:69-81``).

Keeper resolution across tiers needs no driver-side chain walking: every
tier's keeper is its group's numeric min, so the numeric-min member of any
connected component over the UNION of all removal edges was the keeper of
every group it appeared in and is never removed.  One distributed
connected-components pass over the union therefore labels every removed doc
with its final surviving keeper, even through chains (removed-at-exact →
keeper removed-at-near → keeper removed-at-semantic).

Scale shape: per-tier work is hash-partitioned (content hash / band key /
hyperplane bucket); the only broadcast side is the REMOVAL set (dup-count
sized, carried as materialized Arrow block refs + per-actor sorted-int64
index — the flagship's survivor-id pattern; shard via
``state.broadcast_index.shard_side_table`` if removals outgrow one heap).
The full corpus is never materialized on the driver mid-pipeline.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.functions.hashing import (
    splitmix64,
    stable_str_hash,
)
from marc_record_merge_melindautils_ray.functions.util import maybe_get, task_stage

_log = logging.getLogger(__name__)

_PAD = 20  # zero-pad width: lexicographic order == numeric order for int64 ids

TIER_EXACT = "exact"
TIER_NEAR = "near"
TIER_SEMANTIC = "semantic"
TIER_KEPT = "kept"


def _as_table(blk) -> pa.Table:
    """Normalize a broadcast block to Arrow — ``to_arrow_refs`` hands back
    pandas blocks verbatim when the producing stage ran in pandas format."""
    if isinstance(blk, pd.DataFrame):
        return pa.Table.from_pandas(blk, preserve_index=False)
    return blk


def _pad_ids(ids: np.ndarray) -> np.ndarray:
    return np.char.zfill(ids.astype(np.int64).astype(np.str_), _PAD)


def _exact_tier(docs: rd.Dataset, nparts: int) -> rd.Dataset:
    """(doc_id, text) → (doc_id, text, keeper): keeper = min doc_id of the
    exact-content group.  Hash-partition by content hash, then ONE vectorized
    pandas groupby per partition on the true text values (collision-exact —
    the 64-bit hash only routes, it never decides equality)."""

    def add_part(t: pa.Table) -> pa.Table:
        h = stable_str_hash(
            pc.fill_null(t["text"], "").to_pylist()
        )
        part = (splitmix64(h) % np.uint64(nparts)).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "text": t["text"],
            "part": pa.array(part, pa.int64()),
        })

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        keeper = g.groupby(g["text"].fillna(""), sort=False)["doc_id"].transform("min")
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "text": g["text"],
            "keeper": keeper.to_numpy(np.int64),
        })

    return (
        docs.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )


def _min_keeper_edges(clusters: rd.Dataset, id_col: str = "id") -> rd.Dataset:
    """(id, cluster_id) → removal edges (doc_id, keeper) with keeper = the
    numeric-min member.  Partition-then-vectorize: hash-partition by
    cluster_id (co-locating each cluster), then ONE vectorized
    ``transform('min')`` per partition — not a Python UDF per cluster, which
    at high dup rates is hundreds of thousands of tiny DataFrame builds."""
    from marc_record_merge_melindautils_ray.stages.cluster import (
        adaptive_parts,
        cluster_parallelism,
    )

    nparts = adaptive_parts(
        clusters.count(), lo=max(4, 2 * cluster_parallelism()), hi=512
    )

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        h = splitmix64(stable_str_hash(df["cluster_id"].to_numpy()))
        df = df.copy()
        df["part"] = (h % np.uint64(nparts)).astype(np.int64)
        return df

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy(np.int64)
        keeper = g.groupby("cluster_id")[id_col].transform("min").to_numpy(np.int64)
        m = ids != keeper
        return pd.DataFrame({"doc_id": ids[m], "keeper": keeper[m]})

    return (
        clusters.map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )


class _RemovedFilter:
    """Drop rows whose id is in the broadcast removed-id block refs
    (vectorized sorted-int64 membership, built once per worker process via
    ``task_stage``).  State is REMOVAL-set sized (dup count, not corpus
    count); if dup rates make it heap-order, switch this stage back to a
    bounded actor pool or shard with ``shard_side_table`` (module note)."""

    def __init__(self, refs, id_col: str):
        parts = []
        for r in refs or []:
            t = _as_table(maybe_get(r))
            if len(t) and "doc_id" in t.column_names:
                parts.append(np.asarray(t["doc_id"], dtype=np.int64))
        self.removed = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from marc_record_merge_melindautils_ray.functions.util import sorted_membership

        ids = np.asarray(t[self.id_col], dtype=np.int64)
        return t.filter(pa.array(~sorted_membership(self.removed, ids)))


def tiered_dedup(
    docs: rd.Dataset,
    emb: rd.Dataset | None = None,
    cfg: DedupConfig | None = None,
    sim_threshold_permille: int = 400,
    emb_dim: int = 64,
    metrics: dict | None = None,
) -> pd.DataFrame:
    """Run the three dedup tiers over ``docs`` (doc_id:int64, text:string),
    optionally with ``emb`` (vec_id:int64, embedding:list<float>) keyed by the
    same ids for the semantic tier.  Returns one row per doc:
    (doc_id, tier, kept_by) — ``tier`` is where the doc was removed
    ('exact'/'near'/'semantic') or 'kept'; ``kept_by`` is the surviving doc it
    deduplicates to (itself when kept)."""
    from ray.data.aggregate import Count

    from marc_record_merge_melindautils_ray.ops.dedup_text import minhash_lsh_clusters
    from marc_record_merge_melindautils_ray.ops.similarity import q_embed_dup_pairs
    from marc_record_merge_melindautils_ray.stages.cluster import (
        actor_pool_size,
        adaptive_parts,
        cluster_parallelism,
        connected_components,
    )

    import time as _time

    cfg = cfg or DedupConfig()
    _stage_sec: dict[str, float] = {}
    _t = _time.monotonic()

    def _lap(name: str) -> None:
        nonlocal _t
        now = _time.monotonic()
        _stage_sec[name] = round(now - _t, 3)
        _t = now

    n_docs = docs.count()
    _lap("count")
    nparts = adaptive_parts(
        n_docs, rows_per_part=20_000, lo=max(4, 2 * cluster_parallelism()), hi=512
    )

    # ---- tier 1: exact ---------------------------------------------------
    exact = _exact_tier(docs, nparts).materialize()
    _lap("exact")
    exact_edges = exact.filter(expr="doc_id != keeper").select_columns(
        ["doc_id", "keeper"]
    )
    surv1 = exact.filter(expr="doc_id == keeper").select_columns(["doc_id", "text"])

    # ---- tier 2: near (MinHash/LSH over exact survivors) ------------------
    near_clusters = minhash_lsh_clusters(surv1, "doc_id", "text", cfg)
    _lap("near_clusters")
    near_edges = _min_keeper_edges(near_clusters).materialize()
    n_near = near_edges.count()
    _lap("near_edges")

    # ---- tier 3: semantic (embedding LSH over near survivors) -------------
    sem_edges: rd.Dataset | None = None
    n_sem = 0
    if emb is not None:
        # Embeddings of tier-1/2 survivors = emb MINUS removed-so-far.  The
        # removed set is dup-count sized (not corpus sized), so an anti-
        # membership broadcast filter beats a corpus×corpus hash join — and
        # Ray's hash join can't carry the list<float> payload column anyway.
        # At 100 TB with extreme dup rates, shard the removal blocks via
        # ``state.broadcast_index.shard_side_table``.
        removed12 = exact_edges.select_columns(["doc_id"])
        if n_near:
            removed12 = removed12.union(near_edges.select_columns(["doc_id"]))
        removed12_refs = removed12.materialize().to_arrow_refs()
        # materialized: q_embed_dup_pairs counts its input before consuming
        # it — an unmaterialized filter pipeline would re-read and re-filter
        # the (corpus-sized) embeddings table twice
        emb_surv = emb.map_batches(
            task_stage(_RemovedFilter, (removed12_refs, "vec_id"),
                       key=("tiered_rmf", *removed12_refs)),
            batch_format="pyarrow",
        ).materialize()
        _lap("emb_filter")
        sem_metrics: dict = {}
        sem_pairs = q_embed_dup_pairs(
            "", threshold_permille=sim_threshold_permille, metrics=sem_metrics,
            ds=emb_surv, dim=emb_dim,
        )
        _lap("sem_pairs")
        if metrics is not None:
            metrics["semantic_lsh"] = sem_metrics
        if len(sem_pairs):
            sem_cc = connected_components(
                rd.from_pandas(pd.DataFrame({
                    "id_a": _pad_ids(sem_pairs["id_a"].to_numpy()),
                    "id_b": _pad_ids(sem_pairs["id_b"].to_numpy()),
                })),
                cfg, n_edges=len(sem_pairs),
            )

            def cc_to_edges(df: pd.DataFrame) -> pd.DataFrame:
                ids = df["clip_id"].astype(np.int64).to_numpy()
                keeper = df["cluster_id"].str.slice(3).astype(np.int64).to_numpy()
                m = ids != keeper
                return pd.DataFrame({"doc_id": ids[m], "keeper": keeper[m]})

            sem_edges = sem_cc.map_batches(cc_to_edges, batch_format="pandas").materialize()
            n_sem = sem_edges.count()
            _lap("sem_cc")

    # ---- attribution + final keeper resolution ----------------------------
    def tag(ds: rd.Dataset, tier: str) -> rd.Dataset:
        return ds.map_batches(
            lambda t, tier=tier: t.append_column(
                "tier", pa.array(np.full(len(t), tier), pa.string())
            ),
            batch_format="pyarrow",
        )

    edge_sets = []
    if exact_edges.count():
        edge_sets.append(tag(exact_edges, TIER_EXACT))
    if n_near:
        edge_sets.append(tag(near_edges, TIER_NEAR))
    if sem_edges is not None and n_sem:
        edge_sets.append(tag(sem_edges, TIER_SEMANTIC))
    n_edges = 0
    if edge_sets:
        all_edges = (
            edge_sets[0].union(*edge_sets[1:]) if len(edge_sets) > 1 else edge_sets[0]
        ).materialize()
        n_edges = all_edges.count()
        _lap("union_edges")

    if n_edges == 0:
        out = docs.select_columns(["doc_id"]).to_pandas()
        out["tier"] = TIER_KEPT
        out["kept_by"] = out["doc_id"]
        if metrics is not None:
            metrics.update({"n_docs": n_docs, "removed_exact": 0, "removed_near": 0,
                            "removed_semantic": 0, "n_kept": n_docs})
        return out.sort_values("doc_id").reset_index(drop=True)

    cc_all = connected_components(
        all_edges.map_batches(
            lambda df: pd.DataFrame({
                "id_a": _pad_ids(df["doc_id"].to_numpy()),
                "id_b": _pad_ids(df["keeper"].to_numpy()),
            }),
            batch_format="pandas",
        ),
        cfg, n_edges=n_edges,
    ).materialize()
    _lap("cc_all")

    removal_refs = all_edges.select_columns(["doc_id", "tier"]).materialize().to_arrow_refs()
    cc_refs = cc_all.to_arrow_refs()

    class TagDocs:
        """Per-actor sorted-int64 lookup over the broadcast removal + CC
        blocks (the flagship's ArrowBlockIndex pattern, int-keyed)."""

        def __init__(self, removal_refs, cc_refs):
            rem_ids, rem_tiers = [], []
            for r in removal_refs or []:
                t = _as_table(maybe_get(r))
                if len(t) and "doc_id" in t.column_names:
                    rem_ids.append(np.asarray(t["doc_id"], dtype=np.int64))
                    rem_tiers.append(np.asarray(t["tier"].to_pylist(), dtype=object))
            ids = np.concatenate(rem_ids) if rem_ids else np.empty(0, np.int64)
            tiers = np.concatenate(rem_tiers) if rem_tiers else np.empty(0, object)
            o = np.argsort(ids, kind="stable")
            self.rem_ids, self.rem_tiers = ids[o], tiers[o]
            cids, keepers = [], []
            for r in cc_refs or []:
                t = _as_table(maybe_get(r))
                if len(t) and "clip_id" in t.column_names:
                    cids.append(
                        np.asarray(t["clip_id"].to_pylist(), dtype=np.int64)
                    )
                    keepers.append(np.asarray(
                        [int(c[3:]) for c in t["cluster_id"].to_pylist()], np.int64
                    ))
            cid = np.concatenate(cids) if cids else np.empty(0, np.int64)
            kp = np.concatenate(keepers) if keepers else np.empty(0, np.int64)
            o = np.argsort(cid, kind="stable")
            self.cc_ids, self.cc_keepers = cid[o], kp[o]

        def _lookup(self, sorted_keys, values, ids, default):
            if not len(sorted_keys):
                return np.full(len(ids), default)
            pos = np.clip(np.searchsorted(sorted_keys, ids), 0, len(sorted_keys) - 1)
            hit = sorted_keys[pos] == ids
            out = np.full(len(ids), default)
            out[hit] = values[pos[hit]]
            return out

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t["doc_id"], dtype=np.int64)
            tier = self._lookup(self.rem_ids, self.rem_tiers, ids,
                                np.array(TIER_KEPT, object))
            kept_by = self._lookup(self.cc_ids, self.cc_keepers, ids, np.int64(-1))
            kept_by = np.where(tier == TIER_KEPT, ids, kept_by)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "tier": pa.array(list(tier), pa.string()),
                "kept_by": pa.array(kept_by, pa.int64()),
            })

    out = (
        docs.select_columns(["doc_id"])
        .map_batches(
            task_stage(TagDocs, (removal_refs, cc_refs),
                       key=("tiered_tag", *removal_refs, *cc_refs)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    _lap("tag_docs")
    counts = out["tier"].value_counts()
    meta = {
        "n_docs": int(n_docs),
        "removed_exact": int(counts.get(TIER_EXACT, 0)),
        "removed_near": int(counts.get(TIER_NEAR, 0)),
        "removed_semantic": int(counts.get(TIER_SEMANTIC, 0)),
        "n_kept": int(counts.get(TIER_KEPT, 0)),
    }
    meta["stage_sec"] = _stage_sec
    _log.info("tiered_dedup metrics: %s", meta)
    if metrics is not None:
        metrics.update(meta)
    return out


def q_tiered_dedup(sf_dir: str, metrics: dict | None = None) -> pd.DataFrame:
    """Driver entry: tiered dedup over the documents table with the
    embeddings table (vec_id ≡ doc_id) as the semantic tier's signal."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return tiered_dedup(docs, emb, metrics=metrics)
