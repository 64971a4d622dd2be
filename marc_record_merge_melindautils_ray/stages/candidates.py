"""Stage 3: candidate-pair generation — the engine's first shuffle.

LSH band expansion → ``groupby(band_key)`` → intra-bucket pair emission, plus
a sampled-shingle containment pass (the ``normalizingSubsetComparator``
analog, ``lib/record-utils.js:219-226``).  This supplies the outer layer the
reference delegates to the surrounding Melinda system (``README.md:3``): the
reference only ever sees pairs already proposed as duplicates.

Skew handling (BASELINE.json ``north_rule`` requires it explicitly):

1. A cheap pre-aggregated counting pass finds *hot* band keys (bucket size >
   ``bucket_cap``) — partial counts per batch, then a tiny ``groupby().sum()``.
2. Hot keys are salted by **content** (``salt = mix(fp ^ nh0) % nsalt``), not
   by clip_id: any pair that could pass verification agrees on fingerprint and
   normalized-transcript hash, so true dups always land in the same salted
   sub-bucket — salting is recall-lossless w.r.t. verifiable pairs while
   bounding every bucket's O(n²) pair emission.
3. Inside a still-oversized bucket, pair emission falls back to
   sorted-neighborhood pairing on the content key (O(n·w)) and flags the
   bucket (``bucket_n`` column) — capped work is visible, never silent.

Only ~100 B/row of signature + gate columns transit this shuffle; audio
payloads never do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from marc_record_merge_melindautils_ray.config import DedupConfig
from marc_record_merge_melindautils_ray.functions.hashing import splitmix64, stable_str_hash

# gate columns every pair row carries for both sides (phase-1 verify needs no
# join).  ch0/ch1 are the 128-bit payload content-identity hash
# (functions.hashing.PayloadHasher): +16 B per expanded row buys phase-1 the
# vectorized byte-identity verdict that keeps exact-dup pairs out of the
# payload-touching phase-2 actor pool entirely.
GATE_COLS = ["fp", "nh0", "nh1", "ch0", "ch1", "dur_ms", "codec_cls", "sources",
             "is_segment_of", "decode_ok", "author_type"]

_GATE_TYPES = {
    "fp": pa.int64(), "nh0": pa.int64(), "nh1": pa.int64(),
    "ch0": pa.int64(), "ch1": pa.int64(), "dur_ms": pa.int32(),
    "codec_cls": pa.string(), "sources": pa.list_(pa.string()),
    "is_segment_of": pa.string(), "decode_ok": pa.bool_(), "author_type": pa.string(),
}

# explicit pair schema: emitters on empty/all-null partitions would otherwise
# infer null-typed columns, producing mixed-schema blocks that break joins
# and unions downstream
PAIR_SCHEMA = pa.schema(
    [("id_a", pa.string()), ("id_b", pa.string()), ("rel", pa.string()),
     ("bucket_n", pa.int32())]
    + [(f"{c}_{s}", _GATE_TYPES[c]) for c in GATE_COLS for s in ("a", "b")]
)


def pairs_df_to_table(df: pd.DataFrame) -> pa.Table:
    cols = {}
    for f in PAIR_SCHEMA:
        if f.name in df.columns:
            cols[f.name] = pa.array(df[f.name].tolist(), type=f.type)
        else:
            cols[f.name] = pa.nulls(len(df), f.type)
    return pa.table(cols)

def _flatten_bands(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx, band_key) for all non-empty band slots, vectorized."""
    bands = batch["bands"]
    if isinstance(bands, pa.ChunkedArray):
        bands = bands.combine_chunks()
    nb = bands.type.list_size
    keys = np.asarray(bands.values).view(np.uint64).reshape(len(batch), nb)
    row_idx = np.repeat(np.arange(len(batch)), nb)
    flat = keys.reshape(-1)
    keep = flat != 0
    return row_idx[keep], flat[keep]


def band_key_counts(batch: pa.Table) -> pa.Table:
    """Partial per-batch counts of band keys (pre-aggregation before the tiny
    hot-key groupby — avoids shuffling one row per (row, band))."""
    _, flat = _flatten_bands(batch)
    uniq, cnt = np.unique(flat, return_counts=True)
    return pa.table({"band_key": pa.array(uniq.view(np.int64), pa.int64()),
                     "cnt": pa.array(cnt, pa.int64())})


def _in_sorted(sorted_arr: np.ndarray, values: np.ndarray) -> np.ndarray:
    if len(sorted_arr) == 0 or len(values) == 0:
        return np.zeros(len(values), dtype=bool)
    return sorted_arr[np.searchsorted(sorted_arr, values).clip(max=len(sorted_arr) - 1)] == values


def shingle_key_counts(batch: pa.Table) -> pa.Table:
    """Partial per-batch counts of containment index keys."""
    samp = batch["samp_shingles"]
    if isinstance(samp, pa.ChunkedArray):
        samp = samp.combine_chunks()
    vals = np.asarray(samp.values).view(np.uint64)
    uniq, cnt = np.unique(vals, return_counts=True)
    return pa.table({"sh": pa.array(uniq.view(np.int64), pa.int64()),
                     "cnt": pa.array(cnt, pa.int64())})


def _empty_pairs() -> pd.DataFrame:
    cols = {"id_a": [], "id_b": [], "rel": [], "bucket_n": []}
    for c in GATE_COLS + ["n_shingles"]:
        cols[f"{c}_a"] = []
        cols[f"{c}_b"] = []
    return pd.DataFrame(cols)


# ---------------------------------------------------------------------------
# Partition-then-vectorize: Ray's map_groups costs ~ms per group, so
# high-cardinality groupbys (one group per band key / pair key / node) are
# re-keyed to `part = mix(key) % P` and each map_groups call processes ALL
# keys of one partition with pandas/numpy — P UDF calls total instead of
# millions.  Rows with equal keys land in equal partitions by construction,
# so semantics are unchanged.  P scales with the cluster (cfg/pipeline).
# ---------------------------------------------------------------------------
def add_partition_col(batch: pa.Table, key_col: str, num_parts: int) -> pa.Table:
    k = np.asarray(batch[key_col]).view(np.uint64)
    part = (splitmix64(k) % np.uint64(num_parts)).astype(np.int64)
    return batch.append_column("part", pa.array(part, pa.int64()))


def _emit_pairs_vectorized(g: pd.DataFrame, cfg: DedupConfig, rel: str, key_col: str) -> pd.DataFrame:
    """Emit intra-bucket pairs for EVERY key in a partition in one pass.

    Groups are found by boundary scan on the sorted key column; all groups of
    equal size share one ``triu_indices`` broadcast (≤ bucket_cap distinct
    sizes), so cost is O(pairs) numpy work with no per-group Python.
    Oversized buckets (already content-salted upstream) fall back to
    sorted-neighborhood pairing per group — rare by construction.
    """
    g = g.sort_values([key_col, "clip_id"]).drop_duplicates([key_col, "clip_id"], keep="first")
    g = g.reset_index(drop=True)
    keys = g[key_col].to_numpy()
    n = len(g)
    if n < 2:
        return _empty_pairs()
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
    oversized = sizes > cfg.bucket_cap
    for s, sz in zip(starts[oversized], sizes[oversized]):
        sub = g.iloc[s : s + sz]
        order = np.lexsort(
            (sub["clip_id"].to_numpy(), sub["fp"].to_numpy(), sub["nh0"].to_numpy())
        )
        w = 4
        base = np.arange(sz)
        ii = np.concatenate([base[:-d] for d in range(1, w + 1) if d < sz])
        jj = np.concatenate([base[d:] for d in range(1, w + 1) if d < sz])
        if len(ii) > cfg.max_pairs_per_bucket:
            ii, jj = ii[: cfg.max_pairs_per_bucket], jj[: cfg.max_pairs_per_bucket]
        lo_list.append(s + order[ii])
        hi_list.append(s + order[jj])
        bn_list.append(np.full(len(ii), sz, np.int32))
    if not lo_list:
        return _empty_pairs()

    lo = np.concatenate(lo_list)
    hi = np.concatenate(hi_list)
    bn = np.concatenate(bn_list)
    ids = g["clip_id"].to_numpy()
    swap = ids[lo] > ids[hi]
    LO = np.where(swap, hi, lo)
    HI = np.where(swap, lo, hi)
    out = {
        "id_a": ids[LO], "id_b": ids[HI],
        "rel": np.full(len(LO), rel, dtype=object),
        "bucket_n": bn,
    }
    for c in GATE_COLS + (["n_shingles"] if "n_shingles" in g.columns else []):
        vals = g[c].to_numpy()
        if c == "sources":
            tmp = np.empty(len(vals), dtype=object)
            tmp[:] = [list(v) if v is not None else None for v in vals]
            vals = tmp
        out[f"{c}_a"] = vals[LO]
        out[f"{c}_b"] = vals[HI]
    return pd.DataFrame(out)


def _strip_shingle_cols(df: pd.DataFrame) -> pd.DataFrame:
    return df.drop(
        columns=[c for c in df.columns if c.startswith("n_shingles") or c == "part"],
        errors="ignore",
    )


def make_expand_unified(
    cfg: DedupConfig,
    hot_keys: np.ndarray | None = None,
    multi_keys=None,
    useful_shingles=None,
    num_parts: int = 64,
    nsalt: int = 16,
):
    """Fused band + shingle expansion: ONE pass over the feature scan emits
    both candidate-row families, pre-partitioned for a SINGLE groupby.

    Measured rationale (108 k clips, 32 cpus): the candidate chain's remote
    compute is <1 core-second — its wall is dominated by sequential
    sort-shuffle barriers and the double feature scan.  Fusing the two
    exchanges into one removes a full sort barrier and halves the scan;
    ``rel_tag`` (0 = band, 1 = containment shingle) keeps the two bucket
    families semantically separate inside the shared shuffle (the emitter
    splits on it, so a band/shingle key collision can at most co-locate
    rows, never co-bucket them).

    Filtering semantics are unchanged from the split kernels: ``multi_keys``
    / ``useful_shingles`` are pre-shuffle occupancy filters (ndarray or
    Bloom ``.contains``), ``hot_keys`` are content-salted band keys."""
    from marc_record_merge_melindautils_ray.state.bloom import as_key_filter

    hot = (np.sort(hot_keys.astype(np.uint64))
           if hot_keys is not None and len(hot_keys) else None)
    multi = as_key_filter(multi_keys)
    useful = as_key_filter(useful_shingles)
    nsalt_u = np.uint64(nsalt)
    parts_u = np.uint64(num_parts)
    # mixes the rel tag into the PARTITION hash only (load spreading); the
    # bucket key itself stays raw so the emitter's per-tag grouping is exact
    tag_mix = np.uint64(0x9E3779B97F4A7C15)

    def expand(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # --- band family (rel_tag 0) ---
        row_b, keys_b = _flatten_bands(batch)
        if multi is not None:
            keep = multi.contains(keys_b)
            row_b, keys_b = row_b[keep], keys_b[keep]
        if hot is not None and len(keys_b):
            is_hot = _in_sorted(hot, keys_b)
            if is_hot.any():
                fp = np.asarray(batch["fp"]).view(np.uint64)[row_b]
                nh0 = np.asarray(batch["nh0"]).view(np.uint64)[row_b]
                with np.errstate(over="ignore"):
                    salt = splitmix64(fp ^ nh0) % nsalt_u
                    keys_b = np.where(
                        is_hot, splitmix64(keys_b ^ (salt + np.uint64(1))), keys_b)

        # --- containment-shingle family (rel_tag 1) ---
        samp = batch["samp_shingles"]
        if isinstance(samp, pa.ChunkedArray):
            samp = samp.combine_chunks()
        nlen = pc.utf8_length(batch["norm_transcript"])
        offsets = np.asarray(samp.offsets)
        ok_doc = np.asarray(nlen) >= cfg.containment_min_len
        flat_vals = np.asarray(samp.values).view(np.uint64)
        row_s = np.repeat(np.arange(len(batch)), np.diff(offsets))
        keep_s = ok_doc[row_s]
        if useful is not None:
            keep_s &= useful.contains(flat_vals)
        keys_s = flat_vals[keep_s]
        row_s = row_s[keep_s]

        row_idx = np.concatenate([row_b, row_s])
        keys = np.concatenate([keys_b, keys_s])
        tags = np.concatenate([np.zeros(len(row_b), np.int8),
                               np.ones(len(row_s), np.int8)])
        with np.errstate(over="ignore"):
            part = (splitmix64(keys ^ (tags.astype(np.uint64) * tag_mix))
                    % parts_u).astype(np.int64)
        idx = pa.array(row_idx, pa.int64())
        cols = {
            "part": pa.array(part, pa.int64()),
            "bkey": pa.array(keys.view(np.int64), pa.int64()),
            "rel_tag": pa.array(tags, pa.int8()),
            "clip_id": batch["clip_id"].take(idx),
            "n_shingles": batch["n_shingles"].take(idx),
        }
        for c in GATE_COLS:
            cols[c] = batch[c].take(idx)
        return pa.table(cols)

    return expand


def make_unified_pair_emitter(cfg: DedupConfig, num_parts: int = 64):
    """Emit band AND containment pairs for one shared partition, already
    keyed for the pair-dedup shuffle (the ``part`` column is the pair-key
    hash partition, so the dedup groupby runs directly on this output — no
    separate add-key/add-partition hops)."""

    def emit(g: pd.DataFrame) -> pa.Table:
        outs = []
        band = g[g["rel_tag"] == 0]
        if len(band) >= 2:
            outs.append(_emit_pairs_vectorized(band, cfg, "band", "bkey"))
        cont = g[g["rel_tag"] == 1]
        if len(cont) >= 2:
            df = _emit_pairs_vectorized(cont, cfg, "containment", "bkey")
            if len(df):
                # containment needs a size asymmetry; equal-size pairs are
                # the band path's job (exact/near dups)
                df = df[df["n_shingles_a"] != df["n_shingles_b"]]
            outs.append(df)
        outs = [d for d in outs if len(d)]
        df = (pd.concat(outs, ignore_index=True) if outs else _empty_pairs())
        df = _strip_shingle_cols(df)
        t = pairs_df_to_table(df)
        if len(df):
            ids = [f"{a}\x1f{b}" for a, b in zip(df["id_a"], df["id_b"])]
            pk = stable_str_hash(ids)
            with np.errstate(over="ignore"):
                part = (splitmix64(pk) % np.uint64(num_parts)).astype(np.int64)
        else:
            part = np.empty(0, np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    return emit


def dedup_pair_group(g: pd.DataFrame) -> pa.Table:
    """Per-partition pair dedup (equal (id_a,id_b) ⇒ equal pair_key ⇒ equal
    partition — one vectorized drop_duplicates per partition)."""
    from marc_record_merge_melindautils_ray.functions.util import sanitize_list_cols

    # sort by rel so 'band' (cheaper verify path) deterministically wins when
    # the same pair was found by both the band and containment passes
    g = g.sort_values(["id_a", "id_b", "rel"]).drop_duplicates(
        subset=["id_a", "id_b"], keep="first"
    )
    g = g.drop(columns=["part"], errors="ignore")
    return pairs_df_to_table(sanitize_list_cols(g, ["sources_a", "sources_b"]))
