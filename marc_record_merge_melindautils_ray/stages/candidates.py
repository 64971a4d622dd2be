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


def make_expand_bands(
    cfg: DedupConfig,
    hot_keys: np.ndarray | None = None,
    multi_keys=None,
    nsalt: int = 16,
):
    """Stateless task kernel: explode rows into (band_key, gate-cols) rows.

    ``multi_keys`` (band keys seen on ≥2 rows, from the counting pass) acts
    as a pre-shuffle filter: singleton band keys can never produce a pair, so
    their rows never enter the groupby shuffle — at low dup rates this cuts
    both shuffle volume and the per-group UDF count by orders of magnitude.
    Accepts an ndarray (small-scale exact array) or any ``.contains`` filter
    — the pipeline's exact mode passes a distributed-built
    ``state.bloom.BloomKeyFilter`` whose false positives only re-admit
    singleton keys (they form size-1 groups and emit no pairs).
    ``hot_keys`` (count > bucket_cap) are salted by CONTENT so every
    verifiable dup pair stays co-bucketed.
    """
    from marc_record_merge_melindautils_ray.state.bloom import as_key_filter

    hot = np.sort(hot_keys.astype(np.uint64)) if hot_keys is not None and len(hot_keys) else None
    multi = as_key_filter(multi_keys)
    nsalt_u = np.uint64(nsalt)

    def expand(batch: pa.Table) -> pa.Table:
        row_idx, keys = _flatten_bands(batch)
        if multi is not None:
            keep = multi.contains(keys)
            row_idx, keys = row_idx[keep], keys[keep]
        if hot is not None and len(keys):
            is_hot = _in_sorted(hot, keys)
            if is_hot.any():
                fp = np.asarray(batch["fp"]).view(np.uint64)[row_idx]
                nh0 = np.asarray(batch["nh0"]).view(np.uint64)[row_idx]
                with np.errstate(over="ignore"):
                    salt = splitmix64(fp ^ nh0) % nsalt_u
                    keys = np.where(is_hot, splitmix64(keys ^ (salt + np.uint64(1))), keys)
        idx = pa.array(row_idx, pa.int64())
        cols = {"band_key": pa.array(keys.view(np.int64), pa.int64()),
                "clip_id": batch["clip_id"].take(idx)}
        for c in GATE_COLS:
            cols[c] = batch[c].take(idx)
        return pa.table(cols)

    return expand


def shingle_key_counts(batch: pa.Table) -> pa.Table:
    """Partial per-batch counts of containment index keys."""
    samp = batch["samp_shingles"]
    if isinstance(samp, pa.ChunkedArray):
        samp = samp.combine_chunks()
    vals = np.asarray(samp.values).view(np.uint64)
    uniq, cnt = np.unique(vals, return_counts=True)
    return pa.table({"sh": pa.array(uniq.view(np.int64), pa.int64()),
                     "cnt": pa.array(cnt, pa.int64())})


def make_expand_shingles(cfg: DedupConfig, useful_keys=None):
    """Stateless task kernel: explode sampled shingle hashes (containment
    pass).  ``useful_keys`` = keys with 2 ≤ count ≤ bucket_cap from the
    counting pass: singleton keys can't pair, over-cap keys are too-common
    grams the emitter would drop anyway — neither enters the shuffle.
    ndarray or ``.contains`` filter (Bloom at scale), like
    ``make_expand_bands``."""
    from marc_record_merge_melindautils_ray.state.bloom import as_key_filter

    useful = as_key_filter(useful_keys)

    def expand(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        samp = batch["samp_shingles"]
        if isinstance(samp, pa.ChunkedArray):
            samp = samp.combine_chunks()
        nlen = pc.utf8_length(batch["norm_transcript"])
        offsets = np.asarray(samp.offsets)
        ok_doc = np.asarray(nlen) >= cfg.containment_min_len
        flat_vals = np.asarray(samp.values)
        full_row_idx = np.repeat(np.arange(len(batch)), np.diff(offsets))
        keep_mask = ok_doc[full_row_idx]
        if useful is not None:
            keep_mask &= useful.contains(flat_vals.view(np.uint64))
        values = flat_vals[keep_mask]
        row_idx = full_row_idx[keep_mask]
        idx = pa.array(row_idx, pa.int64())
        cols = {"sh": pa.array(np.asarray(values).view(np.int64), pa.int64()),
                "clip_id": batch["clip_id"].take(idx),
                "n_shingles": batch["n_shingles"].take(idx)}
        for c in GATE_COLS:
            cols[c] = batch[c].take(idx)
        return pa.table(cols)

    return expand


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


def make_band_pair_emitter(cfg: DedupConfig, key_col: str = "band_key"):
    def emit(g: pd.DataFrame) -> pa.Table:
        return pairs_df_to_table(
            _strip_shingle_cols(_emit_pairs_vectorized(g, cfg, "band", key_col))
        )

    return emit


def make_containment_pair_emitter(cfg: DedupConfig, key_col: str = "sh"):
    def emit(g: pd.DataFrame) -> pa.Table:
        df = _emit_pairs_vectorized(g, cfg, "containment", key_col)
        if len(df):
            # containment needs a size asymmetry; equal-size pairs are the
            # band path's job (exact/near dups)
            df = df[df["n_shingles_a"] != df["n_shingles_b"]]
        return pairs_df_to_table(_strip_shingle_cols(df))

    return emit


def _strip_shingle_cols(df: pd.DataFrame) -> pd.DataFrame:
    return df.drop(
        columns=[c for c in df.columns if c.startswith("n_shingles") or c == "part"],
        errors="ignore",
    )


def add_pair_key(batch: pa.Table) -> pa.Table:
    """64-bit shuffle key for pair dedup; collisions are resolved inside the
    group by the (id_a, id_b) composite, so a key collision never drops a
    distinct pair."""
    ids = [f"{a}\x1f{b}" for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist())]
    pk = stable_str_hash(ids) if ids else np.empty(0, np.uint64)
    return batch.append_column("pair_key", pa.array(pk.view(np.int64), pa.int64()))


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
