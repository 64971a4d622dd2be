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

# gate columns every pair row carries for both sides (phase-1 verify needs no join)
GATE_COLS = ["fp", "nh0", "nh1", "dur_ms", "codec_cls", "sources", "is_segment_of", "decode_ok"]

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


def make_expand_bands(cfg: DedupConfig, hot_keys: np.ndarray | None = None, nsalt: int = 16):
    """Stateless task kernel: explode rows into (band_key, gate-cols) rows,
    salting hot keys by content."""
    hot = np.sort(hot_keys.astype(np.uint64)) if hot_keys is not None and len(hot_keys) else None
    nsalt_u = np.uint64(nsalt)

    def expand(batch: pa.Table) -> pa.Table:
        row_idx, keys = _flatten_bands(batch)
        if hot is not None and len(keys):
            is_hot = hot[np.searchsorted(hot, keys).clip(max=len(hot) - 1)] == keys
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


def make_expand_shingles(cfg: DedupConfig):
    """Stateless task kernel: explode sampled shingle hashes (containment pass)."""

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


def _pairs_from_group(g: pd.DataFrame, cfg: DedupConfig, rel: str) -> pd.DataFrame:
    """All-pairs inside a bucket, sorted-neighborhood when oversized."""
    g = g.drop_duplicates("clip_id")
    n = len(g)
    empty = _empty_pairs()
    if n < 2:
        return empty
    if rel == "containment" and n > cfg.bucket_cap:
        return empty  # too-common shingle: useless containment key (logged via metrics)
    if n <= cfg.bucket_cap:
        ii, jj = np.triu_indices(n, k=1)
    else:
        # sorted-neighborhood on the content key: verifiable dups share
        # (nh0, fp) so they sort adjacently; window w bounds pairs at O(n·w)
        order = np.lexsort((g["clip_id"].to_numpy(), g["fp"].to_numpy(), g["nh0"].to_numpy()))
        g = g.iloc[order]
        w = 4
        base = np.arange(n)
        ii = np.concatenate([base[:-d] for d in range(1, w + 1) if d < n])
        jj = np.concatenate([base[d:] for d in range(1, w + 1) if d < n])
        if len(ii) > cfg.max_pairs_per_bucket:
            ii, jj = ii[: cfg.max_pairs_per_bucket], jj[: cfg.max_pairs_per_bucket]
    ids = g["clip_id"].to_numpy()
    swap = ids[ii] > ids[jj]
    lo = np.where(swap, jj, ii)
    hi = np.where(swap, ii, jj)
    out = {"id_a": ids[lo], "id_b": ids[hi], "rel": np.full(len(lo), rel, dtype=object),
           "bucket_n": np.full(len(lo), n, dtype=np.int32)}
    for c in GATE_COLS + (["n_shingles"] if "n_shingles" in g.columns else []):
        vals = g[c].to_numpy()
        if c == "sources":
            # arrow list<string> → pandas yields ndarray cells; keep plain
            # Python lists so the pandas→Arrow round-trip stays a ListArray
            # (explicit object array: np.array() would collapse equal-length
            # lists into a 2-D array)
            tmp = np.empty(len(vals), dtype=object)
            tmp[:] = [list(v) if v is not None else None for v in vals]
            vals = tmp
        out[f"{c}_a"] = vals[lo]
        out[f"{c}_b"] = vals[hi]
    return pd.DataFrame(out)


def _empty_pairs() -> pd.DataFrame:
    cols = {"id_a": [], "id_b": [], "rel": [], "bucket_n": []}
    for c in GATE_COLS + ["n_shingles"]:
        cols[f"{c}_a"] = []
        cols[f"{c}_b"] = []
    return pd.DataFrame(cols)


def make_band_pair_emitter(cfg: DedupConfig):
    def emit(g: pd.DataFrame) -> pd.DataFrame:
        df = _pairs_from_group(g, cfg, "band")
        return df.drop(columns=[c for c in df.columns if c.startswith("n_shingles")], errors="ignore")

    return emit


def make_containment_pair_emitter(cfg: DedupConfig):
    def emit(g: pd.DataFrame) -> pd.DataFrame:
        df = _pairs_from_group(g, cfg, "containment")
        if len(df):
            # containment needs a size asymmetry; equal-size pairs are the
            # band path's job (exact/near dups)
            df = df[df["n_shingles_a"] != df["n_shingles_b"]]
        return df.drop(columns=[c for c in df.columns if c.startswith("n_shingles")], errors="ignore")

    return emit


def add_pair_key(batch: pa.Table) -> pa.Table:
    """64-bit shuffle key for pair dedup; collisions are resolved inside the
    group by the (id_a, id_b) composite, so a key collision never drops a
    distinct pair."""
    ids = [f"{a}\x1f{b}" for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist())]
    pk = stable_str_hash(ids) if ids else np.empty(0, np.uint64)
    return batch.append_column("pair_key", pa.array(pk.view(np.int64), pa.int64()))


def dedup_pair_group(g: pd.DataFrame) -> pd.DataFrame:
    from marc_record_merge_melindautils_ray.functions.util import sanitize_list_cols

    # sort by rel so 'band' (cheaper verify path) deterministically wins when
    # the same pair was found by both the band and containment passes
    g = g.sort_values(["id_a", "id_b", "rel"]).drop_duplicates(
        subset=["id_a", "id_b"], keep="first"
    )
    return sanitize_list_cols(g, ["sources_a", "sources_b"])
