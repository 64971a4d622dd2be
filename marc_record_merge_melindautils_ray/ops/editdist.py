"""Bounded edit-distance (Levenshtein) near-duplicate pair join over the
``documents`` table — the character-level complement of the gram-set
similarity family (MinHash/Jaccard catch reordered content; edit distance
catches small in-place mutations the reference's normalizing field
comparators tolerate, ``lib/record-utils.js:100-127``).

Output: every unordered pair (id_a < id_b) whose Levenshtein distance is
≤ ``d``, plus the exact distance.  SQL-expressible — the DuckDB oracle is a
``levenshtein()`` self-join (see ``oracle_sql()['edit_distance_pairs']``).

Distributed plan (no all-pairs, no driver-side text):

1. one featurize pass per batch: byte length + a 256-bin byte histogram per
   doc; the table is materialized once so the verify pool can read texts
   zero-copy from object-store blocks (same idiom as ``q_containment_pairs``);
2. SOUND candidate blocking, two strategies behind one knob:
   * ``"prefix"`` — Ed-Join prefix filtering (Xiao et al., VLDB'08, public):
     if ed(a,b) ≤ d the (q·d+1)-prefixes of their q-gram multisets under any
     GLOBAL total order (we use the gram hash) must intersect; docs shorter
     than q·(d+1) chars fall below the count-filter's validity floor and go
     to one SHORT stratum key instead.  The scale path for high-entropy text.
   * ``"length"`` — width-``d`` length buckets (each doc emits its own and
     the next bucket; |len_a−len_b| ≤ d ⇒ some shared key).  Complete by
     construction and CHEAPER on low-entropy corpora, where shared-vocabulary
     grams make every prefix collide (measured on the synthetic word-soup
     table: prefix emits 36× more candidate rows than length).
   * ``"auto"`` (default) — pick by measured gram diversity on a bounded
     sample (distinct prefix grams per emitted gram row); the choice is
     logged, never silent.
3. per-key pair emission is partition-vectorized with an in-group length
   window (|Δlen| ≤ d — sound: each indel changes length by 1), then pairs
   are hash-partitioned and deduped;
4. verify: an actor pool holding the doc blocks applies a byte-histogram L1
   prefilter (each substitution moves two bins by 1, each indel one bin ⇒
   L1 ≤ 2d — sound) and then an exact BANDED Levenshtein DP, vectorized
   ACROSS pairs: one row loop over max-length with (pairs × band) numpy
   updates, the in-row insertion chain closed by a min-plus prefix scan
   (``minimum.accumulate``), early-terminating pairs whose band minimum
   exceeds ``d`` (band row minima are non-decreasing).

Byte-level note: distances are computed over UTF-8 bytes; for ASCII text
(this corpus) byte-level equals DuckDB's character-level ``levenshtein``.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from marc_record_merge_melindautils_ray.functions.hashing import splitmix64
from marc_record_merge_melindautils_ray.stages.cluster import actor_pool_size

logger = logging.getLogger(__name__)

_FNV = np.uint64(1_099_511_628_211)
_SHORT_KEY = np.int64(-(2**62))  # stratum key for docs below the prefix floor


# ------------------------------------------------------------------ kernel
def banded_levenshtein_batch(a_texts, b_texts, d: int) -> np.ndarray:
    """Exact Levenshtein distance per pair for distances ≤ ``d``; pairs whose
    distance exceeds ``d`` report ``d+1``.  Vectorized across pairs: the DP
    runs one python loop over rows (max string length) doing (pairs × band)
    numpy work per row, with dead pairs compacted away.

    ``a_texts``/``b_texts``: sequences of ``bytes``.
    """
    k = len(a_texts)
    cap = np.int32(d + 1)
    ans = np.full(k, cap, np.int64)
    if k == 0:
        return ans
    m = np.array([len(x) for x in a_texts], np.int64)
    n = np.array([len(x) for x in b_texts], np.int64)
    # trivial rows: empty side ⇒ distance = other length; band infeasible
    feas = np.abs(m - n) <= d
    both = (m > 0) & (n > 0)
    ans[feas & (m == 0)] = n[feas & (m == 0)]
    ans[feas & (n == 0) & (m > 0)] = m[feas & (n == 0) & (m > 0)]
    live = np.flatnonzero(feas & both)
    if not len(live):
        return ans
    maxM = int(m[live].max())
    W = 2 * d + 1
    A = np.zeros((len(live), maxM), np.uint8)
    B = np.full((len(live), maxM + W + 1), 255, np.uint8)  # left pad d+1
    for r, idx in enumerate(live):
        A[r, : m[idx]] = np.frombuffer(a_texts[idx], np.uint8)
        B[r, d + 1 : d + 1 + n[idx]] = np.frombuffer(b_texts[idx], np.uint8)
    ml, nl = m[live].astype(np.int32), n[live].astype(np.int32)
    offs = np.arange(W, dtype=np.int32)
    # D[r, o] = cost at (row i, col j=i+o−d); sentinel d+1 ≡ "> d" (safe: a
    # clipped value can never undercut a true ≤ d path)
    D = np.full((len(live), W), cap, np.int32)
    D[:, d:] = offs[d:] - d
    orig = live.copy()  # maps current working rows → indices into `ans`
    for i in range(1, maxM + 1):
        j = offs[None, :] + (i - d)  # col index per band offset
        sub = (A[:, i - 1 : i] != B[:, i : i + W]).astype(np.int32)
        diag = D + sub
        up = np.full_like(D, cap)
        up[:, :-1] = D[:, 1:] + 1
        cand = np.minimum(diag, up)
        cand[(j < 1) | (j > nl[:, None])] = cap
        if i <= d:  # virtual boundary cell D[i][0] = i feeds the row scan
            cand[:, d - i] = np.minimum(cand[:, d - i], i)
        row = np.minimum.accumulate(cand - offs[None, :], axis=1) + offs[None, :]
        np.minimum(row, cap, out=row)
        act = i <= ml
        D[act] = row[act]
        fin = ml == i
        if fin.any():
            ans[orig[fin]] = D[fin, nl[fin] - i + d]
        # band row minima are non-decreasing ⇒ a row already all > d stays > d
        alive = (ml > i) & (D.min(axis=1) <= d)
        na = int(alive.sum())
        if na == 0:
            break
        if na < 0.6 * len(ml):  # compact dead pairs away (answers already cap)
            A, B, D = A[alive], B[alive], D[alive]
            ml, nl, orig = ml[alive], nl[alive], orig[alive]
    return ans


# ------------------------------------------------------------ featurize
def _featurize(t: pa.Table) -> pa.Table:
    """(doc_id, text) → + byte length + 256-bin byte histogram (as bytes).
    One pass over the batch's concatenated string buffer; per-doc histograms
    via a single flat ``bincount`` over (doc_index << 8 | byte)."""
    col = t["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.fill_null("")
    k = len(col)
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], off_dtype, count=col.offset + k + 1).astype(
        np.int64
    )[col.offset :]
    lens = np.diff(offs)
    if bufs[2] is not None and int(offs[-1]) > int(offs[0]):
        buf = np.frombuffer(bufs[2], np.uint8, count=int(offs[-1]))[offs[0] :]
        doc_of = np.repeat(np.arange(k, dtype=np.int64), lens)
        flat = np.bincount((doc_of << 8) | buf, minlength=k * 256)
        # int16 halves the verify stage's gather traffic; clipping is sound
        # for the filter (|min(a,C)−min(b,C)| ≤ |a−b| only shrinks the L1)
        chist = np.minimum(flat.reshape(k, 256), 32767).astype(np.int16)
    else:
        chist = np.zeros((k, 256), np.int16)
    return pa.table({
        "doc_id": t["doc_id"],
        "text": col,
        "blen": pa.array(lens, pa.int64()),
        "chist": pa.array(
            [r.tobytes() for r in chist], pa.binary()
        ),
    })


def _prefix_gram_rows(t: pa.Table, d: int, q: int) -> pa.Table:
    """Ed-Join blocking rows: (key, doc_id, blen) — each doc's q·d+1 smallest
    q-gram hashes (hash order = the global total order), the SHORT stratum
    for docs below the q·(d+1)-char count-filter floor."""
    col = t["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.fill_null("")
    k = len(col)
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], off_dtype, count=col.offset + k + 1).astype(
        np.int64
    )[col.offset :]
    lens = np.diff(offs)
    ids = np.asarray(t["doc_id"], np.int64)
    P = q * d + 1
    keys, docs = [], []
    if bufs[2] is not None and int(offs[-1]) - int(offs[0]) >= q:
        buf = np.frombuffer(bufs[2], np.uint8, count=int(offs[-1]))
        mwin = len(buf) - q + 1
        acc = np.zeros(mwin, np.uint64)
        with np.errstate(over="ignore"):
            for i in range(q):
                acc = acc * _FNV + buf[i : i + mwin]
        gh = splitmix64(acc)
        pos = np.arange(mwin)
        doc_of = np.clip(np.searchsorted(offs, pos, side="right") - 1, 0, k - 1)
        in_doc = (pos >= offs[0]) & (pos >= offs[doc_of]) & (pos + q <= offs[doc_of + 1])
        gh, doc_of = gh[in_doc], doc_of[in_doc]
        if len(gh):
            # per-doc ascending gram hashes; take first P per doc (multiset
            # prefix — duplicates kept; pair dedup absorbs the repeats)
            order = np.lexsort((gh, doc_of))
            gh, doc_of = gh[order], doc_of[order]
            first = np.r_[True, doc_of[1:] != doc_of[:-1]]
            run_start = np.flatnonzero(first)
            rank = np.arange(len(gh)) - np.repeat(run_start, np.diff(np.r_[run_start, len(gh)]))
            keep = rank < P
            keys.append(gh[keep].view(np.int64))
            docs.append(doc_of[keep])
    short = np.flatnonzero(lens < q * (d + 1))
    if len(short):
        keys.append(np.full(len(short), _SHORT_KEY, np.int64))
        docs.append(short)
    if not keys:
        kk = np.empty(0, np.int64)
        dd = np.empty(0, np.int64)
    else:
        kk = np.concatenate(keys)
        dd = np.concatenate(docs)
    return pa.table({
        "key": pa.array(kk, pa.int64()),
        "doc_id": pa.array(ids[dd], pa.int64()),
        "blen": pa.array(lens[dd], pa.int64()),
    })


def _length_bucket_rows(t: pa.Table, d: int) -> pa.Table:
    """Length-bucket blocking rows: each doc emits buckets ⌊len/d⌋ and
    ⌊len/d⌋+1, so any pair with |Δlen| ≤ d shares a key."""
    lens = np.asarray(t["blen"], np.int64)
    ids = np.asarray(t["doc_id"], np.int64)
    b = lens // max(d, 1)
    kk = np.concatenate([b, b + 1])
    return pa.table({
        "key": pa.array(splitmix64(kk.view(np.uint64)).view(np.int64), pa.int64()),
        "doc_id": pa.array(np.tile(ids, 2), pa.int64()),
        "blen": pa.array(np.tile(lens, 2), pa.int64()),
    })


def _emit_pairs(g: pd.DataFrame, d: int) -> pd.DataFrame:
    """Per-partition candidate pair emission: within each key run (sorted by
    length) emit pairs inside the |Δlen| ≤ d window, vectorized."""
    empty = pd.DataFrame({
        "id_a": pd.Series([], dtype=np.int64),
        "id_b": pd.Series([], dtype=np.int64),
    })
    if not len(g):
        return empty
    g = g.drop_duplicates(["key", "doc_id"])
    keys = g["key"].to_numpy()
    order = np.lexsort((g["doc_id"].to_numpy(), g["blen"].to_numpy(), keys))
    keys = keys[order]
    lens = g["blen"].to_numpy()[order]
    ids = g["doc_id"].to_numpy()[order]
    n = len(keys)
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    # within each run, rightmost index whose len ≤ len_i + d
    hi = np.empty(n, np.int64)
    for s, e in zip(starts, np.r_[starts[1:], n]):
        hi[s:e] = s + np.searchsorted(lens[s:e], lens[s:e] + d, side="right")
    cnt = hi - np.arange(n) - 1
    cnt = np.maximum(cnt, 0)
    total = int(cnt.sum())
    if total == 0:
        return empty
    left = np.repeat(np.arange(n), cnt)
    step = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    right = left + 1 + step
    a, b = ids[left], ids[right]
    lo = np.minimum(a, b)
    hi2 = np.maximum(a, b)
    keep = lo != hi2
    out = pd.DataFrame({"id_a": lo[keep], "id_b": hi2[keep]})
    return out.drop_duplicates()


class _VerifyEditDistance:
    """Actor-pool verify: per-actor zero-copy doc index (text + byte
    histogram) from object-store blocks; per batch of candidate pairs an L1
    histogram prefilter then the exact pair-batched banded DP."""

    def __init__(self, refs, d: int):
        from marc_record_merge_melindautils_ray.state.broadcast_index import (
            ArrowBlockIndex,
        )

        self.idx = ArrowBlockIndex(refs, "doc_id")
        self.d = d
        # dense (docs × 256) int16 histogram matrix, built ONCE per actor —
        # the per-pair filter is then a fancy-index gather + abs/sum instead
        # of per-row bytes materialization (measured 10× stage speedup)
        mats, offs, off = [], [], 0
        for tb in self.idx.tables:
            col = tb["chist"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            mats.append(
                np.frombuffer(b"".join(col.to_pylist()), np.int16).reshape(-1, 256)
            )
            offs.append(off)
            off += len(tb)
        self._H = (
            np.vstack(mats) if mats else np.zeros((0, 256), np.int16)
        )
        self._block_off = np.array(offs + [off], np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        empty = pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
        })
        if not len(t):
            return empty
        a = np.asarray(t["id_a"], np.int64)
        b = np.asarray(t["id_b"], np.int64)
        ba, ra, oka = self.idx.lookup(a.astype(object))
        bb, rb, okb = self.idx.lookup(b.astype(object))
        ok = oka & okb
        a, b, ba, ra, bb, rb = a[ok], b[ok], ba[ok], ra[ok], bb[ok], rb[ok]
        if not len(a):
            return empty
        Ha = self._H[self._block_off[ba] + ra]
        Hb = self._H[self._block_off[bb] + rb]
        l1 = np.abs(Ha - Hb).sum(axis=1, dtype=np.int32)
        sel = l1 <= 2 * self.d  # sound: sub moves 2 bins by 1, indel 1 bin
        if not sel.any():
            return empty
        a, b = a[sel], b[sel]
        ta = self.idx.take_column("text", ba[sel], ra[sel])
        tb = self.idx.take_column("text", bb[sel], rb[sel])
        dist = banded_levenshtein_batch(
            [s.encode() for s in ta], [s.encode() for s in tb], self.d
        )
        hit = dist <= self.d
        return pa.table({
            "id_a": pa.array(a[hit], pa.int64()),
            "id_b": pa.array(b[hit], pa.int64()),
            "dist": pa.array(dist[hit], pa.int64()),
        })


def q_edit_distance_pairs(
    sf_dir: str, d: int = 16, q: int = 4, blocking: str = "auto"
) -> pd.DataFrame:
    """All document pairs within Levenshtein distance ``d`` (exact, with the
    distance).  See module docstring for the distributed plan."""
    from marc_record_merge_melindautils_ray.ops.dedup_text import (
        _add_int_part,
        _doc_parts,
    )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    feats = docs.map_batches(_featurize, batch_format="pyarrow").materialize()
    refs = feats.to_arrow_refs()
    nparts = _doc_parts(feats)

    if blocking == "auto":
        # bounded sample: gram diversity decides the blocking strategy —
        # low-entropy corpora (shared-vocabulary grams) make every Ed-Join
        # prefix collide, so length buckets are strictly cheaper there
        sample = pa.Table.from_pandas(
            feats.limit(512).to_pandas()[["doc_id", "text"]]
        )
        rows = _prefix_gram_rows(sample, d, q)
        emitted = len(rows)
        distinct = len(np.unique(np.asarray(rows["key"], np.int64))) if emitted else 0
        ratio = distinct / max(emitted, 1)
        blocking = "prefix" if ratio >= 0.2 else "length"
        logger.info(
            "edit_distance_pairs auto blocking: %d sample gram rows, %d distinct "
            "(ratio %.3f) -> %s", emitted, distinct, ratio, blocking,
        )

    if blocking == "prefix":
        block_rows = feats.map_batches(
            lambda t, d=d, q=q: _prefix_gram_rows(t, d, q), batch_format="pyarrow"
        )
    elif blocking == "length":
        block_rows = feats.map_batches(
            lambda t, d=d: _length_bucket_rows(t, d), batch_format="pyarrow"
        )
    else:
        raise ValueError(f"unknown blocking mode: {blocking!r}")

    pairs = (
        block_rows.map_batches(
            lambda t: _add_int_part(t, "key", nparts), batch_format="pyarrow"
        )
        .groupby("part")
        .map_groups(lambda g, d=d: _emit_pairs(g, d), batch_format="pandas")
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
        .groupby("part")
        .map_groups(
            lambda g: g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]],
            batch_format="pandas",
        )
    )

    out = pairs.map_batches(
        _VerifyEditDistance,
        fn_constructor_args=(refs, d),
        batch_format="pyarrow",
        # candidate-pair volume scales superlinearly in docs; size the pool
        # from the doc count with a low per-actor row budget
        concurrency=actor_pool_size(rows=feats.count(), rows_per_actor=500),
    ).to_pandas()
    if out.empty:
        return pd.DataFrame({
            "id_a": pd.Series([], dtype=np.int64),
            "id_b": pd.Series([], dtype=np.int64),
            "dist": pd.Series([], dtype=np.int64),
        })
    return (
        out.astype(np.int64)
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
