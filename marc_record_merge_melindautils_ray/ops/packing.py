"""Sequence packing: assign documents to token-budget bins for training
(the sample-packing pass that turns a ragged document corpus into
fixed-budget training sequences).

Global greedy packing is inherently sequential, so the distributed scheme
is the standard one: documents hash into ``n_streams`` independent streams
and each stream packs next-fit in doc_id order.  Determinism is total —
stream membership and within-stream order depend only on doc_id, never on
block layout, cluster size, or execution order — at the price of slightly
more tail fragmentation than one global packer (bounded: ≤1 underfull bin
per stream).  At 100 TB the streams ARE the parallelism: the shuffle moves
one (doc_id, n_tokens, stream) row per document — never text — and each
stream's packer is one vectorized cumsum + an O(n_bins·log n) boundary
scan, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _docs(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


def next_fit_bins(tokens: np.ndarray, budget: int) -> np.ndarray:
    """Next-fit bin assignment over an ordered token-count array: a doc
    joins the current bin unless that would exceed ``budget``, in which
    case a new bin opens.  A single doc larger than ``budget`` gets its own
    bin (callers surface those via ``oversize``).  O(n_bins · log n) via
    searchsorted over the cumsum — no per-row loop."""
    n = len(tokens)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    cum = np.cumsum(tokens.astype(np.int64))
    start, b = 0, 0
    while start < n:
        limit = (cum[start - 1] if start else 0) + budget
        end = int(np.searchsorted(cum, limit, side="right"))
        if end <= start:          # oversize doc: own bin
            end = start + 1
        out[start:end] = b
        b += 1
        start = end
    return out


def q_pack_sequences(sf_dir: str, budget: int = 1024,
                     n_streams: int = 64) -> pd.DataFrame:
    """Pack every document into a (stream, bin) with total whitespace-token
    count ≤ ``budget`` per bin (oversize docs flagged, one per bin).

    Output: one row per document — ``(doc_id, n_tokens, stream, bin_idx,
    oversize)`` sorted by doc_id.  Pair-disjoint, exhaustive, and
    layout-invariant by construction (pinned in tests); rows-only (next-fit
    packing is a sequential recurrence SQL cannot express)."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "n_tokens": df["text"].fillna("").str.count(r"\S+").astype(np.int64),
            "stream": (splitmix64(ids.view(np.uint64))
                       % np.uint64(n_streams)).astype(np.int64),
        })

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        tok = g["n_tokens"].to_numpy(np.int64)
        bins = next_fit_bins(tok, budget)
        g["bin_idx"] = bins
        g["oversize"] = tok > budget
        return g

    out = (
        _docs(sf_dir)
        .map_batches(counts, batch_format="pandas")
        .groupby("stream")
        .map_groups(pack, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "n_tokens": pd.Series([], dtype=np.int64),
            "stream": pd.Series([], dtype=np.int64),
            "bin_idx": pd.Series([], dtype=np.int64),
            "oversize": pd.Series([], dtype=bool),
        })
    return out.sort_values("doc_id").reset_index(drop=True)
