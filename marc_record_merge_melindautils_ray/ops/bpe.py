"""Distributed BPE vocabulary induction — tokenizer training as a Ray Data
iterative pipeline.

The corpus never re-tokenizes per merge: like every real BPE trainer
(GPT-2's, HuggingFace's), training runs over the UNIQUE-WORD frequency
table, which one distributed wordcount pass produces.  That table is
Heaps-law bounded (≈100 M rows at 100 TB of text — a small Dataset by
corpus standards) and carries each word's current symbol sequence as a
list column, so each merge round applies only the NEWEST merge and counts
the next round's pairs; the driver sees one (left, right, count) partial
frame per round, picks the argmax pair (count DESC, then lexicographic —
fully deterministic), and broadcasts it back.

Both per-round kernels are vectorized over the batch's flattened symbol
buffer (no per-word Python):

* pair counting: one shifted equality over the flat array (word-boundary
  positions masked out) + ``np.unique`` over the surviving (left, right)
  id pairs, weighted by word frequency;
* merge application: candidate positions are where (flat[i], flat[i+1])
  equals the merge pair; for left≠right candidates are provably never
  adjacent (flat[i+1]=right≠left would have to equal left), so all apply
  at once; for left==right (a same-symbol run) the leftmost-first
  non-overlap rule selects every other candidate inside each run, which a
  run-id subtraction computes vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _flatten_syms(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat symbol object array, per-word offsets, word counts)."""
    syms = t["syms"]
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    # value_lengths + flatten are slice-safe (raw .offsets/.values are not
    # rebased when Ray slices a block)
    lens = np.asarray(syms.value_lengths(), np.int64)
    off = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    flat = np.asarray(syms.flatten().to_pylist(), dtype=object)
    n = np.asarray(t["n"], np.int64)
    return flat, off, n


def apply_merge_flat(flat: np.ndarray, off: np.ndarray,
                     left: str, right: str, merged: str
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Apply one merge to the flattened symbol buffer, leftmost-first
    non-overlapping, fully vectorized.  Returns (new flat, new offsets)."""
    m = flat.size
    if m < 2:
        return flat, off
    # candidate i: pair (flat[i], flat[i+1]) == (left, right), same word
    word_end = np.zeros(m, bool)
    word_end[off[1:-1] - 1] = True          # last position of each word
    cand = np.zeros(m, bool)
    cand[:-1] = (flat[:-1] == left) & (flat[1:] == right)
    cand[:-1] &= ~word_end[:-1]
    if left == right:
        # same-symbol runs: keep every other candidate inside each run
        idx = np.flatnonzero(cand)
        if idx.size:
            run_start = np.r_[True, np.diff(idx) != 1]
            run_id = np.cumsum(run_start) - 1
            starts = idx[run_start]
            pos_in_run = idx - starts[run_id]
            keep = (pos_in_run % 2) == 0
            cand[:] = False
            cand[idx[keep]] = True
    sel = np.flatnonzero(cand)
    if sel.size == 0:
        return flat, off
    out = flat.copy()
    out[sel] = merged
    drop = np.zeros(m, bool)
    drop[sel + 1] = True
    # new offsets: per-word dropped counts
    dropped_per_word = np.add.reduceat(drop.astype(np.int64), off[:-1])
    dropped_per_word[np.diff(off) == 0] = 0   # reduceat quirk on empty words
    new_off = off.copy()
    new_off[1:] = off[1:] - np.cumsum(dropped_per_word)
    return out[~drop], new_off


def count_pairs_flat(flat: np.ndarray, off: np.ndarray, n: np.ndarray
                     ) -> pd.DataFrame:
    """Weighted adjacent-pair counts over the flat buffer (word-frequency
    weights, word boundaries excluded), vectorized via codes + unique."""
    m = flat.size
    if m < 2:
        return pd.DataFrame({"left": [], "right": [], "cnt": []})
    word_end = np.zeros(m, bool)
    word_end[off[1:-1] - 1] = True
    valid = np.ones(m - 1, bool)
    valid &= ~word_end[:-1]
    if not valid.any():
        return pd.DataFrame({"left": [], "right": [], "cnt": []})
    # word frequency weight per position
    w = np.repeat(n, np.diff(off))
    uniq, codes = np.unique(flat, return_inverse=True)
    pair_code = codes[:-1][valid].astype(np.int64) * len(uniq) + codes[1:][valid]
    weights = w[:-1][valid]
    order = np.argsort(pair_code, kind="stable")
    pc = pair_code[order]
    pw = weights[order]
    bound = np.r_[True, pc[1:] != pc[:-1]]
    keys = pc[bound]
    sums = np.add.reduceat(pw, np.flatnonzero(bound))
    return pd.DataFrame({
        "left": uniq[(keys // len(uniq)).astype(np.int64)],
        "right": uniq[(keys % len(uniq)).astype(np.int64)],
        "cnt": sums.astype(np.int64),
    })


def bpe_train(docs: rd.Dataset, n_merges: int = 16) -> pd.DataFrame:
    """Train ``n_merges`` BPE merges over a documents Dataset
    (columns ``doc_id, text``).  Returns the merge table
    ``(rank, left, right, merged, pair_count)`` — deterministic on any
    block layout or cluster size (ties break lexicographically)."""

    def word_partials(df: pd.DataFrame) -> pd.DataFrame:
        vc = (df["text"].fillna("").str.lower()
              .str.findall(r"\S+").explode().dropna().value_counts())
        return pd.DataFrame({"word": vc.index.astype(str),
                             "n": vc.to_numpy(np.int64)})

    words = (
        docs.map_batches(word_partials, batch_format="pandas")
        .groupby("word").sum("n")
    )

    def init_syms(df: pd.DataFrame) -> pa.Table:
        df = df.rename(columns={"sum(n)": "n"})
        w = df["word"].astype(str)
        chars = list("".join(w))            # one C-level join, no per-word loop
        off = np.zeros(len(w) + 1, np.int64)
        np.cumsum(w.str.len().to_numpy(np.int64), out=off[1:])
        syms = pa.ListArray.from_arrays(
            pa.array(off, pa.int32()).cast(pa.int32()),
            pa.array(chars, pa.string()))
        return pa.table({
            "word": pa.array(w.tolist(), pa.string()),
            "n": pa.array(df["n"].to_numpy(np.int64), pa.int64()),
            "syms": syms,
        })

    state = words.map_batches(init_syms, batch_format="pandas").materialize()

    merges: list[tuple[str, str, str, int]] = []
    for rank in range(n_merges):

        def count_stage(t: pa.Table) -> pd.DataFrame:
            flat, off, n = _flatten_syms(t)
            return count_pairs_flat(flat, off, n)

        parts = (state.map_batches(count_stage, batch_format="pyarrow")
                 .to_pandas())
        if parts.empty:
            break
        agg = parts.groupby(["left", "right"], as_index=False)["cnt"].sum()
        agg = agg.sort_values(["cnt", "left", "right"],
                              ascending=[False, True, True])
        best = agg.iloc[0]
        if int(best.cnt) < 2:
            break
        left, right = str(best.left), str(best.right)
        merged = left + right
        merges.append((left, right, merged, int(best.cnt)))

        def apply_stage(t: pa.Table, _l=left, _r=right, _m=merged) -> pa.Table:
            flat, off, n = _flatten_syms(t)
            nf, no = apply_merge_flat(flat, off, _l, _r, _m)
            syms = pa.ListArray.from_arrays(
                pa.array(no, pa.int32()).cast(pa.int32()),
                pa.array(nf.tolist(), pa.string()))
            return pa.table({
                "word": t["word"],
                "n": pa.array(n, pa.int64()),
                "syms": syms,
            })

        state = state.map_batches(apply_stage,
                                  batch_format="pyarrow").materialize()

    return pd.DataFrame({
        "rank": np.arange(len(merges), dtype=np.int64),
        "left": [m[0] for m in merges],
        "right": [m[1] for m in merges],
        "merged": [m[2] for m in merges],
        "pair_count": np.array([m[3] for m in merges], np.int64),
    })


def q_bpe_vocab(sf_dir: str, n_merges: int = 16) -> pd.DataFrame:
    """``queries()`` surface: the first ``n_merges`` BPE merges learned from
    the documents table.  Rows-only — iterative tokenizer training is not
    SQL-expressible; pinned against an independent pure-Python BPE trainer
    in tests/test_bpe.py."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return bpe_train(docs, n_merges=n_merges)
