"""Text-analysis operators over the ``documents`` table: token counting,
quality signals, fingerprinting, language ID.

All counting kernels are integer-valued so the DuckDB oracle hashes match
exactly; ratios are integer permille (``1000 * a // b``) with identical
integer division on both sides.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from marc_record_merge_melindautils_ray.stages.cluster import actor_pool_size


def _docs(sf_dir: str, columns=("doc_id", "text")) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def q_token_counts(sf_dir: str) -> rd.Dataset:
    """Whitespace token count + BPE-ish subword count (regex over words,
    digits, punctuation runs — a tokenizer-shaped counting rule)."""

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": text.str.count(r"\S+").astype(np.int64),
            "n_subwords": text.str.count(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]").astype(np.int64),
        })

    return _docs(sf_dir).map_batches(kern, batch_format="pandas")


def q_quality_signals(sf_dir: str) -> rd.Dataset:
    """Quality-scoring signals: char-class counts + integer-permille ratios
    (length/punct/stopword heuristics a training-data pipeline filters on)."""

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        n_chars = text.str.len().astype(np.int64)
        n_alpha = text.str.count(r"[A-Za-z]").astype(np.int64)
        n_digit = text.str.count(r"[0-9]").astype(np.int64)
        n_space = text.str.count(r"\s").astype(np.int64)
        n_stop = text.str.count(r"\b(the|and|of|to|in|is|a)\b").astype(np.int64)
        denom = n_chars.replace(0, 1)
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_chars_calc": n_chars,
            "n_alpha": n_alpha,
            "n_digit": n_digit,
            "n_space": n_space,
            "n_stopword_hits": n_stop,
            "alpha_permille": (1000 * n_alpha // denom).astype(np.int64),
        })

    return _docs(sf_dir).map_batches(kern, batch_format="pandas")


def q_doc_fingerprint(sf_dir: str) -> rd.Dataset:
    """Content fingerprint per document (md5 hex — oracle-checkable against
    DuckDB's md5()); the rolling-hash shingle fingerprints live in the
    MinHash path (ops.dedup_text)."""

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "fp_md5": [
                hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in df["text"]
            ],
        })

    return _docs(sf_dir).map_batches(kern, batch_format="pandas")


def q_top_terms(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Corpus vocabulary top-k (the wordcount combiner pattern): per-batch
    partial term counts → ``groupby(term).sum`` shuffle of partials only →
    per-partition local top-k (safe: global top-k under (n DESC, term ASC)
    is a subset of the union of partition top-ks) → tiny driver merge."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.strip().str.lower().str.split()
        vc = words.explode().dropna().value_counts()
        return pd.DataFrame({"term": vc.index.to_numpy(), "n": vc.to_numpy().astype(np.int64)})

    counts = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pandas")
        .groupby("term")
        .sum("n")
    )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"sum(n)": "n"})
        return df.sort_values(["n", "term"], ascending=[False, True]).head(k)

    parts = counts.map_batches(local_topk, batch_format="pandas").to_pandas()
    return (
        parts.sort_values(["n", "term"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def q_quality_filter(sf_dir: str) -> pd.DataFrame:
    """Quality-gate filter (the training-data cleaning step): keep documents
    inside the alpha-ratio band with enough tokens — one fused kernel, no
    second pass over rejected rows."""

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        n_chars = text.str.len().astype(np.int64)
        n_alpha = text.str.count(r"[A-Za-z]").astype(np.int64)
        n_tokens = text.str.count(r"\S+").astype(np.int64)
        alpha_permille = (1000 * n_alpha // n_chars.replace(0, 1)).astype(np.int64)
        keep = (alpha_permille >= 800) & (alpha_permille <= 900) & (n_tokens >= 30)
        return pd.DataFrame({
            "doc_id": df["doc_id"][keep],
            "n_tokens": n_tokens[keep],
            "alpha_permille": alpha_permille[keep],
        })

    out = _docs(sf_dir).map_batches(kern, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# language-ID: stopword/charset heuristic (no SQL oracle — rows-only check)
_LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is|was|that|with)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein)\b",
    "fr": r"\b(le|la|les|est|et|une|dans|pour)\b",
    "es": r"\b(el|los|las|es|y|una|por|como)\b",
}
_HAN = r"[一-鿿]"


class LangId:
    """Stateful actor stage: compiles the marker regexes once per actor."""

    def __init__(self):
        self.pats = {k: re.compile(v) for k, v in _LANG_MARKERS.items()}
        self.han = re.compile(_HAN)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        # vectorized C-level regex passes (Series.str.count / .contains);
        # argmax keeps the FIRST max over sorted keys = the alphabetical
        # tie-break the oracle mirrors
        keys = sorted(self.pats)
        scores = np.stack(
            [text.str.count(self.pats[k]).to_numpy() for k in keys], axis=1
        ) if len(df) else np.zeros((0, len(keys)), np.int64)
        best = np.array(keys, dtype=object)[scores.argmax(axis=1)] if len(df) else np.array([], object)
        preds = np.where(scores.max(axis=1, initial=0) == 0, "unk", best)
        preds = np.where(text.str.contains(self.han).to_numpy(dtype=bool), "zh", preds)
        return pd.DataFrame({"doc_id": df["doc_id"], "lang_pred": preds})


def q_lang_id(sf_dir: str) -> rd.Dataset:
    docs = _docs(sf_dir)
    return docs.map_batches(
        LangId, batch_format="pandas", concurrency=actor_pool_size(rows=docs.count())
    )


def lang_id_accuracy(sf_dir: str) -> float:
    """Convenience metric: predicted vs the table's ``lang`` column.

    NOTE: the driver testdata's ``lang`` column is a random label over a
    SHARED vocabulary (the text carries no language signal), so this metric
    is ~chance there — q_lang_id's correctness check is its DuckDB oracle
    (``oracle_sql()['lang_id']``) plus the marked-text unit test."""
    pred = q_lang_id(sf_dir).to_pandas()
    truth = _docs(sf_dir, ("doc_id", "lang")).to_pandas()
    m = pred.merge(truth, on="doc_id")
    return float((m["lang_pred"] == m["lang"]).mean())


def q_bigram_top(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Corpus top-k BIGRAMS — the n-gram extension of ``q_top_terms``'s
    wordcount combiner.  Bigram construction is vectorized on the exploded
    token stream: adjacent tokens pair wherever the doc index doesn't change
    (one ``np.char.add`` over shifted arrays, no per-row loop), then per-batch
    partial counts → tiny ``groupby(bigram).sum`` → per-partition local top-k
    → driver merge (global top-k under (n DESC, bigram ASC) is a subset of
    the union of partition top-ks)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.strip().str.lower().str.split()
        ex = words.explode().dropna()
        empty = pd.DataFrame({"bigram": pd.Series([], dtype=str),
                              "n": pd.Series([], dtype=np.int64)})
        if len(ex) < 2:
            return empty
        toks = ex.to_numpy(dtype=object).astype(str)
        doc = ex.index.to_numpy()
        same = doc[1:] == doc[:-1]
        if not same.any():
            return empty
        big = np.char.add(np.char.add(toks[:-1][same], " "), toks[1:][same])
        vc = pd.Series(big).value_counts()
        return pd.DataFrame({"bigram": vc.index.to_numpy(),
                             "n": vc.to_numpy().astype(np.int64)})

    from marc_record_merge_melindautils_ray.functions.hashing import stable_str_hash
    from marc_record_merge_melindautils_ray.stages.cluster import actor_pool_size, adaptive_parts

    # fan-out sized to the doc count (the shuffled rows are per-batch partial
    # counts, much smaller than the token stream), not a frozen 32
    nparts = adaptive_parts(_docs(sf_dir).count(), rows_per_part=10_000, hi=128)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df["part"] = (stable_str_hash(df["bigram"].tolist()) % np.uint64(nparts)).astype(
            np.int64
        )
        return df

    def sum_topk(g: pd.DataFrame) -> pd.DataFrame:
        # hash partitioning co-locates every partial of a bigram, so ONE
        # vectorized sum per partition is the exact global count; the local
        # top-k union is a superset of the global top-k under (n DESC, asc)
        g = g.groupby("bigram", as_index=False, sort=False)["n"].sum()
        return g.sort_values(["n", "bigram"], ascending=[False, True]).head(k)

    parts = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pandas")
        .map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(sum_topk, batch_format="pandas")
        .to_pandas()
    )
    parts = parts.drop(columns=["part"], errors="ignore")
    return (
        parts.sort_values(["n", "bigram"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def q_top_terms_per_lang(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Grouped top-k: the k most frequent terms PER LANGUAGE.  Same combiner
    as ``q_top_terms`` with the group key carried through the partial counts;
    the final per-group selection runs on the already-aggregated (lang, term)
    table — tiny next to the corpus."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.strip().str.lower().str.split()
        ex = pd.DataFrame({
            "lang": df["lang"], "term": words,
        }).explode("term").dropna(subset=["term"])
        g = ex.groupby(["lang", "term"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    counts = (
        _docs(sf_dir, ("lang", "text"))
        .map_batches(partial, batch_format="pandas")
        .groupby(["lang", "term"])
        .sum("n")
    )

    def per_lang_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.rename(columns={"sum(n)": "n"})
        g = g.sort_values(["n", "term"], ascending=[False, True]).head(k)
        return g[["lang", "term", "n"]]

    out = counts.groupby("lang").map_groups(per_lang_topk, batch_format="pandas").to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["lang", "term"]).reset_index(drop=True)


def q_tfidf_top(sf_dir: str, topk: int = 3) -> pd.DataFrame:
    """Per-document TF-IDF top-k terms — the relevance-scoring primitive a
    training-data curation pipeline uses for keyword extraction and topical
    filtering.  Two partitioned passes, no driver-side tables:

    1. per-batch tokenize → exact (doc_id, term, tf) rows (a document lives
       in one row, so its tf is complete within the batch — no tf shuffle);
    2. hash-partition by TERM → per-partition df counts → integer-micro idf
       (``round(ln(N/df)·1e6)``) → score = tf × idf_e6 (exact int, so the
       oracle comparison is float-order-immune);
    3. hash-partition by DOC → per-partition vectorized sort + cumcount
       rank → top-k rows per document.

    N (docs with non-empty text) is a one-number aggregate.  Skew note: a
    stop-word term row set is df-sized (bounded by corpus docs), never
    quadratic — unlike pair emission there is no hub blow-up here.

    Tokenization contract (shared with the other text queries): pandas
    ``strip()/split()`` vs the oracle's ``trim() + regexp_split '\\s+'``
    agree on space-separated text — the documents corpus — but diverge on
    tab/newline-adjacent or unicode whitespace (SQL trim strips only spaces;
    RE2 ``\\s`` is ASCII).  Documented narrowing, same as ``q_top_terms``."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64, stable_str_hash
    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    docs = _docs(sf_dir)
    nparts = adaptive_parts(docs.count(), rows_per_part=5000)

    def tok(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.strip().str.lower().str.split()
        ex = pd.DataFrame({"doc_id": df["doc_id"], "term": words}).explode("term")
        ex = ex.dropna(subset=["term"])
        g = ex.groupby(["doc_id", "term"], as_index=False).size()
        return g.rename(columns={"size": "tf"})

    def n_docs_partial(df: pd.DataFrame) -> pd.DataFrame:
        ne = (df["text"].fillna("").str.strip().str.len() > 0).sum()
        return pd.DataFrame({"n": [int(ne)]})

    n_docs = int(docs.map_batches(n_docs_partial, batch_format="pandas").sum("n"))
    tf_rows = docs.map_batches(tok, batch_format="pandas")

    def part_by(col: str):
        def add(df: pd.DataFrame) -> pd.DataFrame:
            if col == "term":
                h = splitmix64(stable_str_hash(df["term"].to_numpy()))
            else:
                h = splitmix64(df["doc_id"].to_numpy(np.int64).view(np.uint64))
            df = df.copy()
            df["part"] = (h % np.uint64(nparts)).astype(np.int64)
            return df
        return add

    def score_partition(g: pd.DataFrame) -> pd.DataFrame:
        # every (doc, term) row of a term is co-located → df = term row count
        dfreq = g.groupby("term")["doc_id"].transform("size").to_numpy(np.float64)
        idf_e6 = np.round(np.log(n_docs / dfreq) * 1_000_000.0).astype(np.int64)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "term": g["term"].to_numpy(),
            "tfidf_e6": g["tf"].to_numpy(np.int64) * idf_e6,
        })

    def topk_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "tfidf_e6", "term"],
                          ascending=[True, False, True]).reset_index(drop=True)
        rk = g.groupby("doc_id").cumcount().to_numpy() + 1
        g = g.assign(rk=rk.astype(np.int64))
        return g[g["rk"] <= topk][["doc_id", "term", "tfidf_e6", "rk"]]

    out = (
        tf_rows.map_batches(part_by("term"), batch_format="pandas")
        .groupby("part")
        .map_groups(score_partition, batch_format="pandas")
        .map_batches(part_by("doc_id"), batch_format="pandas")
        .groupby("part")
        .map_groups(topk_partition, batch_format="pandas")
        .to_pandas()
    )
    out = out.drop(columns=["part"], errors="ignore")
    return out.sort_values(["doc_id", "rk"]).reset_index(drop=True)


# ----------------------------------------- char-bigram LM perplexity buckets
def q_perplexity_buckets(sf_dir: str, n_buckets: int = 3) -> pd.DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2019, public): score every
    document by a language-model perplexity and split the corpus into
    equal-count head/middle/tail buckets.  No external LM ships in this
    container, so the model is a char-BIGRAM LM trained on the corpus itself
    in one combiner pass — bounded state (≤ 256² counts ≈ 256 KB) regardless
    of corpus size, the same two-pass broadcast shape a real
    KenLM-in-an-actor deployment uses.

    Pass 1: per-batch bigram counts over the concatenated string buffer (one
    flat ``bincount``) → one tiny reduce.  Pass 2: per-doc mean bigram
    log-probability (add-one smoothing, e6 fixed-point) via ONE gather +
    ``add.reduceat`` over the batch buffer — no per-row Python.  Buckets cut
    at exact score quantiles; head = lowest perplexity (= highest mean
    log-prob).  Deterministic: same corpus → same model → same buckets on
    any block layout."""
    ds = _docs(sf_dir)

    def _buf_and_bounds(t: pa.Table):
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.fill_null("")
        off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
        bufs = col.buffers()
        offs = np.frombuffer(bufs[1], off_dtype, count=col.offset + len(col) + 1
                             ).astype(np.int64)[col.offset:]
        buf = (np.frombuffer(bufs[2], np.uint8, count=int(offs[-1]))
               if bufs[2] is not None else np.empty(0, np.uint8))
        return buf, offs

    def count_bigrams(t: pa.Table) -> pa.Table:
        buf, offs = _buf_and_bounds(t)
        if len(buf) < 2:
            return pa.table({"bg": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        pair = buf[:-1].astype(np.int64) * 256 + buf[1:]
        # mask pairs that straddle a document boundary
        pos = np.arange(len(pair))
        doc_of = np.clip(np.searchsorted(offs, pos, side="right") - 1,
                         0, len(offs) - 2)
        ok = (pos >= offs[0]) & (pos + 2 <= offs[doc_of + 1]) & (pos >= offs[doc_of])
        cnt = np.bincount(pair[ok], minlength=65536)
        nz = np.flatnonzero(cnt)
        return pa.table({"bg": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    model_rows = (
        ds.map_batches(count_bigrams, batch_format="pyarrow")
        .groupby("bg").sum("n").to_pandas()
    )
    counts = np.zeros(65536, np.int64)
    counts[model_rows["bg"].to_numpy()] = model_rows["sum(n)"].to_numpy()
    # conditional P(c2|c1) with add-one smoothing, e6 fixed-point log-probs
    row_tot = counts.reshape(256, 256).sum(axis=1)
    logp = np.log((counts.reshape(256, 256) + 1)
                  / (row_tot[:, None] + 256)) * 1e6
    logp = logp.astype(np.int64).reshape(-1)
    import ray as _ray

    lp_ref = _ray.put(logp)

    def score(t: pa.Table) -> pa.Table:
        from marc_record_merge_melindautils_ray.functions.util import maybe_get

        lp = maybe_get(lp_ref)
        buf, offs = _buf_and_bounds(t)
        k = len(t)
        ids = np.asarray(t["doc_id"], np.int64)
        out = np.zeros(k, np.int64)
        if len(buf) >= 2:
            pair = buf[:-1].astype(np.int64) * 256 + buf[1:]
            pos = np.arange(len(pair))
            doc_of = np.clip(np.searchsorted(offs, pos, side="right") - 1,
                             0, len(offs) - 2)
            ok = (pos >= offs[0]) & (pos + 2 <= offs[doc_of + 1]) & (pos >= offs[doc_of])
            vals = lp[pair[ok]]
            docs = doc_of[ok]
            sums = np.zeros(k, np.int64)
            np.add.at(sums, docs, vals)
            nbg = np.bincount(docs, minlength=k)
            nz = nbg > 0
            out[nz] = sums[nz] // nbg[nz]  # mean log-prob, e6 (negative)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "mean_logp_e6": pa.array(out, pa.int64()),
        })

    scored = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    scored = scored.sort_values(["mean_logp_e6", "doc_id"],
                                ascending=[False, True]).reset_index(drop=True)
    n = len(scored)
    ranks = np.arange(n)
    scored["bucket"] = np.minimum(ranks * n_buckets // max(n, 1),
                                  n_buckets - 1).astype(np.int64)
    labels = np.array(["head", "middle", "tail"] + [
        f"b{i}" for i in range(3, n_buckets)
    ], dtype=object)
    scored["bucket"] = labels[scored["bucket"].to_numpy()]
    return scored.sort_values("doc_id").reset_index(drop=True)


def q_repetition_signals(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, public) per
    document: token count, distinct-token count, and the most-common token's
    count — the exact integers behind the 'fraction of most common word' and
    'distinct-word ratio' filter rules.  One vectorized pass per batch
    (explode + per-doc value_counts); nothing but the per-doc signal rows
    ever shuffle."""

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.strip().str.lower().str.split()
        ex = pd.DataFrame({"doc_id": df["doc_id"], "term": words}).explode("term")
        ex = ex.dropna(subset=["term"])
        g = ex.groupby(["doc_id", "term"], as_index=False).size()
        agg = g.groupby("doc_id").agg(
            n_tokens=("size", "sum"),
            n_distinct=("size", "count"),
            top_count=("size", "max"),
        ).reset_index()
        # docs with no tokens still get a row (zeros)
        missing = df[~df["doc_id"].isin(agg["doc_id"])]
        if len(missing):
            agg = pd.concat([agg, pd.DataFrame({
                "doc_id": missing["doc_id"],
                "n_tokens": np.int64(0),
                "n_distinct": np.int64(0),
                "top_count": np.int64(0),
            })], ignore_index=True)
        return agg.astype({
            "doc_id": np.int64, "n_tokens": np.int64,
            "n_distinct": np.int64, "top_count": np.int64,
        })

    out = _docs(sf_dir).map_batches(kern, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_doc_chunks(sf_dir: str, window: int = 32, stride: int = 24) -> rd.Dataset:
    """RAG-style document chunking: each document becomes overlapping
    ``window``-word chunks at ``stride`` spacing (the retrieval-index /
    context-packing prep every LLM data pipeline runs; 1→N row expansion,
    embarrassingly parallel — no shuffle, chunks stream out of the map).

    Chunk k covers words ``[k·stride, min(k·stride + window, n_words))``;
    a doc with ≤ ``window`` words is exactly one chunk; the tail chunk may
    be short but is never empty (the last start is < n_words by
    construction).  Word canonicalization is the repo-wide convention
    (lower + trim + whitespace-collapse — ``canon_word_bounds``).

    Fully vectorized over the batch's shared canonical byte buffer: chunk
    word ranges become byte ranges via the word-bounds arrays, and all
    chunk texts are built with ONE range-gather into a single output
    buffer wrapped as an Arrow string array — no per-doc or per-chunk
    Python."""
    from marc_record_merge_melindautils_ray.functions.hashing import canon_word_bounds

    W, S = int(window), int(stride)

    def chunks(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        data, ws, we, woff = canon_word_bounds(t["text"])
        nw = np.diff(woff)
        nk = np.where(nw <= 0, 0,
                      np.where(nw <= W, 1, (nw - W + S - 1) // S + 1))
        coff = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(nk, out=coff[1:])
        tot = int(coff[-1])
        if tot == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
                "n_words": pa.array([], pa.int64()),
            })
        cd = np.repeat(np.arange(len(ids)), nk)
        ci = np.arange(tot) - np.repeat(coff[:-1], nk)
        wstart = ci * S
        wend = np.minimum(wstart + W, nw[cd])
        g0 = woff[cd] + wstart
        g1 = woff[cd] + wend - 1
        bstart, bend = ws[g0], we[g1]
        lens = bend - bstart
        out_off = np.zeros(tot + 1, dtype=np.int64)
        np.cumsum(lens, out=out_off[1:])
        pos = (np.arange(out_off[-1]) - np.repeat(out_off[:-1], lens)
               + np.repeat(bstart, lens))
        buf = data[pos] if out_off[-1] else np.empty(0, np.uint8)
        text_arr = pa.Array.from_buffers(
            pa.utf8(), tot,
            [None, pa.py_buffer(out_off.astype(np.int32)), pa.py_buffer(buf)],
        )
        return pa.table({
            "doc_id": pa.array(ids[cd], pa.int64()),
            "chunk_idx": pa.array(ci, pa.int64()),
            "chunk_text": text_arr,
            "n_words": pa.array(wend - wstart, pa.int64()),
        })

    return _docs(sf_dir).map_batches(chunks, batch_format="pyarrow")


# PII redaction: email | phone | digit-run masking (the privacy-scrub pass
# every training-data pipeline runs before publishing).  Alternation order
# matters (email and phone arms claim their digits before the digit-run arm)
# and is identical on both sides; pandas `re` and DuckDB's RE2 share
# leftmost-first alternation semantics — parity pinned on adversarial
# strings (adjacent email+digit, overlong phones) in tests/test_pii.py.
PII_PATTERN = (
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"   # email
    r"|[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"                 # phone
    r"|[0-9]+"                                           # bare number run
)


def q_pii_redact(sf_dir: str) -> rd.Dataset:
    """Redact PII-shaped spans from the events ``props`` sidecar: one
    vectorized compiled-regex replace + count per batch, zero shuffle
    (purely row-local).  ``n_pii`` counts the masked spans so the pass is
    auditable; the testdata exercises the digit arm on every row, the
    email/phone arms are pinned on a constructed corpus in tests."""

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        props = df["props"].fillna("")
        return pd.DataFrame({
            "event_id": df["event_id"],
            "props_redacted": props.str.replace(PII_PATTERN, "<PII>", regex=True),
            "n_pii": props.str.count(PII_PATTERN).astype(np.int64),
        })

    return (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "props"])
        .map_batches(kern, batch_format="pandas")
    )


def q_inverted_index(sf_dir: str) -> pd.DataFrame:
    """Inverted index build (the retrieval-prep pass): term → document
    frequency + comma-joined SORTED posting list.  ONE term-keyed exchange
    end to end: per-batch (term, doc_id) dedup (combiner) → a single
    ``groupby(tkey)`` on the term's int64 hash (integer sort keys, not
    strings) → per-group assembly finishes the distinct with one np.unique
    (a 64-bit hash collision would co-locate two terms in a group, so the
    assembler sub-groups by the carried term string — correctness never
    rests on hash uniqueness).  The original two-level plan (pair-dedup
    groupby, THEN per-term groupby) sorted the full pair table twice and
    measured 17–20 s at sf0.1; this plan sorts it once.  At web scale a
    posting list for a stopword-grade term is O(corpus); real deployments
    shard postings by (term, doc-range) — the per-term group boundary here
    is exactly where that sharding key would slot in."""
    from marc_record_merge_melindautils_ray.functions.hashing import stable_str_hash

    def local_pairs(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.strip().str.lower().str.split()
        out = pd.DataFrame({
            "doc_id": df["doc_id"].repeat(words.str.len().fillna(0).astype(int)),
            "term": words.explode().dropna(),
        }).drop_duplicates()
        out["tkey"] = stable_str_hash(
            out["term"].to_numpy(object)).view(np.int64)
        return out

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for term, sub in g.groupby("term"):  # ≥2 terms only on hash collision
            ids = np.unique(sub["doc_id"].to_numpy(np.int64))
            rows.append((term, np.int64(len(ids)), ",".join(map(str, ids))))
        return pd.DataFrame(rows, columns=["term", "df", "postings"])

    out = (
        _docs(sf_dir)
        .map_batches(local_pairs, batch_format="pandas")
        .groupby("tkey").map_groups(assemble, batch_format="pandas")
        .to_pandas()
    )
    out["df"] = out["df"].astype(np.int64)
    return out.sort_values("term").reset_index(drop=True)


BM25_TERMS = ("join", "hash", "merge")


def q_bm25_top(sf_dir: str, terms: tuple = BM25_TERMS, k: int = 20) -> pd.DataFrame:
    """BM25 ranking of a fixed term query against the corpus (k1=1.2,
    b=0.75), in EXACT integer arithmetic so the oracle hash-compares: with
    tf, dl, N (docs), T (total tokens) all integers, the per-term score

        idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/T))

    rationalizes to  idf_micro · (22·tf·T·1000 // (10·tf·T + 3·T + 9·dl·N))
    — one floor division on all-positive operands (so //  ==  floor on both
    engines) and idf_micro = floor(1e6·ln((2N−2df+1)/(2df+1)) + 0.5), the
    same double on both sides.  Plan: ONE corpus pass emits per-doc
    (dl, tf_j) stats rows (text never shuffles); N, T, df_j reduce from the
    stats Dataset; scoring is a second stats-only map with local top-k per
    block and a k-row driver merge."""
    trm = [t.lower() for t in terms]

    def stats_kern(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("").str.lower()
        dl = text.str.count(r"\S+").astype(np.int64)
        out = {"doc_id": df["doc_id"], "dl": dl}
        for j, t in enumerate(trm):
            # whitespace-delimited exact-token count == split-token equality
            pat = r"(?<!\S)" + re.escape(t) + r"(?!\S)"
            out[f"tf{j}"] = text.str.count(pat).astype(np.int64)
        sdf = pd.DataFrame(out)
        return sdf[sdf["dl"] > 0]

    stats = _docs(sf_dir).map_batches(stats_kern, batch_format="pandas").materialize()
    n_docs = stats.count()
    sums = stats.sum(["dl"] + [f"tf{j}" for j in range(len(trm))])
    total = int(sums["sum(dl)"])
    # df_j: docs with tf_j > 0 (combiner partials, tiny rows)
    dfs = stats.map_batches(
        lambda d: pd.DataFrame({f"df{j}": [int((d[f"tf{j}"] > 0).sum())]
                                for j in range(len(trm))}),
        batch_format="pandas",
    ).sum([f"df{j}" for j in range(len(trm))])
    idf_micro = [
        int(np.floor(1e6 * np.log((2 * n_docs - 2 * int(dfs[f"sum(df{j})"]) + 1.0)
                                  / (2 * int(dfs[f"sum(df{j})"]) + 1.0)) + 0.5))
        for j in range(len(trm))
    ]

    def score_kern(d: pd.DataFrame) -> pd.DataFrame:
        dl = d["dl"].to_numpy(np.int64)
        score = np.zeros(len(d), np.int64)
        any_tf = np.zeros(len(d), bool)
        for j in range(len(trm)):
            tf = d[f"tf{j}"].to_numpy(np.int64)
            denom = 10 * tf * total + 3 * total + 9 * dl * n_docs
            frac_e3 = (22 * tf * total * 1000) // denom
            score += idf_micro[j] * frac_e3
            any_tf |= tf > 0
        out = pd.DataFrame({"doc_id": d["doc_id"], "score": score})[any_tf]
        return out.sort_values(["score", "doc_id"],
                               ascending=[False, True]).head(k)

    parts = stats.map_batches(score_kern, batch_format="pandas").to_pandas()
    return (
        parts.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k).reset_index(drop=True)
    )


def q_compression_ratio(sf_dir: str) -> rd.Dataset:
    """Gopher-style compressibility quality signal: per-document zlib
    (level 6) compressed length and permille ratio — highly repetitive
    (boilerplate/spam) documents compress far below prose.  Row-local, zero
    shuffle; the zlib call is per doc (C speed) but every derived column is
    integer so reruns hash-compare.  Rows-only (no SQL zlib); pinned to a
    direct computation in tests."""
    import zlib

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        raw = texts.str.len().astype(np.int64)
        comp = np.fromiter(
            (len(zlib.compress(t.encode("utf-8"), 6)) for t in texts),
            np.int64, count=len(texts))
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "raw_len": raw,
            "zlib_len": comp,
            "compress_permille": np.where(
                raw > 0, 1000 * comp // np.maximum(raw, 1), 0
            ).astype(np.int64),
        })

    return _docs(sf_dir).map_batches(kern, batch_format="pandas")
