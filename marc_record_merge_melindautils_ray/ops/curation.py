"""End-to-end corpus curation: the composed training-data pipeline a user
of this engine actually runs — quality gate → exact dedup (keep-min) →
benchmark decontamination — producing the surviving document set.

Composition is one streaming pass plus one content-keyed exchange: the
quality predicate, the eval-exclusion, and the gram probe all fuse into a
single ``map_batches`` stage (each is per-row local once the eval gram set
is broadcast), and only the quality survivors' (hash, doc_id, n_tokens)
rows enter the dedup groupby — rejected docs never shuffle.  The final
keeper pick is one vectorized sort + boundary-dedup per hash partition.

Stage predicates are shared with the standalone queries (same quality
band as ``q_quality_filter``, same 8-gram eval probe as
``q_decontaminate``, same keep-min rule as ``q_exact_dedup_docs``), so
this pipeline IS their composition — and its DuckDB oracle is the literal
SQL composition of their oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from marc_record_merge_melindautils_ray.ops.dedup_text import (
    _docs,
    build_eval_gram_set,
    doc_gram_uniques,
)
from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts


def q_curation_pipeline(sf_dir: str, n: int = 8, eval_mod: int = 19,
                        eval_rem: int = 3) -> pd.DataFrame:
    """Surviving documents after the full curation cascade:

    1. quality gate — ``alpha_permille ∈ [800, 900]`` and ``n_tokens ≥ 30``
       (the ``quality_filter`` band);
    2. eval exclusion + decontamination — not in the held-out slice and
       sharing zero word-8-grams with it (the ``decontaminate`` probe);
    3. exact dedup — keeper = min ``doc_id`` per identical text among the
       docs that passed 1–2.

    Output: ``(doc_id, n_tokens)`` sorted."""
    import ray

    from marc_record_merge_melindautils_ray.functions.hashing import (
        splitmix64,
        stable_str_hash,
    )

    docs = _docs(sf_dir)
    eval_ref = ray.put(build_eval_gram_set(docs, n, eval_mod, eval_rem))
    nparts = adaptive_parts(docs.count())

    def gate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ev = ray.get(eval_ref)
        ids = np.asarray(t["doc_id"], np.int64)
        text = pc.fill_null(t["text"], "")
        n_chars = np.asarray(pc.utf8_length(text), np.int64)
        n_alpha = np.asarray(
            pc.count_substring_regex(text, "[A-Za-z]"), np.int64)
        n_tokens = np.asarray(
            pc.count_substring_regex(text, r"\S+"), np.int64)
        alpha_permille = 1000 * n_alpha // np.maximum(n_chars, 1)
        ok = ((alpha_permille >= 800) & (alpha_permille <= 900)
              & (n_tokens >= 30) & (ids % eval_mod != eval_rem))
        # gram probe only on rows still alive (the probe is the costly part)
        alive = t.filter(pa.array(ok))
        if alive.num_rows:
            aids, hk, dk = doc_gram_uniques(alive, n)
            if ev.size and hk.size:
                pos = np.searchsorted(ev, hk)
                hit = (pos < ev.size) & (ev[np.minimum(pos, ev.size - 1)] == hk)
                hits_per_doc = np.bincount(dk, weights=hit,
                                           minlength=len(aids))
                clean = hits_per_doc == 0
            else:
                clean = np.ones(alive.num_rows, bool)
        else:
            clean = np.zeros(0, bool)
        sub = alive.filter(pa.array(clean))
        sids = np.asarray(sub["doc_id"], np.int64)
        # 128-bit content key (two independent 64-bit hashes) for the dedup
        # exchange — text itself never shuffles
        h0 = stable_str_hash(sub["text"], seed=0).view(np.int64)
        h1 = stable_str_hash(sub["text"], seed=1).view(np.int64)
        ntk = np.asarray(
            pa.compute.count_substring_regex(
                pa.compute.fill_null(sub["text"], ""), r"\S+"),
            np.int64)
        part = (splitmix64(h0.view(np.uint64))
                % np.uint64(nparts)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(sids, pa.int64()),
            "n_tokens": pa.array(ntk, pa.int64()),
            "h0": pa.array(h0, pa.int64()),
            "h1": pa.array(h1, pa.int64()),
            "part": pa.array(part, pa.int64()),
        })

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h0", "h1", "doc_id"])
        first = ~(g[["h0", "h1"]].duplicated())
        return g.loc[first, ["doc_id", "n_tokens"]]

    out = (
        docs.map_batches(gate, batch_format="pyarrow")
        .groupby("part")
        .map_groups(keep_min, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                            "n_tokens": pd.Series([], dtype=np.int64)})
    out = out[["doc_id", "n_tokens"]]
    return out.sort_values("doc_id").reset_index(drop=True)
