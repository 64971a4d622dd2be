"""Exactness checks for the rows-only (non-SQL-oracle) document operators:
an independent scalar recompute for SimHash, and a truth-label accuracy bound
for the language-ID heuristic (VERDICT r1 item 7)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _naive_simhash(text: str) -> int:
    """Independent per-bit recompute of the Charikar SimHash the vectorized
    kernel (ops/dedup_text.py::simhash_signatures) produces: same shingle
    hashes, naive bit-vote loop."""
    from marc_record_merge_melindautils_ray.functions.hashing import MinHasher
    from marc_record_merge_melindautils_ray.functions.textnorm import (
        normalize_transcript,
    )

    mh = MinHasher(1, 0, 4)
    hashes, _ = mh.shingle_hashes([normalize_transcript(text)])
    votes = [0] * 64
    for h in hashes:
        for b in range(64):
            votes[b] += 1 if (int(h) >> b) & 1 else -1
    out = 0
    for b in range(64):
        if votes[b] > 0:
            out |= 1 << b
    return out


def test_simhash_matches_naive_recompute(ray_session):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops.dedup_text import simhash_signatures

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "sama teksti kahdesti sama teksti kahdesti",
        "",
        "x",
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    got = simhash_signatures(ds, "doc_id", "text").to_pandas().sort_values("id")
    for _, row in got.iterrows():
        expect = _naive_simhash(texts[int(row["id"])])
        got_u = int(row["simhash"]) & ((1 << 64) - 1)  # undo the int64 bit-view
        assert got_u == expect, f"doc {row['id']}: simhash mismatch"


def test_lang_id_on_marked_texts(ray_session):
    """The heuristic must classify texts carrying genuine language markers.
    (The driver testdata's ``lang`` column is a random label over shared
    vocabulary, so truth-accuracy there is meaningless; value-level checking
    of q_lang_id is done by its DuckDB oracle in ``oracle_sql()``.)"""
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops.text_analysis import LangId

    cases = [
        ("the cat and the dog of the house is old", "en"),
        ("der hund und die katze ist nicht mit ein haus", "de"),
        ("le chat est dans la maison et les chiens pour", "fr"),
        ("el gato y los perros es una casa por como", "es"),
        ("这是一个中文句子", "zh"),
        ("xyzzy plugh qwerty", "unk"),
    ]
    df = pd.DataFrame({"doc_id": range(len(cases)), "text": [c[0] for c in cases]})
    out = LangId()(df)
    assert list(out["lang_pred"]) == [c[1] for c in cases]


def test_simhash_dup_pairs_exact_vs_brute(ray_session):
    """Banded SimHash pair blocking is EXACT for hamming <= max_hamming
    (pigeonhole: 4 bands, <=3 flipped bits leave one band untouched) — the
    distributed pass must equal brute-force all-pairs."""
    import itertools

    from marc_record_merge_melindautils_ray.ops.dedup_text import (
        q_simhash_dup_pairs,
        q_simhash_docs,
    )

    sf = "/root/testdata/sf0.001"
    got = q_simhash_dup_pairs(sf, max_hamming=3)
    sigs = q_simhash_docs(sf)
    sh = {int(r["id"]): int(r["simhash"]) & ((1 << 64) - 1) for _, r in sigs.iterrows()}
    truth = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        if bin(sh[a] ^ sh[b]).count("1") <= 3:
            truth.add((a, b))
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    assert got_pairs == truth


def test_ngram_capped_variant(ray_session, tmp_path):
    """max_df cap: identical to the exact query when no gram exceeds the cap;
    hub grams dropped WITH visible counts when one does; the exact query's
    hub guard raises instead of OOMing (capped-work-is-visible rule)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from marc_record_merge_melindautils_ray.ops.dedup_text import q_ngram_jaccard_pairs

    # 60 docs, every one sharing the boilerplate trigram "lorem ipsum dolor"
    # (a df=60 hub gram); docs (i, i+30) are identical → planted dup pairs
    texts = []
    for i in range(30):
        texts.append(f"lorem ipsum dolor alpha{i} beta{i} gamma{i}")
    texts = texts + texts  # ids 30..59 duplicate 0..29
    tbl = pa.table({
        "doc_id": pa.array(np.arange(60), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    exact = q_ngram_jaccard_pairs(sf)
    exact_pairs = set(zip(exact["id_a"], exact["id_b"]))
    assert {(i, i + 30) for i in range(30)} <= exact_pairs

    # cap far above every df → byte-identical to exact, zero drops
    m_hi: dict = {}
    hi = q_ngram_jaccard_pairs(sf, max_df=100, metrics=m_hi)
    assert hi.equals(exact)
    assert m_hi["dropped_hub_grams"] == 0

    # cap below the hub's df=60 → hub gram dropped, counted, logged; the
    # planted pairs survive on their unique grams at a lower (bounded-below)
    # jaccard
    m_lo: dict = {}
    lo = q_ngram_jaccard_pairs(sf, max_df=5, metrics=m_lo)
    assert m_lo["dropped_hub_grams"] == 1
    assert m_lo["dropped_pair_rows"] == 60 * 59 // 2
    lo_pairs = set(zip(lo["id_a"], lo["id_b"]))
    assert lo_pairs == exact_pairs  # planted dups share 3 unique grams each
    merged = exact.merge(lo, on=["id_a", "id_b"], suffixes=("_exact", "_capped"))
    assert (merged["jaccard_permille_capped"] <= merged["jaccard_permille_exact"]).all()

    # exact semantics forbid silent dropping: over the guard is an ERROR
    with pytest.raises(Exception, match="hub_guard"):
        q_ngram_jaccard_pairs(sf, hub_guard=10)


def test_containment_pairs_exact(ray_session, tmp_path):
    """Substring containment must be exact at the CHARACTER level (word
    boundaries in the container need not align) and respect the min-length
    and strictly-shorter rules."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.dedup_text import q_containment_pairs

    inner = "the quick brown fox jumps over the lazy dog"
    docs = [
        inner,                                   # 0: inner
        f"PREFIX{inner}SUFFIX without spaces",   # 1: char-level container
        f"a sentence then {inner} then more",    # 2: word-level container
        "completely unrelated content here okay",  # 3: no relation
        inner,                                   # 4: equal text — NOT strictly longer
        "tiny text",                             # 5: under min_len as inner
        f"xx{'tiny text'}yy this outer holds a short one",  # 6: contains doc 5 (too short to count)
    ]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = q_containment_pairs(str(tmp_path))
    pairs = set(zip(got["id_inner"], got["id_outer"]))
    assert (0, 1) in pairs   # char-level (no word boundary at the seam)
    assert (0, 2) in pairs
    assert (4, 1) in pairs and (4, 2) in pairs  # duplicate inner text
    assert (0, 4) not in pairs and (4, 0) not in pairs  # equal length: excluded
    assert (5, 6) not in pairs  # inner below min_len
    assert not any(o == 3 or i == 3 for i, o in pairs)


def test_containment_pairs_large_string(ray_session, tmp_path):
    """Regression: a documents table written as Arrow large_string (int64
    offsets) must parse doc boundaries correctly — misreading the offsets
    as int32 attributed windows to the wrong doc."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.dedup_text import q_containment_pairs

    inner = "the quick brown fox jumps over the lazy dog"
    docs = [inner, f"PREFIX{inner}SUFFIX", "some unrelated filler text here"]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.large_string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = q_containment_pairs(str(tmp_path))
    assert set(zip(got["id_inner"], got["id_outer"])) == {(0, 1)}


# ---------------------------------------------- perplexity quality buckets
def test_perplexity_buckets_properties(ray_session, tmp_path):
    """Self-trained bigram-LM bucketing: equal-count buckets, deterministic,
    and a planted gibberish doc lands in the tail with a far worse score
    than natural text."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.text_analysis import (
        q_perplexity_buckets,
    )

    rng = np.random.default_rng(1)
    texts = [
        ("the quick brown fox jumps over the lazy dog again and again " * 5)
        + f" variant {i}"
        for i in range(20)
    ]
    texts.append("".join(chr(rng.integers(33, 126)) for _ in range(300)))
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(d / "documents.parquet"))
    out = q_perplexity_buckets(str(d))
    assert len(out) == 21
    vc = out["bucket"].value_counts()
    assert vc.max() - vc.min() <= 1  # equal-count split
    gib = out[out["doc_id"] == 20].iloc[0]
    assert gib["bucket"] == "tail"
    assert gib["mean_logp_e6"] < out["mean_logp_e6"].median() - 1_000_000
    assert out.equals(q_perplexity_buckets(str(d)))  # deterministic


def test_decontaminate_planted(ray_session, tmp_path):
    """A training doc that quotes an 8-word span from an eval doc is flagged
    with the exact count of shared distinct 8-grams; clean docs report 0;
    docs under 8 words emit no row (oracle parity)."""
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.dedup_text import q_decontaminate

    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # doc 3 (3 % 19 == 3) is the eval doc; doc 1 quotes words 0..7 → its one
    # contaminated 8-gram; doc 2 is clean; doc 4 is too short for any gram
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "intro words alpha beta gamma delta epsilon zeta eta theta done",
            "totally unrelated content with many distinct words here today",
            eval_text,
            "too short",
        ], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q_decontaminate(str(tmp_path))
    assert out.doc_id.tolist() == [1, 2]
    row1 = out[out.doc_id == 1].iloc[0]
    assert row1.hit_grams == 1 and row1.n_grams == 4
    assert out[out.doc_id == 2].iloc[0].hit_grams == 0


def test_doc_chunks_semantics(ray_session, tmp_path):
    """Window/stride chunk semantics pinned: ≤W words → one chunk; the tail
    chunk is short but never empty; overlap regions repeat exactly; empty
    docs emit nothing; canonicalization collapses whitespace + case."""
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.text_analysis import q_doc_chunks

    w40 = " ".join(f"w{i}" for i in range(40))     # 40 words: chunks at 0, 8
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "Short  DOC with\tfew words", w40, "", "exactly " * 32,
        ], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = (q_doc_chunks(str(tmp_path), window=32, stride=24).to_pandas()
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))

    d1 = out[out.doc_id == 1]
    assert len(d1) == 1 and d1.iloc[0].chunk_text == "short doc with few words"
    assert d1.iloc[0].n_words == 5

    d2 = out[out.doc_id == 2]
    assert d2.chunk_idx.tolist() == [0, 1]
    assert d2.iloc[0].chunk_text == " ".join(f"w{i}" for i in range(32))
    assert d2.iloc[1].chunk_text == " ".join(f"w{i}" for i in range(24, 40))
    assert d2.iloc[1].n_words == 16
    # overlap region w24..w31 appears in both chunks verbatim
    assert d2.iloc[0].chunk_text.endswith(" ".join(f"w{i}" for i in range(24, 32)))

    assert (out.doc_id == 3).sum() == 0            # empty doc → no chunks

    d4 = out[out.doc_id == 4]                      # exactly 32 words
    assert len(d4) == 1 and d4.iloc[0].n_words == 32


def test_dup_size_histogram_constructed(ray_session, tmp_path):
    """Planted clusters: 3 copies of A, 2 of B, 4 singletons → histogram
    {1: 4, 2: 1, 3: 1}; the testdata itself is all-unique (pinned by the
    oracle row)."""
    import numpy as np
    import pandas as pd

    from marc_record_merge_melindautils_ray.ops.dedup_text import (
        q_dup_size_histogram,
    )

    texts = ["A"] * 3 + ["B"] * 2 + [f"solo {i}" for i in range(4)]
    pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts, "lang": "en", "source": "s", "n_chars": np.int64(1),
    }).to_parquet(tmp_path / "documents.parquet")
    got = q_dup_size_histogram(str(tmp_path))
    assert list(map(tuple, got.to_numpy())) == [(1, 4), (2, 1), (3, 1)]
