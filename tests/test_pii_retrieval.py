"""PII redaction (adversarial regex-parity pins), inverted index, and
exact-integer BM25 — constructed-corpus + oracle-parity tests."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_pii_redact_email_phone_arms(ray_session, tmp_path):
    """The email/phone arms (unexercised by the digit-only testdata) fire
    and claim their digits before the bare-number arm; adjacency edges
    match Python-re semantics."""
    from marc_record_merge_melindautils_ray.ops.text_analysis import q_pii_redact

    df = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-01"),
        "user_id": np.int64(1),
        "event_type": "x",
        "value": 0.0,
        "props": [
            "mail bob.smith+a@ex-ample.co now",
            "call 555-123-4567 or 999.888.7777",
            "x1@y.com2 tail",            # email then bare digit
            "123-456-7890123",            # phone then overflow digits
            "no pii",
            None,
        ],
    })
    df.to_parquet(tmp_path / "events.parquet")
    got = q_pii_redact(str(tmp_path)).to_pandas().set_index("event_id")
    assert got.loc[0, "props_redacted"] == "mail <PII> now"
    assert got.loc[0, "n_pii"] == 1
    assert got.loc[1, "props_redacted"] == "call <PII> or <PII>"
    assert got.loc[2, "props_redacted"] == "<PII><PII> tail"
    assert got.loc[2, "n_pii"] == 2
    assert got.loc[3, "props_redacted"] == "<PII><PII>"
    assert got.loc[4, "n_pii"] == 0
    assert got.loc[5, "props_redacted"] == "" and got.loc[5, "n_pii"] == 0


def test_pii_redact_oracle(ray_session):
    from marc_record_merge_melindautils_ray.ops.text_analysis import q_pii_redact

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = con.execute("""
        SELECT event_id,
               regexp_replace(coalesce(props,''),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}|[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}|[0-9]+',
                 '<PII>', 'g') AS props_redacted,
               CAST(len(regexp_extract_all(coalesce(props,''),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}|[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}|[0-9]+'))
                 AS BIGINT) AS n_pii
        FROM events ORDER BY event_id""").df()
    got = (q_pii_redact(SF).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert got["props_redacted"].tolist() == want["props_redacted"].tolist()
    assert got["n_pii"].tolist() == want["n_pii"].tolist()


def test_inverted_index_constructed(ray_session, tmp_path):
    """df counts once per doc (repeats collapse); postings numerically
    sorted; empty docs excluded."""
    from marc_record_merge_melindautils_ray.ops.text_analysis import q_inverted_index

    df = pd.DataFrame({
        "doc_id": np.array([10, 2, 33, 4], np.int64),
        "text": ["cat cat dog", "dog", "  ", "cat zebra"],
        "lang": "en", "source": "s", "n_chars": np.int64(1),
    })
    df.to_parquet(tmp_path / "documents.parquet")
    got = q_inverted_index(str(tmp_path)).set_index("term")
    assert got.loc["cat"].tolist() == [2, "4,10"]     # numeric sort, not "10,4"
    assert got.loc["dog"].tolist() == [2, "2,10"]
    assert got.loc["zebra"].tolist() == [1, "4"]
    assert len(got) == 3                               # blank doc contributes nothing


def test_bm25_constructed(ray_session, tmp_path):
    """Exact-integer BM25 on a corpus exercising: negative idf (term in
    >half the docs), zero-hit doc exclusion, empty-doc exclusion from
    N/total, and length normalization (same tf, longer doc scores lower)."""
    from marc_record_merge_melindautils_ray.ops.text_analysis import q_bm25_top

    docs = {
        1: "join join filler",               # rare term, tf=2, short
        2: "join " + "pad " * 40,            # rare term, tf=1, long
        3: "hash a b", 4: "hash c", 5: "hash d e f", 6: "hash g",  # common
        7: "nothing here",
        8: "",                                # excluded from N and total
    }
    pd.DataFrame({
        "doc_id": np.array(list(docs), np.int64),
        "text": list(docs.values()),
        "lang": "en", "source": "s", "n_chars": np.int64(1),
    }).to_parquet(tmp_path / "documents.parquet")
    got = q_bm25_top(str(tmp_path), terms=("join", "hash"), k=10)
    assert set(got["doc_id"]) == {1, 2, 3, 4, 5, 6}   # 7 (no hits), 8 excluded
    s = got.set_index("doc_id")["score"]
    assert s[1] > s[2] > 0            # tf and length ordering for the rare term
    # 'hash' is in 4 of 7 non-empty docs -> df > N/2 -> negative idf
    assert (s[[3, 4, 5, 6]] < 0).all()

    # oracle parity on the same constructed corpus (exact hash equality)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    want = con.execute("""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
          FROM documents WHERE length(trim(coalesce(text, ''))) > 0),
        dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
        corp AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS t FROM dl),
        tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok
               WHERE term IN ('join', 'hash') GROUP BY 1, 2),
        dfq AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                FROM tok WHERE term IN ('join', 'hash') GROUP BY 1),
        scored AS (
          SELECT tf.doc_id,
                 CAST(floor(1e6 * ln((2*corp.n - 2*dfq.df + 1.0) / (2*dfq.df + 1.0))
                            + 0.5) AS BIGINT)
                 * ((22 * tf.tf * corp.t * 1000)
                    // (10 * tf.tf * corp.t + 3 * corp.t + 9 * dl.dl * corp.n)) AS c
          FROM tf, corp
          JOIN dfq ON tf.term = dfq.term
          JOIN dl ON tf.doc_id = dl.doc_id)
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS score
        FROM scored GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""").df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].tolist() == want["score"].tolist()
