"""Oracle-parity tests (DuckDB, sf0.001) for the argmax-dedup / rollup /
exact-quantile / broadcast-dimension-aggregate / bigram operators, plus unit
coverage of the weighted quantile_cont kernel."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "lineitem", "part"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _assert_frames_equal(got, want):
    got = got.reset_index(drop=True)
    assert got.shape == want.shape, (got.shape, want.shape)
    for c in want.columns:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c


def test_dedup_keep_best(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_dedup_keep_best

    want = con.execute("""
        SELECT lang, source, doc_id, n_chars FROM documents
        QUALIFY row_number() OVER (
            PARTITION BY lang, source ORDER BY n_chars DESC, doc_id) = 1
        ORDER BY lang, source""").df()
    _assert_frames_equal(q_dedup_keep_best(SF), want)


def test_rollup_lineitem(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_rollup_lineitem

    want = con.execute("""
        SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY rf, ls""").df()
    _assert_frames_equal(q_rollup_lineitem(SF), want)


def test_group_quantiles_exact(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_group_quantiles_exact

    want = con.execute("""
        SELECT l_returnflag,
               CAST(round(quantile_cont(l_quantity, 0.5)*100, 0) AS BIGINT) AS median_qty_c,
               CAST(round(quantile_cont(l_quantity, 0.9)*100, 0) AS BIGINT) AS p90_qty_c,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""").df()
    _assert_frames_equal(q_group_quantiles_exact(SF), want)


def test_brand_revenue(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_brand_revenue

    want = con.execute("""
        SELECT p.p_brand,
               CAST(sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*10000, 0)
                   AS BIGINT)) AS BIGINT) AS rev_e4,
               count(*) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand ORDER BY p.p_brand""").df()
    _assert_frames_equal(q_brand_revenue(SF), want)


def test_bigram_top(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.text_analysis import q_bigram_top

    want = con.execute(r"""
        WITH t AS (
          SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS w
          FROM documents WHERE length(trim(coalesce(text,''))) > 0
        ), b AS (
          SELECT w[i] || ' ' || w[i+1] AS bigram
          FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-1)) AS i) u
          WHERE len(w) >= 2
        )
        SELECT bigram, count(*) AS n FROM b
        GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""").df()
    _assert_frames_equal(q_bigram_top(SF), want)


def test_weighted_quantile_cont_matches_numpy():
    from marc_record_merge_melindautils_ray.ops.relational import (
        _weighted_quantile_cont,
    )

    rng = np.random.default_rng(7)
    for _ in range(20):
        vals = rng.integers(0, 15, size=rng.integers(1, 200)).astype(np.float64)
        uniq, counts = np.unique(vals, return_counts=True)
        # shuffle histogram order: the kernel must sort internally
        o = rng.permutation(len(uniq))
        for q in (0.0, 0.1, 0.5, 0.9, 1.0):
            got = _weighted_quantile_cont(uniq[o], counts[o], q)
            want = np.quantile(vals, q, method="linear")
            assert abs(got - want) < 1e-9, (q, got, want)


@pytest.fixture(scope="module")
def con2():
    c = duckdb.connect()
    for t in ("events", "orders", "documents"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def test_pivot_events(ray_session, con2):
    from marc_record_merge_melindautils_ray.ops.relational import q_pivot_events

    want = con2.execute("""
        SELECT user_id,
               count(*) FILTER (event_type='click') AS n_click,
               count(*) FILTER (event_type='error') AS n_error,
               count(*) FILTER (event_type='purchase') AS n_purchase,
               count(*) FILTER (event_type='signup') AS n_signup,
               count(*) FILTER (event_type='view') AS n_view
        FROM events GROUP BY user_id ORDER BY user_id""").df()
    _assert_frames_equal(q_pivot_events(SF), want)


def test_running_total(ray_session, con2):
    from marc_record_merge_melindautils_ray.ops.relational import q_running_total

    want = con2.execute("""
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS BIGINT) AS cum_spend_c
        FROM orders ORDER BY o_custkey, o_orderkey""").df()
    _assert_frames_equal(q_running_total(SF), want)


def test_top_terms_per_lang(ray_session, con2):
    from marc_record_merge_melindautils_ray.ops.text_analysis import q_top_terms_per_lang

    want = con2.execute(r"""
        WITH t AS (
          SELECT lang, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
          FROM documents WHERE length(trim(coalesce(text,''))) > 0
        ), c AS (SELECT lang, term, count(*) AS n FROM t GROUP BY lang, term)
        SELECT lang, term, n FROM c
        QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) <= 5
        ORDER BY lang, term""").df()
    _assert_frames_equal(q_top_terms_per_lang(SF), want)


def test_global_rank(ray_session, con2):
    from marc_record_merge_melindautils_ray.ops.relational import q_global_rank

    want = con2.execute("""
        SELECT CAST(row_number() OVER (
                   ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk,
               o_orderkey, CAST(round(o_totalprice*100, 0) AS BIGINT) AS price_c
        FROM orders ORDER BY rnk""").df()
    # nparts > distinct boundary samples exercises degenerate/empty ranges too
    _assert_frames_equal(q_global_rank(SF, nparts=7), want)


def test_train_val_test_split_properties(ray_session):
    from marc_record_merge_melindautils_ray.ops.relational import (
        q_train_val_test_split,
    )

    out = q_train_val_test_split("/root/testdata/sf0.001")
    # exhaustive + disjoint: one label per doc
    assert out["doc_id"].is_unique and len(out) == 500
    counts = out["split"].value_counts()
    # 80/10/10 within hash tolerance on 500 docs
    assert 0.7 * 500 <= counts.get("train", 0) <= 0.9 * 500
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0
    # deterministic: same labels on a rerun
    assert out.equals(q_train_val_test_split("/root/testdata/sf0.001"))


def test_dedup_events_windowed_chain_semantics(ray_session, tmp_path):
    """Lag-based suppression: each event compares to the PREVIOUS same-key
    event (suppressed or not) — a chain 0/20/40 min at gap=30 keeps only
    the first event."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.relational import (
        q_dedup_events_windowed,
    )

    d = tmp_path / "sf"
    d.mkdir()
    base = np.datetime64("2024-01-01T00:00:00", "us")
    mins = lambda m: base + np.timedelta64(m * 60_000_000, "us")
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([mins(0), mins(20), mins(40), mins(120), mins(0)],
                       pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 7, 8], pa.int64()),
        "event_type": pa.array(["c", "c", "c", "c", "c"], pa.string()),
    }), str(d / "events.parquet"))
    out = q_dedup_events_windowed(str(d))
    # chain: 20min suppressed by 0; 40min suppressed by 20 (even though 20
    # was itself suppressed); 120min survives; other user untouched
    assert out["event_id"].tolist() == [1, 4, 5]
