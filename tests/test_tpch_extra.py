"""Oracle-parity (DuckDB, sf0.001) tests for the Q4/Q12/Q14/Q18/ntile
relational operators and the TF-IDF text operator."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "part", "documents"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _eq(got: pd.DataFrame, want: pd.DataFrame):
    got = got.reset_index(drop=True)
    assert got.shape == want.shape, (got.shape, want.shape)
    for c in want.columns:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c


def test_q4_semi_join(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q4_order_priority

    want = con.execute("""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders WHERE EXISTS (SELECT 1 FROM lineitem
                                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority""").df()
    _eq(q4_order_priority(SF), want)


def test_q12_conditional_agg(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q12_priority_lines

    want = con.execute("""
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_linestatus ORDER BY l_linestatus""").df()
    _eq(q12_priority_lines(SF), want)


def test_q14_promo_ratio(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q14_promo_revenue

    want = con.execute("""
        WITH s AS (SELECT
          CAST(sum(CASE WHEN p_type='PROMO'
                   THEN CAST(round(l_extendedprice*(1-l_discount)*10000,0) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS promo_rev_e4,
          CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000,0) AS BIGINT))
              AS BIGINT) AS total_rev_e4
          FROM lineitem JOIN part ON l_partkey = p_partkey)
        SELECT promo_rev_e4, total_rev_e4,
               CAST(round(10000.0*promo_rev_e4/total_rev_e4, 0) AS BIGINT) AS promo_permyriad
        FROM s""").df()
    _eq(q14_promo_revenue(SF), want)


def test_q18_having_join_back(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q18_big_spenders

    want = con.execute("""
        WITH s AS (SELECT o_custkey,
                          CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT)
                              AS total_cents
                   FROM orders GROUP BY o_custkey HAVING total_cents > 30000000)
        SELECT c_custkey, c_name, total_cents
        FROM s JOIN customer ON c_custkey = o_custkey
        ORDER BY total_cents DESC, c_custkey""").df()
    _eq(q18_big_spenders(SF), want)


def test_q18_empty_survivor_schema(ray_session):
    """A threshold nothing clears still yields the full (empty) schema."""
    from marc_record_merge_melindautils_ray.ops.relational import q18_big_spenders

    out = q18_big_spenders(SF, threshold_cents=10**15)
    assert list(out.columns) == ["c_custkey", "c_name", "total_cents"]
    assert len(out) == 0


def test_ntile_quartiles(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_order_quartiles

    want = con.execute("""
        WITH t AS (SELECT o_orderkey, CAST(round(o_totalprice*100,0) AS BIGINT) AS price_c,
                          ntile(4) OVER (ORDER BY CAST(round(o_totalprice*100,0) AS BIGINT),
                                         o_orderkey) AS tile
                   FROM orders)
        SELECT CAST(tile AS BIGINT) AS tile, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(price_c) AS BIGINT) AS sum_cents
        FROM t GROUP BY tile ORDER BY tile""").df()
    _eq(q_order_quartiles(SF), want)


def test_ntile_remainder_distribution(ray_session, con):
    """k that does not divide N: the first N mod k tiles must hold one extra
    row (the ANSI NTILE contract), checked against DuckDB with k=7."""
    from marc_record_merge_melindautils_ray.ops.relational import q_order_quartiles

    want = con.execute("""
        WITH t AS (SELECT o_orderkey, CAST(round(o_totalprice*100,0) AS BIGINT) AS price_c,
                          ntile(7) OVER (ORDER BY CAST(round(o_totalprice*100,0) AS BIGINT),
                                         o_orderkey) AS tile
                   FROM orders)
        SELECT CAST(tile AS BIGINT) AS tile, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(price_c) AS BIGINT) AS sum_cents
        FROM t GROUP BY tile ORDER BY tile""").df()
    _eq(q_order_quartiles(SF, k=7), want)


def test_tfidf_top(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.text_analysis import q_tfidf_top

    want = con.execute("""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
          FROM documents WHERE length(trim(coalesce(text, ''))) > 0),
        tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
        nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tok),
        dfq AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY term),
        scored AS (SELECT doc_id, tf.term,
                          tf * CAST(round(ln(n*1.0/df)*1000000, 0) AS BIGINT) AS tfidf_e6
                   FROM tf, nd JOIN dfq ON tf.term = dfq.term),
        r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                          ORDER BY tfidf_e6 DESC, term) AS rk FROM scored)
        SELECT doc_id, term, tfidf_e6, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= 3 ORDER BY doc_id, rk""").df()
    _eq(q_tfidf_top(SF), want)
