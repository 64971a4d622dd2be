"""Oracle-parity (DuckDB, sf0.001) tests for the final TPC-H batch: Q2
(correlated-min join-back), Q6 (predicate scan + global sum), Q8 (conditional
market-share sums), Q9 (profit per nation/year), Q16 (COUNT DISTINCT over a
filtered many-to-many), Q20 (half-of-total gate), Q21 (sole-late-supplier
double-correlated gate) — partsupp-free adaptations per the module
docstring (ops/tpch_rest.py)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _eq(got: pd.DataFrame, want: pd.DataFrame):
    got = got.reset_index(drop=True)
    assert got.shape == want.shape, (got.shape, want.shape)
    for c in want.columns:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c


def test_q2_min_cost_supplier(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.tpch_rest import q2_min_cost_supplier

    want = con.execute("""
        WITH ps AS (
          SELECT l_partkey, l_suppkey,
                 CAST(min(CAST(round(l_extendedprice*100,0) AS BIGINT))
                     AS BIGINT) AS cost_c
          FROM lineitem GROUP BY l_partkey, l_suppkey),
        eligible AS (SELECT p_partkey FROM part
                     WHERE p_size = 15 AND p_type = 'SMALL'),
        eu_supp AS (
          SELECT s_suppkey, s_name,
                 CAST(round(s_acctbal*100,0) AS BIGINT) AS s_acctbal_c, n_name
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
                        JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'),
        costs AS (
          SELECT ps.l_partkey AS p_partkey, ps.l_suppkey, ps.cost_c
          FROM ps JOIN eligible ON ps.l_partkey = eligible.p_partkey
                  JOIN eu_supp ON ps.l_suppkey = eu_supp.s_suppkey),
        mins AS (SELECT p_partkey, min(cost_c) AS mc FROM costs
                 GROUP BY p_partkey)
        SELECT s_acctbal_c, s_name, n_name, costs.p_partkey AS p_partkey, cost_c
        FROM costs JOIN mins ON costs.p_partkey = mins.p_partkey
                            AND costs.cost_c = mins.mc
                   JOIN eu_supp ON costs.l_suppkey = eu_supp.s_suppkey
        ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey""").df()
    got = q2_min_cost_supplier(SF)
    assert len(got) > 0  # the cut selects something on the corpus
    _eq(got, want)


def test_q2_unknown_type_empty(ray_session):
    from marc_record_merge_melindautils_ray.ops.tpch_rest import q2_min_cost_supplier

    got = q2_min_cost_supplier(SF, ptype="NO_SUCH_TYPE")
    assert got.empty and list(got.columns) == [
        "s_acctbal_c", "s_name", "n_name", "p_partkey", "cost_c"]


def test_q6_forecast_revenue(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.tpch_rest import q6_forecast_revenue

    want = con.execute("""
        SELECT CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
                        * CAST(round(l_discount*100,0) AS BIGINT))
                   AS BIGINT) AS revenue_e4,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
          AND CAST(round(l_discount*100,0) AS BIGINT) BETWEEN 5 AND 7
          AND CAST(l_quantity AS BIGINT) < 24""").df()
    got = q6_forecast_revenue(SF)
    assert int(got["n_lines"][0]) > 0
    _eq(got, want)


def test_q8_market_share(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.tpch_rest import q8_market_share

    want = con.execute("""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CASE WHEN sn.n_name = 'NATION_3' THEN rev ELSE 0 END)
                   AS BIGINT) AS nation_rev_e4,
               CAST(sum(rev) AS BIGINT) AS total_rev_e4
        FROM (SELECT l_orderkey, l_suppkey, l_partkey,
                     CAST(round(l_extendedprice*(1-l_discount)*10000,0)
                         AS BIGINT) AS rev
              FROM lineitem) l
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region    ON cn.n_regionkey = r_regionkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN part      ON l_partkey = p_partkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate >= DATE '1995-01-01'
          AND o_orderdate < DATE '1997-01-01'
        GROUP BY o_year ORDER BY o_year""").df()
    got = q8_market_share(SF)
    assert (got["nation_rev_e4"] > 0).any()  # the nation actually trades
    # share is always a sub-fraction of the market
    assert (got["nation_rev_e4"] <= got["total_rev_e4"]).all()
    _eq(got, want)


def test_q9_product_profit(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.tpch_rest import q9_product_profit

    want = con.execute("""
        SELECT sn.n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000,0)
                            AS BIGINT)
                        - CAST(round(p_retailprice*100,0) AS BIGINT)
                          * CAST(l_quantity AS BIGINT) * 100)
                   AS BIGINT) AS profit_e4
        FROM lineitem
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN part      ON l_partkey = p_partkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC""").df()
    got = q9_product_profit(SF)
    assert len(got) > 0
    _eq(got, want)


def test_q9_no_match_empty(ray_session):
    from marc_record_merge_melindautils_ray.ops.tpch_rest import q9_product_profit

    got = q9_product_profit(SF, name_like="zz_no_such_token")
    assert got.empty and list(got.columns) == ["nation", "o_year", "profit_e4"]


def test_q16_supplier_part_counts(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.tpch_rest import (
        q16_supplier_part_counts,
    )

    want = con.execute("""
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        bad AS (SELECT s_suppkey FROM supplier
                WHERE CAST(round(s_acctbal*100,0) AS BIGINT) < 0)
        SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM ps JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1,4,9,16,25,36,49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM bad)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""").df()
    got = q16_supplier_part_counts(SF)
    assert len(got) > 0
    _eq(got, want)


def test_q20_promotion_suppliers(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.tpch_rest import (
        q20_promotion_suppliers,
    )

    want = con.execute("""
        WITH pq AS (
          SELECT l_partkey, l_suppkey,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
          FROM lineitem
          WHERE l_shipdate >= DATE '1996-01-01'
            AND l_shipdate < DATE '1997-01-01'
          GROUP BY l_partkey, l_suppkey),
        tot AS (SELECT l_partkey, CAST(sum(sq) AS BIGINT) AS tq
                FROM pq GROUP BY l_partkey),
        named AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        SELECT DISTINCT s_suppkey, s_name, n_name
        FROM pq JOIN tot ON pq.l_partkey = tot.l_partkey
                JOIN named ON pq.l_partkey = named.p_partkey
                JOIN supplier ON pq.l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
        WHERE 2*sq > tq
        ORDER BY s_suppkey""").df()
    got = q20_promotion_suppliers(SF)
    assert len(got) > 0
    _eq(got, want)


def test_q20_unknown_prefix_empty(ray_session):
    from marc_record_merge_melindautils_ray.ops.tpch_rest import (
        q20_promotion_suppliers,
    )

    got = q20_promotion_suppliers(SF, name_prefix="zz_no_such_prefix")
    assert got.empty and list(got.columns) == ["s_suppkey", "s_name", "n_name"]


def test_q21_waiting_suppliers(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.tpch_rest import (
        q21_waiting_suppliers,
    )

    want = con.execute("""
        WITH l AS (
          SELECT l_orderkey, l_suppkey,
                 CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'),
        s AS (SELECT l_orderkey, l_suppkey, max(late) AS late
              FROM l GROUP BY l_orderkey, l_suppkey),
        per_order AS (SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
                      FROM s GROUP BY l_orderkey)
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM s JOIN per_order USING (l_orderkey)
               JOIN supplier ON s.l_suppkey = s_suppkey
        WHERE s.late = 1 AND per_order.n_supp >= 2 AND per_order.n_late = 1
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""").df()
    got = q21_waiting_suppliers(SF)
    assert len(got) > 0
    _eq(got, want)


def test_q21_sole_late_semantics(ray_session, con):
    """Pin the gate semantics directly: every reported supplier must, for at
    least one finished order, be late while being the ONLY late supplier in
    an order with >=2 suppliers (checked independently in DuckDB)."""
    from marc_record_merge_melindautils_ray.ops.tpch_rest import (
        q21_waiting_suppliers,
    )

    got = q21_waiting_suppliers(SF)
    qualifying = set(con.execute("""
        WITH l AS (
          SELECT l_orderkey, l_suppkey,
                 CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'),
        s AS (SELECT l_orderkey, l_suppkey, max(late) AS late
              FROM l GROUP BY l_orderkey, l_suppkey),
        per_order AS (SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
                      FROM s GROUP BY l_orderkey)
        SELECT DISTINCT s_name
        FROM s JOIN per_order USING (l_orderkey)
               JOIN supplier ON s.l_suppkey = s_suppkey
        WHERE s.late = 1 AND n_supp >= 2 AND n_late = 1""").df()["s_name"])
    assert set(got["s_name"]).issubset(qualifying)
