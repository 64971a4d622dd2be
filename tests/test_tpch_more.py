"""Oracle-parity (DuckDB, sf0.001) tests for the correlated/global-scalar
TPC-H shapes: Q17 (correlated avg gate), Q22 (global-avg + anti-join),
Q15 (argmax with ties), Q11 (HAVING vs global total), Q13 (count
distribution with zero bucket)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "part", "supplier"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _eq(got: pd.DataFrame, want: pd.DataFrame):
    got = got.reset_index(drop=True)
    assert got.shape == want.shape, (got.shape, want.shape)
    for c in want.columns:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c


def test_q17_small_qty_revenue(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.tpch_more import q17_small_qty_revenue

    want = con.execute("""
        WITH agg AS (
          SELECT l_partkey,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
                 CAST(count(*) AS BIGINT) AS ct
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#3' GROUP BY l_partkey)
        SELECT COALESCE(CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT))
                   AS BIGINT), 0) AS total_c,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem JOIN agg ON lineitem.l_partkey = agg.l_partkey
        WHERE 5 * CAST(l_quantity AS BIGINT) * ct < sq""").df()
    got = q17_small_qty_revenue(SF)
    assert int(got["n_lines"][0]) > 0  # the gate actually fires on the corpus
    _eq(got, want)


def test_q17_unknown_brand_empty(ray_session):
    from marc_record_merge_melindautils_ray.ops.tpch_more import q17_small_qty_revenue

    got = q17_small_qty_revenue(SF, brand="Brand#NOPE")
    assert got["total_c"].tolist() == [0] and got["n_lines"].tolist() == [0]


def test_q22_idle_customers(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.tpch_more import q22_idle_customers

    want = con.execute("""
        WITH pos AS (
          SELECT CAST(sum(CAST(round(c_acctbal*100,0) AS BIGINT)) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS n
          FROM customer WHERE CAST(round(c_acctbal*100,0) AS BIGINT) > 0)
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_cust,
               CAST(sum(CAST(round(c_acctbal*100,0) AS BIGINT)) AS BIGINT) AS sum_bal_c
        FROM customer, pos
        WHERE CAST(round(c_acctbal*100,0) AS BIGINT) * pos.n > pos.s
          AND c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment ORDER BY c_mktsegment""").df()
    got = q22_idle_customers(SF)
    assert len(got) > 0  # the corpus has idle above-average customers
    _eq(got, want)


def test_q15_top_supplier(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.tpch_more import q15_top_supplier

    want = con.execute("""
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000,0)
                      AS BIGINT)) AS BIGINT) AS total_e4
          FROM lineitem
          WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_e4
        FROM rev JOIN supplier ON s_suppkey = l_suppkey
        WHERE total_e4 = (SELECT max(total_e4) FROM rev)
        ORDER BY s_suppkey""").df()
    _eq(q15_top_supplier(SF), want)


def test_q15_empty_window(ray_session):
    from marc_record_merge_melindautils_ray.ops.tpch_more import q15_top_supplier

    got = q15_top_supplier(SF, date_lo="1970-01-01", date_hi="1970-01-02")
    assert len(got) == 0
    assert list(got.columns) == ["s_suppkey", "s_name", "total_e4"]


def test_q15_ties_preserved(ray_session):
    """Two suppliers sharing the max must BOTH appear (the reference SQL's
    equality-with-subquery keeps ties; an argmax that picks one is wrong)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = "/tmp/q15_ties"
    import os
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(pa.table({
        "l_suppkey": pa.array([1, 2, 2], pa.int64()),
        "l_shipdate": pa.array([np.datetime64("1996-02-01", "us")] * 3),
        "l_extendedprice": pa.array([200.0, 100.0, 100.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0]),
    }), f"{tmp}/lineitem.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": pa.array(["A", "B"]),
        "s_nationkey": pa.array([0, 0], pa.int64()),
        "s_acctbal": pa.array([0.0, 0.0]),
    }), f"{tmp}/supplier.parquet")

    from marc_record_merge_melindautils_ray.ops.tpch_more import q15_top_supplier

    got = q15_top_supplier(tmp)
    assert got["s_suppkey"].tolist() == [1, 2]
    assert got["total_e4"].tolist() == [2_000_000, 2_000_000]


def test_q11_important_parts(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.tpch_more import q11_important_parts

    want = con.execute("""
        WITH v AS (
          SELECT l_partkey AS p_partkey,
                 CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT)
                     AS value_c
          FROM lineitem GROUP BY l_partkey)
        SELECT p_partkey, value_c FROM v
        WHERE value_c * (SELECT count(*) FROM v) * 2
              > (SELECT sum(value_c) FROM v) * 3
        ORDER BY value_c DESC, p_partkey""").df()
    got = q11_important_parts(SF)
    assert len(got) > 0
    _eq(got, want)


def test_q13_order_count_distribution(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.tpch_more import (
        q13_order_count_distribution,
    )

    # FK cleanliness the engine's no-join zero bucket relies on
    dangling = con.execute("""
        SELECT count(*) FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)""").fetchone()[0]
    assert dangling == 0

    want = con.execute("""
        WITH c_orders AS (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(count(*) AS BIGINT) AS custdist
        FROM c_orders GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC""").df()
    got = q13_order_count_distribution(SF)
    _eq(got, want)


def test_q13_zero_bucket(ray_session):
    """Customers with no orders land in the zero bucket (sf0.001 has none,
    so pin it on a synthetic pair of tables)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = "/tmp/q13_zero"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_name": pa.array(["a", "b", "c", "d"]),
        "c_nationkey": pa.array([0, 0, 0, 0], pa.int64()),
        "c_acctbal": pa.array([0.0, 0.0, 0.0, 0.0]),
        "c_mktsegment": pa.array(["S"] * 4),
    }), f"{tmp}/customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
    }), f"{tmp}/orders.parquet")

    from marc_record_merge_melindautils_ray.ops.tpch_more import (
        q13_order_count_distribution,
    )

    got = q13_order_count_distribution(tmp)
    # counts: cust1→2 orders, cust2→1, cust3/4→0 ⇒ dist {0:2, 1:1, 2:1}
    assert dict(zip(got["c_count"], got["custdist"])) == {0: 2, 1: 1, 2: 1}
    # ordering: custdist desc, c_count desc
    assert got["c_count"].tolist() == [0, 2, 1]


def test_cube_lineitem(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_cube_lineitem

    want = con.execute("""
        SELECT COALESCE(l_returnflag, 'ALL') AS rf,
               COALESCE(l_linestatus, 'ALL') AS ls,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY rf, ls""").df()
    _eq(q_cube_lineitem(SF), want)


def test_rank_orders(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_rank_orders

    want = con.execute("""
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice*100,0) AS BIGINT) AS price_c,
               CAST(rank() OVER (PARTITION BY o_custkey
                    ORDER BY round(o_totalprice*100,0) DESC) AS BIGINT) AS rnk,
               CAST(dense_rank() OVER (PARTITION BY o_custkey
                    ORDER BY round(o_totalprice*100,0) DESC) AS BIGINT) AS drnk
        FROM orders ORDER BY o_custkey, rnk, o_orderkey""").df()
    _eq(q_rank_orders(SF), want)


def test_rank_ties_semantics(ray_session):
    """rank skips after a tie, dense_rank doesn't — pinned on a constructed
    partition with a 2-way tie at the top."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = "/tmp/rank_ties"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([7, 7, 7], pa.int64()),
        "o_totalprice": pa.array([50.0, 50.0, 10.0]),
    }), f"{tmp}/orders.parquet")

    from marc_record_merge_melindautils_ray.ops.relational import q_rank_orders

    got = q_rank_orders(tmp)
    assert got["rnk"].tolist() == [1, 1, 3]
    assert got["drnk"].tolist() == [1, 1, 2]


def test_stratified_sample_oracle(ray_session, con):
    """Per-stratum keep-rates select exactly the oracle's rows, and the
    oversampled stratum keeps a visibly higher fraction."""
    from marc_record_merge_melindautils_ray.ops.relational import q_stratified_sample

    want = con.execute("""
        SELECT l_orderkey, l_linenumber, l_returnflag,
               CAST(round(l_quantity * 100, 0) AS BIGINT) AS qty_c
        FROM lineitem
        WHERE (l_orderkey * 2654435761 + l_linenumber * 40503) % 4294967296
              < CASE l_returnflag
                    WHEN 'R' THEN 2147483648
                    WHEN 'A' THEN 536870912
                    ELSE 134217728 END
        ORDER BY l_orderkey, l_linenumber, l_returnflag, qty_c""").df()
    got = (q_stratified_sample(SF).to_pandas()
           .sort_values(["l_orderkey", "l_linenumber", "l_returnflag", "qty_c"])
           .reset_index(drop=True))
    _eq(got, want)

    totals = con.execute(
        "SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1").df()
    totals = dict(zip(totals.iloc[:, 0], totals.iloc[:, 1]))
    kept = got.groupby("l_returnflag").size()
    assert kept["R"] / totals["R"] > 0.4          # ~1/2
    assert kept["R"] / totals["R"] > 2 * kept["A"] / totals["A"]  # R oversampled


def test_intersect_keys(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_intersect_keys

    want = con.execute("""
        SELECT DISTINCT o_custkey AS c_custkey FROM orders
        WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
        INTERSECT
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        ORDER BY c_custkey""").df()
    got = q_intersect_keys(SF)
    assert len(got) > 0
    _eq(got, want)


def test_intersect_except_partition(ray_session, con):
    """INTERSECT + EXCEPT partition year-A's key set exactly."""
    from marc_record_merge_melindautils_ray.ops.relational import (
        q_except_keys,
        q_intersect_keys,
    )

    year_a = con.execute("""
        SELECT count(DISTINCT o_custkey) FROM orders
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate < DATE '1996-01-01'""").fetchone()[0]
    inter = set(q_intersect_keys(SF)["c_custkey"])
    exc = set(q_except_keys(SF)["c_custkey"])
    assert not (inter & exc)
    assert len(inter) + len(exc) == year_a
