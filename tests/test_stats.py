"""Oracle-parity (DuckDB, sf0.001) + edge-semantics tests for the
statistical/profiling operators (ops/stats.py) and the new multi-table
join/set operators (ops/relational.py)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation", "region", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _eq(got, want):
    got = got.reset_index(drop=True)
    assert got.shape == want.shape, (got.shape, want.shape)
    for c in want.columns:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c


def test_group_corr(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.stats import q_group_corr

    want = con.execute("""
        SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 6)
            AS corr_qty_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""").df()
    _eq(q_group_corr(SF), want)


def test_value_histogram(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.stats import q_value_histogram

    want = con.execute("""
        SELECT CAST(floor(value/100.0) AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1 ORDER BY 1""").df()
    _eq(q_value_histogram(SF), want)


def test_mode_event_type_tie_break(ray_session):
    """Ties resolve to the lexicographically smallest type — verified on a
    constructed corpus where user 1 has a 2-2 tie."""
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops import stats

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2, 2],
        "event_type": ["view", "view", "click", "click", "view", "view", "click"],
    })
    orig = stats._read
    try:
        stats._read = lambda sf, t, cols: rd.from_pandas(df[cols])
        out = stats.q_mode_event_type("ignored")
    finally:
        stats._read = orig
    assert out["mode_event_type"].tolist() == ["click", "view"]  # tie → asc
    assert out["n"].tolist() == [2, 2]


def test_event_deltas_single_event_user(ray_session):
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops import stats

    df = pd.DataFrame({
        "user_id": [7, 5, 5, 5],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:00:00",
            "2024-01-01 00:00:10", "2024-01-01 00:00:13",
        ]),
    })
    orig = stats._read
    try:
        stats._read = lambda sf, t, cols: rd.from_pandas(df[cols])
        out = stats.q_event_deltas("ignored")
    finally:
        stats._read = orig
    assert out.loc[out["user_id"] == 7, "n_gaps"].item() == 0
    assert out.loc[out["user_id"] == 7, "max_gap_us"].item() == 0
    assert out.loc[out["user_id"] == 5, "n_gaps"].item() == 2
    assert out.loc[out["user_id"] == 5, "sum_gap_us"].item() == 13_000_000
    assert out.loc[out["user_id"] == 5, "max_gap_us"].item() == 10_000_000


def test_event_deltas_oracle(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.stats import q_event_deltas

    want = con.execute("""
        SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps,
               CAST(coalesce(sum(gap), 0) AS BIGINT) AS sum_gap_us,
               CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_us
        FROM (SELECT user_id,
                     CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (
                         PARTITION BY user_id ORDER BY ts)) AS BIGINT) AS gap
              FROM events)
        GROUP BY user_id ORDER BY user_id""").df()
    _eq(q_event_deltas(SF), want)


def test_left_join_counts_zero_order_customers(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_left_join_counts

    got = q_left_join_counts(SF)
    want = con.execute("""
        SELECT c.c_custkey, c.c_name, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
               CAST(coalesce(sum(CAST(round(o.o_totalprice*100,0) AS BIGINT)),0) AS BIGINT)
                   AS sum_total_cents
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name ORDER BY c.c_custkey""").df()
    _eq(got, want)


def test_left_join_counts_outer_semantics(ray_session):
    """A customer with no orders must surface with zero counts (the
    left_outer join path — the sf fixtures have no such customer)."""
    import ray.data as rd

    from marc_record_merge_melindautils_ray.ops import relational

    tables = {
        "customer": pd.DataFrame({
            "c_custkey": [1, 2, 3], "c_name": ["a", "b", "c"],
        }),
        "orders": pd.DataFrame({
            "o_custkey": [1, 1, 3], "o_totalprice": [10.0, 5.5, 2.25],
        }),
    }
    orig = relational._read
    try:
        relational._read = lambda sf, t, cols: rd.from_pandas(tables[t][cols])
        out = relational.q_left_join_counts("ignored")
    finally:
        relational._read = orig
    assert out["c_custkey"].tolist() == [1, 2, 3]
    assert out["n_orders"].tolist() == [2, 0, 1]
    assert out["sum_total_cents"].tolist() == [1550, 0, 225]


def test_q5_region_revenue(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q5_region_revenue

    want = con.execute("""
        SELECT r.r_name,
               CAST(sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*10000,0)
                   AS BIGINT)) AS BIGINT) AS rev_e4
        FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
        JOIN customer c ON o.o_custkey=c.c_custkey
        JOIN nation n ON c.c_nationkey=n.n_nationkey
        JOIN region r ON n.n_regionkey=r.r_regionkey
        WHERE o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1997-01-01'
        GROUP BY r.r_name ORDER BY r.r_name""").df()
    _eq(q5_region_revenue(SF), want)


def test_q3_shipping_priority(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q3_shipping_priority

    want = con.execute("""
        SELECT l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
               CAST(sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*10000,0)
                   AS BIGINT)) AS BIGINT) AS revenue_e4
        FROM customer c JOIN orders o ON o.o_custkey=c.c_custkey
        JOIN lineitem l ON l.l_orderkey=o.o_orderkey
        WHERE c.c_mktsegment='BUILDING' AND o.o_orderdate < DATE '1996-06-30'
          AND l.l_shipdate > TIMESTAMP '1996-06-30'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue_e4 DESC, l.l_orderkey LIMIT 10""").df()
    _eq(q3_shipping_priority(SF), want)


def test_except_keys(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_except_keys

    want = con.execute("""
        SELECT DISTINCT o_custkey AS c_custkey FROM orders
        WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
        EXCEPT
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        ORDER BY c_custkey""").df()
    _eq(q_except_keys(SF), want)


def test_group_corr_zero_variance_is_null(ray_session, tmp_path):
    """A constant-valued group (and a singleton group) must yield NULL like
    SQL corr(), not a divide-by-zero NaN warning or a garbage value."""
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.stats import q_group_corr

    df = pd.DataFrame({
        "l_returnflag": ["C", "C", "C", "S", "V", "V", "V"],
        "l_quantity":   [5.0, 5.0, 5.0, 1.0, 1.0, 2.0, 3.0],
        "l_extendedprice": [10.0, 20.0, 30.0, 9.0, 10.0, 20.0, 30.0],
    })
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "lineitem.parquet")
    got = q_group_corr(str(tmp_path))
    want = duckdb.connect().execute(
        "SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 6)"
        " AS corr_qty_price FROM read_parquet(?) GROUP BY l_returnflag"
        " ORDER BY l_returnflag", [str(tmp_path / "lineitem.parquet")]).df()
    assert got["l_returnflag"].tolist() == ["C", "S", "V"]
    # constant group C and singleton S: NULL on both sides; V: exact corr
    assert np.isnan(got["corr_qty_price"].iloc[0]) and pd.isna(want["corr_qty_price"].iloc[0])
    assert np.isnan(got["corr_qty_price"].iloc[1]) and pd.isna(want["corr_qty_price"].iloc[1])
    assert got["corr_qty_price"].iloc[2] == want["corr_qty_price"].iloc[2]


def test_value_histogram_null_values_excluded(ray_session, tmp_path):
    """NULL event values are excluded on both sides (the oracle filters
    value IS NOT NULL); floor(NaN)->int64 must never fabricate a bucket."""
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.stats import q_value_histogram

    t = pa.table({"value": pa.array([5.0, None, 150.0, None, -20.0], pa.float64())})
    pq.write_table(t, tmp_path / "events.parquet")
    got = q_value_histogram(str(tmp_path))
    assert got["bucket"].tolist() == [-1, 0, 1]
    assert got["n"].tolist() == [1, 1, 1]


def test_column_profile_counts_nulls(ray_session, tmp_path):
    """The testdata orders columns carry no nulls, so pin the null/distinct
    accounting on a constructed table."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.stats import q_column_profile

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "o_orderpriority": pa.array(["1-URGENT", None, "1-URGENT", "2-HIGH"],
                                    pa.string()),
        "o_orderstatus": pa.array([None, None, "F", "O"], pa.string()),
        "o_custkey": pa.array([7, 7, 8, None], pa.int64()),
    }), str(d / "orders.parquet"))
    out = q_column_profile(str(d)).set_index("col")
    assert out.loc["o_orderpriority", "n_rows"] == 4
    assert out.loc["o_orderpriority", "n_nulls"] == 1
    assert out.loc["o_orderpriority", "n_distinct"] == 2
    assert out.loc["o_orderpriority", "top_value"] == "1-URGENT"
    assert out.loc["o_orderpriority", "top_count"] == 2
    assert out.loc["o_orderstatus", "n_nulls"] == 2
    assert out.loc["o_custkey", "top_value"] == "7"


def test_funnel_counts_strict_after(ray_session, tmp_path):
    """Funnel cascade semantics pinned on a corpus the testdata can't
    exercise (there every user saturates every stage): a click BEFORE the
    first signup doesn't count; a purchase between signup and the first
    qualifying click doesn't count; ties (equal timestamps) are excluded by
    the strict inequality."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.stats import q_funnel_counts

    def ev(eid, us, uid, typ):
        return (eid, np.datetime64(us, "us"), uid, typ)

    rows = [
        # user 1: full funnel in order
        ev(0, 1000, 1, "signup"), ev(1, 2000, 1, "click"),
        ev(2, 3000, 1, "purchase"),
        # user 2: click precedes its only signup → stalls at stage 1
        ev(3, 2000, 2, "click"), ev(4, 5000, 2, "signup"),
        # user 3: purchase at 1500 is BEFORE its first valid click (2000) →
        # stalls at stage 2
        ev(5, 1000, 3, "signup"), ev(6, 1500, 3, "purchase"),
        ev(7, 2000, 3, "click"),
        # user 4: click ties the signup timestamp → strict > excludes it
        ev(8, 1000, 4, "signup"), ev(9, 1000, 4, "click"),
        # user 5: no signup at all → never enters
        ev(10, 100, 5, "click"), ev(11, 200, 5, "purchase"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_funnel_counts(str(tmp_path))
    assert out.n_users.tolist() == [4, 2, 1]


def test_retention_cohorts_constructed(ray_session, tmp_path):
    """Multi-cohort retention pinned: several events on one day count the
    user once; offsets beyond the cap drop; separate cohorts don't mix."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.stats import q_retention_cohorts

    day = 86_400_000_000  # us
    rows = [
        # user 1: cohort day0, returns day1 twice (counts once) and day9 (cap)
        (0, 0, 1), (1, day + 5, 1), (2, day + 99, 1), (3, 9 * day, 1),
        # user 2: same cohort, active day0 only
        (4, 50, 2),
        # user 3: cohort day1, returns day3
        (5, day + 1, 3), (6, 3 * day + 7, 3),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([np.datetime64(r[1], "us") for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["click"] * len(rows), pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_retention_cohorts(str(tmp_path), max_offset=7)
    got = {(r.cohort_day, r.day_offset): r.n_users for r in out.itertuples()}
    assert got == {
        ("1970-01-01", 0): 2, ("1970-01-01", 1): 1,
        ("1970-01-02", 0): 1, ("1970-01-02", 2): 1,
    }


def test_value_outliers_integer_identity(ray_session, tmp_path):
    """The integer inequality (n·c − S)² > 9·(n·Q − S²) is exactly
    |x − μ| > 3σ (population σ): a planted spike is flagged, in-band
    values are not, and a zero-variance group flags nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.stats import q_value_outliers

    vals = [10.0] * 20 + [10.5] + [200.0]          # spike in 'a'
    types = ["a"] * len(vals) + ["b"] * 5          # 'b' is constant
    vals += [7.77] * 5
    t = pa.table({
        "event_id": pa.array(np.arange(len(vals)), pa.int64()),
        "ts": pa.array([np.datetime64(i, "us") for i in range(len(vals))],
                       pa.timestamp("us")),
        "user_id": pa.array(np.zeros(len(vals), np.int64), pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * len(vals), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_value_outliers(str(tmp_path))
    assert out.event_id.tolist() == [21]           # only the 200.0 spike
    assert out.iloc[0].value_c == 20000
    # numpy float reference agrees on the planted corpus
    a = np.round(np.array(vals[:22]) * 100)
    mu, sd = a.mean(), a.std()
    assert (np.abs(a - mu) > 3 * sd).nonzero()[0].tolist() == [21]


def test_expectations_check_null_semantics(ray_session, tmp_path):
    """NULLs violate every rule they appear in (pandas ~(NaN>0) == True
    mirrors the SQL IS NULL arm); a fully clean corpus reports all
    zeros."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.stats import q_expectations_check

    t = pa.table({
        "o_orderkey": pa.array([1, 2, None, 4], pa.int64()),
        "o_custkey": pa.array([5, 0, 7, None], pa.int64()),
        "o_orderstatus": pa.array(["F", "X", None, "O"], pa.string()),
        "o_totalprice": pa.array([10.0, -1.0, None, 1e7], pa.float64()),
        "o_orderdate": pa.array(
            [np.datetime64("1995-06-01", "us"),
             np.datetime64("1991-01-01", "us"),
             np.datetime64("2001-01-01", "us"), None], pa.timestamp("us")),
        "o_orderpriority": pa.array(
            ["1-URGENT", "9-BOGUS", "nope", None], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    got = q_expectations_check(str(tmp_path)).set_index("rule")["violations"]
    assert got["orderkey_not_null"] == 1
    assert got["custkey_positive"] == 2      # 0 and NULL
    assert got["status_in_domain"] == 2      # X and NULL
    assert got["totalprice_range"] == 3      # -1, NULL, 1e7
    assert got["priority_format"] == 3       # 9-BOGUS, nope, NULL
    assert got["date_in_window"] == 3        # 1991, 2001, NULL
