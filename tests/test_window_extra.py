"""Oracle-parity (DuckDB, sf0.001) for ordered string_agg, percent_rank,
and time-bucketed distinct actives."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("customer", "nation", "orders", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _eq(got: pd.DataFrame, want: pd.DataFrame):
    got = got.reset_index(drop=True)
    assert got.shape == want.shape, (got.shape, want.shape)
    for c in want.columns:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c


def test_segments_per_nation(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_segments_per_nation

    want = con.execute("""
        SELECT n_name,
               string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""").df()
    _eq(q_segments_per_nation(SF), want)


def test_percent_rank_orders(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_percent_rank_orders

    want = con.execute("""
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice*100,0) AS BIGINT) AS price_c,
               CAST(round(percent_rank() OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(round(o_totalprice*100,0) AS BIGINT), o_orderkey)
                   * 1000000, 0) AS BIGINT) AS pr_e6
        FROM orders ORDER BY o_custkey, price_c, o_orderkey""").df()
    got = q_percent_rank_orders(SF)
    # singleton customer groups must rank 0, extremes 0 and 1e6
    assert got["pr_e6"].min() == 0
    assert got["pr_e6"].max() == 1_000_000
    _eq(got, want)


def test_daily_active_users(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_daily_active_users

    want = con.execute("""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1 ORDER BY 1""").df()
    got = q_daily_active_users(SF)
    assert len(got) > 1  # multiple day buckets at this sf
    _eq(got, want)


def test_hopping_window_oracle(ray_session):
    """60-min windows hopping every 15 min vs the DuckDB window-expansion
    oracle, plus the coverage invariant sum(window counts) == 4 × events."""
    import duckdb

    from marc_record_merge_melindautils_ray.ops.relational import q_hopping_window

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    want = con.execute("""
        SELECT CAST(epoch_us(ts) // 900000000 - off AS BIGINT) AS window_start_slot,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents
        FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS off) offs
        GROUP BY 1 ORDER BY 1""").df()
    got = q_hopping_window(sf)
    assert got.shape == want.shape
    for c in want.columns:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c
    n_events = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert int(got["n_events"].sum()) == 4 * n_events


def test_ntile_orders(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_ntile_orders

    want = con.execute("""
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice*100,0) AS BIGINT) AS price_c,
               CAST(ntile(4) OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(round(o_totalprice*100,0) AS BIGINT), o_orderkey)
                   AS BIGINT) AS tile
        FROM orders ORDER BY o_custkey, price_c, o_orderkey""").df()
    got = q_ntile_orders(SF)
    assert set(got["tile"].unique()) <= {1, 2, 3, 4}
    _eq(got, want)


def test_ntile_uneven_partition(ray_session, con):
    # 4 buckets over a 6-row partition: depths 2,2,1,1 — the n%b rule
    from marc_record_merge_melindautils_ray.ops.relational import q_ntile_orders

    got = q_ntile_orders(SF)
    sizes = got.groupby(["o_custkey", "tile"]).size().groupby("o_custkey")
    for cust, s in sizes:
        assert s.max() - s.min() <= 1  # equal-depth within ±1


def test_cume_dist_orders(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_cume_dist_orders

    want = con.execute("""
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice*100,0) AS BIGINT) AS price_c,
               CAST(count(*) OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(round(o_totalprice*100,0) AS BIGINT))
                   AS BIGINT) AS cd_num,
               CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_part
        FROM orders ORDER BY o_custkey, price_c, o_orderkey""").df()
    got = q_cume_dist_orders(SF)
    # last row of every partition has cume_dist exactly 1
    last = got.groupby("o_custkey").tail(1)
    assert (last["cd_num"] == last["n_part"]).all()
    _eq(got, want)


def test_moving_avg_events(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_moving_avg_events

    want = con.execute("""
        SELECT event_id, user_id,
               CAST(sum(CAST(round(value*1000000,0) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum_micro,
               CAST(count(*) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_frame
        FROM events ORDER BY event_id""").df()
    got = q_moving_avg_events(SF)
    assert (got["n_frame"] <= 3).all() and (got["n_frame"] >= 1).all()
    _eq(got, want)
