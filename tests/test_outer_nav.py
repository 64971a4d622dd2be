"""Oracle-parity (DuckDB, sf0.001) for the FULL OUTER daily-volume join and
the LEAD/LAG/FIRST_VALUE/LAST_VALUE navigation window, plus a constructed
pin for the single-event-user edge (both LAG and LEAD defaults on one row).
"""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "lineitem", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _eq(got: pd.DataFrame, want: pd.DataFrame):
    got = got.reset_index(drop=True)
    assert got.shape == want.shape, (got.shape, want.shape)
    for c in want.columns:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c


def test_full_outer_daily(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_full_outer_daily

    want = con.execute("""
        WITH o AS (
          SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
                 CAST(count(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1),
        s AS (
          SELECT strftime(date_trunc('day', l_shipdate), '%Y-%m-%d') AS day,
                 CAST(count(*) AS BIGINT) AS n_ship_lines,
                 CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
                   AS sum_qty_c
          FROM lineitem GROUP BY 1)
        SELECT coalesce(o.day, s.day) AS day,
               coalesce(o.n_orders, 0) AS n_orders,
               coalesce(s.n_ship_lines, 0) AS n_ship_lines,
               coalesce(s.sum_qty_c, 0) AS sum_qty_c
        FROM o FULL OUTER JOIN s ON o.day = s.day ORDER BY 1""").df()
    got = q_full_outer_daily(SF)
    # both outer sides must actually fire on the testdata
    assert (got["n_orders"] == 0).any() and (got["n_ship_lines"] == 0).any()
    _eq(got, want)


def test_lead_lag_events(ray_session, con):
    from marc_record_merge_melindautils_ray.ops.relational import q_lead_lag_events

    want = con.execute("""
        SELECT event_id, user_id,
               coalesce(lag(event_type) OVER w, '-') AS prev_type,
               coalesce(lead(event_type) OVER w, '-') AS next_type,
               first_value(event_type) OVER w AS first_type,
               last_value(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS last_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id""").df()
    _eq(q_lead_lag_events(SF), want)


def test_lead_lag_single_event_user(ray_session, tmp_path):
    """A one-event user gets '-' for BOTH lag and lead, and is its own
    first/last; ts ties break on event_id."""
    from marc_record_merge_melindautils_ray.ops.relational import q_lead_lag_events

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [7, 7, 7, 9],
        "ts": [t0, t0, t0 + pd.Timedelta(minutes=1), t0],  # 1,2 tie on ts
        "event_type": ["a", "b", "c", "solo"],
    })
    df.to_parquet(tmp_path / "events.parquet")
    got = q_lead_lag_events(str(tmp_path)).set_index("event_id")
    assert got.loc[4].tolist() == [9, "-", "-", "solo", "solo"]
    assert got.loc[1].tolist() == [7, "-", "b", "a", "c"]   # tie: id 1 first
    assert got.loc[2].tolist() == [7, "a", "c", "a", "c"]
    assert got.loc[3].tolist() == [7, "b", "-", "a", "c"]
