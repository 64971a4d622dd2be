"""As-of and band joins vs brute-force truth on randomized corpora
(boundary and tie cases denser than the driver tables)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, n=3000, n_users=40, span_s=600, seed=7):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, span_s * 1_000_000, size=n))
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return tbl


def test_time_band_join_matches_brute_force(ray_session, tmp_path):
    """Dense corpus (~3000 events over 10 min → many same-bucket and
    cross-bucket pairs, exact-boundary diffs): banded pass == all-pairs."""
    from marc_record_merge_melindautils_ray.ops.relational import q_time_band_join

    tbl = _write_events(tmp_path)
    got = q_time_band_join(str(tmp_path))
    ts = np.asarray(tbl["ts"]).astype("datetime64[us]").astype(np.int64)
    uid = np.asarray(tbl["user_id"])
    eid = np.asarray(tbl["event_id"])
    ii, jj = np.triu_indices(len(eid), k=1)
    keep = (np.abs(ts[ii] - ts[jj]) <= 1_000_000) & (uid[ii] != uid[jj])
    truth = set(zip(np.minimum(eid[ii[keep]], eid[jj[keep]]),
                    np.maximum(eid[ii[keep]], eid[jj[keep]])))
    assert truth, "degenerate corpus"
    assert set(zip(got["id_a"], got["id_b"])) == truth


def test_asof_join_matches_brute_force(ray_session, tmp_path):
    """As-of semantics incl. equal-date ties (max orderkey wins) and events
    with no prior order (dropped)."""
    from marc_record_merge_melindautils_ray.ops.relational import q_asof_join

    rng = np.random.default_rng(11)
    n_ev, n_ord, n_users = 1500, 400, 25
    ev_ts = rng.integers(100, 10_000, size=n_ev) * 1_000_000
    ev = pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ev_ts.astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, n_users, size=n_ev), pa.int64()),
    })
    # coarse order dates force equal-date ties within a user
    od = rng.integers(0, 100, size=n_ord) * 100 * 1_000_000
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_users, size=n_ord), pa.int64()),
        "o_orderdate": pa.array(od.astype("datetime64[us]")),
    })
    pq.write_table(ev, str(tmp_path / "events.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))

    got = q_asof_join(str(tmp_path))

    odf = orders.to_pandas()
    odf["d"] = odf["o_orderdate"].astype("int64")
    truth = {}
    by_user = {u: g.sort_values(["d", "o_orderkey"]) for u, g in odf.groupby("o_custkey")}
    for e_id, t, u in zip(np.arange(n_ev), ev_ts, np.asarray(ev["user_id"])):
        g = by_user.get(int(u))
        if g is None:
            continue
        g2 = g[g["d"] <= t]
        if not len(g2):
            continue
        truth[e_id] = int(g2.iloc[-1]["o_orderkey"])  # max date, then max key
    assert truth, "degenerate corpus"
    got_map = dict(zip(got["event_id"], got["o_orderkey"]))
    assert got_map == truth


def test_sliding_window_matches_brute_force(ray_session, tmp_path):
    from marc_record_merge_melindautils_ray.ops.relational import q_sliding_window

    rng = np.random.default_rng(3)
    n, n_users = 4000, 12
    ts = rng.integers(0, 48, size=n) * 3_600_000_000 + rng.integers(
        0, 3_600_000_000, size=n
    )
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = q_sliding_window(str(tmp_path))

    df = pd.DataFrame({"user_id": np.asarray(tbl["user_id"]),
                       "hb": ts // 3_600_000_000})
    hourly = df.groupby(["user_id", "hb"]).size().reset_index(name="n")
    rows = {}
    for (u, b), _ in hourly.set_index(["user_id", "hb"]).iterrows():
        sub = hourly[(hourly["user_id"] == u) & (hourly["hb"] >= b - 2) & (hourly["hb"] <= b)]
        rows[(u, b)] = int(sub["n"].sum())
    got_map = {(u, b): int(n) for u, b, n in
               zip(got["user_id"], got["hour_bucket"], got["n_window"])}
    assert got_map == rows


def test_left_join_order_counts_outer_rows(ray_session, tmp_path):
    """The testdata gives every customer at least one order, so pin the
    outer part (zero-fill) on a constructed corpus where it actually fires."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marc_record_merge_melindautils_ray.ops.relational import (
        q_left_join_order_counts,
    )

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_mktsegment": pa.array(["A", "B", "A", "C"], pa.string()),
    }), str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 3], pa.int64()),
        "o_totalprice": pa.array([10.0, 5.5, 2.25], pa.float64()),
    }), str(d / "orders.parquet"))
    out = q_left_join_order_counts(str(d))
    assert out["c_custkey"].tolist() == [1, 2, 3, 4]
    assert out["n_orders"].tolist() == [2, 0, 1, 0]
    assert out["total_c"].tolist() == [1550, 0, 225, 0]
