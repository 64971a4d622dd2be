"""Generic relational operators over the driver's TPC-H-ish parquet tables.

Each ``q_*`` function takes ``sf_dir`` and returns a Dataset/Table whose
column names match the paired oracle SQL in ``__ray_entry__.oracle_sql``
exactly.  Monetary/float aggregates are computed as integer cents/centi-units
(both sides apply the same rounding before summation) so value-hash
comparison is immune to floating-point summation-order differences.

Reads prune columns at the source (``read_parquet(columns=[...])``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from marc_record_merge_melindautils_ray.functions.util import sorted_membership, task_stage
from marc_record_merge_melindautils_ray.stages.cluster import actor_pool_size


def _read(sf_dir: str, table: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(arr: np.ndarray, scale: int = 100) -> np.ndarray:
    return np.round(np.asarray(arr, dtype=np.float64) * scale).astype(np.int64)


# ---------------------------------------------------------------- filter/map
def q_filter_project(sf_dir: str) -> rd.Dataset:
    """Filter + computed column + projection (vectorized Arrow kernels)."""
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate"])

    def kern(t: pa.Table) -> pa.Table:
        keep = pc.less(t["l_shipdate"], pa.scalar(np.datetime64("1998-01-01", "us")))
        t = t.filter(keep)
        price = np.asarray(t["l_extendedprice"], dtype=np.float64)
        disc = np.asarray(t["l_discount"], dtype=np.float64)
        rev = np.round(price * (1.0 - disc) * 10000.0).astype(np.int64)
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "revenue_e4": pa.array(rev, pa.int64()),
        })

    return ds.map_batches(kern, batch_format="pyarrow")


# --------------------------------------------------------------- aggregation
def q_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-style grouped aggregate with per-batch partial aggregation
    before the (tiny) groupby shuffle — the combiner pattern."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pd.DataFrame:
        keep = pc.less_equal(t["l_shipdate"], pa.scalar(np.datetime64("2000-09-02", "us")))
        t = t.filter(keep)
        df = pd.DataFrame({
            "l_returnflag": t["l_returnflag"].to_pandas(),
            "l_linestatus": t["l_linestatus"].to_pandas(),
            "sum_qty": np.asarray(t["l_quantity"], dtype=np.float64).astype(np.int64),
            "sum_base_cents": _cents(np.asarray(t["l_extendedprice"])),
            "sum_disc_e4": np.round(
                np.asarray(t["l_extendedprice"], dtype=np.float64)
                * (1.0 - np.asarray(t["l_discount"], dtype=np.float64)) * 10000.0
            ).astype(np.int64),
            "count_order": np.ones(len(t), dtype=np.int64),
        })
        return df.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .sum(["sum_qty", "sum_base_cents", "sum_disc_e4", "count_order"])
        .to_pandas()
    )
    out.columns = ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents",
                   "sum_disc_e4", "count_order"]
    return out


def q_events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling-window aggregate over the event stream table: per (user,
    hour) count + value sum — windows as grouped aggregation over the
    partitioned log (Ray Data has no event-time windows; this is the
    documented batch expression of a tumbling window)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = np.asarray(t["ts"]).astype("datetime64[us]").astype(np.int64)
        hour = ts // (3600 * 1_000_000)
        df = pd.DataFrame({
            "user_id": np.asarray(t["user_id"]),
            "hour_bucket": hour,
            "n_events": np.ones(len(t), dtype=np.int64),
            "sum_value_cents": _cents(np.asarray(t["value"])),
        })
        return df.groupby(["user_id", "hour_bucket"], as_index=False).sum()

    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64
    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    # the shuffled rows are post-combiner PARTIALS (≈ distinct keys per
    # batch), far smaller than the input — size the fan-out to that, not to a
    # frozen constant
    nparts = adaptive_parts(ds.count(), rows_per_part=50_000, hi=128)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64).view(np.uint64)
        df["part"] = (splitmix64(u) % np.uint64(nparts)).astype(np.int64)
        return df

    def sum_part(g: pd.DataFrame) -> pd.DataFrame:
        # hash(user) co-locates every (user, hour) partial → one vectorized
        # groupby-sum per partition IS the global aggregate (the
        # partition-then-vectorize pattern; measured ~5x the native
        # multi-column groupby.aggregate at 10^5-key cardinality)
        return g.groupby(["user_id", "hour_bucket"], as_index=False)[
            ["n_events", "sum_value_cents"]
        ].sum()

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(sum_part, batch_format="pandas")
        .to_pandas()
    )
    return out.drop(columns=["part"], errors="ignore")


def q_sessionize(sf_dir: str, gap_us: int = 1_800_000_000) -> pd.DataFrame:
    """Sessionization (30-min-gap sessions per user) — the stateful windowed
    operator Ray Data lacks natively, expressed as hash-partition-by-user →
    ONE vectorized kernel per partition (sort, gap scan, cumsum session ids).
    The partitioning invariant it relies on: all events of a user land in one
    partition (hash on user_id)."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64

    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    nparts = adaptive_parts(ds.count())

    def add_part(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"], np.int64).view(np.uint64)
        part = (splitmix64(u) % np.uint64(nparts)).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    def sess_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy()
        if len(g) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "session_idx": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64),
                "start_us": pd.Series([], dtype=np.int64),
            })
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap = np.r_[np.int64(0), us[1:] - us[:-1]]
        brk = new_user | (gap > gap_us)
        sess_global = np.cumsum(brk)
        first_idx = np.flatnonzero(new_user)
        base = np.repeat(
            sess_global[first_idx], np.diff(np.r_[first_idx, len(uid)])
        )
        sidx = (sess_global - base + 1).astype(np.int64)
        df = pd.DataFrame({"user_id": uid, "session_idx": sidx, "us": us})
        return df.groupby(["user_id", "session_idx"], as_index=False).agg(
            n_events=("us", "size"), start_us=("us", "min")
        )

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sess_partition, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["user_id", "session_idx"]).reset_index(drop=True)


# --------------------------------------------------------------------- joins
def q_join_broadcast(sf_dir: str) -> pd.DataFrame:
    """orders ⨝ customer (hash join — customer scales with sf, so it is NOT
    broadcast) ⨝ nation (25 rows — the legitimate broadcast side, shipped
    once via ray.put), then per-batch partial aggregation before the tiny
    final groupby (SURVEY.md §2.7 joins/lookups).

    Scale shape: only the genuinely-bounded dimension table is a driver-side
    broadcast; the fact⨝dimension join on the growing side is a distributed
    ``Dataset.join`` hash shuffle."""
    import ray

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n2name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    ref = ray.put(n2name)

    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    # join fan-out tracks the probe side (metadata-cheap parquet row count) —
    # a fixed partition count starves the join on a bigger cluster/corpus
    joined = orders.join(
        cust, join_type="inner",
        num_partitions=adaptive_parts(orders.count(), rows_per_part=250_000),
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def kern(t: pa.Table) -> pd.DataFrame:
        from marc_record_merge_melindautils_ray.functions.util import maybe_get

        n2name_ = maybe_get(ref)
        nk = np.asarray(t["c_nationkey"])
        names = np.array([n2name_.get(int(k)) for k in nk], dtype=object)
        df = pd.DataFrame({
            "n_name": names,
            "n_orders": np.ones(len(t), dtype=np.int64),
            "sum_total_cents": _cents(np.asarray(t["o_totalprice"])),
        })
        return df.groupby("n_name", as_index=False).sum()

    out = (
        joined.map_batches(kern, batch_format="pyarrow")
        .groupby("n_name")
        .sum(["n_orders", "sum_total_cents"])
        .to_pandas()
    )
    out.columns = ["n_name", "n_orders", "sum_total_cents"]
    return out


def q_join_hash(sf_dir: str) -> pd.DataFrame:
    """lineitem ⨝ orders, both sides large → Dataset.join (hash shuffle on
    the key), then grouped aggregate."""
    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = li.join(
        orders, join_type="inner",
        num_partitions=adaptive_parts(li.count(), rows_per_part=250_000),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "o_orderpriority": t["o_orderpriority"].to_pandas(),
            "n_lines": np.ones(len(t), dtype=np.int64),
            "sum_qty": np.asarray(t["l_quantity"], dtype=np.float64).astype(np.int64),
        })
        return df.groupby("o_orderpriority", as_index=False).sum()

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .sum(["n_lines", "sum_qty"])
        .to_pandas()
    )
    out.columns = ["o_orderpriority", "n_lines", "sum_qty"]
    return out


def q_anti_join(sf_dir: str) -> pd.DataFrame:
    """Customers with no finished ('F') orders — ANTI-join as a broadcast key-set filter
    (ship the key set once via ray.put; Bloom filter at scale), no shuffle
    (SURVEY.md §2.7 semi/anti joins)."""
    import ray

    from marc_record_merge_melindautils_ray.functions.util import maybe_get

    # distinct 'F' customer keys computed IN RAY (per-batch filter+unique →
    # tiny distinct groupby); the fact table never lands on the driver —
    # the driver only holds the materialized key blocks' ObjectRefs
    def f_keys(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["o_orderstatus"], "F")
        return pa.table({"k": pc.unique(t.filter(keep)["o_custkey"].combine_chunks())})

    keys_ds = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
        .map_batches(f_keys, batch_format="pyarrow")
        .groupby("k")
        .count()
        .materialize()
    )
    key_refs = keys_ds.to_arrow_refs()

    class AntiFilter:
        def __init__(self, refs):
            parts = []
            for r in refs:
                t = maybe_get(r)
                if len(t) and "k" in t.column_names:
                    parts.append(t["k"].combine_chunks() if isinstance(t["k"], pa.ChunkedArray) else t["k"])
            self.keys = pa.concat_arrays(parts) if parts else pa.array([], pa.int64())

        def __call__(self, t: pa.Table) -> pa.Table:
            keep = pc.invert(pc.is_in(t["c_custkey"], value_set=self.keys))
            return t.filter(keep).select(["c_custkey", "c_name"])

    out = (
        _read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(task_stage(AntiFilter, (key_refs,), key=("anti", *key_refs)),
                     batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty:  # all keys matched: empty result still needs its schema
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype=np.int64),
                            "c_name": pd.Series([], dtype=object)})
    return out.sort_values("c_custkey").reset_index(drop=True)


# --------------------------------------------------------- sort/limit/distinct
def q_top_orders(sf_dir: str) -> pd.DataFrame:
    """Global top-10 by price: per-batch local top-k, then one tiny final
    sort — never a full global sort."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def local_topk(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "o_orderkey": np.asarray(t["o_orderkey"]),
            "total_cents": _cents(np.asarray(t["o_totalprice"])),
        })
        return df.sort_values(["total_cents", "o_orderkey"], ascending=[False, True]).head(10)

    parts = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    return (
        parts.sort_values(["total_cents", "o_orderkey"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )


def q_distinct_flags(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    out = (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .count()
        .to_pandas()[["l_returnflag", "l_linestatus"]]
    )
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


# ------------------------------------------------------------------ exact dedup
def q_exact_dedup_lineitem(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: hash-partition by key, keep the first (minimum) row per
    group — the ``groupby(key).first`` pattern over (partkey, suppkey).

    Physical shape is partition-then-vectorize (`stages.candidates`): rows
    re-key to ``part = mix(key) % P`` and ONE pandas groupby runs per
    partition — measured 5× faster than Ray's native per-key sort aggregate
    on this high-cardinality key (600 k keys at sf0.1: 5.6 s → 1.1 s),
    because P UDF calls replace a full sort-based exchange."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64
    from marc_record_merge_melindautils_ray.stages.cluster import (
        adaptive_parts,
        cluster_parallelism,
    )

    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_orderkey"])
    nparts = adaptive_parts(
        ds.count(), rows_per_part=100_000, lo=max(8, 2 * cluster_parallelism()),
        hi=512,
    )

    def add_part(t: pa.Table) -> pa.Table:
        k = (
            np.asarray(t["l_partkey"], np.int64).view(np.uint64)
            * np.uint64(1000003)
            ^ np.asarray(t["l_suppkey"], np.int64).view(np.uint64)
        )
        with np.errstate(over="ignore"):
            part = (splitmix64(k) % np.uint64(nparts)).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["l_partkey", "l_suppkey"], as_index=False).agg(
            first_orderkey=("l_orderkey", "min"), n_dups=("l_orderkey", "size")
        )

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(agg, batch_format="pandas")
        .to_pandas()
    )
    return out[["l_partkey", "l_suppkey", "first_orderkey", "n_dups"]]


def q_sliding_window(sf_dir: str, window_hours: int = 3) -> pd.DataFrame:
    """SLIDING-window aggregate: per (user, hour), the event count over the
    trailing ``window_hours`` hour buckets — the windowed-aggregate operator
    Ray Data lacks natively, expressed as partial hourly counts →
    hash-partition by user → ONE vectorized trailing-sum kernel per
    partition (sort + per-user searchsorted over bucket indexes).  The
    partitioning invariant: all hourly rows of a user co-locate."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64
    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    nparts = adaptive_parts(ds.count())

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = np.asarray(t["ts"]).astype("datetime64[us]").astype(np.int64)
        hour = ts // (3600 * 1_000_000)
        df = pd.DataFrame({
            "user_id": np.asarray(t["user_id"]),
            "hour_bucket": hour,
            "n": np.ones(len(t), dtype=np.int64),
        })
        out = df.groupby(["user_id", "hour_bucket"], as_index=False).sum()
        u = out["user_id"].to_numpy().astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            out["part"] = (splitmix64(u) % np.uint64(nparts)).astype(np.int64)
        return out

    def trailing(g: pd.DataFrame) -> pd.DataFrame:
        # combine partial counts, then per user: for each bucket b, sum of
        # counts in (b - window, b] via prefix sums + searchsorted
        g = g.groupby(["user_id", "hour_bucket"], as_index=False)["n"].sum()
        g = g.sort_values(["user_id", "hour_bucket"]).reset_index(drop=True)
        if not len(g):
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "hour_bucket": pd.Series([], dtype=np.int64),
                                 "n_window": pd.Series([], dtype=np.int64)})
        uid = g["user_id"].to_numpy()
        hb = g["hour_bucket"].to_numpy()
        n = g["n"].to_numpy()
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(g)]
        out = np.empty(len(g), np.int64)
        for s, e in zip(starts, ends):
            h = hb[s:e]
            csum = np.r_[0, np.cumsum(n[s:e])]
            lo = np.searchsorted(h, h - window_hours + 1, side="left")
            out[s:e] = csum[np.arange(1, e - s + 1)] - csum[lo]
        return pd.DataFrame({"user_id": uid, "hour_bucket": hb, "n_window": out})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(trailing, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["user_id", "hour_bucket"]).reset_index(drop=True)


def q_top_orders_per_cust(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-group top-k (the ROW_NUMBER window pattern): each customer's k
    highest-price orders with their rank — hash-partition by customer →
    ONE vectorized rank kernel per partition (lexsort + per-group position),
    never a global sort."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64
    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    nparts = adaptive_parts(ds.count())

    def add_part(t: pa.Table) -> pa.Table:
        u = np.asarray(t["o_custkey"], np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            part = (splitmix64(u) % np.uint64(nparts)).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"o_custkey": pd.Series([], dtype=np.int64),
                                 "o_orderkey": pd.Series([], dtype=np.int64),
                                 "total_cents": pd.Series([], dtype=np.int64),
                                 "rnk": pd.Series([], dtype=np.int64)})
        cust = g["o_custkey"].to_numpy()
        okey = g["o_orderkey"].to_numpy()
        cents = _cents(g["o_totalprice"].to_numpy())
        # deterministic rank order: price desc, orderkey asc within customer
        order = np.lexsort((okey, -cents, cust))
        cust, okey, cents = cust[order], okey[order], cents[order]
        starts = np.flatnonzero(np.r_[True, cust[1:] != cust[:-1]])
        pos = np.arange(len(cust)) - np.repeat(starts, np.diff(np.r_[starts, len(cust)]))
        keep = pos < k
        return pd.DataFrame({
            "o_custkey": cust[keep], "o_orderkey": okey[keep],
            "total_cents": cents[keep], "rnk": pos[keep] + 1,
        })

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(topk, batch_format="pandas")
        .to_pandas()
    )
    return (
        out.astype(np.int64)
        .sort_values(["o_custkey", "rnk"])
        .reset_index(drop=True)
    )


def q_asof_join(sf_dir: str) -> pd.DataFrame:
    """AS-OF join (an operator Ray Data lacks natively): each event matched
    to its user's MOST RECENT order at event time (``o_orderdate <= ts``;
    ties broken by highest orderkey).  Both sides hash-partition on the user
    key and ride ONE shuffle as role-tagged rows; the per-partition kernel
    boundary-scans users and runs one vectorized ``searchsorted`` per user
    segment — the documented partitioning invariant: all rows of a user
    co-locate."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64
    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    nparts = adaptive_parts(ev.count() + orders.count())

    def tag_events(t: pa.Table) -> pa.Table:
        ts = np.asarray(t["ts"]).astype("datetime64[us]").astype(np.int64)
        u = np.asarray(t["user_id"], np.int64)
        with np.errstate(over="ignore"):
            part = (splitmix64(u.view(np.uint64)) % np.uint64(nparts)).astype(np.int64)
        return pa.table({
            "part": pa.array(part, pa.int64()),
            "uid": pa.array(u, pa.int64()),
            "t_us": pa.array(ts, pa.int64()),
            "row_id": t["event_id"],
            "role": pa.array(np.ones(len(t), np.int8)),
        })

    def tag_orders(t: pa.Table) -> pa.Table:
        d = np.asarray(t["o_orderdate"]).astype("datetime64[us]").astype(np.int64)
        u = np.asarray(t["o_custkey"], np.int64)
        with np.errstate(over="ignore"):
            part = (splitmix64(u.view(np.uint64)) % np.uint64(nparts)).astype(np.int64)
        return pa.table({
            "part": pa.array(part, pa.int64()),
            "uid": pa.array(u, pa.int64()),
            "t_us": pa.array(d, pa.int64()),
            "row_id": t["o_orderkey"],
            "role": pa.array(np.zeros(len(t), np.int8)),
        })

    def asof_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                              "o_orderkey": pd.Series([], dtype=np.int64)})
        if not len(g):
            return empty
        role = g["role"].to_numpy()
        e = g[role == 1].sort_values(["uid", "t_us", "row_id"])
        # orders sorted by (uid, date, orderkey): the LAST entry <= ts has
        # the max date, and max orderkey within equal dates
        o = g[role == 0].sort_values(["uid", "t_us", "row_id"])
        if not len(e) or not len(o):
            return empty
        eu, et, eid = (e[c].to_numpy() for c in ("uid", "t_us", "row_id"))
        ou, ot, oid = (o[c].to_numpy() for c in ("uid", "t_us", "row_id"))
        out_e, out_o = [], []
        e_starts = np.flatnonzero(np.r_[True, eu[1:] != eu[:-1]])
        e_ends = np.r_[e_starts[1:], len(eu)]
        for s, epos in zip(e_starts, e_ends):
            u = eu[s]
            lo = np.searchsorted(ou, u, "left")
            hi = np.searchsorted(ou, u, "right")
            if lo == hi:
                continue
            pos = np.searchsorted(ot[lo:hi], et[s:epos], "right") - 1
            ok = pos >= 0
            out_e.append(eid[s:epos][ok])
            out_o.append(oid[lo:hi][pos[ok]])
        if not out_e:
            return empty
        return pd.DataFrame({
            "event_id": np.concatenate(out_e), "o_orderkey": np.concatenate(out_o),
        })

    rows = ev.map_batches(tag_events, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )
    out = (
        rows.groupby("part")
        .map_groups(asof_partition, batch_format="pandas")
        .to_pandas()
    )
    return out.astype(np.int64).sort_values("event_id").reset_index(drop=True)


def q_time_band_join(sf_dir: str, band_us: int = 1_000_000) -> pd.DataFrame:
    """RANGE (band) join with NO equi-key: pairs of events from different
    users within ``band_us`` of each other — the banded-self-join operator
    Ray Data lacks natively.  Each event is emitted to its time bucket AND
    the next one (bucket width = band): any qualifying pair co-locates in at
    least one bucket partition (exact cover), the per-partition kernel emits
    window pairs via one sort + vectorized searchsorted, and the doubled
    coverage dedups on the pair key.  Pair count is O(matches), never
    all-pairs."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64
    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    nparts = adaptive_parts(2 * ds.count())

    def emit(t: pa.Table) -> pa.Table:
        ts = np.asarray(t["ts"]).astype("datetime64[us]").astype(np.int64)
        eid = np.asarray(t["event_id"], np.int64)
        uid = np.asarray(t["user_id"], np.int64)
        bucket = ts // band_us
        b2 = np.concatenate([bucket, bucket + 1])
        with np.errstate(over="ignore"):
            part = (splitmix64(b2.view(np.uint64)) % np.uint64(nparts)).astype(np.int64)
        return pa.table({
            "part": pa.array(part, pa.int64()),
            "bucket": pa.array(b2, pa.int64()),
            "event_id": pa.array(np.tile(eid, 2), pa.int64()),
            "user_id": pa.array(np.tile(uid, 2), pa.int64()),
            "t_us": pa.array(np.tile(ts, 2), pa.int64()),
        })

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                              "id_b": pd.Series([], dtype=np.int64)})
        if len(g) < 2:
            return empty
        g = g.sort_values(["bucket", "t_us", "event_id"]).reset_index(drop=True)
        bk = g["bucket"].to_numpy()
        ts = g["t_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        uid = g["user_id"].to_numpy()
        out_a, out_b = [], []
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        ends = np.r_[starts[1:], len(g)]
        for s, e in zip(starts, ends):
            t = ts[s:e]
            hi = np.searchsorted(t, t + band_us, "right")
            # cnt >= 0 element-wise: hi[i] counts at least the i+1 elements
            # <= t[i] in a sorted array with band_us > 0
            cnt = hi - np.arange(1, e - s + 1)
            if not cnt.any():
                continue
            ii = np.repeat(np.arange(e - s), cnt)
            jj = (
                np.arange(int(cnt.sum()))
                - np.repeat(np.cumsum(cnt) - cnt, cnt)
                + ii + 1
            )
            keep = uid[s + ii] != uid[s + jj]
            a, b = eid[s + ii[keep]], eid[s + jj[keep]]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
        if not out_a:
            return empty
        return pd.DataFrame({
            "id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b),
        }).drop_duplicates()

    out = (
        ds.map_batches(emit, batch_format="pyarrow")
        .groupby("part")
        .map_groups(band_pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                             "id_b": pd.Series([], dtype=np.int64)})
    # doubled bucket coverage → final pair dedup (result is O(matches))
    return (
        out.drop_duplicates(["id_a", "id_b"]).astype(np.int64)
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )


# ------------------------------------------------- argmax dedup / rollup / quantiles
def q_dedup_keep_best(sf_dir: str) -> pd.DataFrame:
    """Keep-best dedup: one surviving row per (lang, source) group, chosen by
    (n_chars DESC, doc_id ASC) — the relational form of the reference's
    preferred-record selection (``lib/mergeability-validators.js:69-81``
    picks the row carrying the priority property; here the priority key is
    explicit).  Per-batch partial argmax (each batch forwards at most one
    candidate row per key) → tiny final pick per group: the shuffle carries
    O(keys × batches) rows, never the corpus."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        return df.groupby(["lang", "source"], as_index=False, sort=False).head(1)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        return g.head(1)[["lang", "source", "doc_id", "n_chars"]]

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "source"])
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["lang", "source"]).reset_index(drop=True)


def q_rollup_lineitem(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): leaf aggregate via the
    pricing-summary combiner (partials per batch, tiny shuffle), then the
    two super-aggregate levels derived from the 6-row leaf table — rollup
    levels never require a second pass over the fact table."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "l_returnflag": t["l_returnflag"].to_pandas(),
            "l_linestatus": t["l_linestatus"].to_pandas(),
            "sum_qty": np.asarray(t["l_quantity"], dtype=np.float64).astype(np.int64),
            "n": np.ones(len(t), dtype=np.int64),
        })
        return df.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()

    leaf = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .sum(["sum_qty", "n"])
        .to_pandas()
    )
    leaf.columns = ["rf", "ls", "sum_qty", "n"]
    lvl1 = leaf.groupby("rf", as_index=False)[["sum_qty", "n"]].sum()
    lvl1["ls"] = "ALL"
    total = pd.DataFrame({"rf": ["ALL"], "ls": ["ALL"],
                          "sum_qty": [leaf["sum_qty"].sum()], "n": [leaf["n"].sum()]})
    out = pd.concat([leaf, lvl1, total], ignore_index=True)[["rf", "ls", "sum_qty", "n"]]
    out["sum_qty"] = out["sum_qty"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["rf", "ls"]).reset_index(drop=True)


def _weighted_quantile_cont(values: np.ndarray, counts: np.ndarray, q: float) -> float:
    """SQL ``quantile_cont`` (linear interpolation at rank (n-1)·q) from a
    (value, count) histogram — exact, without materializing the n rows."""
    o = np.argsort(values)
    v, c = values[o], counts[o]
    cum = np.cumsum(c)
    n = cum[-1]
    pos = (n - 1) * q
    lo_i = np.searchsorted(cum, np.floor(pos) + 1)
    hi_i = np.searchsorted(cum, np.floor(pos + 1) + 1) if pos != np.floor(pos) else lo_i
    frac = pos - np.floor(pos)
    return float(v[lo_i] * (1 - frac) + v[min(hi_i, len(v) - 1)] * frac)


def q_group_quantiles_exact(sf_dir: str) -> pd.DataFrame:
    """EXACT per-group median / p90 of l_quantity at combiner cost: the
    quantity domain is small-cardinality, so per-batch (group, value) counts
    shuffle O(groups × |domain|) rows and the interpolated quantiles are
    recovered exactly from the weighted histogram.  (The continuous-domain
    counterpart — bounded-error at any cardinality — is the mergeable
    ``value_quantiles`` sketch in ``ops/sketches.py``.)"""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "l_returnflag": t["l_returnflag"].to_pandas(),
            "q": np.asarray(t["l_quantity"], dtype=np.float64),
        })
        g = df.groupby(["l_returnflag", "q"], as_index=False).size()
        return g.rename(columns={"size": "c"})

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "q"])
        .sum(["c"])
        .to_pandas()
    )
    hist.columns = ["l_returnflag", "q", "c"]
    rows = []
    for rf, g in hist.groupby("l_returnflag"):
        v, c = g["q"].to_numpy(), g["c"].to_numpy()
        rows.append({
            "l_returnflag": rf,
            "median_qty_c": int(round(_weighted_quantile_cont(v, c, 0.5) * 100)),
            "p90_qty_c": int(round(_weighted_quantile_cont(v, c, 0.9) * 100)),
            "n": int(c.sum()),
        })
    return pd.DataFrame(rows).sort_values("l_returnflag").reset_index(drop=True)


class _BrandLookup:
    """partkey → brand dict built once per actor from the broadcast part
    table (``ray.put`` refs); batches partial-aggregate straight to the
    25-value brand domain, so the shuffle is trivially small."""

    def __init__(self, refs):
        import pyarrow as _pa

        from marc_record_merge_melindautils_ray.functions.util import maybe_get

        keys, brands = [], []
        for r in refs:
            t = maybe_get(r)
            if isinstance(t, pd.DataFrame):
                t = _pa.Table.from_pandas(t, preserve_index=False)
            if len(t):
                keys.append(np.asarray(t["p_partkey"], dtype=np.int64))
                brands.append(np.asarray(t["p_brand"].to_pylist(), dtype=object))
        k = np.concatenate(keys) if keys else np.empty(0, np.int64)
        b = np.concatenate(brands) if brands else np.empty(0, object)
        o = np.argsort(k, kind="stable")
        self.keys, self.brands = k[o], b[o]

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        pk = np.asarray(t["l_partkey"], dtype=np.int64)
        pos = np.clip(np.searchsorted(self.keys, pk), 0, max(0, len(self.keys) - 1))
        hit = self.keys[pos] == pk if len(self.keys) else np.zeros(len(pk), bool)
        rev = np.round(
            np.asarray(t["l_extendedprice"], dtype=np.float64)
            * (1.0 - np.asarray(t["l_discount"], dtype=np.float64)) * 10000.0
        ).astype(np.int64)
        df = pd.DataFrame({
            "p_brand": self.brands[pos[hit]],
            "rev_e4": rev[hit],
            "n_lines": np.ones(int(hit.sum()), np.int64),
        })
        return df.groupby("p_brand", as_index=False).sum()


def q_brand_revenue(sf_dir: str) -> pd.DataFrame:
    """Fact ⨝ dimension + aggregate with BOTH scale tricks at once: the
    dimension side travels as broadcast object-store refs (read once per
    actor, never per batch), and aggregation is pushed below the exchange —
    each batch leaves as ≤25 (brand, partial) rows, so the only shuffle is
    over the brand domain.  Dimension sides too big for one heap use the
    distributed hash join instead (``q_join_hash``)."""
    import ray

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).materialize()
    refs = part.to_arrow_refs()
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
    out = (
        li.map_batches(task_stage(_BrandLookup, (refs,), key=("brand", *refs)),
                       batch_format="pyarrow")
        .groupby("p_brand")
        .sum(["rev_e4", "n_lines"])
        .to_pandas()
    )
    out.columns = ["p_brand", "rev_e4", "n_lines"]
    out["rev_e4"] = out["rev_e4"].astype(np.int64)
    out["n_lines"] = out["n_lines"].astype(np.int64)
    return out.sort_values("p_brand").reset_index(drop=True)


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_events(sf_dir: str) -> pd.DataFrame:
    """PIVOT: per-user event counts spread across one column per event type.
    The fixed type domain makes pivot a pure combiner: each batch emits at
    most one wide partial row per user (counts crosstab), and the shuffle
    sums wide rows — no per-user group materialization, no second pass."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(df["user_id"], df["event_type"])
        for t in _EVENT_TYPES:
            if t not in ct.columns:
                ct[t] = 0
        ct = ct[list(_EVENT_TYPES)].astype(np.int64)
        ct.columns = [f"n_{t}" for t in _EVENT_TYPES]
        return ct.reset_index()

    cols = [f"n_{t}" for t in _EVENT_TYPES]
    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .sum(cols)
        .to_pandas()
    )
    out.columns = ["user_id"] + cols
    out[cols] = out[cols].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


def q_running_total(sf_dir: str) -> pd.DataFrame:
    """Running total (SUM OVER PARTITION BY customer ORDER BY date): the
    hash-partitioned window pattern — shuffle by the partition key, then one
    vectorized sort + cumsum per customer group.  Cents-integer amounts keep
    the cumulative sums float-order-independent."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64
    from marc_record_merge_melindautils_ray.stages.cluster import (
        adaptive_parts,
        cluster_parallelism,
    )

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    nparts = adaptive_parts(ds.count(), lo=max(8, 2 * cluster_parallelism()), hi=512)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        u = df["o_custkey"].to_numpy(np.int64).view(np.uint64)
        df = df.copy()
        df["part"] = (splitmix64(u) % np.uint64(nparts)).astype(np.int64)
        return df

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        # hash(custkey) co-locates each customer's orders → one vectorized
        # sort + grouped cumsum per partition, never a Python UDF per
        # customer (the map_groups-per-key cost trap; see q_events_hourly)
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]).reset_index(drop=True)
        cents = np.round(g["o_totalprice"].to_numpy(np.float64) * 100).astype(np.int64)
        return pd.DataFrame({
            "o_custkey": g["o_custkey"].to_numpy(np.int64),
            "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
            "cum_spend_c": pd.Series(cents).groupby(
                g["o_custkey"].to_numpy(np.int64)
            ).cumsum().to_numpy(np.int64),
        })

    out = (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    return (
        out.drop(columns=["part"], errors="ignore")
        .sort_values(["o_custkey", "o_orderkey"])
        .reset_index(drop=True)
    )


def _range_rank_partitions(with_key, sort_col: str, nparts: int):
    """Shared scaffolding for exact distributed ranking over a total order
    (``q_global_rank``, ``q_order_quartiles``): deterministic hash-sample of
    the sort key → range boundaries (driver holds only the boundary list) →
    one pass assigns range partitions (``searchsorted`` keeps every tie of a
    boundary value in one partition) → per-partition counts → driver cumsum
    offsets.  Returns ``(assigned_ds, offsets, n_total)``; callers sort each
    partition locally and add its offset for exact global positions."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64

    def sample(t: pa.Table) -> pa.Table:
        k = np.asarray(t["o_orderkey"], np.int64).view(np.uint64)
        keep = splitmix64(k) % np.uint64(16) == 0
        return pa.table({sort_col: pa.array(
            np.asarray(t[sort_col], np.int64)[keep], pa.int64())})

    sampled = np.sort(np.asarray(
        with_key.map_batches(sample, batch_format="pyarrow")
        .limit(200_000).to_pandas()[sort_col], dtype=np.int64
    ))
    qs = np.linspace(0, 1, nparts + 1)[1:-1]
    bounds = np.unique(
        sampled[np.minimum((qs * len(sampled)).astype(int), len(sampled) - 1)]
    ) if len(sampled) else np.empty(0, np.int64)

    def assign(t: pa.Table) -> pa.Table:
        part = np.searchsorted(bounds, np.asarray(t[sort_col], np.int64),
                               side="right").astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    assigned = with_key.map_batches(assign, batch_format="pyarrow").materialize()
    counts = assigned.groupby("part").count().to_pandas()
    counts.columns = ["part", "n"]
    counts = counts.sort_values("part")
    n_total = int(counts["n"].sum())
    offsets = dict(zip(
        counts["part"].astype(int),
        np.r_[0, np.cumsum(counts["n"].to_numpy())[:-1]].astype(np.int64),
    ))
    return assigned, offsets, n_total


def q_global_rank(sf_dir: str, nparts: int = 32) -> pd.DataFrame:
    """EXACT global ROW_NUMBER over a total order (o_totalprice DESC,
    o_orderkey) — per-partition vectorized sort + arange + the partition's
    global offset from ``_range_rank_partitions`` (see its docstring for the
    machinery and the duplicated-key skew caveat)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def keyed(t: pa.Table) -> pa.Table:
        price_c = _cents(np.asarray(t["o_totalprice"]))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "price_c": pa.array(price_c, pa.int64()),
            "neg_price": pa.array(-price_c, pa.int64()),
        })

    with_key = ds.map_batches(keyed, batch_format="pyarrow").materialize()
    assigned, offsets, _ = _range_rank_partitions(with_key, "neg_price", nparts)

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["neg_price", "o_orderkey"]).reset_index(drop=True)
        base = offsets[int(g["part"].iloc[0])]
        return pd.DataFrame({
            "rnk": base + 1 + np.arange(len(g), dtype=np.int64),
            "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
            "price_c": g["price_c"].to_numpy(np.int64),
        })

    out = assigned.groupby("part").map_groups(rank_part, batch_format="pandas").to_pandas()
    return out.sort_values("rnk").reset_index(drop=True)


# ------------------------------------------------------- multi-table joins
def q3_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                         cutoff: str = "1996-06-30") -> pd.DataFrame:
    """TPC-H Q3 shape: customer(segment) ⨝ orders(before cutoff) ⨝
    lineitem(shipped after cutoff) → revenue per order → top 10.

    Scale shape: the segment customer KEY SET is the only broadcast (a
    filtered key column, dup-free — Bloom it at 100 TB); orders are
    semi-filtered against it per batch, then the big lineitem ⨝ orders join
    is a distributed hash shuffle with revenue partial-aggregated per batch
    before the final (order-cardinality) groupby and top-k."""
    from marc_record_merge_melindautils_ray.functions.util import maybe_get
    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    cut = np.datetime64(cutoff, "us")

    cust_keys = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda t: t.filter(pc.equal(t["c_mktsegment"], segment)).select(["c_custkey"]),
            batch_format="pyarrow",
        )
        .materialize()
    )
    key_refs = cust_keys.to_arrow_refs()

    class SegFilter:
        def __init__(self, refs):
            tables = [maybe_get(r) for r in refs]
            parts = [np.asarray(t["c_custkey"], np.int64) for t in tables if len(t)]
            self.keys = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)

        def __call__(self, t: pa.Table) -> pa.Table:
            keep = pc.less(t["o_orderdate"], pa.scalar(cut))
            t = t.filter(keep)
            hit = sorted_membership(self.keys, np.asarray(t["o_custkey"], np.int64))
            return t.filter(pa.array(hit)).select(["o_orderkey", "o_orderdate"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        task_stage(SegFilter, (key_refs,), key=("seg", cut, *key_refs)),
        batch_format="pyarrow",
    )

    li_base = _read(sf_dir, "lineitem",
                    ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
    # size the join from the metadata-cheap base row count — counting the
    # filtered lineage would execute the read+filter a second time
    n_li = li_base.count()
    li = li_base.map_batches(
        lambda t: t.filter(pc.greater(t["l_shipdate"], pa.scalar(cut))).select(
            ["l_orderkey", "l_extendedprice", "l_discount"]
        ),
        batch_format="pyarrow",
    )

    joined = li.join(
        orders, join_type="inner",
        num_partitions=adaptive_parts(n_li, rows_per_part=250_000),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        rev = np.round(
            np.asarray(t["l_extendedprice"], np.float64)
            * (1.0 - np.asarray(t["l_discount"], np.float64)) * 10000.0
        ).astype(np.int64)
        days = np.asarray(t["o_orderdate"]).astype("datetime64[D]")
        df = pd.DataFrame({
            "l_orderkey": np.asarray(t["l_orderkey"], np.int64),
            "o_orderdate": np.datetime_as_string(days, unit="D"),
            "revenue_e4": rev,
        })
        return df.groupby(["l_orderkey", "o_orderdate"], as_index=False).sum()

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_orderkey", "o_orderdate"])
        .sum(["revenue_e4"])
        .to_pandas()
    )
    out.columns = ["l_orderkey", "o_orderdate", "revenue_e4"]
    out["revenue_e4"] = out["revenue_e4"].astype(np.int64)
    return (
        out.sort_values(["revenue_e4", "l_orderkey"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )


def q5_region_revenue(sf_dir: str, year: int = 1996) -> pd.DataFrame:
    """TPC-H Q5 shape: lineitem ⨝ orders(year) ⨝ customer ⨝ nation ⨝ region
    → revenue per region.  Two DISTRIBUTED hash joins chained on different
    keys (custkey, then orderkey) carry the growing tables; only the
    genuinely-bounded nation→region mapping (25 rows) is a driver broadcast.
    Revenue partials are pushed below the final exchange, so the last
    shuffle moves ≤ |regions| rows per block."""
    import ray

    from marc_record_merge_melindautils_ray.functions.util import maybe_get
    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    n2r = dict(zip(
        nat["n_nationkey"].astype(int),
        nat["n_regionkey"].map(dict(zip(reg["r_regionkey"].astype(int), reg["r_name"]))),
    ))
    n2r_ref = ray.put(n2r)

    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{year + 1}-01-01", "us")
    orders_base = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    # metadata-cheap count on the base read (counting the filtered lineage
    # would run the read+filter twice); the filter only shrinks it, and
    # adaptive_parts caps at ~500 rows/partition anyway
    n_orders = orders_base.count()
    orders = orders_base.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi)),
        )).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    ord_nat = orders.join(
        cust, join_type="inner",
        num_partitions=adaptive_parts(n_orders, rows_per_part=250_000),
        on=("o_custkey",), right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "c_nationkey"])

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    joined = li.join(
        ord_nat, join_type="inner",
        num_partitions=adaptive_parts(li.count(), rows_per_part=250_000),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        n2r_ = maybe_get(n2r_ref)
        rev = np.round(
            np.asarray(t["l_extendedprice"], np.float64)
            * (1.0 - np.asarray(t["l_discount"], np.float64)) * 10000.0
        ).astype(np.int64)
        names = np.array(
            [n2r_.get(int(k)) for k in np.asarray(t["c_nationkey"])], dtype=object
        )
        df = pd.DataFrame({"r_name": names, "rev_e4": rev})
        return df.groupby("r_name", as_index=False).sum()

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("r_name")
        .sum(["rev_e4"])
        .to_pandas()
    )
    out.columns = ["r_name", "rev_e4"]
    out["rev_e4"] = out["rev_e4"].astype(np.int64)
    return out.sort_values("r_name").reset_index(drop=True)


def q_left_join_counts(sf_dir: str) -> pd.DataFrame:
    """customer LEFT OUTER JOIN per-customer order aggregate: customers with
    no orders surface with zero counts — the outer-join semantics
    ``Dataset.join(join_type='left_outer')`` provides distributed.  The
    orders side is pre-aggregated to customer cardinality BEFORE the join
    (partial per batch + groupby-sum), so the join moves one row per
    customer, not one per order."""
    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "o_custkey": np.asarray(t["o_custkey"], np.int64),
            "n_orders": np.ones(len(t), np.int64),
            "sum_total_cents": _cents(np.asarray(t["o_totalprice"])),
        })
        return df.groupby("o_custkey", as_index=False).sum()

    agg = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .sum(["n_orders", "sum_total_cents"])
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    joined = cust.join(
        agg, join_type="left_outer",
        num_partitions=adaptive_parts(cust.count(), rows_per_part=250_000),
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def fill(t: pa.Table) -> pd.DataFrame:
        n = t.column("sum(n_orders)") if "sum(n_orders)" in t.column_names else t["n_orders"]
        s = (
            t.column("sum(sum_total_cents)")
            if "sum(sum_total_cents)" in t.column_names
            else t["sum_total_cents"]
        )
        return pd.DataFrame({
            "c_custkey": np.asarray(t["c_custkey"], np.int64),
            "c_name": t["c_name"].to_pandas(),
            "n_orders": np.asarray(pc.fill_null(n, 0), np.int64),
            "sum_total_cents": np.asarray(pc.fill_null(s, 0), np.int64),
        })

    out = joined.map_batches(fill, batch_format="pyarrow").to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def q_except_keys(sf_dir: str, year_a: int = 1995, year_b: int = 1996) -> pd.DataFrame:
    """Key-set EXCEPT without a join: customers with orders in ``year_a``
    but none in ``year_b``.  One pass over orders emits per-batch
    (custkey, in_a, in_b) partial flags; the groupby-sum over customer
    cardinality decides membership — set difference as an aggregate, the
    shuffle-minimal expression (SURVEY.md §2.7 set ops)."""
    a_lo, a_hi = np.datetime64(f"{year_a}-01-01", "us"), np.datetime64(f"{year_a + 1}-01-01", "us")
    b_lo, b_hi = np.datetime64(f"{year_b}-01-01", "us"), np.datetime64(f"{year_b + 1}-01-01", "us")
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def partial(t: pa.Table) -> pd.DataFrame:
        d = np.asarray(t["o_orderdate"]).astype("datetime64[us]")
        in_a = ((d >= a_lo) & (d < a_hi)).astype(np.int64)
        in_b = ((d >= b_lo) & (d < b_hi)).astype(np.int64)
        df = pd.DataFrame({
            "c_custkey": np.asarray(t["o_custkey"], np.int64),
            "in_a": in_a, "in_b": in_b,
        })
        df = df[(df["in_a"] > 0) | (df["in_b"] > 0)]
        return df.groupby("c_custkey", as_index=False).sum()

    agg = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .sum(["in_a", "in_b"])
        .to_pandas()
    )
    agg.columns = ["c_custkey", "in_a", "in_b"]
    out = agg[(agg["in_a"] > 0) & (agg["in_b"] == 0)][["c_custkey"]]
    out["c_custkey"] = out["c_custkey"].astype(np.int64)
    return out.sort_values("c_custkey").reset_index(drop=True)


# ---------------------------------------------------------- semi-join (Q4)
def q4_order_priority(sf_dir: str, flag: str = "R") -> pd.DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join — orders per priority that have at
    least one returned lineitem.  The DISTINCT matching-orderkey set is
    computed in Ray (per-batch filter + unique → key-cardinality groupby)
    and broadcast as sorted-int64 block refs; the orders scan keeps matching
    rows and the groupby moves only the 5-value priority domain.  At 100 TB
    the key set outgrows one heap → shard it with
    ``state.broadcast_index.shard_side_table`` and route orders by
    ``shard_of(o_orderkey)`` (the clip pipeline's ``cfg.index_shards``
    path), or flip to the distributed hash join of ``q_join_hash``."""
    from marc_record_merge_melindautils_ray.functions.util import maybe_get

    keys_ds = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])
        .map_batches(
            lambda t: pa.table({"k": pc.unique(
                t.filter(pc.equal(t["l_returnflag"], flag))["l_orderkey"].combine_chunks()
            )}),
            batch_format="pyarrow",
        )
        .groupby("k")
        .count()
        .materialize()
    )
    key_refs = keys_ds.to_arrow_refs()

    class SemiFilter:
        def __init__(self, refs):
            parts = []
            for r in refs:
                t = maybe_get(r)
                if len(t) and "k" in t.column_names:
                    parts.append(np.asarray(t["k"], np.int64))
            self.keys = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)

        def __call__(self, t: pa.Table) -> pa.Table:
            hit = sorted_membership(self.keys, np.asarray(t["o_orderkey"], np.int64))
            return t.filter(pa.array(hit)).select(["o_orderpriority"])

    out = (
        _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
        .map_batches(task_stage(SemiFilter, (key_refs,), key=("q4", flag, *key_refs)),
                     batch_format="pyarrow")
        .groupby("o_orderpriority")
        .count()
        .to_pandas()
    )
    out.columns = ["o_orderpriority", "order_count"]
    out["order_count"] = out["order_count"].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


# ------------------------------------------------- conditional agg (Q12)
def q12_priority_lines(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 shape: join + conditional aggregation — per lineitem
    linestatus, how many lines belong to high-priority (1-URGENT/2-HIGH)
    orders vs low.  The orders side collapses to (orderkey, is_high) —
    broadcast as two sorted key arrays (high / all) — and each lineitem
    batch partial-aggregates CASE-WHEN counts straight to the 2-key
    linestatus domain, so the only shuffle is over that domain.  Same
    100 TB sharding note as ``q4_order_priority``."""
    from marc_record_merge_melindautils_ray.functions.util import maybe_get

    orders_keys = (
        _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
        .map_batches(
            lambda t: pa.table({
                "k": t["o_orderkey"],
                "high": pc.is_in(t["o_orderpriority"],
                                 value_set=pa.array(["1-URGENT", "2-HIGH"])),
            }),
            batch_format="pyarrow",
        )
        .materialize()
    )
    key_refs = orders_keys.to_arrow_refs()

    class PriorityLookup:
        def __init__(self, refs):
            all_k, high_k = [], []
            for r in refs:
                t = maybe_get(r)
                if len(t) and "k" in t.column_names:
                    k = np.asarray(t["k"], np.int64)
                    h = np.asarray(t["high"]).astype(bool)
                    all_k.append(k)
                    high_k.append(k[h])
            self.all = np.sort(np.concatenate(all_k)) if all_k else np.empty(0, np.int64)
            hk = [a for a in high_k if len(a)]
            self.high = np.sort(np.concatenate(hk)) if hk else np.empty(0, np.int64)

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            ok = np.asarray(t["l_orderkey"], np.int64)
            # inner-join semantics: drop lineitems with no order row
            keep = sorted_membership(self.all, ok)
            high = sorted_membership(self.high, ok[keep])
            df = pd.DataFrame({
                "l_linestatus": t["l_linestatus"].to_pandas()[keep].reset_index(drop=True),
                "high_line_count": high.astype(np.int64),
                "low_line_count": (~high).astype(np.int64),
            })
            return df.groupby("l_linestatus", as_index=False).sum()

    out = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_linestatus"])
        .map_batches(task_stage(PriorityLookup, (key_refs,), key=("q12", *key_refs)),
                     batch_format="pyarrow")
        .groupby("l_linestatus")
        .sum(["high_line_count", "low_line_count"])
        .to_pandas()
    )
    out.columns = ["l_linestatus", "high_line_count", "low_line_count"]
    out[["high_line_count", "low_line_count"]] = out[
        ["high_line_count", "low_line_count"]].astype(np.int64)
    return out.sort_values("l_linestatus").reset_index(drop=True)


# ------------------------------------------------------ promo ratio (Q14)
def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape: conditional-sum ratio — share of revenue from PROMO
    parts, as an exact-integer permyriad.  Both operands are summed as
    integer e4 units (each side applies identical per-row rounding), so the
    final division is over exact integers and the result is reproducible
    regardless of summation order — the float-robust pattern every ratio
    aggregate here uses.  Broadcast side: the PROMO partkey set."""
    from marc_record_merge_melindautils_ray.functions.util import maybe_get

    promo_keys = (
        _read(sf_dir, "part", ["p_partkey", "p_type"])
        .map_batches(
            lambda t: pa.table(
                {"k": t.filter(pc.equal(t["p_type"], "PROMO"))["p_partkey"]}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    key_refs = promo_keys.to_arrow_refs()

    class PromoPartial:
        def __init__(self, refs):
            parts = []
            for r in refs:
                t = maybe_get(r)
                if len(t) and "k" in t.column_names:
                    parts.append(np.asarray(t["k"], np.int64))
            self.keys = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            rev = np.round(
                np.asarray(t["l_extendedprice"], np.float64)
                * (1.0 - np.asarray(t["l_discount"], np.float64)) * 10000.0
            ).astype(np.int64)
            promo = sorted_membership(self.keys, np.asarray(t["l_partkey"], np.int64))
            return pd.DataFrame({
                "promo_rev_e4": [int(rev[promo].sum())],
                "total_rev_e4": [int(rev.sum())],
            })

    sums = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
        .map_batches(task_stage(PromoPartial, (key_refs,), key=("q14", *key_refs)),
                     batch_format="pyarrow")
        .sum(["promo_rev_e4", "total_rev_e4"])
    )
    promo_e4 = int(sums["sum(promo_rev_e4)"])
    total_e4 = int(sums["sum(total_rev_e4)"])
    permyriad = int(round(10000.0 * promo_e4 / total_e4)) if total_e4 else 0
    return pd.DataFrame({
        "promo_rev_e4": [promo_e4],
        "total_rev_e4": [total_e4],
        "promo_permyriad": [permyriad],
    })


# ------------------------------------------- HAVING + join-back (Q18)
def q18_big_spenders(sf_dir: str, threshold_cents: int = 30_000_000) -> pd.DataFrame:
    """TPC-H Q18 shape: grouped HAVING filter, then join the survivors back
    to the dimension table for attributes.  The per-customer totals are
    partial-aggregated per batch (integer cents) before the
    customer-cardinality groupby; only the HAVING SURVIVORS (a tiny set) are
    broadcast to the customer scan — never the full aggregate."""
    from marc_record_merge_melindautils_ray.functions.util import maybe_get

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "c_custkey": np.asarray(t["o_custkey"], np.int64),
            "total_cents": _cents(np.asarray(t["o_totalprice"])),
        })
        return df.groupby("c_custkey", as_index=False).sum()

    totals = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .sum(["total_cents"])
        .map_batches(
            lambda df: df[df.iloc[:, 1] > threshold_cents].set_axis(
                ["c_custkey", "total_cents"], axis=1),
            batch_format="pandas",
        )
        .materialize()
    )
    surv_refs = totals.to_arrow_refs()

    class SpenderLookup:
        def __init__(self, refs):
            ks, vs = [], []
            for r in refs:
                t = maybe_get(r)
                if isinstance(t, pd.DataFrame):
                    t = pa.Table.from_pandas(t, preserve_index=False)
                if len(t) and "c_custkey" in t.column_names:
                    ks.append(np.asarray(t["c_custkey"], np.int64))
                    vs.append(np.asarray(t["total_cents"], np.int64))
            k = np.concatenate(ks) if ks else np.empty(0, np.int64)
            v = np.concatenate(vs) if vs else np.empty(0, np.int64)
            o = np.argsort(k, kind="stable")
            self.keys, self.vals = k[o], v[o]

        def __call__(self, t: pa.Table) -> pa.Table:
            ck = np.asarray(t["c_custkey"], np.int64)
            hit = sorted_membership(self.keys, ck)
            t = t.filter(pa.array(hit))
            idx = np.searchsorted(self.keys, ck[hit])
            return t.append_column(
                "total_cents", pa.array(self.vals[idx], pa.int64())
            )

    out = (
        _read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(task_stage(SpenderLookup, (surv_refs,),
                                key=("q18", threshold_cents, *surv_refs)),
                     batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype=np.int64),
                            "c_name": pd.Series([], dtype=str),
                            "total_cents": pd.Series([], dtype=np.int64)})
    return (
        out.sort_values(["total_cents", "c_custkey"], ascending=[False, True])
        .reset_index(drop=True)
    )


# ------------------------------------------------------- ntile window
def q_order_quartiles(sf_dir: str, k: int = 4, nparts: int = 32) -> pd.DataFrame:
    """NTILE(k) over a global total order (o_totalprice ASC, o_orderkey) +
    per-tile aggregate — built on the exact distributed-rank machinery of
    ``q_global_rank`` (range partition on sampled boundaries → per-partition
    counts → driver cumsum offsets → per-partition sort + arange).  The tile
    of a global rank follows DuckDB/ANSI NTILE: the first ``N mod k`` tiles
    hold ``floor(N/k)+1`` rows.  Per-tile partials are aggregated inside the
    rank partitions, so the final shuffle moves ≤ k rows per partition."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def keyed(t: pa.Table) -> pa.Table:
        price_c = _cents(np.asarray(t["o_totalprice"]))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "price_c": pa.array(price_c, pa.int64()),
        })

    with_key = ds.map_batches(keyed, batch_format="pyarrow").materialize()
    assigned, offsets, n_total = _range_rank_partitions(with_key, "price_c", nparts)
    q, r = divmod(n_total, k)
    boundary = r * (q + 1)  # ranks ≤ boundary land in the big tiles

    def tile_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["price_c", "o_orderkey"]).reset_index(drop=True)
        rank = offsets[int(g["part"].iloc[0])] + 1 + np.arange(len(g), dtype=np.int64)
        big = rank <= boundary
        tile = np.where(
            big,
            (rank - 1) // (q + 1) + 1,
            r + (rank - 1 - boundary) // max(q, 1) + 1,
        ).astype(np.int64)
        df = pd.DataFrame({
            "tile": tile,
            "n": np.ones(len(g), dtype=np.int64),
            "sum_cents": g["price_c"].to_numpy(np.int64),
        })
        return df.groupby("tile", as_index=False).sum()

    out = (
        assigned.groupby("part").map_groups(tile_part, batch_format="pandas")
        .groupby("tile")
        .sum(["n", "sum_cents"])
        .to_pandas()
    )
    out.columns = ["tile", "n", "sum_cents"]
    out[["tile", "n", "sum_cents"]] = out[["tile", "n", "sum_cents"]].astype(np.int64)
    return out.sort_values("tile").reset_index(drop=True)


def _join_or_empty(consume, empty, sides=()):
    """Run ``consume()`` (a pipeline that executes a Dataset.join) and map
    the one Ray hash-shuffle failure mode that means "a join side filtered
    to zero rows" — empty blocks lose their schema, so Acero raises
    ``No match ... for key field reference`` — to the query's typed empty
    result.  Any other error propagates untouched.

    The Acero message is also what a genuine join-key/column-name bug
    raises, so swallowing on the substring alone would mask regressions as
    empty answers.  Callers pass the join's input Datasets via ``sides``;
    the empty result is returned only when at least one side actually
    counts to zero rows (cheap — error path only).  If every side has rows,
    the error was a real key-reference bug and is re-raised."""
    import ray.exceptions

    try:
        return consume()
    except ray.exceptions.RayTaskError as e:
        if "No match or multiple matches for key field reference" in str(e):
            if not sides or any(s.count() == 0 for s in sides):
                return empty
        raise


# ------------------------------------------- returned-item revenue (Q10)
def q10_returned_items(sf_dir: str, date_lo: str = "1996-01-01",
                       date_hi: str = "1996-07-01", k: int = 20) -> pd.DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer over a
    date window, top-k customers with their nation attributes.

    Scale shape: the window-filtered orders (orderkey → custkey) join the
    returned lineitem rows in a DISTRIBUTED hash shuffle sized by
    ``adaptive_parts``; revenue is partial-aggregated per batch by custkey
    BEFORE the customer-cardinality groupby; the groupby output never lands
    on the driver whole — each output block reduces to a local top-k and
    only ``k × blocks`` candidate rows merge driver-side.  Customer/nation
    attributes are then attached by broadcasting just the k winning custkeys
    to a pruned customer scan (nation is a 25-row broadcast dict)."""
    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    lo, hi = np.datetime64(date_lo, "us"), np.datetime64(date_hi, "us")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                    pc.less(t["o_orderdate"], pa.scalar(hi)))
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    li_base = _read(sf_dir, "lineitem",
                    ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])
    n_li = li_base.count()
    li = li_base.map_batches(
        lambda t: t.filter(pc.equal(t["l_returnflag"], "R")).select(
            ["l_orderkey", "l_extendedprice", "l_discount"]),
        batch_format="pyarrow",
    )

    joined = li.join(
        orders, join_type="inner",
        num_partitions=adaptive_parts(n_li, rows_per_part=250_000),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        rev = np.round(
            np.asarray(t["l_extendedprice"], np.float64)
            * (1.0 - np.asarray(t["l_discount"], np.float64)) * 10000.0
        ).astype(np.int64)
        df = pd.DataFrame({"c_custkey": np.asarray(t["o_custkey"], np.int64),
                           "revenue_e4": rev})
        return df.groupby("c_custkey", as_index=False).sum()

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.set_axis(["c_custkey", "revenue_e4"], axis=1)
        return df.sort_values(["revenue_e4", "c_custkey"],
                              ascending=[False, True]).head(k)

    cand = _join_or_empty(
        lambda: (
            joined.map_batches(partial, batch_format="pyarrow")
            .groupby("c_custkey").sum(["revenue_e4"])
            .map_batches(local_topk, batch_format="pandas")
            .to_pandas()
        ),
        pd.DataFrame({"c_custkey": pd.Series([], dtype=np.int64),
                      "revenue_e4": pd.Series([], dtype=np.int64)}),
        sides=(li, orders),
    )
    top = (cand.sort_values(["revenue_e4", "c_custkey"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    if top.empty:
        return pd.DataFrame({"c_custkey": pd.Series([], dtype=np.int64),
                             "c_name": pd.Series([], dtype=str),
                             "revenue_e4": pd.Series([], dtype=np.int64),
                             "acctbal_c": pd.Series([], dtype=np.int64),
                             "n_name": pd.Series([], dtype=str)})

    win_keys = np.sort(top["c_custkey"].to_numpy(np.int64))
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n_names = dict(zip(nation["n_nationkey"].astype(np.int64), nation["n_name"]))

    def attach(t: pa.Table) -> pa.Table:
        hit = sorted_membership(win_keys, np.asarray(t["c_custkey"], np.int64))
        t = t.filter(pa.array(hit))
        names = [n_names.get(int(x), "") for x in np.asarray(t["c_nationkey"], np.int64)]
        return pa.table({
            "c_custkey": t["c_custkey"],
            "c_name": t["c_name"],
            "acctbal_c": pa.array(_cents(np.asarray(t["c_acctbal"])), pa.int64()),
            "n_name": pa.array(names, pa.string()),
        })

    attrs = (
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
        .map_batches(attach, batch_format="pyarrow")
        .to_pandas()
    )
    out = top.merge(attrs, on="c_custkey", how="inner")
    out = out[["c_custkey", "c_name", "revenue_e4", "acctbal_c", "n_name"]]
    out["c_custkey"] = out["c_custkey"].astype(np.int64)
    out["revenue_e4"] = out["revenue_e4"].astype(np.int64)
    out["acctbal_c"] = out["acctbal_c"].astype(np.int64)
    return (out.sort_values(["revenue_e4", "c_custkey"], ascending=[False, True])
            .reset_index(drop=True))


# ------------------------------------------- disjunctive predicates (Q19)
_Q19_BRANCHES = (
    # (brand, size_lo, size_hi, qty_lo, qty_hi) — AND within, OR across
    ("Brand#3", 1, 15, 1, 11),
    ("Brand#7", 1, 25, 10, 20),
    ("Brand#12", 1, 35, 20, 30),
)


def q19_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning BOTH join sides (part
    brand/size × lineitem quantity) over lineitem ⨝ part.

    Scale shape: each side is pre-filtered to ITS OWN disjunction envelope
    before the shuffle (parts to the union of brand/size branches, lineitem
    to the quantity hull) — the join then moves only plausible rows; the
    full cross-side disjunction evaluates vectorized on the joined batches
    and reduces to a single (revenue, count) row via per-batch partials."""
    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    qty_lo = min(b[3] for b in _Q19_BRANCHES)
    qty_hi = max(b[4] for b in _Q19_BRANCHES)

    def part_filter(t: pa.Table) -> pa.Table:
        size = np.asarray(t["p_size"], np.int64)
        brand = np.asarray(t["p_brand"]).astype(str)
        keep = np.zeros(len(t), bool)
        for b, slo, shi, _, _ in _Q19_BRANCHES:
            keep |= (brand == b) & (size >= slo) & (size <= shi)
        return t.filter(pa.array(keep)).select(["p_partkey", "p_brand", "p_size"])

    parts = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
        part_filter, batch_format="pyarrow")

    li_base = _read(sf_dir, "lineitem",
                    ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
    n_li = li_base.count()
    li = li_base.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["l_quantity"], pa.scalar(float(qty_lo))),
                    pc.less_equal(t["l_quantity"], pa.scalar(float(qty_hi))))),
        batch_format="pyarrow",
    )

    joined = li.join(
        parts, join_type="inner",
        num_partitions=adaptive_parts(n_li, rows_per_part=250_000),
        on=("l_partkey",), right_on=("p_partkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        qty = np.asarray(t["l_quantity"], np.float64)
        size = np.asarray(t["p_size"], np.int64)
        brand = np.asarray(t["p_brand"]).astype(str)
        keep = np.zeros(len(t), bool)
        for b, slo, shi, qlo, qhi in _Q19_BRANCHES:
            keep |= ((brand == b) & (size >= slo) & (size <= shi)
                     & (qty >= qlo) & (qty <= qhi))
        rev = np.round(
            np.asarray(t["l_extendedprice"], np.float64)[keep]
            * (1.0 - np.asarray(t["l_discount"], np.float64)[keep]) * 10000.0
        ).astype(np.int64)
        return pd.DataFrame({"revenue_e4": [int(rev.sum())],
                             "n_lines": [int(keep.sum())]})

    def consume():
        sums = joined.map_batches(partial, batch_format="pyarrow").sum(
            ["revenue_e4", "n_lines"])
        return pd.DataFrame({"revenue_e4": [int(sums["sum(revenue_e4)"])],
                             "n_lines": [int(sums["sum(n_lines)"])]})

    return _join_or_empty(
        consume, pd.DataFrame({"revenue_e4": [0], "n_lines": [0]}),
        sides=(li, parts))


# ------------------------------------------- deterministic hash sampling
_SAMPLE_MULT = 2_654_435_761  # Knuth multiplicative constant
_SAMPLE_MIX = 40_503
_SAMPLE_MOD = 1 << 32


def q_hash_sample(sf_dir: str, rate_num: int = 1, rate_den: int = 16) -> rd.Dataset:
    """Deterministic multiplicative-hash row sampling — the reproducible
    alternative to ``Dataset.random_sample`` for corpus subsetting: keep a
    row iff ``(l_orderkey·M + l_linenumber·X) mod 2³² < 2³²·rate``.  The
    predicate is pure integer arithmetic on the row's own key, so the SAME
    rows are selected on any cluster size, any block layout, and in the SQL
    oracle — sampling as a stateless embarrassingly-parallel filter, no
    shuffle, no seed exchange.  (At 100 TB the multiply stays exact: numpy
    uint64 here, HUGEINT in the warehouse when keys approach 2⁵³.)"""
    thresh = (_SAMPLE_MOD * rate_num) // rate_den

    def kern(t: pa.Table) -> pa.Table:
        ok = np.asarray(t["l_orderkey"], np.uint64)
        ln = np.asarray(t["l_linenumber"], np.uint64)
        h = (ok * np.uint64(_SAMPLE_MULT) + ln * np.uint64(_SAMPLE_MIX)) % np.uint64(_SAMPLE_MOD)
        t = t.filter(pa.array(h < np.uint64(thresh)))
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "qty_c": pa.array(_cents(np.asarray(t["l_quantity"])), pa.int64()),
        })

    return _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_linenumber", "l_quantity"]).map_batches(
        kern, batch_format="pyarrow")


# ------------------------------------------- grouped COUNT(DISTINCT ...)
def q_distinct_suppliers_per_flag(sf_dir: str) -> pd.DataFrame:
    """Exact COUNT(DISTINCT l_suppkey) per l_returnflag — the two-level
    distinct-aggregate pattern: per-batch local pair dedup (the combiner —
    collapses each batch to ≤ |flags|×|batch suppliers| rows), one shuffle
    keyed on the (flag, suppkey) PAIR to finish the dedup, then a trivially
    small per-flag count.  Nothing key-cardinality ever aggregates on the
    driver; the approximate sibling is ``hll_distinct_users``
    (``ops/sketches.py``), which replaces the pair shuffle with 4 KB
    register partials when exactness is negotiable."""

    def local_pairs(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "l_returnflag": np.asarray(t["l_returnflag"]).astype(str),
            "l_suppkey": np.asarray(t["l_suppkey"], np.int64),
        })
        return df.drop_duplicates()

    pairs = (
        _read(sf_dir, "lineitem", ["l_returnflag", "l_suppkey"])
        .map_batches(local_pairs, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_suppkey"]).count()
    )

    def flag_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("l_returnflag", as_index=False).size()
        return out.rename(columns={"size": "n_supp"})

    out = (
        pairs.map_batches(flag_partial, batch_format="pandas")
        .groupby("l_returnflag").sum(["n_supp"])
        .to_pandas()
    )
    out.columns = ["l_returnflag", "n_supp"]
    out["n_supp"] = out["n_supp"].astype(np.int64)
    return out.sort_values("l_returnflag").reset_index(drop=True)


# ------------------------------------------- nation-pair volume (Q7)
def q7_nation_trade(sf_dir: str, nation_a: str = "NATION_1",
                    nation_b: str = "NATION_2") -> pd.DataFrame:
    """TPC-H Q7 shape: trade volume between two nations by shipping year,
    in BOTH directions (supplier in A shipping to customer in B, and vice
    versa) — a fact table enriched from two independent dimension chains.

    Scale shape: the customer chain (orders ⨝ customer for the order's
    nation) is a distributed hash join — customer is fact-scale; the
    supplier chain is a broadcast suppkey→nationkey dict (suppliers are
    dimension-scale; the sharded ``ArrowBlockIndex`` path takes over past
    one actor's heap).  The nation-pair filter collapses each batch before
    the tiny (2 × years)-row final groupby."""
    import ray

    from marc_record_merge_melindautils_ray.functions.util import maybe_get
    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    key2name = dict(zip(nation["n_nationkey"].astype(np.int64), nation["n_name"]))
    wanted = {nation_a, nation_b}

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    supp_nat = {
        int(k): key2name.get(int(v), "")
        for k, v in zip(supp["s_suppkey"], supp["s_nationkey"])
        if key2name.get(int(v), "") in wanted
    }
    supp_ref = ray.put(supp_nat)

    orders_base = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    n_orders = orders_base.count()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    ord_nat = orders_base.join(
        cust, join_type="inner",
        num_partitions=adaptive_parts(n_orders, rows_per_part=250_000),
        on=("o_custkey",), right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "c_nationkey"])

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])
    joined = li.join(
        ord_nat, join_type="inner",
        num_partitions=adaptive_parts(li.count(), rows_per_part=250_000),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        sn = maybe_get(supp_ref)
        supp_nation = np.array(
            [sn.get(int(k), "") for k in np.asarray(t["l_suppkey"], np.int64)],
            dtype=object,
        )
        cust_nation = np.array(
            [key2name.get(int(k), "") for k in np.asarray(t["c_nationkey"], np.int64)],
            dtype=object,
        )
        keep = (((supp_nation == nation_a) & (cust_nation == nation_b))
                | ((supp_nation == nation_b) & (cust_nation == nation_a)))
        if not keep.any():
            return pd.DataFrame({
                "supp_nation": pd.Series([], dtype=object),
                "cust_nation": pd.Series([], dtype=object),
                "l_year": pd.Series([], dtype=np.int64),
                "revenue_e4": pd.Series([], dtype=np.int64),
            })
        rev = np.round(
            np.asarray(t["l_extendedprice"], np.float64)[keep]
            * (1.0 - np.asarray(t["l_discount"], np.float64)[keep]) * 10000.0
        ).astype(np.int64)
        years = np.asarray(t["l_shipdate"])[keep].astype("datetime64[Y]").astype(
            np.int64) + 1970
        df = pd.DataFrame({
            "supp_nation": supp_nation[keep],
            "cust_nation": cust_nation[keep],
            "l_year": years,
            "revenue_e4": rev,
        })
        return df.groupby(["supp_nation", "cust_nation", "l_year"], as_index=False).sum()

    out = _join_or_empty(
        lambda: (
            joined.map_batches(partial, batch_format="pyarrow")
            .groupby(["supp_nation", "cust_nation", "l_year"])
            .sum(["revenue_e4"])
            .to_pandas()
        ),
        pd.DataFrame({"supp_nation": pd.Series([], dtype=object),
                      "cust_nation": pd.Series([], dtype=object),
                      "l_year": pd.Series([], dtype=np.int64),
                      "revenue_e4": pd.Series([], dtype=np.int64)}),
        sides=(li, ord_nat),
    )
    if out.empty:  # zero matching pairs → aggregate yields a column-less frame
        return pd.DataFrame({"supp_nation": pd.Series([], dtype=object),
                             "cust_nation": pd.Series([], dtype=object),
                             "l_year": pd.Series([], dtype=np.int64),
                             "revenue_e4": pd.Series([], dtype=np.int64)})
    out.columns = ["supp_nation", "cust_nation", "l_year", "revenue_e4"]
    out[["l_year", "revenue_e4"]] = out[["l_year", "revenue_e4"]].astype(np.int64)
    return (out.sort_values(["supp_nation", "cust_nation", "l_year"])
            .reset_index(drop=True))


# ------------------------------------------- ordered string aggregation
def q_segments_per_nation(sf_dir: str) -> pd.DataFrame:
    """Ordered string_agg: per nation, the comma-joined SORTED DISTINCT set
    of its customers' market segments — the list-typed aggregate pattern
    (string_agg / array_agg with ORDER BY).  Two-level like every distinct
    aggregate here: per-batch pair dedup (combiner) → pair-keyed shuffle
    finishes the dedup → per-nation assembly is a trivially small sort+join
    (≤ |nations| × |segments| rows ever reach it)."""

    def local_pairs(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "c_nationkey": np.asarray(t["c_nationkey"], np.int64),
            "seg": np.asarray(t["c_mktsegment"]).astype(str),
        }).drop_duplicates()

    pairs = (
        _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])
        .map_batches(local_pairs, batch_format="pyarrow")
        .groupby(["c_nationkey", "seg"]).count()
    )

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("seg")
        return pd.DataFrame({
            "c_nationkey": [np.int64(df["c_nationkey"].iloc[0])],
            "segments": [",".join(df["seg"])],
        })

    out = (
        pairs.groupby("c_nationkey").map_groups(assemble, batch_format="pandas")
        .to_pandas()
    )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = out.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    out = out[["n_name", "segments"]]
    return out.sort_values("n_name").reset_index(drop=True)


# ------------------------------------------- percent_rank window
def q_percent_rank_orders(sf_dir: str) -> pd.DataFrame:
    """ANSI percent_rank() PARTITION BY customer ORDER BY (price, orderkey),
    as an exact e6 integer: (rank−1)/(n−1), 0 for singleton groups.  Window
    partitions hash-shuffle by customer; each group ranks vectorized
    (lexsort + arange) — nothing global, no driver pass."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "price_c": pa.array(_cents(np.asarray(t["o_totalprice"])), pa.int64()),
        })

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["price_c", "o_orderkey"]).reset_index(drop=True)
        n = len(g)
        if n > 1:
            # exact-integer half-away-from-zero: floor((r·1e6)/(n−1) + ½)
            # = (2·r·1e6 + (n−1)) // (2·(n−1)).  DuckDB's round() is
            # half-away; np.round is half-to-even and differs when
            # (rank−1)·1e6/(n−1) lands exactly on .5.
            num = np.arange(n, dtype=np.int64) * 1_000_000
            d = np.int64(n - 1)
            pr_e6 = (2 * num + d) // (2 * d)
        else:
            pr_e6 = np.zeros(n, dtype=np.int64)
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
            "o_custkey": g["o_custkey"].to_numpy(np.int64),
            "price_c": g["price_c"].to_numpy(np.int64),
            "pr_e6": pr_e6,
        })

    out = (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("o_custkey")
        .map_groups(rank_group, batch_format="pandas")
        .to_pandas()
    )
    return (out.sort_values(["o_custkey", "price_c", "o_orderkey"])
            .reset_index(drop=True)
            [["o_orderkey", "o_custkey", "price_c", "pr_e6"]])


# ------------------------------------------- daily distinct actives
def q_daily_active_users(sf_dir: str) -> pd.DataFrame:
    """COUNT(DISTINCT user) per calendar day — time-bucketed distinct
    aggregation (date_trunc + two-level dedup): per-batch (day, user) pair
    dedup → pair-keyed shuffle → per-day count."""

    def local_pairs(t: pa.Table) -> pd.DataFrame:
        days = np.asarray(t["ts"]).astype("datetime64[D]")
        return pd.DataFrame({
            "day": np.datetime_as_string(days, unit="D"),
            "user_id": np.asarray(t["user_id"], np.int64),
        }).drop_duplicates()

    pairs = (
        _read(sf_dir, "events", ["ts", "user_id"])
        .map_batches(local_pairs, batch_format="pyarrow")
        .groupby(["day", "user_id"]).count()
    )

    def day_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("day", as_index=False).size()
        return out.rename(columns={"size": "n_users"})

    out = (
        pairs.map_batches(day_partial, batch_format="pandas")
        .groupby("day").sum(["n_users"])
        .to_pandas()
    )
    out.columns = ["day", "n_users"]
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("day").reset_index(drop=True)


# ------------------------------------------- CUBE super-aggregates
def q_cube_lineitem(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(l_returnflag, l_linestatus): all four aggregation
    levels (leaf, by flag, by status, grand total).  Like the ROLLUP
    operator, every super-aggregate derives from the tiny leaf table — the
    fact table is scanned ONCE; at 100 TB the cube costs one combiner
    shuffle plus driver arithmetic on a |flags|×|statuses| frame."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "l_returnflag": t["l_returnflag"].to_pandas(),
            "l_linestatus": t["l_linestatus"].to_pandas(),
            "sum_qty": np.asarray(t["l_quantity"], np.float64).astype(np.int64),
            "n": np.ones(len(t), np.int64),
        })
        return df.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()

    leaf = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .sum(["sum_qty", "n"])
        .to_pandas()
    )
    leaf.columns = ["rf", "ls", "sum_qty", "n"]
    by_rf = leaf.groupby("rf", as_index=False)[["sum_qty", "n"]].sum()
    by_rf["ls"] = "ALL"
    by_ls = leaf.groupby("ls", as_index=False)[["sum_qty", "n"]].sum()
    by_ls["rf"] = "ALL"
    total = pd.DataFrame({"rf": ["ALL"], "ls": ["ALL"],
                          "sum_qty": [leaf["sum_qty"].sum()],
                          "n": [leaf["n"].sum()]})
    out = pd.concat([leaf, by_rf, by_ls, total],
                    ignore_index=True)[["rf", "ls", "sum_qty", "n"]]
    out["sum_qty"] = out["sum_qty"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["rf", "ls"]).reset_index(drop=True)


# ------------------------------------------- RANK / DENSE_RANK with ties
def q_rank_orders(sf_dir: str) -> pd.DataFrame:
    """ANSI rank() and dense_rank() PARTITION BY customer ORDER BY price
    DESC — ties share a rank (rank skips, dense_rank doesn't), which is the
    semantics ROW_NUMBER-based top-k can't express.  Window partitions
    hash-shuffle by customer; each group ranks vectorized (sort + first-
    occurrence index for rank, cumulative-unique for dense_rank)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "price_c": pa.array(_cents(np.asarray(t["o_totalprice"])), pa.int64()),
        })

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["price_c", "o_orderkey"],
                          ascending=[False, True]).reset_index(drop=True)
        price = g["price_c"].to_numpy(np.int64)
        new_val = np.ones(len(g), bool)
        new_val[1:] = price[1:] != price[:-1]
        # rank: 1-based index of each value's FIRST row; dense: running count
        idx = np.arange(len(g), dtype=np.int64)
        first_idx = np.maximum.accumulate(np.where(new_val, idx, 0))
        rnk = first_idx + 1
        drnk = np.cumsum(new_val).astype(np.int64)
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
            "o_custkey": g["o_custkey"].to_numpy(np.int64),
            "price_c": price,
            "rnk": rnk,
            "drnk": drnk,
        })

    out = (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("o_custkey")
        .map_groups(rank_group, batch_format="pandas")
        .to_pandas()
    )
    return (out.sort_values(["o_custkey", "rnk", "o_orderkey"])
            .reset_index(drop=True)
            [["o_orderkey", "o_custkey", "price_c", "rnk", "drnk"]])


# ------------------------------------------- hopping-window aggregate
def q_hopping_window(sf_dir: str, window_min: int = 60,
                     hop_min: int = 15) -> pd.DataFrame:
    """Hopping (sliding-with-stride) event-time windows: per 60-minute
    window advancing every 15 minutes, event count + value sum — the
    overlapping-window sibling of the tumbling ``events_hourly``.

    Scale shape: each event expands to its ``window/hop`` covering windows
    VECTORIZED (np.repeat + tiled offsets — the expansion factor is the
    constant 4, not data-dependent), then per-batch partials combine before
    one small groupby keyed on window start.  Only windows an event actually
    covers are emitted, so the output is bounded by active windows, never
    the time axis."""
    assert window_min % hop_min == 0, "window must be a multiple of hop"
    k = window_min // hop_min
    hop_us = hop_min * 60 * 1_000_000

    ds = _read(sf_dir, "events", ["ts", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = np.asarray(t["ts"]).astype("datetime64[us]").astype(np.int64)
        cents = _cents(np.asarray(t["value"]))
        slot = ts // hop_us  # last hop-slot whose window contains the event
        # windows starting at slot-k+1 .. slot cover the event
        starts = (np.repeat(slot, k)
                  - np.tile(np.arange(k - 1, -1, -1, dtype=np.int64), len(slot)))
        df = pd.DataFrame({
            "window_start_slot": starts,
            "n_events": np.ones(len(starts), np.int64),
            "sum_value_cents": np.repeat(cents, k),
        })
        return df.groupby("window_start_slot", as_index=False).sum()

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("window_start_slot")
        .sum(["n_events", "sum_value_cents"])
        .to_pandas()
    )
    out.columns = ["window_start_slot", "n_events", "sum_value_cents"]
    out["n_events"] = out["n_events"].astype(np.int64)
    out["sum_value_cents"] = out["sum_value_cents"].astype(np.int64)
    return out.sort_values("window_start_slot").reset_index(drop=True)


# ------------------------------------------- stratified hash sampling
_STRATA_RATES = (  # (l_returnflag value, rate_num, rate_den) — AND default
    ("R", 1, 2),    # oversample the rare/interesting stratum
    ("A", 1, 8),
)
_STRATA_DEFAULT = (1, 32)


def q_stratified_sample(sf_dir: str) -> rd.Dataset:
    """Deterministic STRATIFIED sampling: a different multiplicative-hash
    keep-rate per stratum (returnflag here; language/quality tier in a
    training corpus) — how a pipeline over-samples rare strata without a
    shuffle or a seed exchange.  Same pure-integer predicate as
    ``q_hash_sample``, so the SAME rows are selected on any cluster size,
    any block layout, and in the SQL oracle; per-row thresholds assemble
    vectorized from the stratum column (no per-row Python)."""
    flags = [f for f, _, _ in _STRATA_RATES]
    threshs = np.array(
        [(_SAMPLE_MOD * n) // d for _, n, d in _STRATA_RATES]
        + [(_SAMPLE_MOD * _STRATA_DEFAULT[0]) // _STRATA_DEFAULT[1]],
        np.uint64)

    def kern(t: pa.Table) -> pa.Table:
        ok = np.asarray(t["l_orderkey"], np.uint64)
        ln = np.asarray(t["l_linenumber"], np.uint64)
        h = (ok * np.uint64(_SAMPLE_MULT) + ln * np.uint64(_SAMPLE_MIX)) % np.uint64(_SAMPLE_MOD)
        rf = np.asarray(t["l_returnflag"]).astype(str)
        stratum = np.full(len(rf), len(flags), np.int64)  # default bucket
        for i, f in enumerate(flags):
            stratum[rf == f] = i
        t = t.filter(pa.array(h < threshs[stratum]))
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "l_returnflag": t["l_returnflag"],
            "qty_c": pa.array(_cents(np.asarray(t["l_quantity"])), pa.int64()),
        })

    return _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"]
                 ).map_batches(kern, batch_format="pyarrow")


# ------------------------------------------- keyset INTERSECT
def q_intersect_keys(sf_dir: str, year_a: int = 1995,
                     year_b: int = 1996) -> pd.DataFrame:
    """Key-set INTERSECT without a join: customers with orders in BOTH
    ``year_a`` and ``year_b`` — the companion of ``q_except_keys``, same
    single-pass flag-aggregate shape (set intersection as a groupby over
    per-batch membership partials, no self-join shuffle)."""
    a_lo, a_hi = np.datetime64(f"{year_a}-01-01", "us"), np.datetime64(f"{year_a + 1}-01-01", "us")
    b_lo, b_hi = np.datetime64(f"{year_b}-01-01", "us"), np.datetime64(f"{year_b + 1}-01-01", "us")
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def partial(t: pa.Table) -> pd.DataFrame:
        d = np.asarray(t["o_orderdate"]).astype("datetime64[us]")
        in_a = ((d >= a_lo) & (d < a_hi)).astype(np.int64)
        in_b = ((d >= b_lo) & (d < b_hi)).astype(np.int64)
        df = pd.DataFrame({
            "c_custkey": np.asarray(t["o_custkey"], np.int64),
            "in_a": in_a, "in_b": in_b,
        })
        df = df[(df["in_a"] > 0) | (df["in_b"] > 0)]
        return df.groupby("c_custkey", as_index=False).sum()

    agg = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .sum(["in_a", "in_b"])
        .to_pandas()
    )
    if agg.empty:
        return pd.DataFrame({"c_custkey": pd.Series([], dtype=np.int64)})
    agg.columns = ["c_custkey", "in_a", "in_b"]
    out = agg[(agg["in_a"] > 0) & (agg["in_b"] > 0)][["c_custkey"]]
    out["c_custkey"] = out["c_custkey"].astype(np.int64)
    return out.sort_values("c_custkey").reset_index(drop=True)


# ------------------------------------------- NTILE / cume_dist windows
def q_ntile_orders(sf_dir: str, buckets: int = 4) -> pd.DataFrame:
    """ANSI ntile(buckets) PARTITION BY customer ORDER BY (price, orderkey):
    equal-depth buckets, the first n%b buckets one row deeper.  Same window
    plan as ``q_percent_rank_orders``: hash-shuffle by customer, per-group
    vectorized position arithmetic — no global sort, no driver pass."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "price_c": pa.array(_cents(np.asarray(t["o_totalprice"])), pa.int64()),
        })

    def tile_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["price_c", "o_orderkey"]).reset_index(drop=True)
        n = len(g)
        idx = np.arange(n, dtype=np.int64)
        q, r = divmod(n, buckets)
        if q == 0:
            tile = idx + 1  # fewer rows than buckets: one row per bucket
        else:
            big = r * (q + 1)  # rows covered by the (q+1)-deep buckets
            tile = np.where(idx < big, idx // (q + 1), r + (idx - big) // q) + 1
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
            "o_custkey": g["o_custkey"].to_numpy(np.int64),
            "price_c": g["price_c"].to_numpy(np.int64),
            "tile": tile,
        })

    out = (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("o_custkey")
        .map_groups(tile_group, batch_format="pandas")
        .to_pandas()
    )
    return (out.sort_values(["o_custkey", "price_c", "o_orderkey"])
            .reset_index(drop=True)
            [["o_orderkey", "o_custkey", "price_c", "tile"]])


def q_cume_dist_orders(sf_dir: str) -> pd.DataFrame:
    """ANSI cume_dist() PARTITION BY customer ORDER BY price, emitted as the
    EXACT integer pair (cd_num = rows with price ≤ current incl. peers,
    n_part = partition size) instead of a float ratio — bit-for-bit
    comparable with the oracle, no rounding rule to disagree on.  Peer
    groups (price ties) share cd_num, computed with one searchsorted over
    the group's sorted prices."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "price_c": pa.array(_cents(np.asarray(t["o_totalprice"])), pa.int64()),
        })

    def cd_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["price_c", "o_orderkey"]).reset_index(drop=True)
        p = g["price_c"].to_numpy(np.int64)
        cd_num = np.searchsorted(p, p, side="right").astype(np.int64)
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
            "o_custkey": g["o_custkey"].to_numpy(np.int64),
            "price_c": p,
            "cd_num": cd_num,
            "n_part": np.full(len(g), len(g), np.int64),
        })

    out = (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("o_custkey")
        .map_groups(cd_group, batch_format="pandas")
        .to_pandas()
    )
    return (out.sort_values(["o_custkey", "price_c", "o_orderkey"])
            .reset_index(drop=True)
            [["o_orderkey", "o_custkey", "price_c", "cd_num", "n_part"]])


# ------------------------------------------- left outer join + aggregate
def q_left_join_order_counts(sf_dir: str) -> pd.DataFrame:
    """customer LEFT OUTER JOIN its order aggregates: every customer appears
    exactly once; customers with no orders carry zeros (the reporting shape
    an inner join silently drops).  The fact side pre-aggregates to one row
    per customer BELOW the exchange (combiner), so the outer join moves
    O(customers) rows on each side, never O(orders)."""
    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "o_custkey": np.asarray(t["o_custkey"], np.int64),
            "n_orders": np.ones(len(t), np.int64),
            "total_c": _cents(np.asarray(t["o_totalprice"])),
        })
        return df.groupby("o_custkey", as_index=False).sum()

    agg = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .sum(["n_orders", "total_c"])
        .map_batches(
            lambda t: t.rename_columns(["o_custkey", "n_orders", "total_c"]),
            batch_format="pyarrow",
        )
    )
    joined = cust.join(
        agg, join_type="left_outer",
        num_partitions=adaptive_parts(cust.count(), rows_per_part=250_000),
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "c_custkey": t["c_custkey"],
            "c_mktsegment": t["c_mktsegment"],
            "n_orders": pc.fill_null(t["n_orders"], 0),
            "total_c": pc.fill_null(t["total_c"], 0),
        })

    out = joined.map_batches(fill, batch_format="pyarrow").to_pandas()
    return (
        out.astype({"c_custkey": np.int64, "n_orders": np.int64, "total_c": np.int64})
        .sort_values("c_custkey").reset_index(drop=True)
    )


# ------------------------------------------- deterministic dataset split
def q_train_val_test_split(
    sf_dir: str, val_permille: int = 100, test_permille: int = 100
) -> pd.DataFrame:
    """Deterministic train/val/test split of the documents table — the
    standard training-data partitioning op, as a stateless integer-hash
    predicate (same family as ``q_hash_sample``): split(doc) depends only on
    ``doc_id``, so membership is stable across cluster sizes, block layouts,
    reruns, and the SQL oracle; the three splits are disjoint and exhaustive
    by construction.  No shuffle — each batch labels itself."""
    lo_test = (_SAMPLE_MOD * test_permille) // 1000
    lo_val = (_SAMPLE_MOD * (test_permille + val_permille)) // 1000

    def kern(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], np.uint64)
        h = (ids * np.uint64(_SAMPLE_MULT)) % np.uint64(_SAMPLE_MOD)
        split = np.where(
            h < np.uint64(lo_test), "test",
            np.where(h < np.uint64(lo_val), "val", "train"),
        )
        return pa.table({
            "doc_id": t["doc_id"],
            "split": pa.array(split, pa.string()),
        })

    out = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(kern, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# ------------------------------------------- windowed event dedup
def q_dedup_events_windowed(sf_dir: str, gap_min: int = 30) -> pd.DataFrame:
    """Windowed log dedup: an event survives unless the SAME (user, type)
    emitted within the previous ``gap_min`` minutes — the standard
    at-ingest suppression of retry/duplicate beacons.  Hash-partition by the
    dedup key, per-group vectorized sort + timestamp diff (one kernel, no
    per-row Python); ties at the exact same timestamp keep the lowest
    event_id and suppress the rest."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    gap_us = np.int64(gap_min) * 60_000_000

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"])
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same_key = np.r_[False, (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])]
        close = np.r_[False, (ts[1:] - ts[:-1]) <= gap_us]
        keep = ~(same_key & close)
        out = g[keep]
        return pd.DataFrame({
            "event_id": out["event_id"].to_numpy(np.int64),
            "user_id": out["user_id"].to_numpy(np.int64),
            "event_type": out["event_type"].to_numpy(),
            "ts": out["ts"].to_numpy(),
        })

    out = (
        ds.groupby("user_id")
        .map_groups(kern, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


# ------------------------------------------- ROWS-frame moving aggregate
def q_moving_avg_events(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-user moving average of event value over the last ``k`` rows
    (ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW — the rows-frame window
    class, distinct from the RANGE/peer frames of cume_dist and the
    time-band frames of the sliding window).  Hash-partition by user, one
    vectorized prefix-sum + shifted-difference kernel per group; emitted as
    the exact integer pair (sum_micro, n_frame) so no float rounding rule
    can disagree with the oracle."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        uid = g["user_id"].to_numpy(np.int64)
        # half-AWAY-from-zero like DuckDB's round(); np.round is half-even
        # and diverges when value*1e6 lands exactly on .5 (the percent_rank
        # lesson from ADVICE r3)
        raw = g["value"].to_numpy(np.float64) * 1_000_000
        v = (np.sign(raw) * np.floor(np.abs(raw) + 0.5)).astype(np.int64)
        # per-user row index via run-boundary scan (groups are co-located)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_user)
        run_id = np.cumsum(new_user) - 1
        pos = np.arange(len(g)) - starts[run_id]
        c = np.cumsum(v)
        run_base = np.where(new_user, 0, 1)  # cumsum up to run start
        start_excl = np.r_[0, c][starts[run_id]]  # sum before the run
        cum_in_run = c - start_excl
        lag_pos = np.maximum(pos - k, -1)
        lag_cum = np.where(
            lag_pos < 0, 0,
            cum_in_run[starts[run_id] + np.maximum(lag_pos, 0)],
        )
        sum_k = cum_in_run - lag_cum
        n_frame = np.minimum(pos + 1, k).astype(np.int64)
        del run_base
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": uid,
            "sum_micro": sum_k,
            "n_frame": n_frame,
        })

    out = (
        ds.groupby("user_id")
        .map_groups(kern, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


def q_semi_join(sf_dir: str) -> pd.DataFrame:
    """Customers WITH at least one finished ('F') order — the SEMI-join
    complement of ``q_anti_join``, same plan: the distinct key set ships
    once as object-store blocks (Bloom filter at scale), each customer batch
    filters itself with one vectorized ``is_in`` — no shuffle, the fact
    table never leaves its scan."""
    from marc_record_merge_melindautils_ray.functions.util import maybe_get, task_stage

    def f_keys(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["o_orderstatus"], "F")
        return pa.table({"k": pc.unique(t.filter(keep)["o_custkey"].combine_chunks())})

    keys_ds = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
        .map_batches(f_keys, batch_format="pyarrow")
        .groupby("k")
        .count()
        .materialize()
    )
    key_refs = keys_ds.to_arrow_refs()

    class SemiFilter:
        def __init__(self, refs):
            parts = []
            for r in refs:
                t = maybe_get(r)
                if len(t) and "k" in t.column_names:
                    col = t["k"]
                    parts.append(col.combine_chunks()
                                 if isinstance(col, pa.ChunkedArray) else col)
            self.keys = pa.concat_arrays(parts) if parts else pa.array([], pa.int64())

        def __call__(self, t: pa.Table) -> pa.Table:
            keep = pc.is_in(t["c_custkey"], value_set=self.keys)
            return t.filter(keep).select(["c_custkey", "c_name"])

    out = (
        _read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(task_stage(SemiFilter, (key_refs,), key=("semi", *key_refs)),
                     batch_format="pyarrow")
        .to_pandas()
    )
    return (
        out.astype({"c_custkey": np.int64})
        .sort_values("c_custkey").reset_index(drop=True)
    )


# ------------------------------------------- FULL OUTER join (daily volumes)
def q_full_outer_daily(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER JOIN shape: per-day order count vs per-day shipped-line
    stats on the calendar date.  Shipdates trail orderdates by the receipt
    lag, so BOTH unmatched sides genuinely fire on the testdata (~1.4k
    one-sided dates at sf0.001).

    Plan: the outer join is expressed as a UNION of side-tagged partial
    aggregates — each side combines to at most one row per (day, batch)
    below the exchange, the single ``groupby(day)`` finishes both sides and
    the zero-fill at once.  No join operator, no fact row ever shuffles."""

    # partials and the shuffle run on INTEGER epoch-days (datetime_as_string
    # over the full fact table cost most of a measured 15 s at sf0.01);
    # stringification happens once on the ~2.4 k-row result
    def order_partial(t: pa.Table) -> pd.DataFrame:
        days = np.asarray(t["o_orderdate"]).astype("datetime64[D]").astype(np.int64)
        d, n = np.unique(days, return_counts=True)
        z = np.zeros(len(d), np.int64)
        return pd.DataFrame({"day_i": d, "n_orders": n.astype(np.int64),
                             "n_ship_lines": z, "sum_qty_c": z})

    def ship_partial(t: pa.Table) -> pd.DataFrame:
        days = np.asarray(t["l_shipdate"]).astype("datetime64[D]").astype(np.int64)
        qty_c = _cents(np.asarray(t["l_quantity"], np.float64))
        d, inv, n = np.unique(days, return_counts=True, return_inverse=True)
        qsum = np.zeros(len(d), np.int64)
        np.add.at(qsum, inv, qty_c)
        return pd.DataFrame({"day_i": d, "n_orders": np.zeros(len(d), np.int64),
                             "n_ship_lines": n.astype(np.int64),
                             "sum_qty_c": qsum})

    orders = _read(sf_dir, "orders", ["o_orderdate"]).map_batches(
        order_partial, batch_format="pyarrow")
    ship = _read(sf_dir, "lineitem", ["l_shipdate", "l_quantity"]).map_batches(
        ship_partial, batch_format="pyarrow")
    # the fold input is O(days × batches) partial rows — CALENDAR-bounded,
    # so a driver pandas groupby finishes it; the distributed sort-aggregate
    # here cost a measured 17.8 s of pure blocks×partitions fixed overhead
    # on 56 k tiny rows (64 input blocks × 64 sort partitions, ~1.5 s per
    # near-empty unit) vs ~0.01 s of actual combining work.
    # GUARD: the batch term grows with corpus — fold rows ≈ days × input
    # blocks, i.e. ~2,500 days × blocks.  The driver fold holds while
    # blocks ≲ 10^4 (≈ 25 M tiny rows); past that, pre-combine per task
    # (coalesce blocks or add a combiner map) before unioning here.
    parts = orders.union(ship).to_pandas()
    out = parts.groupby("day_i", as_index=False).sum()
    out["day"] = np.datetime_as_string(
        out["day_i"].to_numpy(np.int64).astype("datetime64[D]"), unit="D")
    out = out[["day", "n_orders", "n_ship_lines", "sum_qty_c"]]
    for c in ("n_orders", "n_ship_lines", "sum_qty_c"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("day").reset_index(drop=True)


# ------------------------------------------- LEAD/LAG + FIRST/LAST window
def q_lead_lag_events(sf_dir: str) -> pd.DataFrame:
    """Row-navigation window functions per user ordered by (ts, event_id):
    LAG / LEAD with a '-' default plus FIRST_VALUE / LAST_VALUE over the
    whole partition — the four navigation shapes in one pass.  Hash-partition
    by user co-locates each user's rows; one vectorized sort + shift kernel
    per partition (group run-ids, no per-group Python)."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64
    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    nparts = adaptive_parts(ds.count())

    def add_part(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"], np.int64).view(np.uint64)
        part = (splitmix64(u) % np.uint64(nparts)).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype=np.int64),
                "user_id": pd.Series([], dtype=np.int64),
                "prev_type": pd.Series([], dtype=str),
                "next_type": pd.Series([], dtype=str),
                "first_type": pd.Series([], dtype=str),
                "last_type": pd.Series([], dtype=str),
            })
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy(np.int64)
        typ = g["event_type"].to_numpy().astype(object)
        n = len(g)
        new_grp = np.r_[True, uid[1:] != uid[:-1]]          # partition starts
        prev = np.r_[np.array(["-"], object), typ[:-1]]
        prev[new_grp] = "-"
        last_of_grp = np.r_[new_grp[1:], True]              # partition ends
        nxt = np.r_[typ[1:], np.array(["-"], object)]
        nxt[last_of_grp] = "-"
        starts = np.flatnonzero(new_grp)
        runlen = np.diff(np.r_[starts, n])
        first = np.repeat(typ[starts], runlen)
        last = np.repeat(typ[np.flatnonzero(last_of_grp)], runlen)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": uid,
            "prev_type": prev.astype(str),
            "next_type": nxt.astype(str),
            "first_type": first.astype(str),
            "last_type": last.astype(str),
        })

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


# ------------------------------------------------------------- CDC upsert
def q_upsert_merge(sf_dir: str) -> pd.DataFrame:
    """MERGE INTO (CDC upsert): apply a delta stream of update/delete/insert
    ops to the orders base table — the lakehouse ingest shape.  The delta is
    derived deterministically from the base (custkey%10==7 rows split by
    orderkey%3 into U/D/I) so both engines construct the identical stream
    with no side files.

    Plan: base and delta rows are tagged and co-partitioned on ONE key-hash
    exchange; each partition applies its ops vectorized (a sorted searchsorted
    membership per op class — no per-row Python, no join operator).  Updates
    on missing keys and deletes of missing keys are defined no-ops; inserts
    always append."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64
    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    nparts = adaptive_parts(ds.count())

    def tag_rows(t: pa.Table) -> pd.DataFrame:
        k = np.asarray(t["o_orderkey"], np.int64)
        ck = np.asarray(t["o_custkey"], np.int64)
        pc = _cents(np.asarray(t["o_totalprice"], np.float64))
        base = pd.DataFrame({"k": k, "price_c": pc, "src": "B"})
        m = ck % 10 == 7
        ku, kd, ki = k[m & (k % 3 == 0)], k[m & (k % 3 == 1)], k[m & (k % 3 == 2)]
        delta = pd.DataFrame({
            "k": np.r_[ku, kd, ki + 10_000_000],
            "price_c": np.r_[pc[m & (k % 3 == 0)] + 100_000,
                             np.zeros(len(kd), np.int64),
                             pc[m & (k % 3 == 2)]],
            "src": np.r_[np.full(len(ku), "U"), np.full(len(kd), "D"),
                         np.full(len(ki), "I")],
        })
        out = pd.concat([base, delta], ignore_index=True)
        out["part"] = (splitmix64(out["k"].to_numpy(np.int64).view(np.uint64))
                       % np.uint64(nparts)).astype(np.int64)
        return out

    def apply_ops(g: pd.DataFrame) -> pd.DataFrame:
        b = g[g["src"] == "B"]
        keys = b["k"].to_numpy(np.int64)
        price = b["price_c"].to_numpy(np.int64).copy()
        op = np.full(len(b), "=", object)
        order = np.argsort(keys, kind="stable")
        skeys = keys[order]
        for code in ("U", "D"):
            d = g[g["src"] == code]
            pos = np.searchsorted(skeys, d["k"].to_numpy(np.int64))
            hit = (pos < len(skeys)) & (skeys[np.minimum(pos, len(skeys) - 1)]
                                        == d["k"].to_numpy(np.int64))
            rows = order[pos[hit]]
            if code == "U":
                price[rows] = d["price_c"].to_numpy(np.int64)[hit]
                op[rows] = "U"
            else:
                op[rows] = "D"
        keep = op != "D"
        ins = g[g["src"] == "I"]
        return pd.DataFrame({
            "orderkey": np.r_[keys[keep], ins["k"].to_numpy(np.int64)],
            "price_c": np.r_[price[keep], ins["price_c"].to_numpy(np.int64)],
            "op": np.r_[op[keep], np.full(len(ins), "I", object)].astype(str),
        })

    out = (
        ds.map_batches(tag_rows, batch_format="pyarrow")
        .groupby("part").map_groups(apply_ops, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("orderkey").reset_index(drop=True)


# ------------------------------------------------- FILTER-clause aggregates
def q_filtered_aggregates(sf_dir: str) -> pd.DataFrame:
    """Conditional aggregates per customer segment — the ``count(*) FILTER
    (WHERE …)`` shape: total orders, urgent orders, high-value orders, and
    high-value revenue in ONE pass (each filter arm is a vectorized mask
    feeding the same per-batch partial row; no per-arm scans)."""
    import ray

    from marc_record_merge_melindautils_ray.functions.util import maybe_get

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    seg_ref = ray.put(dict(zip(cust["c_custkey"].to_numpy(np.int64),
                               cust["c_mktsegment"].astype(str))))

    def partial(t: pa.Table) -> pd.DataFrame:
        seg = maybe_get(seg_ref)  # broadcast once, read from plasma per task
        ck = np.asarray(t["o_custkey"], np.int64)
        urgent = np.asarray(t["o_orderpriority"]).astype(str) == "1-URGENT"
        price_c = _cents(np.asarray(t["o_totalprice"], np.float64))
        high = price_c > 15_000_000  # > $150k
        df = pd.DataFrame({
            "segment": pd.Series(ck).map(seg).fillna("?"),
            "n_orders": np.int64(1),
            "n_urgent": urgent.astype(np.int64),
            "n_high_value": high.astype(np.int64),
            "high_value_rev_c": np.where(high, price_c, 0),
        })
        return df.groupby("segment", as_index=False).sum()

    out = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("segment")
        .sum(["n_orders", "n_urgent", "n_high_value", "high_value_rev_c"])
        .to_pandas()
    )
    out.columns = ["segment", "n_orders", "n_urgent", "n_high_value",
                   "high_value_rev_c"]
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("segment").reset_index(drop=True)


# --------------------------------------- correlated EXISTS with a threshold
def q_busy_month_customers(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Customers with ≥ k orders in SOME single calendar month — the
    correlated-EXISTS-with-aggregate-threshold shape (a plain per-customer
    count cannot express "in any one month").  Per-batch (custkey, month)
    partial counts combine below the exchange; one groupby finishes the
    month counts; a max-per-customer reduce applies the threshold — three
    tiny aggregate levels, fact rows never shuffle."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def partial(t: pa.Table) -> pd.DataFrame:
        ck = np.asarray(t["o_custkey"], np.int64)
        m = np.asarray(t["o_orderdate"]).astype("datetime64[M]").astype(np.int64)
        df = pd.DataFrame({"ck": ck, "m": m, "n": np.int64(1)})
        return df.groupby(["ck", "m"], as_index=False).sum()

    months = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["ck", "m"]).sum("n")
    )

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"sum(n)": "n"})
        agg = df.groupby("ck", as_index=False)["n"].max()
        return agg.rename(columns={"n": "max_month_orders"})

    out = (
        months.map_batches(best, batch_format="pandas")
        .groupby("ck").max("max_month_orders")
        .to_pandas()
    )
    out.columns = ["o_custkey", "max_month_orders"]
    out["max_month_orders"] = out["max_month_orders"].astype(np.int64)
    out = out[out["max_month_orders"] >= k]
    return out.sort_values("o_custkey").reset_index(drop=True)
