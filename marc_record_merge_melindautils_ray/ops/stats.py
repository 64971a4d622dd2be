"""Statistical / profiling operators over the driver tables.

Each operator is a single streaming pass with MERGEABLE per-batch partials
(the combiner pattern): moment sketches for correlation, bucket counts for
histograms, (key, value) partial counts for modes, hash-partitioned lag
scans for inter-arrival deltas.  Nothing materializes the input on the
driver; every shuffle moves key-cardinality partials, not rows.

Reference ancestry: the reference's only aggregation is per-record field
counting (``lib/mergeability-validators.js:117-122``); these are the outer
profiling layers a corpus-scale dedup/training-data pipeline needs
(SURVEY.md §2.7 aggregations).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from marc_record_merge_melindautils_ray.ops.relational import _read
from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts


# ------------------------------------------------------------- grouped corr
def q_group_corr(sf_dir: str) -> pd.DataFrame:
    """Pearson correlation of (l_quantity, l_extendedprice) per
    l_returnflag via mergeable moment sketches: each batch emits
    (n, Σx, Σy, Σx², Σy², Σxy) per group — six float64s — and the final
    correlation is computed from the summed moments.  One pass, one tiny
    shuffle over the 3-key group domain; the classic distributed-statistics
    shape (no per-row data ever crosses the exchange)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        # SQL corr() skips rows where either operand is NULL
        t = t.drop_null()
        x = np.asarray(t["l_quantity"], dtype=np.float64)
        y = np.asarray(t["l_extendedprice"], dtype=np.float64)
        df = pd.DataFrame({
            "l_returnflag": t["l_returnflag"].to_pandas(),
            "n": np.ones(len(x)),
            "sx": x, "sy": y, "sxx": x * x, "syy": y * y, "sxy": x * y,
        })
        return df.groupby("l_returnflag", as_index=False).sum()

    m = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .sum(["n", "sx", "sy", "sxx", "syy", "sxy"])
        .to_pandas()
    )
    m.columns = ["l_returnflag", "n", "sx", "sy", "sxx", "syy", "sxy"]
    cov = (m["n"] * m["sxy"] - m["sx"] * m["sy"]).to_numpy()
    var = ((m["n"] * m["sxx"] - m["sx"] ** 2)
           * (m["n"] * m["syy"] - m["sy"] ** 2)).to_numpy()
    # zero-variance / singleton groups: SQL corr() returns NULL, not NaN-by-
    # division — emit NaN deliberately (pandas NULL) without the warning
    corr = np.where(var > 0, np.divide(cov, np.sqrt(np.where(var > 0, var, 1.0))), np.nan)
    out = pd.DataFrame({
        "l_returnflag": m["l_returnflag"],
        # round to 6 dp: moment-order float noise is ~1e-12, the oracle
        # rounds identically, so value-hash comparison is exact
        "corr_qty_price": pd.Series(corr).round(6),
    })
    return out.sort_values("l_returnflag").reset_index(drop=True)


# --------------------------------------------------------------- histogram
def q_value_histogram(sf_dir: str, bucket_width: float = 100.0) -> pd.DataFrame:
    """Fixed-width histogram of the event value distribution: per-batch
    bucket counts (a dict-sized partial) → one tiny groupby-sum over the
    bucket domain.  The profiling primitive for corpus QA dashboards."""
    ds = _read(sf_dir, "events", ["value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        # NULL values are excluded on both sides (the oracle SQL filters
        # value IS NOT NULL): floor(NaN).astype(int64) would otherwise
        # fabricate an INT64_MIN bucket
        v = np.asarray(t.drop_null()["value"], dtype=np.float64)
        b = np.floor(v / bucket_width).astype(np.int64)
        bins, counts = np.unique(b, return_counts=True)
        return pd.DataFrame({"bucket": bins, "n": counts.astype(np.int64)})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum(["n"])
        .to_pandas()
    )
    out.columns = ["bucket", "n"]
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("bucket").reset_index(drop=True)


# ------------------------------------------------------------- grouped mode
def q_mode_event_type(sf_dir: str) -> pd.DataFrame:
    """Per-user modal event type (ties → lexicographically smallest):
    per-batch (user, type) partial counts → hash-partition by user → ONE
    vectorized sum + argmax per partition.  The categorical-mode aggregate
    Ray Data lacks natively, built from the same partial-count machinery as
    the wordcount combiner."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    nparts = adaptive_parts(ds.count(), rows_per_part=50_000, hi=128)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": np.asarray(t["user_id"], dtype=np.int64),
            "event_type": t["event_type"].to_pandas(),
            "n": np.ones(len(t), dtype=np.int64),
        })
        g = df.groupby(["user_id", "event_type"], as_index=False).sum()
        u = g["user_id"].to_numpy(np.int64).view(np.uint64)
        g["part"] = (splitmix64(u) % np.uint64(nparts)).astype(np.int64)
        return g

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        # co-located by user: global counts per (user, type), then the
        # stable-sort argmax picks (n DESC, event_type ASC) per user
        g = g.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        g = g.sort_values(
            ["user_id", "n", "event_type"], ascending=[True, False, True]
        )
        top = g.drop_duplicates("user_id", keep="first")
        return pd.DataFrame({
            "user_id": top["user_id"].to_numpy(np.int64),
            "mode_event_type": top["event_type"].to_numpy(object),
            "n": top["n"].to_numpy(np.int64),
        })

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    return (
        out.drop(columns=["part"], errors="ignore")
        .sort_values("user_id")
        .reset_index(drop=True)
    )


# --------------------------------------------------------- lag / deltas
def q_event_deltas(sf_dir: str) -> pd.DataFrame:
    """Per-user inter-arrival statistics (LAG window analog): hash-partition
    by user co-locates each user's events, one vectorized sort + diff per
    partition computes every user's gap sequence, aggregated to
    (n_gaps, sum_gap_us, max_gap_us) — integer µs end to end, so the oracle
    comparison is exact.  Users with a single event emit n_gaps=0."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    nparts = adaptive_parts(ds.count())

    def add_part(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"], np.int64).view(np.uint64)
        part = (splitmix64(u) % np.uint64(nparts)).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        uid = g["user_id"].to_numpy(np.int64)
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(g) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "n_gaps": pd.Series([], dtype=np.int64),
                "sum_gap_us": pd.Series([], dtype=np.int64),
                "max_gap_us": pd.Series([], dtype=np.int64),
            })
        same = np.r_[False, uid[1:] == uid[:-1]]
        gap = np.r_[np.int64(0), us[1:] - us[:-1]]
        df = pd.DataFrame({"user_id": uid, "gap": np.where(same, gap, 0),
                           "is_gap": same.astype(np.int64)})
        agg = df.groupby("user_id", as_index=False).agg(
            n_gaps=("is_gap", "sum"), sum_gap_us=("gap", "sum"),
        )
        mx = df[df["is_gap"] == 1].groupby("user_id", as_index=False)["gap"].max()
        agg = agg.merge(mx.rename(columns={"gap": "max_gap_us"}),
                        on="user_id", how="left")
        agg["max_gap_us"] = agg["max_gap_us"].fillna(0).astype(np.int64)
        return agg

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    return (
        out.drop(columns=["part"], errors="ignore")
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def q_column_profile(sf_dir: str) -> pd.DataFrame:
    """Data-quality column profiler over the orders table: one row per
    profiled column with exact row/null/distinct counts and the modal value
    (ties → lexicographically smallest).  Shape: per-batch partial
    (column, value) counts — the wordcount combiner again — so the shuffle
    carries one row per distinct value per batch, never the fact rows;
    distinct/mode both read off ONE aggregated value table.  The profiler is
    the ingest-time sanity pass a 100 TB pipeline runs before anything else
    (skewed keys, null floods, and constant columns all surface here)."""
    cols = ["o_orderpriority", "o_orderstatus", "o_custkey"]
    ds = _read(sf_dir, "orders", cols)

    def partial(t: pa.Table) -> pd.DataFrame:
        out = []
        n = len(t)
        for c in cols:
            vals = t[c].to_pandas()
            nulls = int(vals.isna().sum())
            vc = vals.dropna().astype(str).value_counts()
            out.append(pd.DataFrame({
                "col": c, "val": vc.index.to_numpy(),
                "n": vc.to_numpy().astype(np.int64),
                "nulls": np.int64(0), "rows": np.int64(0),
            }))
            # one bookkeeping row per (batch, col) carries row/null tallies
            out.append(pd.DataFrame({
                "col": [c], "val": ["\x00meta"], "n": [np.int64(0)],
                "nulls": [np.int64(nulls)], "rows": [np.int64(n)],
            }))
        return pd.concat(out, ignore_index=True)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["col", "val"])
        .sum(["n", "nulls", "rows"])
        .to_pandas()
    )
    agg.columns = ["col", "val", "n", "nulls", "rows"]
    rows = []
    for c, g in agg.groupby("col"):
        meta = g[g["val"] == "\x00meta"]
        vals = g[g["val"] != "\x00meta"].sort_values(
            ["n", "val"], ascending=[False, True]
        )
        rows.append({
            "col": c,
            "n_rows": np.int64(meta["rows"].sum()),
            "n_nulls": np.int64(meta["nulls"].sum()),
            "n_distinct": np.int64(len(vals)),
            "top_value": vals["val"].iloc[0] if len(vals) else None,
            "top_count": np.int64(vals["n"].iloc[0]) if len(vals) else np.int64(0),
        })
    return (
        pd.DataFrame(rows).sort_values("col").reset_index(drop=True)
        .astype({"n_rows": np.int64, "n_nulls": np.int64,
                 "n_distinct": np.int64, "top_count": np.int64})
    )


def q_props_extract(sf_dir: str) -> pd.DataFrame:
    """Semi-structured column flattening: extract the numeric ``k`` field
    from the JSON ``props`` column and aggregate it per event type — the
    metadata-sidecar pattern (training corpora carry provenance/config as
    JSON strings; extraction must be a vectorized kernel, not a per-row
    ``json.loads`` loop).  The kernel extracts with ONE vectorized regex
    over the column; per-batch partial (type, sum, n) rows ride a tiny
    groupby — the fact rows never shuffle."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = (
            df["props"].fillna("")
            .str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
            .astype("float64")  # NaN for missing keys
        )
        out = pd.DataFrame({
            "event_type": df["event_type"],
            "sum_k": k.fillna(0).astype(np.int64),
            "n_with_k": k.notna().astype(np.int64),
            "n": np.ones(len(df), np.int64),
        })
        return out.groupby("event_type", as_index=False).sum()

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .sum(["sum_k", "n_with_k", "n"])
        .to_pandas()
    )
    out.columns = ["event_type", "sum_k", "n_with_k", "n"]
    return (
        out.astype({"sum_k": np.int64, "n_with_k": np.int64, "n": np.int64})
        .sort_values("event_type").reset_index(drop=True)
    )


def q_funnel_counts(sf_dir: str,
                    steps: tuple = ("signup", "click", "purchase")
                    ) -> pd.DataFrame:
    """Ordered funnel analysis: how many users reach each step, where step
    k+1 counts only events STRICTLY after the user's step-k completion time
    (first-touch semantics: each step's completion is the MIN qualifying
    timestamp).  The classic product-analytics query, and a sequential
    cross-type dependency no single groupby expresses.

    Scale shape: the read prunes to funnel-type rows only (columns + row
    filter); one user-hash shuffle co-locates each user's funnel events;
    each partition computes every resident user's full cascade vectorized
    (per-type grouped mins, then the strict-after filter per step) and
    emits ONE partial count row per step — the driver sums a
    (partitions × steps)-row frame.  Nothing user-sized ever lands on the
    driver."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64

    steps = tuple(steps)
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    nparts = adaptive_parts(ds.count())

    def add_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_in(t["event_type"],
                              value_set=pa.array(list(steps), pa.string())))
        u = np.asarray(t["user_id"], np.int64).view(np.uint64)
        part = (splitmix64(u) % np.uint64(nparts)).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({"user_id": g["user_id"].to_numpy(np.int64),
                           "event_type": g["event_type"].to_numpy(object),
                           "us": us})
        counts = []
        reached = None  # Series: user_id -> completion time of prior step
        for step in steps:
            ev = df[df["event_type"] == step]
            if reached is not None:
                ev = ev.merge(reached.rename("prev_us"), left_on="user_id",
                              right_index=True, how="inner")
                ev = ev[ev["us"] > ev["prev_us"]]
            cur = ev.groupby("user_id")["us"].min()
            counts.append(len(cur))
            reached = cur
        return pd.DataFrame({
            "stage": np.arange(1, len(steps) + 1, dtype=np.int64),
            "event_type": list(steps),
            "n_users": np.asarray(counts, np.int64),
        })

    partials = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    out = (partials.groupby(["stage", "event_type"], as_index=False)["n_users"]
           .sum())
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("stage").reset_index(drop=True)


def q_retention_cohorts(sf_dir: str, max_offset: int = 7) -> pd.DataFrame:
    """Cohort retention matrix: users grouped by first-activity day, counted
    on each later day they return (``day_offset`` 0..``max_offset``) — the
    standard growth-analytics triangle.

    Scale shape: one user-hash shuffle of (user_id, day) pairs — days
    deduplicated per batch BEFORE the exchange, so the shuffle carries at
    most one row per (user, day) per batch, never raw events; each
    partition computes its resident users' cohort day + offsets vectorized
    and emits (cohort_day, day_offset, partial count) rows; the final
    groupby sums a calendar-sized frame (days × offsets), independent of
    user count."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    nparts = adaptive_parts(ds.count())

    def add_part(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"], np.int64)
        day = (np.asarray(t["ts"]).astype("datetime64[D]")
               .astype(np.int64))
        # batch-local (user, day) dedup before the shuffle
        key = np.stack([u, day], axis=1)
        uniq = np.unique(key, axis=0)
        part = (splitmix64(uniq[:, 0].view(np.uint64))
                % np.uint64(nparts)).astype(np.int64)
        return pa.table({
            "user_id": pa.array(uniq[:, 0], pa.int64()),
            "day": pa.array(uniq[:, 1], pa.int64()),
            "part": pa.array(part, pa.int64()),
        })

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        df = g[["user_id", "day"]].drop_duplicates()
        d0 = df.groupby("user_id")["day"].transform("min")
        off = (df["day"] - d0).astype(np.int64)
        keep = off <= max_offset
        out = pd.DataFrame({"cohort_day": d0[keep].astype(np.int64),
                            "day_offset": off[keep]})
        agg = out.groupby(["cohort_day", "day_offset"], as_index=False).size()
        return agg.rename(columns={"size": "n_users"})

    partials = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    out = (partials.groupby(["cohort_day", "day_offset"], as_index=False)
           ["n_users"].sum())
    out["n_users"] = out["n_users"].astype(np.int64)
    out["cohort_day"] = (
        out["cohort_day"].astype("datetime64[D]").dt.strftime("%Y-%m-%d")
    )
    return (out.sort_values(["cohort_day", "day_offset"])
            .reset_index(drop=True))


def q_value_outliers(sf_dir: str) -> pd.DataFrame:
    """Per-event-type 3σ outliers in EXACT integer arithmetic — the
    anomaly gate for ingest QA, with none of the float-comparison
    fragility: with cents ``c``, group count ``n``, sum ``S`` and
    square-sum ``Q``, ``|x − μ| > 3σ  ⟺  (n·c − S)² > 9·(n·Q − S²)``
    (both sides integers, so the oracle hash-compares exactly).

    Scale shape: pass 1 folds per-batch (n, S, Q) partials over the tiny
    event-type domain; pass 2 broadcasts the moment table and flags each
    row locally — no row ever shuffles."""
    import ray

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def moments(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        c = np.round(np.asarray(t["value"], np.float64) * 100).astype(np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "n": np.ones(len(c), np.int64),
                           "s": c, "q": c * c})
        return df.groupby("event_type", as_index=False).sum()

    m = (ds.map_batches(moments, batch_format="pyarrow").to_pandas()
         .groupby("event_type", as_index=False).sum())
    mom = {r.event_type: (int(r.n), int(r.s), int(r.q))
           for r in m.itertuples()}
    ref = ray.put(mom)

    def flag(t: pa.Table) -> pa.Table:
        mm = ray.get(ref)
        t = t.drop_null()
        et = t["event_type"].to_pandas().to_numpy(object)
        c = np.round(np.asarray(t["value"], np.float64) * 100).astype(np.int64)
        eid = np.asarray(t["event_id"], np.int64)
        ets = pd.Series(et)
        n = ets.map({k: v[0] for k, v in mm.items()}).to_numpy(np.int64)
        s = ets.map({k: v[1] for k, v in mm.items()}).to_numpy(np.int64)
        q = ets.map({k: v[2] for k, v in mm.items()}).to_numpy(np.int64)
        lhs = (n * c - s) ** 2
        rhs = 9 * (n * q - s * s)
        keep = lhs > rhs
        return pa.table({
            "event_id": pa.array(eid[keep], pa.int64()),
            "event_type": pa.array(et[keep].tolist(), pa.string()),
            "value_c": pa.array(c[keep], pa.int64()),
        })

    out = ds.map_batches(flag, batch_format="pyarrow").to_pandas()
    if out.empty:
        out = pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                            "event_type": pd.Series([], dtype=object),
                            "value_c": pd.Series([], dtype=np.int64)})
    return out.sort_values("event_id").reset_index(drop=True)


def q_expectations_check(sf_dir: str) -> pd.DataFrame:
    """Declarative data-quality expectations over the orders table — the
    ingest-gate validation pass (Great-Expectations-shaped): each rule is a
    vectorized predicate; one streaming pass emits per-batch violation
    partials; the result is one row per rule with its exact violation
    count.  Rules cover the expectation classes: non-null, value range,
    categorical domain, string format, and cross-column consistency."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority"])

    rules = [
        ("orderkey_not_null", lambda t: pd.isna(t["o_orderkey"])),
        ("custkey_positive", lambda t: ~(t["o_custkey"] > 0)),
        ("status_in_domain", lambda t: ~t["o_orderstatus"].isin(
            ["F", "O", "P"])),
        ("totalprice_range", lambda t: ~((t["o_totalprice"] > 0)
                                         & (t["o_totalprice"] < 1_000_000))),
        ("priority_format", lambda t: ~t["o_orderpriority"]
         .astype(str).str.match(r"^[1-5]-[A-Z ]+$")),
        ("date_in_window", lambda t: ~((t["o_orderdate"]
                                        >= pd.Timestamp("1992-01-01"))
                                       & (t["o_orderdate"]
                                          < pd.Timestamp("1999-01-01")))),
    ]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "rule": [name for name, _ in rules],
            "violations": np.array([int(pred(df).sum()) for _, pred in rules],
                                   np.int64),
        })

    out = (ds.map_batches(partial, batch_format="pandas").to_pandas()
           .groupby("rule", as_index=False)["violations"].sum())
    out["violations"] = out["violations"].astype(np.int64)
    return out.sort_values("rule").reset_index(drop=True)


def q_group_mad(sf_dir: str) -> pd.DataFrame:
    """Robust dispersion per event type: exact median and median-absolute-
    deviation, in EXACT integers — 2·median of n sorted integers is
    v[(n−1)//2] + v[n//2] (integer whether n is odd or even), so the table
    carries ``med_c_x2`` (2×median, cents) and ``mad_c_x4`` (4×MAD: devs are
    |2v−med_x2| in half-cent×2 units, doubled again by the outer median) and
    hash-compares with DuckDB's interpolated median bit-for-bit.  One
    event_type-hash exchange; both medians are one vectorized sort per
    group."""
    from marc_record_merge_melindautils_ray.functions.hashing import stable_str_hash

    ds = _read(sf_dir, "events", ["event_type", "value"])
    nparts = adaptive_parts(ds.count())

    def add_part(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"]).astype(object)
        part = (stable_str_hash(et) % np.uint64(nparts)).astype(np.int64)
        vc = np.round(np.asarray(t["value"], np.float64) * 100).astype(np.int64)
        return pa.table({
            "event_type": t["event_type"],
            "vc": pa.array(vc, pa.int64()),
            "part": pa.array(part, pa.int64()),
        })

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, sub in g.groupby("event_type"):
            v = np.sort(sub["vc"].to_numpy(np.int64))
            n = len(v)
            med_x2 = int(v[(n - 1) // 2] + v[n // 2])
            dev = np.sort(np.abs(2 * v - med_x2))
            mad_x4 = int(dev[(n - 1) // 2] + dev[n // 2])
            rows.append((et, n, med_x2, mad_x4))
        return pd.DataFrame(rows, columns=["event_type", "n", "med_c_x2",
                                           "mad_c_x4"]).astype(
            {"n": np.int64, "med_c_x2": np.int64, "mad_c_x4": np.int64})

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part").map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_type").reset_index(drop=True)


def q_group_regression(sf_dir: str) -> pd.DataFrame:
    """Per-group ordinary least squares as EXACT RATIONALS: regress value
    (cents) on days-since-corpus-start per event type, emitting the slope
    and intercept as (numerator, shared denominator) BIGINT columns —
    slope = slope_num/den, intercept = icept_num/den — so no division ever
    happens and the oracle hash-compares bit-for-bit (DuckDB's regr_slope
    would be float).  Day-grain x keeps the per-group SUMS inside int64 at
    any sf; the final cross products (n·sxy etc.) can exceed int64 at very
    large per-group row counts, so they are combined in exact Python ints
    and overflow-checked back to int64 (raise, never wrap — DuckDB promotes
    to HUGEINT, silent numpy wrap would break oracle parity).  One combiner
    pass (per-batch 5-sum partials per group) + one tiny groupby; the
    global min-ts scalar is one metadata-cheap pre-pass."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    t0 = np.datetime64(ds.min("ts"), "us").astype("datetime64[D]")

    def partials(t: pa.Table) -> pd.DataFrame:
        x = (np.asarray(t["ts"]).astype("datetime64[D]") - t0).astype(np.int64)
        y = np.round(np.asarray(t["value"], np.float64) * 100).astype(np.int64)
        df = pd.DataFrame({
            "event_type": np.asarray(t["event_type"]).astype(object),
            "n": np.int64(1), "sx": x, "sy": y,
            "sxx": x * x, "sxy": x * y,
        })
        return df.groupby("event_type", as_index=False).sum()

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("event_type").sum(["n", "sx", "sy", "sxx", "sxy"])
        .to_pandas()
    )
    agg.columns = ["event_type", "n", "sx", "sy", "sxx", "sxy"]
    # exact Python-int combination (numpy int64 would wrap silently where
    # DuckDB promotes to HUGEINT); overflow-check the results back to int64
    I64 = 2 ** 63
    slope_num, den, icept_num = [], [], []
    for _, r in agg.iterrows():
        n_, sx_, sy_ = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxx_, sxy_ = int(r["sxx"]), int(r["sxy"])
        for v in (n_ * sxy_ - sx_ * sy_, n_ * sxx_ - sx_ * sx_,
                  sy_ * sxx_ - sx_ * sxy_):
            if not (-I64 <= v < I64):
                raise OverflowError(
                    f"q_group_regression cross product {v} exceeds int64 for "
                    f"group {r['event_type']!r}; rescale x/y grain")
        slope_num.append(n_ * sxy_ - sx_ * sy_)
        den.append(n_ * sxx_ - sx_ * sx_)
        icept_num.append(sy_ * sxx_ - sx_ * sxy_)
    out = pd.DataFrame({
        "event_type": agg["event_type"],
        "n": agg["n"].astype(np.int64),
        "slope_num": np.array(slope_num, np.int64),
        "den": np.array(den, np.int64),
        "icept_num": np.array(icept_num, np.int64),
    })
    return out.sort_values("event_type").reset_index(drop=True)


def q_key_skew(sf_dir: str) -> pd.DataFrame:
    """Key-distribution skew profiler over orders.o_custkey — the diagnostic
    the north rule's "skew handled explicitly" story runs BEFORE choosing a
    salting strategy.  Exact integers: key count, row count, max group size,
    hottest-key share (permille), and the Gini coefficient of group sizes as
    a rational (gini_num/gini_den, from the sorted-rank identity
    Σᵢ(2i−n−1)·xᵢ) — no float anywhere, so the oracle hash-compares.

    Plan: one groupby(key).count() (the only data-sized exchange) → sizes
    sort by (n, key) → DISTRIBUTED block-offset rank partials: each sorted
    batch emits ONE row (count m, Σx, local Σ(j+1)·xⱼ, max, and its first
    (n, k) tuple); the sort makes batch (n, k)-ranges disjoint, so sorting
    the O(batches) partial rows by first-tuple on the driver recovers the
    global batch order, and Σ i·xᵢ folds as Σ_b [local_b + offset_b·Σx_b]
    with offset_b the cumulative count of earlier batches.  Driver work is
    O(batches), never O(distinct keys) — the profiler that diagnoses skew is
    itself skew/scale-safe."""
    ds = _read(sf_dir, "orders", ["o_custkey"])
    counts = (
        ds.map_batches(
            lambda t: pd.DataFrame({"k": np.asarray(t["o_custkey"], np.int64),
                                    "one": np.int64(1)})
            .groupby("k", as_index=False).sum(),
            batch_format="pyarrow")
        .groupby("k").sum("one")
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["k"], "n": t["sum(one)"]})

    sized = counts.map_batches(rename, batch_format="pyarrow").sort(["n", "k"])

    def rank_partial(b: pa.Table) -> pd.DataFrame:
        x = np.asarray(b["n"], np.int64)
        if len(x) == 0:
            return pd.DataFrame({"first_n": pd.Series([], dtype=np.int64),
                                 "first_k": pd.Series([], dtype=np.int64),
                                 "m": pd.Series([], dtype=np.int64),
                                 "s": pd.Series([], dtype=np.int64),
                                 "local": pd.Series([], dtype=np.int64),
                                 "mx": pd.Series([], dtype=np.int64)})
        j = np.arange(1, len(x) + 1, dtype=np.int64)
        return pd.DataFrame({
            "first_n": [np.int64(x[0])],
            "first_k": [np.int64(np.asarray(b["k"], np.int64)[0])],
            "m": [np.int64(len(x))],
            "s": [np.int64(x.sum())],
            "local": [np.int64((j * x).sum())],
            "mx": [np.int64(x.max())],
        })

    parts = sized.map_batches(rank_partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["first_n", "first_k"]).reset_index(drop=True)
    offs = np.concatenate(([0], np.cumsum(parts["m"].to_numpy(np.int64))[:-1])) \
        if len(parts) else np.zeros(0, np.int64)
    n_keys = int(parts["m"].sum()) if len(parts) else 0
    n_rows = int(parts["s"].sum()) if len(parts) else 0
    max_n = int(parts["mx"].max()) if len(parts) else 0
    rank_sum = int((parts["local"].to_numpy(np.int64)
                    + offs * parts["s"].to_numpy(np.int64)).sum()) \
        if len(parts) else 0
    gini_num = 2 * rank_sum - (n_keys + 1) * n_rows
    return pd.DataFrame({
        "n_keys": [np.int64(n_keys)],
        "n_rows": [np.int64(n_rows)],
        "max_n": [np.int64(max_n)],
        "top1_share_permille": [np.int64(1000 * max_n // max(n_rows, 1))],
        "gini_num": [np.int64(gini_num)],
        "gini_den": [np.int64(n_keys * n_rows)],
    })


def q_time_weighted_avg(sf_dir: str) -> pd.DataFrame:
    """Per-user TIME-WEIGHTED average of the value series — the
    interval-weighted mean a metrics pipeline uses when samples arrive
    unevenly (each value holds until the user's next event).  Exact
    rationals again: twa = twa_num/twa_den with
    twa_num = Σ value_c·gap_ms and twa_den = Σ gap_ms over each user's
    consecutive-event gaps (ms grain keeps the products well inside int64
    at any sf).  Single-event users emit (0, 0) — undefined stays explicit.
    Same plan as every navigation window here: one user-hash exchange, one
    vectorized sort + shifted-difference kernel per partition."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64

    # event_id in the sort key: equal-ts events would otherwise attribute
    # the next gap to an arbitrary peer (block-arrival-order nondeterminism)
    ds = _read(sf_dir, "events", ["user_id", "ts", "value", "event_id"])
    nparts = adaptive_parts(ds.count())

    def add_part(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"], np.int64).view(np.uint64)
        part = (splitmix64(u) % np.uint64(nparts)).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "twa_num": pd.Series([], dtype=np.int64),
                "twa_den": pd.Series([], dtype=np.int64),
            })
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy(np.int64)
        ms = g["ts"].to_numpy().astype("datetime64[ms]").astype(np.int64)
        vc = np.round(g["value"].to_numpy(np.float64) * 100).astype(np.int64)
        same = np.r_[uid[1:] == uid[:-1], False]       # row i starts a gap
        gap = np.r_[ms[1:] - ms[:-1], np.int64(0)]
        gap = np.where(same, gap, 0)
        df = pd.DataFrame({"user_id": uid, "num": vc * gap, "den": gap})
        agg = df.groupby("user_id", as_index=False).sum()
        return agg.rename(columns={"num": "twa_num", "den": "twa_den"}).astype(
            {"twa_num": np.int64, "twa_den": np.int64})

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part").map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


def q_event_transitions(sf_dir: str) -> pd.DataFrame:
    """First-order transition counts of each user's event-type sequence
    (the Markov-chain/session-flow mining pass): (prev_type → next_type, n)
    over consecutive events ordered by (ts, event_id).  One user-hash
    exchange; each partition shifts its sorted frame once and emits
    transition-count PARTIALS, so the second groupby moves at most
    |types|² rows per partition."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"])
    nparts = adaptive_parts(ds.count())

    def add_part(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"], np.int64).view(np.uint64)
        part = (splitmix64(u) % np.uint64(nparts)).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "prev_type": pd.Series([], dtype=str),
                "next_type": pd.Series([], dtype=str),
                "n": pd.Series([], dtype=np.int64),
            })
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy(np.int64)
        typ = g["event_type"].to_numpy().astype(object)
        same = uid[1:] == uid[:-1]
        df = pd.DataFrame({"prev_type": typ[:-1][same],
                           "next_type": typ[1:][same]})
        out = df.groupby(["prev_type", "next_type"], as_index=False).size()
        return out.rename(columns={"size": "n"}).astype({"n": np.int64})

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part").map_groups(per_part, batch_format="pandas")
        .groupby(["prev_type", "next_type"]).sum("n")
        .to_pandas()
    )
    out.columns = ["prev_type", "next_type", "n"]
    out["n"] = out["n"].astype(np.int64)
    return (out.sort_values(["prev_type", "next_type"])
            .reset_index(drop=True))


def q_gap_histogram(sf_dir: str) -> pd.DataFrame:
    """Log₂-bucketed inter-event gap distribution per event type — the
    latency-histogram shape (Prometheus-style exponential buckets) over the
    LAG window.  Bucket = floor(log₂(gap_ms)) computed as the integer bit
    length on the Ray side; DuckDB's float log₂ floors identically for
    gap < 2⁴⁰ ms (a non-power-of-two's log₂ sits ≥ 2⁻¹⁶ above the integer,
    far outside double rounding).  Zero gaps take bucket −1.  Same user-hash
    partition plan as every navigation window here; the exchange carries
    (type, bucket) partials only."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"])
    nparts = adaptive_parts(ds.count())

    def add_part(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"], np.int64).view(np.uint64)
        part = (splitmix64(u) % np.uint64(nparts)).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=str),
                "bucket": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
            })
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy(np.int64)
        ms = g["ts"].to_numpy().astype("datetime64[ms]").astype(np.int64)
        typ = g["event_type"].to_numpy().astype(object)
        same = uid[1:] == uid[:-1]
        gap = (ms[1:] - ms[:-1])[same]
        # integer-exact floor(log2) via frexp (x = m·2^e, ½ ≤ m < 1 ⇒
        # floor(log2 x) = e − 1, exact for any int64); −1 for gap == 0
        bucket = np.full(len(gap), -1, np.int64)
        nz = gap > 0
        _, e = np.frexp(gap[nz].astype(np.float64))
        bucket[nz] = e.astype(np.int64) - 1
        df = pd.DataFrame({"event_type": typ[1:][same], "bucket": bucket,
                           "n": np.int64(1)})
        return df.groupby(["event_type", "bucket"], as_index=False).sum()

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part").map_groups(per_part, batch_format="pandas")
        .groupby(["event_type", "bucket"]).sum("n")
        .to_pandas()
    )
    out.columns = ["event_type", "bucket", "n"]
    out["bucket"] = out["bucket"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["event_type", "bucket"]).reset_index(drop=True)
