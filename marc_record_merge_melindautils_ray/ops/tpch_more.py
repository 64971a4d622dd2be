"""Second batch of TPC-H-shaped relational operators: the correlated-scalar
and global-scalar query shapes (Q17, Q22, Q15, Q11, Q13 analogs over the
driver's table set — no partsupp table exists, so Q11 is re-keyed on
lineitem revenue per part).

Every aggregate runs on exact integers (cents / e4 fixed-point, integral
quantities) so Ray and the DuckDB oracle agree bit-for-bit; every
"correlated subquery" is re-expressed as a small grouped aggregate that is
broadcast back over the fact scan (ship once via the object store, filter
vectorized per batch) — the fact table never lands on the driver.

Reference parity note: the reference engine (NatLibFi/
marc-record-merge-melindautils) has no relational surface; these operators
are part of the Ray-Data engine's general query surface (SURVEY.md §2.7-2.9)
exercised by the driver's DuckDB oracle harness.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from marc_record_merge_melindautils_ray.functions.util import maybe_get, sorted_membership, task_stage
from marc_record_merge_melindautils_ray.ops.relational import _cents, _read


def _key_refs(ds: rd.Dataset):
    """Materialize a keyed Dataset into object-store block refs — the
    broadcast-key-set idiom: the DRIVER only ever holds ObjectRefs; each
    consumer task assembles its sorted key array from the refs inside the
    worker (so a dimension-sized key set never lands in driver heap)."""
    return ds.materialize().to_arrow_refs()


def _assemble_int64(refs, col: str) -> np.ndarray:
    """Worker-side: concatenate + sort one int64 column from block refs."""
    parts = []
    for r in refs:
        t = maybe_get(r)
        if len(t) and col in t.column_names:
            parts.append(np.asarray(t[col], np.int64))
    return np.sort(np.concatenate(parts)) if parts else np.array([], np.int64)


# ------------------------------------------------- Q17: correlated avg gate
def q17_small_qty_revenue(sf_dir: str, brand: str = "Brand#3") -> pd.DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders of one brand's
    parts, where "small" is a CORRELATED scalar subquery — each lineitem
    compares against 20% of the average quantity ordered for ITS part.

    Scale shape: two streamed passes over the brand-pruned lineitem scan
    (the brand cut keeps ~1/|brands| of rows, so re-reading beats
    materializing at 100 TB).  Pass 1 partial-aggregates (sum_qty, count)
    per partkey — a part-dimension-sized result.  The avg gate is evaluated
    in EXACT integers (quantities are integral): ``l_quantity < 0.2 *
    (sum/cnt)`` ⟺ ``5·qty·cnt < sum_qty``, so no float division can
    disagree with the oracle.  Both side tables (brand partkeys, per-part
    aggregates) travel as object-store block refs assembled INSIDE each
    worker — the driver never holds a key array (the repo's broadcast-key
    idiom; a Bloom pre-filter is the >10⁸-key escalation)."""
    bp = (
        _read(sf_dir, "part", ["p_partkey", "p_brand"])
        .map_batches(
            lambda t: pa.table(
                {"k": t.filter(pc.equal(t["p_brand"], brand))["p_partkey"]}),
            batch_format="pyarrow",
        )
    )
    key_refs = tuple(_key_refs(bp))

    class BrandQty:
        """Pass-1 kernel: prune to brand parts, partial (sum_qty, cnt)."""

        def __init__(self, refs):
            self.keys = _assemble_int64(refs, "k")

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            pk = np.asarray(t["l_partkey"], np.int64)
            hit = sorted_membership(self.keys, pk)
            qty = np.asarray(t["l_quantity"], np.float64)[hit].astype(np.int64)
            df = pd.DataFrame({"l_partkey": pk[hit], "sum_qty": qty,
                               "cnt": np.ones(len(qty), np.int64)})
            return df.groupby("l_partkey", as_index=False).sum()

    per_part = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
        .map_batches(task_stage(BrandQty, (key_refs,), key=("q17a", *key_refs)),
                     batch_format="pyarrow")
        .groupby("l_partkey")
        .sum(["sum_qty", "cnt"])
    )
    per_part = per_part.materialize()
    if per_part.count() == 0:  # metadata-only on a materialized dataset
        return pd.DataFrame({"total_c": [0], "n_lines": [0]})
    agg_refs = tuple(per_part.to_arrow_refs())

    class SmallQtyGate:
        """Pass-2 kernel: exact-integer correlated gate + revenue partial.
        The per-part aggregate table assembles from block refs in-worker."""

        def __init__(self, refs):
            pk_parts, sum_parts, cnt_parts = [], [], []
            for r in refs:
                t = maybe_get(r)
                if len(t):
                    pk_parts.append(np.asarray(t["l_partkey"], np.int64))
                    sum_parts.append(np.asarray(t["sum(sum_qty)"], np.int64))
                    cnt_parts.append(np.asarray(t["sum(cnt)"], np.int64))
            pk = np.concatenate(pk_parts)
            order = np.argsort(pk)
            self.pk = pk[order]
            self.sums = np.concatenate(sum_parts)[order]
            self.cnts = np.concatenate(cnt_parts)[order]

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            pk = np.asarray(t["l_partkey"], np.int64)
            hit = sorted_membership(self.pk, pk)
            if not hit.any():
                return pd.DataFrame({"total_c": [0], "n_lines": [0]})
            pos = np.searchsorted(self.pk, pk[hit])
            qty = np.asarray(t["l_quantity"], np.float64)[hit].astype(np.int64)
            small = 5 * qty * self.cnts[pos] < self.sums[pos]
            price = np.asarray(t["l_extendedprice"], np.float64)[hit][small]
            return pd.DataFrame({"total_c": [int(_cents(price).sum())],
                                 "n_lines": [int(small.sum())]})

    sums_row = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(task_stage(SmallQtyGate, (agg_refs,), key=("q17b", *agg_refs)),
                     batch_format="pyarrow")
        .sum(["total_c", "n_lines"])
    )
    return pd.DataFrame({"total_c": [int(sums_row["sum(total_c)"])],
                         "n_lines": [int(sums_row["sum(n_lines)"])]})


# --------------------------------------- Q22: global-avg filter + anti-join
def q22_idle_customers(sf_dir: str, priority: str = "1-URGENT") -> pd.DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance who
    never placed a ``priority``-class order, grouped by market segment (the
    country-code analog for this table set; the synthetic corpus gives every
    customer at least one order, so the NOT-EXISTS gate keys on the priority
    subset to stay non-degenerate while preserving the anti-join shape).

    Scale shape: the global average is a two-number reduce ((sum_cents,
    n_positive) per-batch partials → one row), then the comparison runs in
    exact integers — ``bal > avg`` ⟺ ``bal_c·n > sum_c`` — so Ray and the
    float-free oracle SQL agree exactly.  The "no orders" gate is the
    broadcast anti-join idiom: distinct o_custkey computed in Ray and
    carried as object-store block refs assembled in-worker (the driver holds
    refs only; Bloom filter at 100 TB).  Output is a segment-cardinality
    groupby — never the customer table itself."""

    def bal_partial(t: pa.Table) -> pd.DataFrame:
        cents = _cents(np.asarray(t["c_acctbal"], np.float64))
        pos = cents > 0
        return pd.DataFrame({"sum_c": [int(cents[pos].sum())],
                             "n_pos": [int(pos.sum())]})

    totals = (
        _read(sf_dir, "customer", ["c_acctbal"])
        .map_batches(bal_partial, batch_format="pyarrow")
        .sum(["sum_c", "n_pos"])
    )
    if totals is None:  # fully empty customer table — Dataset.sum() gives None
        return pd.DataFrame({"c_mktsegment": pd.Series([], dtype=object),
                             "n_cust": pd.Series([], dtype=np.int64),
                             "sum_bal_c": pd.Series([], dtype=np.int64)})
    sum_c, n_pos = int(totals["sum(sum_c)"]), int(totals["sum(n_pos)"])

    ordered = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .map_batches(
            lambda t: pa.table({"k": pc.unique(
                t.filter(pc.equal(t["o_orderpriority"], priority))
                ["o_custkey"].combine_chunks())}),
            batch_format="pyarrow",
        )
        .groupby("k")
        .count()
    )
    ordered_refs = tuple(_key_refs(ordered))

    class IdleRich:
        def __init__(self, refs, sum_c, n_pos):
            self.keys = _assemble_int64(refs, "k")
            self.sum_c, self.n_pos = sum_c, n_pos

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            cents = _cents(np.asarray(t["c_acctbal"], np.float64))
            rich = cents * self.n_pos > self.sum_c
            idle = ~sorted_membership(self.keys,
                                      np.asarray(t["c_custkey"], np.int64))
            keep = rich & idle
            seg = np.asarray(t["c_mktsegment"]).astype(str)[keep]
            df = pd.DataFrame({"c_mktsegment": seg, "n_cust": 1,
                               "sum_bal_c": cents[keep]})
            return df.groupby("c_mktsegment", as_index=False).sum()

    out = (
        _read(sf_dir, "customer", ["c_custkey", "c_acctbal", "c_mktsegment"])
        .map_batches(
            task_stage(IdleRich, (ordered_refs, sum_c, n_pos),
                       key=("q22", sum_c, n_pos, *ordered_refs)),
            batch_format="pyarrow",
        )
        .groupby("c_mktsegment")
        .sum(["n_cust", "sum_bal_c"])
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"c_mktsegment": pd.Series([], dtype=object),
                             "n_cust": pd.Series([], dtype=np.int64),
                             "sum_bal_c": pd.Series([], dtype=np.int64)})
    out = out.rename(columns={"sum(n_cust)": "n_cust",
                              "sum(sum_bal_c)": "sum_bal_c"})
    out["n_cust"] = out["n_cust"].astype(np.int64)
    out["sum_bal_c"] = out["sum_bal_c"].astype(np.int64)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


# --------------------------------------------- Q15: argmax-of-groupby (ties)
def q15_top_supplier(sf_dir: str, date_lo: str = "1996-01-01",
                     date_hi: str = "1996-04-01") -> pd.DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum revenue over a ship-date
    quarter — a groupby whose MAX gates a second lookup, ties preserved.

    Scale shape: window-pruned lineitem scan → per-suppkey exact-int
    revenue_e4 groupby (supplier-cardinality result) → the max is reduced
    from that small result in Ray; only the winning suppkeys (ties and all)
    broadcast to a pruned supplier attribute scan."""
    lo, hi = np.datetime64(date_lo, "us"), np.datetime64(date_hi, "us")

    def partial(t: pa.Table) -> pd.DataFrame:
        d = np.asarray(t["l_shipdate"]).astype("datetime64[us]")
        keep = (d >= lo) & (d < hi)
        rev = np.round(
            np.asarray(t["l_extendedprice"], np.float64)[keep]
            * (1.0 - np.asarray(t["l_discount"], np.float64)[keep]) * 10000.0
        ).astype(np.int64)
        df = pd.DataFrame({"l_suppkey": np.asarray(t["l_suppkey"], np.int64)[keep],
                           "total_e4": rev})
        return df.groupby("l_suppkey", as_index=False).sum()

    rev = (
        _read(sf_dir, "lineitem",
              ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .sum(["total_e4"])
        .materialize()
    )
    empty = pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                          "s_name": pd.Series([], dtype=object),
                          "total_e4": pd.Series([], dtype=np.int64)})
    if rev.count() == 0:
        return empty
    best = int(rev.max("sum(total_e4)"))
    winners = rev.map_batches(
        lambda t: t.filter(pc.equal(t["sum(total_e4)"], best)),
        batch_format="pyarrow",
    ).to_pandas()
    win_keys = np.sort(winners["l_suppkey"].to_numpy(np.int64))

    def attach(t: pa.Table) -> pa.Table:
        hit = sorted_membership(win_keys, np.asarray(t["s_suppkey"], np.int64))
        return t.filter(pa.array(hit))

    attrs = (
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
        .map_batches(attach, batch_format="pyarrow")
        .to_pandas()
    )
    if attrs.empty:
        return empty
    out = attrs.merge(
        winners.rename(columns={"l_suppkey": "s_suppkey",
                                "sum(total_e4)": "total_e4"}),
        on="s_suppkey")
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    out["total_e4"] = out["total_e4"].astype(np.int64)
    return (out[["s_suppkey", "s_name", "total_e4"]]
            .sort_values("s_suppkey").reset_index(drop=True))


# ------------------------------------ Q11: HAVING against a global aggregate
def q11_important_parts(sf_dir: str, num: int = 3, den: int = 2) -> pd.DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds a threshold derived from
    a GLOBAL scalar subquery over the same data — here ``num/den`` times the
    average per-part revenue (Q11's fixed fraction-of-total degenerates as
    part cardinality grows — 0.01% of total selects nothing at sf≥0.01 — so
    the scale-invariant multiple-of-average keeps the query non-degenerate
    at every corpus size; no partsupp table exists in this table set, so
    value is lineitem revenue per part rather than supplycost×availqty).

    Scale shape: one per-partkey exact-cents groupby (part-cardinality
    result, stays distributed); the global (total, n_parts) reduces FROM
    that grouped result (no second fact scan); the gate is exact-integer
    cross-multiplication ``value·n·den > total·num`` evaluated per grouped
    batch with both scalars broadcast plain."""
    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "p_partkey": np.asarray(t["l_partkey"], np.int64),
            "value_c": _cents(np.asarray(t["l_extendedprice"], np.float64)),
        })
        return df.groupby("p_partkey", as_index=False).sum()

    grouped = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("p_partkey")
        .sum(["value_c"])
        .materialize()
    )
    empty = pd.DataFrame({"p_partkey": pd.Series([], dtype=np.int64),
                          "value_c": pd.Series([], dtype=np.int64)})
    n_parts = grouped.count()
    if n_parts == 0:
        return empty
    total = int(grouped.sum("sum(value_c)"))

    out = grouped.map_batches(
        lambda t: t.filter(
            pc.greater(
                pc.multiply(t["sum(value_c)"], pa.scalar(int(n_parts * den))),
                pa.scalar(total * num))),
        batch_format="pyarrow",
    ).to_pandas()
    if out.empty or "p_partkey" not in out.columns:
        return empty
    out = out.rename(columns={"sum(value_c)": "value_c"})
    out["p_partkey"] = out["p_partkey"].astype(np.int64)
    out["value_c"] = out["value_c"].astype(np.int64)
    return (out.sort_values(["value_c", "p_partkey"], ascending=[False, True])
            .reset_index(drop=True))


# --------------------------------- Q13: distribution of per-customer counts
def q13_order_count_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape: histogram of customers by how many orders they
    placed, INCLUDING the zero bucket (the left-join-then-regroup pattern).

    Scale shape: orders groupby custkey count (customer-cardinality) →
    regroup BY THE COUNT into the distribution (count-cardinality, tiny).
    The zero bucket needs no join at all: it is |customer| − |distinct
    ordering customers|, two metadata-cheap counts (FK cleanliness — every
    o_custkey exists in customer — is asserted by the oracle test)."""
    per_cust = (
        _read(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .count()
        .materialize()
    )
    n_ordering = per_cust.count()
    n_customers = _read(sf_dir, "customer", ["c_custkey"]).count()

    dist = (
        per_cust.map_batches(
            lambda t: pa.table({"c_count": t["count()"],
                                "one": pa.array(np.ones(len(t), np.int64))}),
            batch_format="pyarrow",
        )
        .groupby("c_count")
        .sum(["one"])
        .to_pandas()
    )
    dist = dist.rename(columns={"sum(one)": "custdist"})
    zero = int(n_customers - n_ordering)
    if zero > 0:
        dist = pd.concat(
            [dist, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True)
    dist["c_count"] = dist["c_count"].astype(np.int64)
    dist["custdist"] = dist["custdist"].astype(np.int64)
    return (dist.sort_values(["custdist", "c_count"], ascending=[False, False])
            .reset_index(drop=True))
