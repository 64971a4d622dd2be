"""Final batch of TPC-H-shaped relational operators — Q2, Q6, Q8, Q9, Q16,
Q20, Q21 analogs — completing the 22-query TPC-H surface over the driver's
table set.

No ``partsupp`` table exists in this table set, so (as with Q11 in
``tpch_more.py``) the part↔supplier relation is re-keyed on lineitem:
Q2's supply cost is the minimum observed line price per (part, supplier);
Q16's relation is the distinct (part, supplier) pairs that actually traded;
Q20's "available quantity" is the supplier's shipped volume of the part.
Q21 has no commit/receipt dates here, so "kept orders waiting" is adapted to
"shipped more than 90 days after the order date".

Conventions shared with the rest of the relational surface:
- every aggregate runs on exact integers (cents / e4 fixed-point, integral
  quantities) so Ray and the DuckDB oracle agree bit-for-bit;
- dimension-scale side inputs broadcast as object-store block refs assembled
  INSIDE each worker (``_key_refs``/``_assemble_int64``) or as a ``ray.put``
  dict for attribute lookups — the fact table never lands on the driver;
- fact-fact joins are hash joins with ``adaptive_parts`` partition counts;
- output is always pre-aggregated / pruned to output scale before any
  ``to_pandas``.

Reference parity note: the reference engine (NatLibFi/
marc-record-merge-melindautils) has no relational surface; these operators
are part of the Ray-Data engine's general query surface (SURVEY.md §2.7)
exercised by the driver's DuckDB oracle harness.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from marc_record_merge_melindautils_ray.functions.util import (
    maybe_get,
    sorted_membership,
    task_stage,
)
from marc_record_merge_melindautils_ray.ops.relational import (
    _cents,
    _join_or_empty,
    _read,
)
from marc_record_merge_melindautils_ray.ops.tpch_more import _assemble_int64, _key_refs


# ------------------------------------------------------- Q6: forecast revenue
def q6_forecast_revenue(sf_dir: str, date_lo: str = "1996-01-01",
                        date_hi: str = "1997-01-01",
                        disc_lo: int = 5, disc_hi: int = 7,
                        qty_lt: int = 24) -> pd.DataFrame:
    """TPC-H Q6 shape: revenue increase from eliminating small discounts —
    a pure predicate scan + global sum, the simplest fact-table reduce.

    Scale shape: one streamed pass, per-batch exact-integer partials
    (price_cents × discount_pct = e4 fixed point), a two-number driver
    reduce.  Nothing shuffles; nothing materializes."""
    lo, hi = np.datetime64(date_lo, "us"), np.datetime64(date_hi, "us")

    def partial(t: pa.Table) -> pd.DataFrame:
        d = np.asarray(t["l_shipdate"]).astype("datetime64[us]")
        disc = np.round(np.asarray(t["l_discount"], np.float64) * 100.0).astype(np.int64)
        qty = np.asarray(t["l_quantity"], np.float64).astype(np.int64)
        keep = (d >= lo) & (d < hi) & (disc >= disc_lo) & (disc <= disc_hi) & (qty < qty_lt)
        price_c = _cents(np.asarray(t["l_extendedprice"], np.float64)[keep])
        return pd.DataFrame({"revenue_e4": [int((price_c * disc[keep]).sum())],
                             "n_lines": [int(keep.sum())]})

    sums = (
        _read(sf_dir, "lineitem",
              ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .sum(["revenue_e4", "n_lines"])
    )
    if sums is None:  # fully empty lineitem table
        return pd.DataFrame({"revenue_e4": [0], "n_lines": [0]})
    return pd.DataFrame({"revenue_e4": [int(sums["sum(revenue_e4)"])],
                         "n_lines": [int(sums["sum(n_lines)"])]})


def _dim_lookup(sf_dir: str):
    """nation/region joined attribute maps (both tiny dimension tables):
    nationkey → (n_name, r_name)."""
    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    r_name = dict(zip(region["r_regionkey"].astype(np.int64), region["r_name"]))
    return {
        int(k): (nm, r_name.get(int(rk), ""))
        for k, nm, rk in zip(nation["n_nationkey"], nation["n_name"],
                             nation["n_regionkey"])
    }


# ------------------------------------------------ Q2: minimum-cost supplier
def q2_min_cost_supplier(sf_dir: str, size: int = 15, ptype: str = "SMALL",
                         region: str = "EUROPE") -> pd.DataFrame:
    """TPC-H Q2 shape: for every eligible part, the supplier(s) in a region
    offering it at the minimum cost — the correlated-min join-back.

    Supply cost is adapted to this table set (no partsupp) as the minimum
    observed line price per (part, supplier) in lineitem.

    Scale shape: the eligible partkeys (size+type cut ≈ 1/300 of the part
    dimension) travel as block refs assembled in-worker; the regional
    supplier whitelist is a dimension-scale sorted array.  The fact scan
    prunes on BOTH memberships before its per-batch min partial, so the
    (part, supplier) min-cost groupby runs on doubly-pruned rows and its
    result is output-scale — only that result lands in pandas for the
    correlated-min join-back."""
    elig = (
        _read(sf_dir, "part", ["p_partkey", "p_size", "p_type"])
        .map_batches(
            lambda t: pa.table({"k": t.filter(
                pc.and_(pc.equal(t["p_size"], size),
                        pc.equal(t["p_type"], ptype)))["p_partkey"]}),
            batch_format="pyarrow",
        )
    )
    part_refs = tuple(_key_refs(elig))

    dim = _dim_lookup(sf_dir)
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]).to_pandas()
    # dimension-scale attribute map, pruned to the region
    supp_attr = {}
    for k, nm, nk, bal in zip(supp["s_suppkey"], supp["s_name"],
                              supp["s_nationkey"], supp["s_acctbal"]):
        n_name, r = dim.get(int(nk), ("", ""))
        if r == region:
            supp_attr[int(k)] = (nm, n_name, int(round(float(bal) * 100.0)))
    supp_keys = np.sort(np.fromiter(supp_attr.keys(), np.int64,
                                    count=len(supp_attr)))
    supp_keys_t = tuple(int(k) for k in supp_keys)

    empty = pd.DataFrame({"s_acctbal_c": pd.Series([], dtype=np.int64),
                          "s_name": pd.Series([], dtype=object),
                          "n_name": pd.Series([], dtype=object),
                          "p_partkey": pd.Series([], dtype=np.int64),
                          "cost_c": pd.Series([], dtype=np.int64)})

    class MinCost:
        def __init__(self, refs, skeys):
            self.parts = _assemble_int64(refs, "k")
            self.supps = np.asarray(skeys, np.int64)

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            pk = np.asarray(t["l_partkey"], np.int64)
            sk = np.asarray(t["l_suppkey"], np.int64)
            keep = sorted_membership(self.parts, pk) & sorted_membership(self.supps, sk)
            df = pd.DataFrame({
                "p_partkey": pk[keep], "l_suppkey": sk[keep],
                "cost_c": _cents(np.asarray(t["l_extendedprice"], np.float64)[keep]),
            })
            return df.groupby(["p_partkey", "l_suppkey"], as_index=False).min()

    costs = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(
            task_stage(MinCost, (part_refs, supp_keys_t),
                       key=("q2", size, ptype, region, *part_refs)),
            batch_format="pyarrow",
        )
        .groupby(["p_partkey", "l_suppkey"])
        .min(["cost_c"])
        .to_pandas()  # doubly-pruned: eligible parts × regional suppliers
    )
    if costs.empty:
        return empty
    costs = costs.rename(columns={"min(cost_c)": "cost_c"})
    mins = costs.groupby("p_partkey", as_index=False)["cost_c"].min()
    out = costs.merge(mins, on=["p_partkey", "cost_c"])
    attrs = out["l_suppkey"].map(lambda k: supp_attr[int(k)])
    out["s_name"] = [a[0] for a in attrs]
    out["n_name"] = [a[1] for a in attrs]
    out["s_acctbal_c"] = np.array([a[2] for a in attrs], np.int64)
    out["p_partkey"] = out["p_partkey"].astype(np.int64)
    out["cost_c"] = out["cost_c"].astype(np.int64)
    return (out[["s_acctbal_c", "s_name", "n_name", "p_partkey", "cost_c"]]
            .sort_values(["s_acctbal_c", "n_name", "s_name", "p_partkey"],
                         ascending=[False, True, True, True])
            .reset_index(drop=True))


# ------------------------------------------------- Q8: national market share
def q8_market_share(sf_dir: str, nation: str = "NATION_3",
                    region: str = "AMERICA", ptype: str = "ECONOMY",
                    date_lo: str = "1995-01-01",
                    date_hi: str = "1997-01-01") -> pd.DataFrame:
    """TPC-H Q8 shape: one nation's share of regional market revenue per
    order year — a conditional sum over a fact table enriched from two
    dimension chains (customer→nation→region, supplier→nation).

    The share itself is a ratio; to keep the contract exact-integer the
    operator emits numerator and denominator (nation_rev_e4, total_rev_e4)
    per year — the division is the caller's presentation concern.

    Scale shape: mirrors Q7 — the customer chain is a distributed hash join
    (orders ⨝ customer, both fact-scale), the supplier- and part-side cuts
    are broadcast lookups applied BEFORE the lineitem join so only ~1/6 of
    lineitem rows (one part type) enter the shuffle, already reduced to
    (orderkey, rev, is_nation) triples."""
    import ray

    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    lo, hi = np.datetime64(date_lo, "us"), np.datetime64(date_hi, "us")
    dim = _dim_lookup(sf_dir)
    region_nk = np.sort(np.array(
        [k for k, (_, r) in dim.items() if r == region], np.int64))

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    supp_is_nation = {
        int(k): dim.get(int(nk), ("", ""))[0] == nation
        for k, nk in zip(supp["s_suppkey"], supp["s_nationkey"])
    }
    supp_ref = ray.put(supp_is_nation)

    tp = (
        _read(sf_dir, "part", ["p_partkey", "p_type"])
        .map_batches(
            lambda t: pa.table(
                {"k": t.filter(pc.equal(t["p_type"], ptype))["p_partkey"]}),
            batch_format="pyarrow",
        )
    )
    part_refs = tuple(_key_refs(tp))

    # customer chain: orders (date window) ⨝ customer (region cut) — fact ⨝ fact
    def ord_window(t: pa.Table) -> pa.Table:
        d = np.asarray(t["o_orderdate"]).astype("datetime64[us]")
        keep = (d >= lo) & (d < hi)
        t = t.filter(pa.array(keep))
        yrs = np.asarray(t["o_orderdate"]).astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "o_year": pa.array(yrs)})

    orders = (_read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
              .map_batches(ord_window, batch_format="pyarrow"))

    def cust_region(t: pa.Table) -> pa.Table:
        keep = sorted_membership(region_nk, np.asarray(t["c_nationkey"], np.int64))
        return pa.table({"c_custkey": t.filter(pa.array(keep))["c_custkey"]})

    cust = (_read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
            .map_batches(cust_region, batch_format="pyarrow"))

    n_orders = orders.count()
    ord_reg = orders.join(
        cust, join_type="inner",
        num_partitions=adaptive_parts(n_orders, rows_per_part=250_000),
        on=("o_custkey",), right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "o_year"])

    class LiCut:
        """Part-type + supplier-nation cut, reduced to join-ready triples."""

        def __init__(self, refs, supp_ref):
            self.parts = _assemble_int64(refs, "k")
            self.is_nation = maybe_get(supp_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keep = sorted_membership(self.parts,
                                     np.asarray(t["l_partkey"], np.int64))
            t = t.filter(pa.array(keep))
            rev = np.round(
                np.asarray(t["l_extendedprice"], np.float64)
                * (1.0 - np.asarray(t["l_discount"], np.float64)) * 10000.0
            ).astype(np.int64)
            isn = np.fromiter(
                (self.is_nation.get(int(k), False)
                 for k in np.asarray(t["l_suppkey"], np.int64)),
                np.bool_, count=len(t))
            return pa.table({"l_orderkey": t["l_orderkey"],
                             "rev": pa.array(rev),
                             "is_nation": pa.array(isn)})

    li = (
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_partkey", "l_suppkey",
               "l_extendedprice", "l_discount"])
        .map_batches(
            task_stage(LiCut, (part_refs, supp_ref),
                       key=("q8", ptype, nation, *part_refs)),
            batch_format="pyarrow",
        )
    )
    joined = li.join(
        ord_reg, join_type="inner",
        num_partitions=adaptive_parts(li.count(), rows_per_part=250_000),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        rev = np.asarray(t["rev"], np.int64)
        isn = np.asarray(t["is_nation"], np.bool_)
        df = pd.DataFrame({"o_year": np.asarray(t["o_year"], np.int64),
                           "nation_rev_e4": np.where(isn, rev, 0),
                           "total_rev_e4": rev})
        return df.groupby("o_year", as_index=False).sum()

    empty = pd.DataFrame({"o_year": pd.Series([], dtype=np.int64),
                          "nation_rev_e4": pd.Series([], dtype=np.int64),
                          "total_rev_e4": pd.Series([], dtype=np.int64)})
    out = _join_or_empty(
        lambda: (
            joined.map_batches(partial, batch_format="pyarrow")
            .groupby("o_year")
            .sum(["nation_rev_e4", "total_rev_e4"])
            .to_pandas()
        ),
        empty, sides=(li, ord_reg),
    )
    if out.empty:
        return empty
    out = out.rename(columns={"sum(nation_rev_e4)": "nation_rev_e4",
                              "sum(total_rev_e4)": "total_rev_e4"})
    for c in ("o_year", "nation_rev_e4", "total_rev_e4"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("o_year").reset_index(drop=True)


# ------------------------------------------------- Q9: product-type profit
def q9_product_profit(sf_dir: str, name_like: str = "red") -> pd.DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) over parts
    whose name contains a token — fact scan enriched by part, supplier and
    order attributes.

    Profit is adapted to this table set (no partsupp supplycost) as
    ``line revenue − p_retailprice × quantity`` with the part's retail
    price as the unit-cost proxy, in exact e4 fixed point.

    Scale shape: the part cut (name match → partkey→retailprice_c dict) and
    the supplier→nation map are dimension-scale broadcasts applied BEFORE
    the orders join; lineitem rows enter the shuffle already reduced to
    (orderkey, nation, amount_e4) and pre-aggregated per (orderkey, nation)
    inside each batch.  The only all-to-all is the lineitem ⨝ orders hash
    join (orders carry the year)."""
    import ray

    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    dim = _dim_lookup(sf_dir)
    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]).to_pandas()
    hit = part["p_name"].str.contains(name_like, regex=False)
    retail_c = {
        int(k): int(round(float(v) * 100.0))
        for k, v in zip(part["p_partkey"][hit], part["p_retailprice"][hit])
    }
    part_ref = ray.put(retail_c)

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    supp_nation = {
        int(k): dim.get(int(nk), ("", ""))[0]
        for k, nk in zip(supp["s_suppkey"], supp["s_nationkey"])
    }
    supp_ref = ray.put(supp_nation)

    class ProfitCut:
        def __init__(self, part_ref, supp_ref):
            rc = maybe_get(part_ref)
            self.pk = np.sort(np.fromiter(rc.keys(), np.int64, count=len(rc)))
            self.retail = np.array([rc[int(k)] for k in self.pk], np.int64)
            self.nation = maybe_get(supp_ref)

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            pk = np.asarray(t["l_partkey"], np.int64)
            keep = sorted_membership(self.pk, pk)
            if not keep.any():
                return pd.DataFrame({"l_orderkey": pd.Series([], dtype=np.int64),
                                     "nation": pd.Series([], dtype=object),
                                     "amount_e4": pd.Series([], dtype=np.int64)})
            pos = np.searchsorted(self.pk, pk[keep])
            qty = np.asarray(t["l_quantity"], np.float64)[keep].astype(np.int64)
            rev = np.round(
                np.asarray(t["l_extendedprice"], np.float64)[keep]
                * (1.0 - np.asarray(t["l_discount"], np.float64)[keep]) * 10000.0
            ).astype(np.int64)
            amount = rev - self.retail[pos] * qty * 100
            nat = np.array(
                [self.nation.get(int(k), "")
                 for k in np.asarray(t["l_suppkey"], np.int64)[keep]],
                dtype=object)
            df = pd.DataFrame({
                "l_orderkey": np.asarray(t["l_orderkey"], np.int64)[keep],
                "nation": nat, "amount_e4": amount})
            return df.groupby(["l_orderkey", "nation"], as_index=False).sum()

    li = (
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
               "l_extendedprice", "l_discount"])
        .map_batches(
            task_stage(ProfitCut, (part_ref, supp_ref),
                       key=("q9", name_like, part_ref, supp_ref)),
            batch_format="pyarrow",
        )
    )

    def ord_year(t: pa.Table) -> pa.Table:
        yrs = np.asarray(t["o_orderdate"]).astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({"o_orderkey": t["o_orderkey"], "o_year": pa.array(yrs)})

    orders = (_read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
              .map_batches(ord_year, batch_format="pyarrow"))

    joined = li.join(
        orders, join_type="inner",
        num_partitions=adaptive_parts(li.count(), rows_per_part=250_000),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    empty = pd.DataFrame({"nation": pd.Series([], dtype=object),
                          "o_year": pd.Series([], dtype=np.int64),
                          "profit_e4": pd.Series([], dtype=np.int64)})
    out = _join_or_empty(
        lambda: (
            joined.map_batches(
                lambda t: pd.DataFrame({
                    "nation": np.asarray(t["nation"]).astype(object),
                    "o_year": np.asarray(t["o_year"], np.int64),
                    "profit_e4": np.asarray(t["amount_e4"], np.int64),
                }).groupby(["nation", "o_year"], as_index=False).sum(),
                batch_format="pyarrow")
            .groupby(["nation", "o_year"])
            .sum(["profit_e4"])
            .to_pandas()
        ),
        empty, sides=(li, orders),
    )
    if out.empty:
        return empty
    out = out.rename(columns={"sum(profit_e4)": "profit_e4"})
    out["o_year"] = out["o_year"].astype(np.int64)
    out["profit_e4"] = out["profit_e4"].astype(np.int64)
    return (out[["nation", "o_year", "profit_e4"]]
            .sort_values(["nation", "o_year"], ascending=[True, False])
            .reset_index(drop=True))


# --------------------------------------- Q16: supplier-part relation counts
def q16_supplier_part_counts(sf_dir: str, excl_brand: str = "Brand#1",
                             excl_type: str = "PROMO",
                             sizes: tuple = (1, 4, 9, 16, 25, 36, 49)) -> pd.DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can supply parts of each
    (brand, type, size), excluding one brand, one type family, and suppliers
    with complaints — a COUNT(DISTINCT) over a filtered many-to-many.

    Adaptations to this table set: the part↔supplier relation is the
    distinct (part, supplier) pairs observed in lineitem; "customer
    complaints" is a negative account balance.

    Scale shape: the eligible-part attribute map (brand/type/size cut) and
    the tiny bad-supplier blacklist broadcast; the fact scan reduces each
    batch to unique (brand, type, size, suppkey) quadruples, a 4-key
    groupby finishes the distinct, and a second (tiny) 3-key groupby counts
    suppliers — COUNT(DISTINCT) as the repo's pair-dedup-combiner idiom."""
    import ray

    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_type", "p_size"]).to_pandas()
    size_set = set(int(s) for s in sizes)
    keep = ((part["p_brand"] != excl_brand) & (part["p_type"] != excl_type)
            & part["p_size"].astype(int).isin(size_set))
    attr = {
        int(k): (b, ty, int(sz))
        for k, b, ty, sz in zip(part["p_partkey"][keep], part["p_brand"][keep],
                                part["p_type"][keep], part["p_size"][keep])
    }
    part_ref = ray.put(attr)

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).to_pandas()
    bad = np.sort(supp["s_suppkey"][
        (supp["s_acctbal"] * 100.0).round().astype(np.int64) < 0
    ].to_numpy(np.int64))
    bad_t = tuple(int(k) for k in bad)

    class PairDedup:
        def __init__(self, part_ref, bad):
            at = maybe_get(part_ref)
            self.pk = np.sort(np.fromiter(at.keys(), np.int64, count=len(at)))
            self.attr = [at[int(k)] for k in self.pk]
            self.bad = np.asarray(bad, np.int64)

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            pk = np.asarray(t["l_partkey"], np.int64)
            sk = np.asarray(t["l_suppkey"], np.int64)
            keep = sorted_membership(self.pk, pk) & ~sorted_membership(self.bad, sk)
            if not keep.any():
                return pd.DataFrame({"p_brand": pd.Series([], dtype=object),
                                     "p_type": pd.Series([], dtype=object),
                                     "p_size": pd.Series([], dtype=np.int64),
                                     "l_suppkey": pd.Series([], dtype=np.int64),
                                     "one": pd.Series([], dtype=np.int64)})
            pos = np.searchsorted(self.pk, pk[keep])
            df = pd.DataFrame({
                "p_brand": np.array([self.attr[p][0] for p in pos], object),
                "p_type": np.array([self.attr[p][1] for p in pos], object),
                "p_size": np.array([self.attr[p][2] for p in pos], np.int64),
                "l_suppkey": sk[keep],
            }).drop_duplicates()
            df["one"] = np.int64(1)
            return df

    quads = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(
            task_stage(PairDedup, (part_ref, bad_t),
                       key=("q16", excl_brand, excl_type, sizes, part_ref)),
            batch_format="pyarrow",
        )
        .groupby(["p_brand", "p_type", "p_size", "l_suppkey"])
        .count()
    )
    out = (
        quads.map_batches(
            lambda t: pa.table({"p_brand": t["p_brand"], "p_type": t["p_type"],
                                "p_size": t["p_size"],
                                "one": pa.array(np.ones(len(t), np.int64))}),
            batch_format="pyarrow",
        )
        .groupby(["p_brand", "p_type", "p_size"])
        .sum(["one"])
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"p_brand": pd.Series([], dtype=object),
                             "p_type": pd.Series([], dtype=object),
                             "p_size": pd.Series([], dtype=np.int64),
                             "supplier_cnt": pd.Series([], dtype=np.int64)})
    out = out.rename(columns={"sum(one)": "supplier_cnt"})
    out["p_size"] = out["p_size"].astype(np.int64)
    out["supplier_cnt"] = out["supplier_cnt"].astype(np.int64)
    return (out.sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"],
                            ascending=[False, True, True, True])
            .reset_index(drop=True))


# ----------------------------------------- Q20: potential part promotion
def q20_promotion_suppliers(sf_dir: str, name_prefix: str = "red",
                            date_lo: str = "1996-01-01",
                            date_hi: str = "1997-01-01") -> pd.DataFrame:
    """TPC-H Q20 shape: suppliers holding a dominant share of a promoted
    part's yearly volume — the half-of-total correlated gate.

    Adapted to this table set (no partsupp availqty): a supplier qualifies
    if, for some part whose name starts with the prefix, it shipped MORE
    THAN HALF of that part's total volume in the window (``2·sq > tq`` in
    exact integers).

    Scale shape: named partkeys broadcast as block refs; the window scan
    prunes on them before its per-(part, supplier) volume partial; the
    per-part totals reduce FROM that grouped result (no second fact scan)
    and broadcast back for the gate.  Everything after the fact scan is
    pruned-part scale."""
    named = (
        _read(sf_dir, "part", ["p_partkey", "p_name"])
        .map_batches(
            lambda t: pa.table({"k": t.filter(pc.starts_with(
                t["p_name"], name_prefix))["p_partkey"]}),
            batch_format="pyarrow",
        )
    )
    part_refs = tuple(_key_refs(named))
    lo, hi = np.datetime64(date_lo, "us"), np.datetime64(date_hi, "us")

    class VolPartial:
        def __init__(self, refs):
            self.parts = _assemble_int64(refs, "k")

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            d = np.asarray(t["l_shipdate"]).astype("datetime64[us]")
            pk = np.asarray(t["l_partkey"], np.int64)
            keep = (d >= lo) & (d < hi) & sorted_membership(self.parts, pk)
            df = pd.DataFrame({
                "l_partkey": pk[keep],
                "l_suppkey": np.asarray(t["l_suppkey"], np.int64)[keep],
                "sq": np.asarray(t["l_quantity"], np.float64)[keep].astype(np.int64),
            })
            return df.groupby(["l_partkey", "l_suppkey"], as_index=False).sum()

    vol = (
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
        .map_batches(
            task_stage(VolPartial, (part_refs,),
                       key=("q20", name_prefix, date_lo, *part_refs)),
            batch_format="pyarrow",
        )
        .groupby(["l_partkey", "l_suppkey"])
        .sum(["sq"])
        .materialize()
    )
    empty = pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                          "s_name": pd.Series([], dtype=object),
                          "n_name": pd.Series([], dtype=object)})
    if vol.count() == 0:
        return empty

    tot = (
        vol.map_batches(
            lambda t: pa.table({"l_partkey": t["l_partkey"],
                                "tq": t["sum(sq)"]}),
            batch_format="pyarrow",
        )
        .groupby("l_partkey")
        .sum(["tq"])
    )
    tot_refs = tuple(_key_refs(tot))

    class HalfGate:
        def __init__(self, refs):
            pk_parts, tq_parts = [], []
            for r in refs:
                t = maybe_get(r)
                if len(t):
                    pk_parts.append(np.asarray(t["l_partkey"], np.int64))
                    tq_parts.append(np.asarray(t["sum(tq)"], np.int64))
            pk = np.concatenate(pk_parts) if pk_parts else np.array([], np.int64)
            order = np.argsort(pk)
            self.pk = pk[order]
            self.tq = (np.concatenate(tq_parts)[order]
                       if tq_parts else np.array([], np.int64))

        def __call__(self, t: pa.Table) -> pa.Table:
            pk = np.asarray(t["l_partkey"], np.int64)
            sq = np.asarray(t["sum(sq)"], np.int64)
            pos = np.searchsorted(self.pk, pk)
            win = 2 * sq > self.tq[pos]
            return pa.table({"s_suppkey": pa.array(
                np.unique(np.asarray(t["l_suppkey"], np.int64)[win]))})

    winners = (
        vol.map_batches(
            task_stage(HalfGate, (tot_refs,), key=("q20g", *tot_refs)),
            batch_format="pyarrow",
        )
        .groupby("s_suppkey")
        .count()
        .to_pandas()
    )
    if winners.empty:
        return empty
    dim = _dim_lookup(sf_dir)
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_name", "s_nationkey"]).to_pandas()
    attr = {int(k): (nm, dim.get(int(nk), ("", ""))[0])
            for k, nm, nk in zip(supp["s_suppkey"], supp["s_name"],
                                 supp["s_nationkey"])}
    keys = winners["s_suppkey"].astype(np.int64)
    return (pd.DataFrame({
        "s_suppkey": keys,
        "s_name": [attr[int(k)][0] for k in keys],
        "n_name": [attr[int(k)][1] for k in keys],
    }).sort_values("s_suppkey").reset_index(drop=True))


# ----------------------------------------- Q21: suppliers who kept waiting
def q21_waiting_suppliers(sf_dir: str, late_days: int = 90,
                          status: str = "F", topk: int = 10) -> pd.DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier in
    multi-supplier finished orders — the exists/not-exists double-correlated
    gate, re-expressed as per-order supplier-set aggregates.

    Adapted to this table set (no commit/receipt dates): "late" means
    shipped more than ``late_days`` after the order date.

    Scale shape: ONE hash join at order grain (lineitem ⨝ orders for the
    late flag), then one partition-then-vectorize shuffle keyed on orderkey
    — every (order, supplier, late) row of an order lands in the same
    partition, so the supplier-dedup, the per-order counts AND the
    sole-late gate all evaluate inside a single vectorized ``map_groups``
    (no second order-grain groupby, no join-back).  The per-supplier
    verdict is a supplier-cardinality groupby; only that lands in pandas."""
    from marc_record_merge_melindautils_ray.functions.hashing import splitmix64
    from marc_record_merge_melindautils_ray.stages.cluster import adaptive_parts

    def ord_filter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], status))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_orderdate": t["o_orderdate"]})

    orders = (_read(sf_dir, "orders",
                    ["o_orderkey", "o_orderdate", "o_orderstatus"])
              .map_batches(ord_filter, batch_format="pyarrow"))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    joined = li.join(
        orders, join_type="inner",
        num_partitions=adaptive_parts(li.count(), rows_per_part=250_000),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    lateness = np.timedelta64(late_days, "D").astype("timedelta64[us]")
    order_parts = adaptive_parts(li.count())

    def late_partial(t: pa.Table) -> pd.DataFrame:
        ship = np.asarray(t["l_shipdate"]).astype("datetime64[us]")
        odate = np.asarray(t["o_orderdate"]).astype("datetime64[us]")
        ok = np.asarray(t["l_orderkey"], np.int64)
        df = pd.DataFrame({
            "l_orderkey": ok,
            "l_suppkey": np.asarray(t["l_suppkey"], np.int64),
            "late": (ship > odate + lateness).astype(np.int64),
        })
        # per-batch combiner: one row per (order, supplier) seen in the batch
        df = df.groupby(["l_orderkey", "l_suppkey"], as_index=False).max()
        with np.errstate(over="ignore"):
            df["part"] = (
                splitmix64(df["l_orderkey"].to_numpy(np.int64).view(np.uint64))
                % np.uint64(order_parts)
            ).astype(np.int64)
        return df

    def sole_late_gate(g: pd.DataFrame) -> pd.DataFrame:
        """All rows of an order are in this partition: finish the supplier
        dedup, compute per-order (n_supp, n_late), apply the gate — one
        vectorized pass over the whole partition."""
        flags = g.groupby(["l_orderkey", "l_suppkey"], as_index=False)["late"].max()
        per_order = flags.groupby("l_orderkey")["late"].agg(["count", "sum"])
        ok = flags["l_orderkey"].to_numpy()
        keep = ((flags["late"].to_numpy() == 1)
                & (per_order["count"].loc[ok].to_numpy() >= 2)
                & (per_order["sum"].loc[ok].to_numpy() == 1))
        out = pd.DataFrame({"l_suppkey": flags["l_suppkey"].to_numpy()[keep],
                            "numwait": np.ones(int(keep.sum()), np.int64)})
        return out.groupby("l_suppkey", as_index=False).sum()

    empty = pd.DataFrame({"s_name": pd.Series([], dtype=object),
                          "numwait": pd.Series([], dtype=np.int64)})

    out = _join_or_empty(
        lambda: (
            joined.map_batches(late_partial, batch_format="pyarrow")
            .groupby("part")
            .map_groups(sole_late_gate, batch_format="pandas")
            .groupby("l_suppkey")
            .sum(["numwait"])
            .to_pandas()
        ),
        empty, sides=(li, orders),
    )
    if out is empty or out.empty:
        return empty
    out = out.rename(columns={"sum(numwait)": "numwait"})
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    names = dict(zip(supp["s_suppkey"].astype(np.int64), supp["s_name"]))
    out["s_name"] = out["l_suppkey"].map(lambda k: names.get(int(k), ""))
    out["numwait"] = out["numwait"].astype(np.int64)
    return (out[["s_name", "numwait"]]
            .sort_values(["numwait", "s_name"], ascending=[False, True])
            .head(topk)
            .reset_index(drop=True))
