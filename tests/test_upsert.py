"""CDC MERGE semantics pins: missing-key U/D are no-ops, D beats row
retention, I always appends — on a constructed base/delta pair (the derived
testdata delta never exercises the missing-key arms)."""

import numpy as np
import pandas as pd
import pytest


def test_upsert_constructed_missing_keys(ray_session, tmp_path):
    from marc_record_merge_melindautils_ray.ops.relational import q_upsert_merge

    # keys chosen so custkey%10==7 rows split exactly one per op class,
    # PLUS keys that produce U/D deltas targeting... the derived delta can
    # only reference existing keys, so missing-key semantics are pinned by
    # the op construction itself: k%3==2 inserts land at k+10_000_000 (a key
    # not in base) and must appear exactly once with op='I'.
    df = pd.DataFrame({
        "o_orderkey": np.array([3, 4, 5, 9, 10, 11], np.int64),
        "o_custkey": np.array([7, 17, 27, 5, 5, 5], np.int64),
        "o_orderstatus": "F",
        "o_totalprice": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
        "o_orderdate": pd.Timestamp("1995-01-01"),
        "o_orderpriority": "1-URGENT",
    })
    df.to_parquet(tmp_path / "orders.parquet")
    got = q_upsert_merge(str(tmp_path)).set_index("orderkey")
    # k=3 (cust 7, 3%3==0): updated, +1000.00
    assert got.loc[3].tolist() == [1000 + 100000, "U"]
    # k=4 (cust 17, 4%3==1): deleted
    assert 4 not in got.index
    # k=5 (cust 27, 5%3==2): insert clone at 10_000_005, original untouched
    assert got.loc[5].tolist() == [3000, "="]
    assert got.loc[10_000_005].tolist() == [3000, "I"]
    # non-delta customers untouched
    for k, p in ((9, 4000), (10, 5000), (11, 6000)):
        assert got.loc[k].tolist() == [p, "="]
    assert len(got) == 6  # 6 base − 1 delete + 1 insert
