"""Builder-side driver-style oracle sweep: run EVERY ``queries()`` entry at
sf0.01, compare oracle-backed ones against DuckDB side-by-side (columns
sorted before compare, like the driver), and write a per-round JSON artifact
so the "all oracle-backed queries match" claim is independently checkable
(VERDICT r3 item 6).

Usage: python tools/sweep.py [SF_DIR] [OUT_JSON]
"""

import json
import sys
import time
import traceback

import duckdb
import pandas as pd
import ray
from ray.data import DataContext

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, "/root/repo")
import __ray_entry__ as E  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "SWEEP_r05.json"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def to_df(x):
    import pyarrow as pa

    import ray.data as rd

    if isinstance(x, rd.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # list/ndarray cells (e.g. embedding projections) aren't sortable keys;
    # order by the scalar columns only
    def _scalar(c):
        s = df[c].dropna()
        return len(s) == 0 or not hasattr(s.iloc[0], "__len__") or isinstance(s.iloc[0], str)

    keys = [c for c in df.columns if _scalar(c)] or list(df.columns)[:0]
    if keys:
        df = df.sort_values(keys)
    return df.reset_index(drop=True)


qs, oracles = E.queries(), E.oracle_sql()
results: dict[str, dict] = {}
for name, fn in qs.items():
    t0 = time.time()
    row: dict = {}
    try:
        got = canon(to_df(fn(SF)))
        row["rows"] = len(got)
        row["sec"] = round(time.time() - t0, 2)
        if name not in oracles:
            row["status"] = "rows_only"
        else:
            exp = canon(con.sql(oracles[name]).df())
            ok_rows = len(got) == len(exp)
            ok_cols = list(got.columns) == list(exp.columns)
            ok_vals = False
            if ok_rows and ok_cols:
                ok_vals = got.equals(exp) or all(
                    (got[c].astype(str).to_numpy()
                     == exp[c].astype(str).to_numpy()).all()
                    for c in got.columns
                )
            row["oracle_rows"] = len(exp)
            row["status"] = "match" if (ok_rows and ok_cols and ok_vals) else "mismatch"
    except Exception as ex:
        row["status"] = "error"
        row["err"] = f"{type(ex).__name__}: {ex}"
        traceback.print_exc()
    results[name] = row
    print(f"{name}: {row.get('status')} rows={row.get('rows')} "
          f"{row.get('sec', 0)}s", flush=True)

summary = {
    "sf_dir": SF,
    "total": len(results),
    "match": sum(r.get("status") == "match" for r in results.values()),
    "rows_only": sum(r.get("status") == "rows_only" for r in results.values()),
    "mismatch": sorted(k for k, r in results.items() if r.get("status") == "mismatch"),
    "error": sorted(k for k, r in results.items() if r.get("status") == "error"),
    "queries": results,
}
with open(OUT, "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps({k: summary[k] for k in
                  ("total", "match", "rows_only", "mismatch", "error")}))
ray.shutdown()
