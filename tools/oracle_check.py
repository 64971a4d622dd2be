import sys, time, traceback
import duckdb, pandas as pd, numpy as np
import ray
from ray.data import DataContext

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, "/root/repo")
import __ray_entry__ as E

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def to_df(x):
    import ray.data as rd, pyarrow as pa
    if isinstance(x, rd.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x

def canon(df):
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df

qs = E.queries()
oracles = E.oracle_sql()
only = sys.argv[2:] or list(qs)
for name in only:
    fn = qs[name]
    t0 = time.time()
    try:
        got = canon(to_df(fn(SF)))
    except Exception:
        print(f"{name}: RAY ERROR"); traceback.print_exc(); continue
    dt = time.time() - t0
    if name not in oracles:
        print(f"{name}: rows-only, {len(got)} rows, {dt:.1f}s")
        continue
    try:
        exp = canon(con.sql(oracles[name]).df())
    except Exception:
        print(f"{name}: ORACLE ERROR"); traceback.print_exc(); continue
    ok_rows = len(got) == len(exp)
    ok_cols = list(got.columns) == list(exp.columns)
    ok_vals = False
    if ok_rows and ok_cols:
        try:
            ok_vals = got.equals(exp)
            if not ok_vals:
                # dtype-tolerant compare
                ok_vals = all(
                    (got[c].to_numpy() == exp[c].to_numpy()).all() for c in got.columns
                )
        except Exception as e:
            print("  cmp err", e)
    status = "OK" if (ok_rows and ok_cols and ok_vals) else "MISMATCH"
    print(f"{name}: {status} rows={len(got)}/{len(exp)} cols_ok={ok_cols} {dt:.1f}s")
    if status == "MISMATCH" and ok_rows and ok_cols:
        for c in got.columns:
            try:
                same = (got[c].to_numpy() == exp[c].to_numpy()).all()
            except Exception:
                same = "?"
            if same is not True:
                print(f"   col {c}: got={got[c].head(3).tolist()} exp={exp[c].head(3).tolist()}")
    elif status == "MISMATCH":
        print("   got cols", list(got.columns), "exp cols", list(exp.columns))
ray.shutdown()
