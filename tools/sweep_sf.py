"""Full external-replica sweep: run every queries() entry and its oracle
at a given sf dir, compare rows/schema/sorted values like the driver.

This is the tool behind every consolidation-gate record in BASELINE.md
(e.g. "300/300 value-exact at sf0.01 AND sf0.1"). Usage:

    python tools/sweep_sf.py /root/testdata/sf0.01
    python tools/sweep_sf.py /root/testdata/sf0.1

Exit 0 iff every query matches its oracle on rows, sorted column names,
and values (atol 1e-9 on floats, exact otherwise). Owns its Ray session
(standalone script, not library code)."""
import json
import os
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import ray

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(obj):
    import pyarrow as pa
    import ray.data as rd
    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, log_to_driver=False)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    import importlib
    m = importlib.import_module("__ray_entry__")
    qs, sqls = m.queries(), m.oracle_sql()
    t0 = time.time()
    bad, n = [], 0
    for name, fn in qs.items():
        n += 1
        try:
            got = _normalize(_to_pandas(fn(SF_DIR)))
            want = _normalize(con.execute(sqls[name]).fetchdf())
            if list(got.columns) != list(want.columns):
                bad.append((name, "schema", list(got.columns), list(want.columns)))
            elif len(got) != len(want):
                bad.append((name, "rows", len(got), len(want)))
            else:
                try:
                    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                                  check_exact=False, rtol=0, atol=1e-9)
                except AssertionError as e:
                    bad.append((name, "values", str(e)[:300]))
        except Exception as e:
            bad.append((name, "error", repr(e)[:300]))
        if n % 25 == 0:
            print(f"...{n}/{len(qs)} ({time.time()-t0:.0f}s, bad={len(bad)})", flush=True)
    dt = time.time() - t0
    print(json.dumps({"sf_dir": SF_DIR, "total": len(qs), "bad": len(bad), "sec": round(dt, 1)}))
    for b in bad:
        print("BAD:", b)
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
