#!/usr/bin/env python3
"""Local driver-sim: compare Verify's parquet dumps against the DuckDB oracle.

Usage: python3 tools/check.py <sfDir> <outDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

Mirrors the driver's compare: per query, sort columns by name, sort rows,
hash values; report row/schema/hash match.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name, sql in sorted(oracle.items()):
    spark_path = os.path.join(outdir, name)
    if not os.path.isdir(spark_path):
        if os.environ.get("GRAFT_SKIP_MISSING"):
            continue
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = canon(con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df())
        want = canon(con.execute(sql).df())
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}"); fails += 1; continue
    eq = got.equals(want)
    if not eq:
        # tolerate dtype-width mismatches by value compare
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"WARN {name}: values equal, dtypes differ "
                  f"{dict(got.dtypes)} vs {dict(want.dtypes)}")
            continue
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
            diff = got.compare(want) if got.shape == want.shape else None
            if diff is not None:
                print(diff.head(10))
            fails += 1; continue
    print(f"OK   {name} ({len(got)} rows)")
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
