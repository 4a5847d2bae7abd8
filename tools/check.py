#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only, not
part of the engine). Usage:
    python3 tools/check.py /tmp/verify_out /root/testdata/sf0.001
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Compares each <outDir>/<name> parquet against the DuckDB result of
oracle_sql.json[name], column-name-sorted, value-hashed.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns, floats stay as-is
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c])
    return df.reset_index(drop=True)

def main(outdir: str, sfdir: str) -> int:
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    for name in sorted(oracle):
        pdir = os.path.join(outdir, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        got = canon(pq.ParquetDataset(pdir).read().to_pandas())
        try:
            exp = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); failures += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            failures += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); failures += 1; continue
        # value compare, row-sorted to be robust to ordering
        gs = got.sort_values(list(got.columns)).reset_index(drop=True)
        es = exp.sort_values(list(exp.columns)).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(gs, es, check_dtype=False, check_exact=True)
        except AssertionError as e:
            print(f"FAIL {name}: values differ\n{str(e)[:800]}")
            failures += 1; continue
        # also check as-written ordering matches oracle ordering
        ordered_ok = True
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
        except AssertionError:
            ordered_ok = False
        print(f"PASS {name} ({len(got)} rows{'' if ordered_ok else ', ORDER differs'})")
    print(("ALL PASS" if failures == 0 else f"{failures} FAILURES"))
    return failures

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
