#!/usr/bin/env python3
"""Dev-loop replica of the driver's correctness gate: read graft.Verify's
output dir, run each oracle SQL in DuckDB over the same testdata parquet
tables, and compare (schema by sorted column names, values by sorted rows).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            fail += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:300]}")
            fail += 1
            continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns differ: spark={gcols} duckdb={wcols}")
            fail += 1
            continue
        grows = sorted(tuple(canon(v) for v in row) for row in got[gcols].itertuples(index=False))
        wrows = sorted(tuple(canon(v) for v in row) for row in want[wcols].itertuples(index=False))
        if len(grows) != len(wrows):
            print(f"FAIL {name}: row counts differ: spark={len(grows)} duckdb={len(wrows)}")
            gs, ws = set(grows), set(wrows)
            for r in list(gs - ws)[:3]: print(f"   spark-only: {r}")
            for r in list(ws - gs)[:3]: print(f"   duck-only:  {r}")
            fail += 1
        elif grows != wrows:
            diffs = [(a, b) for a, b in zip(grows, wrows) if a != b]
            print(f"FAIL {name}: {len(diffs)}/{len(grows)} rows differ; first:")
            for a, b in diffs[:3]:
                print(f"   spark: {a}\n   duck:  {b}")
            fail += 1
        else:
            print(f"ok   {name} ({len(grows)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
