#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify.scala's parquet
dumps, run each oracle SQL in DuckDB over the same sf dir, and compare
(rows sorted, columns sorted by name, values hashed). Dev tool only — the
engine itself never depends on this."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).removesuffix(".parquet")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got_rel = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'")
        want_rel = con.sql(sql)
        got = got_rel.df()
        want = want_rel.df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        fails += 1; continue
    # Type gate: the driver's hash is type-sensitive, so an oracle column
    # whose DuckDB type diverges from the Spark parquet schema (classic case:
    # windowed sum(INTEGER) typed HUGEINT vs Spark BIGINT) must fail here
    # even though the dtype-tolerant value compare below would pass.
    got_types = dict(zip([str(c) for c in got_rel.columns], [str(t) for t in got_rel.types]))
    want_types = dict(zip([str(c) for c in want_rel.columns], [str(t) for t in want_rel.types]))
    type_diffs = [f"{c}: spark={got_types[c]} oracle={want_types[c]}"
                  for c in got.columns if got_types.get(c) != want_types.get(c)]
    if type_diffs:
        print(f"FAIL {name}: column type mismatch (cast your oracle): "
              + "; ".join(type_diffs))
        fails += 1; continue
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    want = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
    # dtype-tolerant exact compare
    mismatch = None
    for c in got.columns:
        a, b = got[c], want[c]
        try:
            if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                eq = (a.astype(float).fillna(1.5e308) == b.astype(float).fillna(1.5e308))
            else:
                eq = a.astype(str) == b.astype(str)
        except Exception:
            eq = a.astype(str) == b.astype(str)
        if not eq.all():
            i = eq.idxmin()
            mismatch = f"col {c} row {i}: spark={a[i]!r} oracle={b[i]!r}"
            break
    if mismatch:
        print(f"FAIL {name}: {mismatch}"); fails += 1
    else:
        print(f"OK   {name}: {len(got)} rows")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
