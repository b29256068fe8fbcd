#!/usr/bin/env python3
"""Dev-only replica of the driver's DuckDB-oracle compare.

NOT part of the engine (the Scala library has no Python dependency) —
this just lets us pre-validate SparkEntry.oracleSql locally before the
driver's per-round run. Usage:

    python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        try:
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        # driver compare: sort columns by name, then hash values
        s = spark_df[sorted(spark_df.columns)]
        o = oracle_df[sorted(oracle_df.columns)]
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
            failures += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            failures += 1
            continue
        mismatch = None
        for c in s.columns:
            sv, ov = s[c].reset_index(drop=True), o[c].reset_index(drop=True)
            try:
                eq = (sv == ov) | (sv.isna() & ov.isna())
            except Exception:
                eq = sv.astype(str) == ov.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = (c, i, sv[i], ov[i], int((~eq).sum()))
                break
        dt_note = ""
        for c in s.columns:
            if str(s[c].dtype) != str(o[c].dtype):
                dt_note += f" [dtype {c}: {s[c].dtype} vs {o[c].dtype}]"
        if mismatch:
            c, i, a, b, n = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} oracle={b!r} ({n} diffs){dt_note}")
            failures += 1
        else:
            print(f"OK   {name}: {len(s)} rows{dt_note}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
