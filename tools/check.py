#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify,
then compare each query's parquet vs its DuckDB oracle on the same
tables. Usage: python3 tools/check.py [sfdir] [outdir]"""
import json, subprocess, sys, glob, os
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def array_cols(df: pd.DataFrame):
    """Columns the DRIVER's pandas sort_values would crash on (its gate
    sorts all columns; numpy arrays are unhashable). Any hit = red row."""
    import numpy as np
    bad = []
    for c in df.columns:
        col = df[c].dropna()
        if len(col) and isinstance(col.iloc[0], (np.ndarray, list, tuple, dict)):
            bad.append(c)
    return bad


def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                row.append(f"{v:.6f}")
            elif hasattr(v, "tolist"):  # numpy array / list col
                row.append(str([f"{x:.6f}" if isinstance(x, float) else str(x) for x in v.tolist()]))
            elif isinstance(v, list):
                row.append(str([str(x) for x in v]))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


def main():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    with open(f"{OUT}/oracle_sql.json") as f:
        oracles = json.load(f)

    results = {}
    for name in sorted(oracles):
        sql = oracles[name]
        pdir = f"{OUT}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        bad = array_cols(spark_df)
        if bad:
            results[name] = f"ARRAY_OUTPUT {bad} (driver sort_values would crash)"
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(sorted(spark_df.columns)) != list(sorted(duck_df.columns)):
            results[name] = f"SCHEMA_MISMATCH spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
        elif s == d:
            results[name] = f"OK ({len(s)} rows)"
        else:
            diff = [x for x in s if x not in set(d)][:3] + [x for x in d if x not in set(s)][:3]
            results[name] = f"VALUE_MISMATCH spark_rows={len(s)} duck_rows={len(d)} sample_diff={diff[:3]}"

    # queries without oracle: rows-only check
    for pdir in sorted(glob.glob(f"{OUT}/*/")):
        name = pdir.rstrip("/").split("/")[-1]
        if name not in oracles:
            files = glob.glob(f"{pdir}/*.parquet")
            if not files:
                results[name] = "ROWS_ONLY (0 rows)"
                continue
            df = pd.concat([pd.read_parquet(f) for f in files])
            bad = array_cols(df)
            if bad:
                results[name] = f"ARRAY_OUTPUT {bad} (driver sort_values would crash)"
            else:
                results[name] = f"ROWS_ONLY ({len(df)} rows)"

    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in results.items():
        flag = "✓" if v.startswith(("OK", "ROWS_ONLY")) else "✗"
        print(f"{flag} {k}: {v}")
    print(f"\n{ok}/{len(oracles)} oracle-matched")
    sys.exit(0 if all(v.startswith(("OK", "ROWS_ONLY")) for v in results.values()) else 1)


if __name__ == "__main__":
    main()
