#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet, read the Spark parquet dump, sort columns
by name + rows by all columns, and compare row counts, dtypes, and values.

Usage: python3 tools/local_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Stringify for a stable total order (mirrors a value-hash compare).
    s = df.astype(str)
    order = s.sort_values(by=list(s.columns)).index
    return s.loc[order].reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    # Optional caps so several sf10-scale compares can run side by side
    # without DuckDB instances each assuming they own the whole host.
    if os.environ.get("DUCKDB_MEMORY_LIMIT"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMORY_LIMIT']}'")
    if os.environ.get("DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.execute(sql).df()
            sdf = pd.read_parquet(f"{out_dir}/{name}")
            rows = len(odf) == len(sdf)
            oc, sc = canon(odf), canon(sdf)
            schema = list(oc.columns) == list(sc.columns)
            values = schema and rows and oc.equals(sc)
            status = "OK" if (rows and schema and values) else "MISMATCH"
            if status != "OK":
                failures += 1
            print(f"{name}: {status} rows={len(sdf)}/{len(odf)} "
                  f"schema={schema} values={values}")
            if not schema:
                print(f"  spark cols:  {sorted(sdf.columns)}")
                print(f"  oracle cols: {sorted(odf.columns)}")
            elif not values and rows:
                neq = (oc != sc).any(axis=1)
                bad = neq[neq].index[:3]
                for i in bad:
                    print(f"  row {i}:\n   spark : {sc.loc[i].to_dict()}\n"
                          f"   oracle: {oc.loc[i].to_dict()}")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
