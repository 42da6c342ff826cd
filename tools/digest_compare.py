#!/usr/bin/env python3
"""Digest compare for outputs too large for local_check's pandas
row-diff (the sf10 resamples are 105M rows a side — two stringified
frames of that size do not fit): DuckDB computes an order-independent
digest of BOTH sides — count + sum(hash(row)) + per-column min/max
over the NAME-SORTED, VARCHAR-cast columns, the same canonicalization
the stringify compare applies — and equality of the digests is the
same evidence the driver's value-hash records.

Usage: python3 tools/digest_compare.py <sf_dir> <out_dir> <query_name>
  <sf_dir>   parquet tables dir (e.g. target/testdata/sf10)
  <out_dir>  a graft.Verify output dir holding <query_name>/ and
             oracle_sql.json
Env: DUCKDB_MEMORY_LIMIT (default 60GB), DUCKDB_THREADS (default 24).
"""
import json
import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def digest(con, src_sql, cols):
    cast = ", ".join(f"CAST({c} AS VARCHAR) AS {c}" for c in cols)
    h = ", ".join(cols)
    mm = ", ".join(f"min({c}) AS min_{c}, max({c}) AS max_{c}"
                   for c in cols)
    return con.execute(
        f"WITH canon AS (SELECT {cast} FROM ({src_sql})) "
        f"SELECT count(*) AS n, sum(hash({h})) AS sh, {mm} FROM canon"
    ).fetchone()


def main(sf_dir, out_dir, name):
    con = duckdb.connect()
    con.execute(
        f"SET memory_limit='{os.environ.get('DUCKDB_MEMORY_LIMIT', '60GB')}'")
    con.execute(f"SET threads={int(os.environ.get('DUCKDB_THREADS', 24))}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    spark_src = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
    cols = sorted(r[0] for r in con.execute(f"DESCRIBE {spark_src}").fetchall())
    # The oracle must expose the SAME column-name set — otherwise an
    # extra or renamed oracle column would be silently projected away by
    # the digest instead of flagged (r16 advice).
    ocols = sorted(r[0] for r in con.execute(f"DESCRIBE ({sql})").fetchall())
    if cols != ocols:
        print(f"{name}: MISMATCH column sets differ "
              f"spark={cols} oracle={ocols}")
        return 1
    sd = digest(con, spark_src, cols)
    od = digest(con, sql, cols)
    ok = sd == od
    print(f"{name}: {'OK' if ok else 'MISMATCH'} rows={sd[0]}/{od[0]} "
          f"digest_match={sd[1] == od[1]}")
    if not ok:
        print(f"  spark : {sd}")
        print(f"  oracle: {od}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
