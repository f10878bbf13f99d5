#!/usr/bin/env python3
"""Local replay of the driver's correctness gate: run each oracle SQL in
DuckDB against the testdata parquet and compare exactly (columns sorted
by name, rows sorted) with the parquet Verify dumped.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [query ...]
Dev tooling only — the shipped library is pure Scala/Spark.
"""
import json
import math
import sys

import numpy as np
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    # pandas frame -> sorted-by-name columns, sorted rows, python values
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, (float, np.floating)):
                # exact: the driver hash-compares, so we must too
                v = float(v)
                row.append("NaN" if math.isnan(v) else v.hex())
            elif isinstance(v, np.ndarray):
                # str(ndarray) truncates ('...') and rounds — encode fully
                row.append(tuple(
                    float(x).hex() if isinstance(x, (float, np.floating)) else str(x)
                    for x in v.tolist()))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    rows.sort()
    return list(df.columns), rows


def main(out_dir, sf_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    # optional trailing query names: scope a local subset check to the
    # queries a partial Verify run actually dumped (Verify always writes
    # the FULL oracle map, so unscoped MISSING entries are loud)
    if only:
        oracle = {k: v for k, v in oracle.items() if k in set(only)}
    failed = []
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"MISSING  {name} (no spark output)")
            failed.append(name)
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
        except Exception as e:
            # dir exists but holds no parquet (query failed after mkdir)
            print(f"SPARK-ERR {name}: {e}")
            failed.append(name)
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            failed.append(name)
            continue
        sc, sr = canon(spark_df)
        dc, dr = canon(duck_df)
        if sc != dc:
            print(f"SCHEMA   {name}: spark={sc} duck={dc}")
            failed.append(name)
        elif sr != dr:
            print(f"VALUES   {name}: {len(sr)} vs {len(dr)} rows", end="")
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            if not diff:  # same prefix, differing lengths
                only_s = [r for r in sr if r not in set(dr)][:3]
                only_d = [r for r in dr if r not in set(sr)][:3]
                diff = [("spark-only", only_s), ("duck-only", only_d)]
            print(f"; first diffs: {diff}")
            failed.append(name)
        else:
            print(f"OK       {name} ({len(sr)} rows)")
    rowcheck = set(p.name for p in Path(out_dir).iterdir() if p.is_dir()) - set(oracle)
    for name in sorted(rowcheck):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{Path(out_dir)/name}/*.parquet')").fetchone()[0]
        print(f"ROWS-ONLY {name}: {n} rows (no oracle)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} oracle queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
