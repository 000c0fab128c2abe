"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and, where an
``oracle_sql()`` entry exists, the same query on DuckDB over the identical
parquet tables; compares row count, column names, and order-insensitive
values (exact for ints/strings, bit-exact for doubles — mismatches report
the max abs diff so rounding policy can be tuned).

Usage: python scripts/verify_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E  # noqa: E402
from flexgraph_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(ddf.columns):
        problems.append(f"schema: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        return problems
    if len(sdf) != len(ddf):
        problems.append(f"rows: spark={len(sdf)} duck={len(ddf)}")
        return problems
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols, ignore_index=True)
    b = ddf[cols].sort_values(cols, ignore_index=True)
    for c in cols:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float)
            bv = bv.astype(float)
            if not np.array_equal(av.to_numpy(), bv.to_numpy()):
                d = np.abs(av.to_numpy() - bv.to_numpy())
                problems.append(f"col {c}: {int((d > 0).sum())} diffs, max={np.nanmax(d):.3e}")
        else:
            neq = (av.astype(str) != bv.astype(str)).sum()
            if neq:
                problems.append(f"col {c}: {neq} value diffs (e.g. {av[av.astype(str) != bv.astype(str)].head(3).tolist()} vs {bv[av.astype(str) != bv.astype(str)].head(3).tolist()})")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("verify-entry", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok*   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            if len(sdf) == 0 and name not in ("dup_groups",):
                print(f"      WARN {name}: empty result on rows-only query")
            continue
        try:
            ddf = con.sql(sql).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL  {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"ok    {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
