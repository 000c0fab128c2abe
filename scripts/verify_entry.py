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


# Formal waivers for the registry's rows-only faces: every entry here is
# the PRODUCTION face of an operator whose algebra/accuracy is value-gated
# by the named companion queries — the face itself can't sit under the
# DuckDB oracle for the stated mechanical reason. Anything rows-only and
# NOT in this dict is an un-waived proof gap.
ROWS_ONLY_WAIVERS = {
    "ann_lsh_top5": "seeded-Gaussian hyperplanes aren't SQL-replayable; "
        "full sha-plane replay value-gated by lsh_recall_gate (same code "
        "path, plane constants only)",
    "emb_neardup": "same Gaussian-plane reason; full sha-plane replay "
        "value-gated by emb_neardup_sha + emb_neardup_precision",
    "near_dup_minhash": "xxhash64 signature permutations aren't "
        "SQL-replayable; recall deterministically gated by "
        "minhash_recall_gate, precision by minhash_precision",
    "simhash": "xxhash64 token hashes aren't SQL-replayable; precision "
        "gated by simhash_precision",
    "simhash_neardup": "same xxhash64 reason; gated by simhash_precision",
    "winnow_fp": "xxhash64 k-gram hashes aren't SQL-replayable; "
        "containment/coverage value-gated by winnow_containment",
    "hadi_series": "DataSketches HLL register states aren't "
        "SQL-reproducible; recurrence value-gated bit-for-bit by "
        "hadi_registers (sha-register face), accuracy by hadi_precision "
        "+ neighborhood3",
    "semdedup": "k-means|| fit isn't DuckDB-replicable; clustered "
        "pipeline value-gated by semdedup_sha (sha-plane partitioner, "
        "same code path), keep rule by semdedup_k1, assignment by "
        "ann_ivf_top5, drops by semdedup_containment",
}


def _update_coverage(results: dict[str, bool], oracles: dict[str, str],
                     registry: list[str]) -> None:
    """Merge this invocation's outcomes into COVERAGE.json — one file that
    answers "what fraction of the registry is currently proven" without a
    full sweep. Per query: oracle kind, the last driver CORRECTNESS round
    that contained it, and the last local verify outcome (persisted
    across partial runs, stamped with the run time)."""
    import glob
    import json
    import re

    root = Path(__file__).resolve().parent.parent
    cov_path = root / "COVERAGE.json"
    try:
        cov = json.loads(cov_path.read_text()).get("queries", {})
    except Exception:  # noqa: BLE001 — first run / corrupt file
        cov = {}
    driver_round: dict[str, int] = {}
    for f in sorted(glob.glob(str(root / "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)", f)
        rnd = int(m.group(1)) if m else 0
        try:
            for q, row in json.loads(Path(f).read_text()).items():
                if row.get("err") is None:
                    driver_round[q] = max(driver_round.get(q, 0), rnd)
        except Exception:  # noqa: BLE001
            continue
    stamp = time.strftime("%Y-%m-%dT%H:%M:%S")
    for q in registry:
        entry = cov.get(q, {})
        entry["oracle"] = "value" if q in oracles else "rows_only"
        entry["last_driver_round"] = driver_round.get(q)
        if q in results:
            entry["local_ok"] = bool(results[q])
            entry["local_checked_at"] = stamp
        if q in ROWS_ONLY_WAIVERS:
            entry["reason"] = ROWS_ONLY_WAIVERS[q]
        else:
            entry.pop("reason", None)
        cov[q] = entry
    ok = [q for q, e in cov.items() if e.get("local_ok")]
    proven = [q for q, e in cov.items()
              if e.get("local_ok") or e.get("last_driver_round")]
    summary = {
        "registry_total": len(registry),
        "value_gated": sum(1 for q in registry if q in oracles),
        "rows_only": sum(1 for q in registry if q not in oracles),
        "ever_driver_checked": sum(1 for q in registry if q in driver_round),
        "local_ok": len(ok),
        "proven_any": len(proven),
        "updated_at": stamp,
    }
    cov_path.write_text(json.dumps(
        {"summary": summary, "queries": cov}, indent=1, sort_keys=True))
    print(f"COVERAGE.json: {summary['proven_any']}/{summary['registry_total']} "
          "proven (driver or local)")


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
    results: dict[str, bool] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            results[name] = False
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok*   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            if len(sdf) == 0 and name not in ("dup_groups",):
                print(f"      WARN {name}: empty result on rows-only query")
            results[name] = len(sdf) > 0 or name in ("dup_groups",)
            continue
        try:
            ddf = con.sql(sql).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures += 1
            results[name] = False
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            results[name] = False
            print(f"FAIL  {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      {p}")
        else:
            results[name] = True
            print(f"ok    {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
    _update_coverage(results, oracles, list(qs))
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
