"""Driver-contract smoke + oracle-parity spot checks (full sweep:
scripts/verify_entry.py)."""

from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not Path(SF_DIR).is_dir(), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("lineitem", "documents", "embeddings"):
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"vertex", "pr"}


def test_every_oracle_key_has_query(spark):
    qs = entry_mod.queries()
    for name in entry_mod.oracle_sql():
        assert name in qs


@pytest.mark.parametrize("name", ["pagerank10", "lp4", "triangles"])
def test_oracle_parity_spot(spark, duck, name):
    sdf = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    ddf = duck.sql(entry_mod.oracle_sql()[name]).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    a = sdf[cols].sort_values(cols, ignore_index=True)
    b = ddf[cols].sort_values(cols, ignore_index=True)
    for c in cols:
        assert a[c].astype(str).tolist() == b[c].astype(str).tolist(), c
