"""Replicates the driver's correctness gate: run every __spark_entry__
query against its DuckDB oracle at sf0.001 (and the pinned-sf transcripts
fixtures), comparing row count + column names + order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck_testdata():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    return str(v)


def _rowset(pdf):
    cols = sorted(pdf.columns)
    rows = ["|".join(_canon(r[c]) for c in cols) for _, r in pdf[cols].iterrows()]
    return sorted(rows)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck_testdata, name):
    q = entry_mod.queries()[name]
    got = q(spark, SF_DIR).toPandas()
    exp = duck_testdata.execute(entry_mod.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    g, e = _rowset(got), _rowset(exp)
    mism = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:5]
    assert g == e, f"{name}: first mismatches {[(g[i], e[i]) for i in mism]}"


@pytest.mark.parametrize("name", sorted(set(entry_mod.queries())
                                        - set(entry_mod.oracle_sql())))
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
