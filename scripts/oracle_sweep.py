#!/usr/bin/env python
"""Driver-style correctness sweep at ARBITRARY scale factors.

tests/test_queries_oracle.py pins every oracle query at sf0.001; the driver
additionally checks larger SFs. This runs the same order-insensitive
value-exact comparison for every oracle_sql() entry at the given SF dirs
(default: sf0.01 + sf0.1 — the t_* transcript queries pin their own fixture
paths, so they are compared once). Exit code = number of mismatches.

Usage: python scripts/oracle_sweep.py [SF_DIR ...]
"""
from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(v):
    if v is None:
        return "N"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.10g}"
    return str(v)


def _rowset(pdf):
    cols = sorted(pdf.columns)
    return sorted("|".join(_canon(r[c]) for c in cols)
                  for _, r in pdf[cols].iterrows())


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from openlogparse_spark.session import get_spark

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark("oracle_sweep")
    fails = 0
    for i, sf_dir in enumerate(sf_dirs):
        con = duckdb.connect()
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        for name, sql in sorted(entry_mod.oracle_sql().items()):
            if name.startswith("t_") and i > 0:
                continue   # transcript queries are SF-pinned; compare once
            try:
                got = entry_mod.queries()[name](spark, sf_dir).toPandas()
                exp = con.execute(sql).df()
                ok = (sorted(got.columns) == sorted(exp.columns)
                      and len(got) == len(exp)
                      and _rowset(got) == _rowset(exp))
            except Exception as ex:   # noqa: BLE001 — report, keep sweeping
                print(f"ERROR {sf_dir} {name}: {str(ex)[:150]}", flush=True)
                fails += 1
                continue
            if ok:
                print(f"ok   {os.path.basename(sf_dir)} {name} "
                      f"({len(got)} rows)", flush=True)
            else:
                print(f"FAIL {sf_dir} {name}: rows {len(got)} vs {len(exp)}",
                      flush=True)
                fails += 1
    print("TOTAL FAILS:", fails)
    spark.stop()
    return fails


if __name__ == "__main__":
    raise SystemExit(main())
