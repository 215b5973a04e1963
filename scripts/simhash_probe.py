#!/usr/bin/env python
"""Fresh-session simhash diagnosis (round-4 verdict #2 / round-5 item #3).

Some JVM sessions run the 64-buffer simhash HashAggregate ~4x slower than
others, persistently, with no warm-up recovery — while a same-session
jaccard sentinel stays healthy. Candidate cause: the generated agg-update
method's size vs HotSpot JIT limits. This probe measures, in ONE fresh
session (run it several times; the slow mode is per-session):

  1. a session-health SENTINEL (jaccard_pairs steady state — a healthy
     session reads ~1.7-2.2 s at sf0.1)
  2. the bare simhash() aggregate at pack=1 (stock 64 buffers), pack=2
     (32 buffers), pack=4 (16 buffers), interleaved, N reps each
  3. full simhash_near_pairs at pack=1 and pack=2

Prints one JSON line with every run (no best-of hiding — the point is the
distribution). Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as elsewhere.

Usage: python scripts/simhash_probe.py [--reps 3]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])

    from openlogparse_spark.functions.dedup import (
        jaccard_pairs,
        simhash,
        simhash_near_pairs,
    )
    from openlogparse_spark.session import get_spark

    spark = get_spark("simhash_probe", master=f"local[{CPUS}]")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    def timed(build):
        t0 = time.time()
        df = build()
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 2)
        if hasattr(df, "release_cached_inputs"):
            df.release_cached_inputs()
        return dt

    out: dict[str, list[float] | float | str] = {
        "sf_dir": SF_DIR, "cpus": int(CPUS),
        "split_agg_func": spark.conf.get(
            "spark.sql.codegen.aggregate.splitAggregateFunc.enabled", "true"),
        "huge_method_limit": spark.conf.get(
            "spark.sql.codegen.hugeMethodLimit", "65535"),
    }

    # sentinel: warm + 2 timed
    timed(lambda: jaccard_pairs(docs, n=3, threshold=0.9))
    out["sentinel_jaccard"] = [
        timed(lambda: jaccard_pairs(docs, n=3, threshold=0.9)) for _ in range(2)]

    # interleaved bare-aggregate runs (the suspect stage alone)
    runs: dict[str, list[float]] = {"agg_pack1": [], "agg_pack2": [], "agg_pack4": []}
    for _ in range(reps):
        for p in (1, 2, 4):
            runs[f"agg_pack{p}"].append(
                timed(lambda p=p: simhash(docs, pack=p)))
    out.update(runs)

    # full operator, stock vs packed (bench-comparable number)
    pairs: dict[str, list[float]] = {"pairs_pack1": [], "pairs_pack2": []}
    for _ in range(reps):
        for p in (1, 2):
            pairs[f"pairs_pack{p}"].append(
                timed(lambda p=p: simhash_near_pairs(docs, max_hamming=8, pack=p)))
    out.update(pairs)

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
