#!/usr/bin/env python
"""Bisect WHAT cures the simhash slow mode (round-5 follow-up).

Observed: in a fresh session, simhash_near_pairs alone = ~10-12 s on every
run (3 runs, no recovery); the same query after a 2 s jaccard_pairs = ~3 s.
So some side effect of jaccard warms a path simhash needs but cannot warm
for itself. Each MODE runs in its own fresh session:

  alone       simhash x3, nothing first (baseline slow repro)
  cure        simhash, then jaccard, then simhash x2 (does jaccard cure a
              session already in slow mode?)
  range       spark.range shuffle+count first (generic shuffle machinery)
  scan        documents.parquet full-text scan+count first (parquet/IO path)
  explode     scan + token explode + count, no agg (generator path)
  agg8        8-buffer token hash agg first (small codegen agg)
  sigonly     simhash() signature table x3, no pairs join (locate the stage)

Usage: MODE=<mode> python scripts/simhash_bisect.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
MODE = os.environ.get("MODE", "alone")


def main() -> None:
    from pyspark.sql import functions as F

    from openlogparse_spark.functions.dedup import (
        _norm,
        jaccard_pairs,
        simhash,
        simhash_near_pairs,
    )
    from openlogparse_spark.session import get_spark

    spark = get_spark("bisect", master=f"local[{CPUS}]")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    def timed(build):
        t0 = time.time()
        df = build()
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 2)
        if hasattr(df, "release_cached_inputs"):
            df.release_cached_inputs()
        return dt

    out: dict[str, object] = {"mode": MODE}
    sim = lambda: simhash_near_pairs(docs, max_hamming=8)  # noqa: E731

    if MODE == "alone":
        out["sim"] = [timed(sim) for _ in range(3)]
    elif MODE == "cure":
        out["sim_before"] = timed(sim)
        out["jaccard"] = timed(lambda: jaccard_pairs(docs, n=3, threshold=0.9))
        out["sim_after"] = [timed(sim) for _ in range(2)]
    elif MODE == "range":
        out["warm"] = timed(
            lambda: spark.range(2_000_000).repartition(32, "id")
            .groupBy((F.col("id") % 1000).alias("g")).count())
        out["sim"] = [timed(sim) for _ in range(2)]
    elif MODE == "scan":
        out["warm"] = timed(lambda: docs.select(F.length("text").alias("l"))
                            .groupBy().sum("l"))
        out["sim"] = [timed(sim) for _ in range(2)]
    elif MODE == "explode":
        out["warm"] = timed(
            lambda: docs.select(
                F.explode_outer(F.split(_norm("text"), " ")).alias("tok"))
            .groupBy().count())
        out["sim"] = [timed(sim) for _ in range(2)]
    elif MODE == "agg8":
        toks = docs.select(
            F.col("doc_id").alias("id"),
            F.explode_outer(F.split(_norm("text"), " ")).alias("tok"))
        h = toks.select("id", F.xxhash64("tok").alias("h"))
        out["warm"] = timed(
            lambda: h.groupBy("id").agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"v{b}")
                  for b in range(8)]))
        out["sim"] = [timed(sim) for _ in range(2)]
    elif MODE == "sigonly":
        out["sig"] = [timed(lambda: simhash(docs)) for _ in range(3)]
    else:
        raise SystemExit(f"unknown MODE {MODE}")

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
