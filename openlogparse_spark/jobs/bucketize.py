"""Bucketize the transcripts input: pre-cluster by conv_id so the pipeline's
ONE remaining full-data exchange (the merge-window shuffle) disappears.

The reference reads redo logs that are already physically ordered, so its
parser never re-sorts input (/root/reference/src/reader/Reader.cpp sequential
block reads). The Spark analogue of "input arrives clustered" is a BUCKETED
TABLE: `bucketBy(conv_id).sortBy(conv_id, turn_idx)` makes every scan report
HashPartitioning(conv_id) — the merge window's required distribution — so
Catalyst plans it with NO Exchange (and, with one file per bucket, no Sort).
The brief's "repartition()/bucketing for co-located joins" applied to the
window stage.

This is a one-time layout investment (itself one shuffle) that every
subsequent run amortizes — the standard pattern for a table that is
re-processed many times at 100 TB.

Measured honestly (sf2.0, local-cluster[4,2,16384]): the bucketed pipeline
ran 54.8s vs 45.8s from plain parquet — the exchange it eliminates is cheap
here (page-cached input, fast local shuffle) while bucket integrity pins the
scan to one task per bucket (no split-level parallelism). The win appears
when the exchange is the expensive thing: remote shuffle over real networks,
repeated runs over the same table, or joins co-located on the bucket key.
Plan-level proof + byte-identical output:
tests/test_parse.py::test_bucketed_input_elides_merge_exchange.

Usage:
  python openlogparse_spark/jobs/bucketize.py \
      --input data/transcripts/sf0.01/transcripts.parquet \
      --table transcripts_bucketed --buckets 64 \
      --warehouse data/tmp/warehouse
Then run the pipeline with `input_table=transcripts_bucketed` (PipelineConfig)
in the same warehouse-configured session.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def bucketize(spark, input_path: str, table: str, buckets: int = 64) -> None:
    df = spark.read.parquet(input_path)
    (df.repartition(buckets, "conv_id")          # one file per bucket →
     .write.mode("overwrite")                    # scan keeps sort metadata
     .bucketBy(buckets, "conv_id")
     .sortBy("conv_id", "turn_idx")
     .format("parquet")
     .saveAsTable(table))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--table", default="transcripts_bucketed")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--warehouse", default="data/tmp/warehouse")
    ap.add_argument("--cpus", default=None)
    args = ap.parse_args(argv)

    from openlogparse_spark.session import get_spark

    master = f"local[{args.cpus}]" if args.cpus else None
    spark = get_spark("bucketize", master=master,
                      extra_conf={"spark.sql.warehouse.dir": args.warehouse})
    bucketize(spark, args.input, args.table, args.buckets)
    n = spark.table(args.table).count()
    print(f"bucketized {n} rows into {args.table} ({args.buckets} buckets)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
