"""Aggregate stage: per-template / per-tool / hourly rollups + per-conversation stats.

Reference parity: the reference's only aggregates are streaming counters —
per-table DML out/skip counts (Metrics.h:74-85, emit sites
/root/reference/src/builder/Builder.cpp:772-790,865-883) and transaction
outcome counts (Metrics.h:124-129). Here they are declarative hash aggregates:
Catalyst plans a partial (map-side) + final aggregation, so the shuffle
carries only group keys × counts — at 10^12 rows the shuffle volume is
O(templates × tools × hours), trivially small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def agg_hourly(enriched: DataFrame) -> DataFrame:
    """FIXTURES.md §5 `agg_hourly`: template_id, tool, hour_bucket, n_turns, n_convs."""
    return (
        enriched.groupBy(
            "template_id", "tool",
            F.date_trunc("hour", "ts").alias("hour_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
    )


def conv_stats(enriched: DataFrame) -> DataFrame:
    """Per-conversation features over stable turn order (window aggregation).

    Mirrors the per-LWN ordered analysis (records heap-sorted by scn before
    per-record work, /root/reference/src/parser/Parser.cpp:1384-1469): the
    lag() needs rows ordered by turn_idx within each conv_id partition.
    One shuffle on conv_id; the groupBy reuses the window's partitioning.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # parquet NTZ timestamps: epoch seconds via an intermediate timestamp cast
    # (session tz is pinned UTC, so this is exact)
    epoch = F.col("ts").cast("timestamp").cast("long")
    with_gap = enriched.withColumn("_ep", epoch).withColumn(
        "gap_s", F.col("_ep") - F.lag("_ep").over(w)
    )
    return (
        with_gap.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            (F.max("_ep") - F.min("_ep")).alias("duration_s"),
            F.avg("gap_s").alias("avg_gap_s"),
            F.count_distinct("tool").alias("n_tools"),
            F.max((F.col("op") == "error").cast("int")).alias("had_error"),
            F.sum((~F.col("parse_ok")).cast("int")).alias("n_quarantined"),
        )
    )
