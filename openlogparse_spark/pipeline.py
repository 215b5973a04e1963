"""End-to-end pipeline: parse → enrich → route → aggregate, manifest-resumable.

The Spark re-expression of the reference's five-thread dataflow
(reader → parser → checkpoint → memory-manager → writer, spawned at
/root/reference/src/OpenLogReplicator.cpp:405,859,1271,1302): each thread
becomes a declarative stage over materialized tables; Spark supplies the
transport (shuffle), backpressure, spill, and parallelism the reference
hand-builds.

Stage materialization strategy (scale rationale): `parsed`+`enriched` are
persisted once as a partitioned parquet table, then every route reads it with
its filter pushed down to the scan — at 100 TB this beats re-parsing per sink
(the reference parses once and fans out in memory; we parse once and fan out
through storage, which also buys idempotent resume per sink).
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openlogparse_spark.aggregate import agg_hourly, conv_outcomes, conv_stats
from openlogparse_spark.enrich import enrich_stage
from openlogparse_spark.manifest import Manifest, atomic_overwrite, _dir_bytes
from openlogparse_spark.parse import parse_stage
from openlogparse_spark.route import route_stage
from openlogparse_spark.route.router import safe_count


@dataclass
class PipelineConfig:
    input_path: str                    # transcripts parquet/dir
    dims_dir: str                      # dim_tools/dim_roles/routes parquet dir
    output_root: str                   # where stages + sinks land
    parse_mode: str = "sql"            # 'sql' (pure Catalyst) | 'drain' (pandas UDF)
    min_support: int = 2
    salt_buckets: int = 64
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])
    stages: tuple = ("parse", "enrich", "route", "aggregate")


@dataclass
class PipelineResult:
    run_id: str
    enriched_path: str
    sink_counts: dict
    manifest: Manifest
    timings: dict


def run_pipeline(spark: SparkSession, cfg: PipelineConfig) -> PipelineResult:
    man = Manifest(os.path.join(cfg.output_root, "manifest"))
    timings: dict[str, float] = {}

    def stage_done(stage: str, sink: str) -> bool:
        return sink in man.done(stage)

    transcripts = spark.read.parquet(cfg.input_path)
    dim_tools = spark.read.parquet(os.path.join(cfg.dims_dir, "dim_tools.parquet"))
    dim_roles = spark.read.parquet(os.path.join(cfg.dims_dir, "dim_roles.parquet"))
    routes_pdf = spark.read.parquet(os.path.join(cfg.dims_dir, "routes.parquet")).toPandas()
    routes = routes_pdf.to_dict("records")

    # ---- stage 1+2: parse + enrich, materialized once ----------------------
    enriched_path = os.path.join(cfg.output_root, "enriched")
    if "parse" in cfg.stages or "enrich" in cfg.stages:
        if not stage_done("enrich", enriched_path):
            t0 = time.time()
            # the merged view feeds BOTH template mining and template apply;
            # persist it so the merge window+group runs once, not twice
            from pyspark import StorageLevel

            from openlogparse_spark.parse import merge_row_pieces

            merged = merge_row_pieces(transcripts).persist(
                StorageLevel.MEMORY_AND_DISK)
            parsed = parse_stage(merged, mode=cfg.parse_mode,
                                 min_support=cfg.min_support,
                                 merge_pieces=False)
            enriched = enrich_stage(parsed, dim_tools, dim_roles)
            atomic_overwrite(enriched, enriched_path)
            merged.unpersist()
            rows = spark.read.parquet(enriched_path).count()
            man.record(cfg.run_id, "enrich", enriched_path, rows,
                       _dir_bytes(enriched_path), started=t0)
            timings["parse_enrich"] = time.time() - t0

    enriched = spark.read.parquet(enriched_path)

    # ---- stage 3: route fan-out --------------------------------------------
    sink_counts: dict[str, int] = {}
    if "route" in cfg.stages:
        t0 = time.time()
        sink_counts = route_stage(
            enriched.filter("parse_ok"),  # quarantined rows never route
            routes,
            os.path.join(cfg.output_root, "sinks"),
            manifest=man,
            run_id=cfg.run_id,
            salt_buckets=cfg.salt_buckets,
        )
        timings["route"] = time.time() - t0
        # quarantine sink: the reference's skip/warn path, conserved not dropped
        qpath = os.path.join(cfg.output_root, "sinks", "quarantine")
        if not stage_done("route", qpath):
            q = enriched.filter("NOT parse_ok")
            atomic_overwrite(q, qpath)
            man.record(cfg.run_id, "route", qpath,
                       safe_count(spark, qpath), _dir_bytes(qpath))

    # ---- stage 4: aggregates ------------------------------------------------
    if "aggregate" in cfg.stages:
        t0 = time.time()
        for name, df in (
            ("agg_hourly", agg_hourly(enriched)),
            ("conv_stats", conv_stats(enriched)),
            ("conv_outcomes", conv_outcomes(enriched.filter("parse_ok"))),
        ):
            path = os.path.join(cfg.output_root, name)
            if stage_done("aggregate", path):
                continue
            atomic_overwrite(df, path)
            man.record(cfg.run_id, "aggregate", path,
                       spark.read.parquet(path).count(), _dir_bytes(path))
        timings["aggregate"] = time.time() - t0

    return PipelineResult(cfg.run_id, enriched_path, sink_counts, man, timings)
