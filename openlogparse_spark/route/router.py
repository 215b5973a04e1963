"""Route stage: condition-filtered fan-out writes with salted repartitioning.

Reference parity:
  - table filter (owner/table regex dropping rows at parse time):
    /root/reference/src/OpenLogReplicator.cpp:775-826 and
    src/parser/Parser.cpp:666-674 → here a regex over the mined template
    string, pushed into the scan of the staged `enriched` table;
  - row condition DSL (==/!=/&&/||/! over op + session attributes, evaluated
    per row pre-emit): /root/reference/src/common/expression/Expression.cpp:27-279,
    DbTable::matchesCondition src/common/DbTable.cpp:145-154 → here the
    condition is a **Spark SQL boolean expression**; Catalyst is the
    evaluation engine (constant-folded, codegen'd, pushed down);
  - fan-out sinks with per-sink counters and confirm watermarks:
    src/writer/Writer*.cpp; counts recorded in the manifest replace the
    confirmedScn/idx protocol (atomic rename commit = snapshot commit);
  - tag/routing key (per-table `tag` config used as partition key):
    src/metadata/SchemaElement.h:63-82 → `tag_cols` + salt become the
    repartition key.

Skew handling (reference has none — single host; SURVEY.md §4): one viral
conversation can dominate a sink write. We salt deterministically by
`(conv_id, turn_idx div block)` so each hot conversation spreads over many
tasks while per-turn ordering stays reconstructible within a block — never a
random salt (breaks resume determinism).
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openlogparse_spark.manifest import Manifest, atomic_overwrite, _dir_bytes
from openlogparse_spark.route.committer import DEFAULT_COMMITTER

SALT_BLOCK_TURNS = 256   # turns per salt block within one conversation
DEFAULT_SALT_BUCKETS = 64


def safe_count(spark, path: str) -> int:
    """Parquet-footer row count; 0 for an empty sink (no data files inside).

    Only the no-data-files case maps to 0 — a committed sink that exists but
    fails to READ is a real error and must propagate, so the stage re-runs
    instead of being recorded done with rows=0 (resume would then skip a
    corrupt sink forever)."""
    if not glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        return 0
    return spark.read.parquet(path).count()


def add_salt(df: DataFrame, buckets: int = DEFAULT_SALT_BUCKETS,
             block: int = SALT_BLOCK_TURNS) -> DataFrame:
    """Deterministic skew salt: hash(conv_id, turn_idx // block) % buckets."""
    return df.withColumn(
        "salt",
        F.pmod(F.hash("conv_id", F.floor(F.col("turn_idx") / block)), F.lit(buckets)),
    )


def compile_route_filter(template_pattern: str, condition: str):
    """Route predicate as Catalyst expressions (template regex + SQL condition).

    An empty/None pattern means "any row" (null-safe — used by pseudo-routes
    like the quarantine fan-out leg, where template may be anything)."""
    cond = F.expr(condition if condition and condition.strip() else "true")
    if not template_pattern:
        return cond
    return F.col("template").rlike(template_pattern) & cond


def route_stage(
    enriched: DataFrame,
    routes: list[dict],
    sinks_root: str,
    manifest: Manifest | None = None,
    run_id: str = "run0",
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    shuffle_partitions: int | None = None,
    strategy: str = "unified",
    committer=None,
    timings: dict | None = None,
) -> dict[str, int]:
    """Fan out `enriched` to one sink per route; returns {route_id: rows}.

    strategy='unified' (default, the 100 TB path): ONE scan computes every
    route's match set (array of matching route ids → explode), ONE salted
    shuffle orders it, ONE write lands partitionBy(route_id, template_id);
    each route_id=… directory is then atomically moved into place as that
    route's sink — byte-layout identical to per-sink writes, at 1/N_routes
    the scan+shuffle cost. (The reference writes each message once into one
    writer per pipeline; this is the multi-sink generalization.)

    strategy='fanout': one filtered write per route (N scans). Kept for
    per-sink independent re-runs.

    Both: filter pushed to scan → salted repartition → sortWithinPartitions
    (conv_id, turn_idx) [stable-order invariant] → atomic commit; per-sink
    counts from parquet footers (metadata-only); done sinks skipped (resume).
    """
    if strategy == "unified":
        return _route_unified(enriched, routes, sinks_root, manifest, run_id,
                              salt_buckets, shuffle_partitions, committer, timings)
    done = manifest.done("route") if manifest else set()
    counts: dict[str, int] = {}
    salted = add_salt(enriched, salt_buckets)
    for r in routes:  # strategy='fanout'
        sink_path = os.path.join(sinks_root, r["sink"])
        if sink_path in done:
            counts[r["route_id"]] = (manifest.counts_by_sink().get(("route", sink_path), 0)
                                     if manifest else 0)
            continue
        t0 = time.time()
        matched = salted.filter(
            compile_route_filter(r["template_pattern"], r["condition"])
        )
        n_out = shuffle_partitions or salt_buckets
        ready = (
            matched.repartition(n_out, "template_id", "salt")
            .sortWithinPartitions("conv_id", "turn_idx")
            .drop("salt")
        )
        atomic_overwrite(ready, sink_path, partition_by=["template_id"])
        # parquet-footer count of the committed sink (metadata-only scan);
        # doubles as a read-back validation of the snapshot we just committed
        rows = safe_count(enriched.sparkSession, sink_path)
        counts[r["route_id"]] = rows
        if manifest:
            manifest.record(
                run_id, "route", sink_path, rows, _dir_bytes(sink_path),
                started=t0,
            )
    return counts


def _route_unified(
    enriched: DataFrame,
    routes: list[dict],
    sinks_root: str,
    manifest: Manifest | None,
    run_id: str,
    salt_buckets: int,
    shuffle_partitions: int | None,
    committer=None,
    timings: dict | None = None,
) -> dict[str, int]:
    """Single-pass fan-out: see route_stage(strategy='unified')."""
    spark = enriched.sparkSession
    committer = committer or DEFAULT_COMMITTER
    done = manifest.done("route") if manifest else set()
    counts: dict[str, int] = {}
    t0 = time.time()

    todo = []
    for r in routes:
        sink_path = os.path.join(sinks_root, r["sink"])
        if sink_path in done:
            counts[r["route_id"]] = (manifest.counts_by_sink().get(("route", sink_path), 0)
                                     if manifest else 0)
        else:
            todo.append(r)
    if not todo:
        return counts

    # one expression per route; a row fans out to every matching route
    route_tags = F.array(*[
        F.when(compile_route_filter(r["template_pattern"], r["condition"]),
               F.lit(r["route_id"]))
        for r in todo
    ])
    matched = (
        add_salt(enriched, salt_buckets)
        .withColumn("route_id", F.explode(F.filter(route_tags, lambda x: x.isNotNull())))
    )
    n_out = shuffle_partitions
    rep = (matched.repartition(n_out, "route_id", "salt") if n_out
           else matched.repartition("route_id", "salt"))
    ready = rep.sortWithinPartitions("conv_id", "turn_idx").drop("salt")

    staging = os.path.join(sinks_root, ".__routed_tmp__")
    if os.path.exists(staging):
        shutil.rmtree(staging)
    os.makedirs(sinks_root, exist_ok=True)
    ready.write.mode("overwrite").partitionBy("route_id", "template_id").parquet(staging)
    t_write = time.time()

    # ONE footer-metadata job counts every sink at once (vs one job per sink)
    staged_counts = {
        r["route_id"]: r["n"]
        for r in spark.read.parquet(staging)
        .groupBy("route_id").agg(F.count(F.lit(1)).alias("n")).collect()
    } if glob.glob(os.path.join(staging, "**", "*.parquet"), recursive=True) else {}
    t_count = time.time()

    # per-sink commits + manifest records are independent → run them off the
    # serial tail (driver-side os.walk byte sums dominate otherwise)
    def _commit_one(r: dict) -> tuple[str, int]:
        sink_path = os.path.join(sinks_root, r["sink"])
        part_dir = os.path.join(staging, f"route_id={r['route_id']}")
        if os.path.exists(part_dir):
            committer.commit(part_dir, sink_path)   # snapshot commit per sink
        else:
            if os.path.exists(sink_path):
                shutil.rmtree(sink_path)
            os.makedirs(sink_path)                  # route matched nothing
        rows = int(staged_counts.get(r["route_id"], 0))
        if manifest:
            manifest.record(run_id, "route", sink_path, rows,
                            _dir_bytes(sink_path), started=t0)
        return r["route_id"], rows

    with ThreadPoolExecutor(max_workers=min(8, len(todo))) as pool:
        for route_id, rows in pool.map(_commit_one, todo):
            counts[route_id] = rows
    shutil.rmtree(staging, ignore_errors=True)
    if timings is not None:
        now = time.time()
        timings["route_write"] = round(t_write - t0, 3)
        timings["route_count"] = round(t_count - t_write, 3)
        timings["route_commit"] = round(now - t_count, 3)
    return counts
