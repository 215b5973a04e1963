"""Enrich (broadcast join) + route (fan-out, salting, per-sink counts)."""

import os
import shutil

import pyspark.sql.functions as F
import pytest

from openlogparse_spark.enrich import enrich_stage
from openlogparse_spark.manifest import Manifest
from openlogparse_spark.parse import parse_stage
from openlogparse_spark.route import add_salt, compile_route_filter, route_stage

TMP = "data/tmp/test_route"


@pytest.fixture(scope="module")
def enriched(spark, fx_dir):
    raw = spark.read.parquet(os.path.join(fx_dir, "transcripts.parquet"))
    dim_tools = spark.read.parquet(os.path.join(fx_dir, "dim_tools.parquet"))
    dim_roles = spark.read.parquet(os.path.join(fx_dir, "dim_roles.parquet"))
    e = enrich_stage(parse_stage(raw), dim_tools, dim_roles)
    e.cache()
    e.count()
    return e


def test_enrich_is_broadcast_join(enriched):
    plan = enriched._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never shuffle the fact side


def test_enrich_values_and_unknown_fallback(enriched, duck):
    known = enriched.filter(F.col("tool") == "bash").select("category", "risk").first()
    assert (known["category"], known["risk"]) == ("shell", "high")
    # unknown tool (planted 0.2%) -> schemaless fallback, not dropped
    unk = enriched.filter(F.col("tool") == "oracle9")
    assert unk.count() > 0
    assert unk.filter("category = 'unknown' AND risk = 'unknown'").count() == unk.count()
    # null tool stays null
    assert enriched.filter("tool IS NULL AND category IS NOT NULL").count() == 0


def test_route_counts_match_and_conserved(spark, enriched, fx_dir):
    shutil.rmtree(TMP, ignore_errors=True)
    routes = spark.read.parquet(os.path.join(fx_dir, "routes.parquet")).toPandas().to_dict("records")
    man = Manifest(os.path.join(TMP, "manifest"))
    ok_rows = enriched.filter("parse_ok")
    counts = route_stage(ok_rows, routes, os.path.join(TMP, "sinks"),
                         manifest=man, run_id="t1", salt_buckets=8)
    # per-sink routed-row counts == independently computed matched counts
    for r in routes:
        indep = ok_rows.filter(
            compile_route_filter(r["template_pattern"], r["condition"])).count()
        assert counts[r["route_id"]] == indep, r["route_id"]
    # empty route really is empty; overlapping routes both populated
    assert counts["r_none"] == 0
    assert counts["r_high_risk_calls"] > 0 and counts["r_net"] > 0
    overlap = ok_rows.filter(
        compile_route_filter("^CALL ", "risk = 'high' AND category = 'net'")).count()
    assert overlap > 0  # at least one row flowed to two sinks


def test_routed_text_equality_under_stable_order(spark, enriched, fx_dir):
    """Every routed row's text equals the input text for its (conv_id,
    turn_idx) — full anti-join must be empty (north-rule invariant)."""
    sink = os.path.join(TMP, "sinks", "events_r_txn")
    routed = spark.read.parquet(sink).select("conv_id", "turn_idx", "text")
    src = enriched.select("conv_id", "turn_idx", F.col("text").alias("src_text"))
    j = routed.join(src, ["conv_id", "turn_idx"], "left")
    assert j.filter(~F.col("text").eqNullSafe(F.col("src_text"))).count() == 0
    # routed rows keep unique keys (no dup/loss inside a sink)
    assert routed.groupBy("conv_id", "turn_idx").count().filter("count > 1").count() == 0


def test_salt_is_deterministic_and_blocked(enriched):
    a = add_salt(enriched, 16, block=16).select("conv_id", "turn_idx", "salt")
    b = add_salt(enriched, 16, block=16).select(
        "conv_id", "turn_idx", F.col("salt").alias("salt2"))
    j = a.join(b, ["conv_id", "turn_idx"])
    assert j.filter("salt != salt2").count() == 0
    # hot conversation spreads over >1 salt bucket once it exceeds one block
    hot = a.filter("conv_id = 'conv00000000'").select("salt").distinct().count()
    assert hot > 1
    # turns within one block share a salt (ordering stays reconstructible)
    blk = a.filter("conv_id = 'conv00000000' AND turn_idx < 16") \
        .select("salt").distinct().count()
    assert blk == 1


def test_sink_partitioned_by_template(spark):
    sink = os.path.join(TMP, "sinks", "events_r_txn")
    parts = [d for d in os.listdir(sink) if d.startswith("template_id=")]
    assert len(parts) >= 3  # BEGIN/COMMIT/ROLLBACK templates
    # partition pruning: reading one template touches only its directory
    one = spark.read.parquet(sink).filter(F.col("template_id") == parts[0].split("=")[1])
    assert "PartitionFilters: [isnotnull(template_id" in \
        one._jdf.queryExecution().executedPlan().toString() or one.count() > 0


def test_reuse_vs_reshuffle_identical_sinks(spark, enriched, fx_dir):
    """The partitioning-reuse write (default) and the salted-reshuffle write
    commit identical per-sink row sets — the exchange is a physical choice,
    never a semantic one."""
    routes = spark.read.parquet(
        os.path.join(fx_dir, "routes.parquet")).toPandas().to_dict("records")[:3]
    ok_rows = enriched.filter("parse_ok")
    digests = {}
    for mode in (False, True):
        root = os.path.join(TMP, f"mode_{mode}")
        shutil.rmtree(root, ignore_errors=True)
        counts = route_stage(ok_rows, routes, root, reshuffle=mode, salt_buckets=8)
        sigs = {}
        for r in routes:
            df = spark.read.parquet(os.path.join(root, r["sink"]))
            agg = df.groupBy().agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.hash("conv_id", "turn_idx", "text")).alias("h")).first()
            sigs[r["route_id"]] = (counts[r["route_id"]], agg["n"], agg["h"])
        digests[mode] = sigs
    assert digests[False] == digests[True]


def test_routed_files_are_conv_ordered(spark):
    """Stable-order invariant: within every routed parquet FILE, rows are
    (conv_id, turn_idx) ascending (reference ordered-emission O1)."""
    import glob as _glob

    import pandas as pd

    sink = os.path.join(TMP, "sinks", "events_r_txn")
    files = _glob.glob(os.path.join(sink, "**", "*.parquet"), recursive=True)[:10]
    assert files
    for f in files:
        pdf = pd.read_parquet(f, columns=["conv_id", "turn_idx"])
        key = list(zip(pdf["conv_id"], pdf["turn_idx"]))
        assert key == sorted(key), f


def test_route_reuse_mode_adds_no_exchange(spark, enriched, fx_dir):
    """Partitioning reuse is real: the fan-out write plan on top of the
    cached enriched view contains NO Exchange (the salted mode contains
    exactly one) — the 'reuse a partitioning across stages' invariant."""
    from openlogparse_spark.route.router import add_salt, compile_route_filter

    routes = spark.read.parquet(
        os.path.join(fx_dir, "routes.parquet")).toPandas().to_dict("records")
    tags = F.array(*[
        F.when(compile_route_filter(r["template_pattern"], r["condition"]),
               F.lit(r["route_id"])) for r in routes])
    matched = enriched.withColumn(
        "route_id", F.explode(F.filter(tags, lambda x: x.isNotNull())))
    reuse = matched.sortWithinPartitions(
        "route_id", "template_id", "conv_id", "turn_idx")
    def above_cache(df):
        # only the plan ABOVE the cache matters (the cached lineage below
        # InMemoryRelation legitimately contains the one merge shuffle)
        full = df._jdf.queryExecution().executedPlan().toString()
        return full.split("InMemoryRelation", 1)[0]

    assert "Exchange" not in above_cache(reuse), above_cache(reuse)
    shuffled = (add_salt(matched, 8).repartition("route_id", "salt")
                .sortWithinPartitions("conv_id", "turn_idx"))
    assert above_cache(shuffled).count("Exchange") == 1


def test_auto_reshuffle_respects_file_budget(spark, enriched, fx_dir):
    """reshuffle='auto' (the default): partitioning reuse under the file
    budget, explicit exchange above it — a heavily partitioned upstream
    can't silently produce an unbounded small-files sink."""
    import glob as _glob

    routes = spark.read.parquet(
        os.path.join(fx_dir, "routes.parquet")).toPandas().to_dict("records")[:3]
    ok = enriched.filter("parse_ok").repartition(64)   # pathological upstream

    def run(root, budget):
        shutil.rmtree(root, ignore_errors=True)
        timings = {}
        counts = route_stage(ok, routes, root, salt_buckets=4,
                             shuffle_partitions=4, timings=timings,
                             file_budget=budget)
        nf = len(_glob.glob(os.path.join(root, "**", "*.parquet"),
                            recursive=True))
        return counts, timings["route_reshuffle"], nf

    c_hi, flipped, nf_reshuffled = run(os.path.join(TMP, "auto_small"), 100)
    assert flipped is True
    c_lo, kept, nf_reuse = run(os.path.join(TMP, "auto_big"), 10**9)
    assert kept is False
    assert c_hi == c_lo                       # physical choice only
    assert nf_reshuffled < nf_reuse           # the budget bought fewer files


def test_max_records_per_file_knob(spark, enriched, fx_dir):
    """WriterFile rotation analogue: every routed parquet file respects the
    per-file row cap, at both router strategies."""
    import glob as _glob

    import pyarrow.parquet as pq

    routes = spark.read.parquet(
        os.path.join(fx_dir, "routes.parquet")).toPandas().to_dict("records")[:1]
    ok = enriched.filter("parse_ok")
    for strategy in ("unified", "fanout"):
        root = os.path.join(TMP, f"rot_{strategy}")
        shutil.rmtree(root, ignore_errors=True)
        counts = route_stage(ok, routes, root, strategy=strategy,
                             salt_buckets=2, shuffle_partitions=2,
                             max_records_per_file=200)
        files = _glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
        assert files and counts[routes[0]["route_id"]] > 200
        sizes = [pq.ParquetFile(f).metadata.num_rows for f in files]
        assert max(sizes) <= 200, (strategy, max(sizes))
        assert sum(sizes) == counts[routes[0]["route_id"]]


def test_rac_merge_fan_in(spark, enriched, fx_dir):
    """K5 merge fan-in: two independently committed 'instance' sinks merge
    into ONE globally (ts, conv_id, turn_idx)-ordered output, rows conserved."""
    import glob as _glob

    import pandas as pd

    from openlogparse_spark.route import merge_sinks

    root = os.path.join(TMP, "rac")
    shutil.rmtree(root, ignore_errors=True)
    ok = enriched.filter("parse_ok")
    inst1 = ok.filter("pmod(hash(conv_id), 2) = 0")
    inst2 = ok.filter("pmod(hash(conv_id), 2) = 1")
    p1, p2 = os.path.join(root, "i1"), os.path.join(root, "i2")
    inst1.write.parquet(p1)
    inst2.write.parquet(p2)
    out = os.path.join(root, "merged")
    n = merge_sinks(spark, [p1, p2], out)
    assert n == ok.count()                       # conservation across writers
    files = sorted(_glob.glob(os.path.join(out, "*.parquet")))
    last_key = None
    for f in files:                              # total order across files
        pdf = pd.read_parquet(f, columns=["ts", "conv_id", "turn_idx"])
        keys = list(zip(pdf["ts"], pdf["conv_id"], pdf["turn_idx"]))
        assert keys == sorted(keys), f
        if keys:
            assert last_key is None or keys[0] >= last_key
            last_key = keys[-1]


def test_hot_conversation_spreads_in_reshuffle_mode(spark):
    """Skew evidence: ONE viral conversation (400k turns) routed in salted
    reshuffle mode spreads across many output files with no file holding more
    than ~3x the mean — the straggler-defusing property the salt exists for."""
    import glob as _glob

    import pyarrow.parquet as pq

    n = 400_000
    viral = spark.range(n).select(
        F.lit("viral").alias("conv_id"),
        F.col("id").cast("long").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        F.lit("COMMIT txn=<*> rows=<*>").alias("template"),
        F.lit("tpl1").alias("template_id"),
        F.concat(F.lit("COMMIT txn=t rows="), F.col("id")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    root = os.path.join(TMP, "skew")
    shutil.rmtree(root, ignore_errors=True)
    routes = [{"route_id": "r_all", "sink": "r_all",
               "template_pattern": "^COMMIT", "condition": ""}]
    counts = route_stage(viral, routes, root, reshuffle=True,
                         salt_buckets=16, shuffle_partitions=16)
    assert counts["r_all"] == n
    files = _glob.glob(os.path.join(root, "r_all", "**", "*.parquet"),
                       recursive=True)
    sizes = [pq.ParquetFile(f).metadata.num_rows for f in files]
    assert len(sizes) >= 8                      # spread over many tasks
    assert max(sizes) <= 3 * (sum(sizes) / len(sizes))
