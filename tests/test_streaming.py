"""Structured Streaming variant: stream-static enrich, watermarked hourly
counts, stateful conversation sessions — drained synchronously on fixtures."""

import os
import shutil

import pyspark.sql.functions as F
import pytest

from openlogparse_spark.parse import merge_row_pieces
from openlogparse_spark.parse.stage import mine_template_table
from openlogparse_spark.streaming import (
    stream_conversation_sessions,
    stream_hourly_counts,
    stream_parse_enrich,
)
from openlogparse_spark.streaming.jobs import stream_source

TMP = "data/tmp/test_stream"


@pytest.fixture(scope="module")
def stream_input(spark, fx_dir):
    """Split the fixture into several files so the stream sees >1 trigger."""
    shutil.rmtree(TMP, ignore_errors=True)
    src = os.path.join(TMP, "in")
    df = spark.read.parquet(os.path.join(fx_dir, "transcripts.parquet"))
    df.repartition(8).write.parquet(src)
    return src


@pytest.fixture(scope="module")
def templates(spark, fx_dir):
    batch = spark.read.parquet(os.path.join(fx_dir, "transcripts.parquet"))
    return mine_template_table(merge_row_pieces(batch))


def _drain(q):
    q.processAllAvailable()
    q.stop()


def test_stream_counts_match_batch(spark, stream_input, templates, fx_dir):
    dim_tools = spark.read.parquet(os.path.join(fx_dir, "dim_tools.parquet"))
    stream = stream_source(spark, stream_input)
    parsed = stream_parse_enrich(stream, templates, dim_tools)
    agg = stream_hourly_counts(parsed.filter("parse_ok"))
    q = (agg.writeStream.outputMode("append").format("memory")
         .queryName("hourly").option("checkpointLocation", os.path.join(TMP, "ck1"))
         .start())
    _drain(q)
    # append mode only emits windows whose end <= final watermark
    # (max event time - 2h); compare the fully-emitted prefix against batch
    batch = spark.read.parquet(stream_input)
    b = stream_parse_enrich(batch, templates, dim_tools).filter("parse_ok")
    max_ts = b.agg(F.max(F.col("ts").cast("timestamp"))).first()[0]
    import datetime

    cutoff = (max_ts - datetime.timedelta(hours=3)).replace(
        minute=0, second=0, microsecond=0)
    got = spark.sql(
        "SELECT template_id, sum(n_turns) AS n FROM hourly "
        f"WHERE hour_bucket < timestamp'{cutoff}' GROUP BY template_id")
    exp = (b.withColumn("hb", F.date_trunc("hour", F.col("ts").cast("timestamp")))
           .filter(F.col("hb") < F.lit(cutoff))
           .groupBy("template_id").agg(F.count(F.lit(1)).alias("n")))
    diff = got.alias("g").join(exp.alias("e"), "template_id", "full") \
        .filter("g.n IS DISTINCT FROM e.n")
    assert got.count() > 0
    assert diff.count() == 0


def test_stream_sessions_close_and_timeout(spark, stream_input):
    stream = stream_source(spark, stream_input)
    sessions = stream_conversation_sessions(stream)
    q = (sessions.writeStream.outputMode("append").format("memory")
         .queryName("sessions").option("checkpointLocation", os.path.join(TMP, "ck2"))
         .start())
    _drain(q)
    out = spark.sql("SELECT * FROM sessions").toPandas()
    # conversations with a SESSION end marker close eagerly
    assert (out["closed_by"] == "close_marker").sum() > 0
    # quiet conversations time out in event time as the watermark advances
    assert (out["closed_by"] == "timeout").sum() > 0
    # counts are plausible: every emitted conv has >=1 turn, ts ordered
    assert (out["n_turns"] >= 1).all()
    assert (out["first_ts"] <= out["last_ts"]).all()
    # a conv re-opened after a mid-conversation close marker may emit twice,
    # but the same (conv, close reason) never repeats
    assert out.duplicated(["conv_id", "closed_by", "first_ts"]).sum() == 0
