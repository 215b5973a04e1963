"""Output serialization: the reference's JSON message stream, Spark-side.

Reference parity:
  - JSON message shape {scn, tm, xid, payload:[{op, schema, after...}]}:
    BuilderJson::processInsert/processCommit et al.,
    /root/reference/src/builder/BuilderJson.cpp:484-760. Transcript-domain
    mapping: scn→(conv_id,turn_idx) position, xid→conv_id, the payload entry
    carries op/template_id/params (+ optionally the raw text).
  - format knobs (/root/reference/src/common/Format.h:29-110): the subset
    that changes the wire shape here — include_text (column visibility in the
    message), flat vs payload-nested (message format full/short analogue).
  - Kafka sink framing (WriterKafka::sendMessage,
    /root/reference/src/writer/WriterKafka.cpp:86-142): Spark's kafka sink
    contract is exactly (key binary, value binary[, topic]); `kafka_frame`
    produces that frame so `df.write.format("kafka")` needs only a broker.

Everything is `to_json(struct(...))` / `from_json` — JVM-side Jackson
serialization inside whole-stage codegen, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# payload entry schema (one DML/message op per entry; the reference emits one
# payload array per transaction message — here one turn per message, so the
# array has a single entry unless callers aggregate by conv first)
PAYLOAD_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("op", T.StringType()),
    T.StructField("template_id", T.StringType()),
    T.StructField("params", T.MapType(T.StringType(), T.StringType())),
    T.StructField("text", T.StringType()),
]))

MESSAGE_SCHEMA = T.StructType([
    T.StructField("tm", T.TimestampNTZType()),
    T.StructField("xid", T.StringType()),
    T.StructField("idx", T.LongType()),
    T.StructField("payload", PAYLOAD_SCHEMA),
])


def to_message_json(df: DataFrame, include_text: bool = True,
                    value_col: str = "value",
                    ts_format: str = "iso",
                    flat: bool = False) -> DataFrame:
    """Serialize parsed/enriched rows to the reference's message JSON.

    Returns the input plus a `value` string column; pair with `kafka_frame`
    or write `.select(value_col)` as a text sink. NULL map entries/fields are
    omitted by to_json (matching the reference's unknown-value skip).

    Format knobs (the wire-shape-changing subset of the reference's 17,
    Format.h:29-110):
      include_text  column visibility in the message (columnFormat analogue)
      ts_format     'iso' (default) | 'epoch_ms' — timestampFormat ISO8601
                    vs UNIX milliseconds (Format.h timestampFormat)
      flat          False: payload-nested array shape (message format FULL);
                    True: one flat object per turn, op fields inlined
                    (the per-op short-message analogue)
    """
    payload_fields = [
        F.col("op").alias("op"),
        F.col("template_id").alias("template_id"),
        F.col("params").alias("params"),
        (F.col("text") if include_text else F.lit(None).cast("string")).alias("text"),
    ]
    # unix_millis keeps sub-second precision (cast-to-long truncates to whole
    # seconds). Timezone contract: ts is TIMESTAMP_NTZ; the NTZ→timestamp
    # cast interprets it in the session timezone, which session.py pins to
    # UTC — so epoch values are UTC-based and run-location independent.
    tm = (F.unix_millis(F.col("ts").cast("timestamp"))
          if ts_format == "epoch_ms" else F.col("ts").cast("timestamp_ntz"))
    head = [
        tm.alias("tm"),
        F.col("conv_id").cast("string").alias("xid"),
        F.col("turn_idx").cast("long").alias("idx"),
    ]
    if flat:
        msg = F.struct(*head, *payload_fields)
    else:
        msg = F.struct(*head, F.array(F.struct(*payload_fields)).alias("payload"))
    return df.withColumn(value_col, F.to_json(msg))


def from_message_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse message JSON back to columns — the round-trip inverse of
    to_message_json (used by tests and by re-ingestion jobs)."""
    m = F.from_json(F.col(value_col), MESSAGE_SCHEMA)
    p = m["payload"][0]
    return df.select(
        m["xid"].alias("conv_id"),
        m["idx"].alias("turn_idx"),
        m["tm"].alias("ts"),
        p["op"].alias("op"),
        p["template_id"].alias("template_id"),
        p["params"].alias("params"),
        p["text"].alias("text"),
    )


def kafka_frame(df: DataFrame, key_cols: tuple[str, ...] = ("conv_id",),
                topic: str | None = None,
                include_text: bool = True) -> DataFrame:
    """(key binary, value binary[, topic]) — the exact input contract of
    Spark's kafka sink (`df.write.format("kafka")`). The key is the routing
    tag (reference: message key = xid/tag, WriterKafka.cpp:104-120) so one
    conversation always lands in one partition, preserving per-conv order —
    the same invariant the salted router keeps for file sinks."""
    framed = to_message_json(df, include_text=include_text)
    cols = [
        F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
        .cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
    ]
    if topic is not None:
        cols.append(F.lit(topic).alias("topic"))
    return framed.select(*cols)
