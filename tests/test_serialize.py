"""Output serialization + typed param decode + committer seam.

Oracles: JSON emit/parse round-trip is pinned by exact DataFrame equality
against the source columns (the serialization must be lossless); typed decode
by hand-computed values; the committer seam by byte-identical sinks from both
implementations.
"""

import glob
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from openlogparse_spark.functions.serialize import (
    from_message_json,
    kafka_frame,
    to_message_json,
)
from openlogparse_spark.parse import parse_stage
from openlogparse_spark.parse.stage import typed_params
from openlogparse_spark.route import route_stage
from openlogparse_spark.route.committer import CopyCommitter, RenameCommitter

TMP = "data/tmp/test_serialize"


@pytest.fixture(scope="module")
def parsed(spark, fx_dir):
    df = parse_stage(
        spark.read.parquet(os.path.join(fx_dir, "transcripts.parquet"))
    ).filter("parse_ok")
    df.cache().count()
    return df


def test_json_roundtrip_lossless(spark, parsed):
    # set ops reject MAP columns -> compare params as sorted entry arrays
    pent = F.array_sort(F.map_entries("params")).alias("params_e")
    src = parsed.select(
        F.col("conv_id").cast("string").alias("conv_id"),
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "op", "template_id", pent, "text",
    )
    rt = from_message_json(to_message_json(parsed).select("value")).select(
        "conv_id", "turn_idx", "ts", "op", "template_id", pent, "text")
    # exact equality including timestamps and the params map
    assert src.exceptAll(rt).count() == 0
    assert rt.exceptAll(src).count() == 0


def test_json_messages_have_reference_shape(parsed):
    line = to_message_json(parsed).select("value").first()["value"]
    msg = json.loads(line)
    assert set(msg) <= {"tm", "xid", "idx", "payload"}
    assert isinstance(msg["payload"], list) and len(msg["payload"]) == 1
    assert {"op", "template_id"} <= set(msg["payload"][0])


def test_typed_params_decode(spark):
    rows = [
        (1, 0, "assistant", "INSERT obj=t1 rows=42", None, "2026-01-01 00:00:00"),
        (1, 1, "tool", "RESULT tool=bash rc=0 bytes=1024", "bash", "2026-01-01 00:00:01"),
        (1, 2, "assistant", "METRIC name=lat value=1.5", None, "2026-01-01 00:00:02"),
        (1, 3, "assistant", "INSERT obj=t2 rows=notanumber", None, "2026-01-01 00:00:03"),
        (1, 4, "assistant", "CHECKPOINT scn=9 idx=1 at=2026-02-01T10:30:05 lag=1:02:03",
         None, "2026-01-01 00:00:04"),
        (1, 5, "assistant", "DDL stmt=CREATE obj=t9 ret=2-3",
         None, "2026-01-01 00:00:05"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id long, turn_idx long, role string, text string, tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # NOTE: never .collect() the raw `p` struct here — `p.ret` is a
    # YearMonthIntervalType and PySpark 4.1.2's client fromInternal for that
    # type is unconditionally NOT_IMPLEMENTED (even for NULLs). Cast it to
    # int (total months) server-side; everything else collects natively.
    p = typed_params(parse_stage(df, min_support=1)).select(
        "turn_idx",
        F.col("p.rows").alias("rows"), F.col("p.bytes").alias("bytes"),
        F.col("p.rc").alias("rc"), F.col("p.value").alias("value"),
        F.col("p.scn").alias("scn"), F.col("p.at").alias("at"),
        F.col("p.lag").alias("lag"),
        F.col("p.ret").cast("int").alias("ret"),
    ).collect()
    by_idx = {r["turn_idx"]: r for r in p}
    assert by_idx[0]["rows"] == 42 and by_idx[0]["bytes"] is None
    assert by_idx[1]["rc"] == 0 and by_idx[1]["bytes"] == 1024
    assert by_idx[2]["value"] == 1.5
    assert by_idx[3]["rows"] is None  # malformed value -> NULL, never an abort
    import datetime as _dt
    # timestamp-typed decode (DATE/TIMESTAMP parity, Builder.cpp:210-252)
    assert by_idx[4]["scn"] == 9
    assert by_idx[4]["at"] == _dt.datetime(2026, 2, 1, 10, 30, 5)
    # interval-typed decode (INTERVAL_DTS parity, Builder.cpp:354-589):
    # a real DayTimeIntervalType value, not a bigint-of-seconds
    assert by_idx[4]["lag"] == _dt.timedelta(hours=1, minutes=2, seconds=3)
    assert by_idx[0]["lag"] is None
    # YEAR TO MONTH sibling (INTERVAL_YTM): 'Y-M' decodes to a real
    # YearMonthIntervalType (27 months), not a string
    assert by_idx[5]["ret"] == 27
    assert by_idx[4]["ret"] is None


def test_json_format_knobs(parsed):
    """Wire-shape knobs: epoch_ms timestamps, flat per-turn messages, text
    visibility — each changes exactly what it claims and nothing else."""
    line = json.loads(to_message_json(
        parsed, ts_format="epoch_ms", flat=True, include_text=False
    ).select("value").first()["value"])
    assert isinstance(line["tm"], int)            # epoch millis, not ISO
    assert "payload" not in line and "op" in line  # flat: fields inlined
    assert "text" not in line                      # hidden column omitted
    nested = json.loads(to_message_json(parsed).select("value").first()["value"])
    assert isinstance(nested["tm"], str) and "payload" in nested


def test_epoch_ms_keeps_subsecond_precision(spark):
    """epoch_ms must be true UNIX milliseconds — cast-to-long truncates to
    whole seconds (the round-2 ADVICE finding; fixtures are second-resolution
    so only a sub-second input catches it). NTZ is interpreted as UTC (the
    pinned session timezone)."""
    df = spark.createDataFrame(
        [("c1", 0, "x", "t", None, "2026-01-02 03:04:05.678")],
        "conv_id string, turn_idx int, op string, template_id string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz")) \
     .withColumn("params", F.create_map().cast("map<string,string>")) \
     .withColumn("text", F.lit("t"))
    line = json.loads(to_message_json(df, ts_format="epoch_ms")
                      .select("value").first()["value"])
    import datetime as dt
    want = int(dt.datetime(2026, 1, 2, 3, 4, 5, 678000,
                           tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert line["tm"] == want  # .678 survives; value is UTC-based


def test_kafka_frame_contract(parsed):
    frame = kafka_frame(parsed, key_cols=("conv_id",), topic="routed")
    assert [f.name for f in frame.schema.fields] == ["key", "value", "topic"]
    assert frame.schema["key"].dataType.simpleString() == "binary"
    assert frame.schema["value"].dataType.simpleString() == "binary"
    row = frame.first()
    json.loads(bytes(row["value"]).decode())  # value is one JSON message


def test_kafka_route_real_writer_branch_contract(spark, parsed):
    """Drive the REAL `format('kafka')` writer branch end-to-end without a
    broker: a Python Data Source stands in for the kafka sink (the name
    'kafka' itself is reserved by Spark even without the jar, so the route's
    documented `kafka_format` test seam points the SAME branch at the fake)
    and captures what Spark hands the sink — rows, schema, writer options.
    Verifies the full contract the broker would see: binary key/value, the
    configured topic, and kafka.bootstrap.servers propagated."""
    import glob as _glob
    import json as _json

    from pyspark.sql.datasource import DataSource, DataSourceWriter

    capture = os.path.abspath(os.path.join(TMP, "kafka_capture"))
    shutil.rmtree(capture, ignore_errors=True)
    os.makedirs(capture)

    class _FakeKafkaWriter(DataSourceWriter):
        def __init__(self, options):
            self.options = dict(options)

        def write(self, it):
            import uuid as _uuid

            from pyspark.sql.datasource import WriterCommitMessage

            rows = [{"key": bytes(r.key).decode(),
                     "value": bytes(r.value).decode(),
                     "topic_opt": self.options.get("topic"),
                     "servers": self.options.get("kafka.bootstrap.servers")}
                    for r in it]
            if rows:
                with open(os.path.join(capture, f"{_uuid.uuid4().hex}.json"), "w") as f:
                    _json.dump(rows, f)
            return WriterCommitMessage()

        def commit(self, messages):
            pass

        def abort(self, messages):
            pass

    class _FakeKafka(DataSource):
        @classmethod
        def name(cls):
            return "fakekafka"

        def writer(self, schema, overwrite):
            assert [f.name for f in schema.fields][:2] == ["key", "value"]
            return _FakeKafkaWriter(self.options)

    spark.dataSource.register(_FakeKafka)
    routes = [{"route_id": "r_kbroker", "sink": "r_kbroker", "format": "kafka",
               "template_pattern": "^CALL ", "condition": "",
               "topic": "calls", "kafka_servers": "fake-broker:9092",
               "kafka_format": "fakekafka"}]
    counts = route_stage(parsed, routes, os.path.join(TMP, "sinks_kb"))
    assert counts["r_kbroker"] == -1      # broker-side: no readable sink dir
    rows = []
    for f in _glob.glob(os.path.join(capture, "*.json")):
        with open(f) as fh:
            rows.extend(_json.load(fh))
    expect = parsed.filter(F.col("template").rlike("^CALL ")).count()
    assert len(rows) == expect and expect > 0
    assert all(r["topic_opt"] == "calls" for r in rows)
    assert all(r["servers"] == "fake-broker:9092" for r in rows)
    json.loads(rows[0]["value"])          # value is one JSON message
    assert rows[0]["key"]                 # routing key present


def test_kafka_wire_codec_roundtrip():
    """The produce framing survives its own decoder, CRCs verified — and a
    flipped payload byte is caught by the CRC check."""
    from openlogparse_spark.route.kafka_wire import (
        decode_produce_request,
        encode_produce_request,
    )

    msgs = [(b"k1", b"v1"), (None, b"v2"), (b"k3", None)]
    frame = encode_produce_request("t0", msgs, correlation_id=7, acks=-1)
    req = decode_produce_request(frame[4:])   # strip the size prefix
    assert req["correlation_id"] == 7 and req["acks"] == -1
    assert req["topics"]["t0"][0] == msgs
    # corrupt one payload byte inside the message set -> CRC mismatch
    bad = bytearray(frame[4:])
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_produce_request(bytes(bad))


def test_kafka_route_over_real_socket(spark, parsed):
    """Stretch item r4→r5 #8: drive the route's kafka branch through the
    'kafkasocket' Python Data Source, which ships every routed row as REAL
    Kafka Produce v0 frames over a REAL TCP socket and blocks on the broker
    ack (acks=-1) — the reference's WriterKafka delivery-confirmation
    semantics (WriterKafka.cpp:86-142). Only the broker is a stub, and it
    must genuinely parse the wire format (offsets, lengths, CRCs) to
    recover the records asserted below."""
    from openlogparse_spark.route.kafka_wire import (
        StubBroker,
        register_socket_kafka_sink,
    )

    fmt = register_socket_kafka_sink(spark)
    with StubBroker() as broker:
        routes = [{"route_id": "r_ksock", "sink": "r_ksock", "format": "kafka",
                   "template_pattern": "^CALL ", "condition": "",
                   "topic": "calls", "kafka_servers": broker.servers,
                   "kafka_format": fmt}]
        counts = route_stage(parsed, routes, os.path.join(TMP, "sinks_ksock"))
        assert counts["r_ksock"] == -1       # broker-side sink
        got = broker.records("calls")
    expect = parsed.filter(F.col("template").rlike("^CALL ")).count()
    assert len(got) == expect and expect > 0
    assert all(k for k, _ in got)            # routing key present
    msg = json.loads(got[0][1].decode())     # value is one JSON message
    assert "payload" in msg or "op" in msg


def test_json_route_sink_roundtrips(spark, parsed):
    shutil.rmtree(TMP, ignore_errors=True)
    routes = [{"route_id": "r_json", "sink": "r_json", "format": "json",
               "template_pattern": "^(ERROR|WARN) ", "condition": ""}]
    counts = route_stage(parsed, routes, os.path.join(TMP, "sinks"))
    expect = parsed.filter(F.col("template").rlike("^(ERROR|WARN) ")).count()
    assert counts["r_json"] == expect
    back = from_message_json(
        spark.read.text(os.path.join(TMP, "sinks", "r_json")))
    assert back.count() == expect
    assert back.filter(F.col("template_id").isNull()).count() == 0


def test_kafka_route_without_broker_stages_frame(spark, parsed):
    routes = [{"route_id": "r_kafka", "sink": "r_kafka", "format": "kafka",
               "template_pattern": "^CALL ", "condition": "", "topic": "calls"}]
    counts = route_stage(parsed, routes, os.path.join(TMP, "sinks"))
    staged = spark.read.parquet(os.path.join(TMP, "sinks", "r_kafka"))
    assert [f.name for f in staged.schema.fields] == ["key", "value", "topic"]
    assert staged.count() == counts["r_kafka"] > 0


@pytest.mark.parametrize("committer_cls", [RenameCommitter, CopyCommitter])
def test_committer_seam_identical_sinks(spark, parsed, committer_cls):
    """route_stage produces byte-identical committed sinks through either
    Committer implementation (the Iceberg-swap seam)."""
    root = os.path.join(TMP, f"seam_{committer_cls.__name__}")
    shutil.rmtree(root, ignore_errors=True)
    routes = [{"route_id": "r_txn", "sink": "r_txn",
               "template_pattern": "^(BEGIN|COMMIT|ROLLBACK)", "condition": ""}]
    counts = route_stage(parsed, routes, root, committer=committer_cls())
    assert counts["r_txn"] > 0
    got = (spark.read.parquet(os.path.join(root, "r_txn"))
           .groupBy().agg(F.count(F.lit(1)).alias("n"),
                          F.sum(F.hash("conv_id", "turn_idx", "text")).alias("h"))
           .first())
    # store digest on the function for cross-param comparison
    key = "digest"
    store = test_committer_seam_identical_sinks.__dict__.setdefault("store", {})
    store[committer_cls.__name__] = (got["n"], got["h"])
    if len(store) == 2:
        assert store["RenameCommitter"] == store["CopyCommitter"]
    # no leftover staging state
    assert not glob.glob(os.path.join(root, "*.__tmp__"))
    assert not glob.glob(os.path.join(root, "*.__copy__"))


def test_json_route_empty_match_is_empty_sink(spark, parsed):
    routes = [{"route_id": "r_json_none", "sink": "r_json_none", "format": "json",
               "template_pattern": "^NEVERMATCHES ", "condition": ""}]
    counts = route_stage(parsed, routes, os.path.join(TMP, "sinks_empty"))
    assert counts["r_json_none"] == 0
