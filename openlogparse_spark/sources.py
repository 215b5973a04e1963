"""Input connectors: schema-gated readers for every wire format the
transcripts arrive in.

Reference parity: the reference reads one physical format (binary redo
blocks) through Reader subclasses (ReaderFilesystem/ReaderASM,
/root/reference/src/reader/); the log-pipeline generalization is one
logical schema (pipeline.INPUT_CONTRACT) over several physical encodings.
Every reader funnels through the same schema gate, so a format can never
smuggle in drifted columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx long, role string, text string, "
    "tool string, ts timestamp_ntz"
)


def read_transcripts(spark: SparkSession, path: str,
                     fmt: str = "parquet") -> DataFrame:
    """Read a transcripts table from `path` in any supported encoding and
    validate it against the input contract.

    parquet: self-describing (schema from footers, pruned/pushed-down scans).
    json/csv: schema is ENFORCED, never inferred — inference is a full extra
    pass at 100 TB and non-deterministic under sampling; `ts` strings are
    parsed as microsecond timestamps. csv expects a header; json is
    line-delimited.
    """
    from openlogparse_spark.pipeline import validate_input_schema

    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "json":
        df = spark.read.schema(TRANSCRIPT_DDL).json(path)
    elif fmt == "csv":
        df = (spark.read.schema(TRANSCRIPT_DDL)
              .option("header", "true")
              .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
              .csv(path))
    else:
        raise ValueError(f"unsupported transcripts format {fmt!r}")
    # csv cannot carry embedded newlines safely without quoting; both text
    # formats may deliver turn_idx as long (contract allows int|bigint)
    validate_input_schema(df)
    return df


def write_transcripts(df: DataFrame, path: str, fmt: str) -> None:
    """Inverse (test fixtures / interchange): emit json-lines or headered csv
    with the `ts` encoding `read_transcripts` round-trips."""
    out = df.withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    if fmt == "json":
        out.write.mode("overwrite").json(path)
    elif fmt == "csv":
        out.write.mode("overwrite").option("header", "true").csv(path)
    else:
        raise ValueError(f"unsupported transcripts format {fmt!r}")
