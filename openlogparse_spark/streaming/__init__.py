from openlogparse_spark.streaming.jobs import (  # noqa: F401
    stream_parse_enrich,
    stream_hourly_counts,
    stream_conversation_sessions,
)
