from openlogparse_spark.streaming.jobs import (  # noqa: F401
    stream_conversation_sessions,
    stream_hourly_counts,
    stream_parse_enrich,
    stream_routed_sink,
)
