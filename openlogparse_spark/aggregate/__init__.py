from openlogparse_spark.aggregate.rollups import agg_hourly, conv_stats  # noqa: F401
from openlogparse_spark.aggregate.txn import conv_outcomes, replay_transactions  # noqa: F401
