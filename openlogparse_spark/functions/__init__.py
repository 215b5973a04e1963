from openlogparse_spark.functions import cdc, dedup, multimodal, serialize, similarity, text  # noqa: F401
