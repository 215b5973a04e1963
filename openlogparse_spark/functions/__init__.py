from openlogparse_spark.functions import dedup, similarity, text, multimodal  # noqa: F401
