from openlogparse_spark.enrich.stage import enrich_stage  # noqa: F401
