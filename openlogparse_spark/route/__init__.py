from openlogparse_spark.route.router import route_stage, add_salt, compile_route_filter, merge_sinks  # noqa: F401
