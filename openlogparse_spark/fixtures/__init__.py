from openlogparse_spark.fixtures.transcripts import (  # noqa: F401
    generate_fixtures,
    write_fixtures,
    fixture_dir,
    ensure_fixtures,
)
