import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openlogparse_spark.fixtures import ensure_fixtures  # noqa: E402
from openlogparse_spark.session import get_spark  # noqa: E402

SF = 0.001
SF_BIG = 0.01


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fx_dir():
    return ensure_fixtures(SF)


@pytest.fixture(scope="session")
def fx_dir_big():
    return ensure_fixtures(SF_BIG)


@pytest.fixture(scope="session")
def duck(fx_dir):
    import duckdb

    con = duckdb.connect()
    for name in ("transcripts", "transcripts_logical", "dim_tools", "dim_roles", "routes"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{os.path.join(fx_dir, name)}.parquet'"
        )
    return con
