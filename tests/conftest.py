from __future__ import annotations

import duckdb
import pytest

from gazelle_plugin_spark import get_spark
from gazelle_plugin_spark.catalog import ALL_TABLES, table_path

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    s = get_spark(
        app_name="gazelle-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_confs={
            # managed-table warehouse (bucketed-table tests) in tmp
            "spark.sql.warehouse.dir": str(tmp_path_factory.mktemp("warehouse")),
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF_MED, name)}')"
        )
    yield con
    con.close()
