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
            # The suite session compiles thousands of generated classes
            # across ~1800 tests; HotSpot's default 240 MB code cache
            # fills mid-suite and JIT silently stops — the exact
            # round-6 bench failure mode (bench.py JVM_OPTS). Same fix
            # here, plus heap headroom over the 1g default so long
            # sweeps don't run GC-bound. Applies because this fixture
            # launches the process's first (only) JVM.
            "spark.driver.memory": "4g",
            "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=512m",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session", autouse=True)
def _testdata_schema_tripwire(spark):
    """Session-wide guard: if /root/testdata was regenerated with a
    drifted schema, every test run says so in one message naming the
    column (round-4 lesson: events.ts silently changed encoding and
    38 tests went red with an opaque analysis error)."""
    from gazelle_plugin_spark.catalog import assert_testdata_schema

    assert_testdata_schema(spark, SF_SMALL)
    assert_testdata_schema(spark, SF_MED)


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF_MED, name)}')"
        )
    yield con
    con.close()
