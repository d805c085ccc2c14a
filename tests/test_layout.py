"""Z-order layout (sources/layout.py, plans/layout.py): curve
correctness vs a Python Morton reference, the measured row-group
skipping win over a linear sort, and row-identity of the clustered
mirror."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gazelle_plugin_spark.plans._util import t
from gazelle_plugin_spark.sources import layout

from .conftest import SF_MED


def _morton_py(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 3, 77, 65535)]
    df = spark.createDataFrame(rows, "a int, b int")
    out = df.withColumn("z", layout.z_value(F.col("a"), F.col("b"))).collect()
    for r in out:
        assert r.z == _morton_py(r.a, r.b, layout.Z_BITS), (r.a, r.b)


def test_zorder_write_requires_two_columns(spark):
    df = spark.range(4)
    with pytest.raises(ValueError):
        layout.zorder_write(df, "/tmp/never", ["id"], 2)


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """lineitem written twice with identical file/row-group sizing:
    linear-sorted by l_partkey vs z-ordered by (l_partkey, l_suppkey).
    A small parquet block size forces many row groups so the footer
    stats are a meaningful pruning measurement."""
    base = tmp_path_factory.mktemp("layouts")
    li = t(spark, SF_MED, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    opts = {"parquet.block.size": "65536"}
    linear = str(base / "linear")
    (
        li.repartitionByRange(4, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .options(**opts)
        .parquet(linear)
    )
    zordered = str(base / "zordered")
    layout.zorder_write(li, zordered, ("l_partkey", "l_suppkey"), 4, **opts)
    return linear, zordered


def test_zorder_prunes_both_box_columns(layouts):
    linear, zordered = layouts
    # narrow box: ~5% of the l_partkey domain, ~11% of l_suppkey's
    part_frac_linear = layout.rowgroup_overlap_fraction(linear, "l_partkey", 100, 200)
    part_frac_z = layout.rowgroup_overlap_fraction(zordered, "l_partkey", 100, 200)
    supp_frac_linear = layout.rowgroup_overlap_fraction(linear, "l_suppkey", 10, 20)
    supp_frac_z = layout.rowgroup_overlap_fraction(zordered, "l_suppkey", 10, 20)
    # the linear layout prunes its sort column but reads everything on
    # the second column; the z-order prunes BOTH
    assert part_frac_linear < 0.35
    assert supp_frac_linear > 0.9
    assert part_frac_z < 0.65
    assert supp_frac_z < 0.65
    assert supp_frac_z < supp_frac_linear / 1.5


def test_zorder_layout_is_row_identical(spark, layouts):
    linear, zordered = layouts
    a = spark.read.parquet(linear)
    b = spark.read.parquet(zordered)
    assert a.count() == b.count()
    assert a.exceptAll(b).isEmpty()


def test_compact_small_files(spark, tmp_path):
    """64 tiny files -> a handful of ~target-size files, row-identical,
    no stray staging dirs left behind."""
    import os

    path = str(tmp_path / "frag")
    li = t(spark, SF_MED, "lineitem").select("l_orderkey", "l_quantity")
    li.repartition(64).write.parquet(path)
    files_before = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files_before) == 64
    before = li.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s")
    ).collect()[0]

    n_out = layout.compact(spark, path, target_bytes=512 * 1024)
    files_after = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files_after) == n_out < 16
    assert not [d for d in os.listdir(tmp_path) if ".old." in d or ".compact." in d]
    after = spark.read.parquet(path).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s")
    ).collect()[0]
    assert (before.n, before.s) == (after.n, after.s)


def test_compact_recovers_stranded_swap(spark, tmp_path):
    """A crash between compact()'s two renames leaves the data under
    <path>.old.<pid> and no <path>; the next compact() of the same
    path restores the snapshot before compacting. (The swap contract
    is local-FS/HDFS only — object stores need a manifest commit; see
    the compact() docstring and SCALE.md.)"""
    import os

    path = str(tmp_path / "frag")
    li = t(spark, SF_MED, "lineitem").select("l_orderkey", "l_quantity").limit(1000)
    li.repartition(8).write.parquet(path)
    n_rows = spark.read.parquet(path).count()
    # simulate the crash window: first rename done, second never ran
    os.rename(path, f"{path}.old.99999")
    assert not os.path.exists(path)
    n_out = layout.compact(spark, path, target_bytes=512 * 1024)
    assert n_out >= 1
    assert spark.read.parquet(path).count() == n_rows
    assert not [d for d in os.listdir(tmp_path) if ".old." in d or ".compact." in d]


def test_zorder_scan_pushes_filters(spark):
    from gazelle_plugin_spark.plans.layout import rel_zorder_scan

    df = rel_zorder_scan(spark, SF_MED)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan, plan
    assert "l_partkey" in plan
