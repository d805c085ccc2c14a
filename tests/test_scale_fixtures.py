"""Scale-fixture generators must match the driver testdata's schema.

The sf0.1->sf1 studies (SCALE.md) are only valid if the generated
corpora look like the real data to every query plan — a silently
drifted column name/type would either break the study or, worse,
measure a different plan. Footer-only checks, tiny generation."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")


@pytest.fixture(scope="module")
def star_dir(tmp_path_factory):
    import scale_star_fixtures

    out = str(tmp_path_factory.mktemp("star"))
    scale_star_fixtures.generate(out, 0.002)
    return out


@pytest.fixture(scope="module")
def pipe_dir(tmp_path_factory):
    import scale_fixtures

    out = str(tmp_path_factory.mktemp("pipe"))
    scale_fixtures.generate(out, 0.002)
    return out


def test_star_fixture_schema_matches_testdata(spark, star_dir):
    """Every star table's (column, dtype) list is identical to the
    driver testdata's — except o_orderdate/l_shipdate, where the
    generator writes timestamp[us] and the driver data reads as
    timestamp_ntz (both microsecond wall-clock; catalog loaders
    normalize)."""
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem"):
        want = dict(
            spark.read.parquet(f"/root/testdata/sf0.01/{name}.parquet").dtypes
        )
        got = dict(spark.read.parquet(f"{star_dir}/{name}.parquet").dtypes)
        norm = lambda d: {k: v.replace("timestamp_ntz", "timestamp") for k, v in d.items()}
        assert norm(got) == norm(want), name


def test_star_fixture_row_ratios(spark, star_dir):
    """Row counts follow the driver data's per-sf ratios (10 orders
    per customer, ~4 lines per order)."""
    cnt = {
        n: spark.read.parquet(f"{star_dir}/{n}.parquet").count()
        for n in ("customer", "orders", "lineitem")
    }
    assert cnt["orders"] == cnt["customer"] * 10
    assert 3.5 * cnt["orders"] < cnt["lineitem"] < 4.5 * cnt["orders"]


def test_star_fixture_value_domains(spark, star_dir):
    """The selective-filter domains the star queries depend on exist
    in the generated data (vacuous filters would fake sublinear
    scaling)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{star_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{star_dir}/orders.parquet")
    p = spark.read.parquet(f"{star_dir}/part.parquet")
    flags = {r[0] for r in li.select("l_returnflag").distinct().collect()}
    assert flags == {"A", "N", "R"}
    years = o.select(F.year("o_orderdate").alias("y")).distinct().count()
    assert years == 7  # 1995..2001 like the driver data
    assert p.filter(F.col("p_size").between(5, 15)).count() > 0
    assert p.select("p_brand").distinct().count() == 25


def test_pipeline_fixture_schema_matches_testdata(spark, pipe_dir):
    for name in ("documents", "embeddings", "events"):
        want = dict(
            spark.read.parquet(f"/root/testdata/sf0.01/{name}.parquet").dtypes
        )
        got = dict(spark.read.parquet(f"{pipe_dir}/{name}.parquet").dtypes)
        norm = lambda d: {k: v.replace("timestamp_ntz", "timestamp") for k, v in d.items()}
        assert norm(got) == norm(want), name


def test_heaps_vocab_grows_and_keeps_rare_tail():
    """The --heaps document variant (round 14): vocabulary size grows
    with the corpus (Heaps beta=0.5 from the 31-word/5k-doc anchor)
    under a Zipf(1.1) weighting, so rare shingles EXIST at every scale
    — the driver-shape fixture's fixed 31-word vocab saturates the
    trigram universe at 31^3 and makes every df-bounded candidate
    scheme vacuously empty beyond ~15k docs (SCALE.md round-14)."""
    import numpy as np
    from scale_fixtures import _heaps_vocab, gen_documents

    rng = np.random.default_rng(7)
    v5k, p5k = _heaps_vocab(5000, rng)
    v50k, p50k = _heaps_vocab(50000, rng)
    assert len(v5k) == 31  # anchor: the driver corpus scale
    assert len(v50k) == round(31 * 10**0.5)
    assert abs(p50k.sum() - 1.0) < 1e-9
    # Zipf head/tail spread exists (stop-shingles AND rare shingles)
    assert p50k.max() / p50k.min() > 50
    # generated docs draw from the grown vocab (20k docs -> vocab 62;
    # below the 5k-doc anchor the variant intentionally matches the
    # driver vocab)
    tbl = gen_documents(20_000, rng, heaps=True)
    words = {w for t in tbl["text"].to_pylist() for w in t.split(" ")}
    assert len(words) > 31
