"""Hot-bucket guard (operators/skew.py): planted-degenerate-bucket
tests pinning (a) the bucket-size bound, (b) the candidate-subset
property (capping can only LOSE pairs, never invent them), and (c)
that the production caps are no-ops on the real test data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gazelle_plugin_spark.operators.skew import cap_bucket
from gazelle_plugin_spark.plans import similarity_queries as simq
from gazelle_plugin_spark.plans import text_pipeline as tp

from .conftest import SF_SMALL


def test_cap_bucket_bounds_giant_bucket(spark):
    """One 500-row bucket with cap=50 must split into ceil(500/50)=10
    hash-balanced sub-buckets; a small bucket keeps salt 0."""
    rows = [("hot", i) for i in range(500)] + [("cold", i) for i in range(20)]
    df = spark.createDataFrame(rows, "k string, id long")
    salted = cap_bucket(df, ["k"], "id", cap=50)
    sizes = (
        salted.groupBy("k", "sub").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    hot = [r for r in sizes if r["k"] == "hot"]
    cold = [r for r in sizes if r["k"] == "cold"]
    assert len(hot) == 10  # ceil(500/50) sub-buckets, all non-empty
    assert max(r["n"] for r in hot) <= 2 * 50  # hash balance bound
    assert len(cold) == 1 and cold[0]["sub"] == 0 and cold[0]["n"] == 20


def test_cap_bucket_noop_under_cap(spark):
    """Buckets at/below the cap are bit-identical to the input
    (salt 0 everywhere) — the reason the DuckDB oracles need no
    change."""
    df = spark.range(100).withColumn("k", F.col("id") % 10)
    salted = cap_bucket(df, ["k"], "id", cap=10)
    assert salted.filter(F.col("sub") != 0).count() == 0
    assert salted.count() == 100


def test_semdedup_cap_is_subset(spark, monkeypatch):
    """With the cap forced BELOW the real cluster sizes, emb_semdedup
    still runs, keeps its output grain, and its dropped set is a
    SUBSET of the uncapped run's (recall-only loss, no false
    positives)."""
    from gazelle_plugin_spark.plans import QUERIES

    full = QUERIES["emb_semdedup"](spark, SF_SMALL).toPandas()
    monkeypatch.setattr(simq, "SEMDEDUP_BUCKET_CAP", 7)
    capped = QUERIES["emb_semdedup"](spark, SF_SMALL).toPandas()
    assert len(capped) == len(full)  # one row per vector either way
    full_drop = set(full[full.is_dropped].vec_id)
    cap_drop = set(capped[capped.is_dropped].vec_id)
    assert cap_drop <= full_drop
    # clusters here are ~50 vectors with near-dup structure: a cap of
    # 7 must still find a meaningful share of the duplicates
    assert len(full_drop) > 0 and len(cap_drop) > 0


def test_minhash_cap_is_subset(spark, monkeypatch):
    """Same for the MinHash band join: pairs under a tiny cap are a
    subset of the uncapped pairs and the planted near-dups keep
    surfacing."""
    full = {
        (r.d1, r.d2)
        for r in tp._neardup_pairs(spark, SF_SMALL).collect()
    }
    monkeypatch.setattr(tp, "MINHASH_BUCKET_CAP", 3)
    capped = {
        (r.d1, r.d2)
        for r in tp._neardup_pairs(spark, SF_SMALL).collect()
    }
    assert capped <= full
    assert len(full) > 0 and len(capped) > 0


def test_production_caps_are_noop(spark):
    """At the shipped caps the guard must not change a single result
    row on the real data (oracle-parity already asserts this against
    DuckDB; this pins the stronger statement that every salt is 0)."""
    v = simq._vectors(spark, SF_SMALL)
    cent = v.groupBy(F.col("label").alias("c_label")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    assert (
        cap_bucket(
            v.join(cent, v.label == cent.c_label),
            ["c_label"], "vec_id", simq.SEMDEDUP_BUCKET_CAP,
        )
        .filter(F.col("sub") != 0)
        .count()
        == 0
    )


def test_cap_bucket_probe_no_recall_loss(spark):
    """Asymmetric guard: a planted hot BASE bucket splits into salted
    sub-buckets and the probe explodes across the full salt range —
    the guarded join finds EXACTLY the unguarded pairs (no recall
    loss), while no single (bucket, salt) build cell exceeds ~cap."""
    from gazelle_plugin_spark.operators.skew import cap_bucket_probe

    base_rows = [("hot", i) for i in range(300)] + [("cold", i) for i in range(5)]
    probe_rows = [("hot", 9000 + i) for i in range(7)] + [("cold", 9100)]
    base = spark.createDataFrame(base_rows, "k string, id long")
    probe = spark.createDataFrame(probe_rows, "k string, id long")
    b, p = cap_bucket_probe(base, probe, ["k"], "id", cap=50)
    got = {
        (r.pid, r.bid)
        for r in p.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.k") == F.col("y.k")) & (F.col("x.sub") == F.col("y.sub")),
        )
        .select(F.col("x.id").alias("pid"), F.col("y.id").alias("bid"))
        .collect()
    }
    want = {(pr[1], br[1]) for pr in probe_rows for br in base_rows if pr[0] == br[0]}
    assert got == want  # every base row still probed — zero recall loss
    cell_sizes = b.groupBy("k", "sub").agg(F.count(F.lit(1)).alias("n")).collect()
    assert max(r["n"] for r in cell_sizes) <= 2 * 50
    cold = [r for r in cell_sizes if r["k"] == "cold"]
    assert len(cold) == 1 and cold[0]["sub"] == 0  # healthy bucket untouched


def test_incremental_dedup_guard_matches_oracle_shape(spark, monkeypatch):
    """doc_incremental_dedup with the cap forced tiny must return
    IDENTICAL results to the shipped cap — the asymmetric guard probes
    all sub-buckets, so unlike the self-join guard even a binding cap
    changes nothing but task sizing."""
    from gazelle_plugin_spark.plans import QUERIES

    full = QUERIES["doc_incremental_dedup"](spark, SF_SMALL).toPandas()
    monkeypatch.setattr(tp, "MINHASH_BUCKET_CAP", 2)
    capped = QUERIES["doc_incremental_dedup"](spark, SF_SMALL).toPandas()
    assert full.equals(capped)
    assert (~full.kept).sum() > 0  # planted near-dups keep surfacing


def test_simhash_cap_is_subset(spark, monkeypatch):
    """SimHash band self-join under a tiny cap: candidate pairs are a
    subset of the uncapped pairs and planted near-dups keep
    surfacing (same contract as the MinHash guard)."""
    from gazelle_plugin_spark.plans import QUERIES

    full = {
        (r.d1, r.d2)
        for r in QUERIES["doc_simhash_neardup"](spark, SF_SMALL).collect()
    }
    monkeypatch.setattr(tp, "MINHASH_BUCKET_CAP", 3)
    capped = {
        (r.d1, r.d2)
        for r in QUERIES["doc_simhash_neardup"](spark, SF_SMALL).collect()
    }
    assert capped <= full
    assert len(full) > 0 and len(capped) > 0
