"""Structured Streaming tests: file source -> memory sink, verified
against the identical batch plan (batch/stream duality), plus the
custom stateful sessionizer."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from gazelle_plugin_spark.plans.events import events as load_events
from gazelle_plugin_spark.streaming import (
    sessionize,
    sessionize_stateful,
    stream_events,
    windowed_counts,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Batch events table re-written as a stream-ingestible parquet
    dir (micros timestamps, streaming column set)."""
    path = str(tmp_path_factory.mktemp("stream") / "events.parquet")
    load_events(spark, SF_SMALL).select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).write.parquet(path)
    return path


def _run_stream(spark, df, name, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def rows(df):
    return sorted(map(tuple, df.collect()), key=str)


def test_windowed_counts_stream_matches_batch(spark, events_dir):
    stream = stream_events(spark, events_dir)
    got = _run_stream(spark, windowed_counts(stream), "wc_sink", "update")
    batch = spark.read.parquet(events_dir)
    expected = windowed_counts(batch)
    assert rows(got) == rows(expected)


def test_session_window_stream_matches_batch(spark, events_dir):
    stream = stream_events(spark, events_dir)
    got = _run_stream(spark, sessionize(stream), "sw_sink", "complete")
    batch = spark.read.parquet(events_dir)
    expected = sessionize(batch)
    assert rows(got) == rows(expected)


def test_streaming_dedup_drops_replayed_rows(spark, events_dir, tmp_path):
    """Duplicate the source files (a replayed batch) — streaming dedup
    must restore exactly the distinct event_ids."""
    import shutil
    from gazelle_plugin_spark.streaming import dedup_stream

    dup_dir = str(tmp_path / "dup.parquet")
    shutil.copytree(events_dir, dup_dir)
    for f in list((tmp_path / "dup.parquet").glob("part-*")):
        shutil.copy(f, f.with_name("replay-" + f.name))
    stream = stream_events(spark, dup_dir)
    got = _run_stream(spark, dedup_stream(stream), "dd_sink", "append")
    batch = spark.read.parquet(events_dir)
    assert got.count() == batch.count()
    assert got.select("event_id").distinct().count() == batch.count()


def test_stream_static_join_enriches(spark, events_dir):
    from gazelle_plugin_spark.streaming import enrich_stream

    dim = spark.range(0, 10).select(
        F.col("id").alias("user_id"), (F.col("id") % 3).alias("cohort")
    )
    stream = stream_events(spark, events_dir)
    got = _run_stream(spark, enrich_stream(stream, dim), "en_sink", "append")
    batch = spark.read.parquet(events_dir)
    assert got.count() == batch.count()
    matched = got.filter(F.col("cohort").isNotNull()).count()
    expected = batch.filter(F.col("user_id") < 10).count()
    assert matched == expected


def test_stateful_sessionize_closed_sessions(spark, events_dir):
    """applyInPandasWithState emits exactly the CLOSED sessions: every
    batch session except each user's final (still-open) one."""
    stream = stream_events(spark, events_dir)
    got = _run_stream(
        spark, sessionize_stateful(stream), "ss_sink", "append"
    ).select("user_id", "session_start", "n_events", "total_value")

    batch = spark.read.parquet(events_dir)
    all_sessions = sessionize(batch).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.desc("session_start"))
        ),
    )
    expected = all_sessions.filter(F.col("rk") > 1).select(
        "user_id", "session_start", "n_events", "total_value"
    )
    got_r = {(r.user_id, r.session_start, r.n_events, round(r.total_value, 6)) for r in got.collect()}
    exp_r = {(r.user_id, r.session_start, r.n_events, round(r.total_value, 6)) for r in expected.collect()}
    assert got_r == exp_r


class _FakeState:
    """Minimal GroupState stand-in for unit-testing _session_fn."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.timeout_ts = None
        self.removed = False

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value, self.removed = None, True

    def setTimeoutTimestamp(self, ts_ms):
        self.timeout_ts = ts_ms


def test_session_fn_sorts_across_chunk_boundaries():
    """One key's micro-batch arriving as SEVERAL pandas chunks must be
    folded in global ts order: chunk-local sorting would see the
    out-of-order row as a >gap silence and split the session."""
    import pandas as pd
    from gazelle_plugin_spark.streaming.pipeline import _GAP_US, _session_fn

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    gap = pd.Timedelta(microseconds=_GAP_US + 1_000_000)
    # chunk 1 holds the LAST event, chunk 2 the first two: one session
    chunk1 = pd.DataFrame({"ts": [t0 + pd.Timedelta("2 min")], "value": [3.0]})
    chunk2 = pd.DataFrame({"ts": [t0, t0 + pd.Timedelta("1 min")], "value": [1.0, 2.0]})
    # plus a second session >gap after the last event so exactly one
    # close is emitted
    chunk3 = pd.DataFrame({"ts": [t0 + pd.Timedelta("2 min") + gap], "value": [9.0]})
    state = _FakeState()
    out = list(_session_fn((7,), iter([chunk1, chunk2, chunk3]), state))
    assert len(out) == 1 and len(out[0]) == 1
    closed = out[0].iloc[0]
    assert closed["n_events"] == 3 and closed["total_value"] == 6.0
    # the open (second) session stays in state
    assert state.exists and state.get[2] == 1


def test_session_fn_timeout_flushes_open_session():
    """Under EventTimeTimeout an expired key emits its open session
    and evicts state (idle users must not hold state forever)."""
    from gazelle_plugin_spark.streaming.pipeline import _session_fn

    state = _FakeState(value=(1_000_000, 2_000_000, 4, 10.0), timed_out=True)
    out = list(_session_fn((7,), iter([]), state, flush_open=True))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["n_events"], row["total_value"]) == (4, 10.0)
    assert state.removed


def test_stateful_sessionize_flush_open_emits_idle_sessions(spark, events_dir):
    """flush_open=True + maxFilesPerTrigger=1: the watermark advances
    between micro-batches, so idle users' OPEN sessions flush via
    event-time timeout instead of living in the state store forever.
    Robust assertions (batch boundaries are not contractual): every
    emitted session matches a batch session exactly, the closed set is
    fully covered, and at least one open session actually flushed."""
    from gazelle_plugin_spark.streaming.pipeline import EVENTS_SCHEMA

    stream = (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(events_dir)
    )
    got = _run_stream(
        spark, sessionize_stateful(stream, flush_open=True), "ssf_sink", "append"
    )
    got_r = {
        (r.user_id, r.session_start, r.n_events, round(r.total_value, 6))
        for r in got.collect()
    }

    batch = spark.read.parquet(events_dir)
    all_sessions = sessionize(batch)
    all_r = {
        (r.user_id, r.session_start, r.n_events, round(r.total_value, 6))
        for r in all_sessions.collect()
    }
    closed = all_sessions.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.desc("session_start"))
        ),
    ).filter(F.col("rk") > 1)
    closed_r = {
        (r.user_id, r.session_start, r.n_events, round(r.total_value, 6))
        for r in closed.collect()
    }
    assert got_r <= all_r            # nothing invented
    assert closed_r <= got_r         # every closed session emitted
    assert len(got_r) > len(closed_r)  # >=1 open session flushed


def test_interval_join_stream_matches_batch(spark, events_dir):
    """Stream-stream interval join (clicks x errors within 5 min per
    user, both sides watermarked/bounded-state) produces exactly the
    batch pairs."""
    from gazelle_plugin_spark.streaming import interval_join

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "error"),
        )

    sc, se = split(stream_events(spark, events_dir))
    got = _run_stream(spark, interval_join(sc, se), "ij_sink", "append")
    bc, be = split(spark.read.parquet(events_dir))
    expected = interval_join(bc, be)
    assert rows(got) == rows(expected)
    assert expected.count() > 0


def test_cms_sketch_stream_matches_batch(spark, events_dir):
    """The online count-min sketch equals a batch rebuild counter for
    counter (same md5 slots), and its estimates never underestimate
    the exact per-type counts."""
    from gazelle_plugin_spark.streaming.pipeline import cms_sketch_stream

    stream = stream_events(spark, events_dir)
    got = _run_stream(spark, cms_sketch_stream(stream), "cms_sink", "update")
    batch = spark.read.parquet(events_dir)
    expected = cms_sketch_stream(batch)
    assert rows(got) == rows(expected)

    sketch = {(r.r, r.slot): r.c for r in got.collect()}
    from gazelle_plugin_spark.plans._util import md5h60
    from pyspark.sql import functions as F

    exact = batch.groupBy("event_type").count().collect()
    slots = {
        (r.event_type, r.r): r.slot
        for r in batch.select("event_type").distinct()
        .select("event_type", F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("r"))
        .select(
            "event_type", "r",
            F.pmod(
                md5h60(F.concat(F.col("event_type"), F.lit("#"), F.col("r").cast("string"))),
                F.lit(256),
            ).alias("slot"),
        )
        .collect()
    }
    for row in exact:
        est = min(sketch[(r, slots[(row.event_type, r)])] for r in range(4))
        assert est >= row['count'], row
