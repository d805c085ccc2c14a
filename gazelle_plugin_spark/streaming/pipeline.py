"""Streaming pipelines over the events schema.

Batch/stream duality: ``windowed_counts`` and ``sessionize`` accept
either a batch or a streaming DataFrame — the same declarative plan
runs under both engines (the test harness exploits this: stream via a
file source + memory sink, compare against the batch result).

Scale notes: streaming state is keyed by (window/session, user) —
shuffle-partitioned like any groupBy; watermarks bound state size
(late rows beyond the delay are dropped, state for closed
windows/sessions is evicted). applyInPandasWithState state lives in
the state store per key — keep the state struct narrow.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Schema of a streamed events source (ts already a timestamp — the
#: TIMESTAMP(NANOS) parquet quirk is a batch-ingest concern;
#: streaming sources land micros).
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

SESSION_GAP = "30 minutes"


def stream_events(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """File-source stream over an events directory (new files are
    discovered per micro-batch)."""
    return spark.readStream.format(fmt).schema(EVENTS_SCHEMA).load(path)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregate per event type — the
    streaming twin of plans.events.events_hourly. Late rows beyond
    ``watermark`` are dropped and window state is evicted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = SESSION_GAP,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Declarative gap sessionization via ``session_window`` — the
    built-in that expresses plans.events.events_sessionize for both
    batch and streams."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact deduplication: dropDuplicatesWithinWatermark
    keeps per-key state only for the watermark horizon — the
    bounded-state streaming twin of plans.text_pipeline.doc_exact_dedup
    (an unbounded dropDuplicates would accumulate state forever at
    100 TB/day)."""
    keys = keys or ["event_id"]
    src = events.withWatermark("ts", watermark)
    if events.isStreaming:
        return src.dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    max_delta: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join within a time interval: pair left and
    right events sharing ``key`` whose timestamps differ by at most
    ``max_delta``. Both sides are watermarked so the join state is
    BOUNDED — each side buffers only watermark+delta of history per
    key (unbounded stream-stream joins accumulate state forever).
    Works identically on batch frames (no watermark needed there)."""
    l = left.select(
        F.col(key),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    r = right.select(
        F.col(key).alias("__rk"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (l[key] == r["__rk"])
        & (r["r_ts"] >= F.expr(f"l_ts - interval {max_delta}"))
        & (r["r_ts"] <= F.expr(f"l_ts + interval {max_delta}"))
    )
    return l.join(r, cond).select(
        key, "l_event_id", "r_event_id", "l_ts", "r_ts"
    )


def enrich_stream(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static join: enrich each event with a (small, slowly
    changing) dimension. The static side behaves like a broadcast dim
    in batch — re-read per micro-batch, no streaming state."""
    return events.join(F.broadcast(dim), on, "left_outer")


#: Output of sessionize_stateful: one row per CLOSED session.
SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

#: Per-user state: open session accumulator.
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)

_GAP_US = 30 * 60 * 1_000_000


def _session_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    flush_open: bool = False,
) -> Iterator[pd.DataFrame]:
    """Custom stateful sessionizer: fold the micro-batch's rows (in
    ts order) into the open-session state; emit a row whenever a >gap
    silence closes a session. The open session persists in state
    across micro-batches.

    A key's micro-batch may arrive as SEVERAL pandas chunks — rows are
    concatenated and sorted ONCE before folding (sorting per chunk
    would let out-of-order rows across chunk boundaries close/split
    sessions incorrectly). Under an event-time timeout
    (``sessionize_stateful(flush_open=True)``) an expired key flushes
    its open session and clears state."""
    (user_id,) = key
    if state.hasTimedOut:
        # watermark passed the open session's gap horizon: no more
        # rows can extend it — emit it as closed and drop the state
        start_us, last_us, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": pd.to_datetime([start_us], unit="us"),
                "session_end": pd.to_datetime([last_us], unit="us"),
                "n_events": [n],
                "total_value": [total],
            }
        )
        return
    if state.exists:
        start_us, last_us, n, total = state.get
    else:
        start_us = last_us = n = 0
        total = 0.0
    closed: list[tuple] = []
    chunks = list(pdfs)
    rows = (
        pd.concat(chunks, ignore_index=True).sort_values("ts")
        if chunks
        else pd.DataFrame(columns=["ts", "value"])
    )
    for ts, value in zip(rows["ts"], rows["value"]):
        ts_us = int(pd.Timestamp(ts).value // 1_000)
        if n == 0:
            start_us, last_us, n, total = ts_us, ts_us, 1, float(value)
        elif ts_us - last_us > _GAP_US:
            closed.append((user_id, start_us, last_us, n, total))
            start_us, last_us, n, total = ts_us, ts_us, 1, float(value)
        else:
            last_us, n, total = ts_us, n + 1, total + float(value)
    state.update((start_us, last_us, n, total))
    if flush_open:
        # under EventTimeTimeout, arm the flush for gap-after-last-event
        state.setTimeoutTimestamp(last_us // 1000 + _GAP_US // 1000)
    if closed:
        out = pd.DataFrame(
            closed,
            columns=["user_id", "start_us", "end_us", "n_events", "total_value"],
        )
        yield pd.DataFrame(
            {
                "user_id": out["user_id"],
                "session_start": pd.to_datetime(out["start_us"], unit="us"),
                "session_end": pd.to_datetime(out["end_us"], unit="us"),
                "n_events": out["n_events"],
                "total_value": out["total_value"],
            }
        )


def sessionize_stateful(
    events: DataFrame, flush_open: bool = False, watermark: str = SESSION_GAP
) -> DataFrame:
    """Custom stateful-operator sessionization via
    applyInPandasWithState — the pattern for semantics the built-ins
    can't express (here: the same gap rule as ``sessionize``, but with
    arbitrary per-session logic possible in the fold). Emits CLOSED
    sessions; the open session per user stays in the state store.

    With ``flush_open=True`` an event-time timeout fires once the
    watermark passes an idle session's gap horizon: the open session
    is emitted and its state evicted — without it, a user who stops
    sending events holds state forever (the 100 TB/day leak)."""
    from functools import partial

    fn = partial(_session_fn, flush_open=flush_open)
    src = events
    timeout = GroupStateTimeout.NoTimeout
    if flush_open:
        timeout = GroupStateTimeout.EventTimeTimeout
        if events.isStreaming:
            src = events.withWatermark("ts", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def cms_sketch_stream(
    events: DataFrame,
    d: int = 4,
    w: int = 256,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming count-min sketch over ``event_type``: the mergeable
    frequency sketch maintained ONLINE — each event increments one
    (row, slot) counter per hash row, so the running state is d x w
    counters however long the stream runs (the streaming twin of
    plans.text_pipeline.doc_cms_heavyhitters; same md5-derived slots,
    so the online sketch and a batch rebuild are bit-identical).
    Update-mode output emits the changed counters per trigger; the
    sink (or a downstream union) keeps the latest value per slot.
    Works identically on batch frames."""
    from gazelle_plugin_spark.plans._util import md5h60

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    rows_arr = F.array(*[F.lit(r) for r in range(d)])
    slot = F.pmod(
        md5h60(
            F.concat(F.col("event_type"), F.lit("#"), F.col("r").cast("string"))
        ),
        F.lit(w),
    )
    return (
        src.select(F.col("event_type"), F.explode(rows_arr).alias("r"))
        .select("r", slot.alias("slot"))
        .groupBy("r", "slot")
        .count()
        .withColumnRenamed("count", "c")
    )
