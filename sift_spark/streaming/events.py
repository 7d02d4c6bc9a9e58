"""Structured Streaming operators over the events stream.

Streaming twins of ``sift_spark.operators.events``: same semantics,
expressed as an unbounded plan. Tests run them with
``Trigger.AvailableNow`` over the parquet corpus and assert equality
with the batch operators; in production the same code points at a
file/Kafka source and runs continuously with watermarked state.

- tumbling: window() aggregate + watermark (late events beyond 10
  minutes are dropped deterministically).
- sessionization: ``applyInPandasWithState`` keyed by user_id — the
  canonical custom-stateful-operator pattern (timeout-driven session
  close), since gap sessions aren't expressible as a fixed window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),  # parquet timestamp[us]
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of event rows with a proper timestamp col.

    ``events.parquet`` stores ``ts`` as ``timestamp[us]``; streaming
    schemas must be declared upfront, so we declare TimestampType
    (the batch twin ``operators/events.py:epoch_seconds`` type-detects
    instead, which a bounded read can afford).
    """
    raw = spark.readStream.schema(EVENT_SCHEMA).parquet(path)
    return raw.withColumn("ts_ts", F.col("ts"))


def stream_tumbling_counts(events: DataFrame, minutes: int = 5,
                           watermark: str = "10 minutes") -> DataFrame:
    """Windowed counts with late-data watermark; same output columns
    as the batch twin (window_start as epoch seconds)."""
    return (
        events.withWatermark("ts_ts", watermark)
        .groupBy(F.window("ts_ts", f"{minutes} minutes"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SESSION_STATE = T.StructType(
    [
        T.StructField("session_id", T.LongType()),
        T.StructField("start_s", T.LongType()),
        T.StructField("last_s", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("session_start", T.LongType()),
        T.StructField("session_end", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def stream_sessionize(events: DataFrame, gap_minutes: int = 30,
                      state_timeout_ms: int | None = None) -> DataFrame:
    """Stateful gap sessionization via ``applyInPandasWithState``.

    State per user: the open session. Batches advance it event by
    event (events within a micro-batch are sorted by time); a gap >
    ``gap_minutes`` closes and emits the open session.

    ``state_timeout_ms`` (production knob): with a processing-time
    timeout, idle users' open sessions are flushed after the timeout.
    Leave ``None`` for bounded drains (Trigger.AvailableNow) — a
    pending timeout makes the scheduler keep running empty batches,
    so an AvailableNow run would never terminate.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = gap_minutes * 60
    use_timeout = state_timeout_ms is not None

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                sid, start_s, last_s, n, sv = state.get
                state.remove()
                yield pd.DataFrame(
                    [
                        {
                            "user_id": user_id,
                            "session_id": sid,
                            "session_start": start_s,
                            "session_end": last_s,
                            "n_events": n,
                            "sum_value": round(sv, 2),
                        }
                    ]
                )
            return

        rows = pd.concat(list(pdfs))
        if len(rows) == 0:
            return
        rows = rows.sort_values(["es", "event_id"])
        if state.exists:
            sid, start_s, last_s, n, sv = state.get
        else:
            sid, start_s, last_s, n, sv = 0, None, None, 0, 0.0
        closed = []
        for es, val in zip(rows["es"], rows["value"]):
            es = int(es)
            if start_s is None:
                sid, start_s, last_s, n, sv = sid + 1, es, es, 1, float(val)
            elif es - last_s > gap_s:
                closed.append((user_id, sid, start_s, last_s, n, round(sv, 2)))
                sid, start_s, last_s, n, sv = sid + 1, es, es, 1, float(val)
            else:
                last_s, n, sv = es, n + 1, sv + float(val)
        state.update((sid, start_s, last_s, n, sv))
        if use_timeout:
            state.setTimeoutDuration(state_timeout_ms)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_id", "session_start", "session_end", "n_events", "sum_value"],
            )

    keyed = events.select(
        "user_id", "event_id", "value", F.unix_timestamp("ts_ts").alias("es")
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout if use_timeout else GroupStateTimeout.NoTimeout
        ),
    )


def stream_interval_join(clicks: DataFrame, errors: DataFrame,
                         max_lag_minutes: int = 30,
                         watermark: str = "30 minutes") -> DataFrame:
    """Stream-stream inner join: each click matched to that user's
    errors in the preceding ``max_lag_minutes``.

    The canonical watermarked stream-stream join: both sides are
    watermarked, and the join condition bounds event-time distance so
    Spark can evict buffered rows once the watermark passes —
    without the range bound, state grows forever. Output:
    (user_id, click_id, error_id, lag_s).
    """
    c = clicks.withWatermark("ts_ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts_ts").alias("click_ts"),
    )
    e = errors.withWatermark("ts_ts", watermark).select(
        F.col("user_id").alias("e_user"),
        F.col("event_id").alias("error_id"),
        F.col("ts_ts").alias("error_ts"),
    )
    cond = (
        (F.col("c_user") == F.col("e_user"))
        & (F.col("error_ts") <= F.col("click_ts"))
        & (F.col("error_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {max_lag_minutes} MINUTES"))
    )
    return c.join(e, cond).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "error_id",
        (F.unix_timestamp("click_ts") - F.unix_timestamp("error_ts")).alias("lag_s"),
    )


def stream_dedup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact-dedup on event_id with watermarked state —
    duplicate deliveries (at-least-once sources) are dropped; state
    for ids older than the watermark is evicted."""
    return events.withWatermark("ts_ts", watermark).dropDuplicates(["event_id"])


def run_available_now(stream_df: DataFrame, query_name: str, output_mode: str = "update") -> DataFrame:
    """Drain the stream with Trigger.AvailableNow into a memory sink
    and return the materialized result (test/driver helper)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def rank_trending(counts: DataFrame, k: int = 3) -> DataFrame:
    """Rank completed windowed counts into top-k trending event types
    — applied at the sink (foreachBatch / post-trigger), where every
    window in the micro-batch output is final under the watermark."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return counts.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def stream_upsert_parquet(stream_df: DataFrame, path: str, key_cols: list[str],
                          version_col: str, query_name: str = "stream_upsert"):
    """Continuously MERGE a stream into a standing parquet table:
    each micro-batch upserts by key via foreachBatch (the production
    pattern for maintaining a serving table from a stream — the batch
    inside foreachBatch is a plain DataFrame, so the partition-pruned
    merge applies unchanged). Exactly-once per key comes from the
    version column: replayed batches rewrite the same winning rows.
    Returns the started StreamingQuery (caller awaits/stops)."""
    from sift_spark.sinks.upsert import upsert_parquet

    def merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_parquet(batch_df, path, key_cols, version_col)

    return (
        stream_df.writeStream.foreachBatch(merge_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_session_window_counts(events: DataFrame, gap_minutes: int = 30,
                                 watermark: str = "30 minutes") -> DataFrame:
    """Gap sessionization via the BUILT-IN ``session_window`` — the
    declarative alternative to ``stream_sessionize``'s custom state:
    Spark manages session state/merging/expiry natively, which is the
    preferred scale path (state store handles skew and recovery; no
    Python state round-trip). Output sessions bound
    [first event, last event + gap) — the batch twin's session_end is
    last event, so end_stream = end_batch + gap."""
    return (
        events.withWatermark("ts_ts", watermark)
        .groupBy(F.session_window("ts_ts", f"{gap_minutes} minutes"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("session_start"),
            F.unix_timestamp(F.col("session_window.end")).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


ATTR_STATE = T.StructType(
    [
        T.StructField("first_touch", T.StringType()),
        T.StructField("last_touch", T.StringType()),
    ]
)

ATTR_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("first_touch", T.StringType()),
        T.StructField("last_touch", T.StringType()),
    ]
)


def stream_attribution(events: DataFrame, conversion: str = "purchase") -> DataFrame:
    """Streaming twin of ``operators.events.attribution_counts``:
    emits one row per ``conversion`` event carrying the user's first
    and last preceding non-conversion touch — the per-conversion log a
    marketing pipeline appends continuously; the batch operator's
    (first,last) counts are one aggregate over this output.

    State per user is exactly TWO strings (first/last touch so far) —
    constant per key regardless of stream length, the cheapest
    possible ``applyInPandasWithState`` shape."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        rows = pd.concat(list(pdfs))
        if len(rows) == 0:
            return
        rows = rows.sort_values(["es", "event_id"])
        first_t, last_t = state.get if state.exists else (None, None)
        out = []
        for eid, etype in zip(rows["event_id"], rows["event_type"]):
            if etype == conversion:
                out.append((user_id, int(eid), first_t, last_t))
            else:
                if first_t is None:
                    first_t = etype
                last_t = etype
        state.update((first_t, last_t))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "first_touch", "last_touch"]
            )

    keyed = events.select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts_ts").alias("es")
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=ATTR_OUT,
        stateStructType=ATTR_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_STATE = T.StructType(
    [
        T.StructField("cur_bucket", T.LongType()),
        T.StructField("cur_n", T.LongType()),
        T.StructField("sp", T.DoubleType()),
        T.StructField("sn", T.DoubleType()),
    ]
)

CUSUM_OUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("window_start", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("cusum_pos", T.DoubleType()),
        T.StructField("cusum_neg", T.DoubleType()),
        T.StructField("is_change", T.IntegerType()),
    ]
)


def stream_changepoint(events: DataFrame, ref_stats: dict,
                       bucket_s: int = 3600, k: float = 0.5,
                       h: float = 4.0) -> DataFrame:
    """Streaming twin of ``operators.events.changepoint_cusum``:
    per-type CUSUM over bucketed event rates, maintained as the
    textbook recursion s ← max(0, s + x) in
    ``applyInPandasWithState`` keyed by event_type — which is exactly
    the form a stream CAN run (the batch twin had to re-express it as
    a prefix closed form; the stream just carries s).

    ``ref_stats`` maps event_type → (mu, sd) reference bucket-rate
    statistics, computed offline from history (a live stream cannot
    standardize against the full-series mean the batch operator uses
    — passing batch-computed stats makes the two outputs exactly
    equal, which the test exploits).

    State per type is four scalars (open bucket, its count, two CUSUM
    sides); a bucket is emitted when a later bucket's first event
    arrives, so the stream stays one row per closed bucket regardless
    of event volume. Buckets must arrive in order per type (true for
    an event-time-ordered source; out-of-order buckets within a
    micro-batch are sorted before folding)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (etype,) = key
        rows = pd.concat(list(pdfs))
        if len(rows) == 0:
            return
        mu, sd = ref_stats.get(etype, (None, None))
        if mu is None:
            return
        counts = (
            rows.assign(b=(rows["es"] - rows["es"] % bucket_s))
            .groupby("b")["es"].count().sort_index()
        )
        if state.exists:
            cur_b, cur_n, sp, sn = state.get
        else:
            cur_b, cur_n, sp, sn = None, 0, 0.0, 0.0
        out = []
        for b, n in counts.items():
            if cur_b is None:
                cur_b, cur_n = int(b), 0
            if int(b) != cur_b:
                z = (cur_n - mu) / sd
                sp = max(0.0, sp + z - k)
                sn = max(0.0, sn - z - k)
                out.append((etype, cur_b, cur_n, round(sp, 6), round(sn, 6),
                            int(sp > h or sn > h)))
                cur_b, cur_n = int(b), 0
            cur_n += int(n)
        state.update((cur_b, cur_n, sp, sn))
        if out:
            yield pd.DataFrame(
                out,
                columns=["event_type", "window_start", "n",
                         "cusum_pos", "cusum_neg", "is_change"],
            )

    keyed = events.select("event_type", F.unix_timestamp("ts_ts").alias("es"))
    return keyed.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=CUSUM_OUT,
        stateStructType=CUSUM_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_decayed_counts(events: DataFrame, half_life_hours: float = 24.0) -> DataFrame:
    """Streaming twin of ``operators.events.decayed_counts``: the
    half-life counter maintained incrementally per (user_id,
    event_type) in ``applyInPandasWithState`` — the form a stream CAN
    run (the batch twin anchors decay at the corpus max timestamp; a
    live stream anchors at each key's LAST event and lets the reader
    decay forward: batch_value = emitted_value · 0.5^((T − last_t)/h),
    which the test exploits for exact equality).

    State per key is three scalars (decayed value at last_t, last_t,
    n_events); each micro-batch folds its events in timestamp order
    and emits ONE row per touched key: (user_id, event_type,
    n_events, decayed_at_last, last_t)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    half = half_life_hours * 3600.0

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        user_id, etype = key
        rows = pd.concat(list(pdfs))
        if len(rows) == 0:
            return
        ts = sorted(int(v) for v in rows["es"])
        if state.exists:
            val, last_t, n = state.get
        else:
            val, last_t, n = 0.0, None, 0
        for t in ts:
            if last_t is None:
                val = 1.0
            else:
                val = val * (0.5 ** ((t - last_t) / half)) + 1.0
            last_t = t
            n += 1
        state.update((float(val), int(last_t), int(n)))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "event_type": [etype],
                "n_events": [n],
                "decayed_at_last": [round(val, 6)],
                "last_t": [last_t],
            }
        )

    keyed = events.select(
        "user_id", "event_type", F.unix_timestamp("ts_ts").alias("es")
    )
    return keyed.groupBy("user_id", "event_type").applyInPandasWithState(
        fn,
        outputStructType="user_id long, event_type string, n_events long, "
        "decayed_at_last double, last_t long",
        stateStructType="val double, last_t long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
