"""Batch event analytics: tumbling windows and gap sessionization.

These are the batch twins of the Structured Streaming operators in
``sift_spark/streaming/events.py`` — same semantics, verifiable
against a SQL oracle; the streaming variants are exercised in tests
with an ``availableNow`` trigger.

The driver's ``events.parquet`` stores ``ts`` as ``timestamp[us]``
(plain TimestampType in Spark); :func:`epoch_seconds` also accepts an
int64-nanos long column (true TIMESTAMP_NS inputs read under
``spark.sql.legacy.parquet.nanosAsLong``), normalizing either with
integer arithmetic (a double division would lose precision above
2^53 ns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_seconds(events: DataFrame, col: str = "ts") -> Column:
    dt = dict(events.dtypes).get(col)
    if dt in ("bigint", "long"):
        return F.expr(f"{col} DIV 1000000000")
    return F.unix_timestamp(col)


def tumbling_counts(events: DataFrame, minutes: int = 5) -> DataFrame:
    """Event counts + value sums per (tumbling window, event_type).

    The window key is epoch seconds (not a timestamp) so the value is
    timezone-independent and hash-identical across engines.
    """
    secs = minutes * 60
    bucket = (epoch_seconds(events) - (epoch_seconds(events) % secs)).alias("window_start")
    return events.groupBy(bucket, F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when
    the gap since the previous event exceeds ``gap_minutes``.

    Pure window functions (lag → boundary flag → running sum), no
    UDFs; the only shuffle is the partition by user_id.
    Output: (user_id, session_id, session_start, session_end,
    n_events, sum_value) with session bounds in epoch seconds.
    """
    es = epoch_seconds(events)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = gap_minutes * 60
    flagged = events.withColumn("es", es).withColumn(
        "new_session",
        F.when(F.lag("es").over(w).isNull(), 1)
        .when(F.col("es") - F.lag("es").over(w) > gap, 1)
        .otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.min("es").alias("session_start"),
            F.max("es").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def trending(events: DataFrame, minutes: int = 60, k: int = 3) -> DataFrame:
    """Top-k trending event types per tumbling window:
    (window_start, event_type, n_events, rank).

    The rank window partitions on window_start and runs on
    post-aggregation rows (≤ #event types per window), so the only
    corpus-scale shuffle is the count aggregation itself. Streaming
    twin: rank the ``stream_tumbling_counts`` output per completed
    window (tested with an availableNow trigger)."""
    secs = minutes * 60
    es = epoch_seconds(events)
    counts = (
        events.groupBy(
            (es - (es % secs)).alias("window_start"), F.col("event_type")
        ).agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return counts.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def sliding_counts(events: DataFrame, window_minutes: int = 10,
                   slide_minutes: int = 5) -> DataFrame:
    """Sliding (hopping) window counts: each event lands in
    window/slide overlapping windows, generated map-side with
    sequence() (no self-join against a window table):
    (window_start, event_type, n_events, sum_value).

    Same single keyed shuffle as the tumbling variant — the explode
    multiplies rows by the overlap factor before the partial
    aggregate, which map-side combine collapses immediately."""
    win, slide = window_minutes * 60, slide_minutes * 60
    es = epoch_seconds(events)
    last = es - (es % slide)
    starts = F.sequence(last - win + slide, last, F.lit(slide))
    return (
        events.select(
            F.explode(starts).alias("window_start"), "event_type", "value"
        )
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def value_histogram(events: DataFrame, n_bins: int = 10,
                    lo: float = 0.0, hi: float = 100.0) -> DataFrame:
    """Fixed-bin value histogram per event type — width_bucket
    semantics (values outside [lo, hi) clamp to the edge bins):
    (event_type, bin, n_events). Map-side bin compute + one keyed
    shuffle."""
    width = (hi - lo) / n_bins
    raw = F.floor((F.col("value") - lo) / width).cast("int")
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    return (
        events.select("event_type", bin_.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def funnel_counts(events: DataFrame, steps: tuple[str, ...] = ("view", "click", "purchase")) -> DataFrame:
    """Ordered funnel completion per user: a user completes step i if
    their earliest step-i event happens strictly after their earliest
    step-(i-1) event. One shuffle (per-user min timestamps pivoted as
    conditional aggregates), then a 1-row count aggregate:
    (step, n_users)."""
    es = epoch_seconds(events)
    mins = events.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, es)).alias(f"t_{i}")
            for i, s in enumerate(steps)
        ]
    )
    completed = [F.col("t_0").isNotNull()]
    for i in range(1, len(steps)):
        completed.append(completed[i - 1] & F.col(f"t_{i}").isNotNull() & (F.col(f"t_{i}") > F.col(f"t_{i-1}")))
    aggs = [
        F.sum(c.cast("int")).alias(f"n_{i}") for i, c in enumerate(completed)
    ]
    wide = mins.agg(*aggs)
    stack_args = ", ".join(f"{i}, '{s}', n_{i}" for i, s in enumerate(steps))
    return wide.selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (step_idx, step, n_users)"
    )


def retention_cohorts(events: DataFrame, week_s: int = 604800) -> DataFrame:
    """Weekly cohort retention: (cohort_week, week_n, n_users) —
    users grouped by first-activity week, counted distinct in each
    subsequent week of activity. The product-analytics staple.

    Shape: per-user first week (one keyed agg), map-side distinct
    (user, week) pairs, join back on user_id (the natural key), then
    the count-distinct agg on (cohort, offset). Weeks are epoch-week
    integers (no timezone dependence, identical across engines)."""
    es = epoch_seconds(events)
    weeks = events.select("user_id", (es.cast("bigint") / week_s).cast("bigint").alias("week")).distinct()
    first = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(first, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_n"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def anomaly_zscore(events: DataFrame, threshold: float = 3.0) -> DataFrame:
    """Value-anomaly screen: events whose value is more than
    ``threshold`` sample-stddevs from their event_type mean —
    (event_id, event_type, value, z). The per-type moments are a
    small aggregate broadcast back onto the stream (two scans but no
    wide shuffle of the facts; at scale the moments side is k rows)."""
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    # sd = 0 (constant-value type) would THROW under ANSI mode; the
    # guard makes z NULL there — no anomalies in a constant series —
    # mirrored in the oracle
    return (
        events.join(F.broadcast(stats), "event_type")
        .withColumn(
            "z",
            F.when(
                F.col("sd") != 0,
                F.round((F.col("value") - F.col("mu")) / F.col("sd"), 6),
            ),
        )
        .where(F.abs(F.col("z")) > threshold)
        .select("event_id", "event_type", F.round("value", 2).alias("value"), "z")
    )


def mad_outliers(events: DataFrame, k: float = 3.0) -> DataFrame:
    """Robust (median/MAD) outlier profile per event type:
    (event_type, n, med, mad, n_outliers) where mad = median(|value −
    med|) and an outlier is |value − med| > k·mad. Unlike the z-score
    screen, medians don't move when the outliers themselves are
    extreme (robust to heavy tails).

    Exact medians via the built-in ``median`` aggregate; three passes
    over the stream but every shuffle keys on event_type and both
    intermediate stat tables are k-row broadcasts — the facts never
    wide-shuffle."""
    med = events.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("med").alias("med_"),
        F.median("dev").alias("mad"),
    )
    return (
        dev.join(F.broadcast(mad.select("event_type", "mad")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("dev") > k * F.col("mad"), 1).otherwise(0)).alias(
                "n_outliers"
            )
        )
        .join(mad, "event_type")
        .select(
            "event_type",
            "n",
            F.round("med_", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n_outliers",
        )
    )


def interarrival_stats(events: DataFrame, day_bucketed: bool = False) -> DataFrame:
    """Per-type event interarrival profile: (event_type, n_gaps,
    avg_gap_s, max_gap_s) from consecutive epoch-second gaps.

    The default lag window partitions by event_type — at production
    scale (few types × many events) that is the classic window-skew
    shape, so ``day_bucketed=True`` switches to the scale path:
    per-(type, day) windows compute within-day gaps (bounded by daily
    volume) and a per-day (first, last) boundary table — ONE ROW per
    type-day — supplies the cross-day gaps via a tiny second window.
    The gap multiset is identical (proven equal in tests); both paths
    are one logical pass over the events."""
    es = epoch_seconds(events)
    if day_bucketed:
        e = events.select("event_type", "event_id", es.alias("es")).withColumn(
            "day", F.floor(F.col("es") / 86400)
        )
        wd = Window.partitionBy("event_type", "day").orderBy("es", "event_id")
        within = (
            e.withColumn("gap", F.col("es") - F.lag("es").over(wd))
            .where(F.col("gap").isNotNull())
            .select("event_type", "gap")
        )
        days = e.groupBy("event_type", "day").agg(
            F.min("es").alias("first_es"), F.max("es").alias("last_es")
        )
        wb = Window.partitionBy("event_type").orderBy("day")
        boundary = (
            days.withColumn("gap", F.col("first_es") - F.lag("last_es").over(wb))
            .where(F.col("gap").isNotNull())
            .select("event_type", "gap")
        )
        g = within.unionByName(boundary)
    else:
        w = Window.partitionBy("event_type").orderBy("es", "event_id")
        g = (
            events.select("event_type", "event_id", es.alias("es"))
            .withColumn("gap", F.col("es") - F.lag("es").over(w))
            .where(F.col("gap").isNotNull())
        )
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.avg("gap"), 6).alias("avg_gap_s"),
        F.max("gap").alias("max_gap_s"),
    )


def seasonality_profile(events: DataFrame) -> DataFrame:
    """Day-of-week × event_type activity profile: (dow, event_type,
    n_events, avg_value). Epoch-day arithmetic (day 0 = Thursday, so
    dow = (epoch_day + 4) % 7 with 0 = Sunday) keeps the key integer
    and timezone-free across engines."""
    es = epoch_seconds(events)
    dow = ((es.cast("bigint") / 86400).cast("bigint") + 4) % 7
    return (
        events.select(dow.alias("dow"), "event_type", "value")
        .groupBy("dow", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.avg("value"), 6).alias("avg_value"))
    )


def user_streaks(events: DataFrame) -> DataFrame:
    """Gaps-and-islands: per-user activity-day streaks —
    (user_id, n_active_days, longest_streak). Island key = epoch_day −
    row_number over the user's distinct active days (consecutive days
    share it). One shuffle on user_id; windows partition per user on
    day-level rows (bounded by the calendar, not event volume)."""
    day = (epoch_seconds(events).cast("bigint") / 86400).cast("bigint")
    d = events.select("user_id", day.alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = d.withColumn("grp", F.col("day") - F.row_number().over(w))
    streaks = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"), F.max("len").alias("longest_streak")
    )


def user_status_history(events: DataFrame) -> DataFrame:
    """SCD2-style status history from the event stream: per user, one
    row per RUN of equal consecutive event_types —
    (user_id, status, valid_from, valid_to, n_events) with half-open
    validity [valid_from, valid_to) in epoch seconds; the current
    (last) run has valid_to NULL.

    The gaps-and-islands shape every warehouse dimension build uses:
    a lag-flag marks run starts, a running sum numbers runs, one
    aggregate per run, and a lead over runs closes each validity
    window. All windows partition by user_id — one keyed shuffle,
    per-user state bounded by that user's runs.
    """
    es = epoch_seconds(events)
    w = Window.partitionBy("user_id").orderBy(F.col("es").asc(), F.col("event_id").asc())
    prev = F.lag("status").over(w)
    flagged = events.select(
        "user_id", "event_id", F.col("event_type").alias("status"), es.alias("es")
    ).withColumn(
        "new_run",
        F.when(prev.isNull() | (prev != F.col("status")), 1).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("new_run").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    agg = runs.groupBy("user_id", "run_id").agg(
        F.first("status").alias("status"),
        F.min("es").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wr = Window.partitionBy("user_id").orderBy(F.col("run_id").asc())
    return agg.select(
        "user_id",
        "status",
        "valid_from",
        F.lead("valid_from").over(wr).alias("valid_to"),
        "n_events",
    )


def cms_heavy_hitters(events: DataFrame, width: int = 256, depth: int = 4,
                      threshold: int = 50) -> DataFrame:
    """Heavy hitters via a count-min sketch: users whose estimated
    event count >= ``threshold`` -- (user_id, est_count, true_count).

    The sketch is depth hash rows x width buckets of summed counts; a
    key's estimate is the MIN over its depth buckets (CMS
    overestimates, never underestimates -- est >= true is asserted in
    tests and visible in the output columns). The bucket hash is the
    repo's md5-derived ``hash64`` (identical in DuckDB), so the
    sketch -- approximation and all -- is bit-reproducible
    cross-engine and the operator is hash-checked against an oracle.
    The point at 100 TB: the sketch table is depth x width COUNTERS
    regardless of key cardinality, built from ONE corpus aggregate.
    Sketch[d,b] = Σ_events 1{bucket(u)=b} ≡ Σ_users count(u)·1{...} —
    exactly the same integers — so the md5 bucket hash runs per
    (DISTINCT user × depth), not per (event × depth) (~20× fewer
    hashes at sf1: 7.5s → ~2s), and the one user-count table feeds
    both the sketch and the probes (checkpointed, §6.4: the broadcast
    sequencing makes it race-free and the ContextCleaner reclaims it).
    """
    from sift_spark.functions.core import hash64

    def bucket():
        return F.pmod(
            hash64(
                F.concat(F.col("d").cast("string"), F.lit(":"),
                         F.col("user_id").cast("string"))
            ),
            F.lit(width),
        )

    ucnt = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .localCheckpoint(eager=False)
    )
    keyed = ucnt.select(
        "user_id",
        "true_count",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).select("user_id", "true_count", "d", bucket().alias("bucket"))
    sketch = keyed.groupBy("d", "bucket").agg(F.sum("true_count").alias("c"))
    est = (
        keyed.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("user_id", "true_count")
        .agg(F.min("c").alias("est_count"))
    )
    return est.where(F.col("est_count") >= threshold).select(
        "user_id", "est_count", "true_count"
    )


def attribution_counts(events: DataFrame, conversion: str = "purchase") -> DataFrame:
    """Marketing-style conversion attribution: for every ``conversion``
    event, credit the user's FIRST and LAST preceding non-conversion
    event types — (first_touch, last_touch, n_conversions).

    Pure window functions over the per-user ordered stream (the only
    shuffle is the user_id partition, then one global aggregate on the
    tiny (first,last) pair space); conversions with no preceding touch
    attribute to NULL and are kept — at corpus scale those are the
    organic conversions a report must not silently drop."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    touch = F.when(F.col("event_type") != conversion, F.col("event_type"))
    touched = events.select(
        "event_type",
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    return (
        touched.where(F.col("event_type") == conversion)
        .groupBy("first_touch", "last_touch")
        .agg(F.count(F.lit(1)).alias("n_conversions"))
    )


def ewma_values(events: DataFrame, alpha: float = 0.3, window: int = 20) -> DataFrame:
    """Trailing exponentially-weighted moving average of ``value`` per
    user: (event_id, user_id, ewma) where
    ewma = Σ_{k=0..m-1} (1-α)^k · v_{t-k} / Σ_{k} (1-α)^k over the
    last m = min(#prior+1, ``window``) events.

    The textbook recursive EWMA is sequential; the trailing-window
    form is expressible as ONE ordered window (collect_list over a
    bounded ROWS frame) plus a map-side higher-order-function fold —
    no UDFs, no iteration, and the per-row state is capped at
    ``window`` values regardless of stream length (the unbounded
    closed form needs (1-α)^(-rownum), which overflows doubles)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(window - 1), 0)
    )
    decay = 1.0 - alpha
    arr = F.collect_list("value").over(w)
    sized = events.select("event_id", "user_id", arr.alias("arr")).withColumn(
        "m", F.size("arr")
    )
    # index j (1-based) in the frame: weight (1-α)^(m-j); the last
    # element (current row) gets weight 1
    weighted = F.zip_with(
        "arr",
        F.sequence(F.lit(1), F.col("m")),
        lambda v, j: v * F.pow(F.lit(decay), F.col("m") - j),
    )
    num = F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)
    den = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.col("m")),
            lambda j: F.pow(F.lit(decay), F.col("m") - j),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return sized.select(
        "event_id", "user_id", F.round(num / den, 6).alias("ewma")
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session summary over gap-based sessions:
    (user_id, n_sessions, n_bounce, avg_session_s, avg_events) where
    a bounce is a single-event session and avg_session_s averages
    (session_end - session_start) in seconds.

    Composes ``sessionize`` (one keyed shuffle) with a per-user
    aggregate on the already-user-keyed session table — AQE keeps the
    second aggregate on the same partitioning, so no extra shuffle at
    scale."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias("n_bounce"),
        F.round(F.avg(F.col("session_end") - F.col("session_start")), 6).alias(
            "avg_session_s"
        ),
        F.round(F.avg("n_events"), 6).alias("avg_events"),
    )


def window_uniques(events: DataFrame, minutes: int = 60,
                   approx: bool = False, rsd: float = 0.05) -> DataFrame:
    """Distinct active users per (tumbling window, event_type):
    (window_start, event_type, n_users). Exact distinct (the
    oracle-checked default) shuffles on (window, type, user) then
    counts; ``approx=True`` switches to ``approx_count_distinct``
    (HLL++): one sketch-mergeable aggregate, no expanded shuffle —
    the scale path for very hot windows, accurate to ``rsd``
    (unit-tested within tolerance against exact)."""
    secs = minutes * 60
    bucket = (epoch_seconds(events) - (epoch_seconds(events) % secs)).alias(
        "window_start"
    )
    agg = (
        F.approx_count_distinct("user_id", rsd)
        if approx
        else F.countDistinct("user_id")
    )
    return events.groupBy(bucket, F.col("event_type")).agg(agg.alias("n_users"))


def changepoint_cusum(events: DataFrame, bucket_s: int = 3600, k: float = 0.5,
                      h: float = 4.0) -> DataFrame:
    """Two-sided CUSUM level-shift detection (Page 1954) on the
    per-type event-rate series: bucket counts per (event_type,
    ``bucket_s`` window), standardize against the type's own
    mean/stddev, then accumulate drift beyond the slack ``k`` and
    flag buckets where either side exceeds the decision threshold
    ``h``. Output: (event_type, window_start, n, cusum_pos,
    cusum_neg, is_change), one row per bucket.

    The textbook recursion s_t = max(0, s_{t-1} + x_t) looks
    sequential, but has the prefix closed form
    s_t = S_t − min(0, min_{j≤t} S_j) with S the running sum of x —
    so both sides are TWO ordered windows (cumulative sum + cumulative
    min of it), no UDF, no iteration. The only shuffle is the
    bucket aggregate + the per-type window partition; per-type series
    are bounded by time range / bucket_s, never by corpus size, and
    the two stat tables ride in as k-row broadcasts."""
    es = epoch_seconds(events)
    counts = events.groupBy(
        F.col("event_type"), (es - es % bucket_s).alias("window_start")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = counts.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sd")
    )
    # a constant series has sd = 0: ANSI mode (Spark 4 default) makes
    # the division THROW mid-job, so guard explicitly — z (and the
    # cusum columns) become NULL for that type in both engines
    z = counts.join(F.broadcast(stats), "event_type").withColumn(
        "z",
        F.when(F.col("sd") != 0, (F.col("n") - F.col("mu")) / F.col("sd")),
    )
    w = Window.partitionBy("event_type").orderBy("window_start")
    pre = z.select(
        "event_type", "window_start", "n",
        F.sum(F.col("z") - k).over(w).alias("sp"),
        F.sum(-F.col("z") - k).over(w).alias("sn"),
    )
    cp = F.col("sp") - F.least(F.lit(0.0), F.min("sp").over(w))
    cn = F.col("sn") - F.least(F.lit(0.0), F.min("sn").over(w))
    return pre.select(
        "event_type", "window_start", "n",
        F.round(cp, 6).alias("cusum_pos"),
        F.round(cn, 6).alias("cusum_neg"),
        F.when((cp > h) | (cn > h), 1).otherwise(0).cast("int").alias("is_change"),
    )


def seasonal_forecast(events: DataFrame, bucket_s: int = 86400,
                      season_s: int = 604800) -> DataFrame:
    """Seasonal-naive forecast + accuracy per event type: each
    bucket's count is forecast by the count one season earlier
    (forecast_t = n_{t-season}), the baseline every real forecasting
    pipeline must beat before anything fancier ships. Output:
    (event_type, window_start, n, forecast_n, abs_err, ape) for every
    bucket with a same-season predecessor; ape = |n - f| / n rounded.

    The shifted series comes from a keyed equi-join of the bucket
    table to itself on (event_type, window_start - season) — buckets
    missing on either side drop out deterministically (a lag window
    over EXISTING rows would silently mis-shift across gaps). Both
    tables are the same one aggregate; per-type-per-bucket rows are
    time-bounded, never corpus-bounded."""
    es = epoch_seconds(events)
    counts = events.groupBy(
        F.col("event_type"), (es - es % bucket_s).alias("window_start")
    ).agg(F.count(F.lit(1)).alias("n"))
    prev = counts.select(
        "event_type",
        (F.col("window_start") + season_s).alias("window_start"),
        F.col("n").alias("forecast_n"),
    )
    return counts.join(prev, ["event_type", "window_start"]).select(
        "event_type",
        "window_start",
        "n",
        "forecast_n",
        F.abs(F.col("n") - F.col("forecast_n")).alias("abs_err"),
        F.round(F.abs(F.col("n") - F.col("forecast_n")) / F.col("n"), 6).alias("ape"),
    )


def user_type_entropy(events: DataFrame) -> DataFrame:
    """Behavioral diversity per user: Shannon entropy (nats) of the
    user's event-type distribution — the classic bot/spam screen
    (single-action accounts score 0, organic users approach
    ln(n_types)): (user_id, n_events, n_types, entropy).

    Two aggregates, both keyed on the user (the second rides the
    first's partitioning): per-(user, type) counts, then the
    entropy fold Σ -p·ln(p) per user. Pure built-in expressions."""
    per = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per.groupBy("user_id")
        .agg(
            F.sum("c").alias("n_events"),
            F.count(F.lit(1)).alias("n_types"),
            (-F.sum(F.col("c") * F.log(F.col("c")))).alias("part"),
        )
        .select(
            "user_id",
            "n_events",
            "n_types",
            F.round(
                F.col("part") / F.col("n_events") + F.log(F.col("n_events")), 6
            ).alias("entropy"),
        )
    )


def decayed_counts(events: DataFrame, half_life_hours: float = 24.0) -> DataFrame:
    """Time-decayed engagement features per (user, event_type) — the
    standard recency-weighted counter of ranking/feature pipelines:
    decayed_count = sum over events of 0.5^((T - t) / half_life), with
    T the corpus max timestamp (one 1-row broadcast), plus the raw
    count and seconds-since-last-seen. Recent activity dominates; a
    burst a month ago fades by construction.

    Shape: one scalar max aggregate broadcast via crossJoin, then ONE
    (user, event_type)-keyed aggregate over a row-wise decay term —
    map-side combinable, no window. Output (user_id, event_type,
    n_events, decayed_count, last_seen_secs)."""
    es = epoch_seconds(events)
    t_max = events.agg(F.max(es).alias("t_max"))
    half = half_life_hours * 3600.0
    return (
        events.select("user_id", "event_type", es.alias("t"))
        .crossJoin(F.broadcast(t_max))
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.pow(F.lit(0.5), (F.col("t_max") - F.col("t")) / F.lit(half))),
                6,
            ).alias("decayed_count"),
            F.max("t").alias("t_last"),
        )
        .crossJoin(F.broadcast(t_max.select(F.col("t_max").alias("tm2"))))
        .select(
            "user_id",
            "event_type",
            "n_events",
            "decayed_count",
            (F.col("tm2") - F.col("t_last")).alias("last_seen_secs"),
        )
    )


def event_transitions(events: DataFrame, min_count: int = 2) -> DataFrame:
    """Per-user behavioral Markov chain: consecutive event-type
    transition counts and row-normalized probabilities over the whole
    population — the behavior model behind next-action prediction and
    bot screens (self-loops kept; they ARE signal). Output
    (from_type, to_type, n, p) with p = n / sum_n(from_type),
    transitions with n < ``min_count`` dropped AFTER normalization
    (so p still sums to 1 over the full row).

    Shape: one user-keyed ordered lag window (each user's history
    sorts within its partition), then a (from,to)-keyed count — both
    map-side-combinable after the window shuffle. Row normalization is
    a partition window over the k²-row transition matrix, NOT a
    re-aggregate + join back: referencing the counted frame twice made
    the whole lag-window pipeline compute twice (no exchange reuse —
    the two consumers aggregate differently; measured 0.67→1.47s at
    sf0.1 when a broadcast join was introduced here in round 5)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        epoch_seconds(events).asc(), F.col("event_id").asc()
    )
    tr = (
        events.select(
            "user_id",
            "event_id",
            F.col("event_type").alias("to_type"),
            F.lag("event_type").over(w).alias("from_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        tr.select(
            "from_type",
            "to_type",
            "n",
            F.round(
                F.col("n") / F.sum("n").over(Window.partitionBy("from_type")), 6
            ).alias("p"),
        )
        .where(F.col("n") >= min_count)
    )
