"""Core relational/OLAP queries over the TPC-H-shaped test corpus.

These exist to prove the engine's general analytics surface (the
reference is a pipeline toolkit on the same Spark substrate; any user
of it also runs plain aggregations/joins). Shapes follow TPC-H Q1/Q3/
Q5 adapted to the driver's schema subset.

Scale posture: dimension tables (region/nation/supplier/customer/part)
are broadcast — Catalyst does this automatically under the 64 MB
threshold; fact-fact joins (lineitem ⋈ orders) shuffle on the join key
which is also their natural partition key. AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sift_spark.operators.scale import quantile_exact_limit


def _global_topk(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Global top-k with a rank column, planned as TakeOrderedAndProject
    (per-partition top-k + one k·P-row merge on the driver-side sort)
    rather than a single-partition row_number window over every
    candidate row. The row_number runs AFTER the limit, over k rows
    only, so the single-partition window is bounded by k regardless of
    input size. `order` must be a total ordering (tie-break on a key)
    so rank assignment is deterministic cross-engine."""
    topk = df.orderBy(*order).limit(k)
    return topk.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


def q1_pricing_summary(lineitem: DataFrame, ship_before: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1: pricing summary report by returnflag/linestatus."""
    return (
        lineitem.where(F.col("l_shipdate") <= ship_before)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                         segment: str = "BUILDING", cutoff: str = "1995-03-15",
                         limit: int = 10) -> DataFrame:
    """TPC-H Q3: top unshipped orders by revenue for a market segment."""
    revenue = F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    df = (
        lineitem.where(F.col("l_shipdate") > cutoff)
        .join(orders.where(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            # no forced broadcast: customer grows with SF; Catalyst/AQE
            # broadcasts when it actually fits under the threshold
            customer.where(F.col("c_mktsegment") == segment),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue)
    )
    # deterministic top-n: order by revenue desc, then orderkey
    return df.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc()).limit(limit)


def q5_local_supplier_volume(region: DataFrame, nation: DataFrame, customer: DataFrame,
                             supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
                             region_name: str = "ASIA",
                             date_from: str = "1996-01-01", date_to: str = "1997-01-01") -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier
    share the nation. All dims broadcast; single fact shuffle."""
    dims = (
        F.broadcast(
            nation.join(region.where(F.col("r_name") == region_name),
                        F.col("n_regionkey") == F.col("r_regionkey"))
        )
    )
    df = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where((F.col("o_orderdate") >= date_from) & (F.col("o_orderdate") < date_to))
        # supplier/customer grow with SF — leave broadcast to AQE
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(dims, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    return df


def q4_order_priority(orders: DataFrame, lineitem: DataFrame,
                      date_from: str = "1996-07-01", date_to: str = "1996-10-01") -> DataFrame:
    """TPC-H Q4 shape: order counts by priority for orders with at
    least one line shipped after the order date.

    The EXISTS collapses to a per-order MAX before the join:
    ∃ line with l_shipdate > o_orderdate ⟺ max(l_shipdate) >
    o_orderdate — and max is map-side-combinable, so the lineitem
    shuffle carries one row per ORDER (4× fewer at TPC-H line
    fan-out) instead of every line. A direct left-semi must shuffle
    the full line table (measured 3.1s vs 0.8s at sf1). The
    date-windowed orders side is small after its filter, so AQE
    typically broadcasts it at runtime — but correctness never
    assumes it fits (the window grows with the corpus).
    sf1: 3.1s → 1.8s warm."""
    li_max = lineitem.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("max_ship"))
    return (
        orders.where((F.col("o_orderdate") >= date_from) & (F.col("o_orderdate") < date_to))
        .join(li_max, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("max_ship") > F.col("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """NOT EXISTS → left-anti join; counts by market segment."""
    return (
        customer.join(orders.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def revenue_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP (year, quarter) revenue totals; null grouping levels
    surfaced as -1 so the output is stable across engines."""
    base = orders.select(
        F.year("o_orderdate").alias("o_year"),
        F.quarter("o_orderdate").alias("o_quarter"),
        "o_totalprice",
    )
    return (
        base.rollup("o_year", "o_quarter")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce(F.col("o_year"), F.lit(-1)).alias("o_year"),
            F.coalesce(F.col("o_quarter"), F.lit(-1)).alias("o_quarter"),
            "revenue",
            "n_orders",
        )
    )


def order_status_pivot(orders: DataFrame, statuses: tuple[str, ...] = ("O", "F", "P")) -> DataFrame:
    """Pivot: order counts per priority × status (fixed pivot values —
    at scale an explicit value list avoids the extra distinct pass)."""
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(statuses))
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s.lower()}") for s in statuses],
        )
    )


def price_percentiles(part: DataFrame) -> DataFrame:
    """Exact interpolated percentiles of retail price per part brand
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``)."""
    return part.groupBy("p_brand").agg(
        F.round(F.percentile("p_retailprice", 0.25), 6).alias("p25"),
        F.round(F.percentile("p_retailprice", 0.5), 6).alias("p50"),
        F.round(F.percentile("p_retailprice", 0.75), 6).alias("p75"),
        F.count(F.lit(1)).alias("n_parts"),
    )


def events_json_buckets(events: DataFrame) -> DataFrame:
    """JSON extraction from the ``props`` column: bucket by
    ``props.k % 10``, count + sum(value).

    The parse stays REAL JSON — Spark 4's VARIANT path
    (parse_json → variant_get: binary-JSON parse once, typed field
    extraction; measured 1.6× over get_json_object, same null/type
    semantics as the oracle's json_extract_string. A regexp
    substitute measured 5× but silently changes semantics on
    nested/escaped input — rejected). The scale note is parallelism:
    JSON parse is an expensive per-row map, and a compact parquet
    file splits into far fewer tasks than cores (sf1: 3 tasks on 32
    cores — the whole 5.2s wall was 3-way parse). Repartition the
    NARROW projection first when the scan under-splits; at real
    scale the table has plenty of splits and the repartition is
    skipped."""
    src = events.select("props", "value")
    par = events.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par // 2:
        src = src.repartition(par)
    k = F.variant_get(F.parse_json("props"), "$.k", "long")
    return (
        src.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def events_running(events: DataFrame) -> DataFrame:
    """Per-user running aggregates: cumulative value sum + 3-row
    moving average, ordered by time (window surface)."""
    from sift_spark.operators.events import epoch_seconds

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        epoch_seconds(events).alias("es"),
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias("cum_value"),
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 6).alias("mov_avg3"),
    )


def clicks_last_error_asof(events: DataFrame) -> DataFrame:
    """As-of join demo on the event stream: for every click, the
    epoch-seconds of that user's most recent error at or before it."""
    from sift_spark.operators.asof import asof_join
    from sift_spark.operators.events import epoch_seconds

    es = epoch_seconds(events)
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "event_id", es.alias("click_es")
    )
    errors = events.where(F.col("event_type") == "error").select(
        "user_id", es.alias("error_es")
    )
    return asof_join(
        clicks, errors, partition_col="user_id", left_ts="click_es",
        right_ts="error_es", value_cols=["error_es"], suffix="",
    ).select("user_id", "event_id", "click_es", F.col("error_es").alias("last_error_es"))


def clicks_errors_interval(events: DataFrame, max_lag_minutes: int = 30) -> DataFrame:
    """Interval (range) join: every (click, error) pair for the same
    user with the error in the ``max_lag_minutes`` before the click.

    Batch twin of :func:`sift_spark.streaming.events.
    stream_interval_join` — equi-join on user_id carries the shuffle;
    the range predicate is a post-join filter, so per-key cost is
    bounded by that user's event count (no cross join)."""
    from sift_spark.operators.events import epoch_seconds

    es = epoch_seconds(events)
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), es.alias("click_es")
    )
    errors = events.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("event_id").alias("error_id"), es.alias("error_es")
    )
    lag = max_lag_minutes * 60
    return (
        clicks.join(
            errors,
            (F.col("user_id") == F.col("e_user"))
            & (F.col("error_es") <= F.col("click_es"))
            & (F.col("error_es") >= F.col("click_es") - lag),
        )
        .select(
            "user_id",
            "click_id",
            "error_id",
            (F.col("click_es") - F.col("error_es")).alias("lag_s"),
        )
    )


def top_customers_per_segment(customer: DataFrame, orders: DataFrame, k: int = 5) -> DataFrame:
    """Top-k customers by total order value within each market segment
    (window/rank surface). Deterministic: ties broken by custkey."""
    totals = (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
             F.count(F.lit(1)).alias("n_orders"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("total_spend").desc(), F.col("c_custkey").asc())
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("c_mktsegment", "rank", "c_custkey", "c_name", "total_spend", "n_orders")
    )


def q7_volume_shipping(nation: DataFrame, customer: DataFrame, supplier: DataFrame,
                       orders: DataFrame, lineitem: DataFrame,
                       nation_a: str = "NATION_1", nation_b: str = "NATION_2") -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations
    by ship year. The nation dim is broadcast twice (supplier-side and
    customer-side roles); the cross-nation predicate filters after the
    keyed fact joins, so the fact side shuffles once per join key and
    never on the filter."""
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .where(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def q10_returned_items(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                       nation: DataFrame, k: int = 20) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returned
    items. Returned-lines filter pushes to the lineitem scan; nation
    broadcast; final top-k via orderBy+limit (TakeOrderedAndProject) —
    post-agg rows are one per customer, which still scales with the
    data, so no global row_number window over them."""
    rev = (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    return _global_topk(rev, [F.col("revenue").desc(), F.col("c_custkey").asc()], k)


def orders_cube(orders: DataFrame) -> DataFrame:
    """CUBE (year, priority) order totals — all four grouping levels
    in one pass; null grouping keys surfaced as -1/'ALL' so the output
    is stable across engines."""
    base = orders.select(
        F.year("o_orderdate").alias("o_year"),
        F.col("o_orderpriority").alias("prio"),
        "o_totalprice",
    )
    return (
        base.cube("o_year", "prio")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce(F.col("o_year"), F.lit(-1)).alias("o_year"),
            F.coalesce(F.col("prio"), F.lit("ALL")).alias("prio"),
            "revenue",
            "n_orders",
        )
    )


def q6_forecast_revenue(lineitem: DataFrame, date_from: str = "1996-01-01",
                        date_to: str = "1997-01-01",
                        disc_lo: float = 0.02, disc_hi: float = 0.06,
                        max_qty: int = 25) -> DataFrame:
    """TPC-H Q6 shape: revenue delta from a discount band — a pure
    scan-side query; every predicate pushes to the parquet reader and
    the whole plan is one map + one scalar aggregate (no shuffle
    beyond the final single-row combine)."""
    return (
        lineitem.where(
            (F.col("l_shipdate") >= date_from) & (F.col("l_shipdate") < date_to)
            & (F.col("l_discount") >= disc_lo) & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def parts_above_brand_avg(part: DataFrame) -> DataFrame:
    """Correlated-scalar-subquery shape (parts priced above their
    brand's average), decorrelated as a window average — one shuffle
    on brand, no self-join, no subquery re-scan."""
    w = Window.partitionBy("p_brand")
    return (
        part.withColumn("brand_avg", F.avg("p_retailprice").over(w))
        .where(F.col("p_retailprice") > F.col("brand_avg"))
        .select(
            "p_partkey", "p_brand",
            F.round("p_retailprice", 2).alias("p_retailprice"),
            F.round("brand_avg", 6).alias("brand_avg"),
        )
    )


def daily_revenue_spine(orders: DataFrame) -> DataFrame:
    """Zero-filled daily revenue over a generated date spine
    (sequence() between min and max order date) — gap-fill without a
    calendar table. The spine generates from a 1-row aggregate
    (driver-size), so the only real shuffle is the per-day revenue
    aggregation."""
    days = (
        orders.agg(
            F.min(F.to_date("o_orderdate")).alias("d0"),
            F.max(F.to_date("o_orderdate")).alias("d1"),
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        days.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
    )


def lineitem_stats(lineitem: DataFrame) -> DataFrame:
    """Per-returnflag statistical profile: Pearson correlation,
    covariance, and stddev across quantity/price — one pass, all
    moments from the same partial aggregates (Catalyst shares the
    shuffle)."""
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def fuzzy_name_pairs(customer: DataFrame, max_dist: int = 1) -> DataFrame:
    """Blocked fuzzy self-match on customer names via masked-position
    (wildcard) keys: each name emits one variant per character
    position with that character masked; two equal-length names
    within Hamming distance 1 share exactly the variant masking the
    differing position, and — crucially — every bucket contains only
    names identical everywhere else, so candidate generation IS the
    match set (no quadratic bucket). Half-split blocking was measured
    pathological here: names share a long constant prefix, so one
    half-key collapsed to a single corpus-wide bucket (quadratic
    candidates — the classic low-entropy-block skew trap). Exact
    levenshtein verifies. For general insert/delete edits extend the
    key set with deletion variants. Output (k1, k2, dist).

    ``max_dist`` is capped at 1: single-position masking only
    generates Hamming≤1 candidates, and the distance column is
    derived from that blocking invariant (dist = n1 != n2), so a
    larger radius would need more masked positions per variant, not
    just a looser filter — requesting one raises rather than
    silently returning the radius-1 pairs."""
    if not 0 <= max_dist <= 1:
        raise ValueError(
            "fuzzy_name_pairs masks one position per variant, which "
            f"generates Hamming<=1 candidates only; max_dist={max_dist} "
            "requires k-position masking (extend the variant set)"
        )
    c = customer.select("c_custkey", "c_name")
    # per-row cost here is O(len²) variant building across len masked
    # positions — expensive map work, and a compact dimension file
    # splits into fewer tasks than cores (sf1: ONE 5 MB parquet split
    # carried the whole explode on one core — measured 25s of a 27s
    # wall). Repartition the 2-column projection first when the scan
    # under-splits; at real scale the table has plenty of splits and
    # this is skipped.
    par = customer.sparkSession.sparkContext.defaultParallelism
    if c.rdd.getNumPartitions() < par // 2:
        c = c.repartition(par)
    # bucket key = the masked variant STRING itself (exactly the
    # oracle's key): equal keys force equal lengths AND an identical
    # mask position AND identical characters everywhere else, so
    # bucket membership IS the Hamming≤1 invariant — no hash to
    # insure against, no pair-level re-verify (the r7 profile showed
    # the substring re-verify cost 3.5s of a 6.4s sf1 wall under the
    # earlier hash-keyed form). The full name never shuffles either:
    # each variant carries only (custkey, char-at-p), and a pair's
    # edit distance is exactly (char1 != char2). Pairs are generated
    # LOCALLY inside each bucket (same shape as basket_pairs) —
    # replaces the exploded-table self-join, which scanned+exploded
    # the table twice and shuffled both join sides.
    masked = F.expr(
        "transform(sequence(1, length(c_name)), "
        "p -> struct(concat(substring(c_name, 1, p - 1), '\x01', "
        "substring(c_name, p + 1, length(c_name))) AS key, "
        "substring(c_name, p, 1) AS ch))"
    )
    b = c.select("c_custkey", F.explode(masked).alias("m")).select(
        F.col("m.key").alias("key"), "c_custkey", F.col("m.ch").alias("ch")
    )
    # buckets are Hamming-1 neighborhoods (tiny by construction);
    # sort by custkey so local i<j enumeration yields k1<k2 exactly
    # like the old join condition
    buckets = (
        b.groupBy("key")
        .agg(F.sort_array(F.collect_list(F.struct("c_custkey", "ch"))).alias("xs"))
        .where(F.size("xs") >= 2)
    )
    # pair expansion in two chained explodes, NOT one flattened array:
    # a single flatten(...) row holds all m·(m-1)/2 structs of a
    # bucket at once — fine when buckets are Hamming-1 neighborhoods
    # of near-unique names, an executor-memory blow-up when a popular
    # name repeats (every duplicate × every mask position lands in one
    # bucket). Exploding the anchor index i first bounds every
    # intermediate row to O(m): the bucket array plus ONE suffix
    # slice. Residual (documented) skew: the collect_list buffer above
    # is still O(m) per bucket and one bucket is one task — a name
    # duplicated ~10^7+ times needs pre-aggregating exact duplicates
    # before blocking; the m² OUTPUT rows are the answer itself.
    anchored = buckets.select(
        "xs", F.explode(F.expr("sequence(1, size(xs) - 1)")).alias("i")
    )
    pair_col = F.expr(
        "transform(sequence(i + 1, size(xs)), "
        "j -> struct(element_at(xs, i) AS a, element_at(xs, j) AS b))"
    )
    # two names sharing a masked variant are IDENTICAL everywhere
    # except the masked position, so their edit distance is exactly
    # (ch1 != ch2) — no DP levenshtein on the hot path. The DuckDB
    # oracle keeps true levenshtein over the same string-keyed
    # blocking as the independent verify of both claims.
    return (
        anchored.select(F.explode(pair_col).alias("pr"))
        .select(
            F.col("pr.a.c_custkey").alias("k1"),
            F.col("pr.b.c_custkey").alias("k2"),
            F.when(F.col("pr.a.ch") == F.col("pr.b.ch"), 0)
            .otherwise(1)
            .cast("int")
            .alias("dist"),
        )
        .where((F.col("k1") < F.col("k2")) & (F.col("dist") <= max_dist))
    )


def order_priority_unpivot(orders: DataFrame, statuses: tuple[str, ...] = ("O", "F", "P")) -> DataFrame:
    """Unpivot (melt) of the priority × status matrix back to long
    form, zero cells included: (o_orderpriority, status, n). The wide
    frame is tiny (post-aggregation), so the melt is driver-cheap;
    the pattern matters for wide metric tables."""
    wide = order_status_pivot(orders, statuses)
    return wide.unpivot(
        "o_orderpriority",
        [f"n_{s.lower()}" for s in statuses],
        "status_col",
        "n",
    ).select(
        "o_orderpriority",
        F.upper(F.substring("status_col", 3, 1)).alias("status"),
        "n",
    )


def customer_ntile(customer: DataFrame, n: int = 4) -> DataFrame:
    """Account-balance quartiles per nation — ntile over a total
    order (balance, then custkey: ties must break identically on
    every engine): (c_custkey, c_nationkey, quartile)."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return customer.select(
        "c_custkey", "c_nationkey", F.ntile(n).over(w).alias("quartile")
    )


def churned_customers(orders: DataFrame, year_a: int = 1996, year_b: int = 1997) -> DataFrame:
    """EXCEPT shape: customers who ordered in ``year_a`` but not
    ``year_b``. Catalyst rewrites EXCEPT DISTINCT as a left-anti
    join over pre-aggregated keys — both sides shrink to distinct
    custkeys before the join, so the shuffle carries keys, not
    orders."""
    a = orders.where(F.year("o_orderdate") == year_a).select("o_custkey").distinct()
    b = orders.where(F.year("o_orderdate") == year_b).select("o_custkey").distinct()
    return a.exceptAll(b).select(F.col("o_custkey").alias("c_custkey"))


def q9_product_type_profit(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                           lineitem: DataFrame, name_like: str = "%widget%") -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × ship year for parts
    matching a name pattern (no partsupp table in this schema, so
    profit is discounted revenue). The part filter cuts the fact
    before any join; nation broadcasts; the fact shuffles once per
    join key."""
    p = part.where(F.col("p_name").like(name_like)).select("p_partkey")
    return (
        lineitem.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("profit"))
    )


def q13_customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    zero-order customers included (left outer join, count of the
    right-side key). Two aggregations, each on its natural key; the
    second input is one row per customer."""
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q14_promo_revenue(lineitem: DataFrame, part: DataFrame,
                      date_from: str = "1996-01-01", date_to: str = "1996-02-01") -> DataFrame:
    """TPC-H Q14 shape: share of revenue from PROMO-type parts in one
    month — conditional aggregate over a keyed join; the date filter
    pushes to the lineitem scan. Single-row output."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.where((F.col("l_shipdate") >= date_from) & (F.col("l_shipdate") < date_to))
        .join(part.select("p_partkey", "p_type"), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev), 6,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q15_top_supplier(supplier: DataFrame, lineitem: DataFrame,
                     date_from: str = "1996-01-01", date_to: str = "1996-04-01") -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with maximum revenue in a quarter.
    The max is a 1-row aggregate of the per-supplier revenues,
    broadcast back onto them (no single-partition global window, no
    second scan of the fact); ties all returned as the spec
    requires."""
    rev = (
        lineitem.where((F.col("l_shipdate") >= date_from) & (F.col("l_shipdate") < date_to))
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_rev"))
    top = rev.crossJoin(F.broadcast(max_rev)).where(
        F.col("total_revenue") == F.col("max_rev")
    )
    return top.join(supplier, F.col("l_suppkey") == F.col("s_suppkey")).select(
        F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue")
    )


def q17_small_quantity_revenue(lineitem: DataFrame, part: DataFrame,
                               brand: str = "Brand#13", frac: float = 0.2) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (below ``frac`` of the part's average quantity) were not
    filled, for one brand. The correlated avg-per-part subquery is
    decorrelated as a window over l_partkey AFTER the brand filter
    shrinks the fact — one keyed shuffle, no self-join."""
    p = part.where(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(p, F.col("l_partkey") == F.col("p_partkey"))
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .where(F.col("l_quantity") < frac * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q18_large_orders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                     min_qty: int = 150, k: int = 100) -> DataFrame:
    """TPC-H Q18 shape: top-k largest orders by total quantity. The
    HAVING subquery is a pre-aggregation of lineitem on its natural
    key; orders then joins the (much smaller) qualifying set, so the
    big fact shuffles once."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > min_qty)
    )
    joined = (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty")
    )
    return _global_topk(joined, [F.col("total_qty").desc(), F.col("o_orderkey").asc()], k)


def q19_disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR'd brand/size/quantity
    predicate bundles. The disjunction is join-key-independent, so it
    evaluates as a post-join filter on the keyed part join; the
    partkey equi-join still carries the plan (no cross product)."""
    j = lineitem.join(
        part.select("p_partkey", "p_brand", "p_size"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 10))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 20))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 30))
           & (F.col("l_quantity").between(20, 30)))
    )
    return j.where(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q22_idle_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers with no orders, grouped by
    nation. The global average balance is a 1-row aggregate crossed
    onto the scan (broadcast, no action); NOT EXISTS is a left-anti
    join on pre-projected keys."""
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def repeat_customers(orders: DataFrame, year_a: int = 1996, year_b: int = 1997) -> DataFrame:
    """INTERSECT shape: customers active in both years (left-semi
    over distinct keys)."""
    a = orders.where(F.year("o_orderdate") == year_a).select("o_custkey").distinct()
    b = orders.where(F.year("o_orderdate") == year_b).select("o_custkey").distinct()
    return a.intersect(b).select(F.col("o_custkey").alias("c_custkey"))


def rfm_segments(orders: DataFrame, n_tiles: int = 4, approx: bool | None = None,
                 accuracy: int = 10000) -> DataFrame:
    """RFM customer segmentation: recency (days since last order,
    against the corpus max date), frequency (order count), monetary
    (total spend), each quartiled, plus the composite segment code
    r·100 + f·10 + m: (c_custkey, recency_days, frequency, monetary,
    r, f, m, segment).

    Two tile strategies:
    - ``approx=False`` (the oracle-checked path, pinned by every
      registered query): global ntile windows with total orderings
      (metric, then custkey) so ties split identically on any engine.
      The windows run on post-aggregation rows — one per customer —
      which still scale with the data, so this path funnels through
      one task on a big-enough corpus.
    - ``approx=True`` (the scale path): tile boundaries from one
      ``percentile_approx`` aggregate (map-side partials, no window
      anywhere in the plan), broadcast back as a 1-row dim, tiles
      assigned by comparison against the cutoffs. Boundary-epsilon
      disagreements vs exact are confined to customers whose metric
      sits on a quantile cutoff (≤1 tile, tested).
    - ``approx=None`` (default — auto, r10): pick by size.
      ``approx_count_distinct(o_custkey)`` (one pass, HLL partials, no
      shuffle of the data) estimates the customer cardinality; above
      ``spark.sift.quantile.exactRowLimit`` (default 10M — well inside
      one executor's window budget) the approx path is selected. Both
      sides are forced in tests via the conf.

      NOTE (r11, advice): auto mode runs that estimate EAGERLY — one
      Spark job fires at DataFrame-construction time, unlike the two
      pinned modes which stay fully lazy. And because the HLL estimate
      carries ~5% rsd, the gate compares against ``0.9 × limit``
      (hysteresis toward the approx side): a corpus whose true
      cardinality sits within the estimator's error band of the limit
      picks the scale-safe path deterministically instead of flipping
      between plans across runs. Callers who need a specific plan pin
      ``approx=`` explicitly — every registered query does."""
    if approx is None:
        est = orders.agg(
            F.approx_count_distinct("o_custkey").alias("n")
        ).collect()[0]["n"]
        approx = est > 0.9 * quantile_exact_limit(orders.sparkSession)
    per_cust = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    maxd = orders.agg(F.max(F.to_date("o_orderdate")).alias("max_date"))
    base = per_cust.crossJoin(F.broadcast(maxd)).select(
        "c_custkey",
        F.datediff("max_date", "last_order").alias("recency_days"),
        "frequency",
        "monetary",
    )
    if approx:
        probs = F.array(*[F.lit(i / n_tiles) for i in range(1, n_tiles)])
        cuts = base.agg(
            F.percentile_approx("recency_days", probs, F.lit(accuracy)).alias("rc"),
            F.percentile_approx("frequency", probs, F.lit(accuracy)).alias("fc"),
            F.percentile_approx("monetary", probs, F.lit(accuracy)).alias("mc"),
        )

        def tiles(value, cut_arr, descending):
            # tile = 1 + #cutoffs passed; descending metrics (recency:
            # recent = small = high tile) count cutoffs ABOVE the value.
            cmp = (lambda c: F.col(value) < c) if descending else (lambda c: F.col(value) > c)
            return F.lit(1) + F.aggregate(
                F.col(cut_arr), F.lit(0),
                lambda acc, c: acc + F.when(cmp(c), 1).otherwise(0),
            )

        return base.crossJoin(F.broadcast(cuts)).select(
            "c_custkey", "recency_days", "frequency", "monetary",
            tiles("recency_days", "rc", True).alias("r"),
            tiles("frequency", "fc", False).alias("f"),
            tiles("monetary", "mc", False).alias("m"),
        ).withColumn("segment", F.col("r") * 100 + F.col("f") * 10 + F.col("m"))

    # r: recent=high tile; f/m: big=high tile
    wr = Window.orderBy(F.col("recency_days").desc(), F.col("c_custkey").asc())
    wf = Window.orderBy(F.col("frequency").asc(), F.col("c_custkey").asc())
    wm = Window.orderBy(F.col("monetary").asc(), F.col("c_custkey").asc())
    return base.select(
        "c_custkey", "recency_days", "frequency", "monetary",
        F.ntile(n_tiles).over(wr).alias("r"),
        F.ntile(n_tiles).over(wf).alias("f"),
        F.ntile(n_tiles).over(wm).alias("m"),
    ).withColumn("segment", F.col("r") * 100 + F.col("f") * 10 + F.col("m"))


def q2_min_cost_supplier(region: DataFrame, nation: DataFrame, supplier: DataFrame,
                         part: DataFrame, lineitem: DataFrame,
                         region_name: str = "ASIA", min_size: int = 40) -> DataFrame:
    """TPC-H Q2 shape adapted to the schema subset: with no partsupp
    table, the per-(part, supplier) offer book is derived from
    lineitem as the average observed unit price. The correlated
    min-cost-supplier subquery is decorrelated as a window over
    l_partkey AFTER the part-size filter and region semi-join shrink
    the offer set — one keyed shuffle, no self-join; region/nation/
    part dims broadcast. Ties (suppliers matching the min) all kept,
    as the spec requires."""
    sups = supplier.join(
        F.broadcast(
            nation.join(
                region.where(F.col("r_name") == region_name),
                F.col("n_regionkey") == F.col("r_regionkey"),
            ).select("n_nationkey", "n_name")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "n_name")
    p = part.where(F.col("p_size") >= min_size).select("p_partkey", "p_name")
    offers = (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 6).alias("unit_cost"))
        .join(F.broadcast(sups), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("min_cost"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "n_name", "unit_cost")
    )


def q8_market_share(region: DataFrame, nation: DataFrame, customer: DataFrame,
                    supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
                    part: DataFrame, region_name: str = "AMERICA",
                    supp_nation: str = "NATION_1", p_type: str = "ECONOMY") -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue for a
    part type, by order year. The part-type filter cuts the fact at
    its broadcast join before anything shuffles; the customer→nation→
    region chain reduces orders before the fact join; the supplier
    nation arrives as a broadcast dim and the share is a conditional
    aggregate (no second pass)."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    in_region = customer.join(
        F.broadcast(
            nation.join(
                region.where(F.col("r_name") == region_name),
                F.col("n_regionkey") == F.col("r_regionkey"),
            ).select("n_nationkey")
        ),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey")
    ords = (
        orders.where(F.year("o_orderdate").between(1995, 1997))
        .join(in_region, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    )
    supp_nat = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    li = (
        lineitem.join(
            F.broadcast(part.where(F.col("p_type") == p_type).select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return li.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("n_name") == supp_nation, rev).otherwise(F.lit(0.0)))
            / F.sum(rev), 6,
        ).alias("mkt_share"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q11_important_parts(nation: DataFrame, supplier: DataFrame, lineitem: DataFrame,
                        nation_name: str = "NATION_3", frac: float = 0.01) -> DataFrame:
    """TPC-H Q11 shape adapted (no partsupp): per-part traded value
    from one nation's suppliers, keeping parts above ``frac`` of the
    nation total. The scalar total is a 1-row aggregate of the SAME
    per-part frame crossed back on as a broadcast (the fact aggregates
    once; no second scan, no action)."""
    sups = supplier.join(
        F.broadcast(nation.where(F.col("n_name") == nation_name).select("n_nationkey")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    per_part = (
        lineitem.join(F.broadcast(sups), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    total = per_part.agg(F.sum("value").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value") > frac * F.col("total_value"))
        .select("l_partkey", F.round("value", 2).alias("part_value"))
    )


def q12_late_shipments(orders: DataFrame, lineitem: DataFrame, late_days: int = 60) -> DataFrame:
    """TPC-H Q12 shape adapted (no shipmode/receiptdate columns):
    lines shipped more than ``late_days`` after the order date,
    counting high- vs low-priority orders per return flag. One
    fact-fact join on the natural key, conditional aggregates in a
    single pass."""
    j = lineitem.select("l_orderkey", "l_returnflag", "l_shipdate").join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q16_supplier_diversity(part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
                           excl_brand: str = "Brand#5", max_size: int = 25,
                           excl_name_like: str = "%000000003%") -> DataFrame:
    """TPC-H Q16 shape adapted (partsupp derived from observed
    lineitem pairs): distinct supplier counts per (brand, type, size),
    excluding one brand, large sizes, and complaint suppliers (the
    NOT IN subquery → broadcast left-anti join). The (part, supplier)
    pair stream flows straight into the count-distinct aggregation —
    no pre-distinct shuffle; the agg dedups."""
    bad = supplier.where(F.col("s_name").like(excl_name_like)).select("s_suppkey")
    keep = part.where(
        (F.col("p_brand") != excl_brand) & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    ps = (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(keep), F.col("l_partkey") == F.col("p_partkey"))
    )
    return ps.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


def q20_dominant_suppliers(supplier: DataFrame, part: DataFrame, lineitem: DataFrame,
                           name_like: str = "%widget%", frac: float = 0.2) -> DataFrame:
    """TPC-H Q20 shape adapted (availqty → shipped share): suppliers
    who shipped more than ``frac`` of some matching part's total
    volume. The part-name filter cuts the fact at a broadcast join;
    the correlated total-per-part is a window over the already-
    aggregated (part, supplier) rows; the supplier qualification is a
    left-semi join (EXISTS)."""
    p = part.where(F.col("p_name").like(name_like)).select("p_partkey")
    per = (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dom = (
        per.withColumn("part_qty", F.sum("supp_qty").over(w))
        .where(F.col("supp_qty") > frac * F.col("part_qty"))
        .select("l_suppkey")
    )
    return supplier.join(
        dom, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


def q21_waiting_suppliers(supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
                          k: int = 100) -> DataFrame:
    """TPC-H Q21 shape adapted (no commit/receipt dates — "late" is
    the max ship date in the order): for finished multi-supplier
    orders, the supplier whose line shipped last, provided no OTHER
    supplier tied for last (the EXISTS/NOT-EXISTS pair), counted per
    supplier. Both existence checks collapse into per-order aggregates
    on the natural key — the fact shuffles once on l_orderkey, then
    once more (tiny, post-agg) on the blamed supplier."""
    # ONE keyed pass over the fact: the (shipdate, suppkey) set per
    # order is tiny (TPC-H ≤ 7 lines), so the blame decision — did
    # exactly one distinct supplier ship on the order's max date — is
    # an array expression over the collected set. The r7 form joined
    # the 12M-row fact against orders, aggregated, then joined the
    # fact AGAIN against the per-order table (two corpus-sized
    # shuffles + two fact-dim joins — measured 5.5s warm at sf2); here
    # the fact shuffles once and the o_orderstatus filter becomes a
    # post-aggregation semi-join on order-count-sized tables (sf2:
    # 5.5s → ~2.5s, identical rows/hash).
    # collect_set, not collect_list+array_distinct: the set dedups in
    # the partial aggregation buffer, so duplicates never shuffle
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship"),
        F.collect_set(F.struct("l_shipdate", "l_suppkey")).alias("sd"),
    )
    late_supps = F.array_distinct(
        F.expr("transform(filter(sd, s -> s.l_shipdate = max_ship), s -> s.l_suppkey)")
    )
    blamed = (
        per_order.where(
            F.size(F.array_distinct(F.expr("transform(sd, s -> s.l_suppkey)"))) > 1
        )
        .select("l_orderkey", late_supps.alias("ls"))
        .where(F.size("ls") == 1)
        .select("l_orderkey", F.element_at("ls", 1).alias("suppkey"))
        .join(
            orders.where(F.col("o_orderstatus") == "F").select(
                F.col("o_orderkey").alias("l_orderkey")
            ),
            "l_orderkey",
            "left_semi",
        )
    )
    numwait = blamed.groupBy("suppkey").agg(F.count(F.lit(1)).alias("numwait"))
    named = (
        numwait.join(supplier, F.col("suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
    )
    return _global_topk(named, [F.col("numwait").desc(), F.col("s_name").asc()], k)


def basket_pairs(lineitem: DataFrame, min_support: int = 2) -> DataFrame:
    """Market-basket co-occurrence mining: pairs of parts appearing
    in the same order, with support counts — (part1, part2, support)
    for part1 < part2 and support ≥ ``min_support``.

    Shape: ONE basket aggregate (collect_set per order — map-side
    partial, one shuffle keyed on l_orderkey), then pairs generated
    LOCALLY from each basket array (a sequence×sequence transform —
    baskets are small, TPC-H ≤ 7 lines, so the explode is bounded by
    Σ |basket|²), then the canonical-pair aggregate. Replaces the
    distinct + equi-self-join form, which shuffled the (order, part)
    table three times (distinct, then both join sides) — measured
    5.0s → 2.7s at sf1, identical pairs. Same output as
    ``comention_triangles``' canonical-pair pattern; never a cross
    join. Giant baskets (not TPC-H) would want a per-basket size cap
    before the quadratic local expansion."""
    baskets = lineitem.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    # pairs travel as ONE packed long (part1 << 32 | part2), not a
    # two-field struct: the support aggregate then hashes/compares a
    # single primitive — measured 4.1→3.3s warm at sf2, identical
    # rows. Packing is exact for part1 < 2^31 and part2 < 2^32; the
    # in-plan guard raises LOUDLY on wider ids rather than silently
    # wrapping (swap back to a struct key for such datasets). The
    # guard runs per BASKET, not per pair (r10): ps is sorted, so
    # ps[1] >= 0, ps[-1] < 2^32 and ps[-2] < 2^31 bound every (i<j)
    # pair — three checks replace 2·|basket|² CASE branches inside
    # the quadratic expansion. Measured effect is small (~3% warm-min
    # at sf2 — the explode stage is only ~0.3s of the 4.5s total);
    # kept for the cleaner shape. The sf2 profile that retires the
    # two-level-aggregate idea: 23.92M of 24.0M pair keys are DISTINCT
    # (TPC-H co-occurrence is sparse), so map-side partials cannot
    # shrink the pair shuffle; the wall is the basket collect_set
    # shuffle (~2.3s) + the ~24M-unique-key hash aggregate (~1.9s),
    # both of which parallelize by key at cluster scale. A lineitem
    # layout bucketed by l_orderkey (operators.scale.write_bucketed)
    # removes the basket shuffle entirely for standing deployments.
    guarded = F.expr(
        "CASE WHEN element_at(ps, 1) < 0 "
        "OR element_at(ps, -1) >= 4294967296 "
        "OR element_at(ps, -2) >= 2147483648 "
        "THEN raise_error('basket_pairs: part key outside the packed-"
        "long range (0 <= part1 < 2^31, 0 <= part2 < 2^32) — use a "
        "struct key') "
        "ELSE ps END"
    )
    key_col = F.expr(
        "flatten(transform(sequence(1, size(ps) - 1), "
        "i -> transform(sequence(i + 1, size(ps)), "
        "j -> element_at(ps, i) * 4294967296 + element_at(ps, j))))"
    )
    pairs = (
        baskets.where(F.size("ps") >= 2)
        .select(guarded.alias("ps"))
        .select(F.explode(key_col).alias("k"))
    )
    return (
        pairs.groupBy("k")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
        .select(
            # integer div, NOT float division: k approaches 2^63 and a
            # double quotient can round across the integer boundary
            F.expr("k DIV 4294967296").alias("part1"),
            F.pmod(F.col("k"), F.lit(4294967296)).alias("part2"),
            "support",
        )
    )


def revenue_growth(orders: DataFrame) -> DataFrame:
    """Month-over-month revenue growth: (ym, revenue, growth) with
    ym = year·100 + month and growth = (rev − prev)/prev (null for
    the first month). The lag window is single-partition but runs on
    post-aggregation rows (one row per month — bounded by the
    calendar, not the data), the same pattern as the vocab-rank
    windows."""
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym")
    rev = orders.groupBy(ym).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("ym")
    return rev.withColumn("prev", F.lag("revenue").over(w)).select(
        "ym",
        "revenue",
        F.round((F.col("revenue") - F.col("prev")) / F.col("prev"), 6).alias("growth"),
    )


PRICE_BANDS: tuple[tuple[float, float, str], ...] = (
    (0.0, 930.0, "budget"),
    (930.0, 970.0, "mid"),
    (970.0, 10_000_000.0, "premium"),
)


def price_band_join(part: DataFrame, spark=None) -> DataFrame:
    """Range (non-equi) join of parts against a small band dimension:
    (band, n_parts, avg_price). The Spark-correct plan for a range
    join with a SMALL dim side is BroadcastNestedLoopJoin — each
    task streams its parts against the broadcast band table; never a
    shuffle, never a cartesian against a big side. (When the dim side
    is static literals, a CASE expression is even cheaper — this
    operator models bands arriving as DATA, e.g. a config table.)"""
    session = spark or part.sparkSession
    bands = session.createDataFrame(list(PRICE_BANDS), ["lo", "hi", "band"])
    j = part.join(
        F.broadcast(bands),
        (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")),
    )
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
    )
