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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
            F.broadcast(customer.where(F.col("c_mktsegment") == segment)),
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
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(dims, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    return df


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
