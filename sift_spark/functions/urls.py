"""URL/link normalization as column expressions (reference parity:
sift/util.py:44 ``trim_link_subsection``, :48 ``trim_link_protocol``).

The reference applies these per-row in Python inside every link
model; here they're regexp expressions applied once to the link
table, inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def trim_link_subsection(col: Column) -> Column:
    """Drop the #fragment (everything from the first '#')."""
    return F.regexp_replace(col, r"#.*$", "")


def trim_link_protocol(col: Column) -> Column:
    """Drop the scheme (everything through '://')."""
    return F.regexp_replace(col, r"^[^:/]+://", "")


def normalize_target(col: Column) -> Column:
    """Both trims, the combination every reference link model applies
    to targets (links.py:20-24 and throughout)."""
    return trim_link_subsection(trim_link_protocol(col))


def normalize_links(links: DataFrame, target_col: str = "target") -> DataFrame:
    """Link table with normalized targets — run once before the model
    layer instead of inside each model."""
    return links.withColumn(target_col, normalize_target(F.col(target_col)))
