"""Shared column expressions and cross-engine constants.

Everything here is built from ``pyspark.sql.functions`` (JVM-side,
codegen'd — no Python UDFs) and has an exact ANSI-SQL twin that DuckDB
evaluates identically, which is what makes the driver's oracle parity
gate possible:

- ``hash64``: first 15 hex chars of md5 → int64 (60 bits, positive).
  Spark: ``conv(substr(md5(x),1,15),16,10)``; DuckDB:
  ``cast('0x'||substr(md5(x),1,15) as bigint)``.
- ``hash31``: ``hash64 % (2^31-1)`` — small enough that linear
  permutations ``(a*h+b) % (2^31-1)`` never overflow int64.
- ranks/ordering: callers must use total orderings (tie-break on the
  key) so both engines agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokens of the synthetic corpus treated as entity mentions by the
# deterministic wikifier (see sift_spark/corpora/synthetic.py). Fixed
# lexicon, identical in the DuckDB oracle SQL.
ENTITY_TOKENS = (
    "column",
    "customer",
    "data",
    "query",
    "row",
    "spark",
    "stream",
    "table",
    "vector",
    "window",
)

WIKI_PREFIX = "wiki/"

# Mersenne prime 2^31-1: modulus for all linear hash permutations.
MOD31 = 2147483647

STOPWORDS = ("a", "the")


def tokens(col: Column) -> Column:
    """Whitespace tokenization → array<string> (no empty tokens)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def hash64(col: Column) -> Column:
    """Deterministic 60-bit positive int64 hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash31(col: Column) -> Column:
    """hash64 reduced into [0, 2^31-1) for overflow-safe linear perms."""
    return hash64(col) % F.lit(MOD31)


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (double math)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def sql_hash64(expr: str) -> str:
    """DuckDB twin of :func:`hash64` (takes a SQL expression string)."""
    return f"cast(concat('0x', substr(md5({expr}), 1, 15)) as bigint)"


def sql_hash31(expr: str) -> str:
    """DuckDB twin of :func:`hash31`."""
    return f"({sql_hash64(expr)} % {MOD31})"


def sql_entity_set() -> str:
    """SQL literal list of the entity lexicon."""
    return "(" + ", ".join(f"'{t}'" for t in ENTITY_TOKENS) + ")"
