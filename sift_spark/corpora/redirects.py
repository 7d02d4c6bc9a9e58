"""Redirect resolution (reference parity: sift/corpora/redirects.py and
sift/corpora/wikipedia.py:36 ``WikipediaRedirects``).

A redirect set is a DataFrame ``(source, target)``. The reference
resolves one indirection step per pass (wikipedia.py:57); here
``resolve_transitive`` iterates joins to the true fixpoint (bounded),
which the DuckDB oracle mirrors with a recursive CTE — correct chain
collapsing (a→b, b→c ⇒ a→c) instead of single-step.

Scale posture: each iteration is one equi-join on ``target=source``
(shuffle on the redirect key). Chains in real wiki data are short
(≤3–4 hops), so the loop terminates in a handful of passes; the
convergence check is a count aggregate, not a collect of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Synthetic redirect fixture over the wikify entity space — a literal
# table embedded identically in the DuckDB oracle. Includes a 2-hop
# chain (vector → column → table) to exercise transitivity.
SYNTH_REDIRECTS = (
    ("wiki/vector", "wiki/column"),
    ("wiki/column", "wiki/table"),
    ("wiki/stream", "wiki/data"),
    ("wiki/row", "wiki/table"),
)

# Second KB's redirect set for cross-KB composition (map_redirects).
SYNTH_REDIRECTS_B = (
    ("wiki/table", "kb2/relation"),
    ("wiki/data", "kb2/dataset"),
    ("wiki/query", "kb2/question"),
)


def synth_redirects(spark, pairs=SYNTH_REDIRECTS) -> DataFrame:
    return spark.createDataFrame(list(pairs), "source string, target string")


# Driver gate for the fixpoint walk (same small-input/distributed
# split as the CC edge gate): real redirect sets are dictionary-sized
# (enwiki ≈ 10M pairs ≈ a few hundred MB — above this default), and
# the distributed loop pays a probe + join round-trip per hop, which
# on a SMALL set is pure scheduling (measured 4.4s on the synthetic
# set at sf2 vs milliseconds of dict walking).
REDIRECTS_DRIVER_LIMIT_CONF = "spark.sift.redirects.driverLimit"
REDIRECTS_DRIVER_LIMIT = 1_000_000


def resolve_transitive(redirects: DataFrame, max_hops: int = 8) -> DataFrame:
    """Collapse redirect chains to their terminal targets.

    Iterates target←target' joins until a fixpoint, capped at
    ``max_hops`` total hops (cycle guard). The cap is hop-exact with
    the oracle's recursive CTE (walk depth ≤ max_hops): the initial
    set is 1 hop, each iteration adds one, so the loop runs
    ``max_hops - 1`` times — a cycle resolves to the same
    parity-of-hops node in both engines.

    Sets at or below ``spark.sift.redirects.driverLimit`` rows
    (default 1M) resolve driver-side: one collect, then the identical
    per-row walk (each distributed round advances every unresolved
    row one hop through the SAME static map, so the per-row chain
    walk of ≤ max_hops-1 extra hops is value-identical, cycles
    included). The distributed loop is the >limit path, forced in
    tests via the conf."""
    spark = redirects.sparkSession
    limit = int(
        spark.conf.get(REDIRECTS_DRIVER_LIMIT_CONF, str(REDIRECTS_DRIVER_LIMIT))
    )
    if limit > 0 and redirects.count() <= limit:
        # count gates BEFORE collecting — an over-limit set must not
        # pay a limit-sized row transfer just to discover it is big
        rows = redirects.select("source", "target").collect()
        # the dict walk assumes a FUNCTIONAL map (one target per
        # source — what a redirect set is); a duplicate NON-NULL
        # source would fan out in the distributed join but collapse
        # in a dict, so such inputs take the distributed path.
        # NULL sources are excluded from the map entirely: the
        # distributed join is null-unsafe (NULL never matches NULL),
        # so a NULL-keyed dict entry would resolve chains the join
        # never would.
        non_null = [r["source"] for r in rows if r["source"] is not None]
        if len(set(non_null)) == len(non_null):
            nxt_map = {
                r["source"]: r["target"] for r in rows if r["source"] is not None
            }
            out = []
            for r in rows:
                t = r["target"]
                for _ in range(max_hops - 1):
                    t2 = nxt_map.get(t)
                    if t2 is None:
                        break
                    t = t2
                out.append((r["source"], t))
            return spark.createDataFrame(
                out, redirects.select("source", "target").schema
            )
    resolved = redirects.select("source", "target")
    nxt = redirects.select(F.col("source").alias("__s"), F.col("target").alias("__t"))
    for _ in range(max_hops - 1):
        # fixpoint: done when no target is still a redirect source
        if resolved.join(nxt, resolved["target"] == nxt["__s"], "left_semi").limit(1).count() == 0:
            break
        resolved = (
            resolved.join(nxt, resolved["target"] == nxt["__s"], "left")
            .select("source", F.coalesce("__t", "target").alias("target"))
        )
    return resolved


def compose_redirects(a: DataFrame, b: DataFrame) -> DataFrame:
    """Map ``a``'s targets through ``b`` (reference redirects.py:30
    ``MapRedirects.build`` one composition step):
    (s, t) ∈ a → (s, b[t] if t ∈ b else t)."""
    bb = b.select(F.col("source").alias("__bs"), F.col("target").alias("__bt"))
    return (
        a.join(bb, a["target"] == F.col("__bs"), "left")
        .select("source", F.coalesce("__bt", "target").alias("target"))
    )


def redirect_links(links: DataFrame, redirects: DataFrame) -> DataFrame:
    """Rewrite link targets through a resolved redirect set (reference
    redirects.py:76 ``RedirectDocuments``; join-based instead of the
    reference's groupBy-dict rebuild — the redirect set is joined on
    ``target`` and broadcast when small)."""
    rr = redirects.select(F.col("source").alias("__rs"), F.col("target").alias("__rt"))
    return (
        links.join(rr, links["target"] == F.col("__rs"), "left")
        .withColumn("target", F.coalesce("__rt", "target"))
        .drop("__rs", "__rt")
    )
