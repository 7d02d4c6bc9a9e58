"""Builder-local cache registry (r12).

Query builders persist intermediates that several branches of the SAME
query plan consume (the eager-materialization contract documented at
``minhash_lsh_pairs``). Those caches are plan-keyed in Spark's
CacheManager, which holds a strong reference until an explicit
unpersist — so (a) a SECOND build of the same query in one session
cache-hits the first build's data, and (b) long-lived sessions calling
builders with varying inputs grow storage unboundedly (r11 advice
items). This registry makes both lifecycles explicit:

- builders route builder-local persists through :func:`local_persist`;
- timing harnesses (bench.py, scripts/query_ab.py) call
  :func:`release_local_caches` between repetitions so every timed run
  recomputes from the parquet inputs instead of reading the previous
  rep's cache;
- library callers may call :func:`release_local_caches` whenever the
  results built so far have been consumed.

Session artifacts (``queries._docs_*``) are deliberately NOT
registered here: their build cost is accounted on their own cold
bench lines and cross-query reuse is their documented contract, with
release via ``CorpusArtifacts.release()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LOCAL_CACHES: list[DataFrame] = []


def local_persist(df: DataFrame, eager: bool = True, level=None) -> DataFrame:
    """Persist a builder-local intermediate and register it for
    :func:`release_local_caches`. ``eager`` materializes immediately
    (the multi-consumer race contract — see minhash_lsh_pairs).
    ``level``: optional StorageLevel (e.g. MEMORY_ONLY for the ANN
    probe tables' LRU-eviction policy); default is persist()'s."""
    df = df.persist(level) if level is not None else df.persist()
    _LOCAL_CACHES.append(df)
    if eager:
        df.count()
    return df


def release_local_caches() -> int:
    """Unpersist every registered builder-local cache; returns how many
    were released. Safe to call at any time — results already computed
    are unaffected, and re-building a query re-registers its caches."""
    n = 0
    while _LOCAL_CACHES:
        df = _LOCAL_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
