"""sift_spark — a PySpark-native knowledge-extraction & data-pipeline engine.

Re-expresses the capabilities of the reference toolkit ``sift``
(/root/reference: RDD-based entity/text model builders over linked
documents) on the Spark DataFrame/SQL stack, plus the LLM-training-data
operators (dedup, similarity search, multimodal columns, text analysis)
a modern 100 TB pipeline needs.

Design rules:
- Declarative DataFrame plans only — Catalyst does pushdown/pruning/
  join selection; no ``collect()`` inside operators, no row-at-a-time
  Python UDFs in hot paths.
- Cross-engine determinism — hashes are md5-prefix→int64, ranks are
  ``row_number`` over total orderings, floats rounded at query edges.
"""

from sift_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
