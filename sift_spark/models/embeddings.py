"""Entity/word skip-gram embeddings (reference parity:
sift/models/embeddings.py:11 ``EntitySkipGramEmbeddings``).

The reference trains gensim Word2Vec on the driver against a
``toLocalIterator`` of mention token streams — a single-node
bottleneck. Here training is ``pyspark.ml.feature.Word2Vec``
(distributed skip-gram, negative-sampling-free hierarchical softmax
in Spark ML), fed token sequences where every entity mention token is
replaced by its ``wiki/<token>`` URI so entities and context words
share one vector space — the reference's core trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sift_spark.functions.core import ENTITY_TOKENS, WIKI_PREFIX, tokens


def entity_sentences(docs: DataFrame) -> DataFrame:
    """(doc_id, sentence: array<string>) with entity tokens rewritten
    to their URIs."""
    seq = F.transform(
        tokens(F.col("text")),
        lambda t: F.when(t.isin(*ENTITY_TOKENS), F.concat(F.lit(WIKI_PREFIX), t)).otherwise(t),
    )
    return docs.select("doc_id", seq.alias("sentence"))


def skipgram_embeddings(docs: DataFrame, dimensions: int = 32, min_count: int = 5,
                        seed: int = 42, num_partitions: int | None = None,
                        max_iter: int = 1) -> DataFrame:
    """Train skip-gram embeddings over entity-rewritten token streams:
    (term, vector array<float>). The vocab (term set and vector width)
    is partition-invariant and is what the rows-only gate checks;
    vector VALUES depend on Spark ML's parallel training order, so
    they are not hash-checked under any partitioning.

    ``num_partitions`` defaults to the input's parallelism so training
    scales with the corpus — a 100 TB token stream must never funnel
    through one training task. Pass ``num_partitions=1`` only when
    bitwise-reproducible vectors across runs matter more than speed.
    """
    from pyspark.ml.feature import Word2Vec

    sents = entity_sentences(docs)
    if num_partitions is None:
        num_partitions = max(1, sents.rdd.getNumPartitions())
    w2v = Word2Vec(
        vectorSize=dimensions,
        minCount=min_count,
        seed=seed,
        inputCol="sentence",
        outputCol="vec",
        numPartitions=num_partitions,
        maxIter=max_iter,
    )
    model = w2v.fit(sents)
    vecs = model.getVectors()  # (word, vector: VectorUDT)
    from pyspark.ml.functions import vector_to_array

    return vecs.select(
        F.col("word").alias("term"),
        vector_to_array(F.col("vector"), "float32").alias("vector"),
    )


def embedding_vocab(docs: DataFrame, dimensions: int = 32, min_count: int = 5) -> DataFrame:
    """Deterministic projection of the trained model: (term, dim) —
    what the driver's rows-only gate checks."""
    vecs = skipgram_embeddings(docs, dimensions=dimensions, min_count=min_count)
    return vecs.select("term", F.size("vector").alias("dim"))


def walk_embeddings(links: DataFrame, dimensions: int = 16, n_walks: int = 4,
                    walk_len: int = 6, min_count: int = 1, seed: int = 42,
                    num_partitions: int | None = None) -> DataFrame:
    """DeepWalk node embeddings (Perozzi et al. 2014): the
    deterministic walk corpus from
    :func:`sift_spark.models.links.entity_random_walks` fed to the
    same distributed Word2Vec as :func:`skipgram_embeddings` —
    entities embedded by their GRAPH neighborhoods instead of their
    textual contexts (the two spaces are complementary features for
    entity disambiguation). Output: (term, vector array<float>).

    The walk corpus is reproducible (hash-picked steps), so the vocab
    is exactly the comention graph's node set on every run; vector
    values inherit Spark ML's training-order nondeterminism like the
    text variant (rows-only checked)."""
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    from sift_spark.models.links import entity_random_walks

    sents = entity_random_walks(links, n_walks, walk_len).select(
        F.split("path", ",").alias("sentence")
    )
    if num_partitions is None:
        num_partitions = max(1, sents.rdd.getNumPartitions())
    w2v = Word2Vec(
        vectorSize=dimensions,
        minCount=min_count,
        seed=seed,
        inputCol="sentence",
        outputCol="vec",
        numPartitions=num_partitions,
    )
    return w2v.fit(sents).getVectors().select(
        F.col("word").alias("term"),
        vector_to_array(F.col("vector"), "float32").alias("vector"),
    )
