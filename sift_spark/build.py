"""Command-line model builder (reference parity: sift/build.py
``DatasetBuilder`` — the reference's main entry point).

    python -m sift_spark.build EntityCounts \
        --input /root/testdata/sf0.01 --save /tmp/out --format json

Reads the corpus (driver parquet dir, or a Wikipedia dump with
``--corpus wikipedia``), builds the named model, and writes it with
the chosen sink (json / tsv / parquet), or prints a sample.
"""

from __future__ import annotations

import argparse
import sys


def _model_registry():
    from sift_spark.corpora.synthetic import token_pos_table, wikify_links
    from sift_spark.models import links as L
    from sift_spark.models import text as TX

    def docs_of(spark, path):
        from sift_spark.io import table

        return table(spark, path, "documents")

    return {
        "EntityCounts": lambda s, p: L.entity_counts(wikify_links(docs_of(s, p))),
        "EntityNameCounts": lambda s, p: L.entity_name_counts(wikify_links(docs_of(s, p))),
        "NamePartCounts": lambda s, p: L.name_part_counts(
            wikify_links(docs_of(s, p)), token_pos_table(docs_of(s, p))
        ),
        "EntityInlinks": lambda s, p: L.entity_inlinks(wikify_links(docs_of(s, p))),
        "EntityVocab": lambda s, p: L.entity_vocab(wikify_links(docs_of(s, p))),
        "EntityComentions": lambda s, p: L.entity_comentions(wikify_links(docs_of(s, p))),
        "EntityRelatedness": lambda s, p: L.entity_relatedness(wikify_links(docs_of(s, p))),
        "TermFrequencies": lambda s, p: TX.term_frequencies(docs_of(s, p), max_ngram=2),
        "TermDocumentFrequencies": lambda s, p: TX.term_doc_frequencies(docs_of(s, p)),
        "TermVocab": lambda s, p: TX.term_vocab(docs_of(s, p)),
        "TermIdfs": lambda s, p: TX.term_idfs(docs_of(s, p)),
        "EntityMentions": lambda s, p: TX.entity_mentions(docs_of(s, p), wikify_links(docs_of(s, p))),
        "EntityMentionTermFrequency": lambda s, p: TX.entity_mention_term_frequency(
            TX.entity_mentions(docs_of(s, p), wikify_links(docs_of(s, p))),
            TX.term_idfs(docs_of(s, p)),
        ),
        "EntityPageRank": lambda s, p: L.entity_pagerank(wikify_links(docs_of(s, p))),
        "DedupExact": lambda s, p: _op("dedup").exact_duplicate_groups(docs_of(s, p)),
        "DedupPairs": lambda s, p: _op("dedup").minhash_lsh_pairs(docs_of(s, p)),
        "DuplicateClusters": lambda s, p: _op("dedup").duplicate_clusters(
            _op("dedup").minhash_lsh_pairs(docs_of(s, p))
        ),
        "DedupApply": lambda s, p: _op("dedup").dedup_apply(docs_of(s, p)),
        "LangId": lambda s, p: _op("text_analysis").lang_id(docs_of(s, p)),
        "QualityScore": lambda s, p: _op("text_analysis").quality_score(docs_of(s, p)),
        "TokenStats": lambda s, p: _op("text_analysis").token_stats(docs_of(s, p)),
        "RepetitionStats": lambda s, p: _op("text_analysis").repetition_stats(docs_of(s, p)),
        "UnigramLogprob": lambda s, p: _op("text_analysis").unigram_logprob(docs_of(s, p)),
        "PiiRedact": lambda s, p: _op("text_analysis").pii_redact(docs_of(s, p)),
        "DocFingerprint": lambda s, p: _op("text_analysis").doc_fingerprint(docs_of(s, p)),
        "DocEntropy": lambda s, p: _op("text_analysis").doc_entropy(docs_of(s, p)),
        "BigramLogprob": lambda s, p: _op("text_analysis").bigram_logprob(docs_of(s, p)),
        "BpePairCounts": lambda s, p: _op("text_analysis").bpe_pair_counts(docs_of(s, p)),
        "FilteredCorpus": lambda s, p: _op("text_analysis").filtered_corpus(docs_of(s, p)),
        "LangConfusion": lambda s, p: _op("text_analysis").lang_confusion(docs_of(s, p)),
        "CorpusMixReport": lambda s, p: _op("text_analysis").corpus_mix_report(docs_of(s, p)),
        "ContainmentPairs": lambda s, p: _op("dedup").containment_pairs(docs_of(s, p)),
        "DocNovelty": lambda s, p: _op("dedup").doc_novelty(docs_of(s, p)),
        "AnchorAmbiguity": lambda s, p: L.anchor_ambiguity(wikify_links(docs_of(s, p))),
        "DuplicateClustersStar": lambda s, p: _op("dedup").duplicate_clusters_star(
            _op("dedup").minhash_lsh_pairs(docs_of(s, p))
        ),
        "SemanticDedup": lambda s, p: _op("dedup").semantic_dedup(
            __import__("sift_spark.io", fromlist=["table"]).table(s, p, "embeddings")
        ),
        "DsirWeights": lambda s, p: _op("sampling").dsir_importance_weights(docs_of(s, p)),
        "BpeTrain": lambda s, p: _op("text_analysis").bpe_train(docs_of(s, p)),
        "CcnetBuckets": lambda s, p: _op("text_analysis").ccnet_buckets(docs_of(s, p)),
        "QualityClassifier": lambda s, p: _op("classify").quality_classifier(docs_of(s, p)),
        "UnigramTrain": lambda s, p: _op("tokenizer").unigram_train(docs_of(s, p)),
        "CorpusDatacard": lambda s, p: _op("text_analysis").corpus_datacard(docs_of(s, p)),
        "DocSrpEmbeddings": lambda s, p: _op("text_analysis").doc_srp_embeddings(docs_of(s, p)),
        "DocEmbeddingDupPairs": lambda s, p: _op("dedup").doc_embedding_dup_pairs(docs_of(s, p)),
        "HeldoutBackoffLogprob": lambda s, p: _op("text_analysis").heldout_backoff_logprob(docs_of(s, p)),
        "HardNegatives": lambda s, p: _op("similarity").hard_negatives(
            __import__("sift_spark.io", fromlist=["table"]).table(s, p, "embeddings")
        ),
        "LabelSpread": lambda s, p: _op("similarity").label_spread(
            __import__("sift_spark.io", fromlist=["table"]).table(s, p, "embeddings")
        ),
    }


def _op(mod: str):
    import importlib

    return importlib.import_module(f"sift_spark.operators.{mod}")


def main(argv: list[str] | None = None) -> int:
    registry = _model_registry()
    p = argparse.ArgumentParser(prog="sift_spark.build", description=__doc__)
    p.add_argument("model", choices=sorted(registry))
    p.add_argument("--input", required=True, help="corpus dir (driver parquet layout)")
    p.add_argument("--save", default=None, help="output path (default: print a sample)")
    p.add_argument("--format", choices=["json", "tsv", "parquet"], default="json")
    p.add_argument("--sample", type=int, default=5)
    args = p.parse_args(argv)

    from sift_spark.session import get_spark
    from sift_spark.sinks.formats import to_json_lines, to_tsv, write_text

    spark = get_spark(f"build_{args.model}")
    model = registry[args.model](spark, args.input)

    if args.save:
        if args.format == "parquet":
            model.write.mode("overwrite").parquet(args.save)
        else:
            fmt = to_json_lines if args.format == "json" else to_tsv
            write_text(fmt(model), args.save)
        print(f"saved {args.model} -> {args.save} ({args.format})")
    else:
        for row in model.limit(args.sample).collect():
            print(row.asDict())
    return 0


if __name__ == "__main__":
    sys.exit(main())
