"""DuckDB oracle SQL for the dedup / similarity / text-analysis
operators — generated programmatically from the SAME constants the
Spark operators use (sift_spark.functions.core), so the two engines
cannot drift."""

from __future__ import annotations

from sift_spark.functions.core import (
    LANG_PROFILES,
    LSH_PLANES,
    MINHASH_A,
    MINHASH_B,
    MINHASH_BANDS,
    MINHASH_K,
    MINHASH_ROWS,
    MOD31,
    SIMHASH_BITS,
    STOPWORDS,
)

TOKCTE = """tok AS (
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS anchor
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
)"""


def _h64(expr: str) -> str:
    return f"cast(concat('0x', substr(md5({expr}), 1, 15)) as bigint)"


def _h31(expr: str) -> str:
    return f"({_h64(expr)} % {MOD31})"


SHINGLES = f"""sh AS (
  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
),
shh AS (SELECT doc_id, shingle, {_h31('shingle')} AS h FROM sh)"""

_mh_aggs = ",\n    ".join(
    f"min(({MINHASH_A[i]} * h + {MINHASH_B[i]}) % {MOD31}) AS mh_{i}" for i in range(MINHASH_K)
)
MINHASH = f"""mh AS (
  SELECT doc_id,
    {_mh_aggs}
  FROM shh GROUP BY doc_id
)"""

_band_rows = "\n  UNION ALL\n".join(
    "  SELECT doc_id, {b} AS band, md5({concat}) AS sig FROM mh".format(
        b=b,
        concat="concat_ws(',', "
        + ", ".join(f"CAST(mh_{b * MINHASH_ROWS + r} AS VARCHAR)" for r in range(MINHASH_ROWS))
        + ")",
    )
    for b in range(MINHASH_BANDS)
)
BANDS = f"""bands AS (
{_band_rows}
)"""

JACCARD_VERIFY = """sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc1, c.doc2, count(*) AS inter
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.doc1
  JOIN sh s2 ON s2.doc_id = c.doc2 AND s2.shingle = s1.shingle
  GROUP BY c.doc1, c.doc2
),
jac AS (
  SELECT i.doc1, i.doc2,
         round(i.inter * 1.0 / (x.n_sh + y.n_sh - i.inter), 6) AS jaccard
  FROM inter i
  JOIN sizes x ON x.doc_id = i.doc1
  JOIN sizes y ON y.doc_id = i.doc2
)"""

ORACLE_OPS: dict[str, str] = {}

# The tokenized-corpus artifact itself (sift_spark.queries
# _docs_shingles): the (doc_id, shingle, h) table every shingle-family
# operator branches from. Registering it as a query makes the
# artifact's build cost a FIRST-CLASS line in bench/amortization
# accounting (instead of landing on whichever family member runs
# first) and hash-checks the shared table end to end.
ORACLE_OPS["corpus_shingles"] = f"""
WITH {SHINGLES}
SELECT doc_id, shingle, h FROM shh
"""

# The token artifact's accounting line (queries._docs_tokenized):
# hash-checks a deterministic per-doc projection of the cached
# (docs + toks) table so the build cost is its own bench line.
ORACLE_OPS["corpus_tokens"] = """
SELECT doc_id, CAST(len(toks) AS INT) AS n_toks,
       toks[1] AS first_tok, toks[-1] AS last_tok
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
"""

# The (doc_id, term, tf) posting-table artifact (queries._docs_tf):
# the tf-idf family (srp/topics/retrieval/search) branches from it.
ORACLE_OPS["corpus_tf"] = f"""
WITH {TOKCTE}
SELECT doc_id, anchor AS term, count(*) AS tf
FROM tok GROUP BY doc_id, anchor
"""

ORACLE_OPS["dedup_exact"] = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS n_docs
FROM documents GROUP BY md5(text)
"""

ORACLE_OPS["dedup_minhash_lsh"] = f"""
WITH {SHINGLES}, {MINHASH}, {BANDS},
cand AS (
  SELECT DISTINCT l.doc_id AS doc1, r.doc_id AS doc2
  FROM bands l JOIN bands r ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
),
{JACCARD_VERIFY}
SELECT doc1, doc2, jaccard FROM jac WHERE jaccard >= 0.8
"""

ORACLE_OPS["dedup_clusters"] = f"""
WITH RECURSIVE {SHINGLES}, {MINHASH}, {BANDS},
cand AS (
  SELECT DISTINCT l.doc_id AS doc1, r.doc_id AS doc2
  FROM bands l JOIN bands r ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
),
{JACCARD_VERIFY},
pairs AS (SELECT doc1, doc2 FROM jac WHERE jaccard >= 0.8),
edges AS (
  SELECT doc1 AS a, doc2 AS b FROM pairs
  UNION
  SELECT doc2 AS a, doc1 AS b FROM pairs
),
reach(src, node) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node
)
SELECT src AS doc_id, min(node) AS rep_id FROM reach GROUP BY src
"""

ORACLE_OPS["dedup_apply"] = f"""
WITH RECURSIVE {SHINGLES}, {MINHASH}, {BANDS},
cand AS (
  SELECT DISTINCT l.doc_id AS doc1, r.doc_id AS doc2
  FROM bands l JOIN bands r ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
),
{JACCARD_VERIFY},
pairs AS (SELECT doc1, doc2 FROM jac WHERE jaccard >= 0.8),
edges AS (
  SELECT doc1 AS a, doc2 AS b FROM pairs
  UNION
  SELECT doc2 AS a, doc1 AS b FROM pairs
),
reach(src, node) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (SELECT src AS doc_id, min(node) AS rep_id FROM reach GROUP BY src)
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id != rep_id)
"""

ORACLE_OPS["doc_chunks"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks, len(string_split(text, ' ')) AS n
  FROM documents
),
c AS (
  SELECT doc_id, toks, n,
         CASE WHEN n <= 50 THEN 1
              ELSE CAST(ceil((n - 50) / 40.0) AS INT) + 1 END AS n_chunks
  FROM d
)
SELECT doc_id, CAST(i AS INT) AS chunk_id,
       array_to_string(list_slice(toks, i * 40 + 1, i * 40 + 50), ' ') AS chunk_text,
       CAST(least(50, n - i * 40) AS INT) AS n_chunk_tokens
FROM c, unnest(generate_series(0, n_chunks - 1)) AS u(i)
"""

ORACLE_OPS["term_collocations"] = f"""
WITH {TOKCTE},
uni AS (SELECT anchor AS w, count(*) AS c FROM tok GROUP BY anchor),
pr AS (
  SELECT toks[i] AS w1, toks[i+1] AS w2
  FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM (SELECT string_split(text, ' ') AS toks FROM documents))
),
big AS (SELECT w1, w2, count(*) AS n_pair FROM pr GROUP BY w1, w2 HAVING count(*) >= 5),
tt AS (SELECT (SELECT count(*) FROM tok) AS t_tokens, (SELECT count(*) FROM pr) AS t_bigrams)
SELECT w1, w2, n_pair,
       round(ln((n_pair * 1.0 / t_bigrams)
                / ((u1.c * 1.0 / t_tokens) * (u2.c * 1.0 / t_tokens))), 6) AS pmi
FROM big JOIN uni u1 ON big.w1 = u1.w
JOIN uni u2 ON big.w2 = u2.w
CROSS JOIN tt
"""

ORACLE_OPS["block_dedup"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         CAST(ceil(len(string_split(text, ' ')) / 20.0) AS INT) AS nb
  FROM documents
),
b AS (
  SELECT doc_id, CAST(i AS INT) AS block_id,
         array_to_string(list_slice(toks, i * 20 + 1, i * 20 + 20), ' ') AS block_text
  FROM d, unnest(generate_series(0, nb - 1)) AS u(i)
),
k AS (
  SELECT doc_id, block_id, block_text,
         row_number() OVER (PARTITION BY block_text ORDER BY doc_id, block_id) = 1 AS kept
  FROM b
)
SELECT doc_id, count(*) AS n_blocks,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       coalesce(string_agg(CASE WHEN kept THEN block_text END, ' ' ORDER BY block_id), '')
         AS clean_text
FROM k GROUP BY doc_id
"""

ORACLE_OPS["repetition_stats"] = f"""
WITH {TOKCTE},
tf AS (SELECT doc_id, anchor, count(*) AS tf FROM tok GROUP BY doc_id, anchor),
top AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         round(max(tf) * 1.0 / sum(tf), 6) AS top_token_share
  FROM tf GROUP BY doc_id
),
bi AS (
  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bg
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
),
bs AS (SELECT doc_id, count(*) AS n_bi, count(DISTINCT bg) AS n_bi_d FROM bi GROUP BY doc_id)
SELECT t.doc_id, t.n_tokens, t.top_token_share,
       round(CASE WHEN b.n_bi IS NULL THEN 0.0
                  ELSE 1.0 - b.n_bi_d * 1.0 / b.n_bi END, 6) AS dup_2gram_share
FROM top t LEFT JOIN bs b ON b.doc_id = t.doc_id
"""

_quota_h = _h64("concat('quota:', cast(doc_id as varchar))")

ORACLE_OPS["source_quota_sample"] = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY {_quota_h} ASC, doc_id ASC) AS rk
  FROM documents)
WHERE rk <= 50
"""

_bit_sums = ",\n    ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN tf ELSE -tf END) AS s_{b}" for b in range(SIMHASH_BITS)
)
_sim_terms = " + ".join(f"(CASE WHEN s_{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH_BITS))
SIMHASH = f"""tf AS (
  SELECT doc_id, anchor AS tok, count(*) AS tf, {_h31('anchor')} AS h
  FROM tok GROUP BY doc_id, anchor
),
bitsums AS (
  SELECT doc_id,
    {_bit_sums}
  FROM tf GROUP BY doc_id
),
simh AS (SELECT doc_id, CAST({_sim_terms} AS BIGINT) AS simhash FROM bitsums)"""

ORACLE_OPS["dedup_simhash"] = f"""
WITH {TOKCTE}, {SIMHASH},
bands AS (
  SELECT doc_id, simhash, b AS band, (simhash >> (8 * b)) & 255 AS byte
  FROM simh, unnest([0, 1, 2, 3]) AS u(b)
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc1, r.doc_id AS doc2,
                  l.simhash AS h1, r.simhash AS h2
  FROM bands l JOIN bands r ON l.band = r.band AND l.byte = r.byte AND l.doc_id < r.doc_id
)
SELECT doc1, doc2, CAST(bit_count(xor(h1, h2)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(h1, h2)) <= 3
"""

ORACLE_OPS["dedup_ngram_jaccard"] = f"""
WITH {SHINGLES},
cand AS (
  SELECT DISTINCT l.doc_id AS doc1, r.doc_id AS doc2
  FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
),
{JACCARD_VERIFY}
SELECT doc1, doc2, jaccard FROM jac WHERE jaccard >= 0.8
"""

EMB = """e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)"""

_COS = "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"

ORACLE_OPS["dedup_embedding"] = f"""
WITH {EMB},
p AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2, round({_COS}, 6) AS cos
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT id1, id2, cos FROM p WHERE cos >= 0.4
"""

ORACLE_OPS["ann_topk_bruteforce"] = f"""
WITH {EMB},
p AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, round({_COS}, 6) AS sim
  FROM e a JOIN e b ON a.vec_id != b.vec_id
),
r AS (
  SELECT vec_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM p
)
SELECT vec_id, neighbor_id, sim, rank FROM r WHERE rank <= 5
"""


ORACLE_OPS["knn_label_propagation"] = f"""
WITH {EMB},
p AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, round({_COS}, 6) AS sim
  FROM e a JOIN e b ON a.vec_id != b.vec_id
),
r AS (
  SELECT vec_id, neighbor_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM p
),
v AS (
  SELECT r.vec_id, emb.label AS n_label, count(*) AS votes
  FROM r JOIN embeddings emb ON r.neighbor_id = emb.vec_id
  WHERE r.rank <= 5
  GROUP BY r.vec_id, emb.label
)
SELECT vec_id, CAST(n_label AS INT) AS pred_label, votes FROM (
  SELECT vec_id, n_label, votes,
         row_number() OVER (PARTITION BY vec_id ORDER BY votes DESC, n_label ASC) AS rn
  FROM v)
WHERE rn = 1
"""


def _plane_sql(vec: tuple[float, ...]) -> str:
    return "[" + ", ".join(repr(v) for v in vec) + "]"


def lsh_oracle_sql(planes) -> str:
    """LSH top-k oracle for ANY plane-table shape (the plane tuples
    come from ``core.lsh_planes`` — one generator feeds both engines,
    so the scaled variants stay hash-checkable too)."""

    def bucket_terms(t: int) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product(v, {_plane_sql(planes[t][j])}) >= 0 THEN {1 << j} ELSE 0 END)"
            for j in range(len(planes[t]))
        )

    sig_unions = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, v, {t} AS t, CAST({bucket_terms(t)} AS INT) AS bucket FROM e"
        for t in range(len(planes))
    )
    return f"""
WITH {EMB},
sig AS (
{sig_unions}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS neighbor_id
  FROM sig a JOIN sig b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id != b.vec_id
),
p AS (
  SELECT c.vec_id, c.neighbor_id, round({_COS}, 6) AS sim
  FROM cand c JOIN e a ON a.vec_id = c.vec_id JOIN e b ON b.vec_id = c.neighbor_id
),
r AS (
  SELECT vec_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM p
)
SELECT vec_id, neighbor_id, sim, rank FROM r WHERE rank <= 5
"""


ORACLE_OPS["ann_lsh_bucketed"] = lsh_oracle_sql(LSH_PLANES)

def _ivf_oracle(centroids=None) -> str:
    """IVF top-k oracle for ANY codebook size (codebooks come from
    ``core.ivf_centroids`` — one generator feeds both engines)."""
    from sift_spark.functions.core import IVF_CENTROIDS

    cell_values = ", ".join(
        "({c}, {v}, {n2!r})".format(
            c=c, v=_plane_sql(v), n2=sum(x * x for x in v)
        )
        for c, v in enumerate(centroids if centroids is not None else IVF_CENTROIDS)
    )
    return f"""
WITH {EMB},
cells(cid, cv, n2) AS (VALUES {cell_values}),
celld AS (
  SELECT e.vec_id, (-2 * list_dot_product(e.v, c.cv) + c.n2) AS d, c.cid
  FROM e, cells c
),
ranked AS (
  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
  FROM celld
),
assign AS (SELECT vec_id, cid AS cell FROM ranked WHERE rn = 1),
probes AS (SELECT vec_id, cid FROM ranked WHERE rn <= 2),
cand AS (
  SELECT DISTINCT p.vec_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON a.cell = p.cid AND a.vec_id != p.vec_id
),
p AS (
  SELECT c.vec_id, c.neighbor_id, round({_COS}, 6) AS sim
  FROM cand c JOIN e a ON a.vec_id = c.vec_id JOIN e b ON b.vec_id = c.neighbor_id
),
r AS (
  SELECT vec_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM p
)
SELECT vec_id, neighbor_id, sim, rank FROM r WHERE rank <= 5
"""


ORACLE_OPS["ann_ivf_bucketed"] = _ivf_oracle()

# scaled ANN variants: same algorithms with codebook/bit-width sized
# for ~10x the bench corpus (the scaling rule each operator documents).
# Registered separately so BOTH configurations stay hash-checked.


def _scaled_ann_oracles() -> None:
    from sift_spark.functions.core import ivf_centroids, lsh_planes

    ORACLE_OPS["ann_ivf_scaled"] = _ivf_oracle(ivf_centroids(128))
    ORACLE_OPS["ann_lsh_scaled"] = lsh_oracle_sql(lsh_planes(4, 12))


_scaled_ann_oracles()


_lang_unions = "\n  UNION ALL\n".join(
    "  SELECT doc_id, '{lang}' AS lang, round(avg(CASE WHEN anchor IN ({words}) THEN 1.0 ELSE 0.0 END), 6) AS score FROM tok GROUP BY doc_id".format(
        lang=lang, words=", ".join(f"'{w}'" for w in words)
    )
    for lang, words in LANG_PROFILES
)

ORACLE_OPS["lang_id"] = f"""
WITH {TOKCTE},
scored AS (
{_lang_unions}
)
SELECT doc_id, lang AS lang_pred, score
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn FROM scored)
WHERE rn = 1
"""

_stop_in = ", ".join(f"'{w}'" for w in STOPWORDS)

ORACLE_OPS["quality_score"] = f"""
WITH {TOKCTE},
feats AS (
  SELECT doc_id, count(*) AS n_tokens,
    round(count(DISTINCT anchor) * 1.0 / count(*), 6) AS distinct_ratio,
    round(avg(CASE WHEN anchor IN ({_stop_in}) THEN 1.0 ELSE 0.0 END), 6) AS stopword_ratio,
    round(avg(length(anchor)), 6) AS mean_tok_len
  FROM tok GROUP BY doc_id
)
SELECT doc_id, n_tokens, distinct_ratio, stopword_ratio, mean_tok_len,
       round(distinct_ratio - stopword_ratio + least(n_tokens, 200) / 200.0, 6) AS score
FROM feats
"""

ORACLE_OPS["token_stats"] = f"""
WITH {TOKCTE}
SELECT t.doc_id, count(*) AS n_tokens, d.n_chars,
       CAST(sum(CAST(ceil(length(t.anchor) / 4.0) AS BIGINT)) AS BIGINT) AS n_subwords
FROM tok t JOIN (SELECT doc_id, length(text) AS n_chars FROM documents) d USING (doc_id)
GROUP BY t.doc_id, d.n_chars
"""

def _values_sql(pairs) -> str:
    return ", ".join(f"('{s}', '{t}')" for s, t in pairs)


def _redirect_oracles() -> dict[str, str]:
    from sift_spark.corpora.redirects import SYNTH_REDIRECTS, SYNTH_REDIRECTS_B
    from sift_spark.functions.core import sql_entity_set

    rds = f"rds(source, target) AS (VALUES {_values_sql(SYNTH_REDIRECTS)})"
    rds_b = f"rds_b(source, target) AS (VALUES {_values_sql(SYNTH_REDIRECTS_B)})"
    resolved = """walk AS (
  SELECT source, target, 1 AS depth FROM rds
  UNION ALL
  SELECT w.source, r.target, w.depth + 1 FROM walk w JOIN rds r ON w.target = r.source WHERE w.depth < 8
),
resolved AS (
  SELECT source, target
  FROM (SELECT source, target, row_number() OVER (PARTITION BY source ORDER BY depth DESC) AS rn FROM walk)
  WHERE rn = 1
)"""
    out = {}
    out["resolve_redirects"] = f"""
WITH RECURSIVE {rds},
{resolved}
SELECT source, target FROM resolved
"""
    out["map_redirects"] = f"""
WITH {rds}, {rds_b}
SELECT a.source, coalesce(b.target, a.target) AS target
FROM rds a LEFT JOIN rds_b b ON a.target = b.source
"""
    out["redirect_documents"] = f"""
WITH RECURSIVE tok AS (
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS anchor
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
),
links AS (
  SELECT doc_id, pos, anchor, 'wiki/' || anchor AS target
  FROM tok WHERE anchor IN {sql_entity_set()}
),
{rds},
{resolved}
SELECT coalesce(r.target, l.target) AS target, count(*) AS count
FROM links l LEFT JOIN resolved r ON l.target = r.source
GROUP BY 1
"""
    return out


ORACLE_OPS.update(_redirect_oracles())

_search_terms_sql = ", ".join(f"'{t}'" for t in ("spark", "window", "merge"))

ORACLE_OPS["tfidf_search"] = f"""
WITH {TOKCTE},
tf AS (SELECT doc_id, anchor AS term, count(*) AS tf FROM tok GROUP BY doc_id, anchor),
idf AS (
  SELECT term, round(ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df), 6) AS idf
  FROM (SELECT anchor AS term, count(*) AS df
        FROM (SELECT DISTINCT doc_id, anchor FROM tok) GROUP BY anchor
        HAVING count(*) > 2)
),
w AS (SELECT doc_id, term, sqrt(tf) * idf AS w FROM tf JOIN idf USING (term)),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS norm FROM w GROUP BY doc_id),
q AS (SELECT doc_id, sum(w) AS qw FROM w WHERE term IN ({_search_terms_sql}) GROUP BY doc_id),
scored AS (SELECT q.doc_id, round(q.qw / n.norm, 6) AS score FROM q JOIN norms n ON n.doc_id = q.doc_id WHERE n.norm <> 0)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
  FROM scored)
WHERE rank <= 10
"""

_sample_h = _h64("concat('sample:', cast(doc_id as varchar))")
_split_h = _h64("concat('split:', cast(doc_id as varchar))")

ORACLE_OPS["stratified_sample"] = f"""
SELECT doc_id, lang
FROM (SELECT doc_id, lang, {_sample_h} % 100 AS b FROM documents)
WHERE (lang = 'en' AND b < 20) OR (lang = 'de' AND b < 50)
   OR lang NOT IN ('en', 'de')
"""

ORACLE_OPS["train_test_split"] = f"""
SELECT 'train' AS split, count(*) AS n_docs FROM documents WHERE {_split_h} % 100 >= 10
UNION ALL
SELECT 'test' AS split, count(*) AS n_docs FROM documents WHERE {_split_h} % 100 < 10
"""

def _shingle_sql(where: str) -> str:
    return f"""(
  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents WHERE {where}))
)"""


ORACLE_OPS["contamination_check"] = f"""
WITH sh AS {_shingle_sql("doc_id % 20 <> 0")},
bsh AS (SELECT DISTINCT shingle FROM {_shingle_sql("doc_id % 20 = 0")}),
n_doc AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
n_hit AS (
  SELECT doc_id, count(*) AS n_contaminated FROM sh
  WHERE shingle IN (SELECT shingle FROM bsh) GROUP BY doc_id
)
SELECT d.doc_id, d.n_shingles,
       coalesce(h.n_contaminated, 0) AS n_contaminated,
       round(coalesce(h.n_contaminated, 0) * 1.0 / d.n_shingles, 6) AS contamination
FROM n_doc d LEFT JOIN n_hit h ON d.doc_id = h.doc_id
"""

ORACLE_OPS["doc_fingerprint"] = f"""
WITH {TOKCTE}
SELECT doc_id,
       CAST(CAST(sum(({_h31('anchor')} * ((pos % 64) + 1)) % {MOD31}) AS BIGINT) % {MOD31} AS BIGINT) AS fingerprint
FROM tok GROUP BY doc_id
"""

# deliberately the PER-TOKEN average (avg over occurrences), not the
# Spark implementation's weighted posting-table form Σ tf·lp / Σ tf:
# the two are mathematically equal (verified value-identical at
# sf0.01 and sf0.1), and keeping the oracle structurally different
# preserves its value as an independent check — a conceptual bug in
# the posting-table restructure cannot pass both sides.
ORACLE_OPS["unigram_logprob"] = f"""
WITH {TOKCTE},
ctf AS (SELECT anchor, count(*) AS ctf FROM tok GROUP BY anchor),
tot AS (SELECT sum(ctf) AS t FROM ctf),
p AS (SELECT anchor, ln(ctf * 1.0 / (SELECT t FROM tot)) AS lp FROM ctf)
SELECT doc_id, round(avg(lp), 6) AS avg_logprob
FROM tok JOIN p USING (anchor) GROUP BY doc_id
"""


def _kmeans_ctes(n_iter: int = 2) -> str:
    from sift_spark.functions.core import IVF_CENTROIDS

    cell_values = ", ".join(
        f"({c}, {_plane_sql(v)})" for c, v in enumerate(IVF_CENTROIDS)
    )

    def assign_cte(i: int, cells: str) -> str:
        return f"""d{i} AS (
  SELECT e.vec_id, c.cid,
         (-2 * list_dot_product(e.v, c.cv) + list_dot_product(c.cv, c.cv)) AS d
  FROM e, {cells} c
),
a{i} AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM d{i})
  WHERE rn = 1
)"""

    parts = [f"cells0(cid, cv) AS (VALUES {cell_values})", assign_cte(0, "cells0")]
    for i in range(1, n_iter + 1):
        parts.append(f"""cm{i} AS (
  SELECT cluster AS cid, i AS dim, avg(x) AS m
  FROM (SELECT a.cluster, generate_subscripts(e.v, 1) AS i, unnest(e.v) AS x
        FROM a{i - 1} a JOIN e ON e.vec_id = a.vec_id)
  GROUP BY cluster, i
),
cells{i} AS (SELECT cid, list(m ORDER BY dim) AS cv FROM cm{i} GROUP BY cid)""")
        parts.append(assign_cte(i, f"cells{i}"))
    joined = ",\n".join(parts)
    return f"""
WITH {EMB},
{joined}"""


def _kmeans_oracle(n_iter: int = 2) -> str:
    return f"""{_kmeans_ctes(n_iter)}
SELECT vec_id, cluster FROM a{n_iter}
"""


ORACLE_OPS["kmeans_clusters"] = _kmeans_oracle()


def _semantic_dedup_oracle(threshold: float = 0.35, n_iter: int = 2) -> str:
    """SemDeDup twin: same unrolled k-means rounds, then drop any
    vector whose cluster holds a lower-id vector within ``threshold``
    cosine (6dp round matches the Spark kernel's half-away rounding)."""
    return f"""{_kmeans_ctes(n_iter)},
nrm AS (SELECT vec_id, sqrt(list_dot_product(v, v)) AS nn FROM e),
drops AS (
  SELECT DISTINCT r.vec_id AS dropped
  FROM a{n_iter} l
  JOIN a{n_iter} r ON l.cluster = r.cluster AND l.vec_id < r.vec_id
  JOIN e el ON el.vec_id = l.vec_id
  JOIN e er ON er.vec_id = r.vec_id
  JOIN nrm nl ON nl.vec_id = l.vec_id
  JOIN nrm nr ON nr.vec_id = r.vec_id
  WHERE round(list_dot_product(el.v, er.v) / (nl.nn * nr.nn), 6) >= {threshold}
)
SELECT a.vec_id, a.cluster
FROM a{n_iter} a
WHERE a.vec_id NOT IN (SELECT dropped FROM drops)
"""


ORACLE_OPS["semantic_dedup"] = _semantic_dedup_oracle()

_pack_h = _h64("concat('pack:', cast(doc_id as varchar))")

ORACLE_OPS["pack_sequences"] = f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         {_pack_h} AS h
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY h ASC, doc_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS bin_id,
       CAST((cum - n_tokens) % 2048 AS BIGINT) AS bin_offset
FROM c
"""

ORACLE_OPS["pack_sequences_sharded"] = f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         {_pack_h} AS h, CAST({_pack_h} % 8 AS BIGINT) AS shard_id
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens, shard_id,
         sum(n_tokens) OVER (PARTITION BY shard_id ORDER BY h ASC, doc_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT doc_id, n_tokens, shard_id,
       CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS bin_id,
       CAST((cum - n_tokens) % 2048 AS BIGINT) AS bin_offset
FROM c
"""

ORACLE_OPS["bm25_search"] = f"""
WITH {TOKCTE},
lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
qtf AS (SELECT doc_id, anchor AS term, count(*) AS tf FROM tok
        WHERE anchor IN ({_search_terms_sql}) GROUP BY doc_id, anchor),
df AS (SELECT term, count(*) AS df FROM qtf GROUP BY term),
tt AS (SELECT (SELECT count(*) FROM lens) AS n_docs,
              (SELECT avg(dl) FROM lens) AS avg_dl),
scored AS (
  SELECT q.doc_id, round(sum(
    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf
    / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avg_dl))), 6) AS score
  FROM qtf q JOIN df USING (term) JOIN lens l ON l.doc_id = q.doc_id CROSS JOIN tt
  GROUP BY q.doc_id)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
  FROM scored)
WHERE rank <= 10
"""


def _pq_codes_sql() -> str:
    """Generated argmin-over-centroids SQL for product quantization —
    one SELECT per (subspace, centroid), same constants as the Spark
    kernel, distances rounded to 6dp before the argmin (matching the
    kernel's rounded stable argsort)."""
    from sift_spark.functions.core import PQ_CODEBOOKS, PQ_K, PQ_M, PQ_SUB_DIM

    selects = []
    for m in range(PQ_M):
        for k in range(PQ_K):
            c = PQ_CODEBOOKS[m][k]
            n2 = sum(x * x for x in c)
            dot = " + ".join(
                f"v[{m * PQ_SUB_DIM + d + 1}] * ({c[d]!r})" for d in range(PQ_SUB_DIM)
            )
            selects.append(
                f"SELECT vec_id, {m} AS m, {k} AS k, "
                f"round(-2 * ({dot}) / nrm + {n2!r}, 6) AS dist FROM e"
            )
    union = "\n    UNION ALL\n    ".join(selects)
    return f"""
WITH e AS (SELECT vec_id, embedding AS v,
                  sqrt(list_dot_product(embedding, embedding)) AS nrm
           FROM embeddings),
d AS (
    {union}
),
a AS (
  SELECT vec_id, m, k,
         row_number() OVER (PARTITION BY vec_id, m ORDER BY dist ASC, k ASC) AS rn
  FROM d
)
SELECT vec_id, string_agg(CAST(k AS VARCHAR), ',' ORDER BY m) AS codes
FROM a WHERE rn = 1 GROUP BY vec_id
"""


ORACLE_OPS["pq_codes"] = _pq_codes_sql()


ORACLE_OPS["doc_entropy"] = f"""
WITH {TOKCTE},
tf AS (SELECT doc_id, anchor, count(*) AS c FROM tok GROUP BY doc_id, anchor)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       round(ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(c)) / sum(c), 6) AS entropy
FROM tf GROUP BY doc_id
"""

ORACLE_OPS["bigram_logprob"] = """
WITH pr AS (
  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
),
big AS (SELECT w1, w2, count(*) AS c12 FROM pr GROUP BY w1, w2),
hd AS (SELECT w1, count(*) AS c1 FROM pr GROUP BY w1)
SELECT doc_id, round(avg(ln(c12 * 1.0 / c1)), 6) AS avg_bigram_logprob
FROM pr JOIN big USING (w1, w2) JOIN hd USING (w1)
GROUP BY doc_id
"""

ORACLE_OPS["bpe_pair_counts"] = """
WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
tf AS (SELECT tok, count(*) AS tf FROM tk GROUP BY tok),
prs AS (
  SELECT substr(tok, i, 2) AS pair, tf
  FROM (SELECT tok, tf, unnest(generate_series(1, length(tok) - 1)) AS i
        FROM tf WHERE length(tok) >= 2)
)
SELECT pair, CAST(sum(tf) AS BIGINT) AS n
FROM prs GROUP BY pair HAVING sum(tf) >= 2
"""

ORACLE_OPS["filtered_corpus"] = f"""
WITH kept AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
    FROM documents) WHERE rk = 1
),
ktok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS anchor FROM kept),
feats AS (
  SELECT doc_id, count(*) AS n_tokens,
    round(count(DISTINCT anchor) * 1.0 / count(*), 6) AS distinct_ratio,
    round(avg(CASE WHEN anchor IN ({_stop_in}) THEN 1.0 ELSE 0.0 END), 6) AS stopword_ratio
  FROM ktok GROUP BY doc_id
),
q AS (
  SELECT doc_id, n_tokens,
         round(distinct_ratio - stopword_ratio + least(n_tokens, 200) / 200.0, 6) AS score
  FROM feats WHERE n_tokens >= 10
),
bi AS (
  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bg
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM kept))
),
bs AS (SELECT doc_id, count(*) AS n_bi, count(DISTINCT bg) AS n_bi_d FROM bi GROUP BY doc_id),
r AS (
  SELECT k.doc_id FROM kept k LEFT JOIN bs ON bs.doc_id = k.doc_id
  WHERE round(CASE WHEN n_bi IS NULL THEN 0.0
                   ELSE 1.0 - n_bi_d * 1.0 / n_bi END, 6) <= 0.5
)
SELECT q.doc_id, q.n_tokens, q.score
FROM q JOIN r ON q.doc_id = r.doc_id WHERE q.score >= 0.5
"""

ORACLE_OPS["events_mad"] = """
WITH med AS (SELECT event_type, median(value) AS med FROM events GROUP BY event_type),
dev AS (
  SELECT e.event_type, abs(value - med.med) AS dev, med.med
  FROM events e JOIN med ON e.event_type = med.event_type
),
mad AS (
  SELECT event_type, count(*) AS n, max(med) AS med_, median(dev) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type, n, round(med_, 6) AS med, round(m.mad, 6) AS mad,
       CAST(sum(CASE WHEN dev > 3.0 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m ON d.event_type = m.event_type
GROUP BY d.event_type, n, med_, m.mad
"""


ORACLE_OPS["lang_confusion"] = f"""
WITH {TOKCTE},
scored AS (
{_lang_unions}
),
pred AS (
  SELECT doc_id, lang AS lang_pred
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn FROM scored)
  WHERE rn = 1
)
SELECT d.lang, p.lang_pred, count(*) AS n_docs
FROM documents d JOIN pred p ON d.doc_id = p.doc_id
GROUP BY d.lang, p.lang_pred
"""

ORACLE_OPS["corpus_mix_report"] = """
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       round(avg(length(text)), 6) AS avg_chars
FROM documents GROUP BY source, lang
"""

ORACLE_OPS["events_interarrival"] = """
WITH es AS (
  SELECT event_type, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
),
g AS (
  SELECT event_type,
         es - lag(es) OVER (PARTITION BY event_type ORDER BY es, event_id) AS gap
  FROM es
)
SELECT event_type, count(*) AS n_gaps, round(avg(gap), 6) AS avg_gap_s,
       max(gap) AS max_gap_s
FROM g WHERE gap IS NOT NULL GROUP BY event_type
"""

ORACLE_OPS["basket_pairs"] = """
WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
SELECT a.pk AS part1, b.pk AS part2, count(*) AS support
FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
GROUP BY a.pk, b.pk HAVING count(*) >= 2
"""


ORACLE_OPS["revenue_growth"] = """
WITH rev AS (
  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1
)
SELECT ym, revenue,
       round((revenue - lag(revenue) OVER (ORDER BY ym))
             / lag(revenue) OVER (ORDER BY ym), 6) AS growth
FROM rev
"""

ORACLE_OPS["user_streaks"] = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day
  FROM events
),
isl AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM d
),
st AS (SELECT user_id, grp, count(*) AS len FROM isl GROUP BY user_id, grp)
SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(max(len) AS BIGINT) AS longest_streak
FROM st GROUP BY user_id
"""

ORACLE_OPS["embedding_dim_stats"] = """
WITH d AS (
  SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
)
SELECT dim, count(*) AS n, round(avg(v), 6) AS mean,
       round(stddev_samp(v), 6) AS std,
       round(min(v), 6) AS min_v, round(max(v), 6) AS max_v
FROM d GROUP BY dim
"""


ORACLE_OPS["containment_pairs"] = f"""
WITH {SHINGLES},
inter AS (
  SELECT l.doc_id AS doc1, r.doc_id AS doc2, count(*) AS i
  FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
  GROUP BY l.doc_id, r.doc_id
),
sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)
SELECT doc1, doc2, round(i * 1.0 / least(s1.n_sh, s2.n_sh), 6) AS containment
FROM inter JOIN sz s1 ON inter.doc1 = s1.doc_id
JOIN sz s2 ON inter.doc2 = s2.doc_id
WHERE round(i * 1.0 / least(s1.n_sh, s2.n_sh), 6) >= 0.5
"""

ORACLE_OPS["price_band_join"] = """
WITH bands(lo, hi, band) AS (
  VALUES (0.0, 930.0, 'budget'), (930.0, 970.0, 'mid'),
         (970.0, 10000000.0, 'premium')
)
SELECT band, count(*) AS n_parts, round(avg(p_retailprice), 6) AS avg_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
"""


def _anchor_ambiguity_sql() -> str:
    from sift_spark.functions.core import WIKI_PREFIX, sql_entity_set

    return f"""
WITH {TOKCTE},
nc AS (
  SELECT anchor, '{WIKI_PREFIX}' || anchor AS target, count(*) AS c
  FROM tok WHERE anchor IN {sql_entity_set()} AND anchor <> ''
  GROUP BY anchor, target
)
SELECT anchor, count(*) AS n_targets, CAST(sum(c) AS BIGINT) AS n_mentions,
       round(ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(c)) / sum(c), 6) AS entropy
FROM nc GROUP BY anchor
"""


ORACLE_OPS["anchor_ambiguity"] = _anchor_ambiguity_sql()

ORACLE_OPS["doc_novelty"] = f"""
WITH {SHINGLES},
first AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle)
SELECT s.doc_id, count(*) AS n_shingles,
       CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       round(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS novelty
FROM sh s JOIN first f ON s.shingle = f.shingle
GROUP BY s.doc_id
"""

ORACLE_OPS["dsir_weights"] = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
dtf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok),
raw_tf AS (SELECT tok, sum(tf) AS nr FROM dtf GROUP BY tok),
tgt_tf AS (
  SELECT d.tok, sum(d.tf) AS nt
  FROM dtf d JOIN (SELECT doc_id FROM documents WHERE lang = 'en') e USING (doc_id)
  GROUP BY d.tok
),
v AS (
  SELECT r.tok, r.nr, coalesce(t.nt, 0) AS nt
  FROM raw_tf r LEFT JOIN tgt_tf t ON r.tok = t.tok
),
c AS (SELECT count(*) AS vsz, sum(nr) AS tr, sum(nt) AS tt FROM v),
lr AS (
  SELECT tok,
         ln((nt + 1.0) / (tt + 1.0 * vsz)) - ln((nr + 1.0) / (tr + 1.0 * vsz)) AS lr
  FROM v, c
)
SELECT doc_id, round(avg(lr), 6) AS weight
FROM tok JOIN lr USING (tok)
GROUP BY doc_id
ORDER BY weight DESC, doc_id ASC
LIMIT 100
"""
# ^ per-token avg(lr), not the implementation's Σ tf·lr / Σ tf —
# mathematically equal, structurally independent (see unigram_logprob
# note above; verified value-identical at sf0.01/sf0.1).

ORACLE_OPS["similar_docs"] = """
WITH sh AS (
  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
),
q AS (SELECT shingle FROM sh WHERE doc_id = 7),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
qs AS (SELECT count(*) AS q_sh FROM q),
inter AS (
  SELECT s.doc_id, count(*) AS inter
  FROM sh s JOIN q ON s.shingle = q.shingle
  WHERE s.doc_id != 7
  GROUP BY s.doc_id
)
SELECT i.doc_id,
       round(i.inter * 1.0 / (z.n_sh + (SELECT q_sh FROM qs) - i.inter), 6) AS jaccard,
       CAST(row_number() OVER (ORDER BY round(i.inter * 1.0 / (z.n_sh + (SELECT q_sh FROM qs) - i.inter), 6) DESC, i.doc_id ASC) AS INT) AS rank
FROM inter i JOIN sizes z ON z.doc_id = i.doc_id
ORDER BY jaccard DESC, i.doc_id ASC
LIMIT 10
"""

_cms_h = _h64("concat(cast(d as varchar), ':', cast(user_id as varchar))")

ORACLE_OPS["cms_heavy_hitters"] = f"""
WITH keyed AS (
  SELECT user_id, d, ({_cms_h} % 256) AS bucket
  FROM (SELECT user_id FROM events), unnest(generate_series(0, 3)) AS t(d)
),
sketch AS (SELECT d, bucket, count(*) AS c FROM keyed GROUP BY d, bucket),
tc AS (SELECT user_id, count(*) AS true_count FROM events GROUP BY user_id),
probes AS (
  SELECT user_id, true_count, d, ({_cms_h} % 256) AS bucket
  FROM tc, unnest(generate_series(0, 3)) AS t(d)
),
est AS (
  SELECT p.user_id, p.true_count, min(s.c) AS est_count
  FROM probes p JOIN sketch s ON s.d = p.d AND s.bucket = p.bucket
  GROUP BY p.user_id, p.true_count
)
SELECT user_id, est_count, true_count FROM est WHERE est_count >= 50
"""


ORACLE_OPS["duplicate_spans"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
g AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         array_to_string(list_slice(toks, i, i + 4), ' ') AS gram
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 4)) AS i
        FROM d WHERE len(toks) >= 5)
),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
h AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 5
              THEN 0 ELSE 1 END AS new_island
  FROM h
),
isl2 AS (
  SELECT doc_id, pos,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl
)
SELECT doc_id,
       CAST(min(pos) AS INT) AS start_pos,
       CAST(max(pos) + 5 AS INT) AS end_pos,
       CAST(max(pos) + 5 - min(pos) AS INT) AS n_dup_tokens
FROM isl2 GROUP BY doc_id, island
"""

# same semantics as dedup_ngram_jaccard — the prefix filter is a
# candidate-pruning strategy, not a semantic change
ORACLE_OPS["dedup_jaccard_prefix"] = ORACLE_OPS["dedup_ngram_jaccard"]

ORACLE_OPS["events_attribution"] = """
WITH t AS (
  SELECT event_type,
    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_touch,
    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_touch
  FROM events
)
SELECT first_touch, last_touch, count(*) AS n_conversions
FROM t WHERE event_type = 'purchase'
GROUP BY first_touch, last_touch
"""

ORACLE_OPS["events_ewma"] = """
WITH rn AS (
  SELECT event_id, user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT c.event_id, c.user_id,
       round(sum(p.value * pow(0.7, c.rn - p.rn))
             / sum(pow(0.7, c.rn - p.rn)), 6) AS ewma
FROM rn c JOIN rn p
  ON p.user_id = c.user_id AND p.rn BETWEEN c.rn - 19 AND c.rn
GROUP BY c.event_id, c.user_id
"""

from sift_spark.functions.urls import canonical_url_sql as _curl_sql

_URL_EXPR = (
    "concat('HTTPS://WWW.', upper(source), '.Example.COM:443/Docs/', "
    "CAST(doc_id % 100 AS VARCHAR), '?utm_source=feed&b=', "
    "CAST(doc_id % 3 AS VARCHAR), '&a=', CAST(doc_id % 5 AS VARCHAR), "
    "'#s', CAST(doc_id % 7 AS VARCHAR))"
)

ORACLE_OPS["url_canonical_groups"] = f"""
WITH c AS (
  SELECT doc_id, {_curl_sql(_URL_EXPR)} AS canonical_url FROM documents
)
SELECT canonical_url, count(*) AS n_docs, min(doc_id) AS keep_doc_id
FROM c GROUP BY canonical_url
"""


ORACLE_OPS["session_stats"] = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL THEN 1
         WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800 THEN 1
         ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
),
sess AS (
  SELECT user_id, session_id,
         CAST(floor(min(epoch(ts))) AS BIGINT) AS session_start,
         CAST(floor(max(epoch(ts))) AS BIGINT) AS session_end,
         count(*) AS n_events
  FROM s GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
       round(avg(session_end - session_start), 6) AS avg_session_s,
       round(avg(n_events), 6) AS avg_events
FROM sess GROUP BY user_id
"""

ORACLE_OPS["events_window_uniques"] = """
SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
       event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""

ORACLE_OPS["embedding_normalize"] = """
WITH x AS (
  SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
st AS (SELECT dim, avg(x) AS mu, stddev_pop(x) AS sigma FROM x GROUP BY dim)
SELECT vec_id, dim,
       CASE WHEN sigma = 0 THEN NULL ELSE round((x - mu) / sigma, 6) END AS z
FROM x JOIN st USING (dim)
"""

ORACLE_OPS["ccnet_buckets"] = """
WITH pr AS (
  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
),
big AS (SELECT w1, w2, count(*) AS c12 FROM pr GROUP BY w1, w2),
hd AS (SELECT w1, count(*) AS c1 FROM pr GROUP BY w1),
lp AS (
  SELECT doc_id, round(avg(ln(c12 * 1.0 / c1)), 6) AS avg_bigram_logprob
  FROM pr JOIN big USING (w1, w2) JOIN hd USING (w1)
  GROUP BY doc_id
),
sc AS (
  SELECT l.doc_id, d.lang, l.avg_bigram_logprob
  FROM lp l JOIN documents d ON l.doc_id = d.doc_id
),
rk AS (
  SELECT *,
    row_number() OVER (PARTITION BY lang ORDER BY avg_bigram_logprob DESC, doc_id) AS rn,
    count(*) OVER (PARTITION BY lang) AS n_lang
  FROM sc
)
SELECT doc_id, lang, avg_bigram_logprob,
  CASE WHEN rn * 3 <= n_lang THEN 'head'
       WHEN rn * 3 <= n_lang * 2 THEN 'middle'
       ELSE 'tail' END AS bucket
FROM rk
"""

ORACLE_OPS["hard_negatives"] = f"""
WITH el AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
p AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, round({_COS}, 6) AS sim
  FROM el a JOIN el b ON a.label != b.label
),
r AS (
  SELECT vec_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM p
)
SELECT vec_id, neighbor_id, sim, rank FROM r WHERE rank <= 5
"""

ORACLE_OPS["cluster_balanced_sample"] = f"""{_kmeans_ctes(2)}
SELECT vec_id, cluster FROM (
  SELECT vec_id, cluster,
         row_number() OVER (PARTITION BY cluster
           ORDER BY {_h64("concat('cbal:', cast(vec_id as varchar))")} ASC, vec_id ASC) AS rk
  FROM a2)
WHERE rk <= 30
"""



def _logreg_oracle(n_iter: int = 6) -> str:
    """Unrolled IRLS twin of operators/classify.py: per round one
    row-wise sigmoid CTE, one 14-column gradient/Hessian aggregate
    (9dp-rounded, ridge on the diagonal), and the 4×4 Cramer solve
    pasted VERBATIM from the same formula strings the Spark driver
    evals — identical float-operation order, bit-identical deltas.
    Every round CTE is MATERIALIZED so the w{i-1}-referenced-twice
    recursion can't inline exponentially (the SKILL's CTE gotcha)."""
    from sift_spark.operators.classify import D, RIDGE, newton_delta_formulas

    deltas = newton_delta_formulas()
    xs = [f"x{j}" for j in range(D)]
    margin = " + ".join(f"{x}*w.w{j}" for j, x in enumerate(xs))
    parts = [
        f"""{TOKCTE},
qf AS MATERIALIZED (
  SELECT doc_id, n_tokens, dr, sr,
         round(dr - sr + least(n_tokens, 200) / 200.0, 6) AS score
  FROM (SELECT doc_id, count(*) AS n_tokens,
               round(count(DISTINCT anchor) * 1.0 / count(*), 6) AS dr,
               round(avg(CASE WHEN anchor IN ({_stop_in}) THEN 1.0 ELSE 0.0 END), 6) AS sr
        FROM tok GROUP BY doc_id)
),
feat AS MATERIALIZED (
  SELECT doc_id, 1.0 AS x0, least(n_tokens, 200) / 200.0 AS x1, dr AS x2, sr AS x3,
         CASE WHEN score >= (SELECT quantile_cont(score, 0.5) FROM qf)
              THEN 1.0 ELSE 0.0 END AS y
  FROM qf
)""",
        "nn AS (SELECT count(*) AS n FROM feat)",
        "w0(" + ", ".join(f"w{j}" for j in range(D)) + ") AS MATERIALIZED (SELECT "
        + ", ".join(["0.0"] * D) + ")",
    ]
    for i in range(1, n_iter + 1):
        def _dsum(expr: str) -> str:
            # exact decimal sum of 15dp-quantized contributions —
            # order-independent, matches the Spark side bit-for-bit
            return (
                f"CAST(sum(CAST(round({expr}, 15) AS DECIMAL(20,15))) AS DOUBLE)"
            )

        g_cols = ",\n         ".join(
            f"round({_dsum(f'{x} * (p - y)')} / (SELECT n FROM nn), 9) AS g{j}"
            for j, x in enumerate(xs)
        )
        h_cols = ",\n         ".join(
            f"round({_dsum(f'{xs[r]} * {xs[c]} * p * (1 - p)')} / (SELECT n FROM nn), 9)"
            + (f" + {RIDGE}" if r == c else "") + f" AS h{r}{c}"
            for r in range(D) for c in range(r, D)
        )
        d_cols = ",\n         ".join(
            f"round({deltas[j]}, 9) AS d{j}" for j in range(D)
        )
        w_cols = ", ".join(f"w.w{j} - d.d{j} AS w{j}" for j in range(D))
        parts.append(f"""p{i} AS MATERIALIZED (
  SELECT f.*, 1.0 / (1.0 + exp(-({margin}))) AS p
  FROM feat f CROSS JOIN w{i - 1} w
),
a{i} AS MATERIALIZED (
  SELECT {g_cols},
         {h_cols}
  FROM p{i}
),
d{i} AS MATERIALIZED (
  SELECT {d_cols} FROM a{i}
),
w{i} AS MATERIALIZED (
  SELECT {w_cols} FROM w{i - 1} w CROSS JOIN d{i} d
)""")
    joined = ",\n".join(parts)
    names = ("bias", "len_capped", "distinct_ratio", "stopword_ratio")
    sel = "\nUNION ALL\n".join(
        f"SELECT {j} AS j, '{names[j]}' AS feature, round(w{j}, 6) AS w FROM w{n_iter}"
        for j in range(D)
    )
    return f"WITH {joined}\n{sel}\n"


ORACLE_OPS["quality_classifier"] = _logreg_oracle()


ORACLE_OPS["snapshot_delta"] = """
WITH v2 AS (
  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 13 != 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 17 = 0
),
o AS (SELECT doc_id, md5(text) AS h_old FROM documents),
n AS (SELECT doc_id, md5(text) AS h_new FROM v2)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
  CASE WHEN o.doc_id IS NULL THEN 'added'
       WHEN n.doc_id IS NULL THEN 'deleted'
       WHEN o.h_old != n.h_new THEN 'updated'
       ELSE 'unchanged' END AS change
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
"""


ORACLE_OPS["term_drift"] = """
WITH v2 AS (
  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 13 != 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 17 = 0
),
o AS (SELECT tok AS term, count(*) AS c_old
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) GROUP BY 1),
n AS (SELECT tok AS term, count(*) AS c_new
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM v2) GROUP BY 1),
tot AS (SELECT (SELECT sum(c_old) FROM o) AS t_old, (SELECT sum(c_new) FROM n) AS t_new),
j AS (
  SELECT coalesce(o.term, n.term) AS term,
         coalesce(o.c_old, 0) AS c_old, coalesce(n.c_new, 0) AS c_new
  FROM o FULL OUTER JOIN n ON o.term = n.term
)
SELECT term, c_old, c_new,
       round(c_old * 1e6 / t_old, 6) AS rate_old,
       round(c_new * 1e6 / t_new, 6) AS rate_new,
       round(ln((c_new + 1) * 1.0 / (t_new + 1)) - ln((c_old + 1) * 1.0 / (t_old + 1)), 6) AS log_ratio
FROM j, tot
WHERE c_old + c_new >= 5
"""


def _label_spread_oracle(n_rounds: int = 2, k: int = 5) -> str:
    """Unrolled synchronized label-propagation twin: the kNN edge
    table once, then one vote CTE per round referencing the previous
    label table ONCE (linear plan growth, the pagerank pattern)."""
    parts = [f"""nn AS (
  SELECT vec_id, neighbor_id FROM (
    SELECT vec_id, neighbor_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, round({_COS}, 6) AS sim
          FROM e a JOIN e b ON a.vec_id != b.vec_id))
  WHERE rank <= {k}
)""",
        "l0 AS (SELECT vec_id, label AS cur FROM embeddings)",
    ]
    for i in range(1, n_rounds + 1):
        parts.append(f"""v{i} AS (
  SELECT nn.vec_id, l.cur, count(*) AS votes
  FROM nn JOIN l{i - 1} l ON nn.neighbor_id = l.vec_id
  GROUP BY nn.vec_id, l.cur
),
l{i} AS (
  SELECT vec_id, cur FROM (
    SELECT vec_id, cur,
           row_number() OVER (PARTITION BY vec_id ORDER BY votes DESC, cur ASC) AS rn
    FROM v{i})
  WHERE rn = 1
)""")
    joined = ",\n".join(parts)
    return f"""WITH {EMB},
{joined}
SELECT e0.vec_id, e0.label, l.cur AS pred_label
FROM embeddings e0 JOIN l{n_rounds} l ON e0.vec_id = l.vec_id
"""


ORACLE_OPS["label_spread"] = _label_spread_oracle()


_srp_h = _h31("concat(term, ':', CAST(dim AS VARCHAR))")
_srp_sign = f"CASE WHEN {_srp_h} % 2 = 0 THEN 1.0 ELSE -1.0 END"

ORACLE_OPS["doc_srp_embeddings"] = f"""
WITH {TOKCTE},
tf AS (SELECT doc_id, anchor AS term, count(*) AS tf FROM tok GROUP BY doc_id, anchor),
idf AS (
  SELECT term, round(ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df), 6) AS idf
  FROM (SELECT anchor AS term, count(*) AS df
        FROM (SELECT DISTINCT doc_id, anchor FROM tok) GROUP BY anchor
        HAVING count(*) > 2)
),
wd AS (
  SELECT doc_id, term, tf * idf AS w, unnest(generate_series(0, 15)) AS dim
  FROM tf JOIN idf USING (term)
)
SELECT doc_id, CAST(dim AS INT) AS dim,
       round(sum(w * ({_srp_sign})), 6) AS v
FROM wd GROUP BY doc_id, dim
"""


ORACLE_OPS["decayed_counts"] = """
WITH t AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events
),
mx AS (SELECT max(t) AS t_max FROM t)
SELECT user_id, event_type, count(*) AS n_events,
       round(sum(power(0.5, (t_max - t) / 86400.0)), 6) AS decayed_count,
       CAST(t_max - max(t) AS BIGINT) AS last_seen_secs
FROM t, mx GROUP BY user_id, event_type, t_max
"""


ORACLE_OPS["corpus_datacard"] = f"""
WITH {TOKCTE},
t AS (SELECT d.doc_id, d.lang, d.text, len(string_split(d.text, ' ')) AS n FROM documents d),
scalars AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, CAST(sum(n) AS DOUBLE) AS n_tokens,
         round(avg(n), 6) AS avg_doc_tokens
  FROM t
),
vocab AS (SELECT CAST(count(DISTINCT anchor) AS DOUBLE) AS distinct_terms FROM tok),
lang AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_langs,
         round(max(c) * 1.0 / sum(c), 6) AS top_lang_share
  FROM (SELECT lang, count(*) AS c FROM t GROUP BY lang)
),
dups AS (
  SELECT round((sum(c) - count(*)) * 1.0 / sum(c), 6) AS exact_dup_rate
  FROM (SELECT md5(text) AS h, count(*) AS c FROM t GROUP BY md5(text))
),
q AS (
  SELECT round(avg(score), 6) AS avg_quality FROM (
    SELECT doc_id,
      round(round(count(DISTINCT anchor) * 1.0 / count(*), 6)
            - round(avg(CASE WHEN anchor IN ({_stop_in}) THEN 1.0 ELSE 0.0 END), 6)
            + least(count(*), 200) / 200.0, 6) AS score
    FROM tok GROUP BY doc_id)
)
SELECT m.metric,
  CASE m.metric
    WHEN 'n_docs' THEN (SELECT n_docs FROM scalars)
    WHEN 'n_tokens' THEN (SELECT n_tokens FROM scalars)
    WHEN 'avg_doc_tokens' THEN (SELECT avg_doc_tokens FROM scalars)
    WHEN 'distinct_terms' THEN (SELECT distinct_terms FROM vocab)
    WHEN 'n_langs' THEN (SELECT n_langs FROM lang)
    WHEN 'top_lang_share' THEN (SELECT top_lang_share FROM lang)
    WHEN 'exact_dup_rate' THEN (SELECT exact_dup_rate FROM dups)
    WHEN 'avg_quality' THEN (SELECT avg_quality FROM q)
  END AS value
FROM (VALUES ('n_docs'), ('n_tokens'), ('avg_doc_tokens'), ('distinct_terms'),
             ('n_langs'), ('top_lang_share'), ('exact_dup_rate'), ('avg_quality')) m(metric)
"""


ORACLE_OPS["stratified_kfold"] = f"""
SELECT doc_id, lang AS stratum,
       CAST((row_number() OVER (PARTITION BY lang
              ORDER BY {_h64("concat('fold:', cast(doc_id as varchar))")} ASC, doc_id ASC) - 1) % 5 AS INT) AS fold
FROM documents
"""


ORACLE_OPS["doc_embedding_dup_pairs"] = f"""
WITH {TOKCTE},
tf AS (SELECT doc_id, anchor AS term, count(*) AS tf FROM tok GROUP BY doc_id, anchor),
idf AS (
  SELECT term, round(ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df), 6) AS idf
  FROM (SELECT anchor AS term, count(*) AS df
        FROM (SELECT DISTINCT doc_id, anchor FROM tok) GROUP BY anchor
        HAVING count(*) > 2)
),
wd AS (
  SELECT doc_id, term, tf * idf AS w, unnest(generate_series(0, 15)) AS dim
  FROM tf JOIN idf USING (term)
),
sv AS (
  SELECT doc_id, CAST(dim AS INT) AS dim, round(sum(w * ({_srp_sign})), 6) AS v
  FROM wd GROUP BY doc_id, dim
),
vec AS (SELECT doc_id, list(v ORDER BY dim) AS v FROM sv GROUP BY doc_id),
nz AS (SELECT doc_id, v FROM vec WHERE list_dot_product(v, v) > 0),
p AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2,
         round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
  FROM nz a JOIN nz b ON a.doc_id < b.doc_id
)
SELECT id1, id2, cos FROM p WHERE cos >= 0.9
"""


ORACLE_OPS["heldout_backoff_logprob"] = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks, doc_id % 2 = 0 AS is_train
           FROM documents),
pr AS (
  SELECT doc_id, is_train, toks[i] AS w1, toks[i+1] AS w2
  FROM (SELECT doc_id, is_train, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM d WHERE len(toks) >= 2)
),
big AS (SELECT w1, w2, count(*) AS c12 FROM pr WHERE is_train GROUP BY w1, w2),
hd AS (SELECT w1, count(*) AS c1 FROM pr WHERE is_train GROUP BY w1),
uni AS (SELECT tok AS w2, count(*) AS cu
        FROM (SELECT unnest(toks) AS tok FROM d WHERE is_train) GROUP BY tok),
tot AS (SELECT CAST(sum(len(toks)) AS DOUBLE) AS n_tok FROM d WHERE is_train)
SELECT doc_id,
       round(avg(CASE WHEN c12 IS NOT NULL THEN ln(c12 * 1.0 / c1)
                      ELSE ln(0.4 * coalesce(cu, 1) / n_tok) END), 6) AS avg_backoff_logprob
FROM pr LEFT JOIN big USING (w1, w2) LEFT JOIN hd USING (w1) LEFT JOIN uni USING (w2), tot
WHERE NOT is_train
GROUP BY doc_id
"""


ORACLE_OPS["retrieval_triples"] = f"""
WITH {TOKCTE},
tf AS (SELECT doc_id, anchor AS term, count(*) AS tf FROM tok GROUP BY doc_id, anchor),
idf AS (
  SELECT term, round(ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df), 6) AS idf
  FROM (SELECT anchor AS term, count(*) AS df
        FROM (SELECT DISTINCT doc_id, anchor FROM tok) GROUP BY anchor
        HAVING count(*) > 2)
),
wts AS (SELECT doc_id, term, sqrt(tf) * idf AS wt FROM tf JOIN idf USING (term)),
qt AS (
  SELECT doc_id AS q_doc, term FROM (
    SELECT doc_id, term,
           row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC, term ASC) AS rn
    FROM wts)
  WHERE rn <= 2
),
dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
post AS (SELECT w.term, w.doc_id AS cand, w.wt
         FROM wts w JOIN dfc USING (term) WHERE df <= 1000),
sc AS (
  SELECT q_doc, cand, round(sum(wt), 6) AS neg_score
  FROM qt JOIN post USING (term) WHERE cand != q_doc
  GROUP BY q_doc, cand
),
nk AS (
  SELECT q_doc, cand, neg_score,
         CAST(row_number() OVER (PARTITION BY q_doc ORDER BY neg_score DESC, cand ASC) AS INT) AS neg_rank
  FROM sc
),
qc AS (SELECT q_doc, string_agg(term, ',' ORDER BY term) AS query_terms FROM qt GROUP BY q_doc)
SELECT q_doc AS doc_id, query_terms, neg_rank, cand AS neg_id, neg_score
FROM nk JOIN qc USING (q_doc) WHERE neg_rank <= 2
"""


ORACLE_OPS["corpus_topics"] = f"""
WITH {TOKCTE},
tf AS (SELECT doc_id, anchor AS term, count(*) AS tf FROM tok GROUP BY doc_id, anchor),
idf AS (
  SELECT term, round(ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df), 6) AS idf
  FROM (SELECT anchor AS term, count(*) AS df
        FROM (SELECT DISTINCT doc_id, anchor FROM tok) GROUP BY anchor
        HAVING count(*) > 2)
),
wd AS (
  SELECT doc_id, term, tf * idf AS w, unnest(generate_series(0, 15)) AS dim
  FROM tf JOIN idf USING (term)
),
sv AS (
  SELECT doc_id, CAST(dim AS INT) AS dim, round(sum(w * ({_srp_sign})), 6) AS v
  FROM wd WHERE dim < 6 GROUP BY doc_id, dim
),
tpc AS (
  SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN 1 << dim ELSE 0 END) AS INT) AS topic
  FROM sv GROUP BY doc_id
),
tt AS (
  SELECT t.topic, k.anchor AS term, count(*) AS ttf
  FROM tok k JOIN tpc t ON k.doc_id = t.doc_id GROUP BY t.topic, k.anchor
),
ttot AS (SELECT topic, sum(ttf) AS ttot FROM tt GROUP BY topic),
ctf AS (SELECT anchor AS term, count(*) AS ctf FROM tok GROUP BY anchor),
ctot AS (SELECT sum(ctf) AS ctot FROM ctf),
lift AS (
  SELECT tt.topic, tt.term,
         round((tt.ttf * 1.0 / ttot.ttot) / (ctf.ctf * 1.0 / (SELECT ctot FROM ctot)), 6) AS lift
  FROM tt JOIN ttot USING (topic) JOIN ctf USING (term)
  WHERE tt.ttf >= 2
),
tops AS (
  SELECT topic, string_agg(term, ',' ORDER BY term) AS top_terms
  FROM (SELECT topic, term,
               row_number() OVER (PARTITION BY topic ORDER BY lift DESC, term ASC) AS rn
        FROM lift)
  WHERE rn <= 5 GROUP BY topic
),
sizes AS (SELECT topic, count(*) AS n_docs FROM tpc GROUP BY topic)
SELECT s.topic, s.n_docs, coalesce(t.top_terms, '') AS top_terms
FROM sizes s LEFT JOIN tops t USING (topic)
WHERE s.n_docs >= 3
"""


ORACLE_OPS["event_transitions"] = """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
tr AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY es, event_id) AS from_type,
         event_type AS to_type
  FROM e
),
cnt AS (
  SELECT from_type, to_type, count(*) AS n
  FROM tr WHERE from_type IS NOT NULL GROUP BY from_type, to_type
),
tot AS (SELECT from_type, sum(n) AS row_n FROM cnt GROUP BY from_type)
SELECT c.from_type, c.to_type, c.n, round(c.n * 1.0 / t.row_n, 6) AS p
FROM cnt c JOIN tot t USING (from_type)
WHERE c.n >= 2
"""


ORACLE_OPS["windowed_pmi"] = f"""
WITH {TOKCTE},
pr AS (
  SELECT least(a.anchor, b.anchor) AS term_a, greatest(a.anchor, b.anchor) AS term_b
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id AND b.pos BETWEEN a.pos + 1 AND a.pos + 3
),
pc AS (SELECT term_a, term_b, count(*) AS n FROM pr GROUP BY term_a, term_b),
uni AS (SELECT anchor AS term, count(*) AS c FROM tok GROUP BY anchor),
tots AS (
  SELECT (SELECT CAST(sum(n) AS DOUBLE) FROM pc) AS np,
         (SELECT CAST(sum(c) AS DOUBLE) FROM uni) AS nt
)
SELECT p.term_a, p.term_b, p.n,
       round(ln((p.n / t.np) / ((ua.c / t.nt) * (ub.c / t.nt))), 6) AS pmi
FROM pc p
JOIN uni ua ON ua.term = p.term_a
JOIN uni ub ON ub.term = p.term_b
CROSS JOIN tots t
WHERE p.n >= 5
"""


def _embedding_outliers_oracle(z_max: float = 2.0) -> str:
    from sift_spark.functions.core import IVF_CENTROIDS

    cell_values = ", ".join(
        f"({c}, {_plane_sql(v)})" for c, v in enumerate(IVF_CENTROIDS)
    )
    return f"""
WITH {EMB},
cells(cid, cv) AS (VALUES {cell_values}),
d AS (
  SELECT e.vec_id, c.cid,
         (list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
          + list_dot_product(c.cv, c.cv)) AS draw
  FROM e, cells c
),
a AS (
  SELECT vec_id, cid AS cluster, round(draw, 6) AS d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY draw, cid) AS rn FROM d)
  WHERE rn = 1
),
s AS (
  SELECT cluster, round(avg(d2), 6) AS m, round(stddev_pop(d2), 6) AS sd
  FROM a GROUP BY cluster
)
SELECT a.vec_id, a.cluster, a.d2,
       CASE WHEN s.sd > 0 THEN round((a.d2 - s.m) / s.sd, 6) END AS z,
       coalesce(CASE WHEN s.sd > 0 THEN round((a.d2 - s.m) / s.sd, 6) END > {z_max},
                false) AS is_outlier
FROM a JOIN s USING (cluster)
"""


ORACLE_OPS["embedding_outliers"] = _embedding_outliers_oracle()


def _pii_redact_oracle() -> str:
    """Sequential redaction mirrored stage by stage (email → phone →
    ipv4, each counting + replacing on the PREVIOUS stage's output).
    Patterns come from the same PII_PATTERNS constants (RE2- and
    Java-regex-compatible by construction); DuckDB needs the explicit
    'g' flag where Spark's regexp_replace is global by default."""
    from sift_spark.operators.text_analysis import PII_PATTERNS

    prev = "text"
    stages = []
    for i, (name, pat) in enumerate(PII_PATTERNS, start=1):
        stages.append(
            f"s{i} AS (SELECT * EXCLUDE ({prev}),\n"
            f"  len(regexp_extract_all({prev}, '{pat}')) AS n_{name},\n"
            f"  regexp_replace({prev}, '{pat}', '[{name.upper()}]', 'g') AS t{i}\n"
            f"  FROM {'documents' if i == 1 else f's{i - 1}'})"
        )
        prev = f"t{i}"
    cte = ",\n".join(stages)
    return f"""
WITH {cte}
SELECT * EXCLUDE ({prev}), {prev} AS clean_text FROM s{len(PII_PATTERNS)}
"""


ORACLE_OPS["pii_redact"] = _pii_redact_oracle()


def _profile_sql(table_expr: str, cols: tuple[str, ...], numeric: tuple[str, ...],
                 suffix: str) -> str:
    """One column_profile twin: per column null count, exact distinct
    count, and (numeric only) 6dp-rounded mean — UNION ALL long form
    of the Spark side's single-aggregate + explode (values identical;
    the structural difference is deliberate oracle independence)."""
    parts = []
    for c in cols:
        mv = f"round(avg({c}), 6)" if c in numeric else "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{c}' AS col, count(*) AS n, "
            f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nn, "
            f"count(DISTINCT {c}) AS nd, {mv} AS mv FROM {table_expr}"
        )
    body = "\nUNION ALL ".join(parts)
    return (
        f"SELECT col, nn * 1.0 / n AS nr_{suffix}, nd AS nd_{suffix}, "
        f"mv AS mv_{suffix} FROM ({body})"
    )


def _profile_drift_oracle() -> str:
    old_cols = ("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    new_cols = ("o_orderkey", "o_totalprice", "o_orderstatus", "o_flag")
    numeric = ("o_orderkey", "o_totalprice", "o_flag")
    po = _profile_sql("old_t", old_cols, numeric, "o")
    pn = _profile_sql("new_t", new_cols, numeric, "n")
    return f"""
WITH old_t AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
),
new_t AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus,
         CAST(o_orderkey % 2 AS INT) AS o_flag
  FROM orders
),
po AS ({po}),
pn AS ({pn})
SELECT coalesce(po.col, pn.col) AS "column",
       CASE WHEN nr_o IS NULL THEN 'added'
            WHEN nr_n IS NULL THEN 'removed'
            ELSE 'kept' END AS status,
       round(nr_n - nr_o, 6) AS null_rate_delta,
       round(nd_n / nd_o, 6) AS distinct_ratio,
       round(mv_n - mv_o, 6) AS mean_delta
FROM po FULL OUTER JOIN pn ON po.col = pn.col
"""


ORACLE_OPS["profile_drift"] = _profile_drift_oracle()


ORACLE_OPS["token_zipf_fit"] = f"""
WITH {TOKCTE},
tfr AS (SELECT anchor AS term, count(*) AS f FROM tok GROUP BY anchor),
rk AS (SELECT term, f,
              row_number() OVER (ORDER BY f DESC, term ASC) AS r
       FROM tfr),
pts AS (SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y
        FROM rk WHERE r <= 1000)
SELECT count(*) AS n_terms,
       CASE WHEN var_pop(x) > 0
            THEN round(covar_pop(x, y) / var_pop(x), 6) END AS slope,
       CASE WHEN var_pop(x) > 0
            THEN round(avg(y) - (covar_pop(x, y) / var_pop(x)) * avg(x), 6)
            END AS intercept,
       CASE WHEN var_pop(x) > 0
            THEN round(pow(corr(x, y), 2), 6) END AS r2
FROM pts
"""

ORACLE_OPS["shard_skew_report"] = f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST({_h64("concat('pack:', cast(doc_id as varchar))")} % 8 AS BIGINT)
           AS shard_id
  FROM documents
),
per AS (SELECT shard_id, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM t GROUP BY shard_id),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS _tot,
               CAST(count(*) AS DOUBLE) AS _ns FROM per)
SELECT shard_id, n_docs, n_tokens,
       round(n_tokens / _tot, 6) AS frac_tokens,
       round(n_tokens * _ns / _tot, 6) AS skew
FROM per, tot
"""


ORACLE_OPS["filter_funnel"] = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
  FROM documents
),
f AS (
  SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
),
r AS (
  SELECT doc_id,
    CAST(n AS BIGINT) AS n_words,
    round(list_sum(list_transform(toks, w -> length(w))) * 1.0 / n, 6) AS mean_word_len,
    round(len(list_filter(toks, w -> contains(w, '#') OR contains(w, '...'))) * 1.0 / n, 6) AS symbol_word_frac,
    round(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) * 1.0 / n, 6) AS alpha_word_frac,
    CAST(len(list_filter(list_distinct(toks),
         w -> w IN ('the','be','to','of','and','that','have','with'))) AS BIGINT) AS n_stop_distinct
  FROM f
),
c AS (
  SELECT
    (n_words BETWEEN 50 AND 100000) AS c1,
    (n_words BETWEEN 50 AND 100000)
      AND (mean_word_len BETWEEN 3.0 AND 10.0) AS c2,
    (n_words BETWEEN 50 AND 100000)
      AND (mean_word_len BETWEEN 3.0 AND 10.0)
      AND (symbol_word_frac <= 0.1) AS c3,
    (n_words BETWEEN 50 AND 100000)
      AND (mean_word_len BETWEEN 3.0 AND 10.0)
      AND (symbol_word_frac <= 0.1)
      AND (alpha_word_frac >= 0.8) AS c4,
    (n_words BETWEEN 50 AND 100000)
      AND (mean_word_len BETWEEN 3.0 AND 10.0)
      AND (symbol_word_frac <= 0.1)
      AND (alpha_word_frac >= 0.8)
      AND (n_stop_distinct >= 1) AS c5
  FROM r
)
SELECT count(*) AS n_docs,
       CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS after_n_words,
       CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS after_mean_len,
       CAST(sum(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT) AS after_symbol,
       CAST(sum(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT) AS after_alpha,
       CAST(sum(CASE WHEN c5 THEN 1 ELSE 0 END) AS BIGINT) AS after_stopwords,
       round(sum(CASE WHEN c5 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS pass_rate
FROM c
"""

ORACLE_OPS["vocab_coverage"] = f"""
WITH {TOKCTE},
tfp AS (SELECT doc_id, anchor AS term, count(*) AS tf FROM tok GROUP BY doc_id, anchor),
tot AS (SELECT term, sum(tf) AS f FROM tfp WHERE doc_id % 5 <> 0 GROUP BY term),
v AS (SELECT term FROM (SELECT term, f,
                               row_number() OVER (ORDER BY f DESC, term ASC) AS r
                        FROM tot) WHERE r <= 5000),
ho AS (SELECT term, tf FROM tfp WHERE doc_id % 5 = 0),
base AS (SELECT CAST(coalesce(sum(tf), 0) AS BIGINT) AS heldout_tokens FROM ho),
cov AS (SELECT CAST(coalesce(sum(tf), 0) AS BIGINT) AS covered_tokens FROM ho
        WHERE term IN (SELECT term FROM v)),
nv AS (SELECT count(*) AS n_vocab FROM v)
SELECT n_vocab, heldout_tokens, covered_tokens,
       CASE WHEN heldout_tokens > 0
            THEN round(covered_tokens * 1.0 / heldout_tokens, 6) END AS coverage,
       CASE WHEN heldout_tokens > 0
            THEN round((heldout_tokens - covered_tokens) * 1.0 / heldout_tokens, 6)
            END AS oov_rate
FROM nv, base, cov
"""

# --- ADC (asymmetric PQ distance) twins ------------------------------------
# The PQ codebooks are module literals (one generator feeds both
# engines), so the full IVF-PQ serving math — code assignment, cell
# probing, per-query LUT distance — is SQL-expressible: the kernel's
# `sum_m ||sub_m - c_{code_m}||^2` becomes a (m, code) lookup join
# against a VALUES table plus a generated per-dim difference formula
# in the SAME algebraic form numpy evaluates ((a-b)^2 term by term,
# left-to-right), keeping 6dp-rounded hashes stable cross-engine.


def _adc_ctes() -> str:
    """CTE fragment: per-(m,code) codebook LUT + code-CSV unpack +
    the per-subspace ADC part expression. Expects CTEs `eq` (query
    vec_id, v, nrm) and `cdm` consumers to join lut on (m, k)."""
    from sift_spark.functions.core import PQ_CODEBOOKS, PQ_K, PQ_M, PQ_SUB_DIM

    lut_values = ", ".join(
        f"({m}, {k}, {_plane_sql(PQ_CODEBOOKS[m][k])})"
        for m in range(PQ_M)
        for k in range(PQ_K)
    )
    ms_values = ", ".join(f"({m})" for m in range(PQ_M))
    return lut_values, ms_values


def _adc_part_expr() -> str:
    from sift_spark.functions.core import PQ_SUB_DIM

    return " + ".join(
        f"(eq.v[cdm.m * {PQ_SUB_DIM} + {d}] / eq.nrm - lut.cv[{d}])"
        f" * (eq.v[cdm.m * {PQ_SUB_DIM} + {d}] / eq.nrm - lut.cv[{d}])"
        for d in range(1, PQ_SUB_DIM + 1)
    )


def _ivfpq_topk_oracle(k: int = 5, nprobe: int = 2) -> str:
    """IVF-PQ ANN twin: literal IVF cells for coarse probing, the
    pq_codes twin (verbatim CTE) for candidate codes, LUT-join ADC."""
    from sift_spark.functions.core import IVF_CENTROIDS

    cell_values = ", ".join(
        "({c}, {v}, {n2!r})".format(c=c, v=_plane_sql(v), n2=sum(x * x for x in v))
        for c, v in enumerate(IVF_CENTROIDS)
    )
    lut_values, ms_values = _adc_ctes()
    return f"""
WITH eq AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
            FROM (SELECT vec_id,
                         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                  FROM embeddings)),
cells(cid, cv, n2) AS (VALUES {cell_values}),
celld AS (SELECT eq.vec_id, (-2 * list_dot_product(eq.v, c.cv) + c.n2) AS d, c.cid
          FROM eq, cells c),
rankedc AS (SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
            FROM celld),
assign AS (SELECT vec_id, cid FROM rankedc WHERE rn = 1),
probes AS (SELECT vec_id, cid FROM rankedc WHERE rn <= {nprobe}),
cd AS ({ORACLE_OPS["pq_codes"]}),
ms(m) AS (VALUES {ms_values}),
cdm AS (SELECT cd.vec_id AS neighbor_id, ms.m,
               CAST(string_split(cd.codes, ',')[ms.m + 1] AS INT) AS k
        FROM cd, ms),
cand AS (SELECT p.vec_id, a.vec_id AS neighbor_id
         FROM probes p JOIN assign a ON a.cid = p.cid AND a.vec_id != p.vec_id),
lut(m, k, cv) AS (VALUES {lut_values}),
parts AS (
  SELECT c.vec_id, c.neighbor_id, cdm.m, ({_adc_part_expr()}) AS part
  FROM cand c
  JOIN cdm ON cdm.neighbor_id = c.neighbor_id
  JOIN lut ON lut.m = cdm.m AND lut.k = cdm.k
  JOIN eq ON eq.vec_id = c.vec_id
),
-- list_sum over an m-ORDERED list pins DuckDB's accumulation order
-- (a bare sum() depends on per-group row arrival order). Accepted
-- residual risk, as for every float aggregate rounded at the edge:
-- numpy's pairwise summation on the Spark side could still differ in
-- the last ulp from this sequential fold, flipping only values that
-- sit exactly on a 6dp rounding boundary.
scored AS (SELECT vec_id, neighbor_id,
                  round(list_sum(list(part ORDER BY m)), 6) AS adc_dist
           FROM parts GROUP BY vec_id, neighbor_id),
r AS (SELECT vec_id, neighbor_id, adc_dist,
             CAST(row_number() OVER (PARTITION BY vec_id
                                     ORDER BY adc_dist ASC, neighbor_id ASC) AS INT) AS rank
      FROM scored)
SELECT vec_id, neighbor_id, adc_dist, rank FROM r WHERE rank <= {k}
"""


ORACLE_OPS["ivf_pq_topk"] = _ivfpq_topk_oracle()


def _trained_index_ctes(n_iter: int = 2) -> str:
    """Shared serving-index twin prefix: the kmeans twin (verbatim)
    plus the persisted index's centroid table — ivf/ivfpq_write_index
    store the MEMBER MEAN over the final assignment a{n}, i.e. one
    more centroid update than the assignment itself."""
    return f"""{_kmeans_ctes(n_iter)},
cmq AS (
  SELECT cluster AS cid, i AS dim, avg(x) AS m
  FROM (SELECT a.cluster, generate_subscripts(e.v, 1) AS i, unnest(e.v) AS x
        FROM a{n_iter} a JOIN e ON e.vec_id = a.vec_id)
  GROUP BY cluster, i
),
cellsq AS (SELECT cid, list(m ORDER BY dim) AS cv FROM cmq GROUP BY cid),
celldq AS (
  SELECT e.vec_id, (-2 * list_dot_product(e.v, c.cv) + list_dot_product(c.cv, c.cv)) AS d, c.cid
  FROM e, cellsq c
),
rankedq AS (SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
            FROM celldq),
probesq AS (SELECT vec_id, cid FROM rankedq WHERE rn <= 2),
candq AS (SELECT p.vec_id, a.vec_id AS neighbor_id
          FROM probesq p JOIN a{n_iter} a ON a.cluster = p.cid AND a.vec_id != p.vec_id)"""


def _ivf_query_index_oracle(k: int = 5, n_iter: int = 2) -> str:
    """ivf_write_index → ivf_query_index round-trip twin: trained
    cells + member-mean centroids, nprobe cell probing, exact cosine
    re-rank within the probed cells."""
    return f"""{_trained_index_ctes(n_iter)},
p AS (
  SELECT c.vec_id, c.neighbor_id, round({_COS}, 6) AS sim
  FROM candq c JOIN e a ON a.vec_id = c.vec_id JOIN e b ON b.vec_id = c.neighbor_id
),
r AS (
  SELECT vec_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM p
)
SELECT vec_id, neighbor_id, sim, rank FROM r WHERE rank <= {k}
"""


ORACLE_OPS["ivf_query_index"] = _ivf_query_index_oracle()


def _ivfpq_query_index_oracle(k: int = 5, n_iter: int = 2) -> str:
    """ivfpq_write_index → ivfpq_query_index round-trip twin: same
    trained probing as the IVF twin, but candidates carry only their
    PQ code (pq_codes twin verbatim) and ranking is LUT-join ADC."""
    lut_values, ms_values = _adc_ctes()
    return f"""{_trained_index_ctes(n_iter)},
eq AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
       FROM (SELECT vec_id,
                    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             FROM embeddings)),
cd AS ({ORACLE_OPS["pq_codes"]}),
ms(m) AS (VALUES {ms_values}),
cdm AS (SELECT cd.vec_id AS neighbor_id, ms.m,
               CAST(string_split(cd.codes, ',')[ms.m + 1] AS INT) AS k
        FROM cd, ms),
lut(m, k, cv) AS (VALUES {lut_values}),
parts AS (
  SELECT c.vec_id, c.neighbor_id, cdm.m, ({_adc_part_expr()}) AS part
  FROM candq c
  JOIN cdm ON cdm.neighbor_id = c.neighbor_id
  JOIN lut ON lut.m = cdm.m AND lut.k = cdm.k
  JOIN eq ON eq.vec_id = c.vec_id
),
-- list_sum over an m-ORDERED list pins DuckDB's accumulation order
-- (a bare sum() depends on per-group row arrival order). Accepted
-- residual risk, as for every float aggregate rounded at the edge:
-- numpy's pairwise summation on the Spark side could still differ in
-- the last ulp from this sequential fold, flipping only values that
-- sit exactly on a 6dp rounding boundary.
scored AS (SELECT vec_id, neighbor_id,
                  round(list_sum(list(part ORDER BY m)), 6) AS adc_dist
           FROM parts GROUP BY vec_id, neighbor_id),
r AS (SELECT vec_id, neighbor_id, adc_dist,
             CAST(row_number() OVER (PARTITION BY vec_id
                                     ORDER BY adc_dist ASC, neighbor_id ASC) AS INT) AS rank
      FROM scored)
SELECT vec_id, neighbor_id, adc_dist, rank FROM r WHERE rank <= {k}
"""


ORACLE_OPS["ivfpq_query_index"] = _ivfpq_query_index_oracle()


def _band_tuning_oracle(k: int = MINHASH_K, threshold: float = 0.8) -> str:
    """Twin of dedup.minhash_band_tuning: same factorization list as
    VALUES, and the SAME expression TREE (1 − (1 − (1−t^r)^b)) for
    fn — algebraically pow(...) alone, but floating-point 1−(1−x) can
    differ from x in the last ulp, so both engines compute the
    identical shape before the 6dp edge round."""
    lo = threshold / 2
    vals = ", ".join(f"({b}, {k // b})" for b in range(1, k + 1) if k % b == 0)
    collide = "(1 - pow(1 - pow({s}, rows_per_band), bands))"
    ct = collide.format(s=threshold)
    cl = collide.format(s=lo)
    return f"""
WITH br(bands, rows_per_band) AS (VALUES {vals})
SELECT bands, rows_per_band,
       round({ct}, 6) AS collide_at_threshold,
       round({cl}, 6) AS collide_at_low,
       round(pow(1 - pow(0.5, 1.0 / bands), 1.0 / rows_per_band), 6)
         AS s_curve_midpoint,
       round(1 - {ct}, 6) AS fn_at_threshold
FROM br ORDER BY bands
"""


ORACLE_OPS["minhash_band_tuning"] = _band_tuning_oracle()

ORACLE_OPS["tokenizer_fertility"] = f"""
WITH ts AS ({ORACLE_OPS["token_stats"]})
SELECT d.lang, count(*) AS n_docs,
       CAST(sum(ts.n_tokens) AS BIGINT) AS total_words,
       CAST(sum(ts.n_subwords) AS BIGINT) AS total_subwords,
       CASE WHEN sum(ts.n_tokens) > 0
            THEN round(sum(ts.n_subwords) * 1.0 / sum(ts.n_tokens), 6) END
         AS fertility,
       CASE WHEN sum(ts.n_subwords) > 0
            THEN round(sum(ts.n_chars) * 1.0 / sum(ts.n_subwords), 6) END
         AS chars_per_subword
FROM ts JOIN documents d USING (doc_id)
GROUP BY d.lang ORDER BY d.lang
"""


# --- multimodal twins (r11, VERDICT r10 "what's wrong" #5) -------------------
# The synth payloads are a closed form of doc_id (multimodal.py
# SYNTH_* constants, imported so the twin can't drift), so DuckDB can
# regenerate every expected PIXEL with generate_series and demand
# EXACT integer checksum equality against what Spark actually
# inflated from the zlib SRAW/SVID payloads. Integer sums (not 6dp
# floats) — no cross-engine rounding-tie hazard; the position weight
# in the frame twin catches pixel permutations a plain sum would miss.
from sift_spark.operators.multimodal import (  # noqa: E402
    SYNTH_C_MUL,
    SYNTH_DID_MUL,
    SYNTH_FRAME_STEP,
    SYNTH_N_FRAMES,
    SYNTH_X_MUL,
    SYNTH_Y_MUL,
)

_MM_PX = f"""mmpx AS (
  SELECT d.doc_id AS media_id, y.y AS y, x.x AS x, c.c AS c,
         (d.doc_id * {SYNTH_DID_MUL} + y.y * {SYNTH_Y_MUL}
          + x.x * {SYNTH_X_MUL} + c.c * {SYNTH_C_MUL}) % 256 AS pv
  FROM documents d,
       (SELECT unnest(generate_series(0, 15)) AS y) y,
       (SELECT unnest(generate_series(0, 15)) AS x) x,
       (SELECT unnest(generate_series(0, 2)) AS c) c
)"""

ORACLE_OPS["multimodal_features"] = f"""
WITH {_MM_PX}
SELECT media_id, 'image' AS kind, 16 AS width, 16 AS height, 3 AS channels,
       CAST(sum(pv) AS BIGINT) AS px_sum,
       CAST(sum(pv * pv) AS BIGINT) AS px_sumsq
FROM mmpx GROUP BY media_id
"""

ORACLE_OPS["multimodal_frame_stats"] = f"""
WITH {_MM_PX},
fpx AS (
  SELECT media_id, f.f AS frame_idx,
         (pv + {SYNTH_FRAME_STEP} * f.f) % 256 AS fv,
         (y * 16 + x) * 3 + c + 1 AS wgt
  FROM mmpx, (SELECT unnest(generate_series(0, {SYNTH_N_FRAMES - 1})) AS f) f
),
pmf AS (
  SELECT media_id, frame_idx, sum(fv) AS ps, sum(fv * wgt) AS pw
  FROM fpx GROUP BY media_id, frame_idx
)
SELECT CAST(frame_idx AS INT) AS frame_idx, count(*) AS n_frames,
       CAST(sum(ps) AS BIGINT) AS px_sum_total,
       CAST(sum(pw) AS BIGINT) AS px_wsum_total
FROM pmf GROUP BY frame_idx
"""

# Independent SQL re-implementation of the 2x2 area-mean resize,
# INCLUDING numpy's round-half-to-even tie rule: block sum s of 4
# uint8s → mean s/4 → ties (s%4 == 2) round toward the even quotient.
ORACLE_OPS["multimodal_resize_checksums"] = f"""
WITH blk AS (
  SELECT d.doc_id AS media_id, y2.y2 AS y2, x2.x2 AS x2, c.c AS c,
         sum((d.doc_id * {SYNTH_DID_MUL} + (2 * y2.y2 + dy.dy) * {SYNTH_Y_MUL}
              + (2 * x2.x2 + dx.dx) * {SYNTH_X_MUL}
              + c.c * {SYNTH_C_MUL}) % 256) AS s
  FROM documents d,
       (SELECT unnest(generate_series(0, 7)) AS y2) y2,
       (SELECT unnest(generate_series(0, 7)) AS x2) x2,
       (SELECT unnest(generate_series(0, 2)) AS c) c,
       (SELECT unnest(generate_series(0, 1)) AS dy) dy,
       (SELECT unnest(generate_series(0, 1)) AS dx) dx
  GROUP BY d.doc_id, y2.y2, x2.x2, c.c
),
rp AS (
  SELECT media_id,
         (s // 4) + (CASE WHEN s % 4 = 3 THEN 1
                          WHEN s % 4 = 2 AND (s // 4) % 2 = 1 THEN 1
                          ELSE 0 END) AS v2
  FROM blk
)
SELECT media_id, 8 AS width, 8 AS height, 3 AS channels,
       CAST(sum(v2) AS BIGINT) AS px_sum,
       CAST(sum(v2 * v2) AS BIGINT) AS px_sumsq
FROM rp GROUP BY media_id
"""
