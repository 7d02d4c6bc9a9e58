"""Distributed linear-classifier training for corpus curation.

The quality-classifier step of an LLM data pipeline (the GPT-3/CCNet
"looks like the reference corpus" filter): logistic regression over
per-document quality features — here distilling the rule-based
``quality_score`` filter into a model (label = score at/above the
corpus median), which doubles as a strong correctness check: training
must recover the generating rule's weights (≈ C·[−θ, +1, +1, −1] for
bias/length/distinct/stopword), and it does (tested).

Trained with IRLS / Newton steps (5-8 iterations to convergence vs
thousands for plain GD). Distribution shape per iteration: the
sigmoid residual is ROW-WISE over the per-doc feature table (weights
ride along as literals — no join, no shuffle), then ONE global
aggregate returns the d-vector gradient and d×d Hessian partials as a
single 14-column row; the 4×4 Newton solve runs on the driver — the
same partial-aggregate-to-driver pattern MLlib's LogisticRegression
uses. Only O(d²) scalars ever reach the driver.

Cross-engine determinism (the DuckDB oracle hash-matches): per-row
gradient/Hessian contributions are quantized to 15dp and summed as
DECIMALs — exact, order-independent arithmetic, so the partials are
bit-identical on any partitioning and across engines (plain float
sums are not: near convergence the Hessian is ridge-dominated and
H⁻¹ amplifies a single 1e-9 rounding flip by 1/RIDGE — measured
3e-5 weight drift vs a numpy twin before the decimal fix). The
Cramer's-rule solve is generated ONCE as an arithmetic formula string
evaluated verbatim by both Python (driver) and SQL (oracle) — same
operation order, bit-identical deltas, rounded to 9dp.

No counterpart in the reference (predates the operator class); the
trained model serves `filtered_corpus`-style pipelines.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sift_spark.functions.core import STOPWORDS, tokens

# quantization units, hoisted: the driver IRLS twin quantizes ~14
# contributions per grouped row per round — constructing the unit
# Decimal (and re-resolving the decimal imports) inside each call was
# ~40% of the measured training wall at sf0.1 (cProfile: 210k calls)
_QUANTA: dict[int, Decimal] = {}


def _quantum(scale: int) -> Decimal:
    q = _QUANTA.get(scale)
    if q is None:
        q = _QUANTA.setdefault(scale, Decimal(f"1E-{scale}"))
    return q

# feature names in weight order; x0 is the bias
FEATURES = ("bias", "len_capped", "distinct_ratio", "stopword_ratio")
D = len(FEATURES)
# with exact decimal partials the residual cross-engine diff is
# ~1e-17 (libm exp ULPs), so H⁻¹'s 1/RIDGE amplification stays far
# below the 6dp output resolution (see determinism note above)
RIDGE = 1e-4


def _round_half_up(x: float, scale: int) -> float:
    """The driver-leg twin of Spark ``F.round(x, scale)``: quantize
    the SHORTEST-DECIMAL-REPR of the double (what BigDecimal.valueOf
    / Double.toString yields — Python ``repr`` produces the same
    shortest round-trip decimal) with HALF_UP. Empirically this is
    also what DuckDB's ``round(double, s)`` computes on tie-adjacent
    values, so ONE rounding mechanism now covers all three delta
    legs: in-plan F.round, this driver leg, and the oracle.

    Python's builtin ``round`` is half-even over the EXACT binary
    expansion — a different mechanism that flips the last digit on
    tie-adjacent values (measured: round(1.5e-9, 9) = 1e-9 vs 2e-9
    for Spark/DuckDB/here), which 1/RIDGE then amplifies ~1e4×.
    Tested tie-adjacent against live F.round in test_classify."""
    return float(
        Decimal(repr(x)).quantize(_quantum(scale), rounding=ROUND_HALF_UP)
    )


def _round9(x: float) -> float:
    return _round_half_up(x, 9)


# Driver gate for the IRLS loop: the grouped feature table is usually
# tiny (quantized features collapse 50k sf1 docs to 4.6k vectors), and
# each DISTRIBUTED fused round costs ~1.1s of pure plan-analysis +
# codegen on a cache that one Python loop crunches in milliseconds —
# the same small-input/driver split as the CC edge gate and the
# tokenizer trainers. At or below the limit the grouped rows are
# collected once and the rounds run in a BIT-FAITHFUL Python twin of
# the decimal aggregate (see _driver_partials); above it the
# distributed rounds run unchanged. 32k rows ≈ 1.5 MB collected and
# ~0.5s of Decimal arithmetic — past that the distributed aggregate
# wins again.
LOGREG_DRIVER_GROUP_LIMIT_CONF = "spark.sift.logreg.driverGroupLimit"
LOGREG_DRIVER_GROUP_LIMIT = 32768


def _dec15(x: float):
    """The driver twin of ``F.round(e, 15).cast("decimal(20,15)")``:
    HALF_UP on the shortest decimal repr (same mechanism as
    _round_half_up), re-quantized as a Decimal — exactly the value the
    in-plan cast produces (BigDecimal.valueOf → setScale HALF_UP)."""
    q = _quantum(15)
    return Decimal(repr(_round_half_up(x, 15))).quantize(q, rounding=ROUND_HALF_UP)


def _driver_partials(groups, w, names):
    """One IRLS round's gradient/Hessian partials over collected
    grouped rows — operation-for-operation the Python twin of the
    distributed decimal aggregate (same left-fold margin, same
    contribution expressions, 15dp HALF_UP quantization, exact
    integer-weighted Decimal sums, double conversion, /n, 9dp round),
    so the two paths return bit-identical partials. The one shared
    assumption is libm exp agreeing with JVM exp at the 15dp
    quantization boundary — asserted by the driver-vs-distributed
    equality test and by every oracle hash (DuckDB is libm too)."""
    import math

    # numeric-index accumulators in the SAME name order (g0..g3, then
    # the upper-triangle h's) and the SAME per-group addition order as
    # the dict-keyed original — bit-identical sums, minus ~14 f-string
    # formats + dict lookups per group per round (measured in the
    # sf0.1 profile alongside the _dec15 hoists above)
    hidx = [(r, c) for r in range(D) for c in range(r, D)]
    dec15 = _dec15
    g_acc = [Decimal(0)] * D
    h_acc = [Decimal(0)] * len(hidx)
    n = 0
    for x1, x2, x3, y, m in groups:
        x = (1.0, x1, x2, x3)
        margin = sum(x[j] * w[j] for j in range(D))
        p = 1.0 / (1.0 + math.exp(-margin))
        for j in range(D):
            g_acc[j] += m * dec15(x[j] * (p - y))
        for i, (r, c) in enumerate(hidx):
            # expression verbatim from the distributed aggregate —
            # float op order is part of the bit-exactness contract
            h_acc[i] += m * dec15(x[r] * x[c] * p * (1 - p))
        n += m
    accs = {f"g{j}": g_acc[j] for j in range(D)}
    accs.update({f"h{r}{c}": h_acc[i] for i, (r, c) in enumerate(hidx)})
    return {k: _round9(float(v) / n) for k, v in accs.items()}


def _det3(m: list[list[str]]) -> str:
    return (
        f"{m[0][0]}*({m[1][1]}*{m[2][2]} - {m[1][2]}*{m[2][1]})"
        f" - {m[0][1]}*({m[1][0]}*{m[2][2]} - {m[1][2]}*{m[2][0]})"
        f" + {m[0][2]}*({m[1][0]}*{m[2][1]} - {m[1][1]}*{m[2][0]})"
    )


def _det4(m: list[list[str]]) -> str:
    terms = []
    for j in range(4):
        minor = [[m[r][c] for c in range(4) if c != j] for r in range(1, 4)]
        sign = "" if j % 2 == 0 else "-"
        terms.append(f"{sign}{m[0][j]}*({_det3(minor)})")
    return " + ".join(terms)


def _h_sym(r: int, c: int) -> str:
    # the aggregate only materializes the upper triangle
    return f"h{min(r, c)}{max(r, c)}"


def newton_delta_formulas() -> list[str]:
    """Cramer's-rule solve H·delta = g as D formula strings over the
    symbols h00..h33 (upper triangle) and g0..g3. The SAME strings are
    eval'd on the driver and pasted into the oracle SQL, so both
    engines perform the identical float operations in the identical
    order."""
    H = [[_h_sym(r, c) for c in range(D)] for r in range(D)]
    det = f"({_det4(H)})"
    out = []
    for j in range(D):
        M = [[(f"g{r}" if c == j else H[r][c]) for c in range(D)] for r in range(D)]
        out.append(f"({_det4(M)}) / {det}")
    return out


_DELTAS = newton_delta_formulas()


def quality_features(docs: DataFrame) -> DataFrame:
    """Per-doc engineered features, all O(1)-scaled:
    (doc_id, x0..x3, y) with x0 = 1 (bias), x1 = min(n_tokens,200)/200,
    x2 = distinct_ratio, x3 = stopword_ratio, and the training label
    y = 1 iff the composite quality score is at or above the corpus
    median. Entirely MAP-SIDE: per-doc ratios come from array ops over
    the token array (``array_distinct``/``filter`` sizes), not an
    explode + doc-keyed re-aggregate — the corpus never shuffles
    (measured 8.0s → map-only at sf1; values bit-identical: k/n is the
    same IEEE division either way). The median is a 1-row broadcast."""
    feats = _feature_base(docs)
    med = feats.agg(F.expr("percentile(score, 0.5)").alias("med"))
    return (
        feats.crossJoin(F.broadcast(med))
        .select(
            "doc_id",
            F.lit(1.0).alias("x0"),
            (F.least(F.col("n_tokens"), F.lit(200)) / 200.0).alias("x1"),
            F.col("dr").alias("x2"),
            F.col("sr").alias("x3"),
            (F.col("score") >= F.col("med")).cast("double").alias("y"),
        )
    )


def _feature_base(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, dr, sr, score) — the map-only feature pass
    shared by :func:`quality_features` (per-doc) and
    :func:`logreg_train` (grouped)."""
    # reuse the session's tokenized-corpus artifact when handed one —
    # trusted via column-metadata provenance (functions.core
    # is_token_artifact), never the bare column name: a user frame
    # with its own ``toks`` column must not silently skip the split
    from sift_spark.functions.core import is_token_artifact

    toks = (
        docs.select("doc_id", "toks")
        if is_token_artifact(docs)
        else docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    ).where(F.size("toks") > 0)  # explode dropped token-less docs; keep that
    n_toks = F.size("toks")
    return toks.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        F.round(F.size(F.array_distinct("toks")) / n_toks, 6).alias("dr"),
        F.round(
            F.size(F.filter("toks", lambda t: t.isin(*STOPWORDS))) / n_toks, 6
        ).alias("sr"),
    ).withColumn(
        "score",
        F.round(
            F.col("dr") - F.col("sr") + F.least(F.col("n_tokens"), F.lit(200)) / 200.0,
            6,
        ),
    )


def logreg_train(docs: DataFrame, n_iter: int = 6) -> list[float]:
    """IRLS on :func:`quality_features`; returns the D weight list.

    Scale shape: the features are QUANTIZED (x1 has 201 values, x2/x3
    are 6dp ratios), so the corpus collapses to its distinct feature
    vectors with multiplicities — one map-side-combined aggregate
    (measured 50k docs → 4.6k vectors at sf1), and every IRLS round
    scans only the tiny grouped table. The weighted partials are
    EXACT: all m rows of a group share the identical contribution
    c = round(·, 15), and decimal(14,0) × decimal(20,15) → (35,15)
    multiplies exactly, so Σ_groups m·c ≡ Σ_rows c bit-for-bit — the
    DuckDB oracle (which sums per-row) needs no change. Degenerate
    worst case (every doc a distinct vector) degrades to the per-row
    cost, never worse. The label median is the frequency-weighted
    ``percentile(score, 0.5, m)`` — definitionally the per-row
    percentile. Each round is ONE job; the corpus count rides in the
    round-0 aggregate (no separate ``count()``)."""
    base = _feature_base(docs)
    g = (
        base.select(
            (F.least(F.col("n_tokens"), F.lit(200)) / 200.0).alias("x1"),
            F.col("dr").alias("x2"),
            F.col("sr").alias("x3"),
            "score",
        )
        .groupBy("x1", "x2", "x3", "score")
        .agg(F.count(F.lit(1)).alias("m"))
        # the grouped table is tiny (4.6k rows at sf1); one cached
        # partition makes each IRLS round a single task instead of
        # spark.sql.shuffle.partitions tasks (values are partitioning-
        # independent by the decimal-exact construction)
        .coalesce(1)
        .persist()
    )
    w = [0.0] * D
    try:
        med = g.agg(
            F.expr("percentile(score, 0.5, m)")
        ).collect()[0][0]  # one corpus pass; fills g's cache
        if med is None:
            # an empty corpus (first micro-batch reality) trains nothing
            return w

        # driver gate (see LOGREG_DRIVER_GROUP_LIMIT): small grouped
        # tables iterate in the bit-faithful Python twin — the collect
        # reads the cache the med aggregate just filled
        spark = docs.sparkSession
        limit = int(
            spark.conf.get(LOGREG_DRIVER_GROUP_LIMIT_CONF, str(LOGREG_DRIVER_GROUP_LIMIT))
        )
        rows = g.limit(limit + 1).collect() if limit > 0 else []
        if 0 < len(rows) <= limit:
            groups = [
                (r["x1"], r["x2"], r["x3"],
                 1.0 if r["score"] >= float(med) else 0.0, r["m"])
                for r in rows
            ]
            names = [f"g{j}" for j in range(D)] + [
                f"h{r}{c}" for r in range(D) for c in range(r, D)
            ]
            for _ in range(n_iter):
                env = _driver_partials(groups, w, names)
                for j in range(D):
                    env[f"h{j}{j}"] += RIDGE
                for j in range(D):
                    d = eval(_DELTAS[j], {"__builtins__": {}}, env)  # noqa: S307 — generated arithmetic, shared verbatim with the SQL oracle
                    w[j] = w[j] - _round9(d)
            return w

        feat = g.select(
            F.lit(1.0).alias("x0"),
            "x1",
            "x2",
            "x3",
            (F.col("score") >= F.lit(float(med))).cast("double").alias("y"),
            "m",
        )
        xs = [f"x{j}" for j in range(D)]
        m_dec = F.col("m").cast("decimal(14,0)")
        w_schema = ", ".join(f"w{j} double" for j in range(D))

        # the per-round expressions reference only COLUMNS (weights
        # arrive through the broadcast relation below), so the whole
        # expression forest is built ONCE — the nested decimal trees
        # cost ~0.5s/round in py4j chatter if rebuilt inside the loop
        margin = sum(F.col(x) * F.col(f"w{j}") for j, x in enumerate(xs))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))

        def dsum(e):
            # EXACT weighted sum: the group's per-row contribution
            # quantized to a 15dp decimal, multiplied exactly by
            # its multiplicity, summed with decimal arithmetic —
            # identical on any partitioning/grouping and in the
            # per-row DuckDB twin
            return F.sum(m_dec * F.round(e, 15).cast("decimal(20,15)")).cast("double")

        raw = [
            dsum(F.col(x) * (F.col("p") - F.col("y"))).alias(f"g{j}")
            for j, x in enumerate(xs)
        ]
        names = [f"g{j}" for j in range(D)]
        for r in range(D):
            for c in range(r, D):
                raw.append(
                    dsum(
                        F.col(xs[r]) * F.col(xs[c]) * F.col("p") * (1 - F.col("p"))
                    ).alias(f"h{r}{c}")
                )
                names.append(f"h{r}{c}")
        # normalize by the fused count inside the same single-job
        # plan: round(sum/n, 9) is the identical JVM double op
        # whether n arrives as a literal or the count column
        outs = [F.round(F.col(k) / F.col("n"), 9).alias(k) for k in names]
        w_cols = [f"w{j}" for j in range(D)]
        # the producing weights ride through the aggregate (they are
        # constant over the 1-row crossJoin) so a fused second
        # half-step — and the driver's final solve — can read them
        w_rides = [F.min(f"w{j}").alias(f"w{j}") for j in range(D)]

        def _partials(wdf):
            # weights ride in a 1-row broadcast frame, NOT as
            # literals: every round's plan then generates IDENTICAL
            # code, so Janino's codegen cache hits instead of
            # recompiling the 14 decimal aggregates per round
            # (measured ~1.0s → ~0.3s per round at sf1)
            pr = feat.crossJoin(F.broadcast(wdf)).withColumn("p", p)
            return pr.agg(*raw, F.sum("m").alias("n"), *w_rides).select(
                *outs, *w_cols
            )

        def _sql_step(partials):
            # the identical Newton solve the driver performs, as
            # generated SQL over the 1-row partials frame: ridge the
            # diagonal, evaluate the SAME Cramer formula strings
            # (same IEEE ops in the same order), 9dp-round the deltas.
            # Fusing two half-steps per action halves the sequential
            # driver round-trips — the floor the sf1 study measured.
            ridged = partials.select(
                *[F.col(f"g{j}") for j in range(D)],
                *[
                    (F.col(f"h{r}{c}") + F.lit(RIDGE)).alias(f"h{r}{c}")
                    if r == c
                    else F.col(f"h{r}{c}")
                    for r in range(D)
                    for c in range(r, D)
                ],
                *w_cols,
            )
            return ridged.select(
                *[
                    (F.col(f"w{j}") - F.round(F.expr(_DELTAS[j]), 9)).alias(f"w{j}")
                    for j in range(D)
                ]
            )

        it = 0
        while it < n_iter:
            wdf = spark.createDataFrame([tuple(w)], w_schema)
            # up to three IRLS half-steps share one action: the
            # intermediate rounds' partials stay 1-row frames solved
            # in-plan (the chain is linear — each aggregate is a
            # barrier referenced once — so the plan grows linearly,
            # not 4^n), and only the last round's partials return to
            # the driver. 3 is the measured sweet spot: deeper chains
            # pay more per-action analysis than they save in
            # round-trips.
            steps = min(3, n_iter - it)
            frame = _partials(wdf)
            for _ in range(steps - 1):
                frame = _partials(_sql_step(frame))
            row = frame.collect()[0]
            it += steps
            env = {k: float(row[k]) for k in names}
            for j in range(D):
                env[f"h{j}{j}"] += RIDGE
            for j in range(D):
                d = eval(_DELTAS[j], {"__builtins__": {}}, env)  # noqa: S307 — generated arithmetic, shared verbatim with the SQL oracle
                w[j] = float(row[f"w{j}"]) - _round9(d)
    finally:
        g.unpersist()
    return w


def quality_classifier(docs: DataFrame, n_iter: int = 6) -> DataFrame:
    """The trained classifier as a table: (j, feature, w) — the
    artifact a pipeline persists and applies map-side
    (:func:`classifier_scores`)."""
    spark = docs.sparkSession
    w = logreg_train(docs, n_iter=n_iter)
    return spark.createDataFrame(
        [(j, FEATURES[j], _round_half_up(v, 6)) for j, v in enumerate(w)],
        "j int, feature string, w double",
    )


def classifier_scores(docs: DataFrame, w: list[float]) -> DataFrame:
    """Apply trained weights: (doc_id, p, y). Row-wise over the
    feature table — the weights ride in the plan as literals; no
    shuffle beyond the one feature aggregate."""
    feat = quality_features(docs)
    margin = sum(F.col(f"x{j}") * F.lit(float(w[j])) for j in range(D))
    return feat.select(
        "doc_id",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), 6).alias("p"),
        "y",
    )
