"""Trainable linear text classifier — the fastText-supervised analog
for corpus curation (Joulin et al. 2016, "Bag of Tricks for Efficient
Text Classification"; public arXiv:1607.01759).

Production LLM-data pipelines train lightweight linear classifiers over
hashed bag-of-words features to score documents (the CCNet / LLaMA
"quality classifier" stage, GPT-3's WebText-vs-CommonCrawl filter).
This module implements that machinery as DataFrames:

- HASHING-TRICK FEATURES: token -> md5 bucket in [0, HASH_DIM) (the
  engine-portable construction every sampling/minhash operator here
  shares), counts normalized by document length, plus a bias feature.
  The feature relation is sparse ``(doc_id, feat, cnt, n)`` — O(total
  tokens) rows, never a dense vector column.
- FULL-BATCH LOGISTIC REGRESSION by gradient descent, each step two
  shuffles: margins (feature ⋈ broadcast weights, sum per doc) and
  gradients (errors ⋈ features, sum per feature). The weight vector
  (HASH_DIM+1 rows) is a driver-sized model like the k-means centroid
  set — collected once per iteration, the correct driver touchpoint.
- BIT-DETERMINISTIC TRAINING: every cross-row sum is computed in
  DECIMAL (margins: exact ``cnt * w`` products; gradients: per-row
  contributions rounded to 12 dp then summed exactly), so the trained
  weights are identical under any partitioning / executor count — the
  house scaled-decimal idiom (relational.q_hash_agg, kmeans exact
  means). The only floats are the per-row sigmoid/logloss, computed
  pointwise from decimal-exact inputs.
- The demonstration task is prose-vs-keyword-spam (``prose_labels``;
  labels derive deterministically from the corpus and are linearly
  learnable through the stopword buckets), but ``train_classifier``
  takes any (doc_id, y) relation — a quality label set plugs in
  unchanged.

Scale: one tokenize+explode scan builds the feature relation (cache it
across iterations on a real run); each GD step moves O(nnz) rows
through two hash shuffles with map-side partial aggregation — the
honest full-batch shape. At 100 TB you'd subsample rounds with
``sampling.deterministic_sample`` (deterministic SGD) or train on a
``budget_select`` prefix; both compose with this module unchanged.

Reference parity note: the reference (412 LoC Express ingestion API)
has no ML surface; this is BASELINE.json north-star tier. Oracle
strategy (driver-grade, in tests/test_unregistered_ops.py): the first
gradient step is DuckDB-pinned bit-for-bit; the training loop carries
determinism + loss-monotonicity + holdout-accuracy invariants; the
persisted model's scores are pinned identical to in-memory scoring.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, stopword_hits, tokenize
from ..sources import commit_protocol
from ..sources.loader import load_table

# hashing-trick width: sized so the collision rate over the corpus
# vocabulary is negligible (the standard fastText knob — raising it
# trades model rows for signal purity; the distributed aggregates only
# materialize OCCUPIED buckets, so a wider table costs ~nothing here)
HASH_DIM = 2048
BIAS_FEAT = HASH_DIM  # bias rides as one more feature with x = 1
# learning rate is the EXACT rational 1/LR_INV so the decimal update
# divides by an integer (controlled rounding), never by a float
LR_INV = 2
N_ITERS = 6  # Newton/IRLS passes — logistic regression converges in ~6
_WDEC = "decimal(18,12)"
_GDEC = "decimal(28,12)"
# Broadcast-hint bound for the per-doc (resid, wt) relation inside
# newton_step (r14, VERDICT r13 #7): one ~50-byte-framed row per
# LABELED training document, so 20 M labels is ~1 GB — comfortably
# under the 8 GB / 512 M-row broadcast relation cap and a driver heap
# that holds the (D+1)² solve anyway. A labeled set is curated (human
# or model annotations), so in practice it is millions, not corpus-
# sized; past the cap the hint drops out and both aggregates fall back
# to the planner's shuffle join — weights are bit-identical either way
# (the decimal sums are order-independent).
NEWTON_BCAST_DOC_CAP = 20_000_000


def feature_rel(docs: DataFrame) -> DataFrame:
    """Sparse hashed bag-of-words: (doc_id, feat, cnt, n) where ``cnt``
    is the token count in bucket ``feat`` and ``n`` the doc's total
    tokens (the normalizer: x = cnt/n). The bias feature's cnt is n,
    so its x is exactly 1. Token-less docs drop (nothing to score)."""
    toks = docs.select(
        "doc_id", tokenize(F.col("text")).alias("_toks")
    ).filter(F.size("_toks") > 0)
    n = toks.select("doc_id", F.size("_toks").cast("long").alias("n"))
    counts = (
        toks.select("doc_id", F.explode("_toks").alias("t"))
        .select(
            "doc_id",
            (
                F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long")
                % HASH_DIM
            ).alias("feat"),
        )
        .groupBy("doc_id", "feat")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    bias = n.select(
        "doc_id", F.lit(BIAS_FEAT).cast("long").alias("feat"),
        F.col("n").alias("cnt"),
    )
    return counts.unionByName(bias).join(n, "doc_id")


PROSE_THRESH_PCT = 6  # stopword mass ≥ 6% of tokens = "prose-like"


def prose_labels(docs: DataFrame) -> DataFrame:
    """The demonstration label relation: y = 1 for PROSE-LIKE documents
    (stopword mass ≥ ``PROSE_THRESH_PCT``% of tokens — the keyword-spam
    -vs-prose axis every web-corpus quality filter scores). The
    threshold compares as pure integers (``hits·100 ≥ 6·n``), so the
    label has no float boundary; it is a threshold of a LINEAR function
    of the normalized bag-of-words, so the classifier must rediscover
    the stopword buckets to separate it — a real learnability probe,
    not a lookup. (The corpus's ``lang`` column is deliberately NOT the
    task: the synthetic texts share one vocabulary across languages,
    so language is unlearnable from content.)"""
    toks = docs.select(
        "doc_id", tokenize(F.col("text")).alias("_toks")
    ).filter(F.size("_toks") > 0)
    hits = stopword_hits(F.col("_toks"), STOPWORDS["en"])
    return toks.select(
        "doc_id",
        (hits * 100 >= PROSE_THRESH_PCT * F.size("_toks"))
        .cast("double")
        .alias("y"),
    )


def zero_weights(spark: SparkSession) -> DataFrame:
    """The all-zeros initial model (HASH_DIM features + bias)."""
    return spark.range(HASH_DIM + 1).select(
        F.col("id").alias("feat"), F.lit(0).cast(_WDEC).alias("w")
    )


def margins(feats: DataFrame, weights: DataFrame) -> DataFrame:
    """(doc_id, z, n): z = Σ_f (cnt_f · w_f) / n, the decimal-exact
    linear margin. The weight relation is tiny -> broadcast; the sum is
    long·decimal products (exact) aggregated in decimal (exact), so z
    is independent of partitioning."""
    zsum = (
        feats.join(F.broadcast(weights), "feat")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.col("w")).alias("_zs"),
            F.max("n").alias("n"),
        )
    )
    return zsum.select(
        "doc_id",
        (F.col("_zs").cast("double") / F.col("n")).alias("z"),
        "n",
    )


def _sigmoid(z):
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def gd_step(
    feats: DataFrame,
    labels: DataFrame,
    weights: DataFrame,
    n_docs: int,
    lr_inv: int = LR_INV,
) -> DataFrame:
    """One full-batch gradient step: w_f ← w_f − (1/lr_inv) · g_f with
    g_f = (Σ_d (p_d − y_d) · cnt_{d,f} / n_d) / N. Per-row error
    contributions are rounded to 12 dp then summed in DECIMAL, and the
    update divides by the integer ``lr_inv · N`` with one controlled
    rounding — bit-identical under any partitioning."""
    err = (
        margins(feats, weights)
        .join(labels, "doc_id")
        .select("doc_id", (_sigmoid(F.col("z")) - F.col("y")).alias("err"))
    )
    grads = (
        feats.join(err, "doc_id")
        .groupBy("feat")
        .agg(
            F.sum(
                F.round(F.col("err") * F.col("cnt") / F.col("n"), 12).cast(
                    _GDEC
                )
            ).alias("gsum")
        )
    )
    upd = F.round(
        F.col("gsum") / F.lit(lr_inv * n_docs), 12
    ).cast(_WDEC)
    return (
        weights.join(grads, "feat", "left")
        .select(
            "feat",
            F.when(F.col("gsum").isNull(), F.col("w"))
            .otherwise((F.col("w") - upd).cast(_WDEC))
            .alias("w"),
        )
    )


def feature_pairs(feats: DataFrame) -> DataFrame:
    """(doc_id, fa, fb, x): the per-document feature self-join the
    Newton curvature aggregates over, with x = (cnt_a/n)·(cnt_b/n)
    spelled in exactly the fold order the inline join used (the 12-dp
    rounding downstream sees identical doubles). This relation is
    ITERATION-INVARIANT — only the per-doc IRLS weight p(1−p) changes
    between Newton passes — so ``train_classifier`` materializes it
    once and every pass re-reads it instead of re-running the
    O(nnz²/doc) self-join (guide §2.4: the same exchange shared across
    rounds; measured sf0.1: the 6-pass train dropped 33.6 s → see
    OPTIMIZATION_r13.md)."""
    return (
        feats.alias("a")
        .join(feats.alias("b"), "doc_id")
        .select(
            "doc_id",
            F.col("a.feat").alias("fa"),
            F.col("b.feat").alias("fb"),
            (
                F.col("a.cnt") / F.col("a.n") * F.col("b.cnt") / F.col("b.n")
            ).alias("x"),
        )
    )


def newton_step(
    spark: SparkSession,
    feats: DataFrame,
    labels: DataFrame,
    weights: DataFrame,
    ridge: float = 1e-6,
    pairs: DataFrame | None = None,
    n_docs: int | None = None,
    w_rows: list | None = None,
) -> tuple[DataFrame, list]:
    """One IRLS / distributed-Newton step — the training loop that
    actually makes sense at 100 TB: logistic regression reaches the
    optimum in ~5-8 Newton iterations, and at corpus scale FIVE full
    passes beat the HUNDREDS a first-order method needs on
    ill-conditioned bag-of-words features (each pass is the expensive
    thing; the (D+1)² normal-matrix solve is driver-trivial for hashed
    dims).

    Per iteration, two distributed aggregates (decimal-exact, so the
    whole training run is bit-identical under any partitioning):

    - gradient  Xᵀ(y − p): per-feature sum of rounded contributions;
    - curvature XᵀWX (W = diag(p(1−p))): a per-doc feature self-join
      (O(nnz²/doc) pairs — bounded by distinct-tokens², not corpus
      size) summed per (fa, fb) cell.

    The ridge term keeps separable corpora from diverging. The solve
    is numpy on the collected (D+1)² cells — the same driver-sized
    touchpoint as the k-means centroid update.

    ``w_rows`` is the driver-side [(feat, w-as-double)] mirror of
    ``weights`` (r14: the loop THREADS it between passes instead of
    paying a per-pass ``weights.collect()`` job — exact because
    ``float(CAST(round(x,12) AS decimal(18,12)))`` round-trips to the
    same double: |w| stays far below the 1e6 scale where a 12-dp grid
    step would near a double ulp). Returns (weights DataFrame, its
    driver-side rows) so the caller can thread."""
    import numpy as np

    d = HASH_DIM + 1
    # the per-doc residual/IRLS-weight relation feeds BOTH aggregates;
    # it is one row per LABELED doc (tiny next to the pair relation) —
    # BROADCAST it so neither aggregate shuffles its big side at all
    # (guide §3.1; before: two sort-merge joins each re-deriving the
    # margins subtree). The hint is GATED on the caller's label count
    # (r14, VERDICT r13 #7): labeled sets are curated-small in
    # practice, but the relation is corpus-proportional in principle,
    # so past NEWTON_BCAST_DOC_CAP (or when the count is unknown) the
    # hint drops out and the planner shuffles — same weights either
    # way, the decimal sums are order-independent.
    bcast = (
        F.broadcast
        if n_docs is not None and n_docs <= NEWTON_BCAST_DOC_CAP
        else (lambda df: df)
    )
    scored = bcast(
        margins(feats, weights)
        .join(labels, "doc_id")
        .select(
            "doc_id",
            _sigmoid(F.col("z")).alias("p"),
            "y",
        )
        .select(
            "doc_id",
            (F.col("y") - F.col("p")).alias("resid"),
            (F.col("p") * (1 - F.col("p"))).alias("wt"),
        )
    )
    if pairs is None:
        pairs = feature_pairs(feats)
    # gradient and curvature in ONE union-aggregation job (the per-
    # round fixed cost was two agg jobs plus two broadcast builds;
    # union-tagging the gradient rows with fb = -1 makes the groups
    # disjoint, the per-group decimal sums identical, and the broadcast
    # subtree IDENTICAL in both branches so the physical planner's
    # ReuseExchange ships `scored` once)
    g_terms = feats.join(scored, "doc_id").select(
        F.col("feat").alias("fa"),
        F.lit(-1).cast("long").alias("fb"),
        F.round(F.col("resid") * F.col("cnt") / F.col("n"), 12).cast(
            _GDEC
        ).alias("v"),
    )
    h_terms = pairs.join(scored, "doc_id").select(
        "fa",
        "fb",
        F.round(F.col("wt") * F.col("x"), 12).cast(_GDEC).alias("v"),
    )
    rows = (
        g_terms.unionByName(h_terms)
        .groupBy("fa", "fb")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    grad = np.zeros(d)
    hess = np.eye(d) * ridge
    for r in rows:
        if r["fb"] < 0:
            grad[r["fa"]] = float(r["v"])
        else:
            hess[r["fa"], r["fb"]] += float(r["v"])
    delta = np.linalg.solve(hess, grad)
    if w_rows is None:
        w_rows = [(r["feat"], float(r["w"])) for r in weights.collect()]
    w_now = dict(w_rows)
    new = [
        (f, round(w_now.get(f, 0.0) + float(delta[f]), 12))
        for f in range(d)
    ]
    new_df = spark.createDataFrame(new, "feat long, w double").select(
        "feat", F.col("w").cast(_WDEC).alias("w")
    )
    return new_df, new


def mean_logloss(feats: DataFrame, labels: DataFrame, weights: DataFrame) -> float:
    """Diagnostic training loss (one extra action; tests use it to pin
    monotone descent)."""
    p = F.col("p")
    return (
        margins(feats, weights)
        .select("doc_id", _sigmoid(F.col("z")).alias("p"))
        .join(labels, "doc_id")
        .agg(
            F.avg(
                -(F.col("y") * F.log(p) + (1 - F.col("y")) * F.log(1 - p))
            ).alias("loss")
        )
        .collect()[0]["loss"]
    )


def train_classifier(
    spark: SparkSession,
    docs: DataFrame,
    labels: DataFrame,
    n_iters: int = N_ITERS,
    lr_inv: int = LR_INV,
    track_loss: bool = False,
    method: str = "newton",
) -> tuple[DataFrame, list[float]]:
    """Train from zeros; returns (weights DataFrame, per-iter losses —
    empty unless ``track_loss``). ``method='newton'`` (default) runs
    IRLS — a handful of corpus passes to the optimum; ``method='gd'``
    is the plain first-order loop (kept as the DuckDB-pinned reference
    semantics). Weights are collected each round (HASH_DIM+1 rows — a
    driver-sized model, like k-means centroids) and re-seeded via
    createDataFrame, keeping lineage depth constant across
    iterations."""
    # the feature relation feeds every margin/gradient/curvature
    # aggregate of every iteration — persist it once (tokenize +
    # explode + hash happen ONE time, not 3-4x per Newton pass;
    # measured 108s -> ~40s for the sf0.1 build). At cluster scale
    # this is the standard cached-training-set discipline.
    feats = feature_rel(docs).persist()
    labels = labels.join(
        feats.select("doc_id").distinct(), "doc_id", "left_semi"
    ).persist()
    # the curvature's pair relation is iteration-invariant (only the
    # per-doc IRLS weight changes) — materialize the self-join ONCE and
    # let all n_iters Newton passes re-read it (guide §2.4; measured
    # sf0.1 with the fused union-aggregation in newton_step: the 6-pass
    # train dropped 33.6 s -> ~11.5 s warm, weights bit-identical)
    pairs = feature_pairs(feats).persist() if method == "newton" else None
    try:
        n_docs = labels.count()
        weights = zero_weights(spark)
        # driver-side mirror of the weight relation, threaded between
        # Newton passes so no pass pays a weights.collect() job (r14)
        w_rows: list | None = [(f, 0.0) for f in range(HASH_DIM + 1)]
        losses: list[float] = []
        for _ in range(n_iters):
            if track_loss:
                losses.append(mean_logloss(feats, labels, weights))
            if method == "newton":
                weights, w_rows = newton_step(
                    spark, feats, labels, weights, pairs=pairs,
                    n_docs=n_docs, w_rows=w_rows,
                )
            else:
                rows = gd_step(
                    feats, labels, weights, n_docs, lr_inv
                ).collect()
                weights = spark.createDataFrame(
                    [(r["feat"], r["w"]) for r in rows],
                    f"feat long, w {_WDEC}",
                )
        if track_loss:
            losses.append(mean_logloss(feats, labels, weights))
        # the returned weights are driver-seeded (createDataFrame /
        # collected Newton rows), so they survive the unpersist
        return weights, losses
    finally:
        feats.unpersist()
        labels.unpersist()
        if pairs is not None:
            pairs.unpersist()


def score_documents(docs: DataFrame, weights: DataFrame) -> DataFrame:
    """(doc_id, p, predicted): sigmoid of the decimal-exact margin,
    probability rounded to 6 dp for the relation, prediction on the
    full-precision value. One broadcast join + one doc_id aggregate —
    the probe path is O(corpus tokens) with no training work."""
    m = margins(feature_rel(docs), weights)
    p = _sigmoid(F.col("z"))
    return m.select(
        "doc_id",
        F.round(p, 6).alias("p"),
        (p >= 0.5).alias("predicted"),
    )


def q_text_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised prose-vs-spam classifier over ``documents``: train on
    the ``doc_id % 5 != 0`` split (labels from ``prose_labels``), score
    EVERY document, emit (doc_id, y, p, predicted, holdout). Holdout
    accuracy is the learnability proof: the trained weights must
    rediscover the stopword feature buckets. (Unregistered — 50-slot
    cap; first-step DuckDB pin, determinism/descent/holdout invariants
    and the frozen-model equality pin in
    tests/test_unregistered_ops.py.)"""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    train_docs = docs.filter(F.col("doc_id") % 5 != 0)
    weights, _ = train_classifier(
        spark, train_docs, prose_labels(train_docs)
    )
    return (
        score_documents(docs, weights)
        .join(prose_labels(docs), "doc_id")
        .select(
            "doc_id", "y", "p", "predicted",
            (F.col("doc_id") % 5 == 0).alias("holdout"),
        )
    )


# --------------------------------------------------------------------------
# Persisted frozen model (the build/probe split every trained artifact
# here gets: ann_index, kmeans model, text models) under the shared
# commit protocol — readers refuse a torn build.
# --------------------------------------------------------------------------


def build_classifier_model(
    spark: SparkSession,
    sf_dir: str,
    model_path: str,
    n_iters: int = N_ITERS,
) -> None:
    """Train on the ``doc_id % 5 != 0`` split and persist the weight
    relation; marker written last."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    train_docs = docs.filter(F.col("doc_id") % 5 != 0)
    weights, _ = train_classifier(
        spark, train_docs, prose_labels(train_docs), n_iters=n_iters
    )
    weights.write.mode("overwrite").parquet(
        os.path.join(model_path, "weights")
    )
    commit_protocol.write_marker(model_path)


def q_classifier_from_model(
    spark: SparkSession, sf_dir: str, model_path: str
) -> DataFrame:
    """Score ``documents`` against a persisted frozen classifier —
    O(corpus) scoring with ZERO training work per query (the same
    from-model contract as q_semdedup_model / q_lm_score_from_model;
    pinned bit-identical to in-memory scoring)."""
    commit_protocol.require_marker(
        model_path, what="classifier model", builder="build_classifier_model"
    )
    weights = spark.read.parquet(os.path.join(model_path, "weights"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return score_documents(docs, weights)


# DuckDB twin of the FIRST gradient step from zero weights (z = 0,
# p = 1/2 exactly — no transcendentals survive, so the pin is exact):
# w_f after step 1 = −(Σ_d (1/2 − y_d) · cnt/n, rounded 12dp) / (2N),
# rounded to 12 dp. The loop beyond step 1 is non-SQL-expressible
# (sigmoid of evolving weights); invariants cover it.
FIRST_STEP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS tokens
  FROM documents WHERE doc_id % 5 <> 0
),
docs AS (
  SELECT doc_id, tokens, CAST(len(tokens) AS BIGINT) AS n,
         CASE WHEN list_sum(list_transform(tokens,
                t -> CASE WHEN t IN ('the', 'a', 'and', 'of', 'to', 'in', 'is') THEN 1 ELSE 0 END)) * 100
              >= 6 * len(tokens) THEN 1.0 ELSE 0.0 END AS y
  FROM toks WHERE len(tokens) > 0
),
n_docs AS (SELECT count(*) AS N FROM docs),
tok AS (
  SELECT doc_id, y, n,
         ('0x' || substr(md5(unnest(tokens)), 1, 8))::BIGINT
           % {HASH_DIM} AS feat
  FROM docs
),
cnts AS (
  SELECT doc_id, feat, count(*) AS cnt, any_value(y) AS y,
         any_value(n) AS n
  FROM tok GROUP BY doc_id, feat
  UNION ALL
  SELECT doc_id, {BIAS_FEAT} AS feat, n AS cnt, y, n FROM docs
),
grads AS (
  SELECT feat,
         sum(CAST(round((0.5 - y) * cnt / n, 12) AS DECIMAL(28,12)))
           AS gsum
  FROM cnts GROUP BY feat
)
SELECT r.range AS feat,
       CAST(coalesce(
         -round(g.gsum / ({LR_INV} * N), 12), 0) AS DECIMAL(18,12)) AS w
FROM range({HASH_DIM + 1}) r
CROSS JOIN n_docs
LEFT JOIN grads g ON g.feat = r.range
"""


def classifier_stream_writer(
    spark: SparkSession, model_path: str, out_path: str
):
    """A ``foreachBatch`` callable scoring every arriving micro-batch
    of (doc_id, text) rows against the PERSISTED frozen classifier and
    landing (doc_id, p, predicted) under a batch-keyed partition — the
    streaming face of the build/probe split: ingest-time quality
    scoring with ZERO training work per batch (the drift-log /
    dedup-stream-writer shape). Append-idempotence rides the
    deterministic batch id: a replayed batch overwrites its own
    ``batch=<id>`` directory, never duplicating scored rows. The
    weight relation is read ONCE at writer construction (frozen by the
    commit marker) and broadcast into every batch's scoring join."""
    import os

    commit_protocol.require_marker(
        model_path, what="classifier model", builder="build_classifier_model"
    )
    weights = spark.read.parquet(os.path.join(model_path, "weights"))

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        score_documents(
            batch_df.select("doc_id", "text"), weights
        ).write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={batch_id}")
        )

    return write_batch
