"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023): select raw-corpus documents whose hashed-n-gram
distribution looks like a TARGET domain.

The published recipe: featurize every document as a bag of hashed
unigrams+bigrams, fit two bag-of-buckets models — one on the target
sample, one on the raw pool — and weight each raw document by the
log importance ratio

    log w(d) = sum_f  tf_d(f) * ( ln p_target[b(f)] - ln p_raw[b(f)] )

then resample by weight. Here the target distribution is the eval
holdout slice (``doc_id % EVAL_MOD == EVAL_REM`` — the same suite the
decontamination stage protects: "select training data that looks like
the benchmark domain"), the bucket models are Laplace-smoothed over
``N_BUCKETS`` md5 buckets, and selection is the DETERMINISTIC top-k
variant (rank by weight; the paper's Gumbel-noise resampling replaces
the rank key with ``log w + Gumbel(seed)`` — same plan shape, but the
rank-by-weight form is what a cross-engine oracle can pin exactly).

Spark plan (the ``lm_scores`` discipline end to end):
- per-document (feature, tf) pairs are computed IN-ROW via one
  let-bound ``F.inline`` generate (tokenize + bigrams evaluated once
  per doc, no (doc, token) shuffle to build tf);
- both bucket models are map-side-combinable aggregates that reduce
  to ``N_BUCKETS`` rows — broadcast joined back to the per-feature
  relation (never a corpus-by-corpus join);
- the per-doc sum folds in feature-sorted order (order-independent
  across partitionings and engines), rounded to 6 dp;
- the global selection rank is the two-phase ``global_row_number``
  (no single-partition sort); the rank key is the ROUNDED weight so
  both engines agree on ties.

Scale: one corpus scan for features, two model-sized shuffles
(N_BUCKETS rows), one slim (doc_id, weight) rank shuffle. At 100 TB
the target sample is tiny and the bucket models are 1024 rows — the
whole selection is scan + broadcast + one top-k rank, exactly the
DSIR paper's "hashed n-grams make importance weights cheap at scale"
argument. Reference parity: no counterpart in the reference
(ItsRudraksh/Data-Ingestion-API-System-Loop-AI); north-star tier.

Registered in the round-8 rotation (slot funded by q_dedup_spans);
selection semantics and the run-length tf shape are pinned in
tests/test_dsir.py, parity by the driver's hash gate each round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_tokens, token_hash, tokenize
from ..plans.ranking import global_row_number
from ..sources.loader import load_table, spread_small_scan
from .contamination import EVAL_MOD, EVAL_REM

N_BUCKETS = 1024
_HEX = 8  # md5 hex chars for the bucket hash (portable: conv/::BIGINT)
SELECT_FRAC_INV = 4  # deterministic top-k keeps 1/4 of the raw pool


def _feature_tfs(docs: DataFrame) -> DataFrame:
    """(doc_id, feature, tf, is_target): per-document hashed-feature
    term frequencies, computed in-row (one Generate per doc). Features
    are word unigrams plus space-joined bigrams WITH multiplicity.
    Token-less documents contribute no rows (and are not selection
    candidates — pinned in the oracle by the same inner explode).

    The tf is a SORT + RUN-LENGTH shape, not the unigram in-row
    ``F.filter(fs, x == f)`` tree: DSIR features include bigrams,
    which are nearly all distinct within a document, so the filter
    tree degenerates to O(L^2) struct compares per row (the same
    reasoning that sent ``lm2_scores`` to an exploded aggregation —
    ``lm_score.py``). Here: sort the feature array once (O(L log L)),
    find run starts by comparing each sorted element with its
    predecessor (O(L) — ``element_at`` on an array literal-indexed
    inside a lambda is O(1)), and read each run's tf as the gap to
    the next run start. Still zero shuffle to build tf — one Generate
    per document, like the rest of the ``lm_scores`` discipline."""
    toks = tokenize(F.col("text"))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(toks, bigrams)
    # let ss = sorted features (evaluated once), st = run-start indices
    # plus an L+1 sentinel (evaluated once): entry j is
    # (feature = ss[st[j]], tf = st[j+1] - st[j]).
    packed = F.transform(
        F.array(F.array_sort(feats)),
        lambda ss: F.transform(
            F.array(
                F.concat(
                    F.when(
                        F.size(ss) > 0,
                        F.filter(
                            F.sequence(F.lit(1), F.size(ss)),
                            lambda i: F.when(i == 1, F.lit(True)).otherwise(
                                F.element_at(ss, i)
                                != F.element_at(ss, i - F.lit(1))
                            ),
                        ),
                    ).otherwise(F.array().cast("array<int>")),
                    F.array(F.size(ss) + 1),
                )
            ),
            # size(st) == 1 means the sentinel alone (token-less doc):
            # guard it — Spark's sequence(1, 0) steps DOWNWARD.
            lambda st: F.when(
                F.size(st) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(st) - 1),
                    lambda j: F.struct(
                        F.element_at(ss, F.element_at(st, j)).alias("feature"),
                        (
                            F.element_at(st, j + F.lit(1))
                            - F.element_at(st, j)
                        ).cast("int").alias("tf"),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<feature:string,tf:int>>")
            ),
        ),
    )
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.element_at(F.element_at(packed, 1), 1)
            ).alias("e"),
        )
        .select(
            "doc_id",
            F.col("e.feature").alias("feature"),
            F.col("e.tf").alias("tf"),
            (F.col("doc_id") % EVAL_MOD == EVAL_REM).alias("is_target"),
        )
    )


def _bucketed_tfs(docs: DataFrame) -> DataFrame:
    """``_feature_tfs`` with the md5 bucket attached. The input is
    hash-repartitioned on doc_id first: the featurize is the operator's
    CPU-heavy stage (sort + run-length + md5 per feature), and a
    documents table read from few parquet files would otherwise run it
    on as few cores (a small corpus arrives as ONE input split); at
    real scale the input already carries >= cores splits and the guard
    makes this a no-op — see ``spread_small_scan`` for the two traps
    (byte-size AQE coalescing vs CPU-heavy stages) it encodes."""
    return _feature_tfs(spread_small_scan(docs, "doc_id")).withColumn(
        "bucket", token_hash(F.col("feature"), _HEX) % N_BUCKETS
    )


def dsir_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, log_iw, sel_rank, selected) over the RAW pool (target
    docs are the distribution sample, not candidates). ``selected``
    keeps the top ``floor(n_raw / SELECT_FRAC_INV)`` by
    (log_iw DESC, doc_id).

    The featurized relation feeds THREE consumers (target model, raw
    model, candidate scoring), and each reference re-instantiates the
    whole tokenize+runs+explode subtree (the funnel fan-out lesson) —
    so it gets a lazy ``localCheckpoint`` stage boundary: ONE featurize
    pass, exactly the "one corpus scan for features" the module
    docstring promises. At cluster scale this materializes the (doc,
    feature, tf, bucket) relation once — tokenized-corpus sized, the
    same temp relation any DSIR implementation stages."""
    per_f = _bucketed_tfs(docs).localCheckpoint(eager=False)

    def _model(side: DataFrame, cnt_col: str) -> DataFrame:
        return side.groupBy("bucket").agg(F.sum("tf").alias(cnt_col))

    tgt = _model(per_f.filter("is_target"), "cnt_t")
    raw = _model(per_f.filter("NOT is_target"), "cnt_r")
    tot_t = tgt.agg(F.sum("cnt_t").alias("tot_t"))
    tot_r = raw.agg(F.sum("cnt_r").alias("tot_r"))
    return _score_candidates(
        per_f.filter("NOT is_target"), tgt, raw, tot_t, tot_r
    )


def _score_candidates(
    per_f_cand: DataFrame,
    tgt: DataFrame,
    raw: DataFrame,
    tot_t: DataFrame,
    tot_r: DataFrame,
) -> DataFrame:
    """Score + rank a candidate (doc_id, feature, tf, bucket) relation
    against the two bucket models — the shared tail of the inline and
    from-model forms, so the two are bit-identical by construction
    given equal model relations."""
    contrib = (
        per_f_cand
        .join(F.broadcast(tgt), "bucket", "left")
        .join(F.broadcast(raw), "bucket", "left")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_r))
        .select(
            "doc_id",
            "feature",
            (
                F.col("tf")
                * (
                    F.log(
                        (F.coalesce(F.col("cnt_t"), F.lit(0)) + F.lit(1))
                        / (F.col("tot_t") + F.lit(N_BUCKETS))
                    )
                    - F.log(
                        (F.coalesce(F.col("cnt_r"), F.lit(0)) + F.lit(1))
                        / (F.col("tot_r") + F.lit(N_BUCKETS))
                    )
                )
            ).alias("c"),
        )
    )
    per_doc = contrib.groupBy("doc_id").agg(
        F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("feature", "c"))),
                    lambda s: s["c"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("log_iw")
    )
    # per_doc is consumed three times (the count and both phases of
    # the global rank) — one more lazy stage boundary keeps the scoring
    # join single-instantiation
    per_doc = per_doc.localCheckpoint(eager=False)
    n_raw = per_doc.groupBy().agg(
        F.floor(F.count("*") / SELECT_FRAC_INV).cast("long").alias("k")
    )
    # two-phase global rank: coarse integer bucket (a leading prefix of
    # the total order) keeps the offset relation small; the exact order
    # key completes inside each bucket
    ranked = global_row_number(
        per_doc.withColumn("_neg", -F.col("log_iw")).withColumn(
            "_negb", F.floor("_neg")
        ),
        ["_negb"],
        ["_neg", "doc_id"],
        rn_col="sel_rank",
    ).drop("_neg", "_negb")
    return ranked.crossJoin(F.broadcast(n_raw)).select(
        "doc_id",
        "log_iw",
        "sel_rank",
        (F.col("sel_rank") <= F.col("k")).alias("selected"),
    )


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection over ``documents`` with the eval holdout as the
    target domain sample."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dsir_weights(docs)


# ---------------------------------------------------------------------------
# Build/probe split (the repo's standard artifact discipline): the two
# 1024-bucket models are the trainable state of DSIR — persist them
# once and every future selection pass is scan + broadcast + rank with
# ZERO model-building work, the same O(corpus)->O(batch) shift the
# lm_batch pair demonstrates. The frozen store keeps the raw (bucket,
# cnt_t, cnt_r) counts — totals are recovered as sums of the stored
# relation (additive, sketch-style), so the artifact is internally
# consistent even if the corpus changed after the build.
# ---------------------------------------------------------------------------


def build_dsir_model(spark: SparkSession, sf_dir: str, model_path: str) -> None:
    """Persist the target/raw hashed-n-gram bucket models (one merged
    (bucket, cnt_t, cnt_r) relation — <= N_BUCKETS rows) under the
    shared commit marker. One corpus featurize pass; marker written
    last, so readers refuse a torn build."""
    import os

    from ..sources.commit_protocol import write_marker

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    per_f = _bucketed_tfs(docs)
    tgt = per_f.filter("is_target").groupBy("bucket").agg(
        F.sum("tf").alias("cnt_t")
    )
    raw = per_f.filter("NOT is_target").groupBy("bucket").agg(
        F.sum("tf").alias("cnt_r")
    )
    tgt.join(raw, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("cnt_t", F.lit(0)).cast("long").alias("cnt_t"),
        F.coalesce("cnt_r", F.lit(0)).cast("long").alias("cnt_r"),
    ).write.mode("overwrite").parquet(os.path.join(model_path, "buckets"))
    write_marker(model_path)


def _load_dsir_model(
    spark: SparkSession, model_path: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    import os

    from ..sources.commit_protocol import require_marker

    require_marker(model_path, "DSIR bucket models", "build_dsir_model")
    b = spark.read.parquet(os.path.join(model_path, "buckets"))
    # cnt_t/cnt_r = 0 rows carry no information for their side: drop
    # them per side so the left joins see exactly the relations the
    # inline groupBys produce (bit-identical coalesce behavior)
    tgt = b.filter("cnt_t > 0").select("bucket", "cnt_t")
    raw = b.filter("cnt_r > 0").select("bucket", "cnt_r")
    tot_t = tgt.agg(F.sum("cnt_t").alias("tot_t"))
    tot_r = raw.agg(F.sum("cnt_r").alias("tot_r"))
    return tgt, raw, tot_t, tot_r


def q_dsir_from_model(
    spark: SparkSession, sf_dir: str, model_path: str
) -> DataFrame:
    """Full-pool selection against the FROZEN bucket models — pinned
    bit-identical to :func:`q_dsir_select` when the store was built on
    the same corpus (tests/test_dsir.py)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    per_f = _bucketed_tfs(docs).filter("NOT is_target")
    return _score_candidates(per_f, *_load_dsir_model(spark, model_path))


def q_dsir_batch_from_model(
    spark: SparkSession, sf_dir: str, model_path: str
) -> DataFrame:
    """The production shape: score ONLY the 1% ingest batch
    (``doc_id % 100 == 0``, non-target) against the frozen models —
    O(batch) featurize + broadcast models + within-batch rank, no
    corpus pass anywhere (compare ``q_dsir_select``, whose model fit
    is O(corpus) per invocation)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 100 == 0)
    )
    per_f = _bucketed_tfs(docs).filter("NOT is_target")
    return _score_candidates(per_f, *_load_dsir_model(spark, model_path))


_FEATS_CTE = f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens('text')} AS ts FROM documents
),
featl AS (
  SELECT doc_id,
         list_concat(
           ts,
           list_transform(range(1, len(ts)),
                          i -> ts[i] || ' ' || ts[i + 1])
         ) AS fs
  FROM toks
),
ex AS (SELECT doc_id, unnest(fs) AS feature FROM featl),
perf AS (
  SELECT doc_id, feature, count(*) AS tf,
         ('0x' || substr(md5(feature), 1, {_HEX}))::BIGINT
           % {N_BUCKETS} AS bucket,
         doc_id % {EVAL_MOD} = {EVAL_REM} AS is_target
  FROM ex GROUP BY doc_id, feature
),
tgt AS (
  SELECT bucket, sum(tf) AS cnt_t FROM perf WHERE is_target GROUP BY bucket
),
raw AS (
  SELECT bucket, sum(tf) AS cnt_r FROM perf WHERE NOT is_target GROUP BY bucket
),
tott AS (SELECT sum(cnt_t) AS tot_t FROM tgt),
totr AS (SELECT sum(cnt_r) AS tot_r FROM raw)
"""

DSIR_ORACLE = (
    _FEATS_CTE
    + f""",
contrib AS (
  SELECT p.doc_id, p.feature,
         p.tf * ( ln((coalesce(t.cnt_t, 0) + 1)
                     / (tott.tot_t + {N_BUCKETS}))
                - ln((coalesce(r.cnt_r, 0) + 1)
                     / (totr.tot_r + {N_BUCKETS})) ) AS c
  FROM perf p
  LEFT JOIN tgt t USING (bucket)
  LEFT JOIN raw r USING (bucket)
  CROSS JOIN tott CROSS JOIN totr
  WHERE NOT p.is_target
),
perdoc AS (
  SELECT doc_id,
         round(list_sum(list(c ORDER BY feature)), 6) AS log_iw
  FROM contrib GROUP BY doc_id
),
k AS (SELECT CAST(count(*) // {SELECT_FRAC_INV} AS BIGINT) AS k FROM perdoc),
ranked AS (
  SELECT doc_id, log_iw,
         CAST(row_number() OVER (ORDER BY log_iw DESC, doc_id)
              AS BIGINT) AS sel_rank
  FROM perdoc
)
SELECT doc_id, log_iw, sel_rank, sel_rank <= k.k AS selected
FROM ranked CROSS JOIN k
"""
)

DSIR_QUERIES = {"q_dsir_select": q_dsir_select}
DSIR_ORACLES = {"q_dsir_select": DSIR_ORACLE}
