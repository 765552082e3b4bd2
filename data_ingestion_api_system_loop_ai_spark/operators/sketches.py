"""Mergeable-sketch rollups (HyperLogLog via Apache DataSketches).

``q_approx_distinct`` (operators/relational.py) shows the one-shot
``approx_count_distinct``; this module shows the form that matters at
100 TB: MATERIALIZED per-partition sketches that MERGE. A continuously
ingesting pipeline cannot re-scan history to count distincts per
rollup — instead each maintenance pass stores one tiny HLL sketch per
(event_type, day) (a few KB each, ``hll_sketch_agg``), and any later
rollup — per type, per week, global — is ``hll_union_agg`` over the
stored sketches: O(partitions) work against KB-sized state instead of
O(corpus) re-aggregation. This is the lossless-merge property plain
``approx_count_distinct`` intermediates do not expose to the user.

No DuckDB oracle: the sketch binary is engine-specific (DataSketches
HLL_4), so correctness is pinned by direct tests instead — the merged
estimate must EQUAL the single-pass estimate on the same data (union
of same-lgK sketches is deterministic), and both must sit within HLL
error of the exact distinct count.

Scale notes: sketch build is one (type, day) shuffle with map-side
partial sketches (the aggregation buffer IS the sketch); the rollup
shuffles only KB-sized sketch rows. Skew-free: sketch size is constant
regardless of the group's cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_tokens, token_hash, tokenize
from ..sources.loader import load_table

HLL_LGK = 12  # 2^12 registers ≈ 1.6% rse — the DataSketches default


def daily_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialization pass: one HLL sketch of ``user_id`` per
    (event_type, day) — what an incremental maintenance job appends to
    a stats table alongside its row counts."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.hll_sketch_agg("user_id", HLL_LGK).alias("user_sketch"),
        F.count("*").alias("n_events"),
    )


def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B56 — distinct users per event type, computed by MERGING the
    stored daily sketches (never re-reading events): the incremental
    rollup path. Returns (event_type, approx_users, n_events)."""
    daily = daily_user_sketches(spark, sf_dir)
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("user_sketch"))
            .cast("long")
            .alias("approx_users"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("event_type")
    )


def direct_user_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass estimate over the raw events — the reference point
    the merged rollup must reproduce exactly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", HLL_LGK))
            .cast("long")
            .alias("approx_users")
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Count-min sketch: the mergeable FREQUENCY sketch (heavy hitters),
# complementing HLL's mergeable cardinality. Unlike the HLL binary,
# this CMS is built from plain relational cells — (row j, bucket) ->
# counter — with engine-portable md5 bucket hashing, so the whole
# sketch (build, merge, probe) is DuckDB-replicable and the guarantee
# estimate >= exact is assertable per token.
#
# Scale notes (100 TB): the exact per-token count is a map-side-
# combinable groupBy over the corpus (one shuffle of (token, cnt)
# pairs); cell building explodes only the DISTINCT-token relation
# (x CMS_DEPTH), never the corpus; the sketch itself is CMS_DEPTH x
# CMS_WIDTH <= 4096 cells regardless of corpus size, so it BROADCASTS
# for probing and merges cell-wise by plain addition (per-source /
# per-day sketches sum to the global sketch EXACTLY — counters are
# additive, the property the merge test pins). Probing any candidate
# set is a broadcast join + min over CMS_DEPTH cells.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_bucket(token, j: int):
    """Row-j bucket of a token: leading-8-hex md5 of the salted token,
    mod width — the LSH family's engine-portable hash idiom."""
    return (
        token_hash(F.concat(F.lit(f"{j}:"), token), 8) % CMS_WIDTH
    ).cast("int")


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, cnt): exact corpus term frequencies over ``documents`` —
    the CMS input weights (and the ground truth its guarantee is
    asserted against)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokenize(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


def cms_cells(tokens: DataFrame) -> DataFrame:
    """(j, bucket, c): the sketch, from a (token, cnt) relation. Only
    distinct tokens are exploded x depth; collisions accumulate by
    plain summation."""
    rows = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _cms_bucket(F.col("token"), j).alias("bucket"))
            for j in range(CMS_DEPTH)
        ]
    )
    return (
        tokens.select(F.explode(rows).alias("r"), "cnt")
        .groupBy("r.j", "r.bucket")
        .agg(F.sum("cnt").alias("c"))
    )


def cms_probe(cells: DataFrame, probes: DataFrame) -> DataFrame:
    """(token, est): point estimates for every row of ``probes``
    (a ``token`` column) — min over the token's CMS_DEPTH cells; the
    sketch side broadcasts (<= DEPTH x WIDTH rows by construction)."""
    rows = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _cms_bucket(F.col("token"), j).alias("bucket"))
            for j in range(CMS_DEPTH)
        ]
    )
    return (
        probes.select("token", F.explode(rows).alias("r"))
        .join(F.broadcast(cells), (F.col("r.j") == cells.j) & (F.col("r.bucket") == cells.bucket))
        .groupBy("token")
        .agg(F.min("c").alias("est"))
    )


def q_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 heavy hitters by CMS estimate with the exact count
    alongside: (token, est, exact) — est >= exact always (the one-sided
    CMS guarantee, asserted per token in the direct test), ordered by
    (est desc, token). (Unregistered — 50-slot cap; driver-grade DuckDB
    parity: the oracle rebuilds the identical sketch from the same md5
    bucket math.)"""
    tf = token_counts(spark, sf_dir)
    cells = cms_cells(tf)
    return (
        cms_probe(cells, tf.select("token"))
        .join(tf, "token")
        .select("token", "est", F.col("cnt").alias("exact"))
        .orderBy(F.col("est").desc(), "token")
        .limit(15)
    )


CMS_TOPK_ORACLE = f"""
WITH tf AS (
  SELECT unnest({sql_tokens('text')}) AS token FROM documents
),
counts AS (
  SELECT token, count(*) AS cnt FROM tf GROUP BY token
),
cells AS (
  SELECT j, ('0x' || substr(md5(j || ':' || token), 1, 8))::BIGINT % {CMS_WIDTH} AS bucket,
         sum(cnt) AS c
  FROM counts, range({CMS_DEPTH}) r(j)
  GROUP BY 1, 2
),
probes AS (
  SELECT token, cnt, j,
         ('0x' || substr(md5(j || ':' || token), 1, 8))::BIGINT % {CMS_WIDTH} AS bucket
  FROM counts, range({CMS_DEPTH}) r(j)
),
est AS (
  SELECT p.token, min(c.c) AS est, any_value(p.cnt) AS exact
  FROM probes p JOIN cells c ON p.j = c.j AND p.bucket = c.bucket
  GROUP BY p.token
)
SELECT token, est, exact FROM est
ORDER BY est DESC, token
LIMIT 15
"""


# ---------------------------------------------------------------------------
# Mergeable quantile sketch: a fixed-width integer histogram over the
# value domain — the QUANTILE member of the sketch family (HLL =
# mergeable cardinality, CMS = mergeable frequency). Like the CMS and
# unlike approx_percentile's internal KLL buffer, the sketch is plain
# relational cells — (bucket -> count) with pure integer bucket math —
# so per-partition sub-sketches (here per month) merge CELL-WISE BY
# ADDITION to exactly the single-pass sketch, and the whole
# build/merge/probe pipeline replicates in DuckDB and is hash-checked.
#
# Scale notes (100 TB): the cell build is one map-side-combinable
# groupBy over <= HIST_BINS buckets per group — constant sketch size
# regardless of row count; a maintenance pass stores one histogram per
# partition alongside its row counts, and any later quantile query
# merges KB-sized cell relations instead of re-scanning the corpus.
# The error bound is deterministic: an estimated quantile is off by at
# most one bucket width W = ceil((max+1)/HIST_BINS) in value terms
# (exactness the probabilistic KLL cannot give; the trade is needing
# max(value) up front — one 1-row broadcast aggregate).
# ---------------------------------------------------------------------------

HIST_BINS = 4096
HIST_QS = (25, 50, 75)  # integer percents: exact integer target ranks


def price_hist_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(mon, bucket, c): per-month histogram cells of lineitem
    ``l_extendedprice`` in integer cents; bucket width derived from the
    global max so the sketch is <= HIST_BINS cells per month."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = li.select(
        F.date_trunc("month", "l_shipdate").alias("mon"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
    )
    stats = cents.agg(F.max("c").alias("mx"))
    # the bucket width ``w`` is stored WITH the cells (constant across
    # the sketch — it parameterizes it, like a CMS's seed row), so a
    # probe recovers every statistic it needs from the sketch alone:
    # n = sum of cell counts, w = the stored width (ADVICE r04)
    return (
        cents.crossJoin(F.broadcast(stats))
        .select(
            "mon",
            F.expr(f"c div ((mx + {HIST_BINS}) div {HIST_BINS})").alias("bucket"),
            F.expr(f"(mx + {HIST_BINS}) div {HIST_BINS}").alias("w"),
        )
        .groupBy("mon", "bucket", "w")
        .agg(F.count("*").alias("c"))
    )


def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(q, bucket, lo_cents, hi_cents): p25/p50/p75 of l_extendedprice
    estimated by MERGING the stored per-month histograms — the probe
    reads ONLY the sketch (ADVICE r04: n is recovered as the sum of
    cell counts and w is stored with the cells, so lineitem is never
    re-scanned): cells sum cell-wise into the global sketch, a prefix
    sum over <= HIST_BINS cell rows (the documented O(#buckets) serial
    window — constant work at any corpus size) locates the smallest
    bucket whose cumulative count reaches ceil(q*n/100), and the
    bucket's [lo, hi] cent range brackets the true percentile
    (within-one-bucket guarantee, pinned by test).
    (Registered in the round-8 rotation — slot funded by q_domain_mix;
    merge and bracket invariants stay in
    tests/test_unregistered_ops.py.)"""
    from pyspark.sql import Window as W

    sketch = price_hist_cells(spark, sf_dir)
    cells = sketch.groupBy("bucket").agg(F.sum("c").alias("c"))
    cum = cells.select(
        "bucket",
        F.sum("c")
        .over(W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
    )
    # every probe statistic comes from the sketch itself: counters are
    # additive (n = sum c) and the width parameterizes every cell
    stats = sketch.agg(F.sum("c").alias("n"), F.max("w").alias("w"))
    qs = F.explode(F.array(*[F.lit(q) for q in HIST_QS])).alias("q")
    targets = spark.range(1).select(qs).crossJoin(F.broadcast(stats))
    return (
        targets.join(
            F.broadcast(cum),
            cum.cum >= F.expr("(q * n + 99) div 100"),
        )
        .groupBy("q", "w")
        .agg(F.min("bucket").alias("bucket"))
        .select(
            "q",
            "bucket",
            (F.col("bucket") * F.col("w")).alias("lo_cents"),
            ((F.col("bucket") + 1) * F.col("w") - 1).alias("hi_cents"),
        )
        .orderBy("q")
    )


HIST_QUANTILES_ORACLE = f"""
WITH cents AS (
  SELECT date_trunc('month', l_shipdate) AS mon,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem
),
stats AS (
  SELECT count(*) AS n, (max(c) + {HIST_BINS}) // {HIST_BINS} AS w FROM cents
),
cells AS (
  SELECT mon, c // w AS bucket, count(*) AS cnt
  FROM cents, stats GROUP BY 1, 2
),
merged AS (SELECT bucket, sum(cnt) AS cnt FROM cells GROUP BY bucket),
cum AS (
  SELECT bucket, sum(cnt) OVER (ORDER BY bucket) AS cum FROM merged
),
targets AS (SELECT unnest([{", ".join(str(q) for q in HIST_QS)}]) AS q)
SELECT q, min(bucket) AS bucket,
       min(bucket) * any_value(w) AS lo_cents,
       (min(bucket) + 1) * any_value(w) - 1 AS hi_cents
FROM targets, stats, cum
WHERE cum >= (q * n + 99) // 100
GROUP BY q
ORDER BY q
"""


def q_hist_quantiles_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(grp, q, bucket, lo_cents, hi_cents): p25/p50/p75 of
    ``l_extendedprice`` PER RETURNFLAG from the same mergeable
    histogram cells — the grouped form of ``q_hist_quantiles``. The
    prefix sum runs in a window PARTITIONED BY the group (parallel
    across groups, <= HIST_BINS rows within each), targets ride a
    per-group count relation; bucket width stays the GLOBAL one so
    per-group sketches remain cell-wise mergeable into the corpus
    sketch. (Unregistered — 50-slot cap; driver-grade DuckDB parity in
    tests/test_unregistered_ops.py.)"""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    cents = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
    )
    stats = cents.agg(F.max("c").alias("mx")).select(
        F.expr(f"(mx + {HIST_BINS}) div {HIST_BINS}").alias("w")
    )
    cells = (
        cents.crossJoin(F.broadcast(stats))
        .select("grp", F.expr("c div w").alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(F.count("*").alias("c"))
    )
    cum = cells.select(
        "grp",
        "bucket",
        F.sum("c")
        .over(
            W.partitionBy("grp").orderBy("bucket").rowsBetween(
                W.unboundedPreceding, 0
            )
        )
        .alias("cum"),
    )
    # per-group n from the sketch itself (additive counters), not a
    # second scan relation — the same single-source property as the
    # ungrouped probe
    counts = cells.groupBy("grp").agg(F.sum("c").alias("n"))
    qs = F.explode(F.array(*[F.lit(q) for q in HIST_QS])).alias("q")
    targets = counts.select("grp", "n", qs).crossJoin(F.broadcast(stats))
    return (
        targets.join(
            cum,
            (targets.grp == cum.grp)
            & (F.col("cum") >= F.expr("(q * n + 99) div 100")),
        )
        .groupBy(targets.grp.alias("grp"), "q", "w")
        .agg(F.min("bucket").alias("bucket"))
        .select(
            "grp",
            "q",
            "bucket",
            (F.col("bucket") * F.col("w")).alias("lo_cents"),
            ((F.col("bucket") + 1) * F.col("w") - 1).alias("hi_cents"),
        )
        .orderBy("grp", "q")
    )


HIST_QUANTILES_GROUPED_ORACLE = f"""
WITH cents AS (
  SELECT l_returnflag AS grp,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem
),
stats AS (SELECT (max(c) + {HIST_BINS}) // {HIST_BINS} AS w FROM cents),
cells AS (
  SELECT grp, c // w AS bucket, count(*) AS cnt
  FROM cents, stats GROUP BY 1, 2
),
cum AS (
  SELECT grp, bucket, sum(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS cum
  FROM cells
),
counts AS (SELECT grp, count(*) AS n FROM cents GROUP BY grp),
targets AS (
  SELECT grp, n, unnest([{", ".join(str(q) for q in HIST_QS)}]) AS q
  FROM counts
)
SELECT t.grp, t.q, min(bucket) AS bucket,
       min(bucket) * any_value(w) AS lo_cents,
       (min(bucket) + 1) * any_value(w) - 1 AS hi_cents
FROM targets t, stats, cum
WHERE cum.grp = t.grp AND cum.cum >= (t.q * t.n + 99) // 100
GROUP BY t.grp, t.q
ORDER BY t.grp, t.q
"""


# ---------------------------------------------------------------------------
# KMV / theta sketches — SET ALGEBRA over distinct counts, the
# capability HLL does not expose: two corpus segments' sketches can be
# UNIONED *and* INTERSECTED, giving distinct-overlap / Jaccard
# estimates between 100 TB corpora from KB-sized state (cross-corpus
# contamination rate, crawl-vs-crawl novelty, vocabulary overlap) —
# the K-minimum-values estimator (Bar-Yossef et al. 2002) in the theta
# framework (Dasgupta et al., the DataSketches theta design).
#
# Everything is DETERMINISTIC integer state: the sketch is the K
# smallest 32-bit md5 hashes of the segment's distinct items, so —
# unlike the HLL binary — a DuckDB twin reproduces the whole relation
# hash-for-hash and the estimates to the rounded digit. Estimators:
#   distinct(seg)  = (K-1) / theta_seg        (theta = K-th value/2^32)
#   inter(A,B)     = |{h in both, h < theta}| / theta,
#                    theta = min(theta_A, theta_B)
#   jaccard        = inter / union            (union = KMV of merged)
# Segments with fewer than K distinct items degrade to EXACT counts
# (theta = 1), so small groups cost nothing in accuracy.
#
# Scale: the sketch build is a distinct + per-segment k-smallest
# (K-bounded output per segment); set ops touch only the K-row
# sketches. A production build would pre-prune with a static theta
# before the per-segment sort; at the test scale the windowed rank is
# the honest shape.
# ---------------------------------------------------------------------------

KMV_K = 256
_KMV_SPACE = float(2**32)


def kmv_sketch(
    df: DataFrame, group_cols: list[str], item_col: str, k: int = KMV_K
) -> DataFrame:
    """(group..., h, rnk): the k smallest distinct 32-bit item hashes
    per group, rank-ordered — the mergeable sketch relation."""
    from pyspark.sql.window import Window as W

    hashed = df.select(
        *group_cols, token_hash(F.col(item_col), 8).alias("h")
    ).distinct()
    w = W.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = KMV_K) -> DataFrame:
    """(group..., n_kept, theta, est): distinct-count estimate per
    group — (k-1)/theta when the sketch is full, exact n otherwise."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").alias("n_kept"), F.max("h").alias("h_max")
    )
    full = F.col("n_kept") >= k
    theta = F.when(full, F.col("h_max") / _KMV_SPACE).otherwise(F.lit(1.0))
    est = F.when(full, (k - 1) / theta).otherwise(F.col("n_kept"))
    return agg.select(
        *group_cols, "n_kept",
        F.round(theta, 9).alias("theta"),
        F.round(est, 6).alias("est"),
    )


def segment_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(seg, gram): the two corpus segments' (even/odd numeric source
    id) adjacent-token bigrams — the item relation the overlap
    sketches summarize."""
    docs = load_table(spark, sf_dir, "documents").select(
        (F.substring("source", 4, 10).cast("int") % 2).alias("seg"),
        tokenize(F.col("text")).alias("toks"),
    )
    return docs.select(
        "seg",
        F.explode(
            F.expr(
                "transform(slice(toks, 1, greatest(size(toks)-1, 0)),"
                " (t, i) -> concat(t, ' ', toks[i+1]))"
            )
        ).alias("gram"),
    )


def kmv_overlap_from_sketch(sk: DataFrame) -> DataFrame:
    """The overlap readout from a (seg, h, rnk) sketch relation —
    shared by the inline query and the persisted-sketch probe (the
    whole point of the sketch: this function touches ONLY the K-row
    sketches, never the corpora)."""
    est = kmv_estimate(sk, ["seg"])
    a = est.filter("seg = 0").select(
        F.col("est").alias("n_a_est"), F.col("theta").alias("_ta")
    )
    b = est.filter("seg = 1").select(
        F.col("est").alias("n_b_est"), F.col("theta").alias("_tb")
    )
    # union sketch: k smallest of the merged distinct hash sets —
    # reuse the rank directly on the already-hashed rows
    from pyspark.sql.window import Window as W

    merged = sk.select("h").distinct().select(
        F.lit(0).alias("g"), "h"
    )
    uw = W.partitionBy("g").orderBy("h")
    usk = merged.withColumn("rnk", F.row_number().over(uw)).filter(
        F.col("rnk") <= KMV_K
    )
    uest = kmv_estimate(usk, ["g"]).select(F.col("est").alias("union_est"))
    common = (
        sk.filter("seg = 0")
        .select("h")
        .join(sk.filter("seg = 1").select("h"), "h", "left_semi")
    )
    theta_min = F.least(F.col("_ta"), F.col("_tb"))
    inter = (
        common.crossJoin(F.broadcast(a.crossJoin(b)))
        .filter(F.col("h") / _KMV_SPACE < theta_min)
        .agg(
            F.round(F.count("*") / F.first(theta_min), 6).alias("inter_est")
        )
    )
    return (
        a.crossJoin(b)
        .crossJoin(F.broadcast(uest))
        .crossJoin(F.broadcast(inter))
        .select(
            "n_a_est", "n_b_est", "union_est",
            F.coalesce("inter_est", F.lit(0.0)).alias("inter_est"),
            F.round(
                F.coalesce("inter_est", F.lit(0.0)) / F.col("union_est"), 6
            ).alias("jaccard_est"),
        )
    )


def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-bigram overlap between two corpus segments (even/odd
    numeric source id) via KMV theta sketches: one row with each
    segment's distinct estimate, the union and intersection estimates,
    and the Jaccard estimate — the cross-corpus overlap readout.
    (Unregistered — 50-slot cap; exact DuckDB parity — the sketch is
    deterministic integer state — plus accuracy-vs-exact invariants in
    tests/test_unregistered_ops.py.)"""
    return kmv_overlap_from_sketch(
        kmv_sketch(segment_grams(spark, sf_dir), ["seg"], "gram")
    )


def build_kmv_sketches(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Persist the per-segment KMV sketches (one corpus scan) under the
    shared commit marker — the artifact every future overlap probe
    reads INSTEAD of the corpora (two 100 TB crawls compare via two
    KB-sized parquet files)."""
    import os

    from ..sources import commit_protocol

    kmv_sketch(segment_grams(spark, sf_dir), ["seg"], "gram").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "sketches"))
    commit_protocol.write_marker(path)


def q_kmv_overlap_from_sketches(
    spark: SparkSession, sf_dir: str, path: str
) -> DataFrame:
    """The overlap readout from PERSISTED sketches — zero corpus work
    per probe (pinned bit-identical to the inline form); torn builds
    refused."""
    import os

    from ..sources import commit_protocol

    commit_protocol.require_marker(
        path, what="KMV sketch set", builder="build_kmv_sketches"
    )
    return kmv_overlap_from_sketch(
        spark.read.parquet(os.path.join(path, "sketches"))
    )


_G2U = "toks[i] || ' ' || toks[i+1]"

KMV_OVERLAP_ORACLE = f"""
WITH toks AS (
  SELECT CAST(substr(source, 4) AS INT) % 2 AS seg,
         {sql_tokens('text')} AS toks
  FROM documents
),
grams AS (
  SELECT seg, unnest(list_transform(
           range(1, greatest(len(toks) - 1, 0) + 1), i -> {_G2U})) AS gram
  FROM toks
),
hashed AS (
  SELECT DISTINCT seg, ('0x' || substr(md5(gram), 1, 8))::BIGINT AS h
  FROM grams
),
sk AS (
  SELECT seg, h FROM (
    SELECT seg, h, row_number() OVER (PARTITION BY seg ORDER BY h) AS rnk
    FROM hashed
  ) WHERE rnk <= {KMV_K}
),
se AS (SELECT seg, count(*) AS n_kept, max(h) AS h_max FROM sk GROUP BY seg),
est AS (
  SELECT seg,
         CASE WHEN n_kept >= {KMV_K}
              THEN round(h_max / {_KMV_SPACE}, 9) ELSE 1.0 END AS theta,
         CASE WHEN n_kept >= {KMV_K}
              THEN round(({KMV_K} - 1) / (h_max / {_KMV_SPACE}), 6)
              ELSE CAST(n_kept AS DOUBLE) END AS est
  FROM se
),
a AS (SELECT est AS n_a_est, theta AS ta FROM est WHERE seg = 0),
b AS (SELECT est AS n_b_est, theta AS tb FROM est WHERE seg = 1),
usk AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rnk
    FROM (SELECT DISTINCT h FROM sk)
  ) WHERE rnk <= {KMV_K}
),
ue AS (SELECT count(*) AS n_kept, max(h) AS h_max FROM usk),
uest AS (
  SELECT CASE WHEN n_kept >= {KMV_K}
              THEN round(({KMV_K} - 1) / (h_max / {_KMV_SPACE}), 6)
              ELSE CAST(n_kept AS DOUBLE) END AS union_est
  FROM ue
),
ie AS (
  SELECT round(count(*) / any_value(t), 6) AS inter_est
  FROM (
    SELECT h, least(ta, tb) AS t
    FROM (SELECT h FROM sk WHERE seg = 0
          AND h IN (SELECT h FROM sk WHERE seg = 1)), a, b
  ) WHERE h / {_KMV_SPACE} < t
)
SELECT n_a_est, n_b_est, union_est,
       coalesce(inter_est, 0.0) AS inter_est,
       round(coalesce(inter_est, 0.0) / union_est, 6) AS jaccard_est
FROM a, b, uest, ie
"""


SKETCH_QUERIES = {
    # Registered in the round-8 rotation (slot funded by q_domain_mix,
    # whose boundary-crossing keep rule stays hash-checked inside the
    # registered q_temperature_mix and the funnel's mix stage).
    "q_hist_quantiles": q_hist_quantiles,
}
SKETCH_ORACLES = {
    "q_hist_quantiles": HIST_QUANTILES_ORACLE,
}

# Round-10 rotation (VERDICT r09 #6): q_kmv_overlap's slot funds
# q_dedup_substrings. The eviction loses nothing — the KMV row is a
# 1-row sketch readout (weakest discriminating power on the board)
# whose hash-exactness stays pinned by the driver-grade DuckDB parity
# in tests/test_unregistered_ops.py::
# test_kmv_overlap_oracle_parity_and_accuracy (held a slot rounds
# 5-9, always green).
UNREGISTERED_SKETCH_QUERIES = {"q_kmv_overlap": q_kmv_overlap}
UNREGISTERED_SKETCH_ORACLES = {"q_kmv_overlap": KMV_OVERLAP_ORACLE}
