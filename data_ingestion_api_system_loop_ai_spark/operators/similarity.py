"""Similarity search over the ``embeddings`` table (SURVEY.md B15).

- ``q_similarity_topk``: exact brute-force cosine top-k for a query set —
  the correctness baseline. Dot products are a fold over ``zip_with``
  (JVM-side, no Python), left-to-right in element order so DuckDB's
  in-order ``list_sum`` reproduces the same doubles bit-for-bit.
- ``q_similarity_ivf``: the scale path — IVF multi-probe over a
  DATA-DERIVED quantizer whose cell count GROWS with the corpus
  (VERDICT r02 #2; the round-2 cells were the data-fixed ``label``
  column, a constant-k quantizer whose per-cell scan goes O(n^2/k)).
  ``ivf_assign`` takes a systematic sample of ~ceil(sqrt(n)) seed
  vectors (every floor(n/k)-th vector in vec_id rank order, ranked
  with the two-phase distributed row number — no single-partition
  sort), assigns every vector to its max-cosine seed
  (the Voronoi partition an IVF-flat index trains on a sample —
  FAISS-style, but deterministic so DuckDB replicates it), and the
  per-cell candidate scan is then O(n * sqrt(n)) corpus-wide, with
  assignment cost O(n * sqrt(n) * d). Per-cell centroids are refined
  exactly (decimal element sums, so both engines produce bit-identical
  doubles), each query ranks centroids by cosine and probes its NPROBE
  nearest cells, and the candidate scan is an equi-join on the probed
  cell ids: shuffle-partitionable. Multi-probe is what makes IVF
  recall usable at 100 TB — a query near a cell boundary still sees
  its true neighbors. (At extreme scale the assignment itself is
  hierarchical — a coarse quantizer over the seeds — but the cell
  geometry below is unchanged.)

Both are oracle-checkable; a vectorized Pandas-UDF variant of the dot
product lives in ``udfs.py`` for the UDF-surface demo and benchmarking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.loader import load_table, spread_small_scan

TOPK = 10
IVF_TOPK = 5
NPROBE = 2  # cells probed per query (own + next-nearest, typically)


def dot_expr(a: str, b: str) -> Column:
    """Left-fold dot product in double precision (order = element order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: str) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: str, b: str) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for every 100th vector as query, brute force
    over all candidates (broadcast the small query side; the candidate
    scan stays partitioned). Norms are precomputed per side BEFORE the
    pair join — cosine inside the join is one dot product and one
    divide, not three dot products; identical doubles (same fold order),
    a third of the FLOPs."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_expr("embedding").alias("q_norm"),
    )
    cand = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        norm_expr("embedding").alias("c_norm"),
    )
    pairs = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm")), 6
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOPK)
    )


def ivf_seeds(e: DataFrame) -> DataFrame:
    """(seed_id, seed_emb, seed_norm): the quantizer's seed vectors —
    a systematic sample of ~ceil(sqrt(n)) ids in vec_id rank order
    (see ``ivf_assign``). Exposed separately so a persisted index can
    store the TRAINED quantizer and assign future appends against it
    without retraining (the FAISS add-to-trained-index contract)."""
    from ..plans.ranking import global_row_number

    stats = e.agg(F.count("*").alias("n")).select(
        F.greatest(
            (F.col("n") / F.ceil(F.sqrt(F.col("n")))).cast("long"), F.lit(1)
        ).alias("step")
    )
    ids = e.select("vec_id").withColumn(
        "_bkt", (F.col("vec_id") / 4096).cast("long")
    )
    seed_ids = (
        global_row_number(ids, ["_bkt"], ["vec_id"], rn_col="_rn")
        .crossJoin(F.broadcast(stats))
        .filter((F.col("_rn") - 1) % F.col("step") == 0)
        .select("vec_id")
    )
    return e.join(F.broadcast(seed_ids), "vec_id", "left_semi").select(
        F.col("vec_id").alias("seed_id"),
        F.col("embedding").alias("seed_emb"),
        norm_expr("embedding").alias("seed_norm"),
    )


def ivf_assign(e: DataFrame, seeds: DataFrame | None = None) -> DataFrame:
    """Data-derived IVF quantizer: returns ``(vec_id, embedding, v_norm,
    cell)`` where ``cell`` is the seed vector the row is nearest to
    (max cosine, ties to the smallest seed id).

    Seeds are a SYSTEMATIC SAMPLE: every ``step``-th vector in vec_id
    rank order, ``step = max(floor(n / ceil(sqrt(n))), 1)`` — exactly
    ``ceil(n/step) >= ceil(sqrt(n))`` seeds, so the cell count GROWS
    with the corpus (monotone, no Bernoulli-sampling variance — a
    hash-mod draw over this corpus's small id domain deviated >3
    sigma) and expected cell population is ~sqrt(n). Ranking uses the
    two-phase ``global_row_number`` over the 8-byte id column only
    (embeddings never enter the rank shuffle; seed vectors are fetched
    back by a broadcast semi-join of k ids). The assignment is one
    broadcast of the seed relation (k rows) against the corpus; the
    per-vector argmax is a ``max(struct(...))`` over 24-BYTE PRIMITIVE
    rows (lexicographic: cosine, then -seed_id), NOT a window — no
    n*k-row shuffle reaches the exchange, and the winner's embedding is
    re-attached by one n-row equi-join on vec_id AFTER the argmax.
    The embedding must NOT ride inside the max struct (the r13 512 k
    diagnosis, SURVEY §6): an array-typed aggregation buffer is not
    HashAggregate-mutable, so Spark runs ObjectHashAggregate, whose
    sort-based fallback (128 distinct keys per partition) externally
    SORTS the full n*k pair relation — with the ~600-byte embedding on
    every row that sort spills superlinearly (measured: the sharded
    build's assignment stage read 18.8/73.6/711 s at 128 k/256 k/512 k
    carrying embeddings; 24-byte rows sort in execution memory at every
    measured size). Passing ``seeds`` assigns against a FROZEN
    quantizer (the persisted-index append path, ``ann_index``) instead
    of deriving one from ``e``."""
    if seeds is None:
        seeds = ivf_seeds(e)
    # the n*k dot-product crossJoin is the CPU-heavy stage: spread a
    # few-split scan across cores first (no-op when the input already
    # carries >= cores partitions — see spread_small_scan)
    v = spread_small_scan(e, "vec_id").select(
        "vec_id", "embedding", norm_expr("embedding").alias("v_norm")
    )
    best = F.max(
        F.struct(
            (
                dot_expr("embedding", "seed_emb")
                / (F.col("v_norm") * F.col("seed_norm"))
            ).alias("c"),
            (-F.col("seed_id")).alias("neg"),
            F.col("seed_id").alias("cell"),
        )
    ).alias("b")
    # the trailing repartition(cell) is a deliberate REUSE BARRIER (the
    # _shingle_sets trick): every consumer reads this relation from
    # several subtrees (centroid refinement + candidate scan; both pair
    # sides of embedding dedup), and a shared Exchange lets AQE's
    # runtime exchange reuse evaluate the n*k assignment crossJoin once
    # instead of once per subtree. hash(cell) is also exactly the
    # distribution the downstream cell equi-joins and per-cell scans
    # want. Explicitly NUMBERED: AQE coalesces shuffles by byte size,
    # and this relation is byte-tiny but feeds CPU-heavy per-cell pair
    # joins — the column-only form was coalesced to 1-2 tasks (the
    # q_dsir_select lesson).
    win = (
        v.crossJoin(F.broadcast(seeds))
        .groupBy("vec_id")
        .agg(best)
        .select("vec_id", F.col("b.cell").alias("cell"))
    )
    return (
        v.join(win, "vec_id")
        .select("vec_id", "embedding", "v_norm", "cell")
        .repartition(
            e.sparkSession.sparkContext.defaultParallelism, F.col("cell")
        )
    )


def ivf_centroids(asg: DataFrame) -> DataFrame:
    """(cell, centroid): exact per-cell centroids — decimal element
    sums (order-independent), double division by the count — both
    engines produce identical doubles."""
    return (
        asg.select("cell", F.posexplode("embedding").alias("i", "v"))
        .groupBy("cell", "i")
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(25,12)")).cast("double")
                / F.count("*")
            ).alias("cv")
        )
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "cv"))), lambda s: s["cv"]
            ).alias("centroid")
        )
    )


def ivf_probe(e: DataFrame, cent: DataFrame, asg: DataFrame) -> DataFrame:
    """The IVF query side, independent of where the quantizer came
    from (trained inline or read from a persisted index): each query
    (every 100th vector) probes its NPROBE nearest cells by centroid
    cosine, candidates are an equi-join on the probed cell ids."""
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_expr("embedding").alias("q_norm"),
    )
    wp = W.partitionBy("query_id").orderBy(F.col("cent_cos").desc(), F.col("cell"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cent_cos", cosine_expr("q_emb", "centroid"))
        .withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= NPROBE)
        .select("query_id", "q_emb", "q_norm", "cell")
    )
    cand = asg.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("v_norm").alias("c_norm"),
        "cell",
    )
    pairs = (
        cand.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "cell",
            "neighbor_id",
            F.round(
                dot_expr("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm")), 6
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= IVF_TOPK)
    )


def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF multi-probe cosine top-5 over the data-derived quantizer
    (``ivf_assign``): per-cell centroids refined exactly (decimal
    element sums -> bit-identical doubles on both engines), each query
    probes its NPROBE nearest cells by centroid cosine, candidates are
    an equi-join on the probed cell ids. The centroid relation is tiny
    (~sqrt(n) cells x dims) and broadcast; the big candidate side
    shuffles once on the cell id. A query near a cell boundary still
    finds neighbors in the adjacent cell — the recall fix that makes
    IVF usable.

    This INLINE form retrains the quantizer inside the query — the
    oracle-checkable correctness shape. The production shape
    (VERDICT r03 #5) is ``operators/ann_index.py``: centroids,
    assignments, and PQ codebooks/codes are build-once artifacts
    persisted under an ``_index`` directory, queries probe from the
    stored relations (``q_similarity_ivf_from_index`` — pinned
    result-identical to this query), and appends assign new vectors
    against the frozen quantizer."""
    e = load_table(spark, sf_dir, "embeddings")
    asg = ivf_assign(e)
    return ivf_probe(e, ivf_centroids(asg), asg)


SIMILARITY_QUERIES = {
    "q_similarity_topk": q_similarity_topk,
    "q_similarity_ivf": q_similarity_ivf,
}

_DOT = (
    "list_sum(list_transform(range(1, len({a})+1),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _cos(a: str, b: str) -> str:
    return (
        f"({_DOT.format(a=a, b=b)}"
        f" / (sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)})))"
    )


# DuckDB twin of ``ivf_assign``: ends at the ``cells`` CTE (vec_id,
# embedding, v_norm, cell); consumers append their own CTEs with a
# leading comma. Every hash/fold matches the Spark side bit-for-bit.
IVF_CELLS_CTE = f"""
WITH stats AS (
  SELECT greatest(CAST(count(*) // CAST(ceil(sqrt(count(*))) AS BIGINT) AS BIGINT), 1) AS step
  FROM embeddings
),
ranked AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn FROM embeddings
),
seed_ids AS (
  SELECT vec_id FROM ranked, stats WHERE (rn - 1) % step = 0
),
seeds AS (
  SELECT vec_id AS seed_id, embedding AS seed_emb,
         sqrt({_DOT.format(a='embedding', b='embedding')}) AS seed_norm
  FROM embeddings JOIN seed_ids USING (vec_id)
),
vn AS (
  SELECT vec_id, embedding,
         sqrt({_DOT.format(a='embedding', b='embedding')}) AS v_norm
  FROM embeddings
),
av AS (
  SELECT vn.vec_id,
         max({{'c': {_DOT.format(a='vn.embedding', b='seed_emb')} / (v_norm * seed_norm),
              'neg': -seed_id, 'cell': seed_id,
              'emb': vn.embedding, 'vnorm': v_norm}}) AS b
  FROM vn, seeds
  GROUP BY vn.vec_id
),
cells AS (
  SELECT vec_id,
         struct_extract(b, 'emb') AS embedding,
         struct_extract(b, 'vnorm') AS v_norm,
         struct_extract(b, 'cell') AS cell
  FROM av
)"""

SIMILARITY_ORACLES = {
    "q_similarity_topk": f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 100 = 0
),
pairs AS (
  SELECT query_id, vec_id AS neighbor_id,
         round({_cos('qe', 'embedding')}, 6) AS cosine
  FROM q, embeddings WHERE vec_id <> query_id
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM pairs
) WHERE rnk <= {TOPK}
""",
    "q_similarity_ivf": IVF_CELLS_CTE
    + f""",
q AS (
  SELECT vec_id AS query_id, embedding AS qe
  FROM embeddings WHERE vec_id % 100 = 0
),
flat AS (
  SELECT cell,
         unnest(list_transform(range(1, len(embedding)+1),
                               i -> {{'i': i, 'v': embedding[i]}})) AS s
  FROM cells
),
centf AS (
  SELECT cell, s.i AS i,
         CAST(SUM(CAST(CAST(s.v AS DOUBLE) AS DECIMAL(25,12))) AS DOUBLE) / count(*) AS cv
  FROM flat GROUP BY cell, s.i
),
cent AS (
  SELECT cell, list(cv ORDER BY i) AS centroid FROM centf GROUP BY cell
),
probes AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_cos('qe', 'centroid')} DESC, c.cell) AS pr
    FROM q, cent c
  ) WHERE pr <= {NPROBE}
),
pairs AS (
  SELECT p.query_id, e.cell AS cell, e.vec_id AS neighbor_id,
         round({_cos('qe', 'e.embedding')}, 6) AS cosine
  FROM probes p
  JOIN q USING (query_id)
  JOIN cells e ON e.cell = p.cell AND e.vec_id <> p.query_id
)
SELECT query_id, cell, neighbor_id, cosine, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM pairs
) WHERE rnk <= {IVF_TOPK}
""",
}


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (SimHash-for-vectors) ANN variant
# ---------------------------------------------------------------------------
#
# The third member of the ANN family (exact brute force = correctness
# baseline; IVF = trained-quantizer scale path): HYPERPLANE LSH needs
# no training pass at all — each vector's signature is the sign pattern
# of its dot products with NPLANES fixed pseudo-random hyperplanes
# (Charikar's SimHash for cosine similarity), and candidates are pairs
# agreeing on ALL bits of at least one band (banding identical to the
# MinHash family). Properties vs IVF: zero training cost, signatures
# are a pure per-row projection (no shuffle until the band join), and
# the collision probability has the closed form (1 - theta/pi)^R per
# band — but it cannot adapt to data geometry the way a trained
# quantizer does. At 100 TB you pick per workload; the engine offers
# both.
#
# Hyperplane components are DERIVED, not drawn: component i of plane p
# is md5("rp:<p>:<i>") -> first 8 hex chars -> uniform in [0,1) -> -0.5
# (symmetric around zero; sign-hashing needs only symmetry, not
# gaussianity). The doubles are computed once in Python below and
# embedded as literals in BOTH the Spark plan and the DuckDB oracle, so
# the scheme is engine-portable and has no RNG state anywhere.

import hashlib

RP_NPLANES = 16
RP_BANDS = 4
RP_R = RP_NPLANES // RP_BANDS  # bits per band
RP_DIM = 64  # embeddings table dimension
RP_TOPK = 5


def _rp_component(p: int, i: int) -> float:
    h = hashlib.md5(f"rp:{p}:{i}".encode()).hexdigest()[:8]
    return int(h, 16) / 2**32 - 0.5


RP_PLANES: list[list[float]] = [
    [_rp_component(p, i) for i in range(RP_DIM)] for p in range(RP_NPLANES)
]


def _rp_bit(emb: str, p: int) -> Column:
    plane = F.array(*[F.lit(x) for x in RP_PLANES[p]])
    dp = F.aggregate(
        F.zip_with(emb, plane, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (dp > 0).cast("int")


def rplsh_signatures(e: DataFrame) -> DataFrame:
    """(vec_id, embedding, v_norm, band, key): one row per (vector,
    band), key = the band's R sign bits as a string. A pure projection
    + explode — the hyperplane constants live in the plan."""
    bits = [_rp_bit("embedding", p).alias(f"_b{p}") for p in range(RP_NPLANES)]
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "", *[F.col(f"_b{b * RP_R + j}").cast("string") for j in range(RP_R)]
            ).alias("key"),
        )
        for b in range(RP_BANDS)
    ]
    return (
        e.select(
            "vec_id", "embedding", norm_expr("embedding").alias("v_norm"), *bits
        )
        .select(
            "vec_id",
            "embedding",
            "v_norm",
            F.explode(F.array(*band_structs)).alias("bk"),
        )
        .select(
            "vec_id",
            "embedding",
            "v_norm",
            F.col("bk.band").alias("band"),
            F.col("bk.key").alias("key"),
        )
    )


def q_similarity_rplsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH cosine top-5: queries (every 100th vector) meet
    candidates through the (band, key) equi-join — the query side is
    tiny and broadcast, so the big side never shuffles for the probe —
    then exact cosine ranks the (deduplicated) candidates."""
    e = load_table(spark, sf_dir, "embeddings")
    sig = rplsh_signatures(e)
    q = sig.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("v_norm").alias("q_norm"),
        "band",
        "key",
    )
    cand = sig.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("v_norm").alias("c_norm"),
        "band",
        "key",
    )
    pairs = (
        cand.join(F.broadcast(q), ["band", "key"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_emb", "q_norm", "c_emb", "c_norm")
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm")), 6
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= RP_TOPK)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN with asymmetric-distance (ADC) scan
# ---------------------------------------------------------------------------
#
# The fourth member of the ANN family, and the MEMORY story at 100 TB:
# brute force (correctness baseline), hyperplane LSH (training-free
# probe), IVF (trained cell partition), and now PQ — the corpus is
# compressed to M=8 codebook ids of log2(K)=4 bits each (~4 B/vector vs
# 512 B of raw doubles, 128x), and queries scan CODES, not vectors:
# each query precomputes an M x K table of exact subspace distances to
# the codebook (the "asymmetric" half — the query side stays
# full-precision), and a candidate's approximate distance is M table
# lookups summed. At cluster scale the codes relation is what stays
# resident/shuffled; raw embeddings are touched only at encode time.
#
# Engine-portable determinism, same tricks as IVF above:
#   - vectors are L2-normalized first (identical double divisions both
#     engines), so ascending L2^2 ranks exactly like descending cosine
#     and the recall test can reuse the exact top-k as ground truth;
#   - codebook seeds are a systematic sample (every step-th vector in
#     vec_id rank order, first K), codeword id = sample position — no
#     RNG anywhere;
#   - one exact Lloyd refinement: codeword = elementwise mean of its
#     assigned subvectors via DECIMAL(25,12) sums (order-independent,
#     bit-identical doubles in Spark and DuckDB);
#   - ADC sums the M lookup values as decimals (order-independent)
#     before the final double round.

PQ_M = 8  # subspaces
PQ_SUB = RP_DIM // PQ_M  # dims per subspace
PQ_K = 16  # codewords per subspace (4-bit codes)
PQ_TOPK = 5


def _let(bound: Column, fn) -> Column:
    """LET-bind ``bound``: evaluate once per row, use many times inside
    ``fn``. (transform-over-singleton-array; HOF bodies escape codegen
    subexpression elimination, so plain aliases inlined by
    CollapseProject re-evaluate per reference — README round-3
    lesson 1.)"""
    return F.element_at(F.transform(F.array(bound), fn), 1)


def _l2_expr(a, b) -> Column:
    """Left-fold squared L2 distance (element order, like dot_expr)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_subvectors(e: DataFrame) -> DataFrame:
    """(vec_id, m, sv): each vector L2-normalized then cut into PQ_M
    subvectors of PQ_SUB dims. Norm and unit vector are let-bound so
    the fold runs once per row, not once per slice/element. The
    trailing repartition is the deliberate reuse barrier (the
    ``_shingle_sets`` trick): training pass, encode pass, and the query
    distance tables all consume this relation, and one shared Exchange
    lets AQE evaluate the normalize+slice projection once."""
    unit = _let(
        norm_expr("embedding"),
        lambda n: F.transform(F.col("embedding"), lambda x: x.cast("double") / n),
    )
    slices = _let(
        unit,
        lambda u: F.array(
            *[
                F.struct(
                    F.lit(m).cast("long").alias("m"),
                    F.slice(u, m * PQ_SUB + 1, PQ_SUB).alias("sv"),
                )
                for m in range(PQ_M)
            ]
        ),
    )
    return (
        e.select("vec_id", F.explode(slices).alias("s"))
        .select("vec_id", F.col("s.m").alias("m"), F.col("s.sv").alias("sv"))
        .repartition("vec_id", "m")
    )


def pq_codebooks(e: DataFrame, subs: DataFrame | None = None) -> DataFrame:
    """(m, c, cw): the trained codebooks. Seeds are the first PQ_K
    vectors of a systematic sample over vec_id rank order (two-phase
    distributed row number — ids only, no single-partition sort of
    vectors), codeword id c = sample position 0..K-1; one exact Lloyd
    step refines each codeword to the decimal-sum mean of its assigned
    subvectors. Empty cells drop out (their seed drew no vectors) —
    nearest-codeword semantics are unaffected. All relations here are
    tiny (K*M rows) except the one assignment pass, which is a
    broadcast join + map-side-combinable min(struct) — no n*K shuffle."""
    from ..plans.ranking import global_row_number

    if subs is None:
        subs = pq_subvectors(e)
    stats = e.agg(F.count("*").alias("n")).select(
        F.greatest((F.col("n") / PQ_K).cast("long"), F.lit(1)).alias("step")
    )
    ids = e.select("vec_id").withColumn("_bkt", (F.col("vec_id") / 4096).cast("long"))
    seed_sel = (
        global_row_number(ids, ["_bkt"], ["vec_id"], rn_col="_rn")
        .crossJoin(F.broadcast(stats))
        .filter((F.col("_rn") - 1) % F.col("step") == 0)
        .withColumn("c", ((F.col("_rn") - 1) / F.col("step")).cast("long"))
        .filter(F.col("c") < PQ_K)
        .select("vec_id", "c")
    )
    cb0 = subs.join(F.broadcast(seed_sel), "vec_id").select(
        "m", "c", F.col("sv").alias("cw0")
    )
    a1 = (
        subs.join(F.broadcast(cb0), "m")
        .groupBy("vec_id", "m")
        .agg(
            F.min(
                F.struct(
                    _l2_expr("sv", "cw0").alias("d"),
                    F.col("c").alias("c"),
                    F.col("sv").alias("sv"),
                )
            ).alias("b")
        )
        .select("m", F.col("b.c").alias("c"), F.col("b.sv").alias("sv"))
    )
    return (
        a1.select("m", "c", F.posexplode("sv").alias("i", "v"))
        .groupBy("m", "c", "i")
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(25,12)")).cast("double") / F.count("*")
            ).alias("cv")
        )
        .groupBy("m", "c")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "cv"))), lambda s: s["cv"]
            ).alias("cw")
        )
    )


def pq_encode(e: DataFrame, subs: DataFrame | None = None,
              codebooks: DataFrame | None = None) -> DataFrame:
    """(vec_id, m, code): every vector's nearest refined codeword per
    subspace — the compressed representation (M x log2(K) bits). Row
    form; ``pq_codes_array`` collects the array form."""
    if subs is None:
        subs = pq_subvectors(e)
    if codebooks is None:
        codebooks = pq_codebooks(e, subs)
    return (
        subs.join(F.broadcast(codebooks), "m")
        .groupBy("vec_id", "m")
        .agg(
            F.min(
                F.struct(_l2_expr("sv", "cw").alias("d"), F.col("c").alias("c"))
            ).alias("b")
        )
        .select("vec_id", "m", F.col("b.c").alias("code"))
    )


def pq_codes_array(e: DataFrame) -> DataFrame:
    """(vec_id, code: array<long> length PQ_M) — the stored index."""
    return (
        pq_encode(e)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "code"))),
                lambda s: s["code"],
            ).alias("code")
        )
    )


PQ_SHORTLIST = 100  # ADC candidates refined exactly per query


def q_similarity_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC cosine top-5, the FAISS IVFPQ+refine shape: queries
    (every 100th vector) build exact M x K distance tables against the
    codebooks (tiny, broadcast); the corpus is scanned as CODES ONLY —
    approximate distance is the decimal-exact sum of M table lookups,
    so the big side of the shortlist join never touches a raw
    embedding — and the ADC top-PQ_SHORTLIST per query is then re-ranked
    with EXACT cosines (a broadcast of R*nq candidate ids back against
    the vector relation). Shortlist depth R is a constant per query —
    it scales with k, not with the corpus, so the exact-refine cost at
    100 TB is unchanged while the scan side shrinks 128x."""
    e = load_table(spark, sf_dir, "embeddings")
    subs = pq_subvectors(e)
    cb = pq_codebooks(e, subs)
    codes = pq_encode(e, subs, cb)
    dtable = (
        subs.filter(F.col("vec_id") % 100 == 0)
        .join(F.broadcast(cb), "m")
        .select(
            F.col("vec_id").alias("query_id"),
            "m",
            "c",
            _l2_expr("sv", "cw").alias("d"),
        )
    )
    adc = (
        codes.join(
            F.broadcast(dtable),
            (codes.m == dtable.m) & (codes.code == dtable.c),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(
            F.round(
                F.sum(F.col("d").cast("decimal(25,12)")).cast("double"), 6
            ).alias("approx_d")
        )
    )
    ws = W.partitionBy("query_id").orderBy("approx_d", "neighbor_id")
    short = (
        adc.withColumn("srnk", F.row_number().over(ws))
        .filter(F.col("srnk") <= PQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    qv = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_expr("embedding").alias("q_norm"),
    )
    cv = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        norm_expr("embedding").alias("c_norm"),
    )
    refined = (
        cv.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm")), 6
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        refined.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= PQ_TOPK)
    )


def _rp_plane_sql(p: int) -> str:
    return "[" + ", ".join(repr(x) for x in RP_PLANES[p]) + "]"


_RP_BITS_SQL = ", ".join(
    f"CAST(list_sum(list_transform(range(1, {RP_DIM}+1),"
    f" i -> CAST(embedding[i] AS DOUBLE) * ({_rp_plane_sql(p)})[i])) > 0"
    f" AS INTEGER) AS b{p}"
    for p in range(RP_NPLANES)
)
_RP_BANDS_SQL = "\n  UNION ALL ".join(
    "SELECT vec_id, {b} AS band, ".format(b=b)
    + " || ".join(f"CAST(b{b * RP_R + j} AS VARCHAR)" for j in range(RP_R))
    + " AS key FROM bits"
    for b in range(RP_BANDS)
)

# Oracle for the unregistered q_similarity_rplsh (driver-grade parity
# via tests/test_unregistered_ops.py; the registry is at its 50-slot cap).
SIMILARITY_RPLSH_ORACLE = f"""
WITH bits AS (
  SELECT vec_id, embedding,
         sqrt({_DOT.format(a='embedding', b='embedding')}) AS v_norm,
         {_RP_BITS_SQL}
  FROM embeddings
),
banded AS (
  {_RP_BANDS_SQL}
),
q AS (SELECT * FROM banded WHERE vec_id % 100 = 0),
cand_pairs AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM q JOIN banded c ON q.band = c.band AND q.key = c.key
  WHERE c.vec_id <> q.vec_id
),
scored AS (
  SELECT p.query_id, p.neighbor_id,
         round({_DOT.format(a='qb.embedding', b='cb.embedding')}
               / (qb.v_norm * cb.v_norm), 6) AS cosine
  FROM cand_pairs p
  JOIN bits qb ON qb.vec_id = p.query_id
  JOIN bits cb ON cb.vec_id = p.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM scored
) WHERE rnk <= {RP_TOPK}
"""


def _l2_sql(a: str, b: str) -> str:
    """DuckDB twin of ``_l2_expr`` (list_sum matches the left fold
    bit-for-bit, as established for the dot products above)."""
    return (
        f"list_sum(list_transform(range(1, {PQ_SUB}+1),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


# Oracle for the unregistered q_similarity_pq (driver-grade parity via
# tests/test_unregistered_ops.py; the registry is at its 50-slot cap).
SIMILARITY_PQ_ORACLE = f"""
WITH stats AS (
  SELECT greatest(CAST(count(*) // {PQ_K} AS BIGINT), 1) AS step FROM embeddings
),
vn AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(x AS DOUBLE)
                / sqrt({_DOT.format(a='embedding', b='embedding')})) AS unit
  FROM embeddings
),
ranked AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn FROM embeddings
),
seed_sel AS (
  SELECT vec_id, (rn - 1) // step AS c
  FROM ranked, stats
  WHERE (rn - 1) % step = 0 AND (rn - 1) // step < {PQ_K}
),
subm AS (
  SELECT vec_id, t.m,
         list_slice(unit, t.m * {PQ_SUB} + 1, t.m * {PQ_SUB} + {PQ_SUB}) AS sv
  FROM vn, range(0, {PQ_M}) t(m)
),
cb0 AS (
  SELECT s.c, sub.m, sub.sv AS cw0
  FROM subm sub JOIN seed_sel s USING (vec_id)
),
a1 AS (
  SELECT sub.vec_id, sub.m,
         min({{'d': {_l2_sql('sub.sv', 'cb0.cw0')}, 'c': cb0.c, 'sv': sub.sv}}) AS b
  FROM subm sub JOIN cb0 ON sub.m = cb0.m
  GROUP BY sub.vec_id, sub.m
),
a1x AS (
  SELECT m, struct_extract(b, 'c') AS c, struct_extract(b, 'sv') AS sv FROM a1
),
flat AS (
  SELECT m, c,
         unnest(list_transform(range(1, {PQ_SUB}+1),
                               i -> {{'i': i, 'v': sv[i]}})) AS s
  FROM a1x
),
rfe AS (
  SELECT m, c, s.i AS i,
         CAST(SUM(CAST(CAST(s.v AS DOUBLE) AS DECIMAL(25,12))) AS DOUBLE) / count(*) AS cv
  FROM flat GROUP BY m, c, s.i
),
ref AS (
  SELECT m, c, list(cv ORDER BY i) AS cw FROM rfe GROUP BY m, c
),
codes AS (
  SELECT sub.vec_id, sub.m,
         struct_extract(
           min({{'d': {_l2_sql('sub.sv', 'ref.cw')}, 'c': ref.c}}), 'c') AS code
  FROM subm sub JOIN ref ON sub.m = ref.m
  GROUP BY sub.vec_id, sub.m
),
qd AS (
  SELECT sub.vec_id AS query_id, sub.m, ref.c,
         {_l2_sql('sub.sv', 'ref.cw')} AS d
  FROM subm sub JOIN ref ON sub.m = ref.m
  WHERE sub.vec_id % 100 = 0
),
adc AS (
  SELECT qd.query_id, codes.vec_id AS neighbor_id,
         round(CAST(SUM(CAST(qd.d AS DECIMAL(25,12))) AS DOUBLE), 6) AS approx_d
  FROM codes JOIN qd ON codes.m = qd.m AND codes.code = qd.c
  WHERE codes.vec_id <> qd.query_id
  GROUP BY qd.query_id, codes.vec_id
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY approx_d, neighbor_id) AS srnk
    FROM adc
  ) WHERE srnk <= {PQ_SHORTLIST}
),
refined AS (
  SELECT s.query_id, s.neighbor_id,
         round({_cos('qe.embedding', 'ce.embedding')}, 6) AS cosine
  FROM short s
  JOIN embeddings qe ON qe.vec_id = s.query_id
  JOIN embeddings ce ON ce.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM refined
) WHERE rnk <= {PQ_TOPK}
"""


# ---------------------------------------------------------------------------
# Approximate kNN GRAPH over the whole corpus — every vector's top-k
# cosine neighbors (the substrate for graph-based curation: connected
# components over near-dup edges, graph clustering, NN-descent
# refinement). Query side = the ENTIRE corpus, so unlike ivf_probe the
# probe relation cannot broadcast: candidates are a plain shuffle
# equi-join on the probed cell id — both sides O(n), key-balanced by
# the quantizer's ~sqrt(n)-cell design. Corpus-wide pair evaluations
# are n * nprobe * avg_cell ≈ 2n*sqrt(n): the standard IVF graph-build
# cost, vs n^2 brute force.
# ---------------------------------------------------------------------------

KNN_K = 5
# Candidate-side cap per cell — the giant-cell guard (the LSH_BUCKET_CAP
# argument applied to IVF cells): a dense duplicate cluster (ubiquitous
# in web-scale embeddings) lands thousands of near-identical vectors in
# ONE cell, and the per-cell candidate join would go quadratic in the
# cluster size. Members past the cap (ranked by vec_id inside the cell —
# a sort-based, spillable window) are dropped from the CANDIDATE side
# only (they still probe as queries), observable via
# ``knn_cell_overflow``; they sit in dense duplicate regions that the
# dedup operators own. The cap rule is mirrored verbatim in the DuckDB
# oracle, so the hash check covers the capped algorithm itself.
KNN_CELL_CAP = 1024


def knn_graph(
    e: DataFrame, cent: DataFrame, asg: DataFrame, k: int = KNN_K
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rnk): top-k neighbors of EVERY
    vector via IVF multi-probe. ``cent``/``asg`` may come from an
    inline fit or the persisted ANN index — same relations either
    way."""
    # the probe side computes an n*k dot-product against the broadcast
    # centroids and then the per-pair cosines — spread a few-split scan
    # first (no-op at cluster scale)
    q = spread_small_scan(e, "vec_id").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_expr("embedding").alias("q_norm"),
    )
    wp = W.partitionBy("query_id").orderBy(F.col("cent_cos").desc(), F.col("cell"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cent_cos", cosine_expr("q_emb", "centroid"))
        .withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= NPROBE)
        .select("query_id", "q_emb", "q_norm", "cell")
    )
    wc = W.partitionBy("cell").orderBy("neighbor_id")
    cand = (
        asg.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_emb"),
            F.col("v_norm").alias("c_norm"),
            "cell",
        )
        .withColumn("_crn", F.row_number().over(wc))
        .filter(F.col("_crn") <= KNN_CELL_CAP)
        .drop("_crn")
    )
    # NOT broadcast: the probe side is corpus-sized here — shuffle hash
    # join on the cell id (AQE may still broadcast at tiny SF)
    pairs = (
        probes.join(cand, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm")), 6
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide approximate kNN graph (inline quantizer fit — the
    oracle-checkable form; the production path probes the persisted
    index via ``ann_index.q_knn_graph_from_index``, pinned identical).
    (Unregistered — 50-slot cap; driver-grade DuckDB parity in
    tests/test_unregistered_ops.py.)"""
    e = load_table(spark, sf_dir, "embeddings")
    asg = ivf_assign(e)
    return knn_graph(e, ivf_centroids(asg), asg)


KNN_SEED_BUDGET = 128
# deterministic random-bridge candidates per node (LCG over the id
# domain — identical BIGINT arithmetic on both engines, magnitudes kept
# under 2^53 so DuckDB never hits its multiplication-overflow error)
KNN_BRIDGE_R = 8
_BRIDGE_MULT = 69069       # Marsaglia LCG multiplier
_BRIDGE_STEP = 40503
# cells probed by the budgeted SEED (round 10): the single-probe seed
# measured recall 0.39 at 32 k and NN-Descent PLATEAUED at 0.52 by
# round 2 (flat through round 8) — on near-random vectors the rounds
# cannot escape the seed's intra-cell locality, so the seed itself
# must cross cells. The second probe reuses the assignment crossJoin
# shape (16-byte aggregation rows, no corpus-sized window shuffle —
# the thing that made the old multi-probe build n^1.5 SHUFFLE-bound
# rather than compute-bound).
KNN_SEED_PROBES = 2


def ivf_second_cell(asg: DataFrame, seeds: DataFrame) -> DataFrame:
    """(vec_id, cell2): each vector's SECOND-nearest seed (max cosine
    among seeds other than its assigned cell, ties to the smallest
    seed id) — the cross-cell probe of the budgeted seed graph.

    Cost shape: one more n x sqrt(n) broadcast crossJoin of pure
    whole-stage-codegen compute; the aggregate struct carries (cosine,
    -seed_id, seed_id) — 24 bytes, never an embedding — and the
    map-side partial max reduces every vector to one row before the
    exchange, so the stage is CPU-bound with a byte-tiny shuffle."""
    best2 = F.max(
        F.struct(
            (
                dot_expr("embedding", "seed_emb")
                / (F.col("v_norm") * F.col("seed_norm"))
            ).alias("c"),
            (-F.col("seed_id")).alias("neg"),
            F.col("seed_id").alias("cell2"),
        )
    ).alias("b2")
    return (
        asg.select("vec_id", "embedding", "v_norm", "cell")
        .crossJoin(F.broadcast(seeds))
        .filter(F.col("seed_id") != F.col("cell"))
        .groupBy("vec_id")
        .agg(best2)
        .select("vec_id", F.col("b2.cell2").alias("cell2"))
    )


def ivf_third_cell(
    asg: DataFrame, seeds: DataFrame, cell2: DataFrame
) -> DataFrame:
    """(vec_id, cell3): each vector's THIRD-nearest seed (max cosine
    among seeds other than its assigned cell and its ``cell2``, ties
    to the smallest seed id) — the octave-growth probe of the budgeted
    seed graph (VERDICT r10 #3: two probes hold recall 0.90 at 32 k
    but plateau ≈0.87 at 128 k however the budget grows, because the
    limiting factor is CELL COVERAGE, not per-cell candidates — the
    measured b128/256/512 curve saturates at 0.644/0.775/0.858).

    Same cost shape as ``ivf_second_cell``: one more n x sqrt(n)
    broadcast crossJoin of pure codegen compute, 24-byte aggregation
    rows, map-side partial max — CPU-bound, byte-tiny shuffle."""
    best3 = F.max(
        F.struct(
            (
                dot_expr("embedding", "seed_emb")
                / (F.col("v_norm") * F.col("seed_norm"))
            ).alias("c"),
            (-F.col("seed_id")).alias("neg"),
            F.col("seed_id").alias("cell3"),
        )
    ).alias("b3")
    return (
        asg.select("vec_id", "embedding", "v_norm", "cell")
        .join(cell2, "vec_id")
        .crossJoin(F.broadcast(seeds))
        .filter(
            (F.col("seed_id") != F.col("cell"))
            & (F.col("seed_id") != F.col("cell2"))
        )
        .groupBy("vec_id")
        .agg(best3)
        .select("vec_id", F.col("b3.cell3").alias("cell3"))
    )


def knn_graph_seed(asg: DataFrame, k: int = KNN_K,
                   budget: int = KNN_SEED_BUDGET,
                   bridges: int = KNN_BRIDGE_R,
                   checkpoint: bool = True,
                   seeds: DataFrame | None = None,
                   probes: int = KNN_SEED_PROBES) -> DataFrame:
    """(query_id, neighbor_id, cosine): O(n·(probes·budget+bridges))
    SEED graph — the scale-safe base the NN-Descent rounds refine
    (VERDICT r09 #1).

    Three structural choices vs ``knn_graph`` kill its top-octave
    blowup (honest re-measure round 10: 117 s at 128 k, ~n^1.5):

    - CHEAP probes: the first probed cell is the node's own assignment
      cell, already computed by the quantizer; the second (round 10 —
      single-probe recall plateaued at 0.52 under NN-Descent because
      the rounds cannot escape intra-cell locality) is one more
      broadcast-argmax pass over the seed relation
      (``ivf_second_cell``) whose aggregation rows carry 24 bytes, not
      embeddings — the q×centroid crossJoin and its n·√n-row window
      shuffle (each row carrying the 64-float embedding — the dominant
      shuffle at 128 k) vanish entirely;
    - PER-NODE CANDIDATE BUDGET: the candidate pool of each cell is
      its first ``budget`` members by vec_id (deterministic, same
      idiom as KNN_CELL_CAP), so every node scores <= ``budget``
      cell pairs and total pair work is linear in n, however the cell
      sizes grow;
    - RANDOM BRIDGES: ``bridges`` extra candidates per node drawn by a
      deterministic LCG over the id domain (the canonical NN-Descent
      random-graph initialization). These are NOT for recall — they
      make the refinement POSSIBLE: a single-probe seed is
      cell-partitioned, its 2-hop closure is still cell-partitioned,
      and NN-Descent measurably cannot improve it AT ALL (measured
      r10: recall 0.1788 -> 0.1788 after 2 rounds at n=500). Bridges
      connect the cell components so neighbor-of-neighbor propagation
      crosses cells; the same measurement with bridges shows the
      rounds recovering recall again.

    The recall the budget gives up inside large cells is recovered by
    the NN-Descent rounds (``knn_graph_budgeted``); the composed
    build's recall is measured by tools/knn_budget_probe.py into
    SCALING.json.

    ``asg`` is localCheckpoint-ed: the query side, the candidate pool,
    and the bridge endpoints all read it, and divergently-pruned
    subtrees never canonicalize equal (pitfall: the n·√n assignment
    crossJoin would run once per subtree). An owner that already
    checkpointed ``asg`` (and manages its lifecycle — see
    ``plans/lifecycle.py``) passes ``checkpoint=False`` so the data is
    not persisted twice."""
    if checkpoint:
        asg = asg.localCheckpoint(eager=False)
    q = asg.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("v_norm").alias("q_norm"),
        "cell",
    )
    wc = W.partitionBy("cell").orderBy("neighbor_id")
    cand = (
        asg.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_emb"),
            F.col("v_norm").alias("c_norm"),
            "cell",
        )
        .withColumn("_crn", F.row_number().over(wc))
        .filter(F.col("_crn") <= budget)
        .drop("_crn")
    )
    cell_pairs = q.join(cand, "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    if probes > 3:
        raise ValueError("knn_graph_seed supports at most 3 probes")
    if probes >= 2:
        if seeds is None:
            raise ValueError(
                "knn_graph_seed(probes>=2) needs the seed relation "
                "(ivf_seeds inline, or the index's stored seeds)"
            )
        c2 = ivf_second_cell(asg, seeds)
        # at probes>=3, c2 has two consumers (probe2's join and
        # ivf_third_cell's exclusion) and the argmax pass runs twice —
        # BY DESIGN, not checkpointed: it is pure codegen compute over
        # the already-checkpointed ``asg`` with a byte-tiny shuffle,
        # and a checkpoint here could not be released before the
        # returned seed graph materializes (the lifecycle convention);
        # the measured 0.908@128k / 630 s number includes this double
        # pass (self-review r11)
        q2 = (
            q.drop("cell")
            .join(c2.withColumnRenamed("vec_id", "query_id"), "query_id")
        )
        probe2_pairs = q2.join(
            cand, q2["cell2"] == cand["cell"]
        ).filter(F.col("neighbor_id") != F.col("query_id"))
    if probes >= 3:
        q3 = (
            q.drop("cell")
            .join(
                ivf_third_cell(asg, seeds, c2).withColumnRenamed(
                    "vec_id", "query_id"
                ),
                "query_id",
            )
        )
        probe3_pairs = q3.join(
            cand, q3["cell3"] == cand["cell"]
        ).filter(F.col("neighbor_id") != F.col("query_id"))
    # bridge candidates: dst_j = ((id % n)·MULT + j·STEP) % n, scored
    # by a shuffle join of the n·bridges (query, dst) pairs to the
    # vector relation — linear, no window, no crossJoin
    n_row = F.broadcast(asg.agg(F.count("*").alias("_n")))
    nb = asg.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("v_norm").alias("c_norm"),
    )
    bridge_pairs = (
        q.drop("cell")
        .crossJoin(n_row)
        .select(
            "query_id", "q_emb", "q_norm",
            F.explode(F.sequence(F.lit(1), F.lit(bridges))).alias("_j"),
            "_n",
        )
        .select(
            "query_id", "q_emb", "q_norm",
            (
                (
                    (F.col("query_id") % F.col("_n")) * _BRIDGE_MULT
                    + F.col("_j") * _BRIDGE_STEP
                )
                % F.col("_n")
            ).alias("neighbor_id"),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(nb, "neighbor_id")
    )
    score = F.round(
        dot_expr("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm")), 6
    ).alias("cosine")
    scored = cell_pairs.select("query_id", "neighbor_id", score)
    if probes >= 2:
        scored = scored.unionByName(
            probe2_pairs.select("query_id", "neighbor_id", score)
        )
    if probes >= 3:
        scored = scored.unionByName(
            probe3_pairs.select("query_id", "neighbor_id", score)
        )
    pairs = (
        scored
        .unionByName(bridge_pairs.select("query_id", "neighbor_id", score))
        # a bridge or second-probe draw can duplicate a cell pair (same
        # query, same neighbor, same cosine) — dedup so it can't occupy
        # two rnk slots in the top-k
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


# DuckDB twin of the seed stage (the NND rounds are non-SQL-
# expressible; the seed is, and gets driver-grade parity in
# tests/test_unregistered_ops.py)
KNN_SEED_ORACLE = IVF_CELLS_CTE + f""",
capped AS (
  SELECT * FROM (
    SELECT cells.*,
           row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS crn
    FROM cells
  ) WHERE crn <= {KNN_SEED_BUDGET}
),
nstats AS (SELECT count(*) AS _n FROM embeddings),
av2 AS (
  SELECT cells.vec_id,
         max({{'c': {_DOT.format(a='cells.embedding', b='seed_emb')}
                    / (cells.v_norm * seed_norm),
              'neg': -seed_id, 'cell2': seed_id}}) AS b2
  FROM cells, seeds
  WHERE seed_id <> cells.cell
  GROUP BY cells.vec_id
),
cells2 AS (
  SELECT vec_id, struct_extract(b2, 'cell2') AS cell2 FROM av2
),
cell_pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_DOT.format(a='q.embedding', b='c.embedding')}
               / (q.v_norm * c.v_norm), 6) AS cosine
  FROM cells q
  JOIN capped c ON c.cell = q.cell AND c.vec_id <> q.vec_id
),
probe2_pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_DOT.format(a='q.embedding', b='c.embedding')}
               / (q.v_norm * c.v_norm), 6) AS cosine
  FROM cells q
  JOIN cells2 q2 ON q2.vec_id = q.vec_id
  JOIN capped c ON c.cell = q2.cell2 AND c.vec_id <> q.vec_id
),
bridge_pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_DOT.format(a='q.embedding', b='c.embedding')}
               / (q.v_norm * c.v_norm), 6) AS cosine
  FROM (
    SELECT vec_id, embedding, v_norm,
           ((vec_id % _n) * {_BRIDGE_MULT} + j * {_BRIDGE_STEP}) % _n
             AS nid
    FROM cells, nstats, range(1, {KNN_BRIDGE_R} + 1) t(j)
  ) q
  JOIN cells c ON c.vec_id = q.nid AND c.vec_id <> q.vec_id
),
pairs AS (
  SELECT query_id, neighbor_id, max(cosine) AS cosine
  FROM (SELECT * FROM cell_pairs UNION ALL
        SELECT * FROM probe2_pairs UNION ALL
        SELECT * FROM bridge_pairs)
  GROUP BY query_id, neighbor_id
)
SELECT query_id, neighbor_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM pairs
) WHERE rnk <= {KNN_K}
"""


def knn_cell_overflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cell, cell_size) for every IVF cell past ``KNN_CELL_CAP`` — the
    no-silent-caps companion to ``knn_graph`` (the
    ``minhash_bucket_overflow`` pattern): a production run reports the
    cells whose candidate side was truncated so dense duplicate
    clusters are visible, not silently absorbed."""
    asg = ivf_assign(load_table(spark, sf_dir, "embeddings"))
    return (
        asg.groupBy("cell")
        .agg(F.count("*").alias("cell_size"))
        .filter(F.col("cell_size") > KNN_CELL_CAP)
    )


KNN_GRAPH_ORACLE = IVF_CELLS_CTE + f""",
q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
),
flat AS (
  SELECT cell,
         unnest(list_transform(range(1, len(embedding)+1),
                               i -> {{'i': i, 'v': embedding[i]}})) AS s
  FROM cells
),
centf AS (
  SELECT cell, s.i AS i,
         CAST(SUM(CAST(CAST(s.v AS DOUBLE) AS DECIMAL(25,12))) AS DOUBLE) / count(*) AS cv
  FROM flat GROUP BY cell, s.i
),
cent AS (
  SELECT cell, list(cv ORDER BY i) AS centroid FROM centf GROUP BY cell
),
probes AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_cos('qe', 'centroid')} DESC, c.cell) AS pr
    FROM q, cent c
  ) WHERE pr <= {NPROBE}
),
capped AS (
  SELECT * FROM (
    SELECT cells.*,
           row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS crn
    FROM cells
  ) WHERE crn <= {KNN_CELL_CAP}
),
pairs AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
         round({_cos('qe', 'e.embedding')}, 6) AS cosine
  FROM probes p
  JOIN q USING (query_id)
  JOIN capped e ON e.cell = p.cell AND e.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM pairs
) WHERE rnk <= {KNN_K}
"""

# Registered in the round-5 rotation (slot funded by q_window_rank):
# the corpus-wide kNN graph is the strongest similarity operator still
# unregistered — capped-cell join, giant-dup-cell guard, DuckDB twin.
SIMILARITY_QUERIES["q_knn_graph"] = q_knn_graph
SIMILARITY_ORACLES["q_knn_graph"] = KNN_GRAPH_ORACLE
