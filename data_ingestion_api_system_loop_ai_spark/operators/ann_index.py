"""Persisted ANN index: build/probe split (VERDICT r03 #5).

``q_similarity_ivf`` / ``q_similarity_pq`` retrain their quantizer and
codebooks INSIDE every query execution — the right shape for an
oracle-checked correctness query, and exactly the wrong shape at
100 TB, where centroids, cell assignments, PQ codebooks, and codes are
build-once artifacts (the FAISS index file, in lakehouse form). This
module materializes them once and gives queries a probe-from-index
path whose results are pinned identical to the inline forms:

    <index_path>/
      seeds/         (seed_id, seed_emb, seed_norm)     ~sqrt(n) rows
      centroids/     (cell, centroid)                   ~sqrt(n) rows
      assignments/   (vec_id, embedding, v_norm, cell)  n rows, clustered by cell
      pq_codebooks/  (m, c, cw)                         M*K rows
      pq_codes/      (vec_id, code array<long>[M])      n rows, ~4 B/vec payload
      edges/         (query_id, neighbor_id, cosine)    n*k rows — the FINISHED
                     budgeted kNN graph (VERDICT r10 #1)
      _COMMITTED     marker (temp + atomic rename, written last)

- ``build_ann_index``: one pass deriving all six relations with the
  exact expressions of the inline queries (``ivf_seeds``/``ivf_assign``/
  ``ivf_centroids``; ``pq_codebooks``/``pq_codes_array``; the budgeted
  graph build for ``edges``), so every from-index probe reproduces the
  inline results bit-for-bit.
- ``q_similarity_ivf_from_index`` / ``q_similarity_pq_from_index``:
  query-only paths — broadcast the tiny trained relations, scan the
  stored assignments/codes; zero training cost per query.
- ``append_ann_index``: new vectors assign to the FROZEN quantizer
  (nearest existing seed — the FAISS ``add``-to-trained-index
  contract; centroids/codebooks are deliberately NOT retrained, and
  cell geometry drifts only as far as the quantizer's training sample
  allows, the standard IVF staleness trade) and their rows land as ONE
  committed unit across BOTH tables. Periodic re-train is a rebuild.

Crash safety (VERDICT r04 #1): r4's append did two blind
``mode("append")`` writes — a crash between them left vectors with IVF
assignments but no PQ codes, and the probe forms silently disagreed
(kNN/clusters saw the vector, PQ search didn't). Appends now use the
unit-marker protocol shared with the dedup fingerprint index
(``sources/commit_protocol.py``): each append writes
``assignments/unit=<u>/`` and ``pq_codes/unit=<u>/`` (idempotent
overwrite of the unit directory, so a replay heals a torn unit), then
one atomic marker rename under ``_commits/<u>`` publishes BOTH row
sets together; readers resolve committed units only. The build itself
is unit ``u000000`` plus the ``_COMMITTED`` build marker (written
last) that guards the frozen quantizer relations.

``compact_ann_index`` (VERDICT r04 #6) folds accumulated append units
into one consolidated ``c``-unit whose marker's ``supersedes=`` set
retires the sources in the same rename — probe results are pinned
identical before/after, and lazy restartable cleanup removes
superseded directories.

The kNN-graph EDGES are a build artifact too (VERDICT r10 #1): r10's
index stored seeds+assignments only, so every from-index graph
consumer (``q_pagerank_from_index``, ``q_embedding_clusters_from_
index``, the budgeted-graph probe) re-ran the budgeted seed + the
NN-Descent rounds PER QUERY — the bench said it plainly (the two
``_index`` rows paid ~the full build). The graph is built once at
100 TB and consumed many times; ``build_ann_index`` now runs the
budgeted build once and persists the finished edge list under the
same marker, and the from-index graph consumers read STORED edges —
zero seed/NND work in the query path. ``read_knn_edges`` re-derives
the per-query top-k over the committed units (max-cosine merge, the
same rounding/tiebreaks as the build), so append units can only
IMPROVE a query's neighbor list, never corrupt it. Appends get
seed-quality edges from a frozen-quantizer budgeted probe (new x
capped-cell-pool, both orientations — no NND rounds per batch);
recall on appended nodes drifts toward seed quality, and the rebuild
trigger is the same as the quantizer's: re-train/rebuild when
appended vectors exceed a fraction of the build (the FAISS contract
documented on ``append_ann_index``).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import commit_protocol
from ..sources.loader import load_table
from .similarity import (
    ivf_assign,
    ivf_centroids,
    ivf_probe,
    ivf_seeds,
    norm_expr,
    pq_codebooks,
    pq_encode,
    pq_subvectors,
)

_MARKER = commit_protocol.BUILD_MARKER
_UNIT_TABLES = ("assignments", "pq_codes", "edges")


def _require(index_path: str) -> None:
    commit_protocol.require_marker(
        index_path, what="ANN index", builder="build_ann_index"
    )


def _read_units(
    spark: SparkSession,
    index_path: str,
    table: str,
    exclude_unit: str | None = None,
) -> DataFrame:
    """A unit table (``assignments`` / ``pq_codes`` / ``edges``) over
    the COMMITTED units only — uncommitted (torn) unit directories are
    invisible. The build guarantees at least unit ``u000000`` exists,
    so the read list is never empty. ``exclude_unit`` drops one unit
    from the view — the replay path's own already-published rows (the
    ``ingest_url_batch`` discipline)."""
    units = [
        u
        for u in commit_protocol.committed_units(index_path)
        if u != exclude_unit
    ]
    root = os.path.join(index_path, table)
    return spark.read.parquet(*[os.path.join(root, f"unit={u}") for u in units])


_CONFIG_FILE = "build_config.json"


def write_build_config(index_path: str, cfg: dict) -> None:
    """Persist the knobs that produced the stored edges (ADVICE r11
    #2: without this, appends capped candidates at a fixed constant
    regardless of how the index was built, and a rebuild had no record
    of the stored graph's config). Written BEFORE the build marker —
    temp + atomic rename, the marker discipline — so a committed index
    always carries its config."""
    import json

    tmp = os.path.join(index_path, f"_{_CONFIG_FILE}.tmp")
    with open(tmp, "w") as f:
        json.dump(cfg, f, indent=1)
    os.replace(tmp, os.path.join(index_path, _CONFIG_FILE))


def read_build_config(index_path: str) -> dict:
    """The build config persisted by ``build_ann_index``. An index
    from before the config file existed reads as the fixed defaults
    that built it (inline mode, KNN_SEED_BUDGET, KNN_SEED_PROBES)."""
    import json

    from .similarity import KNN_SEED_BUDGET, KNN_SEED_PROBES

    try:
        with open(os.path.join(index_path, _CONFIG_FILE)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {
            "mode": "inline",
            "budget": KNN_SEED_BUDGET,
            "probes": KNN_SEED_PROBES,
            "shards": 1,
        }


def build_ann_index(spark: SparkSession, sf_dir: str, index_path: str) -> None:
    """Train and persist the full ANN index for the ``embeddings``
    table: IVF (seeds, exact centroids, cell assignments clustered by
    cell — the inverted lists) and PQ (codebooks, 4-bit code arrays).
    Storage trade, documented: ``assignments`` carries the raw vectors
    (FAISS inverted lists do the same) so probes never join back to the
    source table; ``pq_codes`` is the 128x-compressed scan relation."""
    e = load_table(spark, sf_dir, "embeddings")
    unit = "u000000"
    seeds = ivf_seeds(e)
    seeds.write.mode("overwrite").parquet(os.path.join(index_path, "seeds"))
    seeds_back = spark.read.parquet(os.path.join(index_path, "seeds"))
    asg = ivf_assign(e, seeds=seeds_back)
    # repartition(cell) inside ivf_assign clusters the write by cell,
    # so a probed cell touches few files (the inverted-list layout)
    asg_dir = os.path.join(index_path, "assignments", f"unit={unit}")
    asg.write.mode("overwrite").parquet(asg_dir)
    asg_back = spark.read.parquet(asg_dir)
    ivf_centroids(asg_back).write.mode("overwrite").parquet(
        os.path.join(index_path, "centroids")
    )
    subs = pq_subvectors(e)
    cb = pq_codebooks(e, subs)
    cb.write.mode("overwrite").parquet(os.path.join(index_path, "pq_codebooks"))
    cb_back = spark.read.parquet(os.path.join(index_path, "pq_codebooks"))
    _code_rows(e, subs, cb_back).write.mode("overwrite").parquet(
        os.path.join(index_path, "pq_codes", f"unit={unit}")
    )
    # the finished kNN graph (VERDICT r10 #1): the build runs ONCE
    # here, over the written-back relations, and from-index graph
    # consumers never pay seed/NND work again. At n <= SHARD_TARGET
    # this is the inline knn_graph_budgeted with its defaults — the
    # stored edges stay pinned bit-equal to the inline
    # q_knn_graph_budgeted at every fixture/test size. Past the
    # target the SHARD-PARALLEL build takes over (VERDICT r11 #1:
    # the flat iso-recall rule costs ~n^1.7 — seed_params_for's
    # escalating knobs are retired in favor of per-shard builds at
    # the proven 32 k config + global-cell stitch, constant knobs,
    # measured in SCALING.json knn_graph_sharded_recall), so the
    # inline-parity claim is SCOPED to n <= SHARD_TARGET (ADVICE r11
    # #1) and the config that produced the stored edges is persisted
    # for appends and rebuilds to read (ADVICE r11 #2).
    from .shardknn import SHARD_TARGET, knn_graph_sharded, n_shards_for

    n = asg_back.count()
    knn_graph_sharded(e, gasg=asg_back, seeds=seeds_back, n=n).select(
        "query_id", "neighbor_id", "cosine"
    ).write.mode("overwrite").parquet(
        os.path.join(index_path, "edges", f"unit={unit}")
    )
    from .similarity import KNN_SEED_BUDGET, KNN_SEED_PROBES

    S = n_shards_for(n)
    write_build_config(
        index_path,
        {
            "n": n,
            "mode": "inline" if S == 1 else "sharded",
            "budget": KNN_SEED_BUDGET,
            "probes": KNN_SEED_PROBES,
            "shards": S,
            "shard_target": SHARD_TARGET,
        },
    )
    # marker order: unit first (all row sets written), then the build
    # marker that unlocks the probes — a crash anywhere above leaves
    # the whole index unreadable, never half-built
    commit_protocol.commit_unit(index_path, unit)
    commit_protocol.write_marker(index_path)


def _code_rows(
    e: DataFrame, subs: DataFrame | None, cb: DataFrame
) -> DataFrame:
    """(vec_id, code array<long>[M]) — the stored PQ code rows; shared
    by the build and the append so both encode identically."""
    return (
        pq_encode(e, subs, cb)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "code"))),
                lambda s: s["code"],
            ).alias("code")
        )
    )


def q_similarity_ivf_from_index(
    spark: SparkSession, sf_dir: str, index_path: str
) -> DataFrame:
    """``q_similarity_ivf`` with the training removed from the query
    path: centroids and assignments come from the persisted index, the
    probe logic is the SAME code (``ivf_probe``), so results are
    pinned identical while per-query cost drops to the probe itself."""
    _require(index_path)
    e = load_table(spark, sf_dir, "embeddings")
    cent = spark.read.parquet(os.path.join(index_path, "centroids"))
    asg = _read_units(spark, index_path, "assignments")
    return ivf_probe(e, cent, asg)


def q_similarity_pq_from_index(
    spark: SparkSession, sf_dir: str, index_path: str
) -> DataFrame:
    """``q_similarity_pq`` probing the persisted codebooks/codes: each
    query builds its exact M x K ADC distance table against the STORED
    codebooks (broadcast), scans the STORED code arrays (exploded back
    to (vec_id, m, code) rows — a pure projection), shortlists by the
    decimal-exact ADC sum, and re-ranks the shortlist with exact
    cosines against the source vectors (the refine step reads raw
    embeddings only for R*nq candidate ids)."""
    from pyspark.sql import Window as W

    from .similarity import (
        PQ_SHORTLIST,
        PQ_TOPK,
        _l2_expr,
        dot_expr,
    )

    _require(index_path)
    e = load_table(spark, sf_dir, "embeddings")
    cb = spark.read.parquet(os.path.join(index_path, "pq_codebooks"))
    codes = (
        _read_units(spark, index_path, "pq_codes")
        .select("vec_id", F.posexplode("code").alias("m", "code"))
        .select("vec_id", F.col("m").cast("long").alias("m"), "code")
    )
    dtable = (
        pq_subvectors(e.filter(F.col("vec_id") % 100 == 0))
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


def append_ann_index(
    spark: SparkSession,
    new_vecs: DataFrame,
    index_path: str,
    unit: str | None = None,
) -> str:
    """Add vectors to a built index WITHOUT retraining: assign each to
    its nearest existing seed (the same max-cosine rule as the build,
    via ``ivf_assign(new, seeds=stored)``) and encode with the stored
    codebooks. Centroids/codebooks stay frozen — the FAISS add
    contract; drift is bounded by the quantizer's training sample and a
    periodic rebuild re-trains.

    The EDGES table gets an append unit too (VERDICT r10 #1): a
    frozen-quantizer budgeted probe scores each new vector against its
    cell's capped candidate pool (committed assignments capped at the
    BUILD'S OWN stored budget per cell — ``read_build_config``, ADVICE
    r11 #2: the cap follows whatever knobs produced the stored edges,
    not a fixed constant — plus this batch, ALWAYS in full, so a hot
    cell can never evict the batch's own members and in-batch
    duplicate pairs stay visible) and the scored pairs land in BOTH
    orientations, so new nodes get seed-quality neighbor lists and
    existing queries gain candidates toward the new nodes (the
    read-time max-merge top-k in ``read_knn_edges`` folds them in).
    No NN-Descent runs per batch — appended-node recall is
    seed-quality until the periodic rebuild, the same staleness trade
    as the frozen quantizer itself (re-train/rebuild is the refresh).

    TRANSACTIONAL (VERDICT r04 #1): all three row sets land under the
    same unit label and become visible only when the unit's marker
    commits AFTER the writes — a crash between any pair leaves a torn
    unit no probe resolves (kNN/clusters, PQ search, and graph readers
    can never disagree about membership). Each write overwrites its
    own unit directory, so replaying the append (same ``unit``, as a
    streaming maintainer would derive from its batch id) heals the
    torn unit and commits. Returns the committed unit label."""
    from ..plans.lifecycle import local_checkpoint_handle

    _require(index_path)
    label = unit or commit_protocol.next_unit_label(index_path)
    seeds = spark.read.parquet(os.path.join(index_path, "seeds"))
    # the batch's assignment relation feeds three consumers (its own
    # unit write, the candidate pool, the edge query side) — pin it
    # once, release before returning (plans/lifecycle discipline)
    new_asg, release_asg = local_checkpoint_handle(
        ivf_assign(new_vecs, seeds=seeds), eager=False
    )
    # every durable effect below runs under try/finally (ADVICE r11
    # #3): a failed write or commit must not leak the checkpointed
    # batch assignments for the session lifetime
    try:
        _append_units(spark, new_asg, index_path, label)
    finally:
        release_asg()
    return label


def _append_units(
    spark: SparkSession, new_asg: DataFrame, index_path: str, label: str
) -> None:
    """The three unit writes + commit of ``append_ann_index`` (split
    out so the caller can release the batch checkpoint in a finally)."""
    from .similarity import dot_expr

    new_vecs = new_asg.select("vec_id", "embedding")
    new_asg.write.mode("overwrite").parquet(
        os.path.join(index_path, "assignments", f"unit={label}")
    )
    cb = spark.read.parquet(os.path.join(index_path, "pq_codebooks"))
    subs = pq_subvectors(new_vecs)
    _code_rows(new_vecs, subs, cb).write.mode("overwrite").parquet(
        os.path.join(index_path, "pq_codes", f"unit={label}")
    )
    # seed-quality candidate edges: pool = committed assignments capped
    # per cell at the build's stored budget ∪ this batch IN FULL.
    # Three O(batch) disciplines: the history side is SEMI-JOINED to
    # the batch's own cells BEFORE the cap window (the per-cell ranking
    # is independent per cell, so restricting to the batch's cells
    # cannot change what the join keeps — without it every append
    # re-shuffles the whole embedding history); the unit's OWN label is
    # excluded from the history view so a replay of an already-
    # committed append rewrites the edges unit with the IDENTICAL
    # pre-crash content (a no-op exclusion for the torn-unit case,
    # exact idempotence for the post-marker case); and history and
    # batch are capped SEPARATELY (VERDICT r11 observation #1: the old
    # single window over the union let a hot cell's low-id history
    # evict the batch's own members, hiding in-batch duplicate pairs —
    # now the batch always competes, at the same O(batch·budget) cost).
    from pyspark.sql import Window as W

    budget = read_build_config(index_path)["budget"]
    batch_cells = new_asg.select("cell").distinct()
    hist = (
        _read_units(spark, index_path, "assignments", exclude_unit=label)
        .join(F.broadcast(batch_cells), "cell", "left_semi")
    )
    wc = W.partitionBy("cell").orderBy("neighbor_id")
    hist_capped = (
        hist.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_emb"),
            F.col("v_norm").alias("c_norm"),
            "cell",
        )
        .withColumn("_crn", F.row_number().over(wc))
        .filter(F.col("_crn") <= budget)
        .drop("_crn")
    )
    cand = hist_capped.unionByName(
        new_asg.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_emb"),
            F.col("v_norm").alias("c_norm"),
            "cell",
        )
    )
    q = new_asg.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("v_norm").alias("q_norm"),
        "cell",
    )
    scored = (
        q.join(cand, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm")),
                6,
            ).alias("cosine"),
        )
    )
    # cosine is symmetric: the same scored rows serve both orientations
    # (new node's own list, and existing queries gaining the new node)
    scored.unionByName(
        scored.select(
            F.col("neighbor_id").alias("query_id"),
            F.col("query_id").alias("neighbor_id"),
            "cosine",
        )
    ).groupBy("query_id", "neighbor_id").agg(
        F.max("cosine").alias("cosine")
    ).write.mode("overwrite").parquet(
        os.path.join(index_path, "edges", f"unit={label}")
    )
    commit_protocol.commit_unit(index_path, label)


def compact_ann_index(spark: SparkSession, index_path: str) -> dict:
    """Fold every committed unit of ``assignments``/``pq_codes`` into
    one consolidated ``c``-unit (VERDICT r04 #6): frozen-quantizer
    appends accumulate one parquet directory per append, and the probe
    scans degrade as small files pile up. The consolidated unit is
    re-clustered by cell (the inverted-list layout the build produces)
    and its marker's ``supersedes=`` set retires the source units in
    the SAME atomic rename — no reader instant observes duplicates or
    loss. Cleanup of superseded directories is lazy and restartable
    (the dedup-index compaction contract: leftover markers keep
    shadowing until a later compaction retries the deletes).
    Single-maintainer assumption, as for ``compact_dedup_index``.

    Returns {"unit", "compacted_units", "files_before", "files_after"}.
    """
    from ..sources.maintenance import parquet_files

    _require(index_path)
    units = commit_protocol.committed_units(index_path)
    roots = [os.path.join(index_path, t) for t in _UNIT_TABLES]
    files_before = sum(len(parquet_files(r)) for r in roots)
    if len(units) <= 1:
        return {
            "unit": units[0] if units else None,
            "compacted_units": 0,
            "files_before": files_before,
            "files_after": files_before,
        }
    from ..sources.maintenance import _dataset_bytes

    label = commit_protocol.next_unit_label(index_path, prefix="c")

    def _n_files(table: str, target_file_bytes: int = 128 * 1024 * 1024) -> int:
        total = sum(
            _dataset_bytes(os.path.join(index_path, table, f"unit={u}"))
            for u in units
        )
        return max(1, -(-total // target_file_bytes))

    # cluster the consolidated assignments by cell so a probed cell
    # touches few files — the same layout contract as the build
    _read_units(spark, index_path, "assignments").repartition(
        F.col("cell")
    ).write.mode("overwrite").parquet(
        os.path.join(index_path, "assignments", f"unit={label}")
    )
    _read_units(spark, index_path, "pq_codes").coalesce(
        _n_files("pq_codes")
    ).write.mode("overwrite").parquet(
        os.path.join(index_path, "pq_codes", f"unit={label}")
    )
    # edges: materialize the read-time invariant (max-cosine merge +
    # per-query top-k) so the consolidated unit IS what readers derive
    # — read_knn_edges before/after compaction is pinned identical,
    # and append candidates that lost the top-k are garbage-collected
    read_knn_edges(spark, index_path).select(
        "query_id", "neighbor_id", "cosine"
    ).repartition(_n_files("edges")).write.mode("overwrite").parquet(
        os.path.join(index_path, "edges", f"unit={label}")
    )
    commit_protocol.commit_unit(index_path, label, supersedes=units)

    # lazy, restartable cleanup — also sweeps leftovers from any prior
    # crashed cleanup (every currently-superseded unit, not just ours)
    _names, all_superseded = commit_protocol.marker_state(index_path)
    for u in sorted(all_superseded):
        for t in _UNIT_TABLES:
            shutil.rmtree(
                os.path.join(index_path, t, f"unit={u}"), ignore_errors=True
            )
        try:
            os.remove(
                os.path.join(index_path, commit_protocol.COMMITS_DIR, u)
            )
        except FileNotFoundError:
            pass
    files_after = sum(len(parquet_files(r)) for r in roots)
    return {
        "unit": label,
        "compacted_units": len(units),
        "files_before": files_before,
        "files_after": files_after,
    }


def q_knn_graph_from_index(
    spark: SparkSession, sf_dir: str, index_path: str
) -> DataFrame:
    """Corpus-wide kNN graph probing the persisted index (the
    production graph-build: quantizer frozen, assignments read from the
    inverted lists) — pinned result-identical to the inline
    ``similarity.q_knn_graph``."""
    from .similarity import knn_graph

    _require(index_path)
    e = load_table(spark, sf_dir, "embeddings")
    cent = spark.read.parquet(os.path.join(index_path, "centroids"))
    asg = _read_units(spark, index_path, "assignments")
    return knn_graph(e, cent, asg)


def read_knn_edges(spark: SparkSession, index_path: str) -> DataFrame:
    """(query_id, neighbor_id, cosine, rnk): the persisted budgeted kNN
    graph over COMMITTED edge units (VERDICT r10 #1). The per-query
    top-k is RE-DERIVED on read — max-cosine merge across units, then
    the same (cosine DESC, neighbor_id) window the build uses — so:

    - a single-unit index (the common post-build state) reproduces the
      stored graph bit-for-bit (top-k of a top-k is itself);
    - append units, which carry seed-quality candidate edges for new
      nodes AND candidate rows pointing existing queries at the new
      nodes, can only IMPROVE a query's neighbor list under the merge.

    Cost shape: one scan of n·k-ish rows + one k-bounded window — the
    near-read-cost query path the from-index forms promise; the seed
    probes and NN-Descent rounds never run here."""
    from pyspark.sql import Window as W

    from .similarity import KNN_K

    _require(index_path)
    merged = (
        _read_units(spark, index_path, "edges")
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    return (
        merged.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= KNN_K)
    )


def q_knn_graph_budgeted_from_index(
    spark: SparkSession, sf_dir: str, index_path: str
) -> DataFrame:
    """The scale-safe corpus graph in its PRODUCTION shape: the
    FINISHED edge list comes from the persisted index (built once by
    ``build_ann_index``) — zero quantizer training, zero seed probes,
    zero NN-Descent rounds in the query path (VERDICT r10 #1; the r10
    form re-ran the whole budgeted build per query and the two
    ``_index`` bench rows paid ~the full build for it). At
    n <= ``shardknn.SHARD_TARGET`` the stored edges are written by
    the same deterministic build expressions as the inline form, so
    the result is pinned IDENTICAL to
    ``nndescent.q_knn_graph_budgeted`` there (direct test + a plan
    assert that the query path never touches the embeddings table);
    past the target the stored edges come from the SHARD-PARALLEL
    build (ADVICE r11 #1: the parity claim is scoped, not silent —
    ``read_build_config`` records which build and which knobs
    produced them, and the sharded build's recall is measured in
    SCALING.json ``knn_graph_sharded_recall``)."""
    del sf_dir  # the graph is fully materialized in the index
    return read_knn_edges(spark, index_path)


def q_embedding_clusters_from_index(
    spark: SparkSession, sf_dir: str, index_path: str
) -> DataFrame:
    """Semantic clusters probing the persisted ANN index: the kNN
    edges come from the STORED edge artifact (zero training, zero
    seed/NND work in the query path — VERDICT r10 #1), the component
    loop is unchanged — pinned result-identical to the inline
    ``components.q_embedding_clusters`` at n <= ``shardknn.
    SHARD_TARGET`` (both sides on the budgeted build, VERDICT r09 #1;
    past the target the stored edges are the sharded build's — see
    ``q_knn_graph_budgeted_from_index``)."""
    from .components import EMB_EDGE_TAU, connected_components

    _require(index_path)
    from pyspark.sql import functions as F

    strong = q_knn_graph_budgeted_from_index(spark, sf_dir, index_path).filter(
        F.col("cosine") >= EMB_EDGE_TAU
    )
    cc = connected_components(strong, a_col="query_id", b_col="neighbor_id")
    sizes = cc.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return cc.join(F.broadcast(sizes), "component").select(
        F.col("node").alias("vec_id"),
        F.col("component").cast("long").alias("component"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


# ---------------------------------------------------------------------
# Day-2 SEMANTIC dedup: the embedding-space twin of
# ``operators/incremental_dedup.py`` (exact/minhash text) and
# ``operators/urls.py`` (canonical URLs) — a new embedding batch
# arrives every trigger; which vectors does the 100 TB of history
# already contain semantically, WITHOUT rescanning history? The probe
# rides the persisted ANN index: assign each new vector to its
# frozen-quantizer cell and compare against that cell's stored members
# only — O(|batch| · cell), never O(history) — and the ingest cycle
# appends the KEPT vectors through ``append_ann_index``'s existing
# unit transaction, so the dedup history, the PQ codes, and the kNN
# edges all advance in the SAME committed unit.

EMB_DUP_TAU = 0.95  # the semantic-duplicate bar (SemDeDup-class)


def incremental_embedding_dedup(
    spark: SparkSession,
    new_vecs: DataFrame,
    index_path: str,
    tau: float = EMB_DUP_TAU,
    exclude_unit: str | None = None,
) -> DataFrame:
    """(vec_id, status, matched_id, cosine): classify each new vector
    against the index AND the earlier members of its own batch —
    ``near_dup`` if the best candidate cosine >= ``tau`` (matched_id =
    that candidate, best cosine first, ties to the smallest id), else
    ``kept``.

    Probe shape: one frozen-quantizer assignment pass over the batch
    (broadcast seeds), candidates = committed assignments semi-joined
    to the BATCH'S OWN CELLS only and capped per cell (the
    ``KNN_CELL_CAP`` dup-hub guard: a million-copy cluster cannot go
    quadratic), one equi-join on the cell id. In-batch first-wins: a
    batch member counts as a candidate only for LARGER vec_ids, so
    replaying the batch is order-stable. Cosines are rounded like
    every similarity operator (6 dp), so the tau comparison is
    deterministic across partitionings."""
    from pyspark.sql import Window as W

    from .similarity import KNN_CELL_CAP, dot_expr

    _require(index_path)
    seeds = spark.read.parquet(os.path.join(index_path, "seeds"))
    # NO checkpoint here (self-review r11): the returned verdicts
    # relation must outlive this call, so a localCheckpoint could
    # never be released (the lifecycle convention) — and recomputing
    # the batch's |batch| x sqrt(n) assignment pass per consumer is
    # cheap at batch scale, unlike the corpus-sized passes the
    # checkpointed operators pin
    q = ivf_assign(new_vecs, seeds=seeds).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("v_norm").alias("q_norm"),
        "cell",
    )
    cells = q.select("cell").distinct()
    hist = (
        _read_units(spark, index_path, "assignments", exclude_unit=exclude_unit)
        .join(F.broadcast(cells), "cell", "left_semi")
        .select("vec_id", "embedding", "v_norm", "cell", F.lit(True).alias("_hist"))
    )
    batch_cand = q.select(
        F.col("query_id").alias("vec_id"),
        F.col("q_emb").alias("embedding"),
        F.col("q_norm").alias("v_norm"),
        "cell",
        F.lit(False).alias("_hist"),
    )
    # history and batch capped SEPARATELY (VERDICT r11 observation #1):
    # the old single window over the union let a hot cell holding
    # >= KNN_CELL_CAP low-id history members evict the batch's own
    # vectors from the pool, so in-batch duplicate pairs in that cell
    # went undetected. History keeps the hub-guard cap; the batch is
    # ALWAYS in — same O(batch·cell) cost, guaranteed in-batch
    # visibility (pinned by test: a cell pre-loaded past the cap with
    # low-id history must still classify the second of two identical
    # batch vectors as near_dup).
    wc = W.partitionBy("cell").orderBy("vec_id")
    pool = (
        hist.withColumn("_crn", F.row_number().over(wc))
        .filter(F.col("_crn") <= KNN_CELL_CAP)
        .drop("_crn")
        .unionByName(batch_cand)
    )
    cand = pool.select(
        "cell",
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        F.col("v_norm").alias("c_norm"),
        "_hist",
    )
    best = (
        q.join(cand, "cell")
        # history always competes; batch members only against later ids
        .filter(F.col("_hist") | (F.col("cand_id") < F.col("query_id")))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            F.struct(
                F.round(
                    dot_expr("q_emb", "c_emb")
                    / (F.col("q_norm") * F.col("c_norm")),
                    6,
                ).alias("cosine"),
                (-F.col("cand_id")).alias("neg"),
                F.col("cand_id").alias("cand_id"),
            ).alias("s"),
        )
        .groupBy("query_id")
        .agg(F.max("s").alias("b"))
        .select(
            "query_id",
            F.col("b.cosine").alias("best_cos"),
            F.col("b.cand_id").alias("best_id"),
        )
    )
    joined = q.select("query_id").join(best, "query_id", "left")
    is_dup = F.col("best_cos") >= tau
    return joined.select(
        F.col("query_id").alias("vec_id"),
        F.when(is_dup, F.lit("near_dup")).otherwise(F.lit("kept"))
        .alias("status"),
        F.when(is_dup, F.col("best_id")).alias("matched_id"),
        F.when(is_dup, F.col("best_cos")).alias("cosine"),
    )


def ingest_embedding_batch(
    spark: SparkSession,
    new_vecs: DataFrame,
    index_path: str,
    tau: float = EMB_DUP_TAU,
    unit: str | None = None,
) -> DataFrame:
    """The day-2 semantic-dedup cycle for one batch: classify against
    the index, then append the KEPT vectors through
    ``append_ann_index`` — assignments, PQ codes, and kNN edges all
    advance under ONE committed unit, so every probe form (dedup,
    similarity search, graph consumers) sees the batch atomically.

    Replay discipline (the ``ingest_url_batch`` contract): verdicts
    are ALWAYS computed with this batch's own unit excluded from the
    view — a no-op before publish, and after a crash-past-the-marker
    replay it hides exactly the batch's own rows, so the returned
    relation is stable at any crash point. An ever-published label
    skips the append; a label a compaction already superseded RAISES
    (its rows live in the c-unit where the exclusion cannot hide them
    — do not compact with in-flight batches). Returns the
    classification relation."""
    label = unit or commit_protocol.next_unit_label(index_path)
    _names0, superseded0 = commit_protocol.marker_state(index_path)
    if label in superseded0:
        raise RuntimeError(
            f"ingest_embedding_batch: unit {label!r} was compacted away; "
            "a compaction ran while this batch was unacknowledged — "
            "re-classify under a FRESH unit label instead of replaying."
        )
    verdicts = incremental_embedding_dedup(
        spark, new_vecs, index_path, tau=tau, exclude_unit=label
    )
    names, _superseded = commit_protocol.marker_state(index_path)
    if label in names:
        return verdicts  # effects already fully published
    kept = new_vecs.join(
        verdicts.filter(F.col("status") == "kept").select(
            F.col("vec_id")
        ),
        "vec_id",
        "left_semi",
    )
    append_ann_index(spark, kept, index_path, unit=label)
    return verdicts
