"""PageRank over the kNN graph (Brin & Page 1998; Page et al. 1999).

Centrality over the similarity graph is a standard curation signal:
high-rank nodes are the corpus's representative cores (what a
coreset/prototype selection keeps), low-rank isolates are outliers —
the graph-side complement to B61's centroid-distance outliers. The
operator also completes the engine's iterative-graph battery (CC =
q_dedup_components, refinement = NN-Descent, now the canonical
random-surfer fixpoint).

Spark shape (the engine's iterative-loop discipline):

- the edge relation (src, dst, out-degree) is computed once and
  ``localCheckpoint``-ed — per round ONE shuffle joins ranks to edges
  on src and ONE partial-aggregable groupBy sums contributions per dst;
- dangling mass (nodes with no out-edges — absent from a kNN graph,
  present in general edge sets) redistributes uniformly, the standard
  treatment;
- every per-dst sum is an order-independent ``decimal(25,12)`` fold of
  12-dp-rounded contributions, so the fixpoint is DETERMINISTIC across
  partitionings and repeated runs return bit-identical ranks;
- one scalar (the L1 delta — the stopping signal) crosses to the
  driver per round; plan depth stays O(1) via ``localCheckpoint``.

NON-SQL-EXPRESSIBLE (iterative); direct tests: exact-determinism
across runs, an independent pure-python replay (Decimal arithmetic,
same rounding ladder) at 1e-9, the uniform-graph closed form (every
node rank = 1/n on a symmetric regular graph), and monotone-decreasing
L1 deltas. Reference parity: none (no analytics in the 412-LoC
reference); BASELINE.json north-star tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.lifecycle import local_checkpoint_handle
from ..sources.loader import load_table

PR_DAMPING = 0.85
PR_ITERS = 10
_DEC = "decimal(25,12)"


def pagerank(
    edges: DataFrame,
    damping: float = PR_DAMPING,
    iters: int = PR_ITERS,
) -> tuple[DataFrame, list[float]]:
    """Ranks for the node set of ``edges`` (src, dst). Returns
    ((node, rank), per-round L1 deltas). Ranks are 12-dp-rounded at
    every step — the determinism contract.

    SIMPLE-GRAPH semantics: the edge relation is ``distinct()``-ed
    first, so a duplicated (src, dst) row neither inflates out-degree
    nor contributes twice (ADVICE r09 — the consolidated form had
    silently become multigraph for non-deduped inputs)."""
    edges = edges.select("src", "dst").distinct()
    # checkpoint lifecycle (round 10, plans/lifecycle.py): the loop
    # releases round r-1's rank blocks once round r's delta is read,
    # and the static relations (nodes/edges/dangling) before returning
    # — only the FINAL rank checkpoint outlives the call
    nodes, release_nodes = local_checkpoint_handle(
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct(),
        eager=False,
    )
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    e, release_e = local_checkpoint_handle(
        edges.join(out_deg, "src"), eager=False
    )
    dangling, release_dangling = local_checkpoint_handle(
        nodes.join(
            edges.select(F.col("src").alias("node")).distinct(),
            "node",
            "left_anti",
        ),
        eager=False,
    )

    base = (1.0 - damping) / n
    ranks, release_ranks = local_checkpoint_handle(
        nodes.select("node", F.round(F.lit(1.0 / n), 12).alias("rank"))
    )
    deltas: list[float] = []
    for _ in range(iters):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("rank") / F.col("deg"), 12)
                .cast(_DEC)
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        # the dangling mass rides the plan as a broadcast 1-row
        # aggregate (exact decimal sum -> double) instead of a driver
        # collect — one round-trip per round (the delta scalar), not two
        d_mass = dangling.join(ranks, "node").agg(
            (
                F.coalesce(
                    F.sum(F.col("rank").cast(_DEC)).cast("double"),
                    F.lit(0.0),
                )
                / F.lit(float(n))
            ).alias("d_mass")
        )
        # LAZY checkpoint (r13): the delta collect below is the round's
        # materializing action — the eager form paid a second full job
        # per round just to write the checkpoint first
        new, release_new = local_checkpoint_handle(
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(d_mass))
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(
                            F.col("in_mass").cast("double"), F.lit(0.0)
                        )
                        + F.col("d_mass")
                    ),
                    12,
                ).alias("rank"),
            ),
            eager=False,
        )
        delta = (
            new.join(ranks.withColumnRenamed("rank", "old"), "node")
            .agg(
                F.sum(
                    F.abs(F.col("rank") - F.col("old")).cast(_DEC)
                ).alias("d")
            )
            .collect()[0]["d"]
        )
        deltas.append(float(delta))
        # the delta was the last reader of the previous round's ranks
        release_ranks()
        ranks, release_ranks = new, release_new
    release_nodes()
    release_e()
    release_dangling()
    return ranks, deltas


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, rank, rnk): PageRank over the directed kNN graph
    (query -> neighbor edges from B72's IVF multi-probe graph), dense
    rank by (rank DESC, node). (Unregistered, NON-SQL-EXPRESSIBLE —
    iterative; direct tests: determinism, python-Decimal replay,
    regular-graph closed form, shrinking deltas.)

    Re-pointed (VERDICT r09 #1) at the scale-safe budgeted kNN build
    — same edges semantics (directed query -> neighbor top-k), a base
    graph that survives 100 TB."""
    from .nndescent import knn_graph_budgeted
    from .similarity import ivf_assign

    e = load_table(spark, sf_dir, "embeddings")
    g = knn_graph_budgeted(e, ivf_assign(e))
    edges = g.select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    ranks, _ = pagerank(edges)
    # a full-order rank over n nodes would single-partition sort at
    # scale; the audit surfaces the TOP 100 central nodes only
    # (orderBy+limit = TakeOrderedAndProject; the rank window then
    # orders exactly 100 rows)
    top = ranks.orderBy(F.col("rank").desc(), F.col("node")).limit(100)
    w = W.orderBy(F.col("rank").desc(), F.col("node"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


UNREGISTERED_PAGERANK_QUERIES = {"q_pagerank": q_pagerank}
UNREGISTERED_PAGERANK_ORACLES: dict = {}


def q_pagerank_from_index(
    spark: SparkSession, sf_dir: str, index_path: str
) -> DataFrame:
    """The centrality audit in its PRODUCTION shape: the kNN edges come
    from the persisted ANN index's STORED edge artifact
    (``ann_index.read_knn_edges`` — VERDICT r10 #1: no quantizer
    training, no seed probes, no NN-Descent rounds in the query path;
    only the rank loop itself runs). Because the stored edges are
    pinned result-identical to the inline build at n <= ``shardknn.
    SHARD_TARGET`` and ``pagerank`` is bit-deterministic, the ranks
    are pinned IDENTICAL to ``q_pagerank`` there (direct test; past
    the target the stored edges are the sharded build's — see
    ``ann_index.q_knn_graph_budgeted_from_index``)."""
    from .ann_index import q_knn_graph_budgeted_from_index

    g = q_knn_graph_budgeted_from_index(spark, sf_dir, index_path)
    edges = g.select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    ranks, _ = pagerank(edges)
    top = ranks.orderBy(F.col("rank").desc(), F.col("node")).limit(100)
    w = W.orderBy(F.col("rank").desc(), F.col("node"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))
