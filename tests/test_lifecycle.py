"""Checkpoint lifecycle (round 10, ``plans/lifecycle.py``).

``localCheckpoint`` blocks outlive the query unless their owner
releases them; a long session (the 118-query bench, the multi-size
scaling probe) otherwise accumulates dead blocks from finished rounds
until they squeeze execution memory. These tests pin the contract for
every iterative loop: intermediates are RELEASED, the blocks the
returned DataFrame reads are KEPT (and readable — an unpersisted
localCheckpoint cannot be recomputed, so over-releasing would raise,
not degrade).
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_api_system_loop_ai_spark.plans.lifecycle import (
    local_checkpoint_handle,
)


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_handle_releases_exactly_its_own_blocks(spark):
    base = _persistent_rdd_count(spark)
    df1, release1 = local_checkpoint_handle(spark.range(100))
    df2, release2 = local_checkpoint_handle(spark.range(200))
    assert _persistent_rdd_count(spark) == base + 2
    release1()
    release1()  # idempotent
    assert _persistent_rdd_count(spark) == base + 1
    assert df2.count() == 200  # the other checkpoint is untouched
    release2()
    assert _persistent_rdd_count(spark) == base


def test_lazy_handle_tracks_blocks_too(spark):
    base = _persistent_rdd_count(spark)
    df, release = local_checkpoint_handle(spark.range(50), eager=False)
    assert df.count() == 50  # materialize
    assert _persistent_rdd_count(spark) > base
    release()
    assert _persistent_rdd_count(spark) == base


@pytest.mark.parametrize("loop", ["nn_descent", "pagerank", "kmeans", "cc"])
def test_iterative_loops_release_intermediates(spark, sf_dir, loop):
    """Each loop leaves at most the checkpoints its RETURN VALUE reads
    (nn_descent/kmeans/pagerank: the final round; CC: final labels) —
    never one block per round — and the returned data is readable
    afterward (nothing the result needs was released)."""
    base = _persistent_rdd_count(spark)
    if loop == "nn_descent":
        from data_ingestion_api_system_loop_ai_spark.operators.nndescent import (
            q_knn_graph_budgeted,
        )

        out = q_knn_graph_budgeted(spark, sf_dir)
        keep = 1  # the final refined graph
    elif loop == "pagerank":
        from data_ingestion_api_system_loop_ai_spark.operators.pagerank import (
            pagerank,
        )

        edges = spark.createDataFrame(
            [(i, (i + 1) % 7) for i in range(7)] + [(0, 3), (2, 5)],
            "src long, dst long",
        )
        out, deltas = pagerank(edges, iters=4)
        assert len(deltas) == 4
        keep = 1  # the final rank relation
    elif loop == "kmeans":
        from data_ingestion_api_system_loop_ai_spark.operators.kmeans import (
            kmeans_fit,
        )
        from data_ingestion_api_system_loop_ai_spark.sources.loader import (
            load_table,
        )

        e = load_table(spark, sf_dir, "embeddings")
        asg, cent, obj = kmeans_fit(e, iters=3)
        assert len(obj) == 3
        assert cent.count() > 0  # returned centroids readable
        out = asg
        keep = 2  # final assignment + final centroids
    else:
        from data_ingestion_api_system_loop_ai_spark.operators.components import (
            connected_components,
        )

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (12, 13), (11, 12)],
            "doc_a long, doc_b long",
        )
        out = connected_components(pairs)
        keep = 1  # final labels
    n = out.count()
    assert n > 0
    leaked = _persistent_rdd_count(spark) - base
    assert leaked <= keep, (
        f"{loop}: {leaked} persistent RDDs left (allowed {keep}) — "
        "per-round intermediates were not released"
    )
    # the result must remain fully readable (released blocks are
    # unrecoverable, so an over-release would surface right here)
    assert out.count() == n
