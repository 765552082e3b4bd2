"""Round-13 optimization probe: time the INTERNAL stages of the most
expensive bench queries (noop sink per guide §1.4, labeled jobs §1.5)
so optimization targets the operator that actually costs, not the one
that looks expensive. Read-only: no engine code changes here.

Usage: python tools/r13_stage_probe.py [probe ...]
Probes: curated phash video pagerank clusters zorder nnd kmeans shard
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_ingestion_api_system_loop_ai_spark.session import get_spark  # noqa: E402
from data_ingestion_api_system_loop_ai_spark.sources.loader import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(spark, label, df):
    spark.sparkContext.setJobDescription(label)
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    print(f"  {label:45s} {dt:7.2f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return dt


def ts(label, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"  {label:45s} {time.monotonic() - t0:7.2f}s (driver fn)", flush=True)
    return out


def probe_curated(spark):
    print("== q_curated_funnel components ==")
    from data_ingestion_api_system_loop_ai_spark.operators.classifier import (
        prose_labels,
        score_documents,
        train_classifier,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.corpus_pipeline import (
        funnel_stages,
        layout_stage,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.lm_score import lm_scores
    from data_ingestion_api_system_loop_ai_spark.operators.semdedup import semdedup

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    t(spark, "lm_scores(docs)", lm_scores(docs))
    train_docs = docs.filter(F.col("doc_id") % 5 != 0)
    w = ts("train_classifier (6 Newton iters)", lambda: train_classifier(
        spark, train_docs, prose_labels(train_docs)
    )[0])
    t(spark, "score_documents", score_documents(docs, w))
    t(spark, "semdedup inline", semdedup(load_table(spark, SF, "embeddings")))
    stages = funnel_stages(spark, SF)
    t(spark, "funnel after_decontam", stages["after_decontam"])
    s = stages["after_decontam"].localCheckpoint(eager=False)
    t(spark, "layout_stage(after_decontam)", layout_stage(s))


def probe_phash(spark):
    print("== q_phash_dedup components ==")
    from data_ingestion_api_system_loop_ai_spark.operators import phash

    t(spark, "phash_assets (synth only)", phash.phash_assets(spark, SF))
    t(spark, "phash_hashes (synth+decode+hash)", phash.phash_hashes(spark, SF))
    hashes = phash.phash_hashes(spark, SF).localCheckpoint()
    t(spark, "near_pairs from checkpointed hashes",
      phash.phash_near_pairs(hashes))
    t(spark, "q_phash_dedup full", phash.q_phash_dedup(spark, SF))


def probe_video(spark):
    print("== q_video_dedup components ==")
    from data_ingestion_api_system_loop_ai_spark.operators import videofp

    t(spark, "vfp_assets (synth only)", videofp.vfp_assets(spark, SF))
    t(spark, "vfp_fingerprints (synth+decode+fp)",
      videofp.vfp_fingerprints(spark, SF))
    t(spark, "q_video_dedup full", videofp.q_video_dedup(spark, SF))


def probe_pagerank(spark):
    print("== q_pagerank components ==")
    from data_ingestion_api_system_loop_ai_spark.operators.nndescent import (
        knn_graph_budgeted,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.pagerank import pagerank
    from data_ingestion_api_system_loop_ai_spark.operators.similarity import (
        ivf_assign,
    )

    e = load_table(spark, SF, "embeddings")
    t(spark, "ivf_assign", ivf_assign(e))
    g = knn_graph_budgeted(e, ivf_assign(e))
    t(spark, "knn_graph_budgeted (build)", g)
    edges = g.select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    ).localCheckpoint()
    t0 = time.monotonic()
    ranks, _ = pagerank(edges)
    print(f"  {'pagerank 10 rounds (driver loop)':45s} {time.monotonic()-t0:7.2f}s",
          flush=True)
    t(spark, "final ranks materialize", ranks)


def probe_clusters(spark):
    print("== q_embedding_clusters components ==")
    from data_ingestion_api_system_loop_ai_spark.operators.components import (
        connected_components,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.nndescent import (
        knn_graph_budgeted,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.similarity import (
        ivf_assign,
    )

    from data_ingestion_api_system_loop_ai_spark.operators.components import (
        EMB_EDGE_TAU,
    )

    e = load_table(spark, SF, "embeddings")
    g = knn_graph_budgeted(e, ivf_assign(e))
    strong = g.filter(F.col("cosine") >= EMB_EDGE_TAU).localCheckpoint()
    t0 = time.monotonic()
    cc = connected_components(strong, a_col="query_id", b_col="neighbor_id")
    print(f"  {'connected_components loop':45s} {time.monotonic()-t0:7.2f}s",
          flush=True)
    t(spark, "labels materialize", cc)


def probe_zorder(spark):
    print("== q_zorder_layout components ==")
    from data_ingestion_api_system_loop_ai_spark.operators import layout

    li = load_table(spark, SF, "lineitem")
    stats = F.broadcast(
        li.agg(
            F.min("l_partkey").alias("_mnp"), F.max("l_partkey").alias("_mxp"),
            F.min("l_suppkey").alias("_mns"), F.max("l_suppkey").alias("_mxs"),
            F.count("*").alias("_n"),
        )
    )
    based = li.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    ).crossJoin(stats)
    n_cells = 1 << layout.ZBITS
    bucketed = based.select(
        "*",
        F.expr(layout.BUCKET_SQL.format(
            v="l_partkey", mn="_mnp", mx="_mxp", n=n_cells)).alias("b1"),
        F.expr(layout.BUCKET_SQL.format(
            v="l_suppkey", mn="_mns", mx="_mxs", n=n_cells)).alias("b2"),
    ).withColumn("z", F.expr(layout.ZVALUE_SQL))
    t(spark, "bucketed+z scan only", bucketed)
    t(spark, "q_zorder_layout full", layout.q_zorder_layout(spark, SF))


def probe_nnd(spark):
    print("== q_nn_descent components ==")
    from data_ingestion_api_system_loop_ai_spark.operators.nndescent import (
        nn_descent,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.similarity import (
        ivf_assign,
        ivf_seeds,
        knn_graph_seed,
    )
    from data_ingestion_api_system_loop_ai_spark.plans.lifecycle import (
        local_checkpoint_handle,
    )

    e = load_table(spark, SF, "embeddings")
    asg, _rel = local_checkpoint_handle(ivf_assign(e), eager=False)
    seed = knn_graph_seed(asg, checkpoint=False, seeds=ivf_seeds(e))
    t(spark, "knn seed graph", seed)
    t0 = time.monotonic()
    out, _obj = nn_descent(e, seed)
    print(f"  {'nn_descent 2 rounds (driver loop)':45s} {time.monotonic()-t0:7.2f}s",
          flush=True)
    t(spark, "refined graph materialize", out)


def probe_kmeans(spark):
    print("== q_kmeans / semdedup components ==")
    from data_ingestion_api_system_loop_ai_spark.operators.kmeans import (
        kmeans_fit,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.semdedup import semdedup

    e = load_table(spark, SF, "embeddings")
    t0 = time.monotonic()
    asg, cent, _ = kmeans_fit(e)
    print(f"  {'kmeans_fit 4 rounds (driver loop)':45s} {time.monotonic()-t0:7.2f}s",
          flush=True)
    t(spark, "assignment materialize", asg)
    t(spark, "semdedup full (fit inside)", semdedup(e))


def probe_shard(spark):
    print("== q_shard_seed components ==")
    from data_ingestion_api_system_loop_ai_spark.registry import QUERIES

    t(spark, "q_shard_seed full", QUERIES["q_shard_seed"](spark, SF))


PROBES = {
    "curated": probe_curated,
    "phash": probe_phash,
    "video": probe_video,
    "pagerank": probe_pagerank,
    "clusters": probe_clusters,
    "zorder": probe_zorder,
    "nnd": probe_nnd,
    "kmeans": probe_kmeans,
    "shard": probe_shard,
}


def main() -> None:
    names = sys.argv[1:] or list(PROBES)
    spark = get_spark("r13_stage_probe")
    # warm up JVM/codegen/python workers so stage numbers are steady-state
    load_table(spark, SF, "lineitem").count()
    spark.range(10000).select(
        F.pandas_udf(lambda s: s * 1.0, "double")(F.col("id").cast("double"))
    ).write.format("noop").mode("overwrite").save()
    from data_ingestion_api_system_loop_ai_spark.plans.lifecycle import (
        release_all_persistent,
    )

    for n in names:
        PROBES[n](spark)
        release_all_persistent(spark)


if __name__ == "__main__":
    main()
