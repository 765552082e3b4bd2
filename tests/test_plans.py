"""Physical-plan shape assertions — the 100 TB design guarantees.

Correctness tests prove the operators compute the right answer; these
prove Catalyst produced the plan we designed for: filters pushed into
the parquet scan, column pruning in ReadSchema, dimension joins
broadcast, pandas UDFs on the Arrow path (never row-at-a-time Python),
and whole-stage codegen in the hot paths. A regression here means a
query silently fell off the scale path even though results still match.
"""

from __future__ import annotations

import pytest

from data_ingestion_api_system_loop_ai_spark.registry import QUERIES


@pytest.fixture(autouse=True)
def _production_planning_profile(spark):
    """This module asserts PRODUCTION plan shapes (whole-stage codegen
    subtrees), so it runs with the session.py profile even though
    conftest's test profile turns codegen off for suite latency (r14).
    Restores the test profile after each test."""
    before = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    yield
    spark.conf.set("spark.sql.codegen.wholeStage", before)


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_scan_filter_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_scan_filter_project")
    assert "PushedFilters: [" in plan
    # at least one real predicate reached the parquet reader
    assert "PushedFilters: []" not in plan
    # column pruning: the 16-column lineitem scan reads only what the
    # query projects/filters
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in read_schema
    assert read_schema.count(",") < 10


def test_q6_scan_only_needed_columns(spark, sf_dir):
    # q_tpch_q6 left the registry in the round-6 slot swap (funded
    # q_gap_fill) but stays API surface; the scan-pruning guarantee is
    # unchanged
    from data_ingestion_api_system_loop_ai_spark.operators.relational_ext import (
        UNREGISTERED_RELATIONAL_EXT_QUERIES,
    )

    df = UNREGISTERED_RELATIONAL_EXT_QUERIES["q_tpch_q6"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in read_schema
    assert "l_returnflag" not in read_schema


def test_dim_join_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_join_broadcast")
    assert "BroadcastHashJoin" in plan
    # the dims must be on the build side; no sort-merge for nation/region
    assert plan.count("BroadcastHashJoin") >= 2


def test_topk_never_global_sorts(spark, sf_dir):
    # q_topk_sort_limit left the registry in the round-3 slot swap but
    # stays API surface; the plan guarantee is unchanged
    from data_ingestion_api_system_loop_ai_spark.operators.relational import (
        UNREGISTERED_RELATIONAL_QUERIES,
    )

    df = UNREGISTERED_RELATIONAL_QUERIES["q_topk_sort_limit"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "TakeOrderedAndProject" in plan


def test_pandas_udf_is_arrow_not_row_python(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_udf_surface")
    assert "ArrowEvalPython" in plan or "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time Python path


def test_whole_stage_codegen_in_hot_path(spark, sf_dir):
    # AQE defers physical planning, so codegen subtrees are only visible
    # pre-execution with AQE off; this inspects the static plan shape.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = QUERIES["q_hash_agg"](spark, sf_dir)
        codegen = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen subtrees" in codegen
    assert "Found 0 WholeStageCodegen" not in codegen


def test_e2e_has_no_full_data_single_partition_sort(spark, sf_dir):
    """The schedule's global rank must use the two-phase bucketed plan:
    its window sorts partition by (priority_rank, created_at) — never a
    bare global Sort over the full batch relation. A SinglePartition
    exchange is allowed only for the tiny per-bucket-counts side."""
    plan = _plan(spark, sf_dir, "q_pipeline_e2e")
    lines = plan.splitlines()
    # every Window node must carry a partition spec
    window_args = [
        l
        for l in lines
        if "partitionSpec" in l or ("Arguments" in l and "windowspec" in l.lower())
    ]
    for l in lines:
        if "Window" in l and "Arguments" in l:
            assert "priority_rank" in l or "created_at" in l or "_bkt" in l


def test_salted_join_spreads_keys(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_join_salted")
    assert "_salt" in plan


def test_shingle_sets_single_exchange_reused(spark, sf_dir):
    """The shingle relation is one narrow Project (let-bound tokenizer,
    no posexplode/window chain) behind exactly one repartition exchange,
    and every consumer subtree in the banded-minhash plan REUSES that
    exchange instead of re-running the shingling (minhash minima,
    candidate semi-join, set sizes)."""
    from data_ingestion_api_system_loop_ai_spark.operators.dedup import (
        _shingle_sets,
        q_dedup_minhash_banded,
    )

    base_plan = _shingle_sets(spark, sf_dir)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    exchange_nodes = [
        l
        for l in base_plan.splitlines()
        if l.strip().startswith("(") and l.strip().endswith("Exchange")
    ]
    assert len(exchange_nodes) == 1
    assert "Window" not in base_plan and "Generate" not in base_plan

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        full = q_dedup_minhash_banded(spark, sf_dir)._jdf.queryExecution()
        executed = full.executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "ReusedExchange" in executed


def test_no_query_uses_row_python_udfs(spark, sf_dir):
    """Engine-wide lint: Python appears in plans only as Arrow-batched
    stages (ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas /
    FlatMapGroupsWithStateInPandas) — never BatchEvalPython, the
    row-at-a-time serialization path that is 10-100x slower."""
    for name in sorted(QUERIES):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name


def test_q17_subquery_is_decorrelated(spark, sf_dir):
    """The correlated scalar subquery must become a per-partkey
    aggregate joined back (RewriteCorrelatedScalarSubquery) — never a
    per-row re-scan — with the brand filter pushed into the part scan."""
    plan = _plan(spark, sf_dir, "q_tpch_q17")
    # decorrelated: exactly two lineitem scans (outer + aggregate), one
    # part scan; a nested-loop form would show no partkey aggregate
    assert plan.count("lineitem.parquet") == 2
    assert plan.count("part.parquet") == 1
    assert "EqualTo(p_brand,Brand#23)" in plan  # pushed to the scan
    # the subquery became a grouped aggregate on the correlation key
    assert "partial_avg" in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_span_dedup_winner_pick_is_hash_aggregated(spark, sf_dir):
    """The first-occurrence pick must stay a HashAggregate over the
    packed (doc_id, span_no) long: a min(struct) would silently fall
    back to SortAggregate and pay a per-partition sort on the span
    keys. Exactly two exchanges: winners by span, reassembly by doc_id
    (plus the totals join's own doc_id exchange under AQE reuse)."""
    from data_ingestion_api_system_loop_ai_spark.operators.dedup import (
        q_dedup_spans,
    )

    df = q_dedup_spans(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "SortAggregate" not in plan
    assert "BatchEvalPython" not in plan  # engine-wide lint holds here too


def test_new_unregistered_ops_stay_jvm_side(spark, sf_dir):
    """The lint above covers registered queries; the round-3 additions
    that claim JVM-only hot paths must honor it too (q_udtf_tokens is
    excluded by design — a UDTF IS the sanctioned row path)."""
    from data_ingestion_api_system_loop_ai_spark.operators.retrieval import (
        q_bm25_rank,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.sketches import (
        q_sketch_rollup,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.timeseries import (
        q_gap_fill,
    )

    for fn in (q_bm25_rank, q_gap_fill, q_sketch_rollup):
        plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "BatchEvalPython" not in plan, fn.__name__
        assert "ArrowEvalPython" not in plan, fn.__name__


def test_round4_session_ops_stay_jvm_side(spark, sf_dir):
    """Same JVM-only lint for this session's additions: prefix join,
    quantile histogram, and the frozen-model SemDeDup assignment —
    all pure relational plans, no Python eval nodes anywhere."""
    from data_ingestion_api_system_loop_ai_spark.operators.dedup import (
        q_dedup_containment,
        q_dedup_prefix,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.monitoring import (
        q_psi_drift,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.retrieval import (
        q_hybrid_rank,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.sampling import (
        q_temperature_mix,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.sketches import (
        q_hist_quantiles,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.timeseries import (
        q_pit_join,
    )

    for fn in (
        q_dedup_prefix,
        q_dedup_containment,
        q_hist_quantiles,
        q_pit_join,
        q_hybrid_rank,
        q_temperature_mix,
        q_psi_drift,
    ):
        plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "BatchEvalPython" not in plan, fn.__name__
        assert "ArrowEvalPython" not in plan, fn.__name__


def test_dedup_prefix_candidate_join_prunes_hot_shingles(spark, sf_dir):
    """The prefix join's defining property in plan terms: the candidate
    equi-join consumes the PREFIX relation (rank-filtered), so the
    per-shingle posting lists entering the join are strictly smaller
    than the raw shingle relation. Verified semantically: every prefix
    row count is below the total shingle row count, and the candidate
    pair count is bounded well under all-pairs."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from data_ingestion_api_system_loop_ai_spark.operators.dedup import (
        PREFIX_TAU,
        _shingle_sets,
    )

    base = _shingle_sets(spark, sf_dir).filter(F.size("ss") > 0)
    sh = base.select("doc_id", F.explode("ss").alias("s"))
    total = sh.count()
    dfreq = sh.groupBy("s").agg(F.count("*").alias("df"))
    wd = W.partitionBy("doc_id").orderBy("df", "s")
    pref_n = (
        sh.join(dfreq, "s")
        .select(
            "doc_id",
            F.row_number().over(wd).alias("rk"),
            F.count("*").over(W.partitionBy("doc_id")).alias("n"),
        )
        .filter(
            F.col("rk") <= F.col("n") - F.ceil(F.lit(PREFIX_TAU) * F.col("n")) + 1
        )
        .count()
    )
    # tau=0.5 keeps ~half of each doc's shingles (+1)
    assert pref_n < 0.6 * total


def test_aqe_skew_join_splits_hot_partition(spark, sf_dir):
    """AQE's built-in skew handling (enabled in session.py) must
    actually ENGAGE on a skewed shuffle join: a build side where one
    key holds ~half the rows produces an executed plan whose sort-merge
    join is marked skew=on — the runtime complement to the manual
    salting pattern (q_join_salted), proving the session config is not
    a dead knob. Thresholds are lowered only inside this test so the
    ~100k-row fixture crosses AQE's size heuristics."""
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        n = 100_000
        # key 0 holds half the big side. The payload must be DATA-
        # DEPENDENT and incompressible: a literal pad is constant-folded
        # past the join (the shuffle then carries only the key column)
        # and the hot partition's identical keys lz4-compress below the
        # skew byte threshold — sha2(id) forces the 64-byte column
        # through the shuffle at full entropy.
        big = spark.range(n).select(
            F.when(F.col("id") % 2 == 0, 0)
            .otherwise(F.col("id") % 512)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        small = spark.range(512).select(
            F.col("id").alias("k"), F.lit(1).alias("v")
        )
        j = big.join(small, "k")
        # execute THIS DataFrame's own query execution — count() or a
        # write command would plan a SEPARATE query and leave j's AQE
        # unfinalized; collect() runs the Dataset's own plan
        assert len(j.collect()) == n
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)

def test_round5_session_ops_stay_jvm_side(spark, sf_dir):
    """Same JVM-only lint for the round-5 session additions: the
    composed corpus funnel (registered), its per-doc drop attribution,
    the two-phase budget selection, and integer-exact PPS sampling —
    all pure relational plans, no Python eval nodes anywhere."""
    from data_ingestion_api_system_loop_ai_spark.operators.corpus_pipeline import (
        q_corpus_funnel,
        q_funnel_explain,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.curation import (
        q_embedding_quantize,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.packing import (
        q_chunk_overlap,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.sampling import (
        q_budget_select,
        q_pps_sample,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.sketches import (
        q_kmv_overlap,
    )

    for fn in (q_corpus_funnel, q_funnel_explain, q_budget_select,
               q_pps_sample, q_kmv_overlap, q_embedding_quantize,
               q_chunk_overlap):
        plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "BatchEvalPython" not in plan, fn.__name__
        assert "ArrowEvalPython" not in plan, fn.__name__
