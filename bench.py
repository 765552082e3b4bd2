"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the noop sink (full execution, no
driver-side row transfer). A trivial warm-up query first amortizes JVM/
session startup out of the per-query numbers. Each query runs
$SPARK_GRAFT_BENCH_RUNS times (default 3) and reports the per-query
MEDIAN, so round-over-round comparisons aren't single-sample noise.
A {median, min, max} per-query spread map is written to the side file
BENCH_SPREAD.json (NOT stdout — the driver tail-captures stdout and
the r03 inline spread pushed the JSON line past the capture window,
losing the round's headline number; VERDICT r03 #1/#3) so a
regression can still be told apart from run-to-run variance without
re-benching.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import time

from data_ingestion_api_system_loop_ai_spark.registry import QUERIES
from data_ingestion_api_system_loop_ai_spark.session import get_spark

HEADLINE = [
    "q_pipeline_e2e",
    "q_hash_agg",
    "q_join_shuffle",
    "q_join_broadcast",
    "q_scan_filter_project",
    "q_window_rank",
    "q_rollup_cube",
    "q_distinct_agg",
    "q_dedup_exact",
    "q_dedup_near",
    "q_dedup_simhash",
    "q_similarity_topk",
    "q_similarity_ivf",
    "q_text_analysis",
    "q_sequence_pack",
    "q_sessionize",
    "q_asof_join",
    "q_stream_sliding",
    "q_watermark_late",
    "q_udf_surface",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_join_salted",
    "q_analytic_funcs",
    "q_stats_agg",
    "q_grouping_sets",
    "q_source_ingest",
    # r13 rotation: q_range_join moved to the unregistered surface
    # (funding q_shard_seed); both keep their cost rows here
    "q_range_join",
    "q_shard_seed",
    "q_tpch_q14",
    "q_dedup_minhash_banded",
    "q_text_profile",
    "q_tpch_q17",
    "q_tpch_q21",
    "q_dedup_embedding",
    "q_multimodal_meta",
    "q_media_pipeline",
    "q_media_meta",
    # round 10: perceptual-hash image dedup (decode+hash mapInPandas,
    # exact-content groupBy, pigeonhole-banded near pairs) and HTML
    # boilerplate extraction (pure JVM string ops, DuckDB-oracle-exact)
    "q_phash_dedup",
    # r11: robust audio fingerprint dedup (B130)
    "q_audio_dedup",
    # r12: video content fingerprint dedup (B132)
    "q_video_dedup",
    "q_html_extract",
    # round-10 third session: the crawl-ingest chain (B122-B126) and
    # its composed capstone
    "q_url_dedup",
    "q_warc_pipeline",
    "q_robots_filter",
    "q_crawl_funnel_report",
    "q_charset_sniff",
    "q_zorder_layout",
    "q_text_normalize",
    "q_decontaminate",
    "q_quality_filter",
    "q_domain_mix",
    "q_corpus_shuffle",
    "q_dedup_spans",
    # the registered capstone funnel (round-5 rotation): composed
    # verdict joins + survivor temperature mix + shuffle + packing
    "q_corpus_funnel",
    # unregistered operators (the registry is at the driver's 50-slot
    # cap; q_multimodal_meta gave up its slot in the round-4 rotation)
    # whose cost profile still matters at scale — benched from their
    # module entry points via _EXTRA below
    "q_tpch_q13",
    "q_tpch_q18",
    "q_bm25_rank",
    "q_gap_fill",
    "q_scd2",
    "q_sketch_rollup",
    "q_lm_score",
    "q_embedding_outliers",
    "q_tfidf_source",
    "q_kmeans",
    "q_semdedup",
    "q_cms_topk",
    "q_funnel",
    "q_cohort_retention",
    "q_curriculum_order",
    # probe-from-persisted-index ANN (VERDICT r03 #5): the index is
    # built ONCE before the timed runs (build-once artifact at 100 TB),
    # so this number is query-only latency — compare with
    # q_similarity_ivf, which retrains its quantizer inside the query
    "q_similarity_ivf_index",
    # SemDeDup against a persisted frozen k-means model (same build/
    # probe split) — compare with q_semdedup, which fits inside
    "q_semdedup_model",
    # exact prefix-filtering similarity self-join (AllPairs/PPJoin)
    "q_dedup_prefix",
    # mergeable quantile histogram (build/merge/probe, DuckDB-parity)
    "q_hist_quantiles",
    # corpus-wide approximate kNN graph: inline quantizer fit vs the
    # persisted-index probe (build/probe split)
    "q_knn_graph",
    "q_knn_graph_index",
    # point-in-time join over SCD2 history (feature-store lookup)
    "q_pit_join",
    # reciprocal-rank fusion of BM25 + LM-fluency rankings
    "q_hybrid_rank",
    # NN-Descent kNN-graph refinement (iterative)
    "q_nn_descent",
    # sqrt-temperature domain resampling (epoch multiplicities)
    "q_temperature_mix",
    # Arrow-batched zlib compression-ratio quality signal
    "q_compression_ratio",
    # PSI drift monitoring over the events stream
    "q_psi_drift",
    # asymmetric containment (quotation/partial-copy) detection
    "q_dedup_containment",
    # stratified k-fold assignment (exact per-stratum balance)
    "q_stratified_kfold",
    # PMI collocation extraction
    "q_collocations",
    # grouped mergeable quantiles + Markov transition matrix
    "q_hist_quantiles_grouped",
    "q_event_transitions",
    # semantic clusters: CC over strong kNN edges (iterative)
    "q_embedding_clusters",
    # bigram LM conditional surprisal
    "q_lm2_score",
    # semantic clusters probed from the persisted index
    "q_embedding_clusters_index",
    # text/retrieval scoring against the persisted text model (the
    # last build/probe split, VERDICT r04 #1): compare with the
    # train-inside forms q_lm_score / q_lm2_score / q_hybrid_rank
    "q_lm_score_model",
    "q_lm2_score_model",
    "q_hybrid_rank_model",
    # the production shape of the split: score the 1% ingest batch
    # against the frozen corpus LM (O(batch)) vs training on the full
    # corpus inline to score the same batch (O(corpus))
    "q_lm_batch_inline",
    "q_lm_batch_model",
    # round-5 session additions: corpus-funnel audit, token-budget
    # greedy selection, integer-exact PPS sampling, and the trained
    # prose classifier probed from its persisted frozen weights
    "q_funnel_explain",
    "q_budget_select",
    "q_pps_sample",
    "q_classifier_score_model",
    # KMV/theta distinct set algebra (cross-segment overlap)
    "q_kmv_overlap",
    # int8 per-dim scalar quantization damage report
    "q_embedding_quantize",
    # overlapping token-window chunking (retrieval/long-context splits)
    "q_chunk_overlap",
    # KS drift (binning-free complement to PSI) + Heaps-law vocab curve
    "q_ks_drift",
    "q_vocab_growth",
    # multi-signal curation verdict (quality+decontam+eval+typicality)
    "q_curation_verdict",
    # trailing repetition-loop (degenerate-text) detector
    "q_repetition_loops",
    # round-8 rotation addition: DSIR importance-resampling selection
    "q_dsir_select",
    # the whole model-augmented curated funnel, both forms (VERDICT r07
    # #7): inline fits every model inside the query (the audit path),
    # the _models form probes the frozen build_corpus_artifacts root
    # (the production path — its build seconds land in "builds")
    "q_curated_funnel",
    "q_curated_funnel_models",
    # sliding exact-substring duplication audit (Lee et al. 2022)
    "q_dedup_substrings",
    # r11: corpus-frequency boilerplate-span removal (RefinedWeb rule)
    "q_dedup_boilerplate",
    # round-8 second rotation: interpolated Kneser-Ney bigram LM
    # (registered; compare with q_lm2_score's add-one form) and
    # DoReMi-style one-step domain reweighting (registered)
    "q_kn_score",
    "q_doremi_weights",
    # CCNet per-language head/middle/tail perplexity terciles
    "q_ccnet_buckets",
    # BPE fertility / chars-per-token audit: inline (trains the
    # tokenizer inside the query) vs the frozen-model probe
    "q_tokenizer_fertility",
    "q_tokenizer_fertility_model",
    # SAX-bucketed time-series correlation top-k over events
    "q_ts_similarity",
    # fuzzy (MinHash-bipartite) train/eval decontamination
    "q_decontaminate_fuzzy",
    # winnowing fingerprint pairs (MOSS — guaranteed-detection dedup)
    "q_winnow_pairs",
    # Min-K% Prob membership signal over the eval slice
    "q_mink_contamination",
    # sorted-neighborhood dedup (the sort-based blocking family)
    "q_dedup_snm",
    # Zipf-law slope/r2 corpus-health fit
    "q_zipf_fit",
    # Simple Good-Turing count re-estimates + unseen mass
    "q_good_turing",
    # Church-Gale token burstiness top-k
    "q_burstiness",
    # Davies-Bouldin cluster-quality audit: inline fit vs frozen model
    "q_cluster_quality",
    "q_cluster_quality_model",
    # round 9: readability battery, distinct-n diversity, kNN-graph
    # PageRank centrality
    "q_readability",
    "q_ngram_diversity",
    "q_pagerank",
    "q_pagerank_index",
]


def _extra_queries():
    import tempfile

    from data_ingestion_api_system_loop_ai_spark.operators import ann_index
    from data_ingestion_api_system_loop_ai_spark.operators.multimodal import (
        q_media_meta,
        q_media_pipeline,
        q_multimodal_meta,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.html_extract import (
        q_html_extract as _html_extract,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.phash import (
        q_phash_dedup as _phash_dedup,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.audiofp import (
        q_audio_dedup as _audio_dedup,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.videofp import (
        q_video_dedup as _video_dedup,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.urls import (
        q_url_dedup as _url_dedup,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.warc import (
        q_warc_pipeline as _warc_pipeline,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.robots import (
        q_robots_filter as _robots_filter,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.crawl_funnel import (
        q_crawl_funnel_report as _crawl_funnel_report,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.charset import (
        q_charset_sniff as _charset_sniff,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.layout import (
        q_zorder_layout as _zorder_layout,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.textnorm import (
        q_text_normalize as _text_normalize,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.relational_ext import (
        q_tpch_q13,
        q_tpch_q18,
    )

    from data_ingestion_api_system_loop_ai_spark.operators.retrieval import (
        q_bm25_rank,
        q_hybrid_rank,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.curation import (
        q_curation_verdict,
        q_embedding_outliers,
        q_embedding_quantize,
        q_tfidf_source,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.packing import (
        q_chunk_overlap,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.text_analysis import (
        UNREGISTERED_TEXT_QUERIES,
        q_vocab_growth,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.collocations import (
        q_collocations,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.components import (
        q_embedding_clusters,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.monitoring import (
        q_ks_drift,
        q_psi_drift,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.quality import (
        q_compression_ratio,
        q_repetition_loops,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.behavior import (
        q_cohort_retention,
        q_event_transitions,
        q_funnel,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.bpe import (
        q_tokenizer_fertility,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.contamination import (
        UNREGISTERED_CONTAMINATION_QUERIES,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.kmeans import (
        q_cluster_quality,
        q_kmeans,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.lm_score import (
        UNREGISTERED_LM_QUERIES,
        q_ccnet_buckets,
        q_lm2_score,
        q_lm_score,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.sampling import (
        q_curriculum_order,
        q_stratified_kfold,
        q_temperature_mix,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.semdedup import (
        q_semdedup,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.sketches import (
        q_cms_topk,
        q_hist_quantiles_grouped,
        q_kmv_overlap,
        q_sketch_rollup,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.timeseries import (
        q_gap_fill,
        q_pit_join,
        q_range_join,
    )

    from data_ingestion_api_system_loop_ai_spark.operators import semdedup as sdd
    from data_ingestion_api_system_loop_ai_spark.operators.dedup import (
        DEDUP_QUERIES,
        UNREGISTERED_DEDUP_QUERIES,
        q_dedup_containment,
        q_dedup_prefix,
    )
    from data_ingestion_api_system_loop_ai_spark.operators import (
        curated_corpus as ccorp,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.nndescent import (
        q_nn_descent,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.pagerank import (
        q_pagerank as _pagerank_q,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.similarity import (
        q_knn_graph,
    )

    from data_ingestion_api_system_loop_ai_spark.operators import (
        text_models as tmod,
    )

    ix_root = tempfile.mkdtemp(prefix="bench_ann_ix_")
    built: dict[str, str] = {}
    km_built: dict[str, str] = {}
    tm_built: dict[str, str] = {}

    def _text_model(spark, sf_dir) -> str:
        if sf_dir not in tm_built:
            p = os.path.join(ix_root, "tm_" + os.path.basename(sf_dir.rstrip("/")))
            tmod.build_text_models(spark, sf_dir, p)
            tm_built[sf_dir] = p
        return tm_built[sf_dir]

    def _lm_from_model(spark, sf_dir):
        return tmod.q_lm_score_from_model(spark, sf_dir, _text_model(spark, sf_dir))

    def _lm2_from_model(spark, sf_dir):
        return tmod.q_lm2_score_from_model(spark, sf_dir, _text_model(spark, sf_dir))

    def _hybrid_from_model(spark, sf_dir):
        return tmod.q_hybrid_rank_from_model(
            spark, sf_dir, _text_model(spark, sf_dir)
        )

    def _lm_batch_model(spark, sf_dir):
        return tmod.q_lm_score_batch_from_model(
            spark, sf_dir, _text_model(spark, sf_dir)
        )

    def _lm_batch_inline(spark, sf_dir):
        # honest train-inside equivalent of the batch scoring: the LM
        # must come from the FULL corpus even though only the 1% batch
        # is scored — O(corpus) per invocation
        from pyspark.sql import functions as _F

        from data_ingestion_api_system_loop_ai_spark.operators.lm_score import (
            lm_scores,
            unigram_counts,
            unigram_totals,
        )
        from data_ingestion_api_system_loop_ai_spark.sources.loader import (
            load_table,
        )

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        batch = docs.filter(_F.col("doc_id") % 100 == 0)
        freq = unigram_counts(docs)
        return lm_scores(batch, freq=freq, totals=unigram_totals(freq))

    def _ivf_from_index(spark, sf_dir):
        # one build per sf_dir, OUTSIDE any timed run when the warm-up
        # pass executes first (it does: the compile warm-up runs every
        # headline query once before timing)
        if sf_dir not in built:
            p = os.path.join(ix_root, os.path.basename(sf_dir.rstrip("/")))
            ann_index.build_ann_index(spark, sf_dir, p)
            built[sf_dir] = p
        return ann_index.q_similarity_ivf_from_index(spark, sf_dir, built[sf_dir])

    def _knn_from_index(spark, sf_dir):
        if sf_dir not in built:
            p = os.path.join(ix_root, os.path.basename(sf_dir.rstrip("/")))
            ann_index.build_ann_index(spark, sf_dir, p)
            built[sf_dir] = p
        return ann_index.q_knn_graph_from_index(spark, sf_dir, built[sf_dir])

    def _clusters_from_index(spark, sf_dir):
        if sf_dir not in built:
            p = os.path.join(ix_root, os.path.basename(sf_dir.rstrip("/")))
            ann_index.build_ann_index(spark, sf_dir, p)
            built[sf_dir] = p
        return ann_index.q_embedding_clusters_from_index(
            spark, sf_dir, built[sf_dir]
        )

    def _pagerank_from_index(spark, sf_dir):
        from data_ingestion_api_system_loop_ai_spark.operators.pagerank import (
            q_pagerank_from_index,
        )

        if sf_dir not in built:
            p = os.path.join(ix_root, os.path.basename(sf_dir.rstrip("/")))
            ann_index.build_ann_index(spark, sf_dir, p)
            built[sf_dir] = p
        return q_pagerank_from_index(spark, sf_dir, built[sf_dir])

    clf_built: dict = {}

    def _classifier_from_model(spark, sf_dir):
        # same build-once discipline for the trained text classifier:
        # the Newton/IRLS training is the build step, the benched
        # number is pure scoring (one corpus scan + broadcast weights)
        from data_ingestion_api_system_loop_ai_spark.operators import (
            classifier as clf,
        )

        if sf_dir not in clf_built:
            p = os.path.join(
                ix_root, "clf_" + os.path.basename(sf_dir.rstrip("/"))
            )
            clf.build_classifier_model(spark, sf_dir, p)
            clf_built[sf_dir] = p
        return clf.q_classifier_from_model(spark, sf_dir, clf_built[sf_dir])

    def _semdedup_from_model(spark, sf_dir):
        # same build-once discipline for the k-means cluster model
        if sf_dir not in km_built:
            p = os.path.join(
                ix_root, "km_" + os.path.basename(sf_dir.rstrip("/"))
            )
            sdd.build_kmeans_model(spark, sf_dir, p)
            km_built[sf_dir] = p
        return sdd.q_semdedup_from_model(spark, sf_dir, km_built[sf_dir])

    def _cluster_quality_from_model(spark, sf_dir):
        # rides the same frozen k-means model as the semdedup probe
        from data_ingestion_api_system_loop_ai_spark.operators.kmeans import (
            q_cluster_quality_from_model,
        )

        if sf_dir not in km_built:
            p = os.path.join(
                ix_root, "km_" + os.path.basename(sf_dir.rstrip("/"))
            )
            sdd.build_kmeans_model(spark, sf_dir, p)
            km_built[sf_dir] = p
        return q_cluster_quality_from_model(spark, sf_dir, km_built[sf_dir])

    bpe_built: dict = {}

    def _fertility_from_model(spark, sf_dir):
        # build-once discipline for the frozen BPE model
        import data_ingestion_api_system_loop_ai_spark.operators.bpe as _bpe

        if sf_dir not in bpe_built:
            p = os.path.join(
                ix_root, "bpe_" + os.path.basename(sf_dir.rstrip("/"))
            )
            _bpe.build_bpe_model(spark, sf_dir, p)
            bpe_built[sf_dir] = p
        return _bpe.q_tokenizer_fertility_from_model(
            spark, sf_dir, bpe_built[sf_dir]
        )

    curated_built: dict = {}

    def _curated_funnel_models(spark, sf_dir):
        # build/probe split for the WHOLE funnel: the three model
        # families the curated gates probe are built once per sf_dir
        # (outside the timed runs — the warm-up pass executes first),
        # so this number is the production-path funnel: zero training,
        # every gate a broadcast-verdict semi/anti join
        if sf_dir not in curated_built:
            p = os.path.join(
                ix_root, "curated_" + os.path.basename(sf_dir.rstrip("/"))
            )
            ccorp.build_corpus_artifacts(
                spark, sf_dir, p, skip=("ann", "dedup_index")
            )
            curated_built[sf_dir] = p
        return ccorp.curated_stages(spark, sf_dir, curated_built[sf_dir])[
            "final"
        ].drop("text")

    from data_ingestion_api_system_loop_ai_spark.operators.relational import (
        UNREGISTERED_RELATIONAL_QUERIES,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.relational_ext import (
        UNREGISTERED_RELATIONAL_EXT_QUERIES,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.timeseries import (
        UNREGISTERED_TIMESERIES_QUERIES,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.sampling import (
        UNREGISTERED_SAMPLING_QUERIES,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.corpus_pipeline import (
        UNREGISTERED_CORPUS_QUERIES,
    )

    return {
        # round-5 rotation evictions — still benched from their
        # unregistered dicts (cost profile unchanged by registration)
        "q_window_rank": UNREGISTERED_RELATIONAL_QUERIES["q_window_rank"],
        # round-6 rotation evictions (funded q_ks_drift/q_scd2/q_gap_fill)
        "q_join_shuffle": UNREGISTERED_RELATIONAL_QUERIES["q_join_shuffle"],
        "q_rollup_cube": UNREGISTERED_RELATIONAL_QUERIES["q_rollup_cube"],
        "q_tpch_q6": UNREGISTERED_RELATIONAL_EXT_QUERIES["q_tpch_q6"],
        "q_stream_sliding": UNREGISTERED_TIMESERIES_QUERIES["q_stream_sliding"],
        "q_watermark_late": UNREGISTERED_TIMESERIES_QUERIES["q_watermark_late"],
        "q_corpus_shuffle": UNREGISTERED_SAMPLING_QUERIES["q_corpus_shuffle"],
        "q_budget_select": UNREGISTERED_SAMPLING_QUERIES["q_budget_select"],
        "q_pps_sample": UNREGISTERED_SAMPLING_QUERIES["q_pps_sample"],
        "q_funnel_explain": UNREGISTERED_CORPUS_QUERIES["q_funnel_explain"],
        # round-8 rotation evictions (funded q_dsir_select /
        # q_hist_quantiles); q_hist_quantiles itself moved to the
        # registry and is benched from there
        # round-8 second rotation evictions (funded q_kn_score /
        # q_doremi_weights) — both registered rotations benched from
        # the registry; the evictions keep their cost rows here
        "q_text_analysis": UNREGISTERED_TEXT_QUERIES["q_text_analysis"],
        "q_tpch_q14": UNREGISTERED_RELATIONAL_EXT_QUERIES["q_tpch_q14"],
        # CCNet per-lang perplexity terciles (unregistered, new r8)
        "q_ccnet_buckets": q_ccnet_buckets,
        # tokenizer fertility audit (unregistered, new r8): inline +
        # frozen-BPE probe (model built once per sf_dir in the builds
        # pass, like the other from-model entries)
        "q_tokenizer_fertility": q_tokenizer_fertility,
        "q_tokenizer_fertility_model": _fertility_from_model,
        # SAX-bucketed TS correlation search (unregistered, new r8)
        "q_ts_similarity": UNREGISTERED_TIMESERIES_QUERIES["q_ts_similarity"],
        # fuzzy bipartite decontamination (unregistered, new r8)
        "q_decontaminate_fuzzy": UNREGISTERED_CONTAMINATION_QUERIES[
            "q_decontaminate_fuzzy"
        ],
        # winnowing fingerprints (unregistered, new r8)
        "q_winnow_pairs": UNREGISTERED_DEDUP_QUERIES["q_winnow_pairs"],
        # Min-K% membership + sorted-neighborhood dedup (new r8)
        "q_mink_contamination": UNREGISTERED_CONTAMINATION_QUERIES[
            "q_mink_contamination"
        ],
        "q_dedup_snm": UNREGISTERED_DEDUP_QUERIES["q_dedup_snm"],
        # registered in the r12 rotation (funded by q_gap_fill)
        "q_dedup_boilerplate": DEDUP_QUERIES["q_dedup_boilerplate"],
        "q_zipf_fit": UNREGISTERED_TEXT_QUERIES["q_zipf_fit"],
        "q_good_turing": UNREGISTERED_LM_QUERIES["q_good_turing"],
        "q_burstiness": UNREGISTERED_TEXT_QUERIES["q_burstiness"],
        "q_cluster_quality": q_cluster_quality,
        "q_cluster_quality_model": _cluster_quality_from_model,
        "q_readability": UNREGISTERED_TEXT_QUERIES["q_readability"],
        "q_ngram_diversity": UNREGISTERED_TEXT_QUERIES["q_ngram_diversity"],
        "q_pagerank": _pagerank_q,
        "q_pagerank_index": _pagerank_from_index,
        "q_dedup_spans": UNREGISTERED_DEDUP_QUERIES["q_dedup_spans"],
        # r10 rotation: registered (funded by q_kmv_overlap)
        "q_dedup_substrings": DEDUP_QUERIES["q_dedup_substrings"],
        "q_domain_mix": UNREGISTERED_SAMPLING_QUERIES["q_domain_mix"],
        # whole-funnel build/probe split (VERDICT r07 #7)
        "q_curated_funnel": ccorp.q_curated_funnel,
        "q_curated_funnel_models": _curated_funnel_models,
        "q_semdedup_model": _semdedup_from_model,
        "q_classifier_score_model": _classifier_from_model,
        "q_dedup_prefix": q_dedup_prefix,
        "q_kmv_overlap": q_kmv_overlap,
        "q_embedding_quantize": q_embedding_quantize,
        "q_chunk_overlap": q_chunk_overlap,
        "q_ks_drift": q_ks_drift,
        "q_vocab_growth": q_vocab_growth,
        "q_curation_verdict": q_curation_verdict,
        "q_repetition_loops": q_repetition_loops,
        "q_knn_graph": q_knn_graph,
        "q_knn_graph_index": _knn_from_index,
        "q_pit_join": q_pit_join,
        "q_hybrid_rank": q_hybrid_rank,
        "q_nn_descent": q_nn_descent,
        "q_temperature_mix": q_temperature_mix,
        "q_compression_ratio": q_compression_ratio,
        "q_psi_drift": q_psi_drift,
        "q_dedup_containment": q_dedup_containment,
        "q_stratified_kfold": q_stratified_kfold,
        "q_collocations": q_collocations,
        "q_hist_quantiles_grouped": q_hist_quantiles_grouped,
        "q_event_transitions": q_event_transitions,
        "q_embedding_clusters": q_embedding_clusters,
        "q_lm2_score": q_lm2_score,
        "q_embedding_clusters_index": _clusters_from_index,
        "q_multimodal_meta": q_multimodal_meta,
        "q_media_pipeline": q_media_pipeline,
        # round-9: MP4 box walk + MKV/EBML parse over synthesized
        # containers (two narrow mapInPandas stages)
        "q_media_meta": q_media_meta,
        # round-10: perceptual-hash image dedup (B120) + HTML
        # boilerplate extraction (B121)
        "q_phash_dedup": _phash_dedup,
        "q_audio_dedup": _audio_dedup,
        "q_video_dedup": _video_dedup,
        "q_html_extract": _html_extract,
        # round-10 second session: URL canonicalization dedup (B123) +
        # WARC framing composed through B121 (B122)
        "q_url_dedup": _url_dedup,
        "q_warc_pipeline": _warc_pipeline,
        "q_robots_filter": _robots_filter,
        # the composed ingest capstone: WARC -> robots -> extract ->
        # URL dedup, one verdict row per doc, aggregated
        "q_crawl_funnel_report": _crawl_funnel_report,
        "q_charset_sniff": _charset_sniff,
        "q_zorder_layout": _zorder_layout,
        "q_text_normalize": _text_normalize,
        "q_tpch_q13": q_tpch_q13,
        "q_tpch_q18": q_tpch_q18,
        "q_bm25_rank": q_bm25_rank,
        "q_gap_fill": q_gap_fill,
        # r13 rotation eviction (funded q_shard_seed)
        "q_range_join": q_range_join,
        "q_sketch_rollup": q_sketch_rollup,
        "q_lm_score": q_lm_score,
        "q_embedding_outliers": q_embedding_outliers,
        "q_tfidf_source": q_tfidf_source,
        "q_kmeans": q_kmeans,
        "q_semdedup": q_semdedup,
        "q_cms_topk": q_cms_topk,
        "q_funnel": q_funnel,
        "q_cohort_retention": q_cohort_retention,
        "q_curriculum_order": q_curriculum_order,
        "q_similarity_ivf_index": _ivf_from_index,
        "q_lm_score_model": _lm_from_model,
        "q_lm2_score_model": _lm2_from_model,
        "q_hybrid_rank_model": _hybrid_from_model,
        "q_lm_batch_inline": _lm_batch_inline,
        "q_lm_batch_model": _lm_batch_model,
    }


def _post_throughput(spark) -> dict:
    """Listener POST throughput (VERDICT r04 #3/#4): N concurrent
    clients against the live HTTP listener. The group-commit batcher
    coalesces concurrent validations into one engine job per window and
    the POST path runs no serving-table upsert, so posts/s must scale
    with concurrency instead of tracking Spark job-launch latency
    (~100 ms/job would cap a per-POST-job design near 10/s)."""
    import tempfile
    import threading
    import urllib.request

    from data_ingestion_api_system_loop_ai_spark.http_api import IngestApiServer

    srv = IngestApiServer(
        spark, root_dir=tempfile.mkdtemp(prefix="bench_http_"), port=0
    )
    srv.start_background()
    n_clients, per_client = 32, 8
    body = json.dumps({"ids": [1, 2, 3, 4, 5], "priority": "HIGH"}).encode()
    errors = []

    def client():
        for _ in range(per_client):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/ingest", data=body, method="POST"
            )
            with urllib.request.urlopen(req, timeout=120) as resp:
                if resp.status != 202:
                    errors.append(resp.status)

    # warm the validation path once (first job pays codegen)
    urllib.request.urlopen(
        urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/ingest", data=body, method="POST"
        ),
        timeout=120,
    ).read()
    t0 = time.monotonic()
    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    srv.shutdown()
    n = n_clients * per_client
    return {
        "posts": n,
        "concurrency": n_clients,
        "wall_s": round(wall, 3),
        "posts_per_s": round(n / wall, 1),
        "errors": len(errors),
    }


def _drain_throughput(spark, n_queues: int = 64) -> dict:
    """Measured engine counterpart to the reference's hard ceiling of
    0.6 ids/s (BASELINE.md (a): one ≤3-id batch per 5 s on one heap):
    ``n_queues`` tenant queues × 25 triggers of one 3-id request each,
    drained by ``live_priority_drain(queue_col=...)`` under availableNow
    with maxFilesPerTrigger=1 — per-queue serialism (one dequeue per
    queue per trigger, the reference's semantics) but tenants in
    parallel, which is exactly the scale-out argument made in SURVEY
    §2.1 A6; benched at 1/8/64 tenants (VERDICT r04 #8) to show
    batches/s scales with tenant count while per-queue order holds."""
    import tempfile

    from data_ingestion_api_system_loop_ai_spark.streaming.live import (
        live_priority_drain,
    )

    root = tempfile.mkdtemp(prefix="bench_drain_")
    src = os.path.join(root, "requests")
    os.makedirs(src)
    n_triggers, ids_per_req = 25, 3
    base = 1_700_000_000
    for t in range(n_triggers):
        p = os.path.join(src, f"f{t:03d}.json")
        with open(p, "w") as fh:
            for q in range(n_queues):
                fh.write(
                    json.dumps(
                        {
                            "request_id": f"r{t}-{q}",
                            "priority": ("HIGH", "MEDIUM", "LOW")[q % 3],
                            "created_at_ms": t * 1000 + q,
                            "ids": [t * 1000 + q * 10 + j for j in range(ids_per_req)],
                            "tenant": f"t{q:03d}",
                        }
                    )
                    + "\n"
                )
        os.utime(p, (base + t, base + t))
    stream = (
        spark.readStream.schema(
            "request_id string, priority string, created_at_ms long, "
            "ids array<long>, tenant string"
        )
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    t0 = time.monotonic()
    q = (
        live_priority_drain(stream, queue_col="tenant")
        .writeStream.format("memory")
        .queryName("bench_drain")
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    drained = spark.table("bench_drain").count()
    return {
        "drained_batches": drained,
        "wall_s": round(wall, 3),
        "batches_per_s": round(drained / wall, 2),
        "ids_per_s": round(drained * ids_per_req / wall, 2),
        "reference_ceiling_ids_per_s": 0.6,
    }


def _release_dead_blocks(spark) -> None:
    """Unpersist every persistent RDD (all are localCheckpoint leftovers
    of queries that already finished — see the call-site comment for why
    nothing live can be hit). Non-blocking; runs between timed windows."""
    from data_ingestion_api_system_loop_ai_spark.plans.lifecycle import (
        release_all_persistent,
    )

    release_all_persistent(spark)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("bench")

    # warm-up: JVM + codegen + noop sink + parquet footers + the Python
    # worker pool (first pandas_udf call forks workers per core), so the
    # per-query numbers measure the queries, not process startup.
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    from data_ingestion_api_system_loop_ai_spark.sources.loader import load_table

    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    load_table(spark, sf_dir, "events").limit(1000).write.format("noop").mode(
        "overwrite"
    ).save()

    # non-decorator form: `from __future__ import annotations` stringifies
    # type hints, which pandas_udf's hint-based eval-type inference rejects
    _warm = F.pandas_udf(lambda s: s * 1.0, "double")

    spark.range(10000).select(_warm(F.col("id").cast("double"))).write.format(
        "noop"
    ).mode("overwrite").save()

    # compile-stage warm-up: run every headline query once at the tiny
    # smoke SF. Whole-stage-codegen sources don't embed file paths, so
    # this populates the Janino compilation cache for the timed runs —
    # the numbers below then measure steady-state query execution, not
    # one-time JIT compilation.
    fns = {**QUERIES, **_extra_queries()}
    warm_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_sf) and warm_sf != sf_dir:
        for name in HEADLINE:
            fns[name](spark, warm_sf).write.format("noop").mode(
                "overwrite"
            ).save()

    # the persisted-index probe entries build their artifacts lazily on
    # first call per sf_dir; run each once here so the BUILD lands
    # before the timed loop and the timed samples are pure query-only
    # latency. Build seconds are recorded in BENCH_SPREAD's "builds"
    # block — the other half of every build/probe split's cost story.
    builds: dict[str, float] = {}
    for probe in (
        "q_similarity_ivf_index",
        "q_semdedup_model",
        "q_lm_score_model",
        "q_classifier_score_model",
        "q_curated_funnel_models",
    ):
        t0 = time.monotonic()
        fns[probe](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        builds[probe.replace("q_", "build_for_")] = round(
            time.monotonic() - t0, 3
        )
    _release_dead_blocks(spark)  # warm-up/build leftovers

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    # alternate full passes rather than back-to-back repeats so one
    # query's page-cache/GC state doesn't flatter its own repeat
    for _ in range(n_runs):
        for name in HEADLINE:
            fn = fns[name]
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.monotonic() - t0)
            # between queries (OUTSIDE the timed window): drop the
            # finished query's leftover localCheckpoint blocks. Every
            # cross-query artifact in this harness is a DISK path
            # (built/km_built/tm_built/clf_built hold parquet dirs, the
            # loader never caches), so no later query can read a
            # released block — without the sweep, 118 queries x n_runs
            # accumulate dead blocks that squeeze execution memory and
            # skew LATER queries' timings (the r9 q_semdedup 3.9 ->
            # 5.2 s drift with its file untouched is the suspected
            # symptom; the A/B is recorded in SURVEY §6)
            _release_dead_blocks(spark)
    # NOISY-ROW stabilization (VERDICT r11 #3): rows whose recorded n=3
    # max/min exceeded ~2x across rounds get two extra interleaved
    # passes — their medians are n=5, so a single VM noise phase can't
    # own the reported number. Membership is the r11 spread evidence
    # (q_tokenizer_fertility 6.3-29.2 s, its _model twin 2.5-11.9,
    # q_nn_descent 8.2-10.9); revisit when BENCH_SPREAD shows a row's
    # spread back under 1.5x.
    noisy = [
        n for n in (
            "q_tokenizer_fertility",
            "q_tokenizer_fertility_model",
            "q_nn_descent",
        ) if n in samples
    ]
    for _ in range(2):
        for name in noisy:
            t0 = time.monotonic()
            fns[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(time.monotonic() - t0)
            _release_dead_blocks(spark)
    timings = {
        name: round(statistics.median(ts), 3) for name, ts in samples.items()
    }
    spread = {
        name: {
            "median": timings[name],
            "min": round(min(ts), 3),
            "max": round(max(ts), 3),
            "n": len(ts),
        }
        for name, ts in samples.items()
    }

    total = round(sum(timings.values()), 3)
    # The driver captures only the tail of stdout and parses the LAST
    # JSON line. r03's inline spread map pushed that line past the
    # capture window and the round's headline number was lost
    # (BENCH_r03.json "parsed": null). The spread therefore goes to a
    # side file; stdout gets only the compact headline line, printed
    # LAST.
    # drain throughput extra (VERDICT r03 #9), now at 1/8/64 tenants
    # (VERDICT r04 #8) — near-linear batches/s across tenant counts is
    # the scale-out evidence; plus the listener POST-throughput extra
    # (VERDICT r04 #4). Full detail in the side file, stdout stays lean.
    # MEDIANS of >= 3 runs (VERDICT r10 #5): the query bench has been
    # median-of-n since r4, but drain/POST were single runs — the last
    # numbers that could silently lie inside the measured VM noise
    # phases (the r9->r10 "drift" was exactly this). Each tenant count
    # and the POST path now record min/median/max across runs.
    tput_runs = int(os.environ.get("SPARK_GRAFT_TPUT_RUNS", "3"))

    def _stat3(vals: list[float]) -> dict:
        return {
            "min": round(min(vals), 2),
            "median": round(statistics.median(vals), 2),
            "max": round(max(vals), 2),
        }

    drain = {}
    for nq in (1, 8, 64):
        runs = [
            _drain_throughput(spark, n_queues=nq) for _ in range(tput_runs)
        ]
        drain[str(nq)] = {
            "n_runs": tput_runs,
            "ids_per_s": _stat3([r["ids_per_s"] for r in runs]),
            "batches_per_s": _stat3([r["batches_per_s"] for r in runs]),
            "wall_s": _stat3([r["wall_s"] for r in runs]),
            "drained_batches": runs[0]["drained_batches"],
            "reference_ceiling_ids_per_s": 0.6,
            "runs": runs,
        }
    post_runs = [_post_throughput(spark) for _ in range(tput_runs)]
    posts = {
        "n_runs": tput_runs,
        "posts_per_s": _stat3([r["posts_per_s"] for r in post_runs]),
        "posts": post_runs[0]["posts"],
        "concurrency": post_runs[0]["concurrency"],
        "errors": sum(r["errors"] for r in post_runs),
        "runs": post_runs,
    }
    spread_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SPREAD.json")
    # the one-line build-state sentence SURVEY §8 includes VERBATIM —
    # stamped mechanically so hand-copy drift (r8's 191.5-vs-183.97
    # verdict finding) is structurally impossible
    survey_line = (
        f"bench sf{sf}: {len(timings)} queries, {total:.2f} s total "
        f"(sum of n={n_runs} medians; BENCH_SPREAD.json)"
    )
    with open(spread_path, "w") as f:
        json.dump(
            {
                "sf": sf,
                "n_runs": n_runs,
                "survey_line": survey_line,
                "drain": drain,
                "post_throughput": posts,
                "builds": builds,
                "spread": spread,
            },
            f,
            indent=1,
        )
    # the driver captures only the LAST 2000 chars of stdout (measured
    # from BENCH_r03's "tail" field) — at 67 queries the full-precision
    # line is 1.8 KB and one growth step from being truncated like r03.
    # The stdout line therefore carries 2-decimal timings and no extras;
    # BENCH_SPREAD.json keeps full precision, the spread, and the drain
    # numbers.
    # the driver tail-captures the LAST 2000 stdout chars; at 92+
    # queries a full 2-decimal map overflows that window and the line's
    # JSON prefix would be clipped (the r03 failure mode). Degrade
    # gracefully: 2 decimals -> 1 decimal -> keep only the slowest
    # queries that fit (with an explicit truncation marker); the
    # committed BENCH_SPREAD.json always carries every query at full
    # precision.
    def _line(qmap: dict, extra: dict | None = None) -> str:
        payload = {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "n_queries": len(timings),
            "queries": qmap,
            "sf": sf,
        }
        if extra:
            payload.update(extra)
        return json.dumps(payload, separators=(",", ":"))

    budget = 1900
    line = _line({k: round(v, 2) for k, v in timings.items()})
    if len(line) > budget:
        line = _line({k: round(v, 1) for k, v in timings.items()})
    if len(line) > budget:
        by_cost = sorted(timings.items(), key=lambda kv: -kv[1])
        keep = dict(by_cost)
        while len(keep) > 1:
            line = _line(
                {k: round(v, 1) for k, v in keep.items()},
                {"queries_omitted": len(timings) - len(keep),
                 "full_detail": "BENCH_SPREAD.json"},
            )
            if len(line) <= budget:
                break
            keep.pop(by_cost[len(keep) - 1][0])
    print(line)


if __name__ == "__main__":
    main()
