"""Central registry: query name -> (Spark callable, DuckDB oracle SQL).

``__spark_entry__.py`` re-exports these; each operator module contributes
its own ``*_QUERIES`` / ``*_ORACLES`` dicts. Queries without an oracle
entry get the driver's weaker rows-only check (non-SQL-expressible ops).

The registry is sized to the driver's 50 CORRECTNESS slots (see
README "Correctness"): every registered query gets a hash or rows-only
row each round; operators beyond the cap are hash-checked inside a
sibling query or covered by direct tests.
"""

from __future__ import annotations

import importlib
import warnings
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators.pipeline import PIPELINE_ORACLES, PIPELINE_QUERIES

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# (relative module, queries attr, oracles attr) — registration order is
# the order CORRECTNESS rows appear in.
_OPERATOR_MODULES: list[tuple[str, str, str]] = [
    (".operators.relational", "RELATIONAL_QUERIES", "RELATIONAL_ORACLES"),
    (".operators.relational_ext", "RELATIONAL_EXT_QUERIES", "RELATIONAL_EXT_ORACLES"),
    (".operators.dedup", "DEDUP_QUERIES", "DEDUP_ORACLES"),
    (".operators.similarity", "SIMILARITY_QUERIES", "SIMILARITY_ORACLES"),
    (".operators.text_analysis", "TEXT_QUERIES", "TEXT_ORACLES"),
    (".operators.quality", "QUALITY_QUERIES", "QUALITY_ORACLES"),
    (".operators.contamination", "CONTAMINATION_QUERIES", "CONTAMINATION_ORACLES"),
    (".operators.sampling", "SAMPLING_QUERIES", "SAMPLING_ORACLES"),
    (".operators.monitoring", "MONITORING_QUERIES", "MONITORING_ORACLES"),
    (".operators.packing", "PACKING_QUERIES", "PACKING_ORACLES"),
    (".operators.corpus_pipeline", "CORPUS_QUERIES", "CORPUS_ORACLES"),
    (".operators.timeseries", "TIMESERIES_QUERIES", "TIMESERIES_ORACLES"),
    (".operators.udfs", "UDF_QUERIES", "UDF_ORACLES"),
    (".operators.sketches", "SKETCH_QUERIES", "SKETCH_ORACLES"),
    # Round-8 rotation: DSIR importance-resampling selection (slot
    # funded by q_dedup_spans, whose winner-take-first idiom stays
    # hash-checked inside q_dedup_exact).
    (".operators.dsir", "DSIR_QUERIES", "DSIR_ORACLES"),
    # Round-8 second rotation: interpolated Kneser-Ney bigram LM (slot
    # funded by q_text_analysis, whose windowed top-k idiom stays
    # hash-checked inside the registered q_analytic_funcs);
    # q_doremi_weights rides the sampling dicts (slot funded by
    # q_tpch_q14, whose join+conditional-agg shape stays hash-checked
    # by the registered q3/q5/q17). Both evictions keep driver-grade
    # parity tests.
    (".operators.lm_score", "LM_QUERIES", "LM_ORACLES"),
    (".operators.multimodal", "MULTIMODAL_QUERIES", "MULTIMODAL_ORACLES"),
    # Round-11 rotation (VERDICT r10 #4): the composed crawl-ingest
    # capstone q_crawl_funnel_report (WARC framing -> robots -> extract
    # -> URL dedup, one drop-attribution row per verdict) — slot funded
    # by q_psi_drift, whose registered sibling q_ks_drift keeps the
    # drift family hash-checked; PSI keeps its full oracle on the
    # unregistered surface.
    (".operators.crawl_funnel", "CRAWL_QUERIES", "CRAWL_ORACLES"),
    # Round-13 rotation (VERDICT r12 #3): the sharded kNN build's full
    # SQL-expressible seed prefix q_shard_seed at forced S=4 — slot
    # funded by q_range_join, whose bucketed-interval equi-join idiom
    # stays idiom-checked by the registered q_asof_join; range-join
    # keeps its full oracle on the unregistered surface.
    (".operators.shardknn", "SHARDKNN_QUERIES", "SHARDKNN_ORACLES"),
    (".streaming.live", "STREAMING_QUERIES", "STREAMING_ORACLES"),
]


def _register(queries: dict[str, QueryFn], oracles: dict[str, str]) -> None:
    for name, fn in queries.items():
        assert name not in QUERIES, f"duplicate query name {name}"
        QUERIES[name] = fn
    for name, sql in oracles.items():
        assert name in queries, f"oracle for unregistered query {name}"
        ORACLES[name] = sql


_register(PIPELINE_QUERIES, PIPELINE_ORACLES)


def _optional_modules() -> list[str]:
    """Extend the registry from the operator modules.

    A module that is genuinely ABSENT is skipped with a warning (the
    rest of the registry still loads); anything else — a syntax error,
    a broken transitive import, a missing attr — propagates loudly. The
    old blanket ``except ImportError: pass`` silently shrank
    ``queries()`` on any import-time bug, which the driver would report
    as "queries missing" rather than "module broken" (VERDICT r01 #4).
    """
    skipped: list[str] = []
    for mod_name, q_attr, o_attr in _OPERATOR_MODULES:
        full = __package__ + mod_name
        try:
            mod = importlib.import_module(mod_name, package=__package__)
        except ModuleNotFoundError as exc:
            if exc.name == full:
                warnings.warn(
                    f"operator module {full} absent; its queries are skipped",
                    stacklevel=2,
                )
                skipped.append(full)
                continue
            raise  # a transitive dependency failed to import — not ours to hide
        _register(getattr(mod, q_attr), getattr(mod, o_attr))
    return skipped


_SKIPPED_MODULES = _optional_modules()

# The driver records at most 50 correctness rows; a bigger registry
# silently loses coverage, a smaller one wastes slots. A real exception
# (not an assert — ``python -O`` strips asserts) so a miscounted
# registry fails loudly under every interpreter mode; the check is
# waived only when whole modules were absent (the grace path above
# already warned), so the two degraded-mode behaviors are consistent.
if not _SKIPPED_MODULES and len(QUERIES) != 50:
    raise RuntimeError(f"registry must stay at 50 slots, got {len(QUERIES)}")


# Modules carrying UNREGISTERED_*_QUERIES dicts — the direct-tested API
# surface beyond the 50 driver slots (evicted rotation slots + ops that
# never held one). The CLI resolves these for run/explain/list so every
# query in the repo is operable, not just the registered 50.
_UNREGISTERED_MODULES: list[str] = [
    ".operators.pipeline",
    ".operators.relational",
    ".operators.relational_ext",
    ".operators.dedup",
    ".operators.sampling",
    ".operators.text_analysis",
    ".operators.contamination",
    ".operators.timeseries",
    ".operators.lm_score",
    # r11 rotation: q_psi_drift's slot funds q_crawl_funnel_report
    ".operators.monitoring",
    ".operators.corpus_pipeline",
    ".operators.curated_corpus",
    ".operators.multimodal",
    ".operators.pagerank",
    # r10 rotation: q_kmv_overlap's slot funds q_dedup_substrings
    ".operators.sketches",
    # r10: perceptual-hash image dedup (B120), HTML boilerplate
    # extraction (B121)
    ".operators.phash",
    ".operators.html_extract",
    # r10 second session: URL canonicalization dedup (B123), WARC
    # record framing (B122)
    ".operators.urls",
    ".operators.warc",
    # r10 second session: robots.txt crawl-policy filtering (B124),
    # crawl-ingest funnel capstone (B125)
    ".operators.robots",
    ".operators.crawl_funnel",
    # r10 second session: charset sniffing (B126), z-order layout
    # audit (B127)
    ".operators.charset",
    ".operators.layout",
    # r10 second session: unicode text normalization (B128)
    ".operators.textnorm",
    # r11: robust audio fingerprint dedup (B130)
    ".operators.audiofp",
    # r12: shard-parallel kNN-graph build (VERDICT r11 #1), video
    # content fingerprint dedup (B132, VERDICT r11 #2)
    ".operators.shardknn",
    ".operators.videofp",
]


def unregistered_queries() -> dict[str, QueryFn]:
    """name -> callable for every UNREGISTERED_*_QUERIES entry. Names
    shadowed by a registered query are skipped (the registry wins);
    absent modules are skipped like _optional_modules does."""
    out: dict[str, QueryFn] = {}
    for mod_name in _UNREGISTERED_MODULES:
        full = __package__ + mod_name
        try:
            mod = importlib.import_module(mod_name, package=__package__)
        except ModuleNotFoundError as exc:
            if exc.name == full:
                continue
            raise
        for attr in dir(mod):
            if attr.startswith("UNREGISTERED_") and attr.endswith("_QUERIES"):
                for name, fn in getattr(mod, attr).items():
                    if name not in QUERIES:
                        out.setdefault(name, fn)
    return out
