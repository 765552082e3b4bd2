"""Scaling-exponent probe (VERDICT r05 #4, extended r08 per r07 #5).

The most expensive bench queries carry explicit cost-shape claims:

- graph family (embeddings table): ~n^1.5 for the kNN cell join
  (sqrt(n)-cell IVF quantizer → ~2·n·sqrt(n) pair evaluations), kNN
  cost + O(diameter) label rounds for CC, ~n·k² per round for
  NN-Descent;
- dedup/funnel family (documents table): near-linear for banded
  MinHash (band-bucket join with LSH_BUCKET_CAP), superlinear but
  candidate-bounded for the AllPairs prefix join (df-sorted prefix
  pruning), and the funnel composition of both plus the linear
  stages.

This tool MEASURES the growth instead of asserting it: it synthesizes
tables at n, 4n, 16n under /tmp (testdata is read-only), runs each
query at every size, and fits the log-log slope.

Synthesis is deterministic (fixed numpy PCG64 seed, encoded in the
cache dir name so edited constants can never silently reuse stale
data — ADVICE r07):

- embeddings: vector i is base vector i % n_base plus N(0, JITTER²)
  noise — jitter keeps copies off the exact-duplicate path (which the
  cell cap would truncate) while preserving the base corpus's cluster
  structure, so cell occupancy scales realistically rather than
  degenerating into one dense cell.
- documents: doc i is base doc i % n_base with each token replaced by
  a random base-vocabulary token with probability TOKEN_JITTER —
  copies stay off the exact-sha path but remain shingle-similar to
  their base doc, so shingle/band/prefix occupancy scales like a real
  crawl (near-dup families grow with n) instead of collapsing into
  exact-dup groups or diverging into all-distinct noise.

Usage:  python tools/scaling_probe.py [--reps 3] [--out SCALING.json]
        [--queries q_knn_graph,...]
Merges into the JSON file if it exists: per-query [n, median_sec]
points + fitted exponent; the SURVEY §6 table is transcribed from this
output.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EMB_BASE = "/root/testdata/sf0.1/embeddings.parquet"
DOC_BASE = "/root/testdata/sf0.01/documents.parquet"
WORK = "/tmp/spark_graft_scaling"
SEED = 20260814
JITTER = 0.05
TOKEN_JITTER = 0.15

DOC_QUERIES = {
    "q_dedup_minhash_banded",
    "q_dedup_prefix",
    "q_corpus_funnel",
    # LM family (round 8): one corpus pass + vocabulary-bounded
    # derivations each — claimed near-linear
    "q_kn_score",
    "q_doremi_weights",
    # ExactSubstr stride-1 window audit (round 9, VERDICT r08 #2):
    # ~n_tokens exploded rows/doc; the r9 restructure replaced the
    # per-hash Window with groupBy+join so hot boilerplate hashes
    # combine map-side
    "q_dedup_substrings",
    # iterative CC over the MinHash near-dup pairs (round 10,
    # VERDICT r09 #5): O(rounds x (join+agg)) by design
    "q_dedup_components",
    # ingest trio + boilerplate removal (round 10 third session,
    # B121-B124): per-doc projections / bounded joins — claimed linear
    "q_html_extract",
    "q_url_dedup",
    "q_warc_pipeline",
    "q_robots_filter",
    "q_crawl_funnel_report",
    "q_charset_sniff",
    "q_text_normalize",
    # robust audio fingerprint dedup (round 11, B130): mapInPandas
    # synth+fingerprint per doc (the narrow stage), hash groupBy,
    # banded pairs over DISTINCT hashes — claimed linear
    "q_audio_dedup",
}
# Skew variants: same query fns, but the synthesized corpus plants a
# shared boilerplate paragraph into BOILER_FRAC of the docs — the
# hot-window-hash case the r9 restructure of q_dedup_substrings exists
# for. Probed beside the jittered corpus so the skew penalty is a
# measured ratio, not an assertion.
SKEW_QUERIES = {"q_dedup_substrings_skew": "q_dedup_substrings"}
BOILER_FRAC = 0.3
BOILER_TOKENS = 60
EVENT_QUERIES = {"q_ts_similarity"}
EVT_BASE = "/root/testdata/sf0.01/events.parquet"


def synth_dir(n: int) -> str:
    """Materialize an sf-style dir with an n-row embeddings.parquet.
    The seed/jitter are part of the cache key: editing them invalidates
    the cached synthesis instead of silently reusing it."""
    d = os.path.join(WORK, f"n{n}_s{SEED}_j{JITTER}")
    out = os.path.join(d, "embeddings.parquet")
    if os.path.exists(out):
        return d
    os.makedirs(d, exist_ok=True)
    base = pq.read_table(EMB_BASE)
    emb = np.array(base.column("embedding").to_pylist(), dtype=np.float64)
    labels = np.array(base.column("label").to_pylist())
    nb, dim = emb.shape
    rng = np.random.Generator(np.random.PCG64(SEED))
    reps = math.ceil(n / nb)
    tiled = np.tile(emb, (reps, 1))[:n]
    noise = rng.normal(0.0, JITTER, size=(n, dim))
    noise[:nb] = 0.0  # the first copy IS the base corpus
    vecs = (tiled + noise).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.tolist()], type=pa.list_(pa.float32())
            ),
            "label": pa.array(
                np.tile(labels, reps)[:n].tolist(), type=pa.int32()
            ),
        }
    )
    pq.write_table(tbl, out)
    return d


def synth_docs_dir(n: int) -> str:
    """Materialize an sf-style dir with an n-row documents.parquet:
    base docs tiled with token-level jitter (see module docstring)."""
    d = os.path.join(WORK, f"docs_n{n}_s{SEED}_p{TOKEN_JITTER}")
    out = os.path.join(d, "documents.parquet")
    if os.path.exists(out):
        return d
    os.makedirs(d, exist_ok=True)
    base = pq.read_table(DOC_BASE)
    texts = base.column("text").to_pylist()
    langs = base.column("lang").to_pylist()
    sources = base.column("source").to_pylist()
    nb = len(texts)
    vocab = sorted({t for s in texts for t in s.split()})
    rng = np.random.Generator(np.random.PCG64(SEED))
    new_texts, new_langs, new_sources = [], [], []
    for i in range(n):
        b = i % nb
        toks = texts[b].split()
        if i >= nb and toks:  # the first copy IS the base corpus
            mask = rng.random(len(toks)) < TOKEN_JITTER
            draws = rng.integers(0, len(vocab), size=int(mask.sum()))
            j = 0
            for k, hit in enumerate(mask):
                if hit:
                    toks[k] = vocab[draws[j]]
                    j += 1
        new_texts.append(" ".join(toks))
        new_langs.append(langs[b])
        new_sources.append(sources[b])
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(new_texts, type=pa.string()),
            "lang": pa.array(new_langs, type=pa.string()),
            "source": pa.array(new_sources, type=pa.string()),
            "n_chars": pa.array(
                [len(t) for t in new_texts], type=pa.int64()
            ),
        }
    )
    pq.write_table(tbl, out)
    return d


def synth_docs_skew_dir(n: int) -> str:
    """The jittered doc corpus with a PLANTED boilerplate paragraph:
    the same BOILER_TOKENS-token span appended to BOILER_FRAC of the
    docs, so its stride-1 window hashes are corpus-hot keys growing
    linearly with n (the license-header / nav-bar shape of real
    crawls)."""
    d = os.path.join(
        WORK, f"docsk_n{n}_s{SEED}_p{TOKEN_JITTER}_b{BOILER_FRAC}"
    )
    out = os.path.join(d, "documents.parquet")
    if os.path.exists(out):
        return d
    base_dir = synth_docs_dir(n)
    base = pq.read_table(os.path.join(base_dir, "documents.parquet"))
    texts = base.column("text").to_pylist()
    boiler = " ".join(f"boilerplate{i}" for i in range(BOILER_TOKENS))
    step = max(1, int(1 / BOILER_FRAC))
    new_texts = [
        (t + " " + boiler) if i % step == 0 else t
        for i, t in enumerate(texts)
    ]
    os.makedirs(d, exist_ok=True)
    tbl = pa.table(
        {
            "doc_id": base.column("doc_id"),
            "text": pa.array(new_texts, type=pa.string()),
            "lang": base.column("lang"),
            "source": base.column("source"),
            "n_chars": pa.array(
                [len(t) for t in new_texts], type=pa.int64()
            ),
        }
    )
    pq.write_table(tbl, out)
    return d


def synth_events_dir(n: int) -> str:
    """Materialize an sf-style dir with an n-row events.parquet: base
    events tiled with FRESH USER IDS per copy (user_id + copy *
    (max_user+1)) and value jitter — the series population grows with n
    over a fixed day span, so SAX-bucket occupancy scales like a real
    user base (more curves per seasonality shape) rather than deepening
    a fixed set of series."""
    d = os.path.join(WORK, f"evt_n{n}_s{SEED}_j{JITTER}")
    out = os.path.join(d, "events.parquet")
    if os.path.exists(out):
        return d
    os.makedirs(d, exist_ok=True)
    base = pq.read_table(EVT_BASE)
    ts = base.column("ts").to_pylist()
    users = np.array(base.column("user_id").to_pylist(), dtype=np.int64)
    etypes = base.column("event_type").to_pylist()
    vals = np.array(base.column("value").to_pylist(), dtype=np.float64)
    nb = len(ts)
    stride = int(users.max()) + 1
    rng = np.random.Generator(np.random.PCG64(SEED))
    reps = math.ceil(n / nb)
    idx = np.tile(np.arange(nb), reps)[:n]
    copy = np.repeat(np.arange(reps), nb)[:n]
    new_vals = vals[idx] * (1.0 + JITTER * rng.standard_normal(n))
    new_vals[:nb] = vals[:nb]  # the first copy IS the base corpus
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array([ts[i] for i in idx]),
            "user_id": pa.array(
                (users[idx] + copy * stride).tolist(), type=pa.int64()
            ),
            "event_type": pa.array([etypes[i] for i in idx]),
            "value": pa.array(np.round(new_vals, 2).tolist(),
                              type=pa.float64()),
            "props": pa.array(["{}"] * n, type=pa.string()),
        }
    )
    pq.write_table(tbl, out)
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="SCALING.json")
    ap.add_argument("--sizes", default="2000,8000,32000")
    ap.add_argument(
        "--docs-sizes",
        default="5000,20000,80000",
        help="sizes for the documents-table family",
    )
    ap.add_argument(
        "--events-sizes",
        default="10000,40000,160000",
        help="sizes for the events-table family",
    )
    ap.add_argument(
        "--queries",
        default="q_knn_graph,q_embedding_clusters,q_nn_descent",
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    doc_sizes = [int(s) for s in args.docs_sizes.split(",")]
    evt_sizes = [int(s) for s in args.events_sizes.split(",")]

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from data_ingestion_api_system_loop_ai_spark.operators.components import (
        q_dedup_components,
        q_embedding_clusters,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.kmeans import q_kmeans
    from data_ingestion_api_system_loop_ai_spark.operators.pagerank import (
        q_pagerank,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.corpus_pipeline import (
        q_corpus_funnel,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.dedup import (
        q_dedup_minhash_banded,
        q_dedup_prefix,
        q_dedup_substrings,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.nndescent import (
        q_knn_graph_budgeted,
        q_nn_descent,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.similarity import (
        q_knn_graph,
    )
    from data_ingestion_api_system_loop_ai_spark.session import get_spark

    from data_ingestion_api_system_loop_ai_spark.operators.lm_score import q_kn_score
    from data_ingestion_api_system_loop_ai_spark.operators.sampling import (
        q_doremi_weights,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.timeseries import (
        UNREGISTERED_TIMESERIES_QUERIES,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.html_extract import (
        q_html_extract,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.robots import (
        q_robots_filter,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.urls import (
        q_url_dedup,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.warc import (
        q_warc_pipeline,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.charset import (
        q_charset_sniff,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.crawl_funnel import (
        q_crawl_funnel_report,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.textnorm import (
        q_text_normalize,
    )
    from data_ingestion_api_system_loop_ai_spark.operators.audiofp import (
        q_audio_dedup,
    )

    # the stored-edges read path (VERDICT r10 #1): builds the ANN index
    # ONCE per size (lazily, on the first rep — the median of >= 3 reps
    # therefore times the query-only reps), then times read_knn_edges.
    # The gap between this family and q_knn_graph_budgeted IS the
    # build/probe split's payoff for every graph consumer.
    import tempfile as _tf

    from data_ingestion_api_system_loop_ai_spark.operators import (
        ann_index as _ai,
    )

    _edge_ix: dict = {}

    def q_knn_graph_read(spark, sf_dir):
        if sf_dir not in _edge_ix:
            p = os.path.join(
                _tf.mkdtemp(prefix="scaling_edge_ix_"), "ix"
            )
            _ai.build_ann_index(spark, sf_dir, p)
            _edge_ix[sf_dir] = p
        return _ai.q_knn_graph_budgeted_from_index(
            spark, sf_dir, _edge_ix[sf_dir]
        )

    qfns = {
        "q_knn_graph": q_knn_graph,
        "q_knn_graph_budgeted": q_knn_graph_budgeted,
        "q_knn_graph_read": q_knn_graph_read,
        "q_embedding_clusters": q_embedding_clusters,
        "q_nn_descent": q_nn_descent,
        "q_pagerank": q_pagerank,
        "q_kmeans": q_kmeans,
        "q_dedup_components": q_dedup_components,
        "q_dedup_minhash_banded": q_dedup_minhash_banded,
        "q_dedup_prefix": q_dedup_prefix,
        "q_corpus_funnel": q_corpus_funnel,
        "q_kn_score": q_kn_score,
        "q_doremi_weights": q_doremi_weights,
        "q_ts_similarity": UNREGISTERED_TIMESERIES_QUERIES["q_ts_similarity"],
        "q_dedup_substrings": q_dedup_substrings,
        "q_dedup_substrings_skew": q_dedup_substrings,
        "q_html_extract": q_html_extract,
        "q_url_dedup": q_url_dedup,
        "q_warc_pipeline": q_warc_pipeline,
        "q_robots_filter": q_robots_filter,
        "q_crawl_funnel_report": q_crawl_funnel_report,
        "q_charset_sniff": q_charset_sniff,
        "q_text_normalize": q_text_normalize,
        "q_audio_dedup": q_audio_dedup,
    }
    names = [q.strip() for q in args.queries.split(",")]

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("scaling-probe", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    result: dict = {
        "seed": SEED,
        "jitter": JITTER,
        "token_jitter": TOKEN_JITTER,
        "reps": args.reps,
        "cpus": cpus,
        # r9+: timings force full materialization through the noop
        # sink; earlier rows used .count(), which under-measures any
        # query whose tail Catalyst can prune
        "harness": "noop_write",
        "queries": {},
    }
    if os.path.exists(args.out):  # merge: families are probed in
        with open(args.out) as f:  # separate runs
            prev = json.load(f)
        result["queries"].update(prev.get("queries", {}))
        # preserve sibling sections other tools own (e.g.
        # knn_budget_probe's recall block, the NND curve) — a timing
        # re-probe must never erase measured evidence (round 10: a
        # probe rewrite silently dropped knn_graph_budgeted_recall)
        for key, val in prev.items():
            if key not in result:
                result[key] = val
    for qname in names:
        fn = qfns[qname]
        if qname in SKEW_QUERIES:
            fam_sizes, mk = doc_sizes, synth_docs_skew_dir
        elif qname in DOC_QUERIES:
            fam_sizes, mk = doc_sizes, synth_docs_dir
        elif qname in EVENT_QUERIES:
            fam_sizes, mk = evt_sizes, synth_events_dir
        else:
            fam_sizes, mk = sizes, synth_dir
        fam_dirs = {n: mk(n) for n in fam_sizes}
        points = []
        for n in fam_sizes:
            times = []
            for _ in range(args.reps):
                t0 = time.monotonic()
                # noop WRITE, never .count(): count() lets Catalyst
                # eliminate prunable tails — e.g. q_dedup_substrings'
                # final LEFT join against a unique-keyed aggregate is
                # REMOVED entirely when no right-side column is
                # referenced, so count() timed an empty pipeline
                # (caught round 9: 1.28M docs "ran" in 0.5 s). The
                # noop sink materializes every output column, same as
                # bench.py.
                df = fn(spark, fam_dirs[n])
                df.write.format("noop").mode("overwrite").save()
                times.append(time.monotonic() - t0)
                # measurement isolation (round 10): drop the finished
                # rep's localCheckpoint leftovers OUTSIDE the timed
                # window — nothing crosses reps except disk inputs.
                # Without release (neither in the operators nor here) a
                # multi-size session accumulates dead blocks that
                # inflate later (= larger) sizes: q_knn_graph_budgeted
                # at 128k measured a 232 s median before the
                # plans/lifecycle work vs 66 s after (same algorithm);
                # this sweep catches what operators do not own (their
                # returned relation's final checkpoint)
                from data_ingestion_api_system_loop_ai_spark.plans.lifecycle import (
                    release_all_persistent,
                )

                release_all_persistent(spark)
            med = sorted(times)[len(times) // 2]
            points.append([n, round(med, 3)])
            print(f"{qname} n={n}: median {med:.2f}s "
                  f"(min {min(times):.2f})", flush=True)
        # Point-merge (round 9): a re-probe of a SUBSET of sizes (e.g.
        # adding one expensive top octave with --sizes 128000) keeps
        # the existing points for the other sizes and refits over the
        # union — fresh timings win on collision. The harness is
        # recorded PER ENTRY (ADVICE r09): prior points measured under
        # a different harness (e.g. the pre-r9 count() timings) are
        # DROPPED before merging, never mixed into one fitted curve.
        prev_entry = result["queries"].get(qname, {})
        prior = (
            prev_entry.get("points", [])
            if prev_entry.get("harness") == result["harness"]
            else []
        )
        by_n = {p[0]: p[1] for p in prior}
        by_n.update({p[0]: p[1] for p in points})
        points = [[n, by_n[n]] for n in sorted(by_n)]
        # least-squares slope in log-log space (needs >= 2 sizes)
        slope = None
        if len(points) >= 2:
            xs = [math.log(p[0]) for p in points]
            ys = [math.log(p[1]) for p in points]
            mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
            slope = round(
                sum((x - mx) * (y - my) for x, y in zip(xs, ys))
                / sum((x - mx) ** 2 for x in xs),
                3,
            )
            print(f"{qname}: fitted exponent {slope}", flush=True)
        result["queries"][qname] = {
            "points": points,
            "exponent": slope,
            "harness": result["harness"],
        }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
