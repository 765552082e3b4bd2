"""Property-based semantics checks (hypothesis).

The reference's own tests assert chunk boundaries on one 4-id example
and infer priority order from logs (SURVEY.md §5). These properties
check the same semantics over randomized inputs against independent
Python models — including a float-key min-heap that mirrors the
reference's actual ordering arithmetic (`priorityQueue.js:22`:
``rank + created_at/1e14``).

Spark jobs per example are expensive, so examples are few but each
covers many rows; deadline disabled accordingly.
"""

from __future__ import annotations

import heapq

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from data_ingestion_api_system_loop_ai_spark.plans.ranking import (
    global_row_number,
    prefix_agg_over_buckets,
)
from data_ingestion_api_system_loop_ai_spark.streaming.live import chunk_requests

PRIORITIES = ["HIGH", "MEDIUM", "LOW"]
RANK = {"HIGH": 1, "MEDIUM": 2, "LOW": 3}

request_strategy = st.lists(
    st.tuples(
        st.sampled_from(PRIORITIES),
        st.integers(min_value=0, max_value=10**9),  # created_at_ms
        st.lists(st.integers(min_value=1, max_value=10**9 + 7), min_size=1, max_size=11),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[1],  # distinct timestamps: the reference's float
    # key collapses ties arbitrarily, so only tie-free inputs have a
    # well-defined reference order to compare against
)


def _mk_requests_df(spark, reqs):
    rows = [
        (f"r{i}", prio, created, ids) for i, (prio, created, ids) in enumerate(reqs)
    ]
    return spark.createDataFrame(
        rows, "request_id string, priority string, created_at_ms long, ids array<long>"
    )


@settings(max_examples=8, deadline=None)
@given(reqs=request_strategy)
def test_chunking_partitions_ids_in_order(spark, reqs):
    """Chunks are consecutive, ordered, <= 3 ids, and concatenate back to
    the original ids (reference ingestService.js:171-179; golden assert
    tests/api.test.js:131-133 generalized)."""
    df = _mk_requests_df(spark, reqs)
    out = chunk_requests(df).collect()
    by_req: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r["request_id"], r["batch_index"])):
        assert 1 <= len(r["batch_ids"]) <= 3
        by_req.setdefault(r["request_id"], []).append(list(r["batch_ids"]))
    for i, (_, _, ids) in enumerate(reqs):
        chunks = by_req[f"r{i}"]
        assert [x for c in chunks for x in c] == ids
        assert all(len(c) == 3 for c in chunks[:-1])  # only the tail is short


@settings(max_examples=8, deadline=None)
@given(reqs=request_strategy)
def test_drain_order_matches_reference_heap_model(spark, reqs):
    """The engine's total order (priority rank, created_at, tie-breaks)
    reproduces the reference heap's pop sequence, modeled with the exact
    float-key arithmetic of priorityQueue.js:22."""
    df = _mk_requests_df(spark, reqs)
    jobs = chunk_requests(df)
    ranked = global_row_number(
        jobs,
        bucket_keys=["priority_rank", "created_at_ms"],
        order_keys=["request_id", "batch_index"],
        rn_col="rn",
    )
    engine_order = [
        r["batch_id"] for r in sorted(ranked.collect(), key=lambda r: r["rn"])
    ]

    # independent model: the reference's min-heap with key rank + ms/1e14,
    # batches enqueued per request in batch_index order
    heap = []
    seq = 0
    for i, (prio, created, ids) in enumerate(reqs):
        n_batches = (len(ids) + 2) // 3
        for b in range(n_batches):
            key = RANK[prio] + created / 1e14
            # seq preserves enqueue order among equal keys (same request)
            heapq.heappush(heap, (key, seq, f"r{i}-{b}"))
            seq += 1
    model_order = [heapq.heappop(heap)[2] for _ in range(len(heap))]

    assert engine_order == model_order


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 10**6), st.integers(0, 10**9)),
        min_size=1,
        max_size=200,
        unique_by=lambda t: t[2],
    )
)
def test_global_row_number_is_a_permutation_in_sort_order(spark, rows):
    """global_row_number assigns exactly 1..n following the composite
    order, for arbitrary bucket distributions (including all rows in one
    bucket and every row its own bucket)."""
    df = spark.createDataFrame(rows, "b int, c long, u long")
    out = global_row_number(df, ["b", "c"], ["u"], rn_col="rn").collect()
    got = sorted((r["rn"], (r["b"], r["c"], r["u"])) for r in out)
    assert [g[0] for g in got] == list(range(1, len(rows) + 1))
    assert [g[1] for g in got] == sorted((b, c, u) for b, c, u in rows)


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 100_000), st.integers(-(10**6), 10**6)),
        min_size=1,
        max_size=200,
        unique_by=lambda t: t[0],
    ),
    width=st.sampled_from([1, 7, 64, 4096]),
)
def test_prefix_agg_matches_serial_running_max(spark, rows, width):
    """The two-phase bucketed running max equals the serial exclusive
    running max for any bucket width (including width 1 = every row its
    own bucket and widths larger than the key range = one bucket)."""
    df = spark.createDataFrame(rows, "k long, v long")
    out = prefix_agg_over_buckets(
        df, order_key="k", value_col="v", out_col="run_max", bucket_width=width
    ).collect()
    got = {r["k"]: r["run_max"] for r in out}
    best = None
    for k, v in sorted(rows):
        assert got[k] == best
        best = v if best is None else max(best, v)


def _py_span_dedup(texts, k):
    """Pure-Python first-occurrence span dedup (independent reference)."""
    import re

    seen = {}
    spans_by_doc = {}
    for doc_id, text in sorted(texts):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        spans = [
            " ".join(toks[i : i + k]) for i in range(0, len(toks), k)
        ]
        spans_by_doc[doc_id] = spans
        for no, s in enumerate(spans):
            seen.setdefault(s, (doc_id, no))
    out = {}
    for doc_id, spans in spans_by_doc.items():
        kept = [
            s for no, s in enumerate(spans) if seen[s] == (doc_id, no)
        ]
        out[doc_id] = (len(spans), len(kept), " ".join(kept))
    return out


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=120),
        min_size=1,
        max_size=12,
    )
)
def test_span_dedup_matches_python_reference(spark, texts):
    """q_dedup_spans agrees with an independent driver-side model on
    arbitrary tiny-alphabet corpora (high span-collision rate by
    construction — tokens from {a, b, c} make cross-doc duplicate spans
    common, empty docs and short tails included)."""
    import os
    import tempfile

    from data_ingestion_api_system_loop_ai_spark.operators import dedup as dd

    rows = [(i, t) for i, t in enumerate(texts)]
    want = {
        d: v
        for d, v in _py_span_dedup(rows, dd.SPAN_K).items()
        if v[0] > 0  # docs with zero spans drop out of the totals base
    }
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            os.path.join(tmp, "documents.parquet")
        )
        got = {
            r["doc_id"]: (r["n_spans_total"], r["n_spans_kept"], r["dedup_text"])
            for r in dd.q_dedup_spans(spark, tmp).collect()
        }
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6).map(
            lambda w: w  # tiny alphabet -> dense pair collisions
        ),
        min_size=1,
        max_size=12,
    )
)
def test_bpe_matches_python_reference_on_adversarial_corpora(spark, words):
    """Property form of the BPE parity test: on random tiny-alphabet
    corpora (maximal merge-candidate collisions and overlap chains),
    the distributed merge loop reproduces the independent pure-Python
    BPE's merge sequence and final symbol tables exactly."""
    from data_ingestion_api_system_loop_ai_spark.operators import bpe

    from .test_unregistered_ops import _py_bpe_reference

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    wc: dict[str, int] = {}
    for w in words:
        wc[w] = wc.get(w, 0) + 1
    want_merges, want_words = _py_bpe_reference(wc, 8)
    merges, final = bpe.bpe_train(docs, 8)
    assert merges == want_merges
    got = {r["word"]: r["symbols"] for r in final.collect()}
    assert got == {w: syms for w, (syms, _n) in want_words.items()}


@given(
    data=st.binary(min_size=0, max_size=4000),
)
@settings(max_examples=60, deadline=None)
def test_lzw_roundtrip_arbitrary_bytes(data):
    """Property: GIF-flavor LZW decompress(compress(x)) == x for
    arbitrary byte strings — covers empty input, single symbols,
    high-repetition runs the shrinker finds, and code-width
    transitions."""
    from data_ingestion_api_system_loop_ai_spark.operators.multimodal import (
        _lzw_compress,
        lzw_decompress,
    )

    assert lzw_decompress(_lzw_compress(data)) == data


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=30, deadline=None)
def test_png_and_gif_decode_roundtrip_property(w, h, seed):
    """Property: both entropy codecs decode their own encodings to the
    generator's exact pixel checksum at arbitrary geometry/seed."""
    from data_ingestion_api_system_loop_ai_spark.operators.multimodal import (
        _gif_indices,
        _gif_palette,
        _png_pixel_row,
        decode_real,
        encode_gif,
        encode_png,
    )

    d = decode_real(encode_png(w, h, seed))
    assert (d["width"], d["height"]) == (w, h)
    assert d["px_sum"] == sum(sum(_png_pixel_row(w, seed, y)) for y in range(h))

    pal = _gif_palette()
    g = decode_real(encode_gif(w, h, seed))
    assert (g["width"], g["height"]) == (w, h)
    assert g["px_sum"] == sum(sum(pal[i]) for i in _gif_indices(w, h, seed))


@given(
    toks=st.lists(
        st.integers(min_value=1, max_value=500), min_size=1, max_size=60
    ),
    budget_frac=st.integers(min_value=2, max_value=5),
)
@settings(max_examples=40, deadline=None)
def test_budget_select_matches_serial_greedy_model(toks, budget_frac):
    """Property (pure-python model): the two-phase budget_select
    semantics — quality-desc greedy prefix under a token budget — match
    a serial reference on arbitrary score/token multisets. (The Spark
    twin is pinned separately; this guards the MODEL the oracle
    encodes, incl. tie handling by key.)"""
    # deterministic pseudo-scores in [0,1] with collisions
    rows = [
        (i, round(((i * 37) % 7) / 7.0, 6), t) for i, t in enumerate(toks)
    ]
    total = sum(t for _, _, t in rows)
    budget = total // budget_frac
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    cum, selected = 0, set()
    for key, _, t in order:
        cum += t
        if cum <= budget:
            selected.add(key)
    # the selected set is exactly the maximal prefix within budget
    cum2, prefix_ok = 0, True
    for key, _, t in order:
        cum2 += t
        in_prefix = cum2 <= budget
        assert (key in selected) == in_prefix
        if not in_prefix:
            prefix_ok = False
        else:
            assert prefix_ok  # no gaps: once over budget, never back in


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=20, deadline=None)
def test_jpeg_decode_roundtrip_property(w, h, seed):
    """Property: the baseline-JPEG decoder reproduces the independent
    explicit-formula IDCT replay exactly at arbitrary geometry/seed
    (lossy codec — the invariant is coefficient-exact reconstruction,
    not raw-pixel equality)."""
    from data_ingestion_api_system_loop_ai_spark.operators.multimodal import (
        decode_real,
        encode_jpeg,
    )

    from .test_unregistered_ops import _jpeg_replay_px_sum

    d = decode_real(encode_jpeg(w, h, seed))
    assert (d["width"], d["height"]) == (w, h)
    assert d["px_sum"] == _jpeg_replay_px_sum(w, h, seed)


# ---------------------------------------------------------------------------
# Round-8 additions: published-theorem properties for the new operators
# ---------------------------------------------------------------------------

_winnow_tok = st.sampled_from([f"t{i}" for i in range(12)])


@settings(max_examples=6, deadline=None)
@given(
    a_pre=st.lists(_winnow_tok, min_size=0, max_size=10),
    a_post=st.lists(_winnow_tok, min_size=0, max_size=10),
    b_pre=st.lists(_winnow_tok, min_size=0, max_size=10),
    b_post=st.lists(_winnow_tok, min_size=0, max_size=10),
    run_seed=st.integers(min_value=0, max_value=10**6),
    extra=st.integers(min_value=0, max_value=6),
)
def test_winnowing_guarantee_property(
    spark, a_pre, a_post, b_pre, b_post, run_seed, extra
):
    """Schleimer et al. Theorem (guarantee): ANY two documents sharing
    a token run of length >= W + K - 1 share at least one winnowed
    fingerprint — for random surrounding context on both sides and
    random shared-run content/length. (The shared run uses tokens
    disjoint from the context alphabet so the run is genuinely the
    only guaranteed overlap.)"""
    import os
    import tempfile

    from data_ingestion_api_system_loop_ai_spark.operators import dedup as dd

    g = dd.WINNOW_K + dd.WINNOW_W - 1 + extra
    run = [f"shared{run_seed}x{i}" for i in range(g)]
    docs = [
        (1, " ".join(a_pre + run + a_post)),
        (2, " ".join(b_pre + run + b_post)),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
            os.path.join(tmp, "documents.parquet")
        )
        fps = {
            r["doc_id"]: set(r["fps"])
            for r in spark.read.parquet(os.path.join(tmp, "documents.parquet"))
            .select(
                "doc_id", dd._winnow_fps("text").alias("fps")
            )
            .collect()
        }
    assert fps[1] & fps[2], (docs, fps)


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(8)]),
            min_size=2,
            max_size=12,
        ),
        min_size=2,
        max_size=6,
    )
)
def test_kneser_ney_seen_mass_property(spark, texts):
    """Kneser-Ney is a proper probability model: for every context x,
    the probability mass over the SEEN successors is <= 1 (the
    remainder is what backoff redistributes to unseen continuations),
    and every P(y|x) is in (0, 1)."""
    from collections import defaultdict

    from data_ingestion_api_system_loop_ai_spark.operators import lm_score as lm
    from data_ingestion_api_system_loop_ai_spark.operators.collocations import (
        bigram_counts,
    )
    from pyspark.sql import functions as F

    docs = [(i, " ".join(ts)) for i, ts in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bg = bigram_counts(df.select("text"))
    cx, cont, disc = lm.kn_statistics(bg)
    rows = (
        bg.join(cx, "x")
        .join(cont, "y")
        .crossJoin(disc)
        .select(
            "x",
            (
                F.greatest(F.col("c_xy") - F.col("D"), F.lit(0.0))
                / F.col("c_x")
                + (F.col("D") * F.col("n1p_x") / F.col("c_x"))
                * (F.col("n1p_y") / F.col("Nbb"))
            ).alias("p"),
        )
        .collect()
    )
    mass = defaultdict(float)
    for r in rows:
        assert 0.0 < r["p"] < 1.0 or (r["p"] == 1.0), r
        mass[r["x"]] += r["p"]
    for x, m in mass.items():
        assert m <= 1.0 + 1e-9, (x, m)
