"""Sequence packing for LLM training-data pipelines.

A training run consumes fixed-length token sequences, but a corpus is
variable-length documents. The standard remedy (the GPT/T5 data
pipeline's "concat and chunk") is: order the documents, lay their
tokens end to end, and cut the stream every ``PACK_BUDGET`` tokens —
no padding waste, documents may span a cut (the loader masks attention
across the seam). This module computes that layout as a DataFrame: for
every document, which pack it starts in, at which offset, and whether
it crosses a pack boundary. A data loader can then assemble pack ``p``
by reading exactly the docs with ``pack_seq in (p-1, p)`` — no
second pass over the text.

Scale design (the reason this is NOT a global sort + single window):

- Documents are hash-sharded by an engine-portable md5 slot (same
  construction as ``operators/sampling.py`` and the MinHash family, so
  any engine reproduces the layout bit-for-bit). Each shard is an
  independent token stream with its own running offset — the window
  below partitions by ``shard``, so a 1000-executor cluster runs 1000+
  windows in parallel and the only shuffle is the hash exchange into
  shards. A single global stream would serialize 100 TB through one
  running-sum partition.
- Within a shard the order is ``doc_id`` — deterministic and stable
  under corpus growth *within* a snapshot (packing is per-corpus-
  version by nature: inserting a document necessarily re-cuts the
  stream after it, which is why real pipelines pack once per training
  data release).
- The running sum is a streaming frame (``rows unbounded preceding``)
  — Spark evaluates it in one pass per shard without materializing
  the frame.

The reference has no training surface (it is an ingestion API); this
module belongs to the mandated LLM-pipeline extension tier, next to
``operators/sampling.py``'s split assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.text import sql_tokens, tokenize
from ..sources.loader import load_table

# Test-scale constants; at cluster scale NSHARDS tracks executor count
# (each shard is one loader worker's stream) and PACK_BUDGET is the
# model's sequence length.
NSHARDS = 8
PACK_BUDGET = 512


def portable_shard(key: Column, nshards: int) -> Column:
    """Engine-portable shard in [0, nshards): first 8 md5 hex chars of
    the key's string form, as an integer, mod the shard count. DuckDB
    twin: ``('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT %
    nshards``."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
        % nshards
    )


def pack_assignments(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int = PACK_BUDGET,
    nshards: int = NSHARDS,
    order_col: str | None = None,
    carry_cols: bool = False,
) -> DataFrame:
    """Concat-and-chunk layout over any (key, token_count) relation.

    Returns one row per input row (empty rows — zero tokens — are
    dropped; they contribute nothing to the stream) with:

    - ``shard``         hash shard = independent token stream
    - ``seq_in_shard``  position of the doc within its stream
    - ``start_off``     first-token offset of the doc in the stream
    - ``pack_seq``      the pack (chunk of ``budget`` tokens) the doc
                        STARTS in, numbered per shard
    - ``crosses_boundary``  true when the doc's tokens span a pack cut
                        (the loader masks attention across it)

    One shuffle (hash into shards), one streaming window per shard.

    ``order_col`` sets the within-shard token-stream order (ties broken
    by ``key_col``); default is ``key_col`` itself. A corpus shuffle
    stage MUST pass its shuffle rank here (ADVICE r04): ordering by key
    would pack consecutive doc_ids adjacently, partially preserving
    the source/crawl locality the shuffle exists to break.

    ``carry_cols=True`` passes every OTHER input column through the
    pack windows, so a caller that wants the layout alongside its row
    payload gets it in ONE pass — without it the caller must self-join
    the layout back on ``key_col``, which recomputes the entire
    upstream plan a second time (the corpus funnel's original shape:
    measured 2x the whole dedup+quality+decontam pipeline at sf0.1).
    """
    key, toks = F.col(key_col), F.col(tokens_col)
    order = [order_col, key_col] if order_col else [key_col]
    carry = (
        [c for c in df.columns if c not in (key_col, tokens_col, order_col)]
        if carry_cols
        else []
    )
    sharded = df.filter(toks > 0).select(
        key_col,
        *([order_col] if order_col else []),
        *carry,
        toks.cast("long").alias("n_tokens"),
        portable_shard(key, nshards).alias("shard"),
    )
    w = W.partitionBy("shard").orderBy(*order)
    run = (
        W.partitionBy("shard")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_tokens").over(run)
    start = (cum - F.col("n_tokens")).alias("start_off")
    return sharded.select(
        key_col,
        *([order_col] if order_col and carry_cols else []),
        *carry,
        "shard",
        F.row_number().over(w).cast("long").alias("seq_in_shard"),
        "n_tokens",
        start,
        F.floor((cum - F.col("n_tokens")) / budget).cast("long").alias("pack_seq"),
        (F.floor((cum - 1) / budget) != F.floor((cum - F.col("n_tokens")) / budget))
        .alias("crosses_boundary"),
    )


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pack the ``documents`` corpus: tokenize (the portable
    word tokenizer shared with the text-analysis family), then lay out
    each shard's token stream into ``PACK_BUDGET``-token packs."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokenize(F.col("text"))).alias("n_toks")
    )
    return pack_assignments(docs, "doc_id", "n_toks")


PACKING_QUERIES = {
    "q_sequence_pack": q_sequence_pack,
}

PACKING_ORACLES = {
    "q_sequence_pack": f"""
WITH toks AS (
  SELECT doc_id,
         CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {NSHARDS} AS BIGINT) AS shard
  FROM documents
  WHERE len({sql_tokens('text')}) > 0
), laid AS (
  SELECT doc_id, shard, n_tokens,
         CAST(row_number() OVER w AS BIGINT) AS seq_in_shard,
         CAST(sum(n_tokens) OVER w AS BIGINT) AS cum
  FROM toks
  WINDOW w AS (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT doc_id, shard, seq_in_shard, n_tokens,
       cum - n_tokens AS start_off,
       (cum - n_tokens) // {PACK_BUDGET} AS pack_seq,
       ((cum - 1) // {PACK_BUDGET}) <> ((cum - n_tokens) // {PACK_BUDGET})
         AS crosses_boundary
FROM laid
""",
}


# ---------------------------------------------------------------------------
# Overlapping token-window chunking — the OTHER document-splitting
# discipline next to concat-and-chunk: retrieval corpora and
# long-context eval sets split each document into fixed windows with a
# stride overlap (context is preserved across cut points; every token
# appears in >= 1 chunk). Pure per-row array math — explode bounded by
# n/stride chunks per doc, ZERO shuffles, the whole operator is one
# projection over the scan.
# ---------------------------------------------------------------------------

CHUNK_WINDOW = 64
CHUNK_STRIDE = 48


def chunk_overlap(
    df: DataFrame,
    key_col: str,
    text_col: str,
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """(key, chunk_id, start_tok, n_chunk_tokens, chunk_text): token
    windows of ``window`` tokens every ``stride`` (trailing partial
    window kept — every token lands in at least one chunk; a doc
    shorter than one window is one chunk)."""
    toks = tokenize(F.col(text_col))
    d = df.select(
        key_col, toks.alias("_toks"), F.size(toks).alias("_n")
    ).filter(F.col("_n") > 0)
    n_chunks = (
        F.floor(
            (F.greatest(F.col("_n") - window, F.lit(0)) + stride - 1)
            / stride
        )
        + 1
    ).cast("int")
    d = d.withColumn(
        "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1))
    ).withColumn("start_tok", (F.col("chunk_id") * stride).cast("long"))
    piece = F.slice(F.col("_toks"), F.col("start_tok") + 1, window)
    return d.select(
        key_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "start_tok",
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunking of ``documents`` (64-token windows,
    stride 48). (Unregistered — 50-slot cap; driver-grade DuckDB
    parity + coverage/overlap invariants in
    tests/test_unregistered_ops.py.)"""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_overlap(docs, "doc_id", "text")


CHUNK_OVERLAP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens('text')} AS t FROM documents
),
d AS (
  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n
  FROM toks WHERE len(t) > 0
),
chunks AS (
  SELECT doc_id, t, n,
         unnest(range(0,
           (greatest(n - {CHUNK_WINDOW}, 0) + {CHUNK_STRIDE} - 1)
             // {CHUNK_STRIDE} + 1)) AS chunk_id
  FROM d
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(chunk_id * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
       CAST(len(list_slice(t, chunk_id * {CHUNK_STRIDE} + 1,
                           least(chunk_id * {CHUNK_STRIDE} + {CHUNK_WINDOW},
                                 n))) AS BIGINT) AS n_chunk_tokens,
       array_to_string(
         list_slice(t, chunk_id * {CHUNK_STRIDE} + 1,
                    least(chunk_id * {CHUNK_STRIDE} + {CHUNK_WINDOW}, n)),
         ' ') AS chunk_text
FROM chunks
"""
