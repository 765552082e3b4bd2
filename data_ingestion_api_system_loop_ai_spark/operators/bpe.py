"""Distributed BPE tokenizer training over the ``documents`` table —
the vocabulary-building stage of an LLM data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

The algorithm alternates (count adjacent symbol pairs) / (merge the
most frequent pair), so like PageRank / connected components / k-means
it is iterative and NON-SQL-EXPRESSIBLE at fixed depth. The Spark shape
keeps every round distributed and driver-light:

- The corpus collapses ONCE to the distinct-word relation
  ``(word_symbols array<string>, n)`` — at 100 TB the distinct-word
  table is orders of magnitude smaller than the corpus and the collapse
  is one map-side-combinable groupBy. Every later round touches only
  this relation; the corpus is never rescanned.
- Pair counting: per word, ``zip_with(symbols, tail)`` builds adjacent
  pairs in-row (weighted by the word count), then one hash aggregate;
  the winning pair comes back as ONE driver row per round (max count,
  ties to the lexicographically smallest pair — deterministic).
- Merging: a left-to-right greedy fold (``F.aggregate``) over each
  symbol array — map-only, no shuffle, whole-stage codegen. The fold's
  accumulator semantics give the standard BPE behaviour on overlapping
  occurrences ("aaaa" + merge (a,a) -> "aa","aa", not "aa","a","a"):
  a just-merged symbol never re-merges with the next raw symbol in the
  same pass.
- ``localCheckpoint`` each round caps plan depth at O(1), the same
  lineage discipline as the other iterative operators.

End-of-word marker: the classic ``</w>`` suffix on each word's last
character, so learned subwords distinguish "low" from "lower"'s prefix.
The marker uses characters the tokenizer (lowercase [a-z0-9]+) can
never produce, so no collision with real symbols is possible.

Reference parity: none — the reference (412 LoC Express ingestion API)
has no text surface; this is BASELINE.json north-star tier. Correctness
is a direct test against an independent pure-Python BPE implementation
on the same corpus (tests/test_unregistered_ops.py), word-count parity
for the collapse stage, and a greedy-fold property test on adversarial
overlap words.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokenize
from ..sources.loader import load_table

BPE_MERGES = 24
EOW = "</w>"


def word_counts(docs: DataFrame) -> DataFrame:
    """Collapse the corpus to ``(word, n)`` — the only corpus-wide scan
    BPE training performs. Map-side combinable; key balance is the
    Zipf distribution itself, which is fine for a count-only shuffle
    (one long per key, no payload)."""
    return (
        docs.select(F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _initial_symbols(word: Column) -> Column:
    """Split a word into single-character symbols, the last one
    suffixed with the end-of-word marker."""
    # Spark's split-by-empty-pattern may emit a trailing "" depending
    # on version; filter keeps the char list exact on all of them
    chars = F.filter(F.split(word, ""), lambda c: c != F.lit(""))
    last = F.size(chars)
    return F.transform(
        chars,
        lambda c, i: F.when(i == last - 1, F.concat(c, F.lit(EOW))).otherwise(c),
    )


def _merge_expr(symbols: Column, left: str, right: str) -> Column:
    """Left-to-right greedy merge of adjacent (left, right) into
    left+right — the fold form: the accumulator's last element is only
    eligible if it was NOT produced by this pass's previous merge,
    which the fold guarantees because the merged symbol ``left+right``
    differs from ``left`` (symbols are non-empty, so left+right is
    strictly longer)."""
    la, lb, m = F.lit(left), F.lit(right), F.lit(left + right)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (x == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(m)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(left, right, cnt): adjacent symbol pairs weighted by word
    frequency. Pairs are built in-row (zip_with against the tail —
    no explode of the corpus, only of the distinct-word relation),
    then partially aggregated map-side."""
    pairs = F.zip_with(
        F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
        F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        words.filter(F.size("symbols") >= 2)
        .select(F.explode(pairs).alias("p"), "n")
        .groupBy("p.left", "p.right")
        .agg(F.sum("n").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame, n_merges: int = BPE_MERGES
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from ``docs`` (needs a ``text``
    column). Returns (merges, words) where merges is the ordered list
    of (left, right, pair_count) and words is the final distinct-word
    relation ``(word, symbols, n)`` after all merges.

    Driver traffic: exactly one 3-field row per round. Rounds with no
    remaining pair (tiny corpora) stop early."""
    from ..plans.lifecycle import local_checkpoint_handle

    words, release_words = local_checkpoint_handle(
        word_counts(docs)
        .select("word", _initial_symbols(F.col("word")).alias("symbols"), "n"),
        eager=False,
    )
    # checkpoint LIFECYCLE (r14, §5): the loop chains one checkpoint
    # generation per merge; without releases all n_merges+1 generations
    # of the vocabulary relation stay pinned until the harness sweep —
    # at corpus scale that is ~25x the distinct-word relation held for
    # nothing. Generation g-1's blocks feed PENDING generation g's
    # plan, so g-1 is released only after the NEXT round's collect has
    # materialized g; the loop therefore holds at most TWO generations,
    # and the last two stay alive at return (the returned ``words`` may
    # still be pending — its parent must survive until a caller
    # materializes it; a released local checkpoint cannot recompute).
    release_parent = None
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        # LAZY checkpoints (r13): each round's top-pair collect is the
        # only action — it materializes the pending merge checkpoint it
        # reads. The eager form launched a second full job per merge
        # (48 jobs for 24 merges) over the same Zipf-bounded relation.
        top = (
            _pair_counts(words)
            .orderBy(F.col("cnt").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        # the collect materialized the current generation: its
        # grandparent (superseded last round) is now unreachable
        if release_parent is not None:
            release_parent()
        if not top:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], top[0]["cnt"]
        merges.append((left, right, int(cnt)))
        new_words, new_release = local_checkpoint_handle(
            words.withColumn(
                "symbols", _merge_expr(F.col("symbols"), left, right)
            ),
            eager=False,
        )
        release_parent, words, release_words = (
            release_words, new_words, new_release
        )
    return merges, words


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Apply a learned merge list to ``docs`` (must carry ``doc_id``):
    adds a ``bpe_tokens`` array column (per-document subword sequence,
    end-of-word markers kept).

    DICTIONARY ENCODING (round 8 — replaced the whole-document fold):
    a learned merge can never cross a word boundary, because a pair
    whose LEFT symbol contains the ``</w>`` marker is unlearnable —
    marker symbols are word-final in every training word, so they never
    have a right neighbor in ``_pair_counts``. Encoding is therefore
    per-word, and the merge folds run over the DISTINCT-WORD relation
    (Zipf-bounded; symbol arrays are word-length-short, where the
    fold's O(len^2) accumulator copying is constant-bounded) instead of
    the flattened document arrays, where the same fold was O(doc_len^2)
    per merge — measured 180 s -> ~8 s for the sf0.1 corpus encode. The
    corpus then dictionary-joins the BROADCAST word->symbols relation
    on its position-exploded words and regroups per doc (sort by
    position, flatten): the published tokenizer-deployment shape —
    vocabulary work once, per-token lookup after."""
    word_syms = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("word"))
        .distinct()
        .select("word", _initial_symbols(F.col("word")).alias("symbols"))
    )
    for i, (left, right, _cnt) in enumerate(merges):
        word_syms = word_syms.withColumn(
            "symbols", _merge_expr(F.col("symbols"), left, right)
        )
        if (i + 1) % 8 == 0:
            word_syms = word_syms.localCheckpoint(eager=False)
    word_syms = word_syms.localCheckpoint(eager=False)

    per_tok = docs.select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("pos", "word")
    )
    encoded = (
        per_tok.join(F.broadcast(word_syms), "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "symbols"))
                    ),
                    lambda s: s["symbols"],
                )
            ).alias("bpe_tokens")
        )
    )
    return docs.join(encoded, "doc_id", "left").withColumn(
        "bpe_tokens",
        F.coalesce(F.col("bpe_tokens"), F.array().cast("array<string>")),
    )


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge table learned from ``documents``: (rank, left, right,
    pair_count). (Unregistered, NON-SQL-EXPRESSIBLE — the merge loop
    cannot be written at fixed SQL depth; direct tests pin the merge
    sequence against an independent pure-Python BPE on the identical
    word counts, plus vocabulary/compression invariants.)"""
    docs = load_table(spark, sf_dir, "documents")
    merges, _words = bpe_train(docs)
    return spark.createDataFrame(
        [(i, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "rank int, left string, right string, pair_count long",
    )


def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final subword vocabulary after training: (symbol, n_words,
    total_occurrences), descending by total occurrences. The symbol
    inventory every downstream token-budget estimate consumes."""
    docs = load_table(spark, sf_dir, "documents")
    _merges, words = bpe_train(docs)
    return (
        words.select(F.explode("symbols").alias("symbol"), "n")
        .groupBy("symbol")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n").alias("total_occurrences"),
        )
        .orderBy(F.col("total_occurrences").desc(), F.col("symbol"))
    )


# ---------------------------------------------------------------------------
# Persisted BPE model — the tokenizer-family build/probe split (the
# same contract as the ANN index / k-means model / text models /
# classifier weights): the merge table is trained ONCE per tokenizer
# release and every encode pass afterwards is a map-only fold over the
# stored merges — no pair-count aggregation ever again. At 100 TB the
# training corpus sample and the encode corpus are different things;
# the persisted model is what separates them.
# ---------------------------------------------------------------------------


def build_bpe_model(
    spark: SparkSession, sf_dir: str, model_path: str,
    n_merges: int = BPE_MERGES,
) -> None:
    """Train the merge list on ``documents`` and persist it (rank
    order IS the model); marker written last — readers refuse a torn
    build."""
    import os

    from ..sources import commit_protocol

    docs = load_table(spark, sf_dir, "documents")
    merges, _words = bpe_train(docs, n_merges)
    spark.createDataFrame(
        [(i, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "rank int, left string, right string, pair_count long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(model_path, "merges")
    )
    commit_protocol.write_marker(model_path)


def load_bpe_merges(
    spark: SparkSession, model_path: str
) -> list[tuple[str, str, int]]:
    """The frozen merge list, in training rank order."""
    import os

    from ..sources import commit_protocol

    commit_protocol.require_marker(
        model_path, what="BPE model", builder="build_bpe_model"
    )
    rows = (
        spark.read.parquet(os.path.join(model_path, "merges"))
        .orderBy("rank")
        .collect()
    )
    return [(r["left"], r["right"], int(r["pair_count"])) for r in rows]


def q_bpe_encode_from_model(
    spark: SparkSession, sf_dir: str, model_path: str
) -> DataFrame:
    """Encode ``documents`` against a persisted frozen BPE model:
    (doc_id, n_bpe_tokens, bpe_tokens) with ZERO training work — the
    merge fold is the only computation (pinned bit-identical to
    encoding with a freshly trained in-memory merge list)."""
    merges = load_bpe_merges(spark, model_path)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bpe_encode(docs, merges).select(
        "doc_id",
        F.size("bpe_tokens").cast("long").alias("n_bpe_tokens"),
        "bpe_tokens",
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility audit (Rust et al. 2021, "How Good is Your
# Tokenizer? On the Monolingual Performance of Multilingual Language
# Models", ACL — the fertility metric: mean subwords per word; plus the
# chars-per-token compression the tokenizer papers report). A training
# pipeline sizes vocabularies and diagnoses per-language tokenizer
# damage with exactly these two numbers: fertility near 1 means words
# survive whole, high fertility means the language is being shredded
# into characters (under-represented scripts), low chars-per-token
# means poor compression (more sequence positions per byte of text).
#
# Everything derives from the ENCODED token array alone: the </w>
# end-of-word marker makes word boundaries recoverable, so
#   n_words    = count of subwords carrying the marker
#   n_subwords = array size
#   n_chars    = total subword chars minus the markers
# — one map-only projection over the encode fold (itself shuffle-free),
# then a lang-keyed map-side-combinable sum. Integer sums; the two
# ratios are long/long double divisions rounded 6 dp.
# ---------------------------------------------------------------------------


def tokenizer_fertility(docs: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """(lang, n_docs, n_words, n_subwords, fertility, chars_per_token)
    over ``docs(doc_id, lang, text)`` for a given merge list."""
    enc = bpe_encode(docs, merges)
    eow_len = len(EOW)
    per_doc = enc.select(
        "lang",
        F.size("bpe_tokens").cast("long").alias("n_sub"),
        F.size(
            F.filter(F.col("bpe_tokens"), lambda t: t.endswith(EOW))
        ).cast("long").alias("n_w"),
        F.aggregate(
            F.transform(
                F.col("bpe_tokens"),
                lambda t: F.length(t)
                - F.when(t.endswith(EOW), F.lit(eow_len)).otherwise(0),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_c"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_w").cast("long").alias("n_words"),
        F.sum("n_sub").cast("long").alias("n_subwords"),
        F.sum("n_c").cast("long").alias("n_chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_words",
        "n_subwords",
        F.round(F.col("n_subwords") / F.col("n_words"), 6).alias("fertility"),
        F.round(F.col("n_chars") / F.col("n_subwords"), 6).alias(
            "chars_per_token"
        ),
    )


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the corpus BPE inline, then the per-language fertility /
    compression audit. (Unregistered, NON-SQL-EXPRESSIBLE — the merge
    loop has no fixed SQL depth; direct test replays the whole metric
    against the independent pure-Python BPE on the identical corpus.)"""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    merges, _words = bpe_train(docs.select("text"))
    return tokenizer_fertility(docs, merges)


def q_tokenizer_fertility_from_model(
    spark: SparkSession, sf_dir: str, model_path: str
) -> DataFrame:
    """The fertility audit against a persisted frozen BPE model — the
    production shape (the inline form retrains the tokenizer inside the
    query: build-class cost, like q_bpe_train). Pinned bit-identical to
    inline: stored merges are exact strings, the encode fold and the
    integer sums are the same code."""
    merges = load_bpe_merges(spark, model_path)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    return tokenizer_fertility(docs, merges)
