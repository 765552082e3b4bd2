"""End-to-end training-corpus build — the composition the individual
operators exist for, as one callable pipeline:

    raw documents
      -> exact dedup          (q_dedup_exact: min-doc per sha256)
      -> near dedup           (q_dedup_prefix: exact AllPairs Jaccard,
                               first-occurrence-wins — doc_b drops)
      -> quality filter       (quality_profile keep verdict, Gopher
                               battery; token-less docs drop)
      -> decontamination      (contamination_report: drop any training
                               doc colliding with the eval suite; the
                               eval docs themselves never enter)
      -> temperature resample (temperature_mix: sqrt-temperature
                               per-language epoch multiplicities)
      -> deterministic order  (seeded md5 rank via the two-phase
                               global_row_number — no single-partition
                               sort)
      -> sequence packing     (pack_assignments: hash-sharded token
                               streams cut into fixed budgets)
      -> shard write          (write_training_shards: bounded
                               records-per-file parquet for loaders)

Every stage is an operator with its own oracle/direct test; this
module adds the JOIN PLUMBING between verdict relations (semi/anti
joins on doc_id — never a collect) and a reconciliation report so a
production run can assert the funnel arithmetic. Dedup and
decontamination verdicts are computed CORPUS-WIDE (on the raw table,
where their oracles run) and applied as verdict joins — the verdict
relations are tiny next to the corpus and the stages stay
independently checkable.

Scale: the pipeline inherits each stage's plan (all bucketed /
broadcast / two-phase shapes — see the per-operator scale notes); the
composition itself adds only doc_id-keyed semi/anti joins, which AQE
broadcasts while the verdict sets are small and shuffles on the key
otherwise. The reconciliation counts are driver scalars, one aggregate
per funnel stage — a reporting cost, not a data movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ranking import global_row_number
from ..sources.loader import load_table
from ..sources.sinks import write_training_shards
from .contamination import EVAL_MOD, EVAL_REM, q_decontaminate
from .dedup import q_dedup_exact, q_dedup_prefix
from .packing import pack_assignments
from .quality import quality_profile
from .sampling import SHUFFLE_SEED, _seeded_hex, temperature_mix


def build_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    records_per_file: int = 200,
    with_report: bool = True,
) -> dict:
    """Run the full funnel over ``documents`` and write training
    shards to ``out_path``. Returns the reconciliation report:
    ``{input, after_exact, after_near, after_quality, after_decontam,
    rows_written, total_copies, n_shard_files}`` — each stage count
    the survivors AFTER that verdict joins in, so the funnel is
    monotone non-increasing by construction (pinned by test).

    ``with_report=False`` skips the per-stage counts: each count is a
    separate action that re-executes the funnel prefix, an acceptable
    diagnostic cost at audit time but 5 extra corpus passes a 100 TB
    production run should not pay — the write-only path executes the
    plan exactly once."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    # eval docs are held out up front: they are the benchmark suite,
    # never training corpus
    train = docs.filter(~(F.col("doc_id") % EVAL_MOD == EVAL_REM))

    def _n(df):
        return df.count() if with_report else None

    report: dict = {"input": _n(train)}

    keep_exact = q_dedup_exact(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    s = train.join(keep_exact, "doc_id", "left_semi")
    report["after_exact"] = _n(s)

    drop_near = (
        q_dedup_prefix(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    s = s.join(drop_near, "doc_id", "left_anti")
    report["after_near"] = _n(s)

    quality = quality_profile(docs).filter("keep").select("doc_id", "n_tokens")
    s = s.join(quality, "doc_id")  # inner: carries n_tokens forward
    report["after_quality"] = _n(s)

    contaminated = (
        q_decontaminate(spark, sf_dir)
        .filter("contaminated")
        .select("doc_id")
    )
    s = s.join(contaminated, "doc_id", "left_anti")
    report["after_decontam"] = _n(s)

    mixed = temperature_mix(s, "lang", "doc_id").filter(F.col("n_copies") >= 1)

    keyed = mixed.withColumn(
        "_h", _seeded_hex(F.col("doc_id"), SHUFFLE_SEED)
    ).withColumn("_hb", F.substring("_h", 1, 2))
    ordered = global_row_number(
        keyed, ["_hb"], ["_h", "doc_id"], rn_col="shuffle_pos"
    ).drop("_h", "_hb")

    # the shuffle rank DRIVES pack layout (ADVICE r04): without
    # order_col the packer's internal window would re-order each shard
    # by doc_id, silently undoing the seeded shuffle for adjacency
    packs = pack_assignments(
        ordered, "doc_id", "n_tokens", order_col="shuffle_pos"
    ).select(
        "doc_id", "shard", "seq_in_shard", "start_off", "pack_seq",
        "crosses_boundary",
    )
    final = ordered.join(packs, "doc_id").select(
        "doc_id", "text", "lang", "source", "n_tokens", "n_copies",
        "shuffle_pos", "shard", "seq_in_shard", "start_off", "pack_seq",
        "crosses_boundary",
    )
    write_training_shards(final, out_path, records_per_file)
    out = spark.read.parquet(out_path)
    report["rows_written"] = out.count()
    report["total_copies"] = out.agg(F.sum("n_copies")).collect()[0][0]
    import glob
    import os

    report["n_shard_files"] = len(
        glob.glob(os.path.join(out_path, "*.parquet"))
    )
    return report
