"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the decode step is STUBBED
(deterministic fake features derived from the raw bytes, clearly marked;
``decode_real`` raises NotImplementedError). Everything around the stub —
schema, partitioning, UDF signature, Arrow batch shape — is real and
tested, which is the part that matters for the 100 TB plumbing:

- payloads stay opaque bytes end-to-end (no driver round-trip);
- metadata extraction (``q_multimodal_meta``) is pure JVM expressions and
  oracle-checkable;
- feature extraction (``q_media_features``) streams Arrow batches through
  ``mapInPandas`` — swap ``_fake_decode`` for PIL/ffmpeg per-batch calls
  on a cluster with codecs and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import load_table

_KINDS = ("image", "audio", "video")
_MIMES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def media_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media table from ``documents``: payload = utf-8
    bytes of the text (an opaque blob as far as the engine is concerned),
    kind assigned round-robin by doc_id."""
    d = load_table(spark, sf_dir, "documents")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, _KINDS[0])
        .when(F.col("doc_id") % 3 == 1, _KINDS[1])
        .otherwise(_KINDS[2])
    )
    mime = (
        F.when(F.col("doc_id") % 3 == 0, _MIMES["image"])
        .when(F.col("doc_id") % 3 == 1, _MIMES["audio"])
        .otherwise(_MIMES["video"])
    )
    return d.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        mime.alias("mime"),
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque payloads — byte length, kind, mime —
    pure JVM expressions, no decode."""
    m = media_assets(spark, sf_dir)
    return m.select(
        "asset_id", "kind", "mime", F.length("payload").alias("n_bytes")
    )


def decode_real(payload: bytes, kind: str):
    """The real decode hook. The test container ships no codecs —
    STUB: raises; swap in PIL/soundfile/ffmpeg per-batch on a real cluster."""
    raise NotImplementedError(
        "media codecs are not available in this container; "
        "use _fake_decode for deterministic plumbing tests"
    )


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic fake 'decode': derives fake dimensions/duration from
    the payload byte length ONLY (pure integer arithmetic), so the
    downstream schema and batch shape are exercised without codecs AND
    the whole chain stays SQL-expressible — q_media_pipeline is
    hash-checked against a DuckDB oracle that recomputes the stub."""
    n = len(payload)
    if kind == "image":
        return {"width": 16 + (n * 7) % 64, "height": 16 + n % 64, "duration_s": 0.0}
    if kind == "audio":
        return {"width": 0, "height": 0, "duration_s": round(n / 100.0, 3)}
    return {"width": 16 + (n * 7) % 32, "height": 16 + n % 32, "duration_s": round(n / 50.0, 3)}


_FEATURES_SCHEMA = (
    "asset_id long, kind string, n_bytes int, width int, height int, duration_s double"
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        decoded = [
            _fake_decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
        ]
        out = pd.DataFrame(
            {
                "asset_id": pdf["asset_id"].values,
                "kind": pdf["kind"].values,
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [d["width"] for d in decoded],
                "height": [d["height"] for d in decoded],
                "duration_s": [d["duration_s"] for d in decoded],
            }
        )
        yield out


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract plumbing: Arrow batches of opaque payloads
    through mapInPandas (decode step stubbed — see module docstring).
    Rows-only check: fake features are engine-internal by design."""
    m = media_assets(spark, sf_dir)
    return m.mapInPandas(_extract_features, _FEATURES_SCHEMA)


def _extract_features_arrow(batches):
    """RecordBatch-level twin of ``_extract_features``: operates on raw
    Arrow buffers with no pandas materialization. For binary-heavy media
    batches the pandas layer is pure overhead (every payload becomes a
    boxed Python object in an object-dtype column before the UDF even
    runs); ``mapInArrow`` hands the batch over as-is, and vectorized
    kernels (``binary_length``) run on the buffers directly. The decode
    loop itself stays per-row — it is the stub for a per-item codec
    call, which is per-row in any real decoder."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        decoded = [_fake_decode(p, k) for p, k in zip(payloads, kinds)]
        yield pa.RecordBatch.from_pydict(
            {
                "asset_id": batch.column("asset_id"),
                "kind": batch.column("kind"),
                "n_bytes": pc.cast(
                    pc.binary_length(batch.column("payload")), pa.int32()
                ),
                "width": pa.array(
                    [d["width"] for d in decoded], type=pa.int32()
                ),
                "height": pa.array(
                    [d["height"] for d in decoded], type=pa.int32()
                ),
                "duration_s": pa.array(
                    [d["duration_s"] for d in decoded], type=pa.float64()
                ),
            }
        )


def q_media_features_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` form of the feature extraction — the engine's
    third Python batch surface beside pandas UDFs and mapInPandas.
    Direct test pins row-for-row equality with the mapInPandas form."""
    m = media_assets(spark, sf_dir)
    return m.mapInArrow(_extract_features_arrow, _FEATURES_SCHEMA)


_RESIZE_BOX = 224
_FRAME_FPS = 10
_MAX_SAMPLES = 5

_PIPELINE_SCHEMA = (
    "asset_id long, kind string, frame_idx int, out_w int, out_h int"
)


def _resize_and_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Second pipeline stage: aspect-preserving resize into a 224 box,
    then evenly-spaced frame sampling (<=5 samples at a fake 10 fps).
    Fan-out happens inside the Arrow batch — one input row becomes
    n_samples output rows without leaving the Python worker.

    All arithmetic is integer-exact (floor division; frame counts from
    ``n_bytes``, never from float ``duration_s * fps``, whose rounding
    differs between Python and SQL engines) so the DuckDB oracle can
    reproduce every output bit."""
    for pdf in batches:
        out_rows = []
        for r in pdf.itertuples(index=False):
            w, h = int(r.width), int(r.height)
            mx = max(w, h)
            ow = (w * _RESIZE_BOX) // mx if mx > 0 else 0
            oh = (h * _RESIZE_BOX) // mx if mx > 0 else 0
            n = int(r.n_bytes)
            # duration_s * fps in integer form: audio = n/100s @10fps,
            # video = n/50s @10fps, image = single frame
            if r.kind == "audio":
                n_frames = max(1, n // 10)
            elif r.kind == "video":
                n_frames = max(1, n // 5)
            else:
                n_frames = 1
            n_samples = min(_MAX_SAMPLES, n_frames)
            step = max(1, n_frames // n_samples)
            for i in range(0, n_samples * step, step):
                out_rows.append((r.asset_id, r.kind, i, ow, oh))
        yield pd.DataFrame(
            out_rows, columns=["asset_id", "kind", "frame_idx", "out_w", "out_h"]
        )


def q_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal plumbing chain: decode (stub) -> resize ->
    frame-sample, two mapInPandas stages back to back. No shuffle
    between stages (narrow), payloads never visit the driver; on a
    cluster with codecs only ``_fake_decode`` changes. Because the stub
    is integer-exact arithmetic over byte lengths, the whole two-stage
    Python chain is hash-checked against a DuckDB oracle — the Arrow
    plumbing itself is under the correctness gate, not just rows-only."""
    feats = q_media_features(spark, sf_dir)
    return feats.mapInPandas(_resize_and_sample, _PIPELINE_SCHEMA)


MULTIMODAL_QUERIES = {
    # q_multimodal_meta gave up its registry slot in the round-4
    # rotation (the slot funds q_tpch_q21); the function stays API
    # surface with a driver-grade parity test against
    # MULTIMODAL_META_ORACLE in tests/test_unregistered_ops.py.
    # q_media_features is unregistered (50-slot cap): q_media_pipeline
    # chains it as its first stage, so the feature-extraction plumbing
    # is checked through the pipeline's CORRECTNESS row; the function
    # stays API surface with a direct schema/shape test.
    "q_media_pipeline": q_media_pipeline,
}

MULTIMODAL_ORACLES = {
    "q_media_pipeline": f"""
WITH f AS (
  SELECT doc_id AS asset_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         octet_length(encode(text)) AS n
  FROM documents
),
d AS (
  SELECT asset_id, kind, n,
         CASE kind WHEN 'image' THEN 16 + (n * 7) % 64
                   WHEN 'audio' THEN 0
                   ELSE 16 + (n * 7) % 32 END AS w,
         CASE kind WHEN 'image' THEN 16 + n % 64
                   WHEN 'audio' THEN 0
                   ELSE 16 + n % 32 END AS h,
         greatest(1, CASE kind WHEN 'image' THEN 1
                               WHEN 'audio' THEN n // 10
                               ELSE n // 5 END) AS n_frames
  FROM f
),
s AS (
  SELECT asset_id, kind,
         CASE WHEN greatest(w, h) > 0 THEN (w * {_RESIZE_BOX}) // greatest(w, h) ELSE 0 END AS out_w,
         CASE WHEN greatest(w, h) > 0 THEN (h * {_RESIZE_BOX}) // greatest(w, h) ELSE 0 END AS out_h,
         least({_MAX_SAMPLES}, n_frames) AS n_samples,
         greatest(1, n_frames // least({_MAX_SAMPLES}, n_frames)) AS step
  FROM d
)
SELECT asset_id, kind,
       CAST(unnest(range(0, n_samples)) * step AS INTEGER) AS frame_idx,
       CAST(out_w AS INTEGER) AS out_w,
       CAST(out_h AS INTEGER) AS out_h
FROM s
""",
}

# Direct-test oracle for q_multimodal_meta (evicted from the registry in
# the round-4 rotation; tests/test_unregistered_ops.py runs this
# comparison at driver grade).
MULTIMODAL_META_ORACLE = """
SELECT doc_id AS asset_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS mime,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
FROM documents
"""
