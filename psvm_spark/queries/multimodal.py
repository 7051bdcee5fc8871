"""Multimodal columns (SURVEY.md brief): image/audio/video as opaque
``binary`` payloads + typed metadata, with decode / feature-extract /
frame-sample as Arrow-batched Python stages.

The container has no image/audio libs, so the *codec* step is stubbed:
``_decode_or_fake`` tries the real decoder import and falls back to a
deterministic byte-statistics fake (clearly marked).  Everything
Spark-side is real and tested: binary column synthesis, metadata
structs, mapInPandas batch iteration, UDF signatures, partitioning.

The media table is synthesized deterministically from documents
(payload = unhex(md5(text)) repeated), so the metadata query has a full
DuckDB oracle; byte-level feature extraction is checked against a
NumPy reference in tests instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psvm_spark.catalog import load_table
from psvm_spark.registry import query

_KINDS = ("image", "audio", "video")


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media fixture: one row per document, kind by
    doc_id%3, payload = md5 digest bytes repeated (kind-dependent
    length), typed metadata struct."""
    d = load_table(spark, sf_dir, "documents")
    kind = F.element_at(F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    reps = (F.col("doc_id") % 3 + 1) * 4  # 64/128/192-byte payloads
    payload = F.to_binary(F.repeat(F.md5("text"), reps.cast("int")), F.lit("hex"))
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            ((F.col("doc_id") % 5 + 1) * 64).cast("int").alias("width"),
            ((F.col("doc_id") % 4 + 1) * 64).cast("int").alias("height"),
            ((F.col("n_chars") * 10).cast("long")).alias("duration_ms"),
        ).alias("meta"),
    )


# --------------------------------------------------------------------------
# Metadata/layout query — fully SQL-oracle'd: the binary synthesis and
# struct metadata round-trip through both engines identically.


@query(
    "mm_metadata_stats",
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id,
         ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
         from_hex(repeat(md5(text), CAST((doc_id % 3 + 1) * 4 AS INT))) AS payload,
         CAST((doc_id % 5 + 1) * 64 AS INT) AS width,
         n_chars * 10 AS duration_ms
  FROM documents
)
SELECT kind,
       COUNT(*) AS n,
       CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
       CAST(SUM(width) AS DOUBLE) / COUNT(*) AS avg_width,
       CAST(SUM(duration_ms) AS BIGINT) AS total_duration_ms
FROM media
GROUP BY kind
""",
)
def mm_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir)
    return m.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        (F.sum(F.col("meta.width")).cast("double") / F.count(F.lit(1))).alias("avg_width"),
        F.sum("meta.duration_ms").alias("total_duration_ms"),
    )


# --------------------------------------------------------------------------
# Decode + feature extraction over mapInPandas (rows-only; NumPy
# reference check in tests/test_multimodal.py).


def _decoder_stub():
    """Return (name, fn) — the real decoder if its lib exists, else the
    deterministic byte-stats fake.  STUB: PIL/librosa are not in this
    container; the fake stands in for pixel/sample decoding."""
    try:  # pragma: no cover - lib absent in this container
        from PIL import Image  # noqa: F401

        raise NotImplementedError("real image decode path not wired yet")
    except ImportError:
        def fake(buf: bytes):
            import numpy as np

            a = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
            return [
                float(a.mean()),
                float(a.std()),
                float(a.min()),
                float(a.max()),
            ]

        return "byte_stats_fake", fake


@query("mm_decode_features")
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir)

    def extract(batches):
        import numpy as np

        for pdf in batches:
            feats = []
            for buf in pdf["payload"]:
                a = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
                feats.append(
                    [float(a.mean()), float(a.std()), float(a.min()), float(a.max())]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    out = m.mapInPandas(extract, "media_id long, kind string, features array<double>")
    return out.select(
        "media_id",
        "kind",
        F.round(F.col("features")[0], 6).alias("byte_mean"),
        F.round(F.col("features")[1], 6).alias("byte_std"),
    )


# --------------------------------------------------------------------------
# Frame sampling for "video" payloads: every 16-byte frame, keep each
# k-th, fingerprint per frame (rows-only).


@query("mm_frame_sample")
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir).filter(F.col("kind") == "video")

    def sample_frames(batches):
        import hashlib

        for pdf in batches:
            out_ids, out_frames, out_digests = [], [], []
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                frames = [buf[i : i + 16] for i in range(0, len(buf), 16)]
                for fi in range(0, len(frames), 3):  # every 3rd frame
                    out_ids.append(mid)
                    out_frames.append(fi)
                    out_digests.append(hashlib.md5(frames[fi]).hexdigest())
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_frames, "frame_digest": out_digests}
            )

    out = m.mapInPandas(sample_frames, "media_id long, frame_idx int, frame_digest string")
    return out.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames_sampled"),
        F.countDistinct("frame_digest").alias("n_distinct_frames"),
    )
