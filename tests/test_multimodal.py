"""Multimodal plumbing tests: binary payload synthesis, mapInPandas
batch shapes, byte-feature extraction vs a NumPy reference."""

from __future__ import annotations

import hashlib

import numpy as np

from psvm_spark import registry
from psvm_spark.catalog import load_table
from psvm_spark.queries.multimodal import media_table

registry.load_all()


class TestMediaTable:
    def test_payload_sizes_by_kind(self, spark, sf_dir):
        rows = media_table(spark, sf_dir).collect()
        sizes = {"image": 64, "audio": 128, "video": 192}
        for r in rows:
            assert len(r.payload) == sizes[r.kind], (r.media_id, r.kind)
            assert r.meta.width % 64 == 0 and r.meta.duration_ms > 0

    def test_payload_deterministic_from_text(self, spark, sf_dir):
        docs = {r.doc_id: r.text for r in load_table(spark, sf_dir, "documents").collect()}
        for r in media_table(spark, sf_dir).limit(20).collect():
            digest = hashlib.md5(docs[r.media_id].encode()).digest()
            reps = (r.media_id % 3 + 1) * 4
            assert r.payload == digest * reps


class TestDecodeFeatures:
    def test_matches_numpy_reference(self, spark, sf_dir):
        feats = {
            r.media_id: (r.byte_mean, r.byte_std)
            for r in registry.QUERIES["mm_decode_features"](spark, sf_dir).collect()
        }
        for r in media_table(spark, sf_dir).limit(25).collect():
            a = np.frombuffer(r.payload, dtype=np.uint8).astype(np.float64)
            assert abs(feats[r.media_id][0] - round(float(a.mean()), 6)) < 1e-9
            assert abs(feats[r.media_id][1] - round(float(a.std()), 6)) < 1e-9

    def test_frame_sampling_counts(self, spark, sf_dir):
        rows = registry.QUERIES["mm_frame_sample"](spark, sf_dir).collect()
        # video payload = 192 bytes = 12 frames of 16 ; every 3rd -> 4 samples
        assert all(r.n_frames_sampled == 4 for r in rows)
        # md5 repeats every 16 bytes -> all sampled frames identical
        assert all(r.n_distinct_frames == 1 for r in rows)


class TestUdfSurface:
    def test_map_in_pandas_token_totals(self, spark, sf_dir):
        from pyspark.sql import functions as F

        row = registry.QUERIES["map_in_pandas_tokens"](spark, sf_dir).collect()[0]
        d = load_table(spark, sf_dir, "documents")
        exp = d.select(F.size(F.split("text", " ")).alias("n")).agg(
            F.sum("n").alias("s"), F.count(F.lit(1)).alias("c")
        ).collect()[0]
        assert row.n_docs == exp.c and row.total_tokens == exp.s
