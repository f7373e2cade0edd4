"""Multimodal plumbing: schema/batch-shape of the mapInPandas decode
stage, validated against an independent pure-python recomputation."""

from __future__ import annotations

import hashlib

import duckdb

from roblox_vector_search_datagen_spark.operators import multimodal as M

def test_media_features_matches_independent_computation(spark, sf_dir):
    out = {r.doc_id: r for r in M.media_feature_arrays(spark, sf_dir).collect()}
    docs = duckdb.sql(f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'").fetchall()
    assert len(out) == len(docs)
    for doc_id, text in docs[:50]:
        r = out[doc_id]
        content = text.encode()
        assert r.n_bytes == len(content)
        dig = hashlib.md5(content).digest()
        assert r.features == [round(dig[i] / 255.0, 6) for i in range(4)]
        assert r.media_type == M.MEDIA_TYPES[doc_id % 3]

def test_media_schema_and_meta(spark, sf_dir):
    m = M.media(spark, sf_dir)
    assert [f.name for f in m.schema] == ["doc_id", "media_type", "content", "meta"]
    row = m.filter("doc_id = 5").collect()[0]
    assert row.media_type == "video"  # 5 % 3 == 2
    assert row.meta.width == (5 % 8 + 1) * 64
    assert row.meta.duration_ms == (5 % 30 + 1) * 1000
    img = m.filter("doc_id = 3").collect()[0]
    assert img.media_type == "image" and img.meta.duration_ms is None

def test_frame_sample_counts(spark, sf_dir):
    rows = M.frame_sample_plan(spark, sf_dir).collect()
    assert rows, "expected video rows"
    for r in rows[:20]:
        assert r.frame_ms % 5000 == 0 and r.frame_ms <= r.duration_ms

def test_real_pixels_falls_back_on_undecodable_blob():
    """The real-decoder arm is live code: given a decoder module it
    attempts a decode and falls back to the stub for non-image bytes —
    same 4-float shape either way, deterministic in every env."""
    from roblox_vector_search_datagen_spark.operators import multimodal as mm

    class FakePIL:
        @staticmethod
        def open(buf):
            raise ValueError("not an image")

    blob = b"not an image"
    assert mm._real_pixels(FakePIL, blob, 64, 64) == mm._stub_pixels(blob, 64, 64)

def test_real_pixels_decodes_when_decoder_works():
    import numpy as np

    from roblox_vector_search_datagen_spark.operators import multimodal as mm

    class FakeImg:
        width, height = 32, 16

        def convert(self, mode):
            assert mode == "L"
            return self

        def __array__(self, dtype=None, copy=None):
            return np.full((16, 32), 51, dtype="uint8")

    class FakePIL:
        @staticmethod
        def open(buf):
            return FakeImg()

    feats = mm._real_pixels(FakePIL, b"png-bytes", 64, 64)
    assert feats == [0.2, 0.0, 0.5, 0.25]
