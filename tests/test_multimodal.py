"""Multimodal column plumbing: binary payloads + typed metadata through
Arrow-batched mapInPandas kernels (codecs stubbed — the Spark-side
schema/batch/cardinality contracts are what's under test)."""

from __future__ import annotations

import pytest

from big_data_project_jan_2026_tick_data__spark.operators import multimodal


def test_extract_features_schema_and_determinism(spark):
    media = multimodal.synthetic_media(spark, n=30)
    out = multimodal.extract_features(media)
    assert [f.name for f in out.schema.fields] == [
        "media_id",
        "kind",
        "n_bytes",
        "features",
    ]
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 30
    assert all(len(r.features) == multimodal.FEATURE_DIM for r in rows.values())
    # deterministic: re-running yields identical features
    rows2 = {r.media_id: r for r in multimodal.extract_features(media).collect()}
    assert all(rows[i].features == rows2[i].features for i in rows)


def test_extract_features_stub_gate(spark):
    media = multimodal.synthetic_media(spark, n=3)
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        multimodal.extract_features(media, decode_stub=False).collect()


def test_sample_frames_cardinality(spark):
    media = multimodal.synthetic_media(spark, n=30)
    frames = multimodal.sample_frames(media, every_ms=1000, max_frames=8)
    rows = frames.collect()
    # only video rows produce frames
    vids = {r.media_id for r in media.filter("kind = 'video'").collect()}
    assert {r.media_id for r in rows} == vids
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, fr in by_media.items():
        dur = mid * 100  # synthetic_media duration_ms
        expected = min(8, max(dur // 1000, 1))
        assert len(fr) == expected
        assert sorted(f.frame_idx for f in fr) == list(range(expected))
        # per-frame features differ (frame_idx folded into the hash)
        assert len({tuple(f.features) for f in fr}) == expected
