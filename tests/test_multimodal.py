"""Multimodal plumbing: schema contract, Arrow batch shapes, determinism,
and the stubbed codec gate. Oracle-value checks live in the main oracle
suite (media_* queries); these cover what SQL can't see."""

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators import multimodal
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return multimodal.media_from_documents(docs).cache()


def test_media_schema_contract(media):
    # compare names + datatypes (nullability flags differ by construction)
    got = [(f.name, f.dataType) for f in media.schema.fields]
    want = [(f.name, f.dataType) for f in multimodal.MEDIA_SCHEMA.fields]
    assert got == want


def test_payload_is_real_bytes(media):
    row = media.where(F.col("media_id") == 0).first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.payload)


def test_fixture_texts_are_ascii(spark):
    # the media oracles equate string length with byte length; guard it
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n_non_ascii = docs.where(
        F.length(F.col("text")) != F.octet_length(F.col("text"))
    ).count()
    assert n_non_ascii == 0


def test_real_codec_is_explicitly_stubbed(media):
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(media, codec="real")
    with pytest.raises(ValueError):
        multimodal.decode_media(media, codec="png")


def test_decode_is_deterministic(media):
    a = sorted(multimodal.decode_media(media).collect())
    b = sorted(multimodal.decode_media(media).collect())
    assert a == b
    for row in a:
        assert 16 <= row.width < 256 and 16 <= row.height < 256
        if row.kind == "image":
            assert row.n_frames == 1


def test_features_shape_and_norm(media):
    feats = multimodal.media_features(media, dim=16).collect()
    assert len(feats) == media.count()
    for row in feats:
        assert len(row.features) == 16
        assert abs(sum(row.features) - 1.0) < 1e-9


def test_resize_only_images_fixed_size_deterministic(media):
    out = multimodal.resize_media(media, target_w=8, target_h=8).collect()
    n_images = media.where(F.col("kind") == "image").count()
    assert len(out) == n_images
    for row in out:
        assert (row.width, row.height) == (8, 8)
        assert len(row.resized) == 64
    again = multimodal.resize_media(media, target_w=8, target_h=8).collect()
    assert sorted(out) == sorted(again)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        multimodal.resize_media(media, codec="real")


def test_frames_only_video_and_stride(media):
    frames = multimodal.sample_frames(media, frame_bytes=64, every_k=4)
    joined = frames.join(media, "media_id").select("kind", "frame_idx", "frame").collect()
    assert joined, "expected at least one video item in the fixture"
    for row in joined:
        assert row.kind == "video"
        assert row.frame_idx % 4 == 0
        assert 1 <= len(row.frame) <= 64


def test_media_stats_prunes_payload(media, spark, tmp_path):
    # payload must not be read for metadata-only queries: check the scan's
    # ReadSchema on a parquet round-trip
    path = str(tmp_path / "media")
    media.write.mode("overwrite").parquet(path)
    stats = multimodal.media_stats(spark.read.parquet(path))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan.split("ReadSchema")[-1]
