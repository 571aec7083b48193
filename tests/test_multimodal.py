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


def test_unknown_codec_rejected(media):
    with pytest.raises(ValueError):
        multimodal.decode_media(media, codec="png")
    with pytest.raises(ValueError):
        multimodal.resize_media(media, codec="png")


# --- real stdlib codecs -----------------------------------------------------


def test_bmp_roundtrip_pure():
    px = bytes(range(4 * 2 * 3))  # 4x2 image, distinct channel bytes
    buf = multimodal.encode_bmp(4, 2, px)
    assert buf[:2] == b"BM" and len(buf) == 54 + 2 * 12  # 4px*3B rows, no pad
    assert multimodal.decode_bmp(buf) == (4, 2, px)
    # 3-wide rows need a pad byte (9 -> 12); roundtrip must strip it
    px3 = bytes(range(3 * 2 * 3))
    assert multimodal.decode_bmp(multimodal.encode_bmp(3, 2, px3)) == (3, 2, px3)


def test_wav_parse_pure():
    frames = b"\x01\x02" * 100  # 100 mono 16-bit samples
    buf = multimodal.encode_wav(1, 8000, frames)
    assert multimodal._parse_wav(buf) == (1, 16, 100)
    stereo = multimodal.encode_wav(2, 44100, b"\x00" * 400)
    assert multimodal._parse_wav(stereo) == (2, 16, 100)


def test_png_header_parse_pure():
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 640, 480, 8, 2, 0, 0, 0)
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    assert multimodal._parse_png_header(buf) == (640, 480)


def test_real_decode_on_spark(spark):
    import pandas as pd

    rows = pd.DataFrame(
        {
            "media_id": [1, 2, 3],
            "kind": ["image", "audio", "image"],
            "payload": [
                multimodal.encode_bmp(5, 4, bytes(60)),
                multimodal.encode_wav(2, 8000, bytes(80)),
                b"not a container at all",
            ],
            "meta": [None, None, None],
        }
    )
    media = spark.createDataFrame(rows[["media_id", "kind", "payload"]])
    got = {r.media_id: r for r in multimodal.decode_media(media, codec="real").collect()}
    assert (got[1].width, got[1].height, got[1].n_frames) == (5, 4, 1)
    assert (got[2].width, got[2].height, got[2].n_frames) == (2, 16, 20)
    assert (got[3].width, got[3].height, got[3].n_frames) == (None, None, None)
    assert got[3].n_bytes == len(b"not a container at all")


def test_real_resize_is_actual_pixel_resampling(spark):
    import pandas as pd

    # 2x2 image with 4 distinct pixels; upscale to 4x4 -> each source pixel
    # becomes a 2x2 block (nearest neighbor), downscale back -> original
    p00, p01, p10, p11 = b"\x10\x11\x12", b"\x20\x21\x22", b"\x30\x31\x32", b"\x40\x41\x42"
    src = multimodal.encode_bmp(2, 2, p00 + p01 + p10 + p11)
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [7], "kind": ["image"], "payload": [src]})
    )
    up = multimodal.resize_media(media, target_w=4, target_h=4, codec="real").collect()[0]
    w, h, px = multimodal.decode_bmp(bytes(up.resized))
    assert (w, h) == (4, 4)
    assert px[0:3] == p00 and px[9:12] == p01  # row 0: two left, two right
    assert px[36:39] == p10 and px[45:48] == p11  # row 3
    down = multimodal.resize_media(
        spark.createDataFrame(
            pd.DataFrame({"media_id": [8], "kind": ["image"], "payload": [bytes(up.resized)]})
        ),
        target_w=2,
        target_h=2,
        codec="real",
    ).collect()[0]
    assert multimodal.decode_bmp(bytes(down.resized))[2] == p00 + p01 + p10 + p11


def test_media_real_containers_parse_back(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    real = multimodal.media_real_containers(docs)
    decoded = multimodal.decode_media(real, codec="real")
    bad = decoded.where(F.col("width").isNull()).count()
    assert bad == 0  # every synthesized container parses under the real codec


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
