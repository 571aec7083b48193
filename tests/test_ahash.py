"""aHash perceptual dedup: brightness invariance, duplicate grouping,
non-image payloads dropped, NumPy-reference pinning."""

import numpy as np
import pytest

from pipeline_pyspark_etl_imdb_spark.operators.multimodal import (
    encode_bmp,
    encode_wav,
    media_ahash,
    media_ahash_dup_groups,
)


def _img(w, h, fn):
    pix = bytearray()
    for y in range(h):
        for x in range(w):
            v = fn(x, y)
            pix += bytes([v, v, v])
    return encode_bmp(w, h, bytes(pix))


def _media_df(spark, rows):
    return spark.createDataFrame(rows, "media_id bigint, payload binary")


def test_identical_images_same_hash_distinct_images_differ(spark):
    a = _img(16, 12, lambda x, y: 255 if x < 8 else 0)
    b = _img(16, 12, lambda x, y: 255 if y < 6 else 0)
    df = _media_df(spark, [(1, a), (2, a), (3, b)])
    got = {r.media_id: r.ahash for r in media_ahash(df).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_brightness_shift_invariance(spark):
    base = _img(16, 16, lambda x, y: 180 if (x // 4 + y // 4) % 2 == 0 else 60)
    shifted = _img(16, 16, lambda x, y: 220 if (x // 4 + y // 4) % 2 == 0 else 100)
    df = _media_df(spark, [(1, base), (2, shifted)])
    got = {r.media_id: r.ahash for r in media_ahash(df).collect()}
    # aHash thresholds against the image's own mean: +40 everywhere is a no-op
    assert got[1] == got[2]


def test_resize_invariance_for_block_patterns(spark):
    # the same 2x2 block pattern rendered at 8x8 and 32x32 pools identically
    small = _img(8, 8, lambda x, y: 255 if (x < 4) == (y < 4) else 0)
    large = _img(32, 32, lambda x, y: 255 if (x < 16) == (y < 16) else 0)
    df = _media_df(spark, [(1, small), (2, large)])
    got = {r.media_id: r.ahash for r in media_ahash(df).collect()}
    assert got[1] == got[2]


def test_non_image_payloads_drop_out(spark):
    wav = encode_wav(1, 8000, b"\x00\x01" * 50)
    img = _img(8, 8, lambda x, y: x * 16)
    df = _media_df(spark, [(1, wav), (2, img), (3, b"garbage")])
    got = media_ahash(df).collect()
    assert [r.media_id for r in got] == [2]


def test_dup_groups_contract(spark):
    a = _img(16, 12, lambda x, y: 255 if x < 8 else 0)
    b = _img(16, 12, lambda x, y: 255 if y < 6 else 0)
    df = _media_df(spark, [(5, a), (3, a), (9, b), (7, a)])
    groups = media_ahash_dup_groups(df).collect()
    assert len(groups) == 1
    assert groups[0].n_images == 3
    assert groups[0].canonical_id == 3


def test_matches_numpy_reference(spark):
    rng_img = _img(13, 9, lambda x, y: (x * 37 + y * 91) % 256)
    df = _media_df(spark, [(1, rng_img)])
    got = media_ahash(df).collect()[0].ahash
    # independent reference on the raw pixel function
    gray = np.array(
        [[(x * 37 + y * 91) % 256 for x in range(13)] for y in range(9)],
        dtype=np.float64,
    )
    ys = (np.arange(9) * 8) // 9
    xs = (np.arange(13) * 8) // 13
    sums = np.zeros((8, 8))
    cnts = np.zeros((8, 8))
    np.add.at(sums, (ys[:, None], xs[None, :]), gray)
    np.add.at(cnts, (ys[:, None], xs[None, :]), 1.0)
    blocks = sums / np.maximum(cnts, 1.0)
    bits = (blocks >= blocks.mean()).flatten()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    if val >= 1 << 63:
        val -= 1 << 64
    assert got == val


def _wav(samples, channels=1):
    import struct

    from pipeline_pyspark_etl_imdb_spark.operators.multimodal import encode_wav

    frames = b"".join(struct.pack("<h", int(s)) for s in samples)
    return encode_wav(channels, 8000, frames)


def test_audio_fingerprint_identical_clips_collide(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.multimodal import (
        media_audio_fingerprint,
    )

    loud_then_quiet = [2000] * 80 + [100] * 80
    quiet_then_loud = [100] * 80 + [2000] * 80
    df = _media_df(
        spark,
        [(1, _wav(loud_then_quiet)), (2, _wav(loud_then_quiet)), (3, _wav(quiet_then_loud))],
    )
    got = {r.media_id: r.afp for r in media_audio_fingerprint(df).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
    assert all(v != 0 for v in got.values())


def test_audio_fingerprint_gain_invariance(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.multimodal import (
        media_audio_fingerprint,
    )

    base = [1500] * 40 + [200] * 40 + [1500] * 40 + [200] * 40
    doubled = [s * 2 for s in base]
    df = _media_df(spark, [(1, _wav(base)), (2, _wav(doubled))])
    got = {r.media_id: r.afp for r in media_audio_fingerprint(df).collect()}
    assert got[1] == got[2]


def test_audio_fingerprint_drops_images_and_garbage(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.multimodal import (
        media_audio_fingerprint,
    )

    img = _img(8, 8, lambda x, y: 100)
    df = _media_df(spark, [(1, img), (2, _wav([500] * 64)), (3, b"junk")])
    got = media_audio_fingerprint(df).collect()
    assert [r.media_id for r in got] == [2]
    assert got[0].n_frames == 64
