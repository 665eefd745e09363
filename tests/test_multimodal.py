"""Multimodal plumbing: schemas, batch iteration, fan-out, and
determinism of the fake decoders (the real-decoder path must raise
NotImplementedError — codecs aren't provisioned here)."""

import pytest

from hyppo_worker_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    image_features,
    resize_images,
    sample_frames,
    synth_media_df,
)
from hyppo_worker_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    df = synth_media_df(spark, docs)
    df.persist()
    df.count()
    return df


def _shape(schema):
    return [(f.name, f.dataType) for f in schema.fields]


def test_media_schema_and_kinds(media):
    assert _shape(media.schema) == _shape(MEDIA_SCHEMA)
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_image_features(media):
    feats = image_features(media)
    rows = feats.collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(rows) == n_images
    assert all(0 <= r.mean_intensity <= 255 for r in rows)
    assert all(r.width >= 8 and r.height >= 8 for r in rows)
    # determinism: same input → same features
    again = {r.media_id: r.mean_intensity for r in image_features(media).collect()}
    assert {r.media_id: r.mean_intensity for r in rows} == again


def test_resize_preserves_schema_and_updates_meta(media):
    out = resize_images(media, 16, 12)
    assert _shape(out.schema) == _shape(MEDIA_SCHEMA)
    imgs = out.filter("kind = 'image'").select("metadata.width", "metadata.height").collect()
    assert all(r.width == 16 and r.height == 12 for r in imgs)
    others = out.filter("kind != 'image'").count()
    assert others == media.filter("kind != 'image'").count()


def test_sample_frames_fanout(media):
    frames = sample_frames(media, every_ms=1000)
    per_video = {r.media_id: r.cnt for r in frames.groupBy("media_id").count()
                 .withColumnRenamed("count", "cnt").collect()}
    durations = {
        r.media_id: r.duration_ms
        for r in media.filter("kind='video'").select("media_id", "metadata.duration_ms").collect()
    }
    assert per_video  # some videos exist
    for mid, n in per_video.items():
        expected = len(range(0, durations[mid], 1000))
        assert n == expected
    one = frames.filter("frame_index = 0").first()
    assert len(bytes(one.frame)) == 16  # md5-sized fake frame


def test_audio_features(media):
    rows = audio_features(media).collect()
    assert len(rows) == media.filter("kind='audio'").count()
    assert all(r.n_samples == 2048 for r in rows)
    assert all(0.0 < r.rms <= 1.0 for r in rows)
    assert all(0 <= r.zero_crossings < 2048 for r in rows)


def test_real_decoder_is_stubbed(media):
    for fn in (image_features, audio_features, sample_frames):
        with pytest.raises(NotImplementedError):
            fn(media, decoder="real")
    with pytest.raises(NotImplementedError):
        resize_images(media, 8, 8, decoder="real")


def test_parse_image_headers_fail_soft(spark):
    """Truncated/garbage payloads yield fmt='unknown' with NULL dims —
    the manifest row survives (n_bytes recorded), nothing raises."""
    from hyppo_worker_spark.operators.multimodal import parse_image_headers

    rows = [
        (1, b"\x89PNG\r\n\x1a\x0aonly"),      # PNG magic, truncated IHDR
        (2, b"GIF89a\x05"),                     # GIF magic, truncated dims
        (3, b"not an image at all"),
        (4, b""),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in parse_image_headers(df).collect()}
    assert all(got[i].fmt == "unknown" for i in (1, 2, 3, 4))
    assert all(got[i].width is None and got[i].height is None for i in (1, 2, 3, 4))
    assert got[4].n_bytes == 0 and got[3].n_bytes == len(rows[2][1])


def test_parse_image_headers_real_bytes(spark):
    """Hand-built headers with known dims decode exactly."""
    import struct

    from hyppo_worker_spark.operators.multimodal import parse_image_headers

    png = (
        b"\x89PNG\r\n\x1a\x0a" + b"\x00\x00\x00\x0d" + b"IHDR"
        + struct.pack(">II", 640, 480) + b"\x08\x06\x00\x00\x00"
    )
    gif = b"GIF87a" + struct.pack("<HH", 320, 200) + b"\xf7\x00\x00"
    bmp = (
        b"BM" + struct.pack("<i", 62) + b"\x00\x00\x00\x00"
        + struct.pack("<ii", 54, 40) + struct.pack("<ii", 1920, 1080)
    )
    df = spark.createDataFrame(
        [(1, png), (2, gif), (3, bmp)], "media_id long, content binary"
    )
    got = {r.media_id: (r.fmt, r.width, r.height) for r in parse_image_headers(df).collect()}
    assert got == {1: ("png", 640, 480), 2: ("gif", 320, 200), 3: ("bmp", 1920, 1080)}
