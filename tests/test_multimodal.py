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


def _make_bmp(
    gray_rgb,  # list of rows of (r, g, b), top-down visual order
    topdown: bool = False,
    pad_fill: int = 0,
    gap: int = 0,
) -> bytes:
    """Hand-build a 24-bpp BI_RGB BMP. ``gap`` inserts junk bytes
    between the headers and the pixel data (bfOffBits points past it);
    ``pad_fill`` sets the row-padding garbage byte value."""
    import struct

    h = len(gray_rgb)
    w = len(gray_rgb[0])
    rowsize = ((w * 3 + 3) // 4) * 4
    off = 54 + gap
    hdr = (
        b"BM"
        + struct.pack("<IHHI", off + rowsize * h, 0, 0, off)
        + struct.pack(
            "<IiiHHIIiiII",
            40, w, (-h if topdown else h), 1, 24, 0, rowsize * h,
            2835, 2835, 0, 0,
        )
    )
    body = bytearray(hdr + bytes([0xEE]) * gap)
    visual_rows = gray_rgb if topdown else list(reversed(gray_rgb))
    for row in visual_rows:
        for r, g, b in row:
            body += bytes([b, g, r])  # BGR on disk
        body += bytes([pad_fill]) * (rowsize - w * 3)
    return bytes(body)


def test_decode_bmp_gray_real_pixels():
    """Pixel-exact decode: BGR order, bottom-up flip, Rec.601 integer
    luma. A wrong channel order or a missing row flip changes the
    output."""
    from hyppo_worker_spark.operators.multimodal import decode_bmp_gray

    img = [
        [(255, 0, 0), (0, 255, 0)],   # top row: red, green
        [(0, 0, 255), (255, 255, 255)],  # bottom row: blue, white
    ]
    gray = decode_bmp_gray(_make_bmp(img))
    assert gray.shape == (2, 2)
    assert gray[0, 0] == (77 * 255) >> 8        # red
    assert gray[0, 1] == (151 * 255) >> 8       # green
    assert gray[1, 0] == (28 * 255) >> 8        # blue
    assert gray[1, 1] == (77 * 255 + 151 * 255 + 28 * 255) >> 8  # white
    # top-down variant of the SAME visual image decodes identically
    gray_td = decode_bmp_gray(_make_bmp(img, topdown=True))
    assert (gray == gray_td).all()


def test_decode_bmp_gray_ignores_padding_and_offset_gap():
    """Row padding garbage and a bfOffBits gap (palette/ICC space) must
    not leak into pixels: byte-different files, identical decode."""
    from hyppo_worker_spark.operators.multimodal import decode_bmp_gray

    img = [[(10 * x + y, 20, 30) for x in range(3)] for y in range(2)]
    a = _make_bmp(img, pad_fill=0x00)
    b = _make_bmp(img, pad_fill=0xFF)
    c = _make_bmp(img, gap=17)
    assert a != b and a != c
    ga, gb, gc = map(decode_bmp_gray, (a, b, c))
    assert (ga == gb).all() and (ga == gc).all()


def test_decode_bmp_gray_fail_soft():
    from hyppo_worker_spark.operators.multimodal import decode_bmp_gray

    assert decode_bmp_gray(b"") is None
    assert decode_bmp_gray(b"not a bmp") is None
    # 8-bpp and compressed variants are not claimed
    import struct

    hdr8 = (
        b"BM" + struct.pack("<IHHI", 100, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 8, 0, 0, 0, 0)
    ) + b"\x00" * 60
    assert decode_bmp_gray(hdr8) is None
    # truncated pixel data
    img = [[(1, 2, 3)] * 4] * 4
    blob = _make_bmp(img)
    assert decode_bmp_gray(blob[:-5]) is None


def test_bmp_ahash_upscale_collides_at_hamming_zero(spark):
    """The perceptual property: a 2x pixel-doubled rendition (visually
    identical, entirely different bytes) hashes IDENTICALLY; a
    structurally different image does not."""
    import numpy as np

    from hyppo_worker_spark.operators.multimodal import (
        ahash_bits_from_gray,
        bmp_ahash_bands,
        decode_bmp_gray,
    )

    rng = [[((7 * x * y + 13 * x + 31 * y) % 256) for x in range(16)] for y in range(16)]
    base = [[(v, (3 * v) % 256, (7 * v) % 256) for v in row] for row in rng]
    up = [
        [base[y // 2][x // 2] for x in range(32)] for y in range(32)
    ]
    other = [[((x * 97 + y * 3 + x * y) % 256,) * 3 for x in range(16)] for y in range(16)]
    df = spark.createDataFrame(
        [
            (1, _make_bmp(base)),
            (2, _make_bmp(up)),
            (3, _make_bmp(other)),
        ],
        "media_id long, content binary",
    )
    got = {r.media_id: (r.b0, r.b1, r.b2, r.b3) for r in bmp_ahash_bands(df).collect()}
    assert got[1] == got[2], "2x upscale must collide (visual identity)"
    assert got[1] != got[3], "different image must not collide"
    # and the local helper agrees with the distributed path
    assert tuple(ahash_bits_from_gray(decode_bmp_gray(_make_bmp(base)))) == got[1]


def _make_wav(samples, junk_between=True, bits=16, code=1):
    """Hand-build a PCM WAV; optional odd-sized junk chunk between
    fmt and data (spec: chunks pad to even offsets)."""
    import struct

    pcm = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", code, 1, 16000, 32000, 2, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if junk_between:
        chunks += b"LIST" + struct.pack("<I", 5) + b"JUNK*" + b"\x00"
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_pcm_chunk_walk():
    """Samples decode exactly through an odd-sized intervening chunk —
    a fixed-offset reader would read junk as data."""
    import numpy as np

    from hyppo_worker_spark.operators.multimodal import decode_wav_pcm

    samples = [0, 1, -1, 32767, -32768, 1234, -4321]
    got = decode_wav_pcm(_make_wav(samples))
    assert got is not None and got.tolist() == samples
    got2 = decode_wav_pcm(_make_wav(samples, junk_between=False))
    assert got2.tolist() == samples
    assert got.dtype == np.dtype("<i2")


def test_decode_wav_pcm_fail_soft():
    from hyppo_worker_spark.operators.multimodal import decode_wav_pcm

    assert decode_wav_pcm(b"") is None
    assert decode_wav_pcm(b"RIFFxxxxWAVE") is None
    # non-PCM format code and non-16-bit refuse (not claimed)
    assert decode_wav_pcm(_make_wav([1, 2], code=3)) is None
    assert decode_wav_pcm(_make_wav([1, 2], bits=8)) is None
    # truncated data chunk
    blob = _make_wav([1, 2, 3, 4])
    assert decode_wav_pcm(blob[:-3]) is None


def test_audio_pcm_features_integer_exact(spark):
    from hyppo_worker_spark.operators.multimodal import audio_pcm_features

    samples = [100, -50, 25, 0, -25]
    df = spark.createDataFrame(
        [(1, _make_wav(samples)), (2, b"not a wav")],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in audio_pcm_features(df).collect()}
    assert list(rows) == [1]  # non-WAV dropped fail-soft
    r = rows[1]
    assert r.n_samples == 5
    assert r.sum_sq == sum(s * s for s in samples)
    # strict sign products: (100,-50),(-50,25),(25,0),(0,-25) -> 2
    assert r.zero_crossings == 2
    assert r.peak_abs == 100


def test_resize_bmp_integer_box_mean():
    from hyppo_worker_spark.operators.multimodal import (
        _decode_bmp_bgr,
        resize_bmp,
    )

    # 4x4 with distinct per-pixel channels; resize to 2x2
    rgb = [
        [((4 * y + x) * 3, (4 * y + x) * 5 % 256, (4 * y + x) * 7 % 256)
         for x in range(4)]
        for y in range(4)
    ]
    src = _make_bmp(rgb, pad_fill=0x5A)  # padding garbage must not leak
    out = resize_bmp(src, 2, 2)
    assert out is not None
    small = _decode_bmp_bgr(out)
    assert small.shape == (2, 2, 3)
    big = _decode_bmp_bgr(src).astype(int)
    for by in range(2):
        for bx in range(2):
            block = big[2 * by : 2 * by + 2, 2 * bx : 2 * bx + 2]
            for c in range(3):
                assert small[by, bx, c] == int(block[..., c].sum()) // 4


def test_resize_bmp_upscaled_rendition_resizes_identically():
    """The operator-level twin of m06's perceptual contract: a
    pixel-doubled rendition box-meaned to the same target dims yields
    byte-identical output ((K^2*s)//(K^2*n) == s//n)."""
    from hyppo_worker_spark.operators.multimodal import resize_bmp

    rgb = [
        [((y * 31 + x * 7) % 256, (y * 13 + x * 3) % 256, (x * y) % 256)
         for x in range(8)]
        for y in range(8)
    ]
    doubled = [
        [rgb[y // 2][x // 2] for x in range(16)] for y in range(16)
    ]
    a = resize_bmp(_make_bmp(rgb), 4, 4)
    b = resize_bmp(_make_bmp(doubled), 4, 4)
    assert a is not None and a == b


def test_resize_bmp_fail_soft():
    from hyppo_worker_spark.operators.multimodal import resize_bmp

    rgb = [[(1, 2, 3)] * 6 for _ in range(6)]
    src = _make_bmp(rgb)
    assert resize_bmp(src, 4, 4) is None  # 6 not divisible by 4
    assert resize_bmp(b"nope", 2, 2) is None
    assert resize_bmp(src, 0, 2) is None


def test_resize_images_bmp_decoder(spark):
    from hyppo_worker_spark.operators.multimodal import (
        _decode_bmp_bgr,
        resize_images,
    )

    rgb = [[((x + y) % 256, x % 256, y % 256) for x in range(8)]
           for y in range(8)]
    bmp = _make_bmp(rgb)
    from hyppo_worker_spark.operators.multimodal import MEDIA_SCHEMA

    md = {"width": 8, "height": 8, "sample_rate": None,
          "duration_ms": None, "format": "BMP"}
    rows = [
        (1, "image", bmp, md),
        (2, "image", b"not-a-bmp", md),
        (3, "audio", b"wav-ish", dict(md, format="WAV")),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r.media_id: r
        for r in resize_images(df, 4, 4, decoder="bmp").collect()
    }
    out = _decode_bmp_bgr(bytes(got[1].content))
    assert out.shape == (4, 4, 3)
    assert got[1].metadata["width"] == 4
    # non-BMP image and non-image rows pass through untouched
    assert bytes(got[2].content) == b"not-a-bmp"
    assert got[2].metadata["width"] == 8
    assert bytes(got[3].content) == b"wav-ish"
