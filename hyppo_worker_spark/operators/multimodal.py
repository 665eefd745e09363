"""Multimodal (image/audio/video) column plumbing.

Media items are rows with an opaque ``binary`` payload plus typed
metadata — the same "opaque bytes + manifest" stance the reference
takes for raw data files (``RemoteDataFile.scala:13-18``), lifted to
a first-class Spark schema. Decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` stages so the
bytes never leave the executor and the Python cost is amortized per
batch, not per row.

CODEC NOTE: this container has no image/audio codec *libraries* (no
PIL/ffmpeg), but formats whose payload is raw bytes need none:
header parsing (PNG/GIF/BMP/JPEG/WAV/MP4) and full 24-bpp BMP pixel
decode (:func:`decode_bmp_gray`) are REAL, pure ``struct``/numpy.
Only compressed-pixel/sample decoding is stubbed: ``decoder="fake"``
derives deterministic pseudo-pixels/samples from the payload via md5
— the Spark-side plumbing (schemas, batch iteration, explode
fan-out, partitioning) is real and tested. ``decoder="real"`` raises
``NotImplementedError`` until a codec library is provisioned.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)


def _fake_pixels(payload: bytes, n: int) -> np.ndarray:
    """Deterministic pseudo-decode: expand md5(payload) into n bytes."""
    out = bytearray()
    seed = hashlib.md5(payload).digest()
    block = seed
    while len(out) < n:
        block = hashlib.md5(block).digest()
        out.extend(block)
    return np.frombuffer(bytes(out[:n]), dtype=np.uint8)


def synth_media_df(spark: SparkSession, docs: DataFrame, kinds=("image", "audio", "video")) -> DataFrame:
    """Deterministic media table derived from the documents table:
    payload = text bytes, metadata derived from doc stats. Exists so
    multimodal plumbing is exercised on driver-provided data only."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in kinds]),
        (F.col("doc_id") % len(kinds) + 1).cast("int"),
    )
    meta = F.struct(
        F.when(kind == "image", (F.col("n_chars") % 64 + 8).cast("int")).alias("width"),
        F.when(kind == "image", (F.col("n_chars") % 48 + 8).cast("int")).alias("height"),
        F.when(kind == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
        F.when(kind == "video", (F.col("n_chars") * 10).cast("long")).alias("duration_ms"),
        F.upper(F.col("lang")).alias("format"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        meta.alias("metadata"),
    )


IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, mean_intensity double, std_intensity double"
)


def image_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Per-image intensity features via Arrow-batched mapInPandas."""
    if decoder == "real":
        raise NotImplementedError(
            "real image decoding needs PIL/opencv — not in this container"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf[pdf["kind"] == "image"]
            if pdf.empty:
                continue
            rows = []
            for _, r in pdf.iterrows():
                w = int(r["metadata"]["width"] or 8)
                h = int(r["metadata"]["height"] or 8)
                px = _fake_pixels(bytes(r["content"]), w * h).astype(np.float64)
                rows.append(
                    (int(r["media_id"]), w, h, float(px.mean()), float(px.std()))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "mean_intensity", "std_intensity"],
            )

    return df.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, decoder: str = "fake") -> DataFrame:
    """Resize stage: same schema out as in, payload replaced by the
    resized render, metadata updated. Plumbing-real: batched,
    schema-preserving, composes with writes.

    ``decoder="bmp"`` runs a REAL resize — :func:`resize_bmp`'s
    integer box-mean downsample over actually-decoded 24-bpp BMP
    pixels, re-encoded as a standard BMP (payloads that are not
    exactly-divisible BMPs pass through unchanged, fail-soft).
    ``decoder="fake"`` keeps the md5-chain pseudo-render for
    compressed formats; ``"real"`` stays gated on PIL."""
    if decoder == "real":
        raise NotImplementedError("real resize needs PIL — not in this container")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                md = dict(r["metadata"])
                content = bytes(r["content"])
                if r["kind"] == "image":
                    if decoder == "bmp":
                        resized = resize_bmp(content, width, height)
                        if resized is not None:
                            content = resized
                            md["width"], md["height"] = width, height
                    else:
                        content = _fake_pixels(content, width * height).tobytes()
                        md["width"], md["height"] = width, height
                out.append((int(r["media_id"]), r["kind"], content, md))
            yield pd.DataFrame(out, columns=["media_id", "kind", "content", "metadata"])

    return df.mapInPandas(batches, MEDIA_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_index int, ts_ms long, frame binary"


def sample_frames(df: DataFrame, every_ms: int = 1000, decoder: str = "fake") -> DataFrame:
    """Video frame sampling: one output row per sampled frame — the
    explode-style fan-out a real frame extractor would produce."""
    if decoder == "real":
        raise NotImplementedError("real frame extraction needs ffmpeg")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf[pdf["kind"] == "video"]
            if pdf.empty:
                continue
            rows = []
            for _, r in pdf.iterrows():
                duration = int(r["metadata"]["duration_ms"] or 0)
                content = bytes(r["content"])
                for i, ts in enumerate(range(0, duration, every_ms)):
                    frame = hashlib.md5(content + ts.to_bytes(8, "big")).digest()
                    rows.append((int(r["media_id"]), i, ts, frame))
            yield pd.DataFrame(rows, columns=["media_id", "frame_index", "ts_ms", "frame"])

    return df.mapInPandas(batches, FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = "media_id long, n_samples long, rms double, zero_crossings long"


def audio_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Per-clip audio stats from pseudo-decoded samples."""
    if decoder == "real":
        raise NotImplementedError("real audio decoding needs soundfile/ffmpeg")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf[pdf["kind"] == "audio"]
            if pdf.empty:
                continue
            rows = []
            for _, r in pdf.iterrows():
                samples = (
                    _fake_pixels(bytes(r["content"]), 2048).astype(np.float64) - 127.5
                ) / 127.5
                zc = int(((samples[:-1] * samples[1:]) < 0).sum())
                rows.append(
                    (
                        int(r["media_id"]),
                        len(samples),
                        float(np.sqrt((samples**2).mean())),
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "rms", "zero_crossings"]
            )

    return df.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


HEADER_SCHEMA = "media_id long, fmt string, width int, height int, n_bytes long"

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_GIF_MAGIC = b"GIF89a"
_BMP_MAGIC = b"BM"


def parse_image_headers(df: DataFrame) -> DataFrame:
    """REAL byte-level decode of image container headers — the first
    step any production media-manifest stage runs, implemented with
    stdlib ``struct`` only (no PIL/opencv, so it is NOT env-gated like
    the pixel codecs):

    - PNG: IHDR width/height, big-endian u32 at offset 16/20;
    - GIF (87a/89a): logical screen w/h, little-endian u16 at 6/8;
    - BMP: BITMAPINFOHEADER w/h, little-endian i32 at 18/22;
    - JPEG: a real MARKER WALK — segments are (0xFF, marker, u16-BE
      length) chains, so the frame size lives at a data-dependent
      offset; dimensions are height/width (BE u16) in the first
      SOF0/1/2 frame header. Standalone markers (RSTn/TEM) carry no
      length and are stepped over.

    Input needs (media_id, content:binary). Unknown/truncated payloads
    come back fmt='unknown', width/height NULL — fail-soft, the
    manifest row records the bytes either way. Arrow-batched
    mapInPandas; each batch is parsed with zero-copy memoryviews.
    """
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            rows = []
            for _, r in pdf.iterrows():
                b = bytes(r["content"])
                fmt, w, h = "unknown", None, None
                if b.startswith(_PNG_MAGIC) and len(b) >= 24:
                    fmt = "png"
                    w, h = struct.unpack(">II", b[16:24])
                elif b[:6] in (b"GIF89a", b"GIF87a") and len(b) >= 10:
                    fmt = "gif"
                    w, h = struct.unpack("<HH", b[6:10])
                elif b.startswith(_BMP_MAGIC) and len(b) >= 26:
                    fmt = "bmp"
                    w, h = struct.unpack("<ii", b[18:26])
                elif b.startswith(b"\xff\xd8"):
                    i = 2
                    while i + 4 <= len(b) and b[i] == 0xFF:
                        m = b[i + 1]
                        if m in (0xC0, 0xC1, 0xC2):
                            if i + 9 <= len(b):
                                fmt = "jpeg"
                                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                            break
                        if 0xD0 <= m <= 0xD9 or m == 0x01:
                            i += 2  # standalone marker, no length field
                            continue
                        (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
                        i += 2 + seglen
                rows.append((int(r["media_id"]), fmt, w, h, len(b)))
            yield pd.DataFrame(
                rows, columns=["media_id", "fmt", "width", "height", "n_bytes"]
            )

    return df.mapInPandas(batches, HEADER_SCHEMA)


WAV_SCHEMA = (
    "media_id long, n_channels int, sample_rate int, bits_per_sample int, "
    "n_samples long, duration_ms long"
)


def parse_wav_headers(df: DataFrame) -> DataFrame:
    """REAL byte-level decode of WAV/RIFF audio headers — the audio
    twin of :func:`parse_image_headers`, stdlib ``struct`` only (no
    ffmpeg/soundfile, so NOT env-gated like the sample codecs):

    - RIFF magic at 0, 'WAVE' at 8, 'fmt ' chunk at 12 (PCM layout);
    - channels/sample-rate/byte-rate/block-align/bits at LE offsets
      22/24/28/32/34;
    - 'data' chunk size (declared payload bytes) at LE offset 40;
      n_samples = data_size / block_align,
      duration_ms = data_size * 1000 / byte_rate (integer division —
      deterministic, and what a manifest stage records).

    Unknown/truncated payloads come back with NULL fields (fail-soft).
    Input needs (media_id, content:binary); Arrow-batched mapInPandas.
    """
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            rows = []
            for _, r in pdf.iterrows():
                b = bytes(r["content"])
                out = (None, None, None, None, None)
                if (
                    len(b) >= 44
                    and b[:4] == b"RIFF"
                    and b[8:12] == b"WAVE"
                    and b[12:16] == b"fmt "
                ):
                    (
                        _fmt_code,
                        channels,
                        rate,
                        byte_rate,
                        block_align,
                        bits,
                    ) = struct.unpack("<HHIIHH", b[20:36])
                    if b[36:40] == b"data" and block_align > 0 and byte_rate > 0:
                        (data_size,) = struct.unpack("<I", b[40:44])
                        out = (
                            channels,
                            rate,
                            bits,
                            data_size // block_align,
                            data_size * 1000 // byte_rate,
                        )
                rows.append((int(r["media_id"]), *out))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_channels",
                    "sample_rate",
                    "bits_per_sample",
                    "n_samples",
                    "duration_ms",
                ],
            )

    return df.mapInPandas(batches, WAV_SCHEMA)


MP4_SCHEMA = (
    "media_id long, major_brand string, minor_version int, "
    "ftyp_size int, next_box string, next_size long"
)


def parse_mp4_headers(df: DataFrame) -> DataFrame:
    """REAL byte-level decode of MP4 / ISO-BMFF container headers —
    the video leg of the header-decode trio (images
    :func:`parse_image_headers`, audio :func:`parse_wav_headers`),
    stdlib ``struct`` only:

    ISO-BMFF is a box sequence; every box = BE u32 size + 4-byte type.
    The first box must be ``ftyp`` (major brand + BE u32 minor
    version); this parser reads it and then WALKS to the next box
    header (typically ``moov``/``mdat``) using the declared size — a
    real two-box traversal, so a wrong size field or endianness breaks
    the walk, not just one field. Unknown/truncated payloads come back
    NULL (fail-soft). Arrow-batched mapInPandas.
    """
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            rows = []
            for _, r in pdf.iterrows():
                b = bytes(r["content"])
                out = (None, None, None, None, None)
                if len(b) >= 16 and b[4:8] == b"ftyp":
                    (fsize,) = struct.unpack(">I", b[0:4])
                    brand = b[8:12].decode("ascii", errors="replace")
                    (minor,) = struct.unpack(">I", b[12:16])
                    nbox, nsize = None, None
                    if len(b) >= fsize + 8:
                        (nsize,) = struct.unpack(">I", b[fsize:fsize + 4])
                        nbox = b[fsize + 4:fsize + 8].decode(
                            "ascii", errors="replace"
                        )
                    out = (brand, minor, fsize, nbox, nsize)
                rows.append((int(r["media_id"]), *out))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "major_brand",
                    "minor_version",
                    "ftyp_size",
                    "next_box",
                    "next_size",
                ],
            )

    return df.mapInPandas(batches, MP4_SCHEMA)


def decode_bmp_gray(b: bytes) -> "np.ndarray | None":
    """REAL pixel decode of an uncompressed 24-bpp BMP — pure
    ``struct``/numpy, no codec library (the pixel rows of a BI_RGB
    BMP are raw bytes after ``bfOffBits``; public format: Windows
    BITMAPINFOHEADER).

    Returns the grayscale image as an ``(h, w)`` int64 array in TOP-
    DOWN row order, or ``None`` for anything that is not a decodable
    24-bpp BI_RGB BMP (fail-soft, like the header parsers). Handles:

    - ``bfOffBits`` (LE u32 @10): pixel data at a declared, not fixed,
      offset (palette/ICC gaps are skipped correctly);
    - bottom-up (height > 0) vs top-down (height < 0) row order;
    - 4-byte row padding (``rowsize = ceil(3w/4)*4``) — pad bytes are
      ignored, so two files differing only in padding garbage decode
      identically;
    - BGR byte order (BMP stores blue first);
    - integer luma ``(77r + 151g + 28b) >> 8`` (the Rec.601 weights in
      8-bit fixed point — deterministic across platforms).
    """
    bgr = _decode_bmp_bgr(b)
    if bgr is None:
        return None
    blue = bgr[..., 0].astype(np.int64)
    green = bgr[..., 1].astype(np.int64)
    red = bgr[..., 2].astype(np.int64)
    return (77 * red + 151 * green + 28 * blue) >> 8


def _decode_bmp_bgr(b: bytes) -> "np.ndarray | None":
    """Shared 24-bpp BI_RGB pixel-array decode: ``(h, w, 3)`` uint8
    in TOP-DOWN row order, BGR channel order as stored (the contract
    every BMP consumer here builds on)."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bitcount = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if bitcount != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    topdown = h < 0
    h = abs(h)
    rowsize = ((w * 3 + 3) // 4) * 4
    if len(b) < off + rowsize * h:
        return None
    raw = np.frombuffer(b, dtype=np.uint8, count=rowsize * h, offset=off)
    rows = raw.reshape(h, rowsize)[:, : w * 3].reshape(h, w, 3)
    if not topdown:
        rows = rows[::-1]  # bottom-up file order -> top-down image
    return rows


def encode_bmp(bgr: "np.ndarray") -> bytes:
    """Encode an ``(h, w, 3)`` top-down BGR uint8 array as a
    standard bottom-up 24-bpp BI_RGB BMP (4-byte row padding)."""
    import struct as _s

    h, w = bgr.shape[:2]
    rowsize = ((w * 3 + 3) // 4) * 4
    hdr = (
        b"BM"
        + _s.pack("<IHHI", 54 + rowsize * h, 0, 0, 54)
        + _s.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, rowsize * h, 2835, 2835, 0, 0
        )
    )
    pad = b"\0" * (rowsize - w * 3)
    body = b"".join(
        bgr[y].astype(np.uint8).tobytes() + pad for y in range(h - 1, -1, -1)
    )
    return hdr + body


def resize_bmp(b: bytes, width: int, height: int) -> "bytes | None":
    """REAL resize of a 24-bpp BMP: integer box-mean downsample per
    channel (exact — every output pixel is ``sum // count`` over its
    source box), re-encoded as a standard BMP. Requires the source
    dimensions to be integer multiples of the target (the exactness
    contract: fractional boxes would need rounding policy that no
    SQL oracle could reproduce bit-for-bit); anything else — or any
    non-BMP payload — fails soft with ``None``."""
    bgr = _decode_bmp_bgr(b)
    if bgr is None:
        return None
    h, w = bgr.shape[:2]
    if width <= 0 or height <= 0 or w % width or h % height:
        return None
    ky, kx = h // height, w // width
    small = (
        bgr.astype(np.int64)
        .reshape(height, ky, width, kx, 3)
        .sum(axis=(1, 3))
        // (kx * ky)
    )
    return encode_bmp(small)


def ahash_bits_from_gray(gray: "np.ndarray") -> list[int]:
    """64-bit average hash over a real grayscale image: 8x8 integer
    block means (block (bx,by) covers rows [by*h//8,(by+1)*h//8) —
    exact uniform blocks when 8 | h,w), thresholded at the integer
    mean of the 64 block means; bit ``i = by*8 + bx`` packed into four
    16-bit bands (band ``i//16``, position ``i%16``). All-integer, so
    a K-times upscaled image (each pixel repeated KxK) produces the
    IDENTICAL hash: block sums scale by K^2 and ``(K^2*s)//(K^2*n) ==
    s//n`` — that is what makes visually-identical-but-byte-different
    renditions collide at Hamming 0."""
    h, w = gray.shape
    if h % 8 == 0 and w % 8 == 0:
        # vectorized fast path: one reshape-sum instead of 64 slice
        # ops (measured ~3x on the m06 corpus); identical integer
        # means, since uniform blocks == the boundary formula when
        # 8 | h,w
        sums = gray.reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
        means = [int(s) // ((h // 8) * (w // 8)) for s in sums.ravel()]
    else:
        means = []
        for by in range(8):
            r0, r1 = by * h // 8, (by + 1) * h // 8
            for bx in range(8):
                c0, c1 = bx * w // 8, (bx + 1) * w // 8
                block = gray[r0:r1, c0:c1]
                means.append(int(block.sum()) // block.size)
    m = sum(means) // 64
    bands = [0, 0, 0, 0]
    for i, bm in enumerate(means):
        if bm > m:
            bands[i // 16] |= 1 << (i % 16)
    return bands


def bmp_ahash_bands(df: DataFrame) -> DataFrame:
    """Perceptual aHash bands over REAL decoded BMP pixels —
    ``decoder="bmp"``: :func:`decode_bmp_gray` (struct/numpy pixel
    rows) + :func:`ahash_bits_from_gray`, Arrow-batched mapInPandas.
    Rows whose payload is not a decodable 24-bpp BMP are dropped
    (fail-soft manifest stance). Same output schema as the hex-chain
    fallback :func:`perceptual_ahash_bands`, so the banding/join
    stages downstream are decoder-agnostic."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                gray = decode_bmp_gray(bytes(r["content"]))
                if gray is None:
                    continue
                rows.append((int(r["media_id"]), *ahash_bits_from_gray(gray)))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["media_id", "b0", "b1", "b2", "b3"]
                )

    return df.select("media_id", "content").mapInPandas(batches, AHASH_SCHEMA)


def decode_wav_pcm(b: bytes) -> "np.ndarray | None":
    """REAL sample decode of a 16-bit PCM WAV — pure ``struct``/numpy
    (PCM sample data is raw little-endian int16 after the ``data``
    chunk header; public format: RIFF/WAVE). Unlike the fixed-offset
    header parser (:func:`parse_wav_headers`), this walks the RIFF
    CHUNK LIST — a real file may carry LIST/fact/cue chunks between
    ``fmt `` and ``data``, and odd-sized chunks are padded to even
    offsets per the spec. Returns the samples as an int16 array
    (channels interleaved, as stored), or ``None`` for anything that
    is not an uncompressed 16-bit PCM WAV."""
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    fmt_ok = False
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        csz = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = pos + 8
        if cid == b"fmt " and csz >= 16:
            code = int.from_bytes(b[body : body + 2], "little")
            bits = int.from_bytes(b[body + 14 : body + 16], "little")
            if code != 1 or bits != 16:  # PCM, 16-bit only
                return None
            fmt_ok = True
        elif cid == b"data":
            if not fmt_ok or len(b) < body + csz:
                return None
            return np.frombuffer(b, dtype="<i2", count=csz // 2, offset=body)
        pos = body + csz + (csz & 1)  # chunks pad to even offsets
    return None


def audio_pcm_features(df: DataFrame) -> DataFrame:
    """Integer-exact per-clip features over REAL decoded PCM samples
    (``decoder="wav"``): sample count, energy (sum of squares),
    zero-crossing count (strict sign product < 0), and peak absolute
    amplitude — all int64, so an oracle recomputing from the same
    sample values matches bit-for-bit. Rows whose payload is not
    16-bit PCM WAV are dropped (fail-soft). Arrow-batched
    mapInPandas, same stance as :func:`bmp_ahash_bands`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                s = decode_wav_pcm(bytes(r["content"]))
                if s is None:
                    continue
                v = s.astype(np.int64)
                rows.append(
                    (
                        int(r["media_id"]),
                        len(v),
                        int((v * v).sum()),
                        int(((v[:-1] * v[1:]) < 0).sum()) if len(v) > 1 else 0,
                        int(np.abs(v).max()) if len(v) else 0,
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id",
                        "n_samples",
                        "sum_sq",
                        "zero_crossings",
                        "peak_abs",
                    ],
                )

    return df.select("media_id", "content").mapInPandas(
        batches, PCM_FEATURES_SCHEMA
    )


PCM_FEATURES_SCHEMA = (
    "media_id long, n_samples long, sum_sq long, "
    "zero_crossings long, peak_abs long"
)


AHASH_SCHEMA = "media_id long, b0 int, b1 int, b2 int, b3 int"


def perceptual_ahash_bands(df: DataFrame) -> DataFrame:
    """64-bit average-hash (aHash) per media payload as 4x16-bit
    bands, via Arrow-batched mapInPandas over the binary content
    column — the perceptual-dedup first stage (public technique:
    mean-threshold bits over a downscaled grayscale image).

    The pixel stage uses the deterministic fake decode (no codec in
    this container), but derived through a HEX-STRING md5 chain
    (h1 = md5hex(md5hex(payload)), h_{i+1} = md5hex(h_i); pixels =
    the 64 bytes of h1..h4) rather than `_fake_pixels`' raw-digest
    chain: DuckDB's md5() only accepts VARCHAR, so only the
    hex-chain is reproducible by the SQL oracle — which is the point
    of m06: every byte of the binary Arrow transfer, the threshold,
    and the band packing is independently verified. Swap the pixel
    stage for a real decoder + 8x8 downscale when PIL lands; the
    banding/join stages are decode-agnostic.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                s0 = hashlib.md5(bytes(r["content"])).hexdigest()
                hx = ""
                block = s0
                for _i in range(4):
                    block = hashlib.md5(block.encode()).hexdigest()
                    hx += block
                px = bytes.fromhex(hx)
                m = sum(px) // 64
                bands = [
                    sum(
                        (1 << i)
                        for i in range(16)
                        if px[16 * b + i] > m
                    )
                    for b in range(4)
                ]
                rows.append((int(r["media_id"]), *bands))
            yield pd.DataFrame(
                rows, columns=["media_id", "b0", "b1", "b2", "b3"]
            )

    return df.select("media_id", "content").mapInPandas(batches, AHASH_SCHEMA)


def decode_avi_dib(b: bytes) -> "dict | None":
    """REAL frame decode of a minimal uncompressed AVI — pure
    ``struct``/numpy, no codec library (raw 'DIB ' frames are
    bottom-up BGR pixel rows, the same layout as BMP pixel data;
    public format: RIFF/AVI, Microsoft AVI RIFF reference).

    Walks the RIFF CHUNK TREE rather than assuming fixed offsets — a
    real file carries nested LISTs (``hdrl`` → ``strl``) before
    ``movi`` and alignment ``JUNK`` chunks between frames, and every
    odd-sized chunk pads to an even offset per the spec. Reads the
    frame cadence (``dwMicroSecPerFrame``) and declared frame count
    from ``avih``, dimensions + bit depth from the stream-format
    BITMAPINFOHEADER, then collects ``00db``/``00dc`` frames in movi
    order. Returns ``{us_per_frame, n_frames, frames: [(h, w) int64
    grayscale arrays (Rec.601 integer luma, top-down)]}``, or
    ``None`` for anything that is not a 24-bpp DIB AVI (fail-soft,
    like the other parsers)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    us_per_frame = n_declared = None
    w = h = None
    stream_type = None  # fccType of the enclosing strl's strh
    frames: list = []

    def walk(pos: int, end: int, in_movi: bool) -> bool:
        nonlocal us_per_frame, n_declared, w, h, stream_type
        while pos + 8 <= end:
            cid = b[pos : pos + 4]
            csz = int.from_bytes(b[pos + 4 : pos + 8], "little")
            body = pos + 8
            if body + csz > end:
                return False  # truncated chunk
            if cid == b"LIST":
                ltype = b[body : body + 4]
                if ltype == b"strl":
                    stream_type = None  # each strl declares its own strh
                if not walk(
                    body + 4, body + csz, in_movi or ltype == b"movi"
                ):
                    return False
            elif cid == b"avih" and csz >= 56:
                us_per_frame = int.from_bytes(b[body : body + 4], "little")
                n_declared = int.from_bytes(
                    b[body + 16 : body + 20], "little"
                )
            elif cid == b"strh" and csz >= 4:
                stream_type = b[body : body + 4]
            elif cid == b"strf" and csz >= 40:
                # strf's layout depends on the stream: only a 'vids'
                # strf is a BITMAPINFOHEADER — an audio stream's
                # WAVEFORMATEX here would misread bitcount and a second
                # video stream must not overwrite the first's w/h.
                if stream_type == b"vids" and w is None:
                    w = int.from_bytes(
                        b[body + 4 : body + 8], "little", signed=True
                    )
                    h = int.from_bytes(
                        b[body + 8 : body + 12], "little", signed=True
                    )
                    bitcount = int.from_bytes(
                        b[body + 14 : body + 16], "little"
                    )
                    if bitcount != 24:
                        return False
            elif in_movi and cid in (b"00db", b"00dc"):
                frames.append((body, csz))
            pos = body + csz + (csz & 1)  # even-offset padding
        return True

    if not walk(12, len(b), False):
        return None
    if us_per_frame is None or not frames or not w or not h or h <= 0:
        return None
    rowsize = ((w * 3 + 3) // 4) * 4
    gray_frames = []
    for body, csz in frames:
        if csz < rowsize * h:
            return None
        raw = np.frombuffer(b, dtype=np.uint8, count=rowsize * h, offset=body)
        rows = raw.reshape(h, rowsize)[:, : w * 3].reshape(h, w, 3)[::-1]
        blue = rows[..., 0].astype(np.int64)
        green = rows[..., 1].astype(np.int64)
        red = rows[..., 2].astype(np.int64)
        gray_frames.append((77 * red + 151 * green + 28 * blue) >> 8)
    if n_declared is not None and n_declared != len(gray_frames):
        return None  # header/stream disagreement
    return {
        "us_per_frame": us_per_frame,
        "n_frames": len(gray_frames),
        "frames": gray_frames,
    }


FRAME_SAMPLE_SCHEMA = (
    "media_id long, frame_idx int, mean_gray long, peak_gray long, "
    "n_frames int, dur_ms long"
)


def sample_video_frames(df: DataFrame, every_ms: int = 120) -> DataFrame:
    """Deterministic every-k-th frame sampling over REAL decoded AVI
    frames: the sampling stride comes from the file's own declared
    cadence (``ceil(every_ms / frame_ms)``), so the operator reads
    metadata, not a constant. Per sampled frame: integer mean and
    peak luma (exact — the oracle recomputes both from the pixel
    formula). One row per sampled frame; fail-soft rows are dropped
    (undecodable payloads produce nothing, like the header parsers).

    Scale shape: mapInPandas over (media_id, content) only — each
    video decodes once inside its Arrow batch, emits a handful of
    integer rows, and nothing is ever collected driver-side."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                dec = decode_avi_dib(bytes(r["content"]))
                if dec is None or dec["us_per_frame"] <= 0:
                    continue
                frame_ms = dec["us_per_frame"] // 1000
                step = max(
                    1, -(-every_ms // max(1, frame_ms))
                )  # ceil division
                nf = dec["n_frames"]
                for f in range(0, nf, step):
                    g = dec["frames"][f]
                    rows.append(
                        (
                            int(r["media_id"]),
                            f,
                            int(g.sum()) // g.size,
                            int(g.max()),
                            nf,
                            nf * frame_ms,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "mean_gray", "peak_gray",
                    "n_frames", "dur_ms",
                ],
            )

    return df.select("media_id", "content").mapInPandas(
        batches, FRAME_SAMPLE_SCHEMA
    )
