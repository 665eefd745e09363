"""Multimodal-column queries, oracle-checked.

The media table is synthesized deterministically from ``documents``
(payload = utf-8 text bytes, kind = doc_id % 3, typed metadata), so
the multimodal plumbing runs on driver-provided data only.

m01 is deliberately a *plumbing proof*: the manifest (byte length +
md5 digest + typed metadata) is computed in Python inside an
Arrow-batched ``mapInPandas`` stage — if any layer (binary encoding,
Arrow transfer, batch iteration, struct metadata access) corrupted a
single byte, the digest would diverge from DuckDB's, which computes
the same manifest directly over the source text. Decode-dependent
features (``image_features`` etc.) stay test-covered but not
oracle-checked: their pseudo-pixels come from an md5 expansion chain
that SQL cannot reasonably mirror.
"""

from __future__ import annotations

from collections.abc import Iterator

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hyppo_worker_spark.operators.multimodal import synth_media_df
from hyppo_worker_spark.queries import register
from hyppo_worker_spark.session import load_tables, tracked_persist

_MANIFEST_SCHEMA = (
    "media_id long, kind string, n_bytes long, digest string, fmt string"
)


@register(
    "m01_media_manifest",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image'
                           WHEN 1 THEN 'audio'
                           ELSE 'video' END AS kind,
           octet_length(text::BLOB) AS n_bytes,
           md5(text) AS digest,
           upper(lang) AS fmt
    FROM documents
    ORDER BY media_id
    """,
    tags=("multimodal", "binary", "mapInPandas", "manifest"),
)
def m01_media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media manifest computed Python-side over Arrow batches: byte
    length + md5 digest of every opaque payload plus typed metadata."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    media = synth_media_df(spark, docs)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "digest": pdf["content"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "fmt": pdf["metadata"].map(lambda m: m["format"]),
                }
            )

    return media.mapInPandas(batches, _MANIFEST_SCHEMA).orderBy("media_id")


# --------------------------------------------------------------------------
# m02 — REAL binary decode of image container headers. The payloads
# are valid PNG/GIF/BMP header bytes CONSTRUCTED JVM-SIDE (Spark SQL
# unhex/concat with dims derived from doc_id), then parsed back
# Python-side by struct.unpack over Arrow batches
# (operators/multimodal.py::parse_image_headers). The oracle computes
# the expected dimensions from the same doc_id formula — so a parser
# reading the wrong offsets/endianness, or any corruption in the
# binary column's Arrow transfer, breaks the hash. This is the
# un-gated first stage of a production media pipeline (magic sniff +
# header decode); pixel codecs stay env-gated.
# --------------------------------------------------------------------------


def _le16(col: str) -> str:
    return (
        f"unhex(concat(substr(lpad(hex({col}), 4, '0'), 3, 2), "
        f"substr(lpad(hex({col}), 4, '0'), 1, 2)))"
    )


def _le32(col: str) -> str:
    h = f"lpad(hex({col}), 8, '0')"
    return (
        f"unhex(concat(substr({h}, 7, 2), substr({h}, 5, 2), "
        f"substr({h}, 3, 2), substr({h}, 1, 2)))"
    )


def _be32(col: str) -> str:
    return f"unhex(lpad(hex({col}), 8, '0'))"


def _be16(col: str) -> str:
    return f"unhex(lpad(hex({col}), 4, '0'))"


@register(
    "m02_media_header_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                WHEN 2 THEN 'bmp' ELSE 'jpeg' END AS fmt,
           CAST(16 + doc_id % 1000 AS INTEGER) AS width,
           CAST(16 + (doc_id * 7) % 1000 AS INTEGER) AS height,
           CAST(CASE doc_id % 4 WHEN 0 THEN 29 WHEN 1 THEN 13
                WHEN 2 THEN 26 ELSE 33 END AS BIGINT) AS n_bytes
    FROM documents
    ORDER BY media_id
    """,
    tags=("multimodal", "binary", "decode", "mapInPandas"),
)
def m02_media_header_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse width/height/format out of raw PNG/GIF/BMP/JPEG header
    bytes (JPEG dimensions sit behind a real marker walk — an APP0
    segment precedes the SOF0 frame header, so the parser must chain
    segment lengths, not read a fixed offset)."""
    from hyppo_worker_spark.operators.multimodal import parse_image_headers

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    w, h = "(16 + doc_id % 1000)", "(16 + (doc_id * 7) % 1000)"
    png = (
        "concat(unhex('89504E470D0A1A0A'), unhex('0000000D'), "
        f"unhex('49484452'), {_be32(w)}, {_be32(h)}, unhex('0806000000'))"
    )
    gif = f"concat(unhex('474946383961'), {_le16(w)}, {_le16(h)}, unhex('F70000'))"
    bmp = (
        f"concat(unhex('424D'), {_le32('62')}, unhex('00000000'), "
        f"{_le32('54')}, {_le32('40')}, {_le32(w)}, {_le32(h)})"
    )
    jpeg = (
        # SOI + APP0/JFIF (16-byte segment) + SOF0: len 11, precision 8,
        # height/width BE16, 1 component (id 1, sampling 0x11, quant 0)
        "concat(unhex('FFD8'), unhex('FFE000104A46494600010100000100010000'), "
        f"unhex('FFC0000B08'), {_be16(h)}, {_be16(w)}, unhex('01110000'))"
    )
    media = docs.selectExpr(
        "doc_id AS media_id",
        f"CASE doc_id % 4 WHEN 0 THEN {png} WHEN 1 THEN {gif} "
        f"WHEN 2 THEN {bmp} ELSE {jpeg} END AS content",
    )
    return parse_image_headers(media).orderBy("media_id")


# --------------------------------------------------------------------------
# m03 — WAV/RIFF audio header decode: the audio twin of m02. Payloads
# are synthesized JVM-side (unhex/concat, every multi-byte field
# little-endian via _le16/_le32) with channels/rate/sample-count
# derived from doc_id, then parsed back by struct.unpack over Arrow
# batches (operators/multimodal.py::parse_wav_headers). The oracle
# recomputes the expected fields from the same doc_id formulas, so a
# parser reading wrong offsets/endianness — or any corruption in the
# binary Arrow transfer — breaks the hash. Duration is integer
# division (data_size*1000 // byte_rate): engine-exact. Audio decode
# is no longer fully env-gated: the manifest's header stage runs for
# real; only sample codecs remain gated.
# --------------------------------------------------------------------------
_M03_CH = "(1 + doc_id % 2)"
_M03_RATE = "(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END)"
_M03_NSAMP = "(100 + doc_id % 900)"


@register(
    "m03_audio_header_decode",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST({_M03_CH} AS INTEGER) AS n_channels,
           CAST({_M03_RATE} AS INTEGER) AS sample_rate,
           CAST(16 AS INTEGER) AS bits_per_sample,
           CAST({_M03_NSAMP} AS BIGINT) AS n_samples,
           CAST(({_M03_NSAMP} * {_M03_CH} * 2 * 1000)
                // ({_M03_RATE} * {_M03_CH} * 2) AS BIGINT) AS duration_ms
    FROM documents
    ORDER BY media_id
    """,
    tags=("multimodal", "audio", "binary", "decode", "mapInPandas"),
)
def m03_audio_header_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse channels/rate/bits/samples/duration out of raw WAV header
    bytes built field-by-field JVM-side."""
    from hyppo_worker_spark.operators.multimodal import parse_wav_headers

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ch, rate, nsamp = _M03_CH, _M03_RATE, _M03_NSAMP
    block = f"({ch} * 2)"
    byte_rate = f"({rate} * {block})"
    data_size = f"({nsamp} * {block})"
    wav = (
        "concat(unhex('52494646'), "  # 'RIFF'
        f"{_le32(f'(36 + {data_size})')}, "
        "unhex('57415645'), "  # 'WAVE'
        "unhex('666D7420'), "  # 'fmt '
        f"{_le32('16')}, "  # fmt chunk size
        f"{_le16('1')}, "  # PCM
        f"{_le16(ch)}, {_le32(rate)}, {_le32(byte_rate)}, "
        f"{_le16(block)}, {_le16('16')}, "
        "unhex('64617461'), "  # 'data'
        f"{_le32(data_size)})"
    )
    media = docs.selectExpr("doc_id AS media_id", f"{wav} AS content")
    return parse_wav_headers(media).orderBy("media_id")


# --------------------------------------------------------------------------
# m04 — MP4 / ISO-BMFF header decode: the video leg of the trio (m02
# images, m03 audio). Payloads are a valid ftyp box followed by the
# next box header, built JVM-side with BIG-endian fields (_be32 —
# ISO-BMFF is BE, unlike WAV), parsed back by a struct box-walk that
# must use the DECLARED ftyp size to find the second box — so a wrong
# size or endianness breaks the walk, not just one field. Oracle
# recomputes everything from the id formulas.
# --------------------------------------------------------------------------
_M04_MINOR = "(doc_id % 100)"
_M04_NEXT_SIZE = "(1000 + doc_id % 5000)"


@register(
    "m04_video_header_decode",
    oracle=f"""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42'
                ELSE 'avc1' END AS major_brand,
           CAST({_M04_MINOR} AS INTEGER) AS minor_version,
           CAST(16 AS INTEGER) AS ftyp_size,
           CASE doc_id % 2 WHEN 0 THEN 'moov' ELSE 'mdat' END AS next_box,
           CAST({_M04_NEXT_SIZE} AS BIGINT) AS next_size
    FROM documents
    ORDER BY media_id
    """,
    tags=("multimodal", "video", "binary", "decode", "mapInPandas"),
)
def m04_video_header_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse brand/minor-version and walk to the next box header out
    of raw ISO-BMFF bytes built field-by-field JVM-side."""
    from hyppo_worker_spark.operators.multimodal import parse_mp4_headers

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    brand = (
        "CASE doc_id % 3 WHEN 0 THEN unhex('69736F6D') "  # 'isom'
        "WHEN 1 THEN unhex('6D703432') "  # 'mp42'
        "ELSE unhex('61766331') END"  # 'avc1'
    )
    next_box = (
        "CASE doc_id % 2 WHEN 0 THEN unhex('6D6F6F76') "  # 'moov'
        "ELSE unhex('6D646174') END"  # 'mdat'
    )
    mp4 = (
        f"concat({_be32('16')}, unhex('66747970'), "  # size + 'ftyp'
        f"{brand}, {_be32(_M04_MINOR)}, "
        f"{_be32(_M04_NEXT_SIZE)}, {next_box})"
    )
    media = docs.selectExpr("doc_id AS media_id", f"{mp4} AS content")
    return parse_mp4_headers(media).orderBy("media_id")


# --------------------------------------------------------------------------
# m05 — multimodal feature fusion: the join that makes a multimodal
# training table — per-media numeric features (derived here from the
# payload digest, deterministically — stand-ins for the env-gated
# pixel/sample features) concatenated onto the text EMBEDDING vector
# keyed by id. The plumbing that matters at 100 TB is relational: an
# id-keyed equi-join of two feature tables, array concat JVM-side, and
# fold-order-deterministic norms — no UDF anywhere. Audited per
# (label, media kind) with integer-scaled squared norms, which the
# oracle reproduces exactly (concat norm² = emb norm² + feature norm²
# is checked implicitly by value equality).
# --------------------------------------------------------------------------
@register(
    "m05_fused_features",
    oracle="""
    WITH feats AS (
        SELECT doc_id AS vec_id,
               CASE doc_id % 3 WHEN 0 THEN 'image'
                               WHEN 1 THEN 'audio'
                               ELSE 'video' END AS kind,
               list_transform(range(0, 4),
                   j -> (('0x' || substr(md5(text), j * 4 + 1, 4))::BIGINT)
                        / 65535.0) AS mf
        FROM documents
    ),
    fused AS (
        SELECT e.label, f.kind,
               list_concat(e.embedding::DOUBLE[], f.mf) AS v
        FROM embeddings e JOIN feats f USING (vec_id)
    )
    SELECT label, kind,
           count(*) AS n_vecs,
           max(len(v)) AS fused_dim,
           CAST(sum(CAST(floor(list_reduce(list_transform(
                    range(1, len(v) + 1), i -> v[i] * v[i]),
                    (x, y) -> x + y) * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_nsq_u6
    FROM fused GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("multimodal", "fusion", "join", "vectors"),
)
def m05_fused_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding vectors fused with per-media digest-derived features
    (id-keyed join + array concat), audited per (label, kind) with
    integer-scaled fold norms."""
    from hyppo_worker_spark.functions import vectors as V

    t = load_tables(spark, sf_dir, ("documents", "embeddings"))
    feats = t["documents"].select(
        F.col("doc_id").alias("vec_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.array(
            *[
                (
                    F.conv(
                        F.substring(F.md5("text"), j * 4 + 1, 4), 16, 10
                    ).cast("bigint")
                    / 65535.0
                )
                for j in range(4)
            ]
        ).alias("mf"),
    )
    fused = (
        t["embeddings"]
        .join(feats, "vec_id")
        .select(
            "label",
            "kind",
            F.concat(V.as_double(F.col("embedding")), F.col("mf")).alias("v"),
        )
    )
    return (
        fused.groupBy("label", "kind")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.max(F.size("v")).alias("fused_dim"),
            F.sum(
                F.floor(V.dot(F.col("v"), F.col("v")) * 1000000).cast("long")
            ).cast("long").alias("sum_nsq_u6"),
        )
        .orderBy("label", "kind")
    )


# --------------------------------------------------------------------------
# m06 — perceptual near-duplicate detection over REAL decoded pixels:
# the image-dedup bridge between the multimodal and dedup families.
# Payloads are complete, valid 24-bpp BMP FILES constructed JVM-side
# (struct-packed header + per-pixel BGR bytes from a doc_id-seeded
# formula with an x*y cross-term — a pure additive offset would shift
# every block mean AND the threshold equally, collapsing all hashes);
# `operators/multimodal.py:bmp_ahash_bands` decodes the actual pixel
# rows (bfOffBits offset, bottom-up order, BGR, Rec.601 integer luma)
# and computes an 8x8 block-mean aHash. The PLANTED near-dups are 2x
# UPSCALED renditions (32x32 vs 16x16) — visually identical, byte-
# different files that must land at Hamming 0 because integer block
# means are scale-exact; the oracle derives their hash from the base
# grid, so any decode defect (row flip, BGR swap, wrong offset,
# padding leak) breaks the match. Candidates share a 16-bit band
# (d04's SimHash banding applied to media), verified by exact Hamming
# distance over the XOR'd bands. At 100 TB: one mapInPandas scan, a
# 4-way band explode, a band-keyed equi-join — never an all-pairs
# compare. (The md5 hex-chain fallback `perceptual_ahash_bands`
# remains for compressed formats, pytest-covered.)
# --------------------------------------------------------------------------
_M06_LUMA = "(77 * p + 151 * ((3 * p) % 256) + 28 * ((7 * p) % 256)) // 256"


def _bmp_header_hex(w: int, h: int) -> str:
    """54-byte BMP header (BITMAPFILEHEADER + BITMAPINFOHEADER) for an
    uncompressed 24-bpp bottom-up image, as a hex literal."""
    import struct as _s

    rowsize = ((w * 3 + 3) // 4) * 4
    hdr = (
        b"BM"
        + _s.pack("<IHHI", 54 + rowsize * h, 0, 0, 54)
        + _s.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, rowsize * h, 2835, 2835, 0, 0
        )
    )
    return hdr.hex().upper()


def _bmp_sql(src: str, w: int, h: int, scale: int = 1) -> str:
    """Spark SQL expression producing a complete 24-bpp BMP file for
    one row: constant header + bottom-up BGR pixel rows built with
    nested transform() lambdas. ``scale`` > 1 renders the SAME visual
    content pixel-doubled (x/scale, y/scale sampling)."""
    xs = f"(x div {scale})" if scale > 1 else "x"
    ys = f"(y div {scale})" if scale > 1 else "y"
    p = f"pmod({src}*31 + {xs}*7 + {ys}*13 + pmod({src}, 13)*{xs}*{ys}, 256)"
    pix = (
        f"concat(lpad(hex(pmod({p} * 7, 256)), 2, '0'), "  # B
        f"lpad(hex(pmod({p} * 3, 256)), 2, '0'), "  # G
        f"lpad(hex({p}), 2, '0'))"  # R
    )
    row = f"array_join(transform(sequence(0, {w - 1}), x -> {pix}), '')"
    data = f"array_join(transform(sequence({h - 1}, 0, -1), y -> {row}), '')"
    return f"unhex(concat('{_bmp_header_hex(w, h)}', {data}))"


@register(
    "m06_perceptual_neardup",
    oracle=f"""
    WITH media AS (
        SELECT doc_id AS media_id, doc_id AS src FROM documents
        UNION ALL
        SELECT doc_id + 1000000, doc_id FROM documents WHERE doc_id % 9 = 0
    ),
    bm AS (
        SELECT media_id, CAST(ty * 8 + tx AS INT) AS i,
               CAST(sum({_M06_LUMA}) // 4 AS BIGINT) AS bmean
        FROM (
            SELECT media_id, tx, ty,
                   (src*31 + (tx*2+dx)*7 + (ty*2+dy)*13
                    + (src % 13)*(tx*2+dx)*(ty*2+dy)) % 256 AS p
            FROM media, range(0,8) a(tx), range(0,8) b(ty),
                 range(0,2) c(dx), range(0,2) d(dy)
        )
        GROUP BY media_id, tx, ty
    ),
    thr AS (
        SELECT media_id, CAST(sum(bmean) // 64 AS BIGINT) AS m
        FROM bm GROUP BY media_id
    ),
    bits AS (
        SELECT bm.media_id, CAST(i // 16 AS INT) AS band_id,
               CAST(sum(CASE WHEN bmean > m THEN (1 << (i % 16))
                             ELSE 0 END) AS INT) AS band_val
        FROM bm JOIN thr USING (media_id)
        GROUP BY bm.media_id, i // 16
    ),
    bands4 AS (
        SELECT media_id,
               max(CASE WHEN band_id = 0 THEN band_val END) AS b0,
               max(CASE WHEN band_id = 1 THEN band_val END) AS b1,
               max(CASE WHEN band_id = 2 THEN band_val END) AS b2,
               max(CASE WHEN band_id = 3 THEN band_val END) AS b3
        FROM bits GROUP BY media_id
    ),
    cand AS (
        SELECT DISTINCT l.media_id AS a_id, r.media_id AS b_id
        FROM bits l JOIN bits r
          ON l.band_id = r.band_id AND l.band_val = r.band_val
         AND l.media_id < r.media_id
    ),
    ham AS (
        SELECT c.a_id, c.b_id,
               CAST(bit_count(xor(ba.b0::BIGINT, bb.b0::BIGINT))
                  + bit_count(xor(ba.b1::BIGINT, bb.b1::BIGINT))
                  + bit_count(xor(ba.b2::BIGINT, bb.b2::BIGINT))
                  + bit_count(xor(ba.b3::BIGINT, bb.b3::BIGINT)) AS INT)
                   AS hamming
        FROM cand c
        JOIN bands4 ba ON ba.media_id = c.a_id
        JOIN bands4 bb ON bb.media_id = c.b_id
    )
    SELECT a_id, b_id, hamming FROM ham
    WHERE hamming <= 4 ORDER BY a_id, b_id
    """,
    tags=("multimodal", "dedup", "perceptual", "ahash", "bmp", "mapInPandas"),
)
def m06_perceptual_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual (aHash over REAL decoded BMP pixels) near-dup pairs
    with planted 2x-upscaled renditions: band-keyed candidates, exact
    Hamming <= 4."""
    from hyppo_worker_spark.operators.multimodal import bmp_ahash_bands

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    media = docs.selectExpr(
        "doc_id AS media_id", f"{_bmp_sql('doc_id', 16, 16)} AS content"
    ).unionByName(
        docs.filter(F.col("doc_id") % 9 == 0).selectExpr(
            "doc_id + 1000000 AS media_id",
            f"{_bmp_sql('doc_id', 32, 32, scale=2)} AS content",
        )
    )
    bands = bmp_ahash_bands(media).transform(tracked_persist)
    eb = bands.select(
        "media_id",
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(b) for b in range(4)]).alias("band_id"),
                F.array("b0", "b1", "b2", "b3").alias("band_val"),
            )
        ).alias("z"),
    ).select(
        "media_id",
        F.col("z.band_id").alias("band_id"),
        F.col("z.band_val").alias("band_val"),
    )
    cand = (
        eb.alias("l")
        .join(
            eb.alias("r"),
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l.media_id") < F.col("r.media_id")),
        )
        .select(
            F.col("l.media_id").alias("a_id"),
            F.col("r.media_id").alias("b_id"),
        )
        .distinct()
    )
    ba = bands.select(
        F.col("media_id").alias("a_id"),
        *[F.col(f"b{i}").alias(f"a{i}") for i in range(4)],
    )
    bb = bands.select(
        F.col("media_id").alias("b_id"),
        *[F.col(f"b{i}").alias(f"bb{i}") for i in range(4)],
    )
    hamming = sum(
        F.bit_count(
            F.col(f"a{i}").cast("long").bitwiseXOR(
                F.col(f"bb{i}").cast("long")
            )
        )
        for i in range(4)
    ).cast("int")
    return (
        cand.join(ba, "a_id")
        .join(bb, "b_id")
        .select("a_id", "b_id", hamming.alias("hamming"))
        .filter(F.col("hamming") <= 4)
        .orderBy("a_id", "b_id")
    )


# --------------------------------------------------------------------------
# m07 — REAL PCM sample decode: the audio twin of m06's pixel decode
# (raw-byte formats need no codec library). Payloads are complete
# 16-bit PCM WAV FILES built field-by-field JVM-side — RIFF sizes in
# SQL, a deliberate odd-sized junk 'LIST' chunk BETWEEN fmt and data
# (so a fixed-offset reader cannot find the samples; the decoder must
# walk the chunk list and honor even-offset padding), and per-sample
# little-endian two's-complement int16 bytes from a doc_id-seeded
# formula. `operators/multimodal.py:decode_wav_pcm` walks the chunks
# and returns real samples; features are ALL-INTEGER (count, energy
# sum-of-squares, strict zero crossings, peak |amplitude|) so the
# oracle recomputing from the same formula matches bit-for-bit. Any
# drift — endianness, two's complement, chunk walk, padding — breaks
# the hash.
# --------------------------------------------------------------------------
def _wav_pcm_sql(src: str) -> str:
    """Spark SQL expression producing one complete 16-bit mono PCM WAV
    with an odd-sized junk chunk before data."""
    n = f"(64 + {src} % 64)"
    samp = f"(pmod({src}*31 + i*7, 2048) - 1024)"
    u16 = f"lpad(hex(pmod({samp}, 65536)), 4, '0')"
    le = f"concat(substr({u16}, 3, 2), substr({u16}, 1, 2))"
    data = f"array_join(transform(sequence(0, {n} - 1), i -> {le}), '')"
    return (
        f"concat(unhex('52494646'), {_le32(f'(50 + {n}*2)')}, "  # RIFF size
        "unhex('57415645'), "  # WAVE
        f"unhex('666D7420'), {_le32('16')}, "  # 'fmt ' + size
        f"{_le16('1')}, {_le16('1')}, "  # PCM, mono
        f"{_le32('16000')}, {_le32('32000')}, "  # rate, byte rate
        f"{_le16('2')}, {_le16('16')}, "  # block align, bits
        # odd-sized junk chunk: 'LIST' size 5, 5 bytes 'JUNK*', 1 pad
        f"unhex('4C495354'), {_le32('5')}, unhex('4A554E4B2A00'), "
        f"unhex('64617461'), {_le32(f'({n}*2)')}, unhex({data}))"
    )


@register(
    "m07_audio_pcm_features",
    oracle="""
    WITH media AS (
        SELECT doc_id AS src, source, 64 + doc_id % 64 AS n
        FROM documents
    ),
    idx AS (
        SELECT src, source, unnest(range(0, n)) AS i FROM media
    ),
    samples AS (
        SELECT src, source, i,
               ((src*31 + i*7) % 2048) - 1024 AS s,
               CASE WHEN i > 0
                    THEN ((src*31 + (i-1)*7) % 2048) - 1024 END AS sp
        FROM idx
    )
    SELECT source,
           CAST(count(DISTINCT src) AS BIGINT) AS n_clips,
           CAST(count(*) AS BIGINT) AS total_samples,
           CAST(sum(s*s) AS BIGINT) AS total_sum_sq,
           CAST(sum(CASE WHEN sp*s < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS total_zero_crossings,
           CAST(max(abs(s)) AS BIGINT) AS max_peak
    FROM samples
    GROUP BY source
    ORDER BY source
    """,
    tags=("multimodal", "audio", "pcm", "decode", "mapInPandas"),
)
def m07_audio_pcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source integer-exact audio stats over REAL decoded PCM
    samples of JVM-built WAV files (chunk-walk decoder)."""
    from hyppo_worker_spark.operators.multimodal import audio_pcm_features

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    media = docs.selectExpr(
        "doc_id AS media_id",
        "source",
        f"{_wav_pcm_sql('doc_id')} AS content",
    )
    feats = audio_pcm_features(media)
    return (
        feats.join(media.select("media_id", "source"), "media_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clips"),
            F.sum("n_samples").cast("long").alias("total_samples"),
            F.sum("sum_sq").cast("long").alias("total_sum_sq"),
            F.sum("zero_crossings")
            .cast("long")
            .alias("total_zero_crossings"),
            F.max("peak_abs").cast("long").alias("max_peak"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# m08 — video FRAME SAMPLING over a REAL container: completes the
# multimodal quartet (decode m02/m06, feature-extract m07, resize
# m06's upscale contract, frame-sample HERE) with raw bytes instead
# of a codec gate. Each "video" is a minimal-but-real RIFF/AVI file
# built ENTIRELY by Spark SQL expressions (so the Python parser is
# independently verified, the m02/m06/m07 design): nested LISTs
# (hdrl → strl with avih/strh/strf), an alignment JUNK chunk inside
# movi, and 8-12 uncompressed bottom-up 24-bpp DIB '00db' frames
# whose pixels follow a per-(doc, frame, x, y) formula with a
# frame-dependent term. `operators.multimodal.decode_avi_dib` walks
# the chunk TREE (fixed-offset readers break on the JUNK chunk and
# on per-doc variable frame counts), cross-checks the avih declared
# frame count against the movi stream, and the sampler derives its
# stride from the file's OWN cadence metadata (40 ms/frame, 120 ms
# sampling → every 3rd frame). The oracle recomputes every sampled
# frame's integer mean/peak luma straight from the pixel formula —
# a wrong stride, a skipped/duplicated frame, a bottom-up flip, a
# BGR swap, or any mis-walked chunk boundary changes the values.
# --------------------------------------------------------------------------
def _le32_sql(expr: str) -> str:
    """Hex of a 4-byte little-endian u32 built from a SQL int expr."""
    return (
        "concat("
        + ", ".join(
            f"lpad(hex(pmod(({expr}) div {256 ** i}, 256)), 2, '0')"
            for i in range(4)
        )
        + ")"
    )


def _avi_sql(src: str, nf: str) -> str:
    """Spark SQL expression producing a complete RIFF/AVI file with
    ``nf`` raw 16x16 24-bpp DIB frames for one row."""
    import struct as _s

    w = h = 16
    rowsize = w * 3  # 48, already 4-byte aligned
    frame_bytes = rowsize * h  # 768
    avih_pre = _s.pack("<IIII", 40_000, 0, 0, 0)  # usPerFrame..flags
    avih_post = _s.pack("<IIIIII", 0, 1, frame_bytes, w, h, 0) + b"\0" * 12
    strh_pre = (
        b"vids" + b"DIB " + _s.pack("<IHHIIII", 0, 0, 0, 0, 1, 25, 0)
    )  # flags, prio, lang, initFrames, scale, rate, start
    strh_post = _s.pack("<III", frame_bytes, 0, 0) + b"\0" * 8
    strf = _s.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0
    )
    # constant hex segments between the nf-dependent LE32 splices
    seg_a = (
        b"AVI "
        + b"LIST" + _s.pack("<I", 192) + b"hdrl"
        + b"avih" + _s.pack("<I", 56) + avih_pre
    ).hex().upper()
    seg_b = (
        avih_post
        + b"LIST" + _s.pack("<I", 116) + b"strl"
        + b"strh" + _s.pack("<I", 56) + strh_pre
    ).hex().upper()
    seg_c = (strh_post + b"strf" + _s.pack("<I", 40) + strf + b"LIST").hex().upper()
    junk = (b"JUNK" + _s.pack("<I", 4) + b"\0" * 4).hex().upper()
    frame_hdr = (b"00db" + _s.pack("<I", frame_bytes)).hex().upper()

    p = (
        f"pmod({src}*31 + x*7 + y*13 + pmod({src}, 13)*x*y"
        f" + f*97 + pmod({src}, 7)*f, 256)"
    )
    pix = (
        f"concat(lpad(hex(pmod({p} * 7, 256)), 2, '0'), "  # B
        f"lpad(hex(pmod({p} * 3, 256)), 2, '0'), "  # G
        f"lpad(hex({p}), 2, '0'))"  # R
    )
    row = f"array_join(transform(sequence(0, {w - 1}), x -> {pix}), '')"
    frame = f"array_join(transform(sequence({h - 1}, 0, -1), y -> {row}), '')"
    frames = (
        f"array_join(transform(sequence(0, ({nf}) - 1), f -> "
        f"concat('{frame_hdr}', {frame}, "
        f"IF(f = 0, '{junk}', ''))), '')"
    )
    riff_size = f"228 + 776 * ({nf})"
    movi_size = f"16 + 776 * ({nf})"
    return (
        "unhex(concat('52494646', "  # 'RIFF'
        f"{_le32_sql(riff_size)}, '{seg_a}', {_le32_sql(nf)}, "
        f"'{seg_b}', {_le32_sql(nf)}, '{seg_c}', "
        f"{_le32_sql(movi_size)}, '6D6F7669', {frames}))"  # 'movi'
    )


_M08_P = (
    "(src*31 + x*7 + y*13 + (src % 13)*x*y + f*97 + (src % 7)*f) % 256"
)
_M08_LUMA = (
    f"(77 * ({_M08_P}) + 151 * ((3 * ({_M08_P})) % 256)"
    f" + 28 * ((7 * ({_M08_P})) % 256)) // 256"
)


@register(
    "m08_video_frame_sample",
    oracle=f"""
    WITH vids AS (
        SELECT doc_id AS media_id, doc_id AS src,
               CAST(8 + doc_id % 5 AS INT) AS nf
        FROM documents WHERE doc_id % 3 = 2
    ),
    px AS (
        SELECT media_id, f, nf, {_M08_LUMA} AS luma
        FROM vids, range(0, 12) ff(f), range(0, 16) xx(x),
             range(0, 16) yy(y)
        WHERE f % 3 = 0 AND f < nf
    )
    SELECT media_id, CAST(f AS INT) AS frame_idx,
           CAST(sum(luma) // 256 AS BIGINT) AS mean_gray,
           CAST(max(luma) AS BIGINT) AS peak_gray,
           nf AS n_frames,
           CAST(nf * 40 AS BIGINT) AS dur_ms
    FROM px GROUP BY media_id, f, nf
    ORDER BY media_id, frame_idx
    """,
    tags=("multimodal", "video", "frame-sample", "avi", "mapInPandas"),
)
def m08_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-3rd-frame sampling (stride from the file's own cadence
    metadata) over real chunk-walked AVI containers, with exact
    integer per-frame luma features."""
    from hyppo_worker_spark.operators.multimodal import (
        sample_video_frames,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # Repartition BEFORE the container-build expression: the planner
    # sizes this stage by its (tiny) scan input and cannot see the
    # ~10 KB/row expansion + per-pixel CPU of the nested transform()
    # lambdas, so without the explicit exchange the whole build runs
    # in a handful of tasks (measured 9 tasks / 7.4s at sf0.1; 32-way
    # it is ~4x faster and scales with the cluster).
    vids = (
        docs.filter(F.col("doc_id") % 3 == 2)
        .select("doc_id")
        .repartition(32, "doc_id")
        .select(
            F.col("doc_id").alias("media_id"),
            F.expr(
                _avi_sql("doc_id", "8 + doc_id % 5")
            ).alias("content"),
        )
    )
    return (
        sample_video_frames(vids, every_ms=120)
        .select(
            "media_id",
            "frame_idx",
            F.col("mean_gray").cast("long").alias("mean_gray"),
            F.col("peak_gray").cast("long").alias("peak_gray"),
            "n_frames",
            F.col("dur_ms").cast("long").alias("dur_ms"),
        )
        .orderBy("media_id", "frame_idx")
    )
