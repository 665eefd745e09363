"""Unit coverage for the pure-struct AVI chunk-tree walker and the
metadata-driven frame sampler (`operators/multimodal.py:
decode_avi_dib / sample_video_frames`). Files are built here with an
independent little writer (the registry's m08 builds its files in
Spark SQL — two builders, one parser)."""

from __future__ import annotations

import struct

import numpy as np

from hyppo_worker_spark.operators.multimodal import decode_avi_dib

W = H = 16
ROWSIZE = W * 3
FRAME = ROWSIZE * H


def _frame_bytes(seed: int) -> bytes:
    # bottom-up BGR rows
    out = bytearray()
    for y in range(H - 1, -1, -1):
        for x in range(W):
            p = (seed * 31 + x * 7 + y * 13) % 256
            out += bytes(((p * 7) % 256, (p * 3) % 256, p))
    return bytes(out)


def _strl(strh_body: bytes, strf_body: bytes) -> bytes:
    strh = b"strh" + struct.pack("<I", len(strh_body)) + strh_body
    strf = b"strf" + struct.pack("<I", len(strf_body)) + strf_body
    return (
        b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf))
        + b"strl" + strh + strf
    )


def _audio_strl() -> bytes:
    # strh fccType 'auds'; strf is a WAVEFORMATEX (padded to 40 bytes so
    # a type-blind parser would read its bytes 14:16 — wBitsPerSample=16
    # — as a BITMAPINFOHEADER bitcount and hard-fail the file)
    strh_body = (
        b"auds" + b"\0\0\0\0" + struct.pack("<IHHIIII", 0, 0, 0, 0, 1, 8000, 0)
        + struct.pack("<I", 8000) + struct.pack("<III", 16000, 0, 0)
        + b"\0" * 8
    )
    wfx = struct.pack("<HHIIHHH", 1, 1, 8000, 16000, 2, 16, 0)
    return _strl(strh_body, wfx + b"\0" * (40 - len(wfx)))


def _second_video_strl() -> bytes:
    # a second 'vids' stream with bogus 999x999 dimensions: must not
    # overwrite the first stream's w/h
    strh_body = (
        b"vids" + b"DIB " + struct.pack("<IHHIIII", 0, 0, 0, 0, 1, 25, 0)
        + struct.pack("<I", 1) + struct.pack("<III", FRAME, 0, 0)
        + b"\0" * 8
    )
    strf_body = struct.pack(
        "<IiiHHIIiiII", 40, 999, 999, 1, 24, 0, FRAME, 2835, 2835, 0, 0
    )
    return _strl(strh_body, strf_body)


def _avi(n_frames: int, *, junk_size: int | None = 4,
         declared: int | None = None, us_per_frame: int = 40_000,
         extra_strls_pre: bytes = b"", extra_strls_post: bytes = b"") -> bytes:
    avih = (
        b"avih" + struct.pack("<I", 56)
        + struct.pack("<IIII", us_per_frame, 0, 0, 0)
        + struct.pack("<IIIIII",
                      declared if declared is not None else n_frames,
                      0, 1, FRAME, W, H)
        + b"\0" * 16
    )
    strh = (
        b"strh" + struct.pack("<I", 56)
        + b"vids" + b"DIB " + struct.pack("<IHHIIII", 0, 0, 0, 0, 1, 25, 0)
        + struct.pack("<I", n_frames) + struct.pack("<III", FRAME, 0, 0)
        + b"\0" * 8
    )
    strf = (
        b"strf" + struct.pack("<I", 40)
        + struct.pack("<IiiHHIIiiII", 40, W, H, 1, 24, 0, FRAME,
                      2835, 2835, 0, 0)
    )
    strl = (
        extra_strls_pre
        + b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf))
        + b"strl" + strh + strf
        + extra_strls_post
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) + b"hdrl" + avih + strl
    movi = bytearray(b"movi")
    for f in range(n_frames):
        movi += b"00db" + struct.pack("<I", FRAME) + _frame_bytes(f)
        if f == 0 and junk_size is not None:
            movi += (b"JUNK" + struct.pack("<I", junk_size)
                     + b"\0" * junk_size)
            if junk_size % 2:
                movi += b"\0"  # spec: odd chunks pad to even offsets
    movi_chunk = b"LIST" + struct.pack("<I", len(movi)) + bytes(movi)
    payload = b"AVI " + hdrl + movi_chunk
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def test_decodes_frames_and_metadata():
    dec = decode_avi_dib(_avi(5))
    assert dec is not None
    assert dec["us_per_frame"] == 40_000 and dec["n_frames"] == 5
    # frame 2, pixel (x=3, y=1) in TOP-DOWN order
    p = (2 * 31 + 3 * 7 + 1 * 13) % 256
    want = (77 * p + 151 * ((3 * p) % 256) + 28 * ((7 * p) % 256)) >> 8
    assert int(dec["frames"][2][1, 3]) == want


def test_junk_chunk_between_frames_is_skipped():
    a = decode_avi_dib(_avi(4, junk_size=None))
    b = decode_avi_dib(_avi(4, junk_size=4))
    assert a is not None and b is not None
    for fa, fb in zip(a["frames"], b["frames"]):
        assert np.array_equal(fa, fb)


def test_odd_sized_chunk_pads_to_even_offset():
    dec = decode_avi_dib(_avi(3, junk_size=7))
    assert dec is not None and dec["n_frames"] == 3


def test_declared_count_mismatch_fails_soft():
    assert decode_avi_dib(_avi(3, declared=5)) is None


def test_audio_stream_strf_is_ignored():
    # an 'auds' strl ahead of the video strl: its WAVEFORMATEX strf
    # must not be misread as a BITMAPINFOHEADER (whose bitcount check
    # would hard-fail the file)
    plain = decode_avi_dib(_avi(4))
    with_audio = decode_avi_dib(_avi(4, extra_strls_pre=_audio_strl()))
    assert with_audio is not None
    assert with_audio["n_frames"] == 4
    for fa, fb in zip(plain["frames"], with_audio["frames"]):
        assert np.array_equal(fa, fb)


def test_second_video_strf_does_not_overwrite_dimensions():
    dec = decode_avi_dib(_avi(3, extra_strls_post=_second_video_strl()))
    assert dec is not None and dec["n_frames"] == 3
    assert dec["frames"][0].shape == (H, W)


def test_truncated_file_fails_soft():
    whole = _avi(3)
    assert decode_avi_dib(whole[: len(whole) - 100]) is None
    assert decode_avi_dib(b"RIFF\x00\x00\x00\x00WAVE") is None


def test_sampler_stride_comes_from_file_cadence(spark):
    from pyspark.sql import functions as F

    from hyppo_worker_spark.operators.multimodal import (
        sample_video_frames,
    )

    rows = [(1, _avi(10)), (2, _avi(10, us_per_frame=120_000))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        (r.media_id, r.frame_idx)
        for r in sample_video_frames(df, every_ms=120).collect()
    }
    # 40 ms cadence -> stride 3; 120 ms cadence -> stride 1
    assert {f for m, f in got if m == 1} == {0, 3, 6, 9}
    assert {f for m, f in got if m == 2} == set(range(10))
    dur = {
        r.media_id: r.dur_ms
        for r in sample_video_frames(df, every_ms=120).collect()
    }
    assert dur[1] == 400 and dur[2] == 1200
