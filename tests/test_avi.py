"""MJPEG-in-AVI container: mux/demux round-trip, header probe, frame
sampling through the T.81 JPEG decoder, and corrupt-payload
degradation (the batch-robustness contract)."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from etl_cli_spark.operators.avi import demux_avi_mjpeg, mux_avi_mjpeg, probe_avi
from etl_cli_spark.operators.jpeg import encode_jpeg
from etl_cli_spark.operators.multimodal import _jpeg_plane, _probe_one


def _mk_frames(n, w, h, base=0):
    bw, bh = (w + 7) // 8, (h + 7) // 8
    return [
        encode_jpeg(_jpeg_plane(base + f, 0, bw, bh)[:h, :w], quant=16, grayscale=True)
        for f in range(n)
    ]


def test_mux_demux_roundtrip_bytes_identical():
    frames = _mk_frames(8, 20, 12)
    avi = mux_avi_mjpeg(frames, 20, 12, fps=4)
    w, h, uspf, got = demux_avi_mjpeg(avi)
    assert (w, h, uspf) == (20, 12, 250000)
    assert got == frames  # chunk bodies come back verbatim


def test_mux_word_aligns_odd_chunks():
    """An odd-length frame chunk gets a pad byte; the demux walk must
    still land on every following chunk boundary."""
    frames = _mk_frames(3, 20, 12)
    # engineer an odd length with a trailing byte after EOI (decoders
    # ignore bytes past EOI, so the frame stays valid)
    if len(frames[0]) % 2 == 0:
        frames[0] = frames[0] + b"\x00"
    avi = mux_avi_mjpeg(frames, 20, 12, fps=4)
    _, _, _, got = demux_avi_mjpeg(avi)
    assert got == frames


def test_probe_avi_header_only():
    frames = _mk_frames(10, 24, 20)
    avi = mux_avi_mjpeg(frames, 24, 20, fps=5)
    assert probe_avi(avi) == (24, 20, 200000, 10)
    # multimodal dispatch sees it too
    assert _probe_one(avi) == ("avi", 24, 20)
    # WAV stays WAV (both are RIFF)
    assert _probe_one(b"RIFF" + struct.pack("<I", 4) + b"WAVE") == ("wav", None, None)


def test_demux_collects_opendml_rec_lists():
    """Frames nested inside OpenDML 'rec ' interleave records are
    collected in order."""
    frames = _mk_frames(4, 20, 12)
    avi = bytearray(mux_avi_mjpeg(frames[:2], 20, 12, fps=4))

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    rec = chunk(b"LIST", b"rec " + chunk(b"00dc", frames[2]) + chunk(b"00dc", frames[3]))
    # splice the rec list into movi: rebuild container manually
    movi_pos = avi.find(b"movi")
    movi_size_pos = movi_pos - 4
    old_size = struct.unpack_from("<I", avi, movi_size_pos)[0]
    # find end of movi list body
    movi_end = movi_pos + old_size
    new = bytes(avi[:movi_end]) + rec + bytes(avi[movi_end:])
    new = bytearray(new)
    struct.pack_into("<I", new, movi_size_pos, old_size + len(rec))
    struct.pack_into("<I", new, 4, len(new) - 8)
    _, _, _, got = demux_avi_mjpeg(bytes(new))
    assert got == frames


def test_demux_rejects_corrupt():
    frames = _mk_frames(2, 20, 12)
    avi = mux_avi_mjpeg(frames, 20, 12, fps=4)
    with pytest.raises(ValueError):
        demux_avi_mjpeg(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        probe_avi(avi[:20])  # truncated before avih
    # a chunk size overrunning the RIFF extent must raise, not overread
    bad = bytearray(avi)
    movi_pos = bad.find(b"00dc")
    struct.pack_into("<I", bad, movi_pos + 4, 1 << 30)
    with pytest.raises(ValueError):
        demux_avi_mjpeg(bytes(bad))


def test_mux_rejects_bad_fps():
    with pytest.raises(ValueError):
        mux_avi_mjpeg([], 8, 8, fps=0)


def test_sample_frames_mjpeg_avi(spark):
    """sample_frames over MJPEG-AVI: digests equal sha256 of the
    independently-recomputed jpeg_spec block pattern (gray replicated
    to RGB by the grayscale decode), timing from dwMicroSecPerFrame."""
    from etl_cli_spark.operators.multimodal import make_fake_avi_video, sample_frames

    video = make_fake_avi_video(spark, n=4, fps=4)
    rows = {(r.media_id, r.frame_idx): r for r in
            sample_frames(video, every_ms=1000).collect()}
    for i in range(4):
        w, h = 20 + 4 * (i % 3), 12 + 8 * (i % 2)
        dur = 2000 + 500 * (i % 3)
        n_frames = dur * 4 // 1000
        for s, ts in enumerate(range(0, dur, 1000)):
            fi = min(ts // 250, n_frames - 1)
            k = i * 1000 + fi
            plane = _jpeg_plane(k, 0, (w + 7) // 8, (h + 7) // 8)[:h, :w]
            rgb = np.repeat(plane.astype(np.uint8)[..., None], 3, axis=2)
            want = hashlib.sha256(np.ascontiguousarray(rgb).tobytes()).digest()[:16]
            assert bytes(rows[(i, s)].frame_digest) == want


def test_sample_frames_corrupt_avi_degrades_to_stub(spark):
    """A truncated AVI payload must fall back to the stub digest path —
    never kill the task (the batch-robustness contract)."""
    from etl_cli_spark.operators.multimodal import MEDIA_SCHEMA, sample_frames

    frames = _mk_frames(4, 20, 12)
    avi = mux_avi_mjpeg(frames, 20, 12, fps=4)
    corrupt = avi[: len(avi) // 2]
    # keep the RIFF size honest so the demuxer sees a truncated tree
    bad = bytearray(corrupt)
    struct.pack_into("<I", bad, 4, len(bad) - 8)
    payload = bytes(bad)
    df = spark.createDataFrame(
        [(1, "video", bytearray(payload), (20, 12, None, 2000, "mjpeg-avi"))],
        MEDIA_SCHEMA,
    )
    got = sample_frames(df, every_ms=1000).collect()
    assert len(got) == 2  # dur 2000 -> ts 0, 1000
    for r in got:
        want = hashlib.sha256(
            payload + int(r.frame_ts_ms).to_bytes(8, "little")
        ).digest()[:16]
        assert bytes(r.frame_digest) == want


def test_avi_fuzz_mutations_never_escape_sample_frames(spark):
    """Random byte corruptions of a valid MJPEG AVI (container headers
    and frame payloads alike) must always yield sampled rows — real
    digests when the tree still parses, stub digests when it doesn't —
    never an uncaught exception from the Spark task."""
    import random

    from etl_cli_spark.operators.multimodal import MEDIA_SCHEMA, sample_frames

    rng = random.Random(6)
    seed_avi = mux_avi_mjpeg(_mk_frames(6, 20, 12), 20, 12, fps=4)
    payloads = []
    for _ in range(60):
        data = bytearray(seed_avi)
        for _ in range(rng.randint(1, 6)):
            data[rng.randrange(12, len(data))] = rng.randrange(256)
        payloads.append(bytes(data))
    for cut in (13, 40, 90, len(seed_avi) - 3):
        payloads.append(seed_avi[:cut])
    df = spark.createDataFrame(
        [
            (i, "video", bytearray(p), (20, 12, None, 2000, "mjpeg-avi"))
            for i, p in enumerate(payloads)
        ],
        MEDIA_SCHEMA,
    )
    rows = sample_frames(df, every_ms=1000).collect()
    # every (video, sample) slot produced a digest, none crashed
    assert len(rows) >= 2 * len(payloads) - len(payloads)  # >=1 frame rows each
    assert all(r.frame_digest is not None for r in rows)


def test_sample_frames_clamps_header_driven_explosion(spark):
    """dwMicroSecPerFrame is attacker-controlled: with metadata
    duration absent, a crafted header (uspf near 2^32 over many tiny
    chunks) must NOT explode one record into millions of rows — the
    per-video sample count is clamped (round-7 ADVICE hardening)."""
    import struct as _st

    from etl_cli_spark.operators.multimodal import MEDIA_SCHEMA, sample_frames

    frames = _mk_frames(3, 20, 12)
    avi = bytearray(mux_avi_mjpeg(frames, 20, 12, fps=4))
    # avih body starts 12 (RIFF hdr) + 12 (LIST hdrl) + 8 (avih hdr) in
    # the muxer's fixed layout; overwrite dwMicroSecPerFrame
    off = avi.index(b"avih") + 8
    _st.pack_into("<I", avi, off, 0xFFFFFFFF)
    df = spark.createDataFrame(
        [(1, "video", bytes(avi), (20, 12, None, None, "mjpeg-avi"))],
        MEDIA_SCHEMA,
    )
    rows = sample_frames(df, every_ms=1000).collect()
    assert 0 < len(rows) <= 10_000
