"""H.264 Constrained-Baseline I-slice codec: pixel-exact decode of the
uniform-MB fixture protocol (PCM / I_16x16 / I_4x4 macroblocks, SPS
crop, emulation prevention), header-only probing, frame sampling over
raw Annex-B streams AND H.264-in-AVI (parameter-set carry), and
corrupt-payload degradation (the batch-robustness contract AVI and
JPEG already follow). Round-7: wires the round-6 codec
(operators/h264.py) into the multimodal surface."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from etl_cli_spark.operators.avi import mux_avi_mjpeg
from etl_cli_spark.operators.h264 import (
    add_emulation,
    decode_h264_frames,
    decode_idr_rgb,
    encode_h264_iframe,
    index_h264,
    probe_h264,
    split_nals,
    strip_emulation,
)
from etl_cli_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _probe_one,
    h264_frame_au,
    h264_mb_targets,
    make_fake_avi_h264_video,
    make_fake_h264_video,
    probe_media,
    sample_frames,
)


def _expected_rgb(k: int, w: int, h: int) -> np.ndarray:
    """Independent pixel replay of the fixture protocol: per-MB target
    (Y, Cb, Cr) -> BT.601 full-range, banker's rounding — no codec
    code involved (pure-python round == np.rint on .0/.5 halves)."""
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            ty, tcb, tcr = h264_mb_targets(k, x // 16, y // 16)
            out[y, x] = (
                min(255, max(0, round(ty + 1.402 * (tcr - 128.0)))),
                min(255, max(0, round(ty - 0.344136 * (tcb - 128.0)
                                      - 0.714136 * (tcr - 128.0)))),
                min(255, max(0, round(ty + 1.772 * (tcb - 128.0)))),
            )
    return out


# --------------------------------------------------------------------------
# codec-level pixel identity
# --------------------------------------------------------------------------


@pytest.mark.parametrize("w,h", [(20, 12), (24, 20), (28, 12), (16, 16)])
def test_decode_matches_fixture_protocol_exactly(w, h):
    """decode(encode(spec)) == the closed-form target pattern, pixel
    for pixel, across MB-kind mixes (k rotates which MBs are PCM /
    I_16x16 / I_4x4) and cropped + uncropped dims."""
    for k in (0, 1, 2, 5, 1003):
        au = h264_frame_au(k, w, h)
        dw, dh, frames = decode_h264_frames(au)
        assert (dw, dh) == (w, h) and len(frames) == 1
        assert np.array_equal(frames[0], _expected_rgb(k, w, h))


def test_multi_frame_stream_decodes_every_frame():
    """SPS/PPS once at the head, then one IDR AU per frame — the raw
    elementary-stream convention make_fake_h264_video emits."""
    w, h = 20, 12
    data = b"".join(h264_frame_au(7000 + f, w, h, include_ps=(f == 0)) for f in range(5))
    dw, dh, frames = decode_h264_frames(data)
    assert (dw, dh, len(frames)) == (w, h, 5)
    for f, rgb in enumerate(frames):
        assert np.array_equal(rgb, _expected_rgb(7000 + f, w, h))


def test_emulation_prevention_roundtrip():
    """add/strip emulation must be inverse and actually fire on fixture
    streams (00 00 0x sequences appear in real slice data)."""
    raw = b"\x00\x00\x00\x01\x02\x00\x00\x02\x00\x00\x03\x00\x00"
    esc = add_emulation(raw)
    assert b"\x00\x00\x00" not in esc or esc != raw
    assert strip_emulation(esc) == raw
    # end-to-end: a black PCM macroblock byte-aligns long 0x00 runs
    # into the RBSP, so the AU MUST carry escape bytes — and decode
    # back to exact black through the strip
    au = encode_h264_iframe(
        [(
            "pcm",
            np.zeros((16, 16), dtype=np.uint8),
            np.zeros((8, 8), dtype=np.uint8),
            np.zeros((8, 8), dtype=np.uint8),
        )],
        1, 1, 16, 16,
    )
    assert b"\x00\x00\x03" in au, "PCM zeros did not exercise emulation prevention"
    _, _, frames = decode_h264_frames(au)
    y_black = round(0 + 1.402 * -128.0)  # clips to 0
    assert frames[0][0, 0, 0] == max(0, y_black)
    assert np.array_equal(frames[0][:, :, 1], np.full((16, 16), 135))  # G of (0,0,0) YCbCr


def test_index_is_cheap_and_decode_is_per_frame():
    """index_h264 returns one RBSP per IDR; decoding only frame 3 gives
    frame 3's pixels (the sampling cost model: index everything, decode
    only what's sampled)."""
    w, h = 24, 12
    data = b"".join(h264_frame_au(100 + f, w, h, include_ps=(f == 0)) for f in range(6))
    sps, pps, idrs = index_h264(data)
    assert len(idrs) == 6 and sps["width"] == w and sps["height"] == h
    rgb = decode_idr_rgb(sps, pps, idrs[3])
    assert np.array_equal(rgb, _expected_rgb(103, w, h))


def test_index_carries_parameter_sets_across_chunks():
    """A PS-less AU indexes with carried SPS/PPS (the AVI convention:
    parameter sets only in chunk 0) and refuses without state."""
    first = h264_frame_au(50, 20, 12, include_ps=True)
    later = h264_frame_au(51, 20, 12, include_ps=False)
    sps, pps, _ = index_h264(first)
    with pytest.raises(ValueError):
        index_h264(later)
    s2, p2, idrs = index_h264(later, sps, pps)
    assert np.array_equal(decode_idr_rgb(s2, p2, idrs[0]), _expected_rgb(51, 20, 12))


def test_probe_h264_sps_only():
    au = h264_frame_au(9, 28, 20)
    assert probe_h264(au) == (28, 20, 1)
    assert _probe_one(au) == ("h264", 28, 20)
    # 3-byte start codes are equally valid Annex-B
    three = au.replace(b"\x00\x00\x00\x01", b"\x00\x00\x01")
    assert _probe_one(three) == ("h264", 28, 20)


def test_probe_rejects_junk_annexb():
    assert _probe_one(b"\x00\x00\x00\x01\x00\x11\x22") == (None, None, None)


def test_nal_split_handles_leading_and_trailing_zeros():
    data = b"\x00\x00\x00\x01\x67\xAA" + b"\x00\x00\x01\x68\xBB" + b"\x00\x00"
    nals = [n for n in split_nals(data) if n]
    assert [n[0] for n in nals][:2] == [0x67, 0x68]


# --------------------------------------------------------------------------
# Spark surface: sample_frames / probe_media over both containers
# --------------------------------------------------------------------------


def _oracle_digest(i: int, fi: int) -> bytes:
    w, h = 20 + 4 * (i % 3), 12 + 8 * (i % 2)
    return hashlib.sha256(_expected_rgb(i * 1000 + fi, w, h).tobytes()).digest()[:16]


@pytest.mark.parametrize("maker", [make_fake_h264_video, make_fake_avi_h264_video])
def test_sample_frames_h264_matches_oracle_replay(spark, maker):
    """Sampled-frame digests over raw Annex-B and H.264-in-AVI equal
    sha256 of the INDEPENDENTLY replayed pattern pixels — certifying
    demux, PS carry, CAVLC decode, intra prediction, and the BT.601
    conversion in one shot."""
    got = {
        (r.media_id, r.frame_idx): (r.frame_ts_ms, bytes(r.frame_digest))
        for r in sample_frames(maker(spark, n=6, fps=4), every_ms=1000).collect()
    }
    checked = 0
    for i in range(6):
        dur = 2000 + 500 * (i % 3)
        nf = dur * 4 // 1000
        for s, ts in enumerate(range(0, dur, 1000)):
            fi = min(ts // 250, nf - 1)
            assert got[(i, s)] == (ts, _oracle_digest(i, fi))
            checked += 1
    assert checked == 16


def test_probe_media_h264(spark):
    pr = {
        r.media_id: (r.probe_format, r.probe_width, r.probe_height)
        for r in probe_media(make_fake_h264_video(spark, n=6)).collect()
    }
    for i in range(6):
        assert pr[i] == ("h264", 20 + 4 * (i % 3), 12 + 8 * (i % 2))


def test_probe_media_avi_h264_uses_container_header(spark):
    """H.264-in-AVI probes as 'avi' with dims straight from avih —
    format routing stays container-first, zero codec work."""
    pr = {
        r.media_id: (r.probe_format, r.probe_width, r.probe_height)
        for r in probe_media(make_fake_avi_h264_video(spark, n=3)).collect()
    }
    for i in range(3):
        assert pr[i] == ("avi", 20 + 4 * (i % 3), 12 + 8 * (i % 2))


def test_sample_frames_corrupt_h264_degrades_to_stub(spark):
    """An Annex-B payload whose slices are garbage must produce stub
    digests, never a task death."""
    au = h264_frame_au(3, 20, 12)
    # keep SPS/PPS intact, wreck the IDR slice body
    idr_at = au.rfind(b"\x00\x00\x00\x01")
    payload = au[: idr_at + 6] + b"\xFF" * 20
    df = spark.createDataFrame(
        [(1, "video", bytearray(payload), (20, 12, None, 2000, "h264"))],
        MEDIA_SCHEMA,
    )
    rows = sample_frames(df, every_ms=1000).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.frame_digest is not None


def test_h264_fuzz_mutations_never_escape_sample_frames(spark):
    """64+ mutated payloads (random corruptions + truncations of valid
    raw Annex-B and H.264-AVI streams) must always yield sampled rows —
    real digests when the stream still parses, stub digests when it
    doesn't — never an uncaught exception from the Spark task (the
    same protocol tests/test_avi.py pins for MJPEG)."""
    import random

    rng = random.Random(7)
    seed_raw = b"".join(
        h264_frame_au(400 + f, 20, 12, include_ps=(f == 0)) for f in range(4)
    )
    seed_avi = mux_avi_mjpeg(
        [h264_frame_au(500 + f, 20, 12, include_ps=(f == 0)) for f in range(4)],
        20, 12, fps=4, fourcc=b"H264",
    )
    payloads = []
    for seed in (seed_raw, seed_avi):
        for _ in range(30):
            data = bytearray(seed)
            for _ in range(rng.randint(1, 6)):
                data[rng.randrange(4, len(data))] = rng.randrange(256)
            payloads.append(bytes(data))
        for cut in (6, 30, 80, len(seed) - 3):
            payloads.append(seed[:cut])
    assert len(payloads) >= 64
    df = spark.createDataFrame(
        [
            (i, "video", bytearray(p), (20, 12, None, 2000, "h264"))
            for i, p in enumerate(payloads)
        ],
        MEDIA_SCHEMA,
    )
    rows = sample_frames(df, every_ms=1000).collect()
    by_vid: dict = {}
    for r in rows:
        assert r.frame_digest is not None
        by_vid.setdefault(r.media_id, 0)
        by_vid[r.media_id] += 1
    # every payload produced its 2 sampled rows (dur 2000 -> ts 0, 1000)
    assert all(by_vid.get(i, 0) == 2 for i in range(len(payloads)))


def test_fixture_set_exercises_full_intra_mode_surface():
    """The standard fixture videos (the exact payloads the oracles
    replay) must collectively hit every MB kind (I_PCM / I_16x16 /
    I_4x4), every used I_16x16 luma mode (DC/V/H), every chroma mode
    (DC/H/V), and ALL NINE Intra_4x4 prediction modes — so a
    regression in any intra predictor fails the pixel oracles, not
    just a unit test."""
    from etl_cli_spark.operators.multimodal import _h264_frame_specs

    kinds, i16_modes, i4_modes, chroma_modes = set(), set(), set(), set()
    for i in range(6):
        w, h = 20 + 4 * (i % 3), 12 + 8 * (i % 2)
        dur = 2000 + 500 * (i % 3)
        for f in range(dur * 4 // 1000):
            for spec in _h264_frame_specs(i * 1000 + f, w, h):
                kinds.add(spec[0])
                if spec[0] == "i16":
                    i16_modes.add(spec[1])
                    chroma_modes.add(spec[2])
                elif spec[0] == "i4":
                    i4_modes.update(spec[1])
                    chroma_modes.add(spec[3])
    assert kinds == {"pcm", "i16", "i4"}
    assert i16_modes == {0, 1, 2}, i16_modes
    assert chroma_modes == {0, 1, 2}, chroma_modes
    assert i4_modes == set(range(9)), i4_modes


def test_decode_high_qp_branch_exact():
    """qp=40 exercises the dequant branches the standard fixtures
    (qp=28) never touch: scale_luma_dc's qp>=36 shift path and the
    chroma_qp mapping table (40 -> 36). At qp=40 the luma-DC level for
    a uniform residual r is 4r (dcY = 16*level << (qp//6 - 6));
    chroma carries no residual, so every chroma sample stays at the
    128 DC prediction — decoded pixels still follow a closed form."""
    qp = 40

    def dc_pred(u, l):
        if u is not None and l is not None:
            return (u + l + 1) >> 1
        return u if u is not None else (l if l is not None else 128)

    w_mbs, h_mbs, w, h = 2, 2, 32, 32
    targets = {}
    specs = []
    for mby in range(h_mbs):
        for mbx in range(w_mbs):
            ty = 40 + 30 * (mbx + 2 * mby)
            targets[(mbx, mby)] = ty
            u, l = targets.get((mbx, mby - 1)), targets.get((mbx - 1, mby))
            r = ty - dc_pred(u, l)
            specs.append(("i16", 2, 0, [4 * r] + [0] * 15, None, 0, None, None))
    au = encode_h264_iframe(specs, w_mbs, h_mbs, w, h, qp=qp)
    dw, dh, frames = decode_h264_frames(au)
    assert (dw, dh) == (w, h)
    rgb = frames[0]
    for (mbx, mby), ty in targets.items():
        block = rgb[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16]
        # chroma == 128 -> R == G == B == luma exactly (BT.601 identity)
        exp = np.full((16, 16, 3), ty, dtype=np.uint8)
        assert np.array_equal(block, exp), (mbx, mby, ty, block[0, 0])
