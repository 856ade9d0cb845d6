"""MJPEG-in-AVI video container: RIFF demux + mux, pure stdlib.

The engine's video frame sampling (multimodal.sample_frames) decodes
real frames for codec-free containers, for MJPEG (every frame an
independent baseline JPEG, decodable with the repo's pure T.81 decoder
in operators/jpeg.py — old camera footage, surveillance, scientific
capture), and — round-7 — for H.264 Constrained-Baseline I-slice
streams carried in AVI chunks (operators/h264.py; SPS/PPS state is
carried from the first chunk, the common muxer convention). All with
zero native dependencies.

AVI is RIFF (the same chunk walk as WAV in multimodal._decode_wav):

    'RIFF' <size> 'AVI '
      LIST hdrl
        'avih' <AVIMAINHEADER>      (frame timing, count, dims)
        LIST strl ('strh' <AVISTREAMHEADER> / 'strf' <BITMAPINFOHEADER>)
      LIST movi  ('00dc' <jpeg bytes> ...)   frame chunks, word-aligned
      'idx1' <index>                          optional

The demux walk is header arithmetic only — no entropy work — so
probing stays cheap; JPEG decode cost is paid only for SAMPLED frames.
Reference parity: the reference treats video as opaque payload + typed
metadata (SURVEY §2 multimodal rows); this module makes the demux side
real for the one codec its pure-python stack can decode.
"""

from __future__ import annotations

import struct

_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def mux_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int,
    fourcc: bytes = b"MJPG",
) -> bytes:
    """Pack independent codec frames into a spec-shaped AVI.

    Default stream handler is MJPG (every frame an independent JPEG);
    ``fourcc=b"H264"`` tags an all-keyframe H.264 stream (one Annex-B
    access unit per ``00dc`` chunk — the fixture/crawl shape the
    engine's sampler decodes). Every frame is recorded in ``idx1``
    with AVIIF_KEYFRAME like real muxers emit.
    """
    if fps <= 0:
        raise ValueError(f"fps must be positive, got {fps}")
    if len(fourcc) != 4:
        raise ValueError(f"fourcc must be 4 bytes, got {fourcc!r}")
    uspf = 1_000_000 // fps
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        uspf,               # dwMicroSecPerFrame
        max_bytes * fps,    # dwMaxBytesPerSec
        0,                  # dwPaddingGranularity
        _AVIF_HASINDEX,     # dwFlags
        len(frames),        # dwTotalFrames
        0,                  # dwInitialFrames
        1,                  # dwStreams
        max_bytes,          # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,         # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", fourcc,
        0, 0, 0,            # dwFlags, wPriority, wLanguage
        0,                  # dwInitialFrames
        1, fps,             # dwScale / dwRate = frame period
        0, len(frames),     # dwStart, dwLength (frames)
        max_bytes,          # dwSuggestedBufferSize
        0xFFFFFFFF,         # dwQuality (default)
        0,                  # dwSampleSize (0 = variable, one sample/chunk)
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, fourcc,
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl", _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    )
    # build movi + idx1 in one pass (idx1 offsets are relative to the
    # 'movi' fourcc position)
    movi_body = b"movi"
    idx_entries = []
    for f in frames:
        idx_entries.append((len(movi_body), len(f)))
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, size)
            for off, size in idx_entries
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def probe_avi(data: bytes):
    """(width, height, usec_per_frame, n_frames) from the ``avih``
    header alone — no frame chunk is touched (the cheap routing pass)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    end = min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    pos = 12
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if pos + 8 + size > end:
            raise ValueError("corrupt AVI: chunk overruns RIFF size")
        if fourcc == b"LIST" and data[pos + 8 : pos + 12] == b"hdrl":
            sub, sub_end = pos + 12, pos + 8 + size
            while sub + 8 <= sub_end:
                sf = data[sub : sub + 4]
                ss = struct.unpack_from("<I", data, sub + 4)[0]
                if sf == b"avih":
                    if ss < 40:
                        raise ValueError("corrupt AVI: short avih")
                    uspf, _, _, _, n_frames = struct.unpack_from("<5I", data, sub + 8)
                    w, h = struct.unpack_from("<II", data, sub + 8 + 32)
                    return int(w), int(h), int(uspf), int(n_frames)
                sub += 8 + ss + (ss & 1)
        pos += 8 + size + (size & 1)
    raise ValueError("corrupt AVI: no avih header")


def _collect_frames(data: bytes, start: int, end: int, out: list) -> None:
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if pos + 8 + size > end:
            raise ValueError("corrupt AVI: movi chunk overruns list")
        if fourcc == b"LIST" and data[pos + 8 : pos + 12] == b"rec ":
            # OpenDML interleave records nest one level down
            _collect_frames(data, pos + 12, pos + 8 + size, out)
        elif fourcc[2:4] in (b"dc", b"db"):
            out.append(data[pos + 8 : pos + 8 + size])
        pos += 8 + size + (size & 1)


def demux_avi_mjpeg(data: bytes):
    """-> (width, height, usec_per_frame, [frame payload, ...]).

    Walks the RIFF tree once; '00dc'/'00db' chunk bodies come back
    verbatim (each an independent JPEG for MJPEG streams), including
    frames nested in OpenDML 'rec ' interleave records.
    """
    w, h, uspf, _n = probe_avi(data)
    end = min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    frames: list[bytes] = []
    pos = 12
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if pos + 8 + size > end:
            raise ValueError("corrupt AVI: chunk overruns RIFF size")
        if fourcc == b"LIST" and data[pos + 8 : pos + 12] == b"movi":
            _collect_frames(data, pos + 12, pos + 8 + size, frames)
        pos += 8 + size + (size & 1)
    return w, h, uspf, frames
