"""H.264/AVC Constrained-Baseline I-slice codec, pure python/numpy.

Closes the last multimodal codec stub for the case a large-scale video
pipeline actually needs: KEYFRAME sampling. Real pipelines sample
videos at I-frames (decoding P/B inter chains for a thumbnail is waste
at 100 TB); this module decodes exactly those — ITU-T H.264 (public
spec) Constrained Baseline I slices:

- Annex-B byte streams (start codes, emulation-prevention 0x03 strip)
- Exp-Golomb ue(v)/se(v), SPS / PPS / slice-header parsing
- I_16x16 (all four prediction modes), I_4x4 (DC mode), I_PCM
  macroblocks, 4:2:0 8-bit
- CAVLC residual entropy decode (coeff_token / trailing ones / level /
  total_zeros / run_before, per-spec nC context selection)
- 4x4 inverse integer transform, Intra_16x16 luma-DC Hadamard, chroma
  2x2 DC transform, per-QP dequantization

Out of scope, by declared design (not silently): P/B slices, CABAC,
deblocking (fixtures set disable_deblocking_filter_idc=1; streams that
enable it decode without the loop filter and are flagged), interlace,
high-profile tools. The encoder side emits the same subset so fixtures
exist in-sandbox and every decode path is exercised against an oracle
that replays pixels with independent integer math.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# bitstream: RBSP <-> bits
# ---------------------------------------------------------------------------


class BitReader:
    """MSB-first bit reader over an RBSP (emulation bytes already
    stripped)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("h264: bitstream exhausted")
        bit = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def ue(self) -> int:
        """Unsigned Exp-Golomb."""
        zeros = 0
        while self.read_bit() == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("h264: runaway Exp-Golomb prefix")
        return (1 << zeros) - 1 + (self.read_bits(zeros) if zeros else 0)

    def se(self) -> int:
        """Signed Exp-Golomb (9.1.1)."""
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def more_rbsp_data(self) -> bool:
        """True while bits remain before the rbsp_stop_one_bit (the
        LAST set bit in the RBSP)."""
        for byte in range(len(self.data) - 1, -1, -1):
            b = self.data[byte]
            if b:
                for i in range(8):  # lowest set bit = stop bit position
                    if (b >> i) & 1:
                        return self.pos < byte * 8 + (7 - i)
        return False


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write_bit(self, b: int) -> None:
        self.bits.append(b & 1)

    def write_bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        if v < 0:
            raise ValueError("ue(v) needs v >= 0")
        code = v + 1
        n = code.bit_length()
        self.write_bits(0, n - 1)
        self.write_bits(code, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def byte_align_stop(self) -> None:
        """rbsp_stop_one_bit + alignment zeros."""
        self.write_bit(1)
        while len(self.bits) % 8:
            self.write_bit(0)

    def to_bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for b in self.bits[i : i + 8]:
                byte = (byte << 1) | b
            byte <<= 8 - min(8, len(self.bits) - i)
            out.append(byte)
        return bytes(out)


def strip_emulation(data: bytes) -> bytes:
    """EBSP -> RBSP: drop emulation_prevention_three_byte (7.4.1)."""
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b == 0x03:
            zeros = 0
            continue  # the 0x03 itself is dropped
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def add_emulation(data: bytes) -> bytes:
    """RBSP -> EBSP: insert 0x03 before a third 0x00/0x01/0x02/0x03."""
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b <= 3:
            out.append(0x03)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def split_nals(data: bytes) -> list[bytes]:
    """Annex-B byte stream -> NAL units (EBSP payloads incl. header)."""
    nals = []
    i, n = 0, len(data)
    starts = []
    while i + 3 <= n:
        if data[i] == 0 and data[i + 1] == 0:
            if data[i + 2] == 1:
                starts.append((i, i + 3))
                i += 3
                continue
            if i + 4 <= n and data[i + 2] == 0 and data[i + 3] == 1:
                starts.append((i, i + 4))
                i += 4
                continue
        i += 1
    if not starts:
        raise ValueError("h264: no Annex-B start code")
    for j, (s, body) in enumerate(starts):
        end = starts[j + 1][0] if j + 1 < len(starts) else n
        nal = data[body:end].rstrip(b"\x00") or data[body:end]
        nals.append(nal)
    return nals


# ---------------------------------------------------------------------------
# CAVLC tables (ITU-T H.264 9.2, Tables 9-5 .. 9-10)
# ---------------------------------------------------------------------------

# coeff_token: {context: {(TrailingOnes, TotalCoeff): (bit_len, code)}}
# context 0: 0 <= nC < 2 ; 1: 2 <= nC < 4 ; 2: 4 <= nC < 8 ; 3: chroma DC (nC == -1)
_COEFF_TOKEN = {
    0: {
        (0, 0): (1, 1),
        (0, 1): (6, 0b000101), (1, 1): (2, 0b01),
        (0, 2): (8, 0b00000111), (1, 2): (6, 0b000100), (2, 2): (3, 0b001),
        (0, 3): (9, 0b000000111), (1, 3): (8, 0b00000110), (2, 3): (7, 0b0000101), (3, 3): (5, 0b00011),
        (0, 4): (10, 0b0000000111), (1, 4): (9, 0b000000110), (2, 4): (8, 0b00000101), (3, 4): (6, 0b000011),
        (0, 5): (11, 0b00000000111), (1, 5): (10, 0b0000000110), (2, 5): (9, 0b000000101), (3, 5): (7, 0b0000100),
        (0, 6): (13, 0b0000000001111), (1, 6): (11, 0b00000000110), (2, 6): (10, 0b0000000101), (3, 6): (8, 0b00000100),
        (0, 7): (13, 0b0000000001011), (1, 7): (13, 0b0000000001110), (2, 7): (11, 0b00000000101), (3, 7): (9, 0b000000100),
        (0, 8): (13, 0b0000000001000), (1, 8): (13, 0b0000000001010), (2, 8): (13, 0b0000000001101), (3, 8): (10, 0b0000000100),
        (0, 9): (14, 0b00000000001111), (1, 9): (14, 0b00000000001110), (2, 9): (13, 0b0000000001001), (3, 9): (11, 0b00000000100),
        (0, 10): (14, 0b00000000001011), (1, 10): (14, 0b00000000001010), (2, 10): (14, 0b00000000001101), (3, 10): (13, 0b0000000001100),
        (0, 11): (15, 0b000000000001111), (1, 11): (15, 0b000000000001110), (2, 11): (14, 0b00000000001001), (3, 11): (14, 0b00000000001100),
        (0, 12): (15, 0b000000000001011), (1, 12): (15, 0b000000000001010), (2, 12): (15, 0b000000000001101), (3, 12): (14, 0b00000000001000),
        (0, 13): (16, 0b0000000000001111), (1, 13): (15, 0b000000000000001), (2, 13): (15, 0b000000000001001), (3, 13): (15, 0b000000000001100),
        (0, 14): (16, 0b0000000000001011), (1, 14): (16, 0b0000000000001110), (2, 14): (16, 0b0000000000001101), (3, 14): (15, 0b000000000001000),
        (0, 15): (16, 0b0000000000000111), (1, 15): (16, 0b0000000000001010), (2, 15): (16, 0b0000000000001001), (3, 15): (16, 0b0000000000001100),
        (0, 16): (16, 0b0000000000000100), (1, 16): (16, 0b0000000000000110), (2, 16): (16, 0b0000000000000101), (3, 16): (16, 0b0000000000001000),
    },
    1: {
        (0, 0): (2, 0b11),
        (0, 1): (6, 0b001011), (1, 1): (2, 0b10),
        (0, 2): (6, 0b000111), (1, 2): (5, 0b00111), (2, 2): (3, 0b011),
        (0, 3): (7, 0b0000111), (1, 3): (6, 0b001010), (2, 3): (6, 0b001001), (3, 3): (4, 0b0101),
        (0, 4): (8, 0b00000111), (1, 4): (6, 0b000110), (2, 4): (6, 0b000101), (3, 4): (4, 0b0100),
        (0, 5): (8, 0b00000100), (1, 5): (7, 0b0000110), (2, 5): (7, 0b0000101), (3, 5): (5, 0b00110),
        (0, 6): (9, 0b000000111), (1, 6): (8, 0b00000110), (2, 6): (8, 0b00000101), (3, 6): (6, 0b001000),
        (0, 7): (11, 0b00000001111), (1, 7): (9, 0b000000110), (2, 7): (9, 0b000000101), (3, 7): (6, 0b000100),
        (0, 8): (11, 0b00000001011), (1, 8): (11, 0b00000001110), (2, 8): (11, 0b00000001101), (3, 8): (7, 0b0000100),
        (0, 9): (12, 0b000000001111), (1, 9): (11, 0b00000001010), (2, 9): (11, 0b00000001001), (3, 9): (9, 0b000000100),
        (0, 10): (12, 0b000000001011), (1, 10): (12, 0b000000001110), (2, 10): (12, 0b000000001101), (3, 10): (11, 0b00000001100),
        (0, 11): (12, 0b000000001000), (1, 11): (12, 0b000000001010), (2, 11): (12, 0b000000001001), (3, 11): (11, 0b00000001000),
        (0, 12): (13, 0b0000000001111), (1, 12): (13, 0b0000000001110), (2, 12): (13, 0b0000000001101), (3, 12): (12, 0b000000001100),
        (0, 13): (13, 0b0000000001011), (1, 13): (13, 0b0000000001010), (2, 13): (13, 0b0000000001001), (3, 13): (13, 0b0000000001100),
        (0, 14): (13, 0b0000000000111), (1, 14): (14, 0b00000000001011), (2, 14): (13, 0b0000000000110), (3, 14): (13, 0b0000000001000),
        (0, 15): (14, 0b00000000001001), (1, 15): (14, 0b00000000001000), (2, 15): (14, 0b00000000001010), (3, 15): (13, 0b0000000000001),
        (0, 16): (14, 0b00000000000111), (1, 16): (14, 0b00000000000110), (2, 16): (14, 0b00000000000101), (3, 16): (14, 0b00000000000100),
    },
    2: {
        (0, 0): (4, 0b1111),
        (0, 1): (6, 0b001111), (1, 1): (4, 0b1110),
        (0, 2): (6, 0b001011), (1, 2): (5, 0b01111), (2, 2): (4, 0b1101),
        (0, 3): (6, 0b001000), (1, 3): (5, 0b01100), (2, 3): (5, 0b01110), (3, 3): (4, 0b1100),
        (0, 4): (7, 0b0001111), (1, 4): (5, 0b01010), (2, 4): (5, 0b01011), (3, 4): (4, 0b1011),
        (0, 5): (7, 0b0001011), (1, 5): (5, 0b01000), (2, 5): (5, 0b01001), (3, 5): (4, 0b1010),
        (0, 6): (7, 0b0001001), (1, 6): (6, 0b001110), (2, 6): (6, 0b001101), (3, 6): (4, 0b1001),
        (0, 7): (7, 0b0001000), (1, 7): (6, 0b001010), (2, 7): (6, 0b001001), (3, 7): (4, 0b1000),
        (0, 8): (8, 0b00001111), (1, 8): (7, 0b0001110), (2, 8): (7, 0b0001101), (3, 8): (5, 0b01101),
        (0, 9): (8, 0b00001011), (1, 9): (8, 0b00001110), (2, 9): (8, 0b00001101), (3, 9): (6, 0b001100),
        (0, 10): (9, 0b000001111), (1, 10): (8, 0b00001010), (2, 10): (8, 0b00001001), (3, 10): (7, 0b0001100),
        (0, 11): (9, 0b000001011), (1, 11): (9, 0b000001110), (2, 11): (9, 0b000001101), (3, 11): (8, 0b00001100),
        (0, 12): (9, 0b000001000), (1, 12): (9, 0b000001010), (2, 12): (9, 0b000001001), (3, 12): (8, 0b00001000),
        (0, 13): (10, 0b0000000000), (1, 13): (9, 0b000000111), (2, 13): (10, 0b0000001101), (3, 13): (9, 0b000001100),
        (0, 14): (10, 0b0000001001), (1, 14): (10, 0b0000001100), (2, 14): (10, 0b0000001011), (3, 14): (10, 0b0000001010),
        (0, 15): (10, 0b0000000101), (1, 15): (10, 0b0000001000), (2, 15): (10, 0b0000000111), (3, 15): (10, 0b0000000110),
        (0, 16): (10, 0b0000000001), (1, 16): (10, 0b0000000100), (2, 16): (10, 0b0000000011), (3, 16): (10, 0b0000000010),
    },
    3: {  # chroma DC (nC == -1), maxNumCoeff 4
        (0, 0): (2, 0b01),
        (0, 1): (6, 0b000111), (1, 1): (1, 0b1),
        (0, 2): (6, 0b000100), (1, 2): (6, 0b000110), (2, 2): (3, 0b001),
        (0, 3): (6, 0b000011), (1, 3): (7, 0b0000011), (2, 3): (7, 0b0000010), (3, 3): (6, 0b000101),
        (0, 4): (6, 0b000010), (1, 4): (8, 0b00000011), (2, 4): (8, 0b00000010), (3, 4): (7, 0b0000000),
    },
}

# total_zeros for 4x4 blocks (Table 9-7/9-8): {TotalCoeff: {total_zeros: (len, code)}}
_TOTAL_ZEROS_4x4 = {
    1: {0: (1, 1), 1: (3, 0b011), 2: (3, 0b010), 3: (4, 0b0011), 4: (4, 0b0010), 5: (5, 0b00011), 6: (5, 0b00010), 7: (6, 0b000011), 8: (6, 0b000010), 9: (7, 0b0000011), 10: (7, 0b0000010), 11: (8, 0b00000011), 12: (8, 0b00000010), 13: (9, 0b000000011), 14: (9, 0b000000010), 15: (9, 0b000000001)},
    2: {0: (3, 0b111), 1: (3, 0b110), 2: (3, 0b101), 3: (3, 0b100), 4: (3, 0b011), 5: (4, 0b0101), 6: (4, 0b0100), 7: (4, 0b0011), 8: (4, 0b0010), 9: (5, 0b00011), 10: (5, 0b00010), 11: (6, 0b000011), 12: (6, 0b000010), 13: (6, 0b000001), 14: (6, 0b000000)},
    3: {0: (4, 0b0101), 1: (3, 0b111), 2: (3, 0b110), 3: (3, 0b101), 4: (4, 0b0100), 5: (4, 0b0011), 6: (3, 0b100), 7: (3, 0b011), 8: (4, 0b0010), 9: (5, 0b00011), 10: (5, 0b00010), 11: (6, 0b000001), 12: (5, 0b00001), 13: (6, 0b000000)},
    4: {0: (5, 0b00011), 1: (3, 0b111), 2: (4, 0b0101), 3: (4, 0b0100), 4: (3, 0b110), 5: (4, 0b0011), 6: (3, 0b101), 7: (4, 0b0010), 8: (3, 0b100), 9: (3, 0b011), 10: (5, 0b00010), 11: (5, 0b00001), 12: (5, 0b00000)},
    5: {0: (4, 0b0101), 1: (4, 0b0100), 2: (4, 0b0011), 3: (3, 0b111), 4: (3, 0b110), 5: (3, 0b101), 6: (3, 0b100), 7: (3, 0b011), 8: (4, 0b0010), 9: (5, 0b00001), 10: (4, 0b0001), 11: (5, 0b00000)},
    6: {0: (6, 0b000001), 1: (5, 0b00001), 2: (3, 0b111), 3: (3, 0b110), 4: (3, 0b101), 5: (3, 0b100), 6: (3, 0b011), 7: (3, 0b010), 8: (4, 0b0001), 9: (3, 0b001), 10: (6, 0b000000)},
    7: {0: (6, 0b000001), 1: (5, 0b00001), 2: (3, 0b101), 3: (3, 0b100), 4: (3, 0b011), 5: (2, 0b11), 6: (3, 0b010), 7: (4, 0b0001), 8: (3, 0b001), 9: (6, 0b000000)},
    8: {0: (6, 0b000001), 1: (4, 0b0001), 2: (5, 0b00001), 3: (3, 0b011), 4: (2, 0b11), 5: (2, 0b10), 6: (3, 0b010), 7: (3, 0b001), 8: (6, 0b000000)},
    9: {0: (6, 0b000001), 1: (6, 0b000000), 2: (4, 0b0001), 3: (2, 0b11), 4: (2, 0b10), 5: (3, 0b001), 6: (2, 0b01), 7: (5, 0b00001)},
    10: {0: (5, 0b00001), 1: (5, 0b00000), 2: (3, 0b001), 3: (2, 0b11), 4: (2, 0b10), 5: (2, 0b01), 6: (4, 0b0001)},
    11: {0: (4, 0b0000), 1: (4, 0b0001), 2: (3, 0b001), 3: (3, 0b010), 4: (1, 0b1), 5: (3, 0b011)},
    12: {0: (4, 0b0000), 1: (4, 0b0001), 2: (2, 0b01), 3: (1, 0b1), 4: (3, 0b001)},
    13: {0: (3, 0b000), 1: (3, 0b001), 2: (1, 0b1), 3: (2, 0b01)},
    14: {0: (2, 0b00), 1: (2, 0b01), 2: (1, 0b1)},
    15: {0: (1, 0b0), 1: (1, 0b1)},
}

# total_zeros for chroma DC 2x2 (Table 9-9a), maxNumCoeff 4
_TOTAL_ZEROS_CDC = {
    1: {0: (1, 1), 1: (2, 0b01), 2: (3, 0b001), 3: (3, 0b000)},
    2: {0: (1, 1), 1: (2, 0b01), 2: (2, 0b00)},
    3: {0: (1, 1), 1: (1, 0b0)},
}

# run_before (Table 9-10): {min(zerosLeft,7): {run: (len, code)}}
_RUN_BEFORE = {
    1: {0: (1, 1), 1: (1, 0)},
    2: {0: (1, 1), 1: (2, 0b01), 2: (2, 0b00)},
    3: {0: (2, 0b11), 1: (2, 0b10), 2: (2, 0b01), 3: (2, 0b00)},
    4: {0: (2, 0b11), 1: (2, 0b10), 2: (2, 0b01), 3: (3, 0b001), 4: (3, 0b000)},
    5: {0: (2, 0b11), 1: (2, 0b10), 2: (3, 0b011), 3: (3, 0b010), 4: (3, 0b001), 5: (3, 0b000)},
    6: {0: (2, 0b11), 1: (3, 0b000), 2: (3, 0b001), 3: (3, 0b011), 4: (3, 0b010), 5: (3, 0b101), 6: (3, 0b100)},
    7: {0: (3, 0b111), 1: (3, 0b110), 2: (3, 0b101), 3: (3, 0b100), 4: (3, 0b011), 5: (3, 0b010), 6: (3, 0b001),
        7: (4, 0b0001), 8: (5, 0b00001), 9: (6, 0b000001), 10: (7, 0b0000001), 11: (8, 0b00000001),
        12: (9, 0b000000001), 13: (10, 0b0000000001), 14: (11, 0b00000000001)},
}


def _vlc_decode(r: BitReader, table: dict) -> tuple:
    """Walk bits against a prefix-free {key: (len, code)} table."""
    inv = {(l, c): k for k, (l, c) in table.items()}
    code, length = 0, 0
    while length < 20:
        code = (code << 1) | r.read_bit()
        length += 1
        hit = inv.get((length, code))
        if hit is not None:
            return hit
    raise ValueError("h264: invalid VLC code")


def _coeff_token_ctx(nC: int) -> int:
    if nC == -1:
        return 3
    if nC < 2:
        return 0
    if nC < 4:
        return 1
    if nC < 8:
        return 2
    return -1  # 6-bit FLC


def decode_residual_block(r: BitReader, nC: int, max_coeff: int) -> list[int]:
    """CAVLC residual_block_cavlc (9.2) -> zigzag-ordered coefficient
    list of length ``max_coeff`` (lowest frequency first)."""
    ctx = _coeff_token_ctx(nC)
    if ctx >= 0:
        t1s, total = _vlc_decode(r, _COEFF_TOKEN[ctx])
    else:  # nC >= 8: 6-bit FLC; code 3 means (0, 0)
        code = r.read_bits(6)
        if code == 3:
            t1s, total = 0, 0
        else:
            total, t1s = (code >> 2) + 1, code & 3
    coeffs = [0] * max_coeff
    if total == 0:
        return coeffs
    if total > max_coeff:
        raise ValueError("h264: TotalCoeff exceeds block size")
    levels = []
    for i in range(t1s):  # trailing ones: sign bits only
        levels.append(-1 if r.read_bit() else 1)
    suffix_len = 1 if total > 10 and t1s < 3 else 0
    for i in range(t1s, total):
        prefix = 0
        while r.read_bit() == 0:
            prefix += 1
            if prefix > 31:
                raise ValueError("h264: runaway level_prefix")
        if prefix == 14 and suffix_len == 0:
            size = 4
        elif prefix >= 15:
            size = prefix - 3
        else:
            size = suffix_len
        suffix = r.read_bits(size) if size else 0
        level_code = (min(15, prefix) << suffix_len) + suffix
        if prefix >= 15 and suffix_len == 0:
            level_code += 15
        if prefix >= 16:
            level_code += (1 << (prefix - 3)) - 4096
        if i == t1s and t1s < 3:
            level_code += 2
        value = (level_code + 2) >> 1 if level_code % 2 == 0 else -((level_code + 1) >> 1)
        levels.append(value)
        if suffix_len == 0:
            suffix_len = 1
        if abs(value) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros
    if total < max_coeff:
        tz_table = (_TOTAL_ZEROS_CDC if max_coeff == 4 else _TOTAL_ZEROS_4x4)[total]
        total_zeros = _vlc_decode(r, tz_table)
    else:
        total_zeros = 0
    # run_before
    zeros_left = total_zeros
    runs = []
    for i in range(total - 1):
        if zeros_left > 0:
            run = _vlc_decode(r, _RUN_BEFORE[min(zeros_left, 7)])
        else:
            run = 0
        runs.append(run)
        zeros_left -= run
    runs.append(zeros_left)  # last coefficient absorbs the rest
    # place coefficients (levels[0] is the HIGHEST frequency)
    pos = total_zeros + total - 1
    for i in range(total):
        if pos < 0 or pos >= max_coeff:
            raise ValueError("h264: coefficient position out of range")
        coeffs[pos] = levels[i]
        pos -= runs[i] + 1
    return coeffs


def encode_residual_block(w: BitWriter, coeffs: list[int], nC: int) -> None:
    """CAVLC encoder for one zigzag-ordered block (inverse of
    decode_residual_block; shares the same tables, so round-trips are
    exact by construction)."""
    max_coeff = len(coeffs)
    nz = [(i, c) for i, c in enumerate(coeffs) if c != 0]
    total = len(nz)
    # trailing ones: up to 3 |c|==1 at the END (highest freq) run
    t1s = 0
    for i in range(total - 1, -1, -1):
        if abs(nz[i][1]) == 1 and t1s < 3:
            t1s += 1
        else:
            break
    ctx = _coeff_token_ctx(nC)
    if ctx >= 0:
        if (t1s, total) not in _COEFF_TOKEN[ctx]:
            raise ValueError(f"h264: no coeff_token for ({t1s},{total}) ctx{ctx}")
        l, c = _COEFF_TOKEN[ctx][(t1s, total)]
        w.write_bits(c, l)
    else:
        w.write_bits(3 if total == 0 else ((total - 1) << 2) | t1s, 6)
    if total == 0:
        return
    # levels, highest frequency first
    levels = [c for _, c in reversed(nz)]
    for i in range(t1s):
        w.write_bit(1 if levels[i] < 0 else 0)
    suffix_len = 1 if total > 10 and t1s < 3 else 0
    for i in range(t1s, total):
        value = levels[i]
        if i == t1s and t1s < 3:
            # the +2 bias is decoded off; encode value shifted down
            value = value - 1 if value > 0 else value + 1
        level_code = 2 * value - 2 if value > 0 else -2 * value - 1
        if i == t1s and t1s < 3:
            pass  # bias handled by the value shift above
        # choose prefix/suffix
        if suffix_len == 0:
            if level_code < 14:
                w.write_bits(1, level_code + 1)  # prefix zeros + 1
            elif level_code < 30:
                w.write_bits(0, 14)
                w.write_bit(1)
                w.write_bits(level_code - 14, 4)
            else:
                lc = level_code - 30  # escape: prefix 15, 12-bit suffix
                if lc >= (1 << 12):
                    raise ValueError("h264: level too large for this encoder")
                w.write_bits(0, 15)
                w.write_bit(1)
                w.write_bits(lc, 12)
        else:
            prefix = level_code >> suffix_len
            if prefix < 15:
                w.write_bits(0, prefix)
                w.write_bit(1)
                w.write_bits(level_code & ((1 << suffix_len) - 1), suffix_len)
            else:
                lc = level_code - (15 << suffix_len)
                if lc >= (1 << 12):
                    raise ValueError("h264: level too large for this encoder")
                w.write_bits(0, 15)
                w.write_bit(1)
                w.write_bits(lc, 12)
        # mirror decoder's running suffix update using the DECODED value
        dec_value = levels[i]
        if suffix_len == 0:
            suffix_len = 1
        if abs(dec_value) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    total_zeros = nz[-1][0] + 1 - total
    if total < max_coeff:
        tz_table = (_TOTAL_ZEROS_CDC if max_coeff == 4 else _TOTAL_ZEROS_4x4)[total]
        l, c = tz_table[total_zeros]
        w.write_bits(c, l)
    # run_before per coefficient, highest frequency first
    zeros_left = total_zeros
    positions = [i for i, _ in reversed(nz)]
    for i in range(total - 1):
        run = positions[i] - positions[i + 1] - 1
        if zeros_left > 0:
            l, c = _RUN_BEFORE[min(zeros_left, 7)][run]
            w.write_bits(c, l)
        zeros_left -= run


# ---------------------------------------------------------------------------
# transforms + dequant (8.5)
# ---------------------------------------------------------------------------

_ZIGZAG_4x4 = [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
               (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3)]

_V_TABLE = [  # LevelScale4x4 (v) rows per QP%6: (pos A, pos B, pos C)
    (10, 16, 13), (11, 18, 14), (13, 20, 16),
    (14, 23, 18), (16, 25, 20), (18, 29, 23),
]


def _level_scale(qp_mod: int):
    a, b, c = _V_TABLE[qp_mod]
    m = np.full((4, 4), c, dtype=np.int64)
    for i, j in ((0, 0), (0, 2), (2, 0), (2, 2)):
        m[i, j] = a
    for i, j in ((1, 1), (1, 3), (3, 1), (3, 3)):
        m[i, j] = b
    return m


def _zigzag_to_block(coeffs: list[int]) -> np.ndarray:
    blk = np.zeros((4, 4), dtype=np.int64)
    for k, (i, j) in enumerate(_ZIGZAG_4x4):
        if k < len(coeffs):
            blk[i, j] = coeffs[k]
    return blk


def dequant_4x4(blk: np.ndarray, qp: int, skip_dc: bool = False) -> np.ndarray:
    """8.5.12.1: scale AC (and DC unless supplied separately)."""
    ls = _level_scale(qp % 6)
    if qp >= 24:
        d = (blk * ls) << (qp // 6 - 4)
    else:
        d = (blk * ls + (1 << (3 - qp // 6))) >> (4 - qp // 6)
    if skip_dc:
        d[0, 0] = blk[0, 0]  # DC already scaled by the Hadamard path
    return d


def inverse_transform_4x4(d: np.ndarray) -> np.ndarray:
    """8.5.12.2 core inverse transform, output BEFORE clipping (the
    residual r = (x + 32) >> 6)."""
    d = d.astype(np.int64)
    e = np.zeros((4, 4), dtype=np.int64)
    for i in range(4):
        a = d[i, 0] + d[i, 2]
        b = d[i, 0] - d[i, 2]
        c = (d[i, 1] >> 1) - d[i, 3]
        f = d[i, 1] + (d[i, 3] >> 1)
        e[i] = [a + f, b + c, b - c, a - f]
    out = np.zeros((4, 4), dtype=np.int64)
    for j in range(4):
        a = e[0, j] + e[2, j]
        b = e[0, j] - e[2, j]
        c = (e[1, j] >> 1) - e[3, j]
        f = e[1, j] + (e[3, j] >> 1)
        out[:, j] = [a + f, b + c, b - c, a - f]
    return (out + 32) >> 6


def inverse_hadamard_4x4(f: np.ndarray) -> np.ndarray:
    """8.5.10 luma DC: plain 4x4 Hadamard (no >>1 terms)."""
    f = f.astype(np.int64)
    g = np.zeros((4, 4), dtype=np.int64)
    for i in range(4):
        a, b = f[i, 0] + f[i, 2], f[i, 0] - f[i, 2]
        c, d = f[i, 1] - f[i, 3], f[i, 1] + f[i, 3]
        g[i] = [a + d, b + c, b - c, a - d]
    out = np.zeros((4, 4), dtype=np.int64)
    for j in range(4):
        a, b = g[0, j] + g[2, j], g[0, j] - g[2, j]
        c, d = g[1, j] - g[3, j], g[1, j] + g[3, j]
        out[:, j] = [a + d, b + c, b - c, a - d]
    return out


def scale_luma_dc(f: np.ndarray, qp: int) -> np.ndarray:
    """8.5.10: dequant the Hadamard-transformed luma DC."""
    ls = _level_scale(qp % 6)[0, 0]
    if qp >= 36:
        return (f * ls) << (qp // 6 - 6)
    return (f * ls + (1 << (5 - qp // 6))) >> (6 - qp // 6)


def scale_chroma_dc(f: np.ndarray, qp: int) -> np.ndarray:
    """8.5.11: 2x2 chroma DC dequant after the 2x2 Hadamard."""
    ls = _level_scale(qp % 6)[0, 0]
    return ((f * ls) << (qp // 6)) >> 5


def inverse_hadamard_2x2(f: np.ndarray) -> np.ndarray:
    f = f.astype(np.int64)
    return np.array(
        [
            [f[0, 0] + f[0, 1] + f[1, 0] + f[1, 1], f[0, 0] - f[0, 1] + f[1, 0] - f[1, 1]],
            [f[0, 0] + f[0, 1] - f[1, 0] - f[1, 1], f[0, 0] - f[0, 1] - f[1, 0] + f[1, 1]],
        ],
        dtype=np.int64,
    )


_CHROMA_QP = {30: 29, 31: 30, 32: 31, 33: 32, 34: 32, 35: 33, 36: 34, 37: 34,
              38: 35, 39: 35, 40: 36, 41: 36, 42: 37, 43: 37, 44: 37, 45: 38,
              46: 38, 47: 38, 48: 39, 49: 39, 50: 39, 51: 39}


def chroma_qp(qp: int) -> int:
    return _CHROMA_QP.get(qp, qp) if qp >= 30 else qp


# ---------------------------------------------------------------------------
# intra prediction (8.3)
# ---------------------------------------------------------------------------

# luma 4x4 blkIdx -> (x, y) in 4-sample units (Z-scan inside 8x8 quadrants)
_BLK4_POS = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
             (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3)]

# coded_block_pattern me(v) mapping, Intra_4x4 column (Table 9-4)
_CBP_INTRA = [47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
              16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4, 8,
              17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41]
_CBP_INTRA_INV = {cbp: i for i, cbp in enumerate(_CBP_INTRA)}


def _pred16(plane, mx, my, mode):
    """Intra_16x16 luma prediction (8.3.3). plane is the recon buffer;
    (mx, my) the MB origin in samples."""
    top = plane[my - 1, mx : mx + 16].astype(np.int64) if my > 0 else None
    left = plane[my : my + 16, mx - 1].astype(np.int64) if mx > 0 else None
    if mode == 0:  # vertical
        if top is None:
            raise ValueError("h264: V pred without top neighbor")
        return np.tile(top, (16, 1))
    if mode == 1:  # horizontal
        if left is None:
            raise ValueError("h264: H pred without left neighbor")
        return np.tile(left[:, None], (1, 16))
    if mode == 2:  # DC
        if top is not None and left is not None:
            dc = (int(top.sum()) + int(left.sum()) + 16) >> 5
        elif top is not None:
            dc = (int(top.sum()) + 8) >> 4
        elif left is not None:
            dc = (int(left.sum()) + 8) >> 4
        else:
            dc = 128
        return np.full((16, 16), dc, dtype=np.int64)
    if mode == 3:  # plane
        if top is None or left is None or mx == 0 or my == 0:
            raise ValueError("h264: plane pred needs both neighbors")
        tl = int(plane[my - 1, mx - 1])
        h = sum((x + 1) * (int(top[8 + x]) - (int(top[6 - x]) if x < 7 else tl))
                for x in range(8))
        v = sum((y + 1) * (int(left[8 + y]) - (int(left[6 - y]) if y < 7 else tl))
                for y in range(8))
        a = 16 * (int(left[15]) + int(top[15]))
        b = (5 * h + 32) >> 6
        c = (5 * v + 32) >> 6
        yy, xx = np.mgrid[0:16, 0:16]
        return np.clip((a + b * (xx - 7) + c * (yy - 7) + 16) >> 5, 0, 255)
    raise ValueError(f"h264: bad Intra_16x16 mode {mode}")


def _pred_chroma(plane, mx, my, mode):
    """Intra chroma 8x8 prediction (8.3.4). Mode numbering: 0 DC, 1 H,
    2 V, 3 plane."""
    top = plane[my - 1, mx : mx + 8].astype(np.int64) if my > 0 else None
    left = plane[my : my + 8, mx - 1].astype(np.int64) if mx > 0 else None
    if mode == 0:  # DC, per 4x4 sub-block
        out = np.zeros((8, 8), dtype=np.int64)
        for sy in (0, 4):
            for sx in (0, 4):
                t = top[sx : sx + 4] if top is not None else None
                l = left[sy : sy + 4] if left is not None else None
                # corner blocks prefer the straight-on neighbor
                if sx == 0 and sy == 0 or sx == 4 and sy == 4:
                    use_t, use_l = t, l
                elif sx == 4 and sy == 0:
                    use_t, use_l = t, None if t is not None else l
                else:  # sx == 0, sy == 4
                    use_l, use_t = l, None if l is not None else t
                if use_t is not None and use_l is not None:
                    dc = (int(use_t.sum()) + int(use_l.sum()) + 4) >> 3
                elif use_t is not None:
                    dc = (int(use_t.sum()) + 2) >> 2
                elif use_l is not None:
                    dc = (int(use_l.sum()) + 2) >> 2
                else:
                    dc = 128
                out[sy : sy + 4, sx : sx + 4] = dc
        return out
    if mode == 1:  # horizontal
        if left is None:
            raise ValueError("h264: chroma H pred without left")
        return np.tile(left[:, None], (1, 8))
    if mode == 2:  # vertical
        if top is None:
            raise ValueError("h264: chroma V pred without top")
        return np.tile(top, (8, 1))
    if mode == 3:  # plane
        if top is None or left is None:
            raise ValueError("h264: chroma plane needs both neighbors")
        tl = int(plane[my - 1, mx - 1])
        h = sum((x + 1) * (int(top[4 + x]) - (int(top[2 - x]) if x < 3 else tl))
                for x in range(4))
        v = sum((y + 1) * (int(left[4 + y]) - (int(left[2 - y]) if y < 3 else tl))
                for y in range(4))
        a = 16 * (int(left[7]) + int(top[7]))
        b = (17 * h + 16) >> 5
        c = (17 * v + 16) >> 5
        yy, xx = np.mgrid[0:8, 0:8]
        return np.clip((a + b * (xx - 3) + c * (yy - 3) + 16) >> 5, 0, 255)
    raise ValueError(f"h264: bad chroma mode {mode}")


def _pred4(plane, bx, by, mode, avail_right_mbs):
    """Intra_4x4 luma prediction (8.3.1). (bx, by) = block origin in
    samples; avail_right_mbs = width of the valid recon region (for
    top-right availability)."""
    have_top = by > 0
    have_left = bx > 0
    top = plane[by - 1, bx : bx + 4].astype(np.int64) if have_top else None
    left = plane[by : by + 4, bx - 1].astype(np.int64) if have_left else None
    tl = int(plane[by - 1, bx - 1]) if have_top and have_left else 0
    # top-right: available only if inside the already-reconstructed area
    if have_top and bx + 8 <= avail_right_mbs and (by % 16 != 0 or True):
        tr_ok = _tr_available(bx, by, avail_right_mbs)
    else:
        tr_ok = False
    if have_top:
        if tr_ok:
            tr = plane[by - 1, bx + 4 : bx + 8].astype(np.int64)
        else:
            tr = np.full(4, int(top[3]), dtype=np.int64)
    if mode == 0:  # V
        if not have_top:
            raise ValueError("h264: 4x4 V pred without top")
        return np.tile(top, (4, 1))
    if mode == 1:  # H
        if not have_left:
            raise ValueError("h264: 4x4 H pred without left")
        return np.tile(left[:, None], (1, 4))
    if mode == 2:  # DC
        if have_top and have_left:
            dc = (int(top.sum()) + int(left.sum()) + 4) >> 3
        elif have_top:
            dc = (int(top.sum()) + 2) >> 2
        elif have_left:
            dc = (int(left.sum()) + 2) >> 2
        else:
            dc = 128
        return np.full((4, 4), dc, dtype=np.int64)
    # the directional modes need top and/or left; build the A..M array
    if mode == 3:  # diagonal down-left
        if not have_top:
            raise ValueError("h264: DDL without top")
        p = np.concatenate([top, tr])
        out = np.zeros((4, 4), dtype=np.int64)
        for y in range(4):
            for x in range(4):
                i = x + y
                if i == 6:
                    out[y, x] = (p[6] + 3 * p[7] + 2) >> 2
                else:
                    out[y, x] = (p[i] + 2 * p[i + 1] + p[i + 2] + 2) >> 2
        return out
    if mode == 4:  # diagonal down-right
        if not (have_top and have_left):
            raise ValueError("h264: DDR needs both")
        out = np.zeros((4, 4), dtype=np.int64)
        for y in range(4):
            for x in range(4):
                if x > y:
                    out[y, x] = (top[x - y - 2] + 2 * top[x - y - 1] + top[x - y] + 2) >> 2 if x - y >= 2 else (
                        (tl + 2 * top[0] + top[1] + 2) >> 2 if x - y == 1 else 0)
                elif x < y:
                    out[y, x] = (left[y - x - 2] + 2 * left[y - x - 1] + left[y - x] + 2) >> 2 if y - x >= 2 else (
                        (tl + 2 * left[0] + left[1] + 2) >> 2 if y - x == 1 else 0)
                else:
                    out[y, x] = (top[0] + 2 * tl + left[0] + 2) >> 2
        return out
    if mode == 5:  # vertical-right
        if not (have_top and have_left):
            raise ValueError("h264: VR needs both")
        out = np.zeros((4, 4), dtype=np.int64)
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    out[y, x] = (top[x - (y >> 1) - 1] + top[x - (y >> 1)] + 1) >> 1 if x - (y >> 1) >= 1 else (tl + top[0] + 1) >> 1
                elif z >= 0:
                    a = top[x - (y >> 1) - 2] if x - (y >> 1) >= 2 else tl
                    b = top[x - (y >> 1) - 1] if x - (y >> 1) >= 1 else left[0]
                    c = top[x - (y >> 1)]
                    out[y, x] = (a + 2 * b + c + 2) >> 2
                elif z == -1:
                    out[y, x] = (left[0] + 2 * tl + top[0] + 2) >> 2
                else:
                    out[y, x] = (left[y - 1] + 2 * left[y - 2] + left[y - 3] + 2) >> 2 if y >= 3 else (left[1] + 2 * left[0] + tl + 2) >> 2
        return out
    if mode == 6:  # horizontal-down
        if not (have_top and have_left):
            raise ValueError("h264: HD needs both")
        out = np.zeros((4, 4), dtype=np.int64)
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    i = y - (x >> 1) - 1
                    out[y, x] = (left[i] + left[i + 1] + 1) >> 1 if i >= 0 else (tl + left[0] + 1) >> 1
                elif z >= 0:
                    i = y - (x >> 1)
                    a = left[i - 2] if i >= 2 else tl
                    b = left[i - 1] if i >= 1 else top[0]
                    c = left[i] if i >= 0 else top[0]
                    out[y, x] = (a + 2 * b + c + 2) >> 2
                elif z == -1:
                    out[y, x] = (top[0] + 2 * tl + left[0] + 2) >> 2
                else:
                    out[y, x] = (top[x - 1] + 2 * top[x - 2] + top[x - 3] + 2) >> 2 if x >= 3 else (top[1] + 2 * top[0] + tl + 2) >> 2
        return out
    if mode == 7:  # vertical-left
        if not have_top:
            raise ValueError("h264: VL without top")
        p = np.concatenate([top, tr])
        out = np.zeros((4, 4), dtype=np.int64)
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y % 2 == 0:
                    out[y, x] = (p[i] + p[i + 1] + 1) >> 1
                else:
                    out[y, x] = (p[i] + 2 * p[i + 1] + p[i + 2] + 2) >> 2
        return out
    if mode == 8:  # horizontal-up
        if not have_left:
            raise ValueError("h264: HU without left")
        out = np.zeros((4, 4), dtype=np.int64)
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z <= 4 and z % 2 == 0:
                    i = y + (x >> 1)
                    out[y, x] = (left[i] + left[i + 1] + 1) >> 1
                elif z <= 4:
                    i = y + (x >> 1)
                    out[y, x] = (left[i] + 2 * left[i + 1] + left[i + 2] + 2) >> 2
                elif z == 5:
                    out[y, x] = (left[2] + 3 * left[3] + 2) >> 2
                else:
                    out[y, x] = left[3]
        return out
    raise ValueError(f"h264: bad Intra_4x4 mode {mode}")


def _tr_available(bx, by, width):
    """Top-right 4 samples available: the block row above extends to
    bx+8 AND the block above-right was already decoded (raster MB
    order; inside an MB the Z-scan handles it — conservatively allow
    when bx+8 <= width and the above-right region is in a previous MB
    row or an earlier MB/block)."""
    if bx + 8 > width:
        return False
    mb_row_y = (by // 16) * 16
    if by == mb_row_y:  # block's top row comes from the MB row above
        return True
    # inside an MB: top-right exists only for blocks whose above-right
    # 4x4 neighbour is earlier in Z-scan; those are blk positions where
    # (x4, y4) has a decoded block at (x4+1, y4-1)
    x4, y4 = (bx % 16) // 4, (by % 16) // 4
    if x4 == 3:  # needs the next MB, not yet decoded
        return False
    pos = _BLK4_POS.index((x4, y4))
    above_right = _BLK4_POS.index((x4 + 1, y4 - 1)) if (x4 + 1, y4 - 1) in _BLK4_POS else -1
    return 0 <= above_right < pos


# ---------------------------------------------------------------------------
# parameter sets + slice decode (7.3, 8.3, 8.5)
# ---------------------------------------------------------------------------


def _parse_sps(rbsp: bytes) -> dict:
    r = BitReader(rbsp)
    profile = r.read_bits(8)
    r.read_bits(8)  # constraint flags + reserved
    level = r.read_bits(8)
    sps_id = r.ue()
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        raise NotImplementedError("h264: high-profile SPS not supported")
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        raise NotImplementedError("h264: pic_order_cnt_type 1")
    r.ue()  # max_num_ref_frames
    r.read_bit()  # gaps_in_frame_num_value_allowed_flag
    w_mbs = r.ue() + 1
    h_map = r.ue() + 1
    frame_mbs_only = r.read_bit()
    if not frame_mbs_only:
        raise NotImplementedError("h264: interlace (frame_mbs_only=0)")
    r.read_bit()  # direct_8x8_inference_flag
    crop = r.read_bit()
    cl = cr_ = ct = cb_ = 0
    if crop:
        cl, cr_, ct, cb_ = r.ue(), r.ue(), r.ue(), r.ue()
    return {
        "profile": profile, "level": level, "sps_id": sps_id,
        "log2_max_frame_num": log2_max_frame_num, "poc_type": poc_type,
        "w_mbs": w_mbs, "h_mbs": h_map,
        "width": w_mbs * 16 - 2 * (cl + cr_),
        "height": h_map * 16 - 2 * (ct + cb_),
        "crop": (cl, cr_, ct, cb_),
    }


def _parse_pps(rbsp: bytes) -> dict:
    r = BitReader(rbsp)
    pps_id, sps_id = r.ue(), r.ue()
    if r.read_bit():
        raise NotImplementedError("h264: CABAC (entropy_coding_mode=1)")
    r.read_bit()  # bottom_field_pic_order_in_frame_present
    if r.ue() != 0:
        raise NotImplementedError("h264: slice groups (FMO)")
    r.ue(); r.ue()  # num_ref_idx defaults
    r.read_bit()  # weighted_pred_flag
    r.read_bits(2)  # weighted_bipred_idc
    init_qp = r.se() + 26
    r.se()  # pic_init_qs
    chroma_qp_off = r.se()
    deblock_ctrl = r.read_bit()
    constrained_intra = r.read_bit()
    r.read_bit()  # redundant_pic_cnt_present
    return {
        "pps_id": pps_id, "sps_id": sps_id, "init_qp": init_qp,
        "chroma_qp_offset": chroma_qp_off, "deblock_ctrl": deblock_ctrl,
        "constrained_intra": constrained_intra,
    }


class _MbCtx:
    """Per-MB bookkeeping for CAVLC nC and prediction modes."""

    def __init__(self, w_mbs, h_mbs):
        self.w_mbs, self.h_mbs = w_mbs, h_mbs
        # TotalCoeff per luma 4x4 (in 4x4-block grid), per chroma 4x4
        self.luma_nz = np.full((h_mbs * 4, w_mbs * 4), -1, dtype=np.int32)
        self.cb_nz = np.full((h_mbs * 2, w_mbs * 2), -1, dtype=np.int32)
        self.cr_nz = np.full((h_mbs * 2, w_mbs * 2), -1, dtype=np.int32)
        # Intra4x4PredMode per 4x4 block (-1 = unavailable / non-I4 MB -> DC(2))
        self.pred4 = np.full((h_mbs * 4, w_mbs * 4), -1, dtype=np.int32)

    def nC(self, grid, bx, by):
        """9.2.1 nC from left (nA) and top (nB) block TotalCoeff."""
        nA = grid[by, bx - 1] if bx > 0 else -1
        nB = grid[by - 1, bx] if by > 0 else -1
        if nA >= 0 and nB >= 0:
            return (nA + nB + 1) >> 1
        if nA >= 0:
            return nA
        if nB >= 0:
            return nB
        return 0


def _decode_slice(rbsp: bytes, sps: dict, pps: dict):
    """Decode one IDR I slice -> (Y, Cb, Cr) uint8 planes (uncropped)."""
    r = BitReader(rbsp)
    first_mb = r.ue()
    slice_type = r.ue()
    if slice_type % 5 != 2:
        raise NotImplementedError(f"h264: only I slices (slice_type {slice_type})")
    if first_mb != 0:
        raise NotImplementedError("h264: multi-slice pictures")
    r.ue()  # pps id
    r.read_bits(sps["log2_max_frame_num"])  # frame_num
    r.ue()  # idr_pic_id (IDR)
    if sps["poc_type"] == 0:
        raise NotImplementedError("h264: poc_type 0 slice header")
    r.read_bit(); r.read_bit()  # dec_ref_pic_marking (IDR: 2 flags)
    qp = pps["init_qp"] + r.se()
    if pps["deblock_ctrl"]:
        idc = r.ue()
        if idc != 1:
            r.se(); r.se()  # offsets; loop filter itself is NOT applied
    w_mbs, h_mbs = sps["w_mbs"], sps["h_mbs"]
    W, H = w_mbs * 16, h_mbs * 16
    Y = np.zeros((H, W), dtype=np.uint8)
    Cb = np.full((H // 2, W // 2), 128, dtype=np.uint8)
    Cr = np.full((H // 2, W // 2), 128, dtype=np.uint8)
    ctx = _MbCtx(w_mbs, h_mbs)
    qpc_off = pps["chroma_qp_offset"]

    for mb in range(w_mbs * h_mbs):
        mbx, mby = mb % w_mbs, mb // w_mbs
        mx, my = mbx * 16, mby * 16
        mb_type = r.ue()
        if mb_type == 25:  # I_PCM
            r.byte_align()
            y = np.array([[r.read_bits(8) for _ in range(16)] for _ in range(16)], dtype=np.uint8)
            cb = np.array([[r.read_bits(8) for _ in range(8)] for _ in range(8)], dtype=np.uint8)
            cr = np.array([[r.read_bits(8) for _ in range(8)] for _ in range(8)], dtype=np.uint8)
            Y[my : my + 16, mx : mx + 16] = y
            Cb[my // 2 : my // 2 + 8, mx // 2 : mx // 2 + 8] = cb
            Cr[my // 2 : my // 2 + 8, mx // 2 : mx // 2 + 8] = cr
            ctx.luma_nz[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 16
            ctx.cb_nz[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
            ctx.cr_nz[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
            ctx.pred4[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 2
            continue
        if mb_type == 0:  # I_4x4
            modes = []
            for blk in range(16):
                x4, y4 = _BLK4_POS[blk]
                gx, gy = mbx * 4 + x4, mby * 4 + y4
                # predIntra4x4PredMode = min(left, top) with DC fallback
                left_m = ctx.pred4[gy, gx - 1] if gx > 0 else -1
                top_m = ctx.pred4[gy - 1, gx] if gy > 0 else -1
                pred_m = 2 if left_m < 0 or top_m < 0 else min(left_m, top_m)
                if r.read_bit():
                    mode = pred_m
                else:
                    rem = r.read_bits(3)
                    mode = rem if rem < pred_m else rem + 1
                modes.append(mode)
                ctx.pred4[gy, gx] = mode
            chroma_mode = r.ue()
            cbp = _CBP_INTRA[r.ue()]
            cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
            if cbp:
                qp += r.se()
            # per-4x4: predict, then residual if cbp bit set, in Z order
            for blk in range(16):
                x4, y4 = _BLK4_POS[blk]
                bx, by = mx + x4 * 4, my + y4 * 4
                gx, gy = mbx * 4 + x4, mby * 4 + y4
                pred = _pred4(Y.astype(np.int64), bx, by, modes[blk], W)
                if cbp_luma & (1 << (blk // 4)):
                    nc = ctx.nC(ctx.luma_nz, gx, gy)
                    coeffs = decode_residual_block(r, nc, 16)
                    ctx.luma_nz[gy, gx] = sum(1 for c in coeffs if c)
                    res = inverse_transform_4x4(dequant_4x4(_zigzag_to_block(coeffs), qp))
                else:
                    ctx.luma_nz[gy, gx] = 0
                    res = 0
                Y[by : by + 4, bx : bx + 4] = np.clip(pred + res, 0, 255).astype(np.uint8)
        elif 1 <= mb_type <= 24:  # I_16x16
            t = mb_type - 1
            pred_mode = t % 4
            cbp_chroma = (t // 4) % 3
            cbp_luma = 15 if t >= 12 else 0
            chroma_mode = r.ue()
            qp += r.se()  # mb_qp_delta (always present for I_16x16)
            pred = _pred16(Y.astype(np.int64), mx, my, pred_mode)
            # luma DC: CAVLC with nC of block 0
            nc = ctx.nC(ctx.luma_nz, mbx * 4, mby * 4)
            dc_coeffs = decode_residual_block(r, nc, 16)
            dc_blk = _zigzag_to_block(dc_coeffs)
            dc = scale_luma_dc(inverse_hadamard_4x4(dc_blk), qp)
            recon = np.zeros((16, 16), dtype=np.int64)
            for blk in range(16):
                x4, y4 = _BLK4_POS[blk]
                gx, gy = mbx * 4 + x4, mby * 4 + y4
                if cbp_luma:
                    nc = ctx.nC(ctx.luma_nz, gx, gy)
                    ac = decode_residual_block(r, nc, 15)
                    ctx.luma_nz[gy, gx] = sum(1 for c in ac if c)
                    blk16 = _zigzag_to_block([0] + ac)
                else:
                    ctx.luma_nz[gy, gx] = 0
                    blk16 = np.zeros((4, 4), dtype=np.int64)
                d = dequant_4x4(blk16, qp, skip_dc=True)
                d[0, 0] = dc[y4, x4]
                res = inverse_transform_4x4(d)
                recon[y4 * 4 : y4 * 4 + 4, x4 * 4 : x4 * 4 + 4] = res
            Y[my : my + 16, mx : mx + 16] = np.clip(pred + recon, 0, 255).astype(np.uint8)
            modes = None
            ctx.pred4[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 2
        else:
            raise ValueError(f"h264: bad I-slice mb_type {mb_type}")

        # chroma (shared by I_4x4 and I_16x16)
        qpc = chroma_qp(max(0, min(51, qp + qpc_off)))
        for comp, plane, nz in (("cb", Cb, ctx.cb_nz), ("cr", Cr, ctx.cr_nz)):
            cx, cy = mx // 2, my // 2
            pred = _pred_chroma(plane.astype(np.int64), cx, cy, chroma_mode)
            res = np.zeros((8, 8), dtype=np.int64)
            if cbp_chroma:
                dc_coeffs = decode_residual_block(r, -1, 4)
                f = np.array([[dc_coeffs[0], dc_coeffs[1]], [dc_coeffs[2], dc_coeffs[3]]], dtype=np.int64)
                dc = scale_chroma_dc(inverse_hadamard_2x2(f), qpc)
            else:
                dc = np.zeros((2, 2), dtype=np.int64)
            for sb, (sx, sy) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
                gx, gy = mbx * 2 + sx, mby * 2 + sy
                if cbp_chroma == 2:
                    nc = ctx.nC(nz, gx, gy)
                    ac = decode_residual_block(r, nc, 15)
                    nz[gy, gx] = sum(1 for c in ac if c)
                    blk = _zigzag_to_block([0] + ac)
                else:
                    nz[gy, gx] = 0
                    blk = np.zeros((4, 4), dtype=np.int64)
                d = dequant_4x4(blk, qpc, skip_dc=True)
                d[0, 0] = dc[sy, sx]
                res[sy * 4 : sy * 4 + 4, sx * 4 : sx * 4 + 4] = inverse_transform_4x4(d)
            plane[cy : cy + 8, cx : cx + 8] = np.clip(pred + res, 0, 255).astype(np.uint8)
    return Y, Cb, Cr


def index_h264(data: bytes, sps: dict | None = None, pps: dict | None = None):
    """Cheap Annex-B index: -> (sps dict, pps dict, [IDR slice RBSP]).

    Header arithmetic only — the start-code scan plus SPS/PPS parses;
    no slice is entropy-decoded. This is the demux half of keyframe
    sampling: a 100 TB pipeline indexes every payload but pays CAVLC +
    transform cost only for the frames it actually samples (the same
    cost split `avi.demux_avi_mjpeg` gives MJPEG).

    ``sps``/``pps`` carry parameter-set state for container chunks
    that don't repeat them (AVI convention: PS in the first chunk
    only); in-band parameter sets in ``data`` take precedence."""
    idrs: list[bytes] = []
    for nal in split_nals(data):
        if not nal:
            continue
        nal_type = nal[0] & 0x1F
        if nal_type == 7:
            sps = _parse_sps(strip_emulation(nal[1:]))
        elif nal_type == 8:
            pps = _parse_pps(strip_emulation(nal[1:]))
        elif nal_type == 5:
            idrs.append(strip_emulation(nal[1:]))
        elif nal_type == 1:
            raise NotImplementedError("h264: non-IDR slice (P/B)")
    if sps is None or pps is None:
        raise ValueError("h264: no SPS/PPS in stream")
    if not idrs:
        raise ValueError("h264: no IDR slice in stream")
    return sps, pps, idrs


def decode_idr_rgb(sps: dict, pps: dict, rbsp: bytes) -> np.ndarray:
    """Decode ONE indexed IDR slice RBSP -> cropped HxWx3 RGB uint8.

    Chroma is upsampled nearest (2x) and converted with the repo's
    JFIF BT.601 full-range convention (H.264 leaves the conversion to
    VUI, absent in this subset; using the same convention as
    operators/jpeg.py keeps media digests comparable)."""
    y, cb, cr = _decode_slice(rbsp, sps, pps)
    w, h = sps["width"], sps["height"]
    cb_full = cb.repeat(2, axis=0).repeat(2, axis=1).astype(np.float64)
    cr_full = cr.repeat(2, axis=0).repeat(2, axis=1).astype(np.float64)
    yf = y.astype(np.float64)
    r_ = np.rint(yf + 1.402 * (cr_full - 128.0)).clip(0, 255)
    g_ = np.rint(yf - 0.344136 * (cb_full - 128.0) - 0.714136 * (cr_full - 128.0)).clip(0, 255)
    b_ = np.rint(yf + 1.772 * (cb_full - 128.0)).clip(0, 255)
    rgb = np.stack([r_, g_, b_], axis=-1).astype(np.uint8)
    return np.ascontiguousarray(rgb[:h, :w])


def decode_h264_frames(data: bytes):
    """Annex-B byte stream -> (width, height, [RGB frame, ...]);
    one RGB frame per IDR I slice (see :func:`decode_idr_rgb`)."""
    sps, pps, idrs = index_h264(data)
    frames = [decode_idr_rgb(sps, pps, rbsp) for rbsp in idrs]
    return sps["width"], sps["height"], frames


def probe_h264(data: bytes):
    """(width, height, n_idr_nals) from the SPS alone."""
    sps = None
    n = 0
    for nal in split_nals(data):
        if not nal:
            continue
        t = nal[0] & 0x1F
        if t == 7 and sps is None:
            sps = _parse_sps(strip_emulation(nal[1:]))
        elif t == 5:
            n += 1
    if sps is None:
        raise ValueError("h264: no SPS")
    return sps["width"], sps["height"], n


# ---------------------------------------------------------------------------
# encoder (same subset; fixtures choose prediction modes and quantized
# coefficient LEVELS directly — entropy + headers only, no rate control)
# ---------------------------------------------------------------------------


def _nal(nal_type: int, ref_idc: int, rbsp: bytes) -> bytes:
    return b"\x00\x00\x00\x01" + bytes([(ref_idc << 5) | nal_type]) + add_emulation(rbsp)


def _write_sps(w_mbs: int, h_mbs: int, width: int, height: int) -> bytes:
    w = BitWriter()
    w.write_bits(66, 8)   # profile_idc: Baseline
    w.write_bits(0xC0, 8)  # constraint_set0+1 (constrained baseline)
    w.write_bits(10, 8)   # level 1.0 (fixture-sized)
    w.ue(0)               # sps_id
    w.ue(0)               # log2_max_frame_num_minus4
    w.ue(2)               # pic_order_cnt_type
    w.ue(1)               # max_num_ref_frames
    w.write_bit(0)        # gaps_in_frame_num_value_allowed
    w.ue(w_mbs - 1)
    w.ue(h_mbs - 1)
    w.write_bit(1)        # frame_mbs_only
    w.write_bit(1)        # direct_8x8_inference
    crop_r = (w_mbs * 16 - width) // 2
    crop_b = (h_mbs * 16 - height) // 2
    if crop_r or crop_b:
        w.write_bit(1)
        w.ue(0); w.ue(crop_r); w.ue(0); w.ue(crop_b)
    else:
        w.write_bit(0)
    w.write_bit(0)        # vui_parameters_present
    w.byte_align_stop()
    return w.to_bytes()


def _write_pps(qp: int) -> bytes:
    w = BitWriter()
    w.ue(0); w.ue(0)      # pps_id, sps_id
    w.write_bit(0)        # CAVLC
    w.write_bit(0)        # bottom_field_poc
    w.ue(0)               # one slice group
    w.ue(0); w.ue(0)      # num_ref_idx defaults
    w.write_bit(0)        # weighted_pred
    w.write_bits(0, 2)    # weighted_bipred
    w.se(qp - 26)         # pic_init_qp
    w.se(0)               # pic_init_qs
    w.se(0)               # chroma_qp_index_offset
    w.write_bit(1)        # deblocking_filter_control_present
    w.write_bit(0)        # constrained_intra_pred
    w.write_bit(0)        # redundant_pic_cnt_present
    w.byte_align_stop()
    return w.to_bytes()


def encode_h264_iframe(mbs: list, w_mbs: int, h_mbs: int, width: int,
                       height: int, qp: int = 28,
                       include_ps: bool = True) -> bytes:
    """One IDR access unit from per-MB specs (raster order):

    - ``("pcm", y16, cb8, cr8)`` — raw sample arrays
    - ``("i16", pred_mode, chroma_mode, dc16, acs, cbp_chroma, cdc, cacs)``
      dc16: 16 zigzag luma-DC levels; acs: None or 16 lists of 15 AC
      levels (Z-scan block order); cdc/cacs: per-component chroma DC
      (4 levels) and AC (4 lists of 15) or None
    - ``("i4", modes, lumas, chroma_mode, cbp_chroma, cdc, cacs)``
      modes: 16 Intra_4x4 modes (Z-scan); lumas: 16 x (None | 16
      levels)

    The caller picks LEVELS; the encoder never quantizes — fixtures
    define the decoded result exactly (replayed by independent math in
    tests and oracles).
    """
    w = BitWriter()
    w.ue(0)               # first_mb_in_slice
    w.ue(7)               # slice_type: I (all slices I)
    w.ue(0)               # pps_id
    w.write_bits(0, 4)    # frame_num
    w.ue(0)               # idr_pic_id
    w.write_bit(0); w.write_bit(0)  # dec_ref_pic_marking
    w.se(0)               # slice_qp_delta
    w.ue(1)               # disable_deblocking_filter_idc = 1

    luma_nz = np.full((h_mbs * 4, w_mbs * 4), -1, dtype=np.int32)
    cb_nz = np.full((h_mbs * 2, w_mbs * 2), -1, dtype=np.int32)
    cr_nz = np.full((h_mbs * 2, w_mbs * 2), -1, dtype=np.int32)
    pred4 = np.full((h_mbs * 4, w_mbs * 4), -1, dtype=np.int32)
    ctx = _MbCtx(w_mbs, h_mbs)
    ctx.luma_nz, ctx.cb_nz, ctx.cr_nz = luma_nz, cb_nz, cr_nz

    for mb_i, spec in enumerate(mbs):
        mbx, mby = mb_i % w_mbs, mb_i // w_mbs
        kind = spec[0]
        if kind == "pcm":
            _, y, cb, cr = spec
            w.ue(25)
            while len(w.bits) % 8:  # pcm_alignment_zero_bit
                w.write_bit(0)
            for row in np.asarray(y, dtype=np.uint8):
                for s in row:
                    w.write_bits(int(s), 8)
            for plane in (cb, cr):
                for row in np.asarray(plane, dtype=np.uint8):
                    for s in row:
                        w.write_bits(int(s), 8)
            luma_nz[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 16
            cb_nz[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
            cr_nz[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
            pred4[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 2
        elif kind == "i16":
            _, pred_mode, chroma_mode, dc16, acs, cbp_chroma, cdc, cacs = spec
            cbp_luma = 15 if acs is not None else 0
            mb_type = 1 + pred_mode + 4 * cbp_chroma + (12 if cbp_luma else 0)
            w.ue(mb_type)
            w.ue(chroma_mode)
            w.se(0)  # mb_qp_delta
            nc = ctx.nC(luma_nz, mbx * 4, mby * 4)
            encode_residual_block(w, list(dc16), nc)
            for blk in range(16):
                x4, y4 = _BLK4_POS[blk]
                gx, gy = mbx * 4 + x4, mby * 4 + y4
                if cbp_luma:
                    ac = list(acs[blk])
                    nc = ctx.nC(luma_nz, gx, gy)
                    encode_residual_block(w, ac, nc)
                    luma_nz[gy, gx] = sum(1 for c in ac if c)
                else:
                    luma_nz[gy, gx] = 0
            pred4[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 2
            _encode_chroma(w, ctx, mbx, mby, cbp_chroma, cdc, cacs)
        elif kind == "i4":
            _, modes, lumas, chroma_mode, cbp_chroma, cdc, cacs = spec
            w.ue(0)
            cbp_luma = 0
            for blk in range(16):
                if lumas[blk] is not None and any(lumas[blk]):
                    cbp_luma |= 1 << (blk // 4)
            for blk in range(16):
                x4, y4 = _BLK4_POS[blk]
                gx, gy = mbx * 4 + x4, mby * 4 + y4
                left_m = pred4[gy, gx - 1] if gx > 0 else -1
                top_m = pred4[gy - 1, gx] if gy > 0 else -1
                pred_m = 2 if left_m < 0 or top_m < 0 else min(left_m, top_m)
                mode = modes[blk]
                if mode == pred_m:
                    w.write_bit(1)
                else:
                    w.write_bit(0)
                    w.write_bits(mode if mode < pred_m else mode - 1, 3)
                pred4[gy, gx] = mode
            w.ue(chroma_mode)
            cbp = cbp_luma | (cbp_chroma << 4)
            w.ue(_CBP_INTRA_INV[cbp])
            if cbp:
                w.se(0)  # mb_qp_delta
            for blk in range(16):
                x4, y4 = _BLK4_POS[blk]
                gx, gy = mbx * 4 + x4, mby * 4 + y4
                if cbp_luma & (1 << (blk // 4)):
                    levels = list(lumas[blk]) if lumas[blk] is not None else [0] * 16
                    nc = ctx.nC(luma_nz, gx, gy)
                    encode_residual_block(w, levels, nc)
                    luma_nz[gy, gx] = sum(1 for c in levels if c)
                else:
                    luma_nz[gy, gx] = 0
            _encode_chroma(w, ctx, mbx, mby, cbp_chroma, cdc, cacs)
        else:
            raise ValueError(f"unknown mb spec {kind!r}")
    w.byte_align_stop()
    slice_rbsp = w.to_bytes()
    out = b""
    if include_ps:
        out += _nal(7, 3, _write_sps(w_mbs, h_mbs, width, height))
        out += _nal(8, 3, _write_pps(qp))
    out += _nal(5, 3, slice_rbsp)
    return out


def _encode_chroma(w, ctx, mbx, mby, cbp_chroma, cdc, cacs):
    """Chroma residual for both components; cdc = (cb_dc4, cr_dc4),
    cacs = (cb_ac_lists, cr_ac_lists) or None."""
    if not cbp_chroma:
        ctx.cb_nz[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 0
        ctx.cr_nz[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 0
        return
    for ci, nz in ((0, ctx.cb_nz), (1, ctx.cr_nz)):
        dc = list(cdc[ci]) if cdc is not None else [0, 0, 0, 0]
        encode_residual_block(w, dc, -1)
        for sb, (sx, sy) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
            gx, gy = mbx * 2 + sx, mby * 2 + sy
            if cbp_chroma == 2:
                ac = list(cacs[ci][sb]) if cacs is not None else [0] * 15
                nc = ctx.nC(nz, gx, gy)
                encode_residual_block(w, ac, nc)
                nz[gy, gx] = sum(1 for c in ac if c)
            else:
                nz[gy, gx] = 0
