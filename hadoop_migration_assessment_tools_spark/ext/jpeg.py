"""[EXT] Baseline JPEG codec in pure numpy + stdlib (no PIL/libjpeg).

Implements the baseline sequential DCT process of the public JPEG spec
(ITU-T T.81 / ISO 10918-1): 8x8 forward/inverse DCT, Annex-K luminance and
chrominance quantization tables with libjpeg-style quality scaling, zigzag,
DC DPCM + AC run-length coding, canonical Huffman built from DHT BITS/HUFFVAL,
entropy bitstream with 0xFF byte stuffing, JFIF marker structure, generic
component sampling factors (4:4:4, 4:2:0, 4:2:2 MCU interleave) and RSTn
restart markers.

Decoder coverage: SOF0 baseline sequential, SOF1 extended sequential (8- and
12-bit precision, 16-bit Pq=1 DQT tables), SOF2 progressive (spectral
selection + successive approximation, DC/AC first and refinement scans, EOB
runs — T.81 Annex G.2 with libjpeg jdphuff.c control flow; 8- AND 12-bit as
of r9) AND SOF3 lossless (r9 — T.81 Annex H: all 7 predictors, 8/12-bit,
bit-exact roundtrip; the DNG/medical process) AND the ARITHMETIC-coded
processes (r10 — T.81 Annexes D, F & G QM-coder in ext/jarith.py): SOF9
extended sequential (encoder + decoder) and SOF10 progressive (decoder),
both cross-validated against libjpeg-turbo. The remaining processes
(arithmetic lossless SOF11, hierarchical) raise NotImplementedError,
matching the WAV/PPM/PNG codecs' partial-coverage discipline
(ext/multimodal.py callers catch and fall back with decoded=false).

The encoder exists to close the loop in-sandbox: it emits valid baseline JFIF
that ANY decoder can read, using compact generated Huffman tables (12 DC codes
of length 4, 162 AC codes of length 8 — valid canonical tables; optimality is
irrelevant to correctness). The golden test strategy mirrors BPE's: the lossy
step is quantization ONLY, so the decoder's dequantized coefficients must
EXACTLY equal the encoder's quantized coefficients times the table — pinned in
tests/test_ext_operators.py along with pixel-error bounds on the roundtrip.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "make_jpeg_bytes",
    "make_lossless_jpeg_bytes",
    "make_progressive_jpeg_bytes",
    "parse_jpeg",
]

#: Decompression-bomb ceiling for parse_jpeg (total pixels). 16 MP covers any
#: sane corpus image; declared dimensions above it raise ValueError (routed to
#: decoded=false by media_features) instead of allocating gigabytes.
JPEG_MAX_PIXELS = 16_000_000

# Annex K quantization tables (ITU-T T.81 Tables K.1/K.2), zigzag-unordered
# (natural row-major order here; zigzag applied at coefficient serialization).
_QT_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
_QT_CHROM = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)

# zigzag scan order (T.81 Figure 5): _ZIGZAG[k] = (row, col) of the k-th coeff.
# Odd anti-diagonals run top-right -> bottom-left (increasing row), even ones
# bottom-left -> top-right (increasing col).
def _zigzag_order():
    return sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
    )


_ZIGZAG = _zigzag_order()
_ZZ_ROWS = np.array([rc[0] for rc in _ZIGZAG])
_ZZ_COLS = np.array([rc[1] for rc in _ZIGZAG])

# 8x8 DCT-II orthonormal basis: C[u, x] = a(u) * cos((2x+1) u pi / 16) / 2
_DCT_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT_C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _quality_scaled(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 = Annex K verbatim, 100 = near-lossless."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.floor((table * scale + 50) / 100)
    return np.clip(q, 1, 255)


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """Forward DCT over (n, 8, 8) level-shifted blocks."""
    return np.einsum("ux,nxy,vy->nuv", _DCT_C, blocks, _DCT_C)


def _idct(blocks: np.ndarray) -> np.ndarray:
    """Inverse DCT over (n, 8, 8) coefficient blocks."""
    return np.einsum("xu,nuv,yv->nxy", _DCT_C.T, blocks, _DCT_C.T)


def _rgb_to_ycbcr(px: np.ndarray, half: float = 128.0) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + half
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + half
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray, half: float = 128.0) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - half, ycc[..., 2] - half
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


# --- Huffman tables (encoder side: compact generated canonical tables) ---------------

_DC_SYMBOLS = list(range(12))  # DC size categories 0..11
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_SYMBOLS = sorted(set(_AC_SYMBOLS))  # 162 symbols: EOB, ZRL, (run,size)

#: encoder BITS/HUFFVAL: all DC codes length 4 (12 <= 15 avoids the all-ones
#: code), all AC codes length 8 (162 <= 255 likewise). Valid canonical Huffman.
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG procedure (T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_ENC_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_ENC_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMBOLS)

#: 12-bit (extended sequential, T.81 Table F.6/F.7) tables: DC size categories
#: reach 15 and AC sizes 14, so the 8-bit tables above can't encode them. 15 DC
#: codes at length 4 + 1 at 5 and 225 AC codes at length 8 + 1 at 9 keep the
#: all-ones code of every length reserved (T.81 C.2), same as the 8-bit tables.
_DC_SYMBOLS_12 = list(range(16))
_DC_BITS_12 = [0, 0, 0, 15, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_SYMBOLS_12 = sorted(
    {0x00, 0xF0} | {(run << 4) | size for run in range(16) for size in range(1, 15)}
)
_AC_BITS_12 = [0, 0, 0, 0, 0, 0, 0, 225, 1, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_CODES_12 = _canonical_codes(_DC_BITS_12, _DC_SYMBOLS_12)
_ENC_AC_CODES_12 = _canonical_codes(_AC_BITS_12, _AC_SYMBOLS_12)


class _BitWriter:
    """Entropy-coded segment writer. write() only records (code, length) pairs;
    flush() pads to a byte boundary with 1-bits (T.81 F.1.2.1.3) and packs the
    pending pairs into ``out`` in ONE vectorized numpy pass (bit expansion +
    packbits + 0x00 byte stuffing after 0xFF, T.81 F.1.2.3). The per-bit Python
    accumulator this replaces was ~85% of encode wall time. Callers that need
    byte alignment mid-stream (restart markers, per-scan progressive segments)
    already call flush() exactly there, so the deferred pack observes the same
    byte stream."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._codes: list[int] = []
        self._lens: list[int] = []
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._codes.append(code & ((1 << length) - 1))
        self._lens.append(length)
        self._nbits += length

    def flush(self) -> None:
        if self._nbits % 8:
            pad = 8 - self._nbits % 8
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        if not self._codes:
            return
        lens = np.asarray(self._lens, dtype=np.int64)
        codes = np.asarray(self._codes, dtype=np.int64)
        total = int(lens.sum())
        starts = np.cumsum(lens) - lens
        rep_codes = np.repeat(codes, lens)
        rep_lens = np.repeat(lens, lens)
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        bits = ((rep_codes >> (rep_lens - 1 - pos)) & 1).astype(np.uint8)
        packed = np.packbits(bits)
        ff = packed == 0xFF
        if ff.any():
            reps = np.where(ff, 2, 1)
            stuffed = np.zeros(int(reps.sum()), dtype=np.uint8)
            stuffed[np.cumsum(reps) - reps] = packed  # zeros become the stuffing
            packed = stuffed
        self.out += packed.tobytes()
        self._codes.clear()
        self._lens.clear()
        self._nbits = 0


def _size_category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _quantized_blocks(
    plane: np.ndarray, qtable: np.ndarray, half: float = 128.0
) -> np.ndarray:
    """Level-shift, 8x8-tile, FDCT and quantize one component plane.
    Returns (n_blocks_v, n_blocks_h, 8, 8) int32 quantized coefficients."""
    h, w = plane.shape
    bv, bh = h // 8, w // 8
    blocks = plane.reshape(bv, 8, bh, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coefs = _fdct(blocks - half)
    q = np.round(coefs / qtable).astype(np.int32)
    return q.reshape(bv, bh, 8, 8)


def _pad_to_blocks(plane: np.ndarray, mult: int = 8) -> np.ndarray:
    h, w = plane.shape
    ph = (mult - h % mult) % mult
    pw = (mult - w % mult) % mult
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge") if (ph or pw) else plane


def _encode_block(
    zz: np.ndarray, dc_pred: int, wr: _BitWriter,
    dc_codes: dict, ac_codes: dict,
) -> int:
    """Entropy-encode one zigzagged quantized block; returns the new DC predictor."""
    dc = int(zz[0])
    diff = dc - dc_pred
    size = _size_category(diff)
    code, length = dc_codes[size]
    wr.write(code, length)
    if size:
        wr.write(_amplitude_bits(diff, size), size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            wr.write(code, length)
            run -= 16
        size = _size_category(v)
        code, length = ac_codes[(run << 4) | size]
        wr.write(code, length)
        wr.write(_amplitude_bits(v, size), size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        wr.write(code, length)
    return dc


def make_jpeg_bytes(
    pixels,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Encode an (h, w, 3) RGB array as baseline (8-bit, SOF0) or extended
    sequential (12-bit, SOF1) JFIF.

    ``subsampling``: "4:4:4" (one block per component per MCU) or "4:2:0"
    (2x2 luma blocks + box-averaged half-resolution chroma per MCU).
    ``restart_interval``: emit DRI + RSTn markers every N MCUs (0 = none) —
    exists mainly so the decoder's restart path has a real producer to test
    against.
    ``precision``: 8 (uint8 input, 8-bit DQT, SOF0) or 12 (uint16 input in
    [0, 4095], Annex-K tables x16 emitted as 16-bit Pq=1 DQT, SOF1, extended
    Huffman tables covering DC sizes to 15 / AC sizes to 14 per T.81 F.6/F.7) —
    the producer for the decoder's extended-sequential path."""
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    sub = subsampling == "4:2:0"
    half = float(1 << (precision - 1))
    px = np.asarray(pixels, dtype=np.uint8 if precision == 8 else np.uint16)
    if precision == 12 and int(px.max(initial=0)) > 4095:
        raise ValueError("12-bit samples must be in [0, 4095]")
    h, w, _ = px.shape
    ycc = _rgb_to_ycbcr(px.astype(np.float64), half=half)
    qt = [_quality_scaled(_QT_LUM, quality), _quality_scaled(_QT_CHROM, quality)]
    if precision == 12:
        # scale the 8-bit-reference tables into the 12-bit coefficient range
        # (libjpeg's jcparam.c does the same x16); needs the 16-bit DQT form
        qt = [t * 16.0 for t in qt]
    # one selection point: the DHT segments written below must describe the
    # exact tables the entropy coder uses
    if precision == 8:
        dc_bits, dc_syms, ac_bits, ac_syms = _DC_BITS, _DC_SYMBOLS, _AC_BITS, _AC_SYMBOLS
        dc_codes, ac_codes = _ENC_DC_CODES, _ENC_AC_CODES
    else:
        dc_bits, dc_syms = _DC_BITS_12, _DC_SYMBOLS_12
        ac_bits, ac_syms = _AC_BITS_12, _AC_SYMBOLS_12
        dc_codes, ac_codes = _ENC_DC_CODES_12, _ENC_AC_CODES_12

    if sub:
        y = _pad_to_blocks(ycc[..., 0], 16)
        # box-average 2x2 -> half-resolution chroma
        chroma = []
        for c in (1, 2):
            p = _pad_to_blocks(ycc[..., c], 16)
            ph, pw = p.shape
            chroma.append(p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)))
        planes = [y, chroma[0], chroma[1]]
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        planes = [_pad_to_blocks(ycc[..., c]) for c in range(3)]
        samp = [(1, 1)] * 3
    quant = [
        _quantized_blocks(planes[c], qt[0 if c == 0 else 1], half=half)
        for c in range(3)
    ]

    wr = _BitWriter()
    dc_pred = [0, 0, 0]
    mcuy = quant[0].shape[0] // samp[0][1]
    mcux = quant[0].shape[1] // samp[0][0]
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wr.flush()  # pad to byte boundary with 1-bits
                wr.out += bytes([0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)])
                dc_pred = [0, 0, 0]
            for c in range(3):
                ch, cv = samp[c]
                for by in range(cv):
                    for bx in range(ch):
                        blk = quant[c][my * cv + by, mx * ch + bx]
                        zz = blk[_ZZ_ROWS, _ZZ_COLS]
                        dc_pred[c] = _encode_block(
                            zz, dc_pred[c], wr, dc_codes, ac_codes
                        )
            mcu_count += 1
    wr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, table: np.ndarray) -> bytes:
        zz = table[_ZZ_ROWS, _ZZ_COLS]
        if precision == 12:  # Pq=1: 16-bit big-endian table entries (T.81 B.2.4.1)
            return seg(0xFFDB, bytes([0x10 | tid]) + zz.astype(">u2").tobytes())
        return seg(0xFFDB, bytes([tid]) + zz.astype(np.uint8).tobytes())

    def dht(tclass: int, tid: int, bits: list[int], values: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(values))

    y_sampling = 0x22 if sub else 0x11
    sof = seg(
        0xFFC0 if precision == 8 else 0xFFC1,  # SOF0 baseline / SOF1 extended
        struct.pack(">BHHB", precision, h, w, 3)
        + bytes([1, y_sampling, 0])  # Y
        + bytes([2, 0x11, 1])  # Cb
        + bytes([3, 0x11, 1]),  # Cr
    )
    sos = seg(
        0xFFDA,
        bytes([3]) + bytes([1, 0x00]) + bytes([2, 0x11]) + bytes([3, 0x11])
        + bytes([0, 63, 0]),  # spectral selection (full, baseline)
    )
    app0 = seg(0xFF00 | 0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (
        b"\xff\xd8"  # SOI
        + app0
        + dqt(0, qt[0])
        + dqt(1, qt[1])
        + sof
        + dht(0, 0, dc_bits, dc_syms)
        + dht(1, 0, ac_bits, ac_syms)
        + dht(0, 1, dc_bits, dc_syms)
        + dht(1, 1, ac_bits, ac_syms)
        + dri
        + sos
        + bytes(wr.out)
        + b"\xff\xd9"  # EOI
    )


# --- progressive encoder -------------------------------------------------------------

#: progressive AC tables additionally need the EOBn symbols (r << 4 for r 1..14);
#: 176 symbols still fit at code length 8 (<= 255, canonical-valid).
_AC_SYMBOLS_PROG = sorted(
    set(
        [r << 4 for r in range(15)]  # EOB0..EOB14 (EOB0 == 0x00)
        + [0xF0]
        + [(run << 4) | size for run in range(16) for size in range(1, 11)]
    )
)
_AC_BITS_PROG = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS_PROG), 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_CODES_PROG = _canonical_codes(_AC_BITS_PROG, _AC_SYMBOLS_PROG)

#: 12-bit progressive AC tables: sizes reach 14 (as in the sequential _12
#: tables) and the EOBn symbols ride along; 239 codes at length 8 + 1 at 9
#: keeps the all-ones code of every length reserved (T.81 C.2).
_AC_SYMBOLS_PROG_12 = sorted(
    set(
        [r << 4 for r in range(15)]
        + [0xF0]
        + [(run << 4) | size for run in range(16) for size in range(1, 15)]
    )
)
_AC_BITS_PROG_12 = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS_PROG_12) - 1, 1, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_CODES_PROG_12 = _canonical_codes(_AC_BITS_PROG_12, _AC_SYMBOLS_PROG_12)

#: libjpeg-style default progressive scan script: (kind, comp, Ss, Se, Ah, Al).
#: Exercises spectral selection (luma bands 1-5 / 6-63), successive
#: approximation (two AC refinement levels on luma, one on chroma) and DC
#: first + refinement — the scan shapes real-world progressive files use.
_PROG_SCANS = [
    ("dc_first", None, 0, 0, 0, 1),
    ("ac_first", 0, 1, 5, 0, 2),
    ("ac_first", 1, 1, 63, 0, 1),
    ("ac_first", 2, 1, 63, 0, 1),
    ("ac_first", 0, 6, 63, 0, 2),
    ("ac_refine", 0, 1, 63, 2, 1),
    ("dc_refine", None, 0, 0, 1, 0),
    ("ac_refine", 0, 1, 63, 1, 0),
    ("ac_refine", 1, 1, 63, 1, 0),
    ("ac_refine", 2, 1, 63, 1, 0),
]


def _emit_eobrun(wr: _BitWriter, st: dict) -> None:
    """Flush a pending EOB run (EOBn symbol + length bits) and any buffered
    correction bits that were deferred with it (T.81 G.1.2.2 / jcphuff.c)."""
    if st["eobrun"] > 0:
        nbits = st["eobrun"].bit_length() - 1
        code, length = st["ac"][nbits << 4]
        wr.write(code, length)
        if nbits:
            wr.write(st["eobrun"] & ((1 << nbits) - 1), nbits)
        st["eobrun"] = 0
    for b in st["pending"]:
        wr.write(b, 1)
    st["pending"] = []


def _encode_ac_first(zz, s_start, s_end, al, wr, st) -> None:
    """AC first scan for one block (jcphuff.c encode_mcu_AC_first)."""
    r = 0
    for k in range(s_start, s_end + 1):
        temp = int(zz[k])
        if temp < 0:
            temp = (-temp) >> al
            temp2 = ~temp
        else:
            temp >>= al
            temp2 = temp
        if temp == 0:
            r += 1
            continue
        _emit_eobrun(wr, st)
        while r > 15:
            code, length = st["ac"][0xF0]
            wr.write(code, length)
            r -= 16
        nbits = temp.bit_length()
        code, length = st["ac"][(r << 4) | nbits]
        wr.write(code, length)
        wr.write(temp2 & ((1 << nbits) - 1), nbits)
        r = 0
    if r > 0:
        st["eobrun"] += 1
        if st["eobrun"] == 0x7FFF:
            _emit_eobrun(wr, st)


def _encode_ac_refine(zz, s_start, s_end, al, wr, st) -> None:
    """AC refinement scan for one block (jcphuff.c encode_mcu_AC_refine):
    newly-significant coefficients as (run, 1) symbols + sign bit; correction
    bits for already-nonzero history, buffered to follow the next symbol."""
    absvals = [0] * (s_end + 1)
    eob = 0
    for k in range(s_start, s_end + 1):
        temp = int(zz[k])
        if temp < 0:
            temp = -temp
        temp >>= al
        absvals[k] = temp
        if temp == 1:
            eob = k
    r = 0
    br: list[int] = []
    for k in range(s_start, s_end + 1):
        temp = absvals[k]
        if temp == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _emit_eobrun(wr, st)
            code, length = st["ac"][0xF0]
            wr.write(code, length)
            r -= 16
            for b in br:
                wr.write(b, 1)
            br = []
        if temp > 1:  # already nonzero in history: buffer its correction bit
            br.append(temp & 1)
            continue
        _emit_eobrun(wr, st)
        code, length = st["ac"][(r << 4) | 1]
        wr.write(code, length)
        wr.write(1 if int(zz[k]) > 0 else 0, 1)
        for b in br:
            wr.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st["eobrun"] += 1
        st["pending"].extend(br)
        if st["eobrun"] == 0x7FFF or len(st["pending"]) > 900:
            _emit_eobrun(wr, st)


def make_progressive_jpeg_bytes(
    pixels, quality: int = 90, subsampling: str = "4:4:4", precision: int = 8
) -> bytes:
    """Encode an (h, w, 3) RGB array as PROGRESSIVE (SOF2) JFIF.

    Same color/quantization pipeline as make_jpeg_bytes — the quantized
    coefficients are IDENTICAL — delivered through the libjpeg-style scan
    script above. Exists to give the progressive decoder a real producer:
    the golden strategy is unchanged (quantization is the only lossy step, so
    a progressive decode must reproduce the same coefficients bit for bit).
    ``precision``: 8 (uint8) or 12 (uint16 in [0, 4095], Annex-K tables x16 as
    16-bit Pq=1 DQT, extended DC/AC tables with sizes to 15/14 — r9, closing
    the 12-bit-progressive gap the sequential path closed in r7)."""
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    sub = subsampling == "4:2:0"
    half = float(1 << (precision - 1))
    px = np.asarray(pixels, dtype=np.uint8 if precision == 8 else np.uint16)
    if precision == 12 and int(px.max(initial=0)) > 4095:
        raise ValueError("12-bit samples must be in [0, 4095]")
    h, w, _ = px.shape
    ycc = _rgb_to_ycbcr(px.astype(np.float64), half=half)
    qt = [_quality_scaled(_QT_LUM, quality), _quality_scaled(_QT_CHROM, quality)]
    if precision == 12:
        qt = [t * 16.0 for t in qt]
    if precision == 8:
        dc_bits, dc_syms, dc_codes = _DC_BITS, _DC_SYMBOLS, _ENC_DC_CODES
        ac_bits, ac_syms, ac_codes = _AC_BITS_PROG, _AC_SYMBOLS_PROG, _ENC_AC_CODES_PROG
    else:
        dc_bits, dc_syms, dc_codes = _DC_BITS_12, _DC_SYMBOLS_12, _ENC_DC_CODES_12
        ac_bits, ac_syms, ac_codes = (
            _AC_BITS_PROG_12, _AC_SYMBOLS_PROG_12, _ENC_AC_CODES_PROG_12,
        )
    if sub:
        y = _pad_to_blocks(ycc[..., 0], 16)
        chroma = []
        for c in (1, 2):
            p = _pad_to_blocks(ycc[..., c], 16)
            ph, pw = p.shape
            chroma.append(p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)))
        planes = [y, chroma[0], chroma[1]]
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        planes = [_pad_to_blocks(ycc[..., c]) for c in range(3)]
        samp = [(1, 1)] * 3
    quant = [
        _quantized_blocks(planes[c], qt[0 if c == 0 else 1], half=half)
        for c in range(3)
    ]
    zzq = [q[:, :, _ZZ_ROWS, _ZZ_COLS] for q in quant]  # (bv, bh, 64) zigzag
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcuy = quant[0].shape[0] // samp[0][1]
    mcux = quant[0].shape[1] // samp[0][0]

    def nb_dims(ci):
        ch, cv = samp[ci]
        xi = (w * ch + hmax - 1) // hmax
        yi = (h * cv + vmax - 1) // vmax
        return (xi + 7) // 8, (yi + 7) // 8

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, table in enumerate(qt):
        zz = table[_ZZ_ROWS, _ZZ_COLS]
        if precision == 12:  # Pq=1: 16-bit big-endian entries
            out += seg(0xFFDB, bytes([0x10 | tid]) + zz.astype(">u2").tobytes())
        else:
            out += seg(0xFFDB, bytes([tid]) + zz.astype(np.uint8).tobytes())
    y_sampling = 0x22 if sub else 0x11
    out += seg(
        0xFFC2,  # SOF2: progressive DCT
        struct.pack(">BHHB", precision, h, w, 3)
        + bytes([1, y_sampling, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    for tid in (0, 1):
        out += seg(0xFFC4, bytes([tid]) + bytes(dc_bits) + bytes(dc_syms))
        out += seg(0xFFC4, bytes([0x10 | tid]) + bytes(ac_bits) + bytes(ac_syms))

    for kind, comp, s_start, s_end, ah, al in _PROG_SCANS:
        wr = _BitWriter()
        if kind in ("dc_first", "dc_refine"):
            sos_body = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, s_start, s_end, (ah << 4) | al])
            preds = [0, 0, 0]
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in range(3):
                        ch, cv = samp[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                dc = int(zzq[ci][my * cv + by, mx * ch + bx, 0])
                                if kind == "dc_first":
                                    v = dc >> al
                                    diff = v - preds[ci]
                                    preds[ci] = v
                                    size = _size_category(diff)
                                    code, length = dc_codes[size]
                                    wr.write(code, length)
                                    if size:
                                        wr.write(_amplitude_bits(diff, size), size)
                                else:
                                    wr.write((dc >> al) & 1, 1)
        else:
            tid = 0 if comp == 0 else 1
            sos_body = bytes(
                [1, comp + 1, tid << 4 | tid, s_start, s_end, (ah << 4) | al]
            )
            st = {"eobrun": 0, "pending": [], "ac": ac_codes}
            nbw, nbh = nb_dims(comp)
            enc = _encode_ac_first if kind == "ac_first" else _encode_ac_refine
            for row in range(nbh):
                for col in range(nbw):
                    enc(zzq[comp][row, col], s_start, s_end, al, wr, st)
            _emit_eobrun(wr, st)
        wr.flush()
        out += seg(0xFFDA, sos_body)
        out += bytes(wr.out)
    out += b"\xff\xd9"
    return bytes(out)


# --- lossless (SOF3) encoder -----------------------------------------------------------
#
# T.81 Annex H: no DCT, no quantization, no color transform — each component is
# predictively coded (7 spec predictors over the reconstructed left/above/
# above-left neighbors) and the DIFFERENCES are Huffman-coded exactly like DC
# coefficients (SSSS category + SSSS amplitude bits). The process real-world
# DNG/medical pipelines still use; roundtrip is BIT-EXACT, which is what makes
# it certifiable without golden vectors.


def _lossless_predictions(x: np.ndarray, predictor: int, precision: int) -> np.ndarray:
    """Per-sample predictions P (T.81 H.1): first sample 2^(P-1), rest of the
    first line Ra, first column Rb, interior per the selected predictor.
    ``>> 1`` is the arithmetic shift both numpy and the decoder's plain-int
    Python use, so encode/decode agree on negative (Rb - Rc) exactly."""
    xi = x.astype(np.int32)
    p = np.empty_like(xi)
    p[0, 0] = 1 << (precision - 1)
    p[0, 1:] = xi[0, :-1]  # first line: Ra
    p[1:, 0] = xi[:-1, 0]  # first column: Rb
    ra, rb, rc = xi[1:, :-1], xi[:-1, 1:], xi[:-1, :-1]
    if predictor == 1:
        interior = ra
    elif predictor == 2:
        interior = rb
    elif predictor == 3:
        interior = rc
    elif predictor == 4:
        interior = ra + rb - rc
    elif predictor == 5:
        interior = ra + ((rb - rc) >> 1)
    elif predictor == 6:
        interior = rb + ((ra - rc) >> 1)
    elif predictor == 7:
        interior = (ra + rb) >> 1
    else:
        raise ValueError(f"lossless predictor must be 1..7, got {predictor}")
    p[1:, 1:] = interior
    return p


def make_lossless_jpeg_bytes(
    pixels, predictor: int = 4, precision: int = 8
) -> bytes:
    """Encode an (h, w, 3) RGB array as LOSSLESS JPEG (SOF3). Components are
    R, G, B directly — lossless JPEG has no subsampling and conventionally no
    color transform, which is exactly what makes ``parse_jpeg`` of the result
    bit-identical to the input. ``precision``: 8 (uint8) or 12 (uint16 in
    [0, 4095]; decoded view is the top 8 bits, matching the extended-sequential
    contract)."""
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    px = np.asarray(pixels, dtype=np.uint8 if precision == 8 else np.uint16)
    if precision == 12 and int(px.max(initial=0)) > 4095:
        raise ValueError("12-bit samples must be in [0, 4095]")
    h, w, _ = px.shape
    if precision == 8:
        dc_bits, dc_syms, dc_codes = _DC_BITS, _DC_SYMBOLS, _ENC_DC_CODES
    else:  # diffs reach category 12 — needs the extended table
        dc_bits, dc_syms, dc_codes = _DC_BITS_12, _DC_SYMBOLS_12, _ENC_DC_CODES_12

    diffs = [
        px[..., c].astype(np.int32)
        - _lossless_predictions(px[..., c], predictor, precision)
        for c in range(3)
    ]
    wr = _BitWriter()
    for y in range(h):
        for x in range(w):
            for c in range(3):  # interleaved MCU: one sample per component
                d = int(diffs[c][y, x])
                size = _size_category(d)
                code, length = dc_codes[size]
                wr.write(code, length)
                if size:
                    wr.write(_amplitude_bits(d, size), size)
    wr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    sof = seg(
        0xFFC3,
        struct.pack(">BHHB", precision, h, w, 3)
        + bytes([1, 0x11, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0]),
    )
    dht = seg(0xFFC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_syms))
    sos = seg(
        0xFFDA,
        bytes([3]) + bytes([1, 0x00]) + bytes([2, 0x00]) + bytes([3, 0x00])
        + bytes([predictor, 0, 0]),  # Ss = predictor, Se = 0, Ah/Al = 0
    )
    return b"\xff\xd8" + sof + dht + sos + bytes(wr.out) + b"\xff\xd9"


# --- decoder -------------------------------------------------------------------------


#: Arithmetic conditioning defaults (T.81 F.1.4.4.1.4 / F.1.4.4.2.1): DC
#: lower/upper thresholds L=0, U=1; AC context split index Kx=5.
_ARITH_DC_L = 0
_ARITH_DC_U = 1
_ARITH_AC_KX = 5


def make_arith_jpeg_bytes(
    pixels,
    quality: int = 90,
    subsampling: str = "4:4:4",
    precision: int = 8,
) -> bytes:
    """Encode an (h, w, 3) RGB array as extended sequential JPEG with
    ARITHMETIC entropy coding (SOF9 + DAC, T.81 Annexes D & F) — the process
    the Huffman baseline encoder's twin: identical preprocessing, identical
    quantized coefficients, only the lossless entropy stage differs, so
    ``parse_jpeg(make_arith_jpeg_bytes(px)) ==
    parse_jpeg(make_jpeg_bytes(px))`` exactly (and libjpeg-turbo agrees —
    the cross-implementation tests decode these streams with the system
    codec). Conditioning uses the spec defaults, emitted explicitly as a DAC
    segment. No restart-marker support (arithmetic restart resets all
    statistics; our writer never emits DRI)."""
    from .jarith import (
        AC_STATS_SIZE,
        DC_STATS_SIZE,
        ArithEncoder,
        dc_context_for_diff,
        encode_ac_coeffs,
        encode_dc_diff,
        new_stats,
    )

    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    sub = subsampling == "4:2:0"
    half = float(1 << (precision - 1))
    px = np.asarray(pixels, dtype=np.uint8 if precision == 8 else np.uint16)
    if precision == 12 and int(px.max(initial=0)) > 4095:
        raise ValueError("12-bit samples must be in [0, 4095]")
    h, w, _ = px.shape
    ycc = _rgb_to_ycbcr(px.astype(np.float64), half=half)
    qt = [_quality_scaled(_QT_LUM, quality), _quality_scaled(_QT_CHROM, quality)]
    if precision == 12:
        qt = [t * 16.0 for t in qt]
    if sub:
        y = _pad_to_blocks(ycc[..., 0], 16)
        chroma = []
        for c in (1, 2):
            p = _pad_to_blocks(ycc[..., c], 16)
            ph, pw = p.shape
            chroma.append(p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)))
        planes = [y, chroma[0], chroma[1]]
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        planes = [_pad_to_blocks(ycc[..., c]) for c in range(3)]
        samp = [(1, 1)] * 3
    quant = [
        _quantized_blocks(planes[c], qt[0 if c == 0 else 1], half=half)
        for c in range(3)
    ]

    enc = ArithEncoder()
    # statistics per conditioning-table id: Y uses tables 0, chroma tables 1
    # (sharing statistics across Cb/Cr exactly as the Huffman twin shares DHTs)
    dc_stats = [new_stats(DC_STATS_SIZE), new_stats(DC_STATS_SIZE)]
    ac_stats = [new_stats(AC_STATS_SIZE), new_stats(AC_STATS_SIZE)]
    dc_ctx = [0, 0, 0]
    preds = [0, 0, 0]
    mcuy = quant[0].shape[0] // samp[0][1]
    mcux = quant[0].shape[1] // samp[0][0]
    for my in range(mcuy):
        for mx in range(mcux):
            for c in range(3):
                tid = 0 if c == 0 else 1
                ch, cv = samp[c]
                for by in range(cv):
                    for bx in range(ch):
                        zz = quant[c][my * cv + by, mx * ch + bx][_ZZ_ROWS, _ZZ_COLS]
                        dc = int(zz[0])
                        diff = dc - preds[c]
                        preds[c] = dc
                        encode_dc_diff(enc, dc_stats[tid], dc_ctx[c], diff)
                        dc_ctx[c] = dc_context_for_diff(diff, _ARITH_DC_L, _ARITH_DC_U)
                        encode_ac_coeffs(enc, ac_stats[tid], _ARITH_AC_KX, zz)
    entropy = enc.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, table: np.ndarray) -> bytes:
        zz = table[_ZZ_ROWS, _ZZ_COLS]
        if precision == 12:
            return seg(0xFFDB, bytes([0x10 | tid]) + zz.astype(">u2").tobytes())
        return seg(0xFFDB, bytes([tid]) + zz.astype(np.uint8).tobytes())

    y_sampling = 0x22 if sub else 0x11
    sof = seg(
        0xFFC9,  # SOF9: extended sequential, arithmetic coding
        struct.pack(">BHHB", precision, h, w, 3)
        + bytes([1, y_sampling, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    dc_cs = (_ARITH_DC_U << 4) | _ARITH_DC_L
    dac = seg(
        0xFFCC,
        bytes([0x00, dc_cs, 0x10, _ARITH_AC_KX, 0x01, dc_cs, 0x11, _ARITH_AC_KX]),
    )
    sos = seg(
        0xFFDA,
        bytes([3]) + bytes([1, 0x00]) + bytes([2, 0x11]) + bytes([3, 0x11])
        + bytes([0, 63, 0]),
    )
    app0 = seg(0xFF00 | 0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (
        b"\xff\xd8" + app0 + dqt(0, qt[0]) + dqt(1, qt[1]) + sof + dac + sos
        + entropy + b"\xff\xd9"
    )


class _BitReader:
    """Table-driven entropy reader over a pre-unstuffed byte buffer.

    The whole entropy-coded section is unstuffed ONCE (0xFF00 -> 0xFF) and split
    at RSTn markers during construction; decoding then peeks 16 bits through a
    4-byte window and resolves a full Huffman code with a single 65536-entry
    table lookup — ~10x faster than the bit-at-a-time tree walk it replaced
    (the walk made JPEG the most expensive feature-extraction payload by far).
    """

    def __init__(self, data: bytes, pos: int) -> None:
        clean = bytearray()
        segments = [0]
        i = pos
        n = len(data)
        while i < n:
            b = data[i]
            if b == 0xFF:
                nxt = data[i + 1] if i + 1 < n else 0xD9
                if nxt == 0x00:  # stuffed literal FF
                    clean.append(0xFF)
                    i += 2
                elif 0xD0 <= nxt <= 0xD7:  # restart marker: new segment
                    segments.append(len(clean))
                    i += 2
                else:  # EOI or next marker: entropy data ends here
                    break
            else:
                clean.append(b)
                i += 1
        self.pos = i  # first byte after the entropy-coded section
        clean += b"\x00\x00\x00\x00"  # window padding for tail reads
        self._buf = bytes(clean)
        self._seg_bits = [s * 8 for s in segments]
        self._seg_idx = 0
        self._bit = 0

    def _window(self) -> tuple[int, int]:
        b, sh = divmod(self._bit, 8)
        buf = self._buf
        w = (buf[b] << 24) | (buf[b + 1] << 16) | (buf[b + 2] << 8) | buf[b + 3]
        return w, sh

    def peek16(self) -> int:
        w, sh = self._window()
        return (w >> (16 - sh)) & 0xFFFF

    def skip(self, n: int) -> None:
        self._bit += n

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        w, sh = self._window()
        v = (w >> (32 - sh - n)) & ((1 << n) - 1)
        self._bit += n
        return v

    def align_restart(self) -> None:
        """Jump to the next restart segment (markers were split during init)."""
        self._seg_idx += 1
        if self._seg_idx >= len(self._seg_bits):
            raise ValueError("expected RST marker")
        self._bit = self._seg_bits[self._seg_idx]


_LUT_CACHE: dict[tuple, tuple] = {}


def _huffman_lut(bits: list[int], values: list[int]):
    """(symbol, length) flat lookup LISTS indexed by the next 16 bits.

    Plain Python lists, not numpy arrays: the decode loop reads these one scalar
    at a time, and list indexing returns a ready int (~5x faster than a numpy
    scalar read + int() conversion in the per-coefficient hot path).

    Cached by table CONTENT: a corpus encoded with one table set (ours always
    is; real-world encoders overwhelmingly ship the Annex-K defaults) builds
    each 65536-entry LUT once per worker instead of once per image — the naive
    per-image build churned ~400 KB of array writes per decode."""
    key = (tuple(bits), tuple(values))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = [0] * 65536
    length = [0] * 65536
    for symbol, (code, ln) in _canonical_codes(bits, values).items():
        lo = code << (16 - ln)
        hi = lo + (1 << (16 - ln))
        sym[lo:hi] = [symbol] * (hi - lo)
        length[lo:hi] = [ln] * (hi - lo)
    if len(_LUT_CACHE) > 64:  # malformed-stream safety valve, never hit in practice
        _LUT_CACHE.clear()
    _LUT_CACHE[key] = (sym, length)
    return sym, length


def _decode_huffman(rd: _BitReader, lut) -> int:
    sym, length = lut
    p = rd.peek16()
    ln = length[p]
    if ln == 0:
        raise ValueError("invalid Huffman code")
    rd.skip(ln)
    return sym[p]


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map amplitude bits back to a signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def parse_jpeg(payload: bytes, _return_coefs: bool = False):
    """Decode baseline JFIF/JPEG -> (h, w, 3) uint8 RGB ndarray.

    Supports: SOF0 baseline sequential DCT, SOF1 extended sequential (8- and
    12-bit precision; 12-bit output is the top 8 bits of each sample) AND SOF2
    progressive (spectral selection + successive approximation, DC/AC first
    and refinement scans), 1 or 3 components, generic sampling factors
    (4:4:4 / 4:2:0 / 4:2:2 MCU interleave), 8- and 16-bit DQT tables,
    DRI/RSTn restart intervals, multiple DQT/DHT segments, SOF2 progressive
    at BOTH 8- and 12-bit, SOF3 lossless (predictive, all 7 predictors,
    8/12-bit — bit-exact), AND SOF9 extended sequential with ARITHMETIC
    coding (r10 — QM-coder + Annex-F models via ext/jarith.py, DAC
    conditioning honored, 8/12-bit, cross-validated against libjpeg-turbo)
    AND SOF10 progressive with arithmetic coding (r10 — Annex-G models,
    decode; see _decode_progressive_scan_arith).
    Raises NotImplementedError for the remaining processes (arithmetic
    lossless SOF11, hierarchical);
    any other failure on a
    torn/malformed payload is normalized to ValueError so callers' documented
    decoded=false fallback routes it instead of the raw struct.error/IndexError/
    KeyError crashing an Arrow UDF task (a torn file must never kill the job).

    ``_return_coefs`` (tests only): also return the per-component DEQUANTIZED
    coefficient blocks, for the exact coefficient-level golden against the
    encoder (the only lossy step in JPEG is quantization; everything downstream
    of it must round-trip losslessly).
    """
    try:
        return _parse_jpeg_impl(payload, _return_coefs)
    except (NotImplementedError, ValueError):
        raise
    except (struct.error, IndexError, KeyError, ZeroDivisionError, OverflowError) as ex:
        raise ValueError(f"malformed JPEG payload: {type(ex).__name__}: {ex}") from ex


def _parse_jpeg_impl(payload: bytes, _return_coefs: bool = False):
    d = bytes(payload)
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}  # (tclass, tid) -> LUT arrays
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    progressive = False
    lossless = False
    arith = False
    arith_cond: dict[tuple[int, int], int] = {}
    precision = 8
    grids_ready = False
    mcux = mcuy = hmax = vmax = 0
    scans = 0
    per_comp: list[tuple[list, list, list]] = []  # sequential (bid, k, val) triples
    prog_coef: list[list[list[int]]] | None = None  # progressive accumulators
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = d[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (T.81 B.1.1.2) — skip it
            pos += 1
            continue
        # length-less markers: SOI/EOI, TEM, standalone RSTn between segments
        if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", d, pos + 2)
        body = d[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                prec, tid = body[off] >> 4, body[off] & 0x0F
                if prec not in (0, 1):
                    raise ValueError(f"invalid DQT precision field {prec}")
                if prec:  # Pq=1: 16-bit big-endian entries (T.81 B.2.4.1)
                    if off + 129 > len(body):
                        raise ValueError("truncated 16-bit DQT segment")
                    zz = np.frombuffer(body, dtype=">u2", count=64, offset=off + 1)
                else:
                    if off + 65 > len(body):
                        raise ValueError("truncated DQT segment")
                    zz = np.frombuffer(body, dtype=np.uint8, count=64, offset=off + 1)
                qt = np.zeros((8, 8))
                qt[_ZZ_ROWS, _ZZ_COLS] = zz
                qtables[tid] = qt
                off += 129 if prec else 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            off = 0
            while off < len(body):
                tclass, tid = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nvals = sum(bits)
                values = list(body[off + 17 : off + 17 + nvals])
                huff[(tclass, tid)] = _huffman_lut(bits, values)
                off += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):  # SOF0/1/2/3/9/10
            progressive = marker in (0xC2, 0xCA)
            lossless = marker == 0xC3
            arith = marker in (0xC9, 0xCA)  # arithmetic processes (r10)
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            # SOF0 is 8-bit by definition; SOF1 extended sequential, SOF2
            # progressive (r9), SOF3 lossless and SOF9 arithmetic add 12-bit
            # (T.81 Table B.2; SOF3 allows 2-16 — we cover 8/12).
            if prec not in ((8, 12) if marker != 0xC0 else (8,)):
                raise NotImplementedError(
                    f"{prec}-bit precision for SOF marker 0xFF{marker:02X}"
                )
            precision = prec
            if h * w > JPEG_MAX_PIXELS:
                # decompression-bomb guard (same idea as PIL MAX_IMAGE_PIXELS):
                # a few flipped SOF bytes must not make one corpus row allocate
                # gigabytes / loop over 67M MCUs inside an Arrow UDF task
                raise ValueError(f"image too large: {w}x{h} > {JPEG_MAX_PIXELS} px")
            for i in range(ncomp):
                cid, sampling, qid = body[6 + 3 * i : 9 + 3 * i]
                sh, sv = sampling >> 4, sampling & 0x0F
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise ValueError(f"invalid SOF sampling factors {sh}x{sv}")
                comps.append({"id": cid, "h": sh, "v": sv, "q": qid})
        elif marker in (0xC5, 0xC6, 0xC7, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG process (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning (T.81 B.2.4.3)
            off = 0
            while off + 1 < len(body):
                tc, tb = body[off] >> 4, body[off] & 0x0F
                arith_cond[(tc, tb)] = body[off + 1]
                off += 2
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if not comps or h == 0:
                raise ValueError("missing SOF header")
            if not grids_ready:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                for c in comps:
                    c["bw"] = mcux * c["h"]
                    c["bh"] = mcuy * c["v"]
                grids_ready = True
            ns = body[0]
            scan_specs: list[tuple[int, int, int]] = []  # (comp idx, dc tid, ac tid)
            for i in range(ns):
                cid, tables = body[1 + 2 * i], body[2 + 2 * i]
                for ci, comp in enumerate(comps):
                    if comp["id"] == cid:
                        scan_specs.append((ci, tables >> 4, tables & 0x0F))
            if len(scan_specs) != ns:
                raise ValueError("SOS references unknown component")
            s_start, s_end = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            pos = pos + 2 + seglen
            scans += 1
            if progressive:
                if prog_coef is None:
                    prog_coef = [
                        [[0] * 64 for _ in range(c["bh"] * c["bw"])] for c in comps
                    ]
                if arith:
                    pos = _decode_progressive_scan_arith(
                        d, pos, scan_specs, comps, prog_coef, arith_cond,
                        s_start, s_end, ah, al,
                        mcux, mcuy, hmax, vmax, w, h, restart_interval,
                    )
                    continue
                rd = _BitReader(d, pos)
                _decode_progressive_scan(
                    rd, scan_specs, comps, huff, prog_coef,
                    s_start, s_end, ah, al,
                    mcux, mcuy, hmax, vmax, w, h, restart_interval,
                )
                pos = rd.pos
                continue
            break  # baseline/lossless: single interleaved scan, decoded below
        pos += 2 + seglen
    if scans == 0:
        raise ValueError("no SOS segment found")

    if lossless:
        # --- SOF3 predictive decode (T.81 Annex H) -------------------------------
        # Ss carries the predictor id; differences are DC-style Huffman codes.
        # Reconstruction is modulo 2^16; neighbors are RECONSTRUCTED samples,
        # which for a conforming stream equal the originals — the roundtrip
        # test pins bit-exactness against make_lossless_jpeg_bytes.
        if restart_interval:
            raise NotImplementedError("DRI/restart markers in a lossless scan")
        if ah != 0 or al != 0:
            raise NotImplementedError("point transform in a lossless scan")
        predictor = s_start
        if not 1 <= predictor <= 7:
            raise ValueError(f"invalid lossless predictor {predictor}")
        if any(c["h"] != 1 or c["v"] != 1 for c in comps):
            raise NotImplementedError("subsampled lossless components")
        rd = _BitReader(d, pos)
        buf = rd._buf
        bit = rd._bit
        luts = []
        for ci, dct, _act in scan_specs:
            if (0, dct) not in huff:
                raise ValueError(f"SOS references missing DC table {dct}")
            luts.append((ci, huff[(0, dct)][0], huff[(0, dct)][1]))
        planes = {ci: np.zeros((h, w), dtype=np.int32) for ci, _, _ in luts}
        half = 1 << (precision - 1)
        for y in range(h):
            for x in range(w):
                for ci, dsym, dlen in luts:  # interleaved: one sample per comp
                    b = bit >> 3
                    win = (
                        (buf[b] << 32)
                        | (buf[b + 1] << 24)
                        | (buf[b + 2] << 16)
                        | (buf[b + 3] << 8)
                        | buf[b + 4]
                    )
                    sh_ = bit & 7
                    pcode = (win >> (24 - sh_)) & 0xFFFF
                    ln = dlen[pcode]
                    if ln == 0:
                        raise ValueError("invalid Huffman code")
                    size = dsym[pcode]
                    if size == 16:  # SSSS=16: diff is 32768, no amplitude bits
                        diff = 32768
                        bit += ln
                    elif size:
                        v = (win >> (40 - sh_ - ln - size)) & ((1 << size) - 1)
                        diff = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                        bit += ln + size
                    else:
                        diff = 0
                        bit += ln
                    pl = planes[ci]
                    if y == 0 and x == 0:
                        pred = half
                    elif y == 0:
                        pred = int(pl[0, x - 1])  # first line: Ra
                    elif x == 0:
                        pred = int(pl[y - 1, 0])  # first column: Rb
                    else:
                        ra = int(pl[y, x - 1])
                        rb = int(pl[y - 1, x])
                        rc = int(pl[y - 1, x - 1])
                        if predictor == 1:
                            pred = ra
                        elif predictor == 2:
                            pred = rb
                        elif predictor == 3:
                            pred = rc
                        elif predictor == 4:
                            pred = ra + rb - rc
                        elif predictor == 5:
                            pred = ra + ((rb - rc) >> 1)
                        elif predictor == 6:
                            pred = rb + ((ra - rc) >> 1)
                        else:
                            pred = (ra + rb) >> 1
                    pl[y, x] = (pred + diff) & 0xFFFF
        rd._bit = bit
        maxv = (1 << precision) - 1
        stack = [np.clip(planes[c_i], 0, maxv) for c_i, _, _ in luts]
        rgb = (
            np.stack([stack[0]] * 3, axis=-1)
            if len(stack) == 1
            else np.stack(stack[:3], axis=-1)
        )
        if precision > 8:
            px = (rgb.astype(np.uint16) >> (precision - 8)).astype(np.uint8)
        else:
            px = rgb.astype(np.uint8)
        if _return_coefs:  # no DCT coefficients exist; hand back the planes
            return px, [planes[c_i].copy() for c_i, _, _ in luts]
        return px

    if progressive:
        # accumulated zigzag coefficients -> dequantized block tensors
        for ci, c in enumerate(comps):
            flat = np.array(prog_coef[ci], dtype=np.float64)
            blocks = np.zeros((flat.shape[0], 8, 8))
            blocks[:, _ZZ_ROWS, _ZZ_COLS] = flat
            c["coefs"] = (blocks * qtables[c["q"]]).reshape(c["bh"], c["bw"], 8, 8)
        return _assemble_pixels(comps, hmax, vmax, h, w, _return_coefs, precision)

    if arith:
        # --- SOF9 sequential arithmetic decode (T.81 Annexes D & F, r10) ---------
        # Per-block calls into the QM-coder + Annex-F statistical models; the
        # statistics are per conditioning-table id (shared across components
        # that reference the same table, exactly like shared DHTs), the DC
        # context and predictor are per component.
        from .jarith import (
            AC_STATS_SIZE,
            DC_STATS_SIZE,
            ArithDecoder,
            dc_context_for_diff,
            decode_ac_coeffs,
            decode_dc_diff,
            new_stats,
        )

        if restart_interval:
            raise NotImplementedError("DRI/restart markers in an arithmetic scan")
        dec = ArithDecoder(d, pos)
        dc_stats: dict[int, bytearray] = {}
        ac_stats: dict[int, bytearray] = {}
        cond_dc: dict[int, int] = {}
        cond_kx: dict[int, int] = {}
        for ci, dct, act in scan_specs:
            dc_stats.setdefault(dct, new_stats(DC_STATS_SIZE))
            ac_stats.setdefault(act, new_stats(AC_STATS_SIZE))
            cs = arith_cond.get((0, dct), 0x10)  # defaults L=0, U=1
            if (cs & 0x0F) > (cs >> 4):  # T.81 B.2.4.3: 0 <= L <= U <= 15
                raise ValueError(f"invalid DAC DC conditioning 0x{cs:02X} (L > U)")
            cond_dc[dct] = cs
            kx = arith_cond.get((1, act), 5)  # default Kx=5
            if not 1 <= kx <= 63:
                raise ValueError(f"invalid DAC Kx {kx}")
            cond_kx[act] = kx
        per_comp = [([], [], []) for _ in comps]
        preds = [0] * len(comps)
        dc_ctx = [0] * len(comps)
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, dct, act in scan_specs:
                    c = comps[ci]
                    ch, cv, cbw = c["h"], c["v"], c["bw"]
                    bids, ks, vals = per_comp[ci]
                    lo, up = cond_dc[dct] & 0x0F, cond_dc[dct] >> 4
                    for by in range(cv):
                        for bx in range(ch):
                            diff = decode_dc_diff(dec, dc_stats[dct], dc_ctx[ci])
                            dc_ctx[ci] = dc_context_for_diff(diff, lo, up)
                            pred = preds[ci] + diff
                            preds[ci] = pred
                            bid = (my * cv + by) * cbw + (mx * ch + bx)
                            bids.append(bid)
                            ks.append(0)
                            vals.append(pred)
                            for k, v in decode_ac_coeffs(
                                dec, ac_stats[act], cond_kx[act]
                            ):
                                bids.append(bid)
                                ks.append(k)
                                vals.append(v)
        for ci, c in enumerate(comps):
            bids, ks, vals = per_comp[ci]
            nb = c["bh"] * c["bw"]
            flat = np.zeros((nb, 64))
            if bids:
                flat[bids, ks] = vals
            blocks = np.zeros((nb, 8, 8))
            blocks[:, _ZZ_ROWS, _ZZ_COLS] = flat
            c["coefs"] = (blocks * qtables[c["q"]]).reshape(c["bh"], c["bw"], 8, 8)
        return _assemble_pixels(comps, hmax, vmax, h, w, _return_coefs, precision)

    # --- baseline entropy decode: the per-coefficient hot loop ------------------
    # Everything is inlined into plain-int arithmetic on local variables (no
    # per-symbol method calls, no per-coefficient numpy): ONE 40-bit window read
    # serves both the Huffman code (<= 16 bits via the 65536-entry LUT) and its
    # amplitude bits (<= 15), since 7 + 16 + 15 <= 40 - 2. Decoded coefficients
    # are accumulated as flat (block, zigzag-index, value) triples and assembled
    # into the dequantized block tensors in ONE vectorized numpy pass per
    # component afterward. ~4x over the previous per-symbol call structure — the
    # multi-symbol-LUT idea realized as "one window read per symbol+amplitude".
    rd = _BitReader(d, pos)
    buf = rd._buf
    bit = rd._bit
    luts: dict[int, tuple] = {}
    for ci, dct, act in scan_specs:
        luts[ci] = huff[(0, dct)] + huff[(1, act)]  # (dsym, dlen, asym, alen)
    per_comp = [([], [], []) for _ in comps]  # block ids, zigzag ks, values
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                rd._bit = bit
                rd.align_restart()
                bit = rd._bit
                preds = [0] * len(comps)
            for ci, _dct, _act in scan_specs:
                c = comps[ci]
                dsym, dlen, asym, alen = luts[ci]
                ch, cv, cbw = c["h"], c["v"], c["bw"]
                bids, ks, vals = per_comp[ci]
                for by in range(cv):
                    for bx in range(ch):
                        b = bit >> 3
                        win = (
                            (buf[b] << 32)
                            | (buf[b + 1] << 24)
                            | (buf[b + 2] << 16)
                            | (buf[b + 3] << 8)
                            | buf[b + 4]
                        )
                        sh = bit & 7
                        p = (win >> (24 - sh)) & 0xFFFF
                        ln = dlen[p]
                        if ln == 0:
                            raise ValueError("invalid Huffman code")
                        size = dsym[p]
                        bit += ln + size
                        if size:
                            v = (win >> (40 - sh - ln - size)) & ((1 << size) - 1)
                            diff = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                        else:
                            diff = 0
                        pred = preds[ci] + diff
                        preds[ci] = pred
                        bid = (my * cv + by) * cbw + (mx * ch + bx)
                        bids.append(bid)
                        ks.append(0)
                        vals.append(pred)
                        k = 1
                        while k < 64:
                            b = bit >> 3
                            win = (
                                (buf[b] << 32)
                                | (buf[b + 1] << 24)
                                | (buf[b + 2] << 16)
                                | (buf[b + 3] << 8)
                                | buf[b + 4]
                            )
                            sh = bit & 7
                            p = (win >> (24 - sh)) & 0xFFFF
                            ln = alen[p]
                            if ln == 0:
                                raise ValueError("invalid Huffman code")
                            sym = asym[p]
                            if sym == 0x00:  # EOB
                                bit += ln
                                break
                            if sym == 0xF0:  # ZRL
                                bit += ln
                                k += 16
                                continue
                            k += sym >> 4
                            size = sym & 0x0F
                            if k > 63:
                                raise ValueError("AC coefficient index overflow")
                            if size == 0:  # (run, 0) with run not 0/15: invalid
                                raise ValueError("invalid AC symbol")
                            v = (win >> (40 - sh - ln - size)) & ((1 << size) - 1)
                            bit += ln + size
                            vals.append(
                                v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                            )
                            bids.append(bid)
                            ks.append(k)
                            k += 1
            mcu_count += 1
    rd._bit = bit
    for ci, c in enumerate(comps):
        bids, ks, vals = per_comp[ci]
        nb = c["bh"] * c["bw"]
        flat = np.zeros((nb, 64))
        if bids:
            flat[bids, ks] = vals
        blocks = np.zeros((nb, 8, 8))
        blocks[:, _ZZ_ROWS, _ZZ_COLS] = flat
        c["coefs"] = (blocks * qtables[c["q"]]).reshape(c["bh"], c["bw"], 8, 8)
    return _assemble_pixels(comps, hmax, vmax, h, w, _return_coefs, precision)


def _noninterleaved_dims(c, hmax, vmax, w, h):
    """Block grid of a single-component (non-interleaved) scan — T.81 A.1.1/A.2.2:
    ceil of the component's OWN sample dimensions, NOT the MCU-padded grid."""
    xi = (w * c["h"] + hmax - 1) // hmax
    yi = (h * c["v"] + vmax - 1) // vmax
    return (xi + 7) // 8, (yi + 7) // 8


def _skip_to_marker(d: bytes, pos: int) -> int:
    """Advance past the tail of an arithmetic entropy segment to the next
    marker (skipping stuffed FF00 pairs)."""
    n = len(d)
    while pos + 1 < n:
        if d[pos] == 0xFF:
            if d[pos + 1] == 0x00:
                pos += 2
                continue
            return pos
        pos += 1
    return pos


def _decode_progressive_scan_arith(
    d, pos, scan_specs, comps, prog_coef, arith_cond,
    s_start, s_end, ah, al,
    mcux, mcuy, hmax, vmax, w, h, restart_interval,
):
    """One progressive ARITHMETIC (SOF10) scan (T.81 Annex G.3, jdarith
    control flow): DC first scans run the sequential Annex-F DC model with the
    point transform applied to the decoded difference; DC refinement scans are
    one fixed-state bit per block; AC first scans run the sequential AC model
    over the spectral band; AC refinement scans use per-K correction/
    significance decisions with the EOB decision asked only beyond the
    previous stage's last nonzero index. Statistics, DC contexts and
    predictors reset at every scan (each scan is its own entropy segment with
    its own QM decoder). Returns the stream position of the next marker."""
    from .jarith import (
        AC_STATS_SIZE,
        DC_STATS_SIZE,
        FIXED_STATE,
        ArithDecoder,
        dc_context_for_diff,
        decode_ac_coeffs,
        decode_ac_refine_block,
        decode_dc_diff,
        new_stats,
    )

    if restart_interval:
        raise NotImplementedError("DRI/restart markers in an arithmetic scan")
    dec = ArithDecoder(d, pos)
    fixed = bytearray([FIXED_STATE << 1])

    if s_start == 0:  # DC scan
        if s_end != 0:
            raise ValueError("progressive DC scan with Se != 0")
        dc_stats: dict[int, bytearray] = {}
        cond: dict[int, int] = {}
        for _ci, dct, _act in scan_specs:
            dc_stats.setdefault(dct, new_stats(DC_STATS_SIZE))
            cs = arith_cond.get((0, dct), 0x10)
            if (cs & 0x0F) > (cs >> 4):  # T.81 B.2.4.3: 0 <= L <= U <= 15
                raise ValueError(f"invalid DAC DC conditioning 0x{cs:02X} (L > U)")
            cond[dct] = cs
        preds = {ci: 0 for ci, _, _ in scan_specs}
        dc_ctx = {ci: 0 for ci, _, _ in scan_specs}

        def dc_block(blk, ci, dct):
            if ah == 0:
                lo, up = cond[dct] & 0x0F, cond[dct] >> 4
                diff = decode_dc_diff(dec, dc_stats[dct], dc_ctx[ci])
                dc_ctx[ci] = dc_context_for_diff(diff, lo, up)
                preds[ci] += diff
                blk[0] = preds[ci] << al
            elif dec.decode(fixed, 0):
                blk[0] |= 1 << al

        if len(scan_specs) > 1:  # interleaved over the MCU grid
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, dct, _act in scan_specs:
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = prog_coef[ci][
                                    (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                                ]
                                dc_block(blk, ci, dct)
        else:
            ci, dct, _act = scan_specs[0]
            c = comps[ci]
            nbw, nbh = _noninterleaved_dims(c, hmax, vmax, w, h)
            for row in range(nbh):
                for col in range(nbw):
                    dc_block(prog_coef[ci][row * c["bw"] + col], ci, dct)
    else:  # AC scan: single component only
        if len(scan_specs) != 1:
            raise ValueError("progressive AC scan must be single-component")
        ci, _dct, act = scan_specs[0]
        c = comps[ci]
        ac_stats = new_stats(AC_STATS_SIZE)
        kx = arith_cond.get((1, act), 5)
        if not 1 <= kx <= 63:
            raise ValueError(f"invalid DAC Kx {kx}")
        blocks = prog_coef[ci]
        nbw, nbh = _noninterleaved_dims(c, hmax, vmax, w, h)
        for row in range(nbh):
            for col in range(nbw):
                blk = blocks[row * c["bw"] + col]
                if ah == 0:  # AC first (band [Ss, Se], point transform Al)
                    for k, v in decode_ac_coeffs(dec, ac_stats, kx, s_start, s_end):
                        blk[k] = v << al
                else:
                    decode_ac_refine_block(dec, ac_stats, blk, s_start, s_end, al)
    return _skip_to_marker(d, dec.pos)


def _decode_progressive_scan(
    rd, scan_specs, comps, huff, prog_coef,
    s_start, s_end, ah, al,
    mcux, mcuy, hmax, vmax, w, h, restart_interval,
):
    """One progressive (SOF2) scan into the per-component coefficient accumulators.

    Implements the T.81 Annex G.2 decode procedures with libjpeg's control flow
    (jdphuff.c), so real-world progressive streams decode: DC first/refinement
    scans (interleaved MCU order or single-component raster), AC first scans
    (spectral band [Ss, Se], point transform Al, EOB-run coding) and AC
    refinement scans (correction bits on nonzero-history coefficients). The
    accumulators hold zigzag-order ints; dequantization happens once at the end
    of the image, exactly like the baseline path.
    """
    buf = rd._buf
    state = {"bit": rd._bit}

    nbuf = len(buf)

    def bits(n):
        b = state["bit"]
        byte = b >> 3
        sh = b & 7
        if byte + 5 > nbuf:  # slice would silently zero-pad: fail loud like the
            raise ValueError("truncated entropy data")  # baseline loop's indexing
        win = int.from_bytes(buf[byte : byte + 5], "big")
        state["bit"] = b + n
        return (win >> (40 - sh - n)) & ((1 << n) - 1)

    def huffdec(lut):
        sym_l, len_l = lut
        b = state["bit"]
        byte = b >> 3
        sh = b & 7
        if byte + 5 > nbuf:
            raise ValueError("truncated entropy data")
        win = int.from_bytes(buf[byte : byte + 5], "big")
        p = (win >> (24 - sh)) & 0xFFFF
        ln = len_l[p]
        if ln == 0:
            raise ValueError("invalid Huffman code")
        state["bit"] = b + ln
        return sym_l[p]

    def align_restart():
        rd._bit = state["bit"]
        rd.align_restart()
        state["bit"] = rd._bit

    eobrun = 0

    if s_start == 0:  # DC scan
        if s_end != 0:
            raise ValueError("progressive DC scan with Se != 0")
        preds = {ci: 0 for ci, _, _ in scan_specs}
        if len(scan_specs) > 1:  # interleaved over the MCU grid
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and unit and unit % restart_interval == 0:
                        align_restart()
                        preds = {ci: 0 for ci in preds}
                    for ci, dct, _act in scan_specs:
                        c = comps[ci]
                        blocks = prog_coef[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = blocks[
                                    (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                                ]
                                if ah == 0:
                                    size = huffdec(huff[(0, dct)])
                                    diff = _extend(bits(size), size) if size else 0
                                    preds[ci] += diff
                                    blk[0] = preds[ci] << al
                                elif bits(1):
                                    blk[0] |= 1 << al
                    unit += 1
        else:  # single-component DC scan: raster over the comp's own block grid
            ci, dct, _act = scan_specs[0]
            c = comps[ci]
            nbw, nbh = _noninterleaved_dims(c, hmax, vmax, w, h)
            unit = 0
            for row in range(nbh):
                for col in range(nbw):
                    if restart_interval and unit and unit % restart_interval == 0:
                        align_restart()
                        preds[ci] = 0
                    blk = prog_coef[ci][row * c["bw"] + col]
                    if ah == 0:
                        size = huffdec(huff[(0, dct)])
                        diff = _extend(bits(size), size) if size else 0
                        preds[ci] += diff
                        blk[0] = preds[ci] << al
                    elif bits(1):
                        blk[0] |= 1 << al
                    unit += 1
    else:  # AC scan: single component only (T.81 G.1.1)
        if len(scan_specs) != 1:
            raise ValueError("progressive AC scan must be single-component")
        ci, _dct, act = scan_specs[0]
        c = comps[ci]
        alut = huff[(1, act)]
        blocks = prog_coef[ci]
        nbw, nbh = _noninterleaved_dims(c, hmax, vmax, w, h)
        p1 = 1 << al
        m1 = -p1
        unit = 0
        for row in range(nbh):
            for col in range(nbw):
                if restart_interval and unit and unit % restart_interval == 0:
                    align_restart()
                    eobrun = 0
                blk = blocks[row * c["bw"] + col]
                if ah == 0:  # AC first scan (G.2.2)
                    if eobrun > 0:
                        eobrun -= 1
                    else:
                        k = s_start
                        while k <= s_end:
                            sym = huffdec(alut)
                            r, s = sym >> 4, sym & 0x0F
                            if s == 0:
                                if r != 15:
                                    run = 1 << r
                                    if r:
                                        run += bits(r)
                                    eobrun = run - 1  # this block is run member 0
                                    break
                                k += 16  # ZRL
                                continue
                            k += r
                            if k > s_end:
                                raise ValueError("AC index overflow")
                            blk[k] = _extend(bits(s), s) << al
                            k += 1
                else:  # AC refinement scan (G.2.3 / jdphuff.c decode_mcu_AC_refine)
                    k = s_start
                    if eobrun == 0:
                        while k <= s_end:
                            sym = huffdec(alut)
                            r, s = sym >> 4, sym & 0x0F
                            newval = 0
                            if s == 0:
                                if r != 15:
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += bits(r)
                                    break  # rest of block handled by EOB logic
                                # r == 15 (ZRL): advance over 16 zero-history coeffs
                            else:
                                if s != 1:
                                    raise ValueError("invalid AC refinement symbol")
                                newval = p1 if bits(1) else m1
                            # advance over r zero-history coefficients, appending
                            # correction bits to already-nonzero ones passed over
                            while k <= s_end:
                                v = blk[k]
                                if v != 0:
                                    if bits(1) and (v & p1) == 0:
                                        blk[k] = v + (p1 if v >= 0 else m1)
                                else:
                                    r -= 1
                                    if r < 0:
                                        break  # reached the target zero coefficient
                                k += 1
                            if newval and k <= s_end:
                                blk[k] = newval
                            k += 1
                    if eobrun > 0:
                        while k <= s_end:  # corrections after the end-of-band
                            v = blk[k]
                            if v != 0:
                                if bits(1) and (v & p1) == 0:
                                    blk[k] = v + (p1 if v >= 0 else m1)
                            k += 1
                        eobrun -= 1
                unit += 1
    rd._bit = state["bit"]


def _assemble_pixels(comps, hmax, vmax, h, w, _return_coefs, precision=8):
    """Dequantized block tensors -> cropped RGB (shared by both processes).

    12-bit decodes return the top 8 bits of each [0, 4095] sample (>> 4) so the
    downstream features pipeline stays uniform uint8 — documented lossy view,
    same spirit as libjpeg's scaled output."""
    half = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    planes = []
    for c in comps:
        blocks = c["coefs"].reshape(-1, 8, 8)
        spatial = _idct(blocks) + half
        bh_, bw_ = c["bh"], c["bw"]
        plane = (
            spatial.reshape(bh_, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh_ * 8, bw_ * 8)
        )
        # upsample subsampled chroma to full resolution (nearest neighbor)
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(np.repeat(plane, vmax // c["v"], 0), hmax // c["h"], 1)
        planes.append(plane[:h, :w])

    if len(comps) == 1:
        rgb = np.stack([planes[0]] * 3, axis=-1)
    else:
        rgb = _ycbcr_to_rgb(np.stack(planes, axis=-1), half=half)
    vals = np.clip(np.round(rgb), 0, maxv)
    if precision > 8:
        px = (vals.astype(np.uint16) >> (precision - 8)).astype(np.uint8)
    else:
        px = vals.astype(np.uint8)
    if _return_coefs:
        return px, [c["coefs"] for c in comps]
    return px
