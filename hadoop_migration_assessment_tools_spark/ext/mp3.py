"""[EXT] MP3 (MPEG-1/2/2.5 Audio Layer III) stream-level parser + writer.

From-scratch implementation of the PUBLIC frame-header grammar (ISO/IEC
11172-3 §2.4.1 / 13818-3; the de-facto MPEG-2.5 extension) — the level a
training-data manifest pipeline actually needs: duration, bitrate profile,
sample rate, CBR/VBR detection and tag accounting from a pure HEADER WALK,
no psychoacoustic decode. Same honesty contract as ext/mp4.py's avc1/hev1
guard: the audio ESSENCE stays decoded=false (Huffman + IMDCT + synthesis
filterbank belong to external libs this container doesn't have); what we
certify is the container arithmetic — every frame's byte length is determined
by its header (bitrate, sample rate, padding), so a walk that lands exactly
on the next sync word on every step, ends exactly at the stream boundary, and
replays a closed-form duration proves the writer AND the parser together.

Layout handled: optional ID3v2 prefix (syncsafe size, optional footer),
frame sequence (CRC-protected or not), optional ID3v1 128-byte trailer.
Xing/VBRI info frames are ordinary frames to this walk (they only matter to
seeking, not to stream stats). Free-format (bitrate index 0) is rejected
loudly — its frame length is not derivable from the header alone.

No reference citation: the reference repo has no media pipeline ([EXT] scope).
"""

from __future__ import annotations

import struct

# bitrate tables, kbps; index 0 = free format (rejected), 15 = invalid
BITRATE_KBPS = {
    # (version_group, layer): table   — version_group: 1 = MPEG1, 2 = MPEG2/2.5
    (1, 3): (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None),
    (2, 3): (None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, None),
}

SAMPLE_RATES = {
    # version bits (00=2.5, 10=2, 11=1) -> rates by 2-bit index (3 = reserved)
    3: (44100, 48000, 32000),  # MPEG1
    2: (22050, 24000, 16000),  # MPEG2
    0: (11025, 12000, 8000),  # MPEG2.5
}

VERSION_NAMES = {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}


def _syncsafe(n: int) -> bytes:
    return bytes(((n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F))


def _unsyncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise ValueError("ID3v2 size bytes must be syncsafe (high bit clear)")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def frame_length(version_bits: int, bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    """Layer III frame length in bytes: 144·bitrate/rate for MPEG1,
    72·bitrate/rate for MPEG2/2.5 (spf 576), plus one padding byte."""
    factor = 144 if version_bits == 3 else 72
    return factor * bitrate_kbps * 1000 // sample_rate + padding


def samples_per_frame(version_bits: int) -> int:
    return 1152 if version_bits == 3 else 576


def make_frame_header(
    version_bits: int, bitrate_index: int, rate_index: int, padding: int = 0
) -> bytes:
    """Layer III header: sync, version, layer=III (01), no CRC, stereo."""
    h = (
        (0x7FF << 21)
        | (version_bits << 19)
        | (0b01 << 17)  # Layer III
        | (1 << 16)  # protection bit 1 = no CRC
        | (bitrate_index << 12)
        | (rate_index << 10)
        | (padding << 9)
    )
    return struct.pack(">I", h)


def make_mp3_bytes(
    n_frames: int,
    rate_index: int = 0,
    bitrate_indices: tuple[int, ...] = (9,),
    version_bits: int = 3,
    id3v2_size: int = 0,
    id3v1: bool = True,
    seed: int = 0,
    xing: bool = False,
) -> bytes:
    """Deterministic, spec-valid MP3 STREAM: real headers whose lengths tile
    the byte range exactly; frame bodies are deterministic filler (the honest
    undecodable essence). ``bitrate_indices`` cycles per frame — one entry =
    CBR, several = VBR. ``xing``: prepend a Xing/VBR info frame (the de-facto
    LAME convention real VBR files lead with) whose frames field claims the
    ``n_frames`` AUDIO frames that follow it."""
    rate = SAMPLE_RATES[version_bits][rate_index]
    out = bytearray()
    if id3v2_size:
        out += b"ID3\x04\x00\x00" + _syncsafe(id3v2_size)
        out += bytes((seed + i) % 256 for i in range(id3v2_size))
    if xing:
        if version_bits != 3:
            raise ValueError("xing frame synthesis supports MPEG1 only")
        bidx = bitrate_indices[0]
        kbps = BITRATE_KBPS[(1, 3)][bidx]
        flen = frame_length(version_bits, kbps, rate, padding=0)
        body = bytearray(flen - 4)
        # MPEG1 stereo side-info is 32 bytes; Xing lands right after it
        body[32:36] = b"Xing"
        body[36:40] = struct.pack(">I", 1)  # flags: frames field present
        body[40:44] = struct.pack(">I", n_frames)
        for i in range(44, len(body)):
            body[i] = (seed * 17 + i) % 255
        out += make_frame_header(version_bits, bidx, rate_index, padding=0)
        out += bytes(body)
    for f in range(n_frames):
        bidx = bitrate_indices[f % len(bitrate_indices)]
        kbps = BITRATE_KBPS[(1 if version_bits == 3 else 2, 3)][bidx]
        flen = frame_length(version_bits, kbps, rate, padding=0)
        out += make_frame_header(version_bits, bidx, rate_index, padding=0)
        body = flen - 4
        # filler must never contain a false sync (0xFF); keep bytes < 0xFF
        out += bytes((seed * 31 + f * 7 + i) % 255 for i in range(body))
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)


def parse_mp3(payload: bytes) -> dict:
    """Walk every frame header; returns stream-level stats. Raises ValueError
    on anything that is not a clean Layer III stream (bad sync, reserved
    version/layer/rate, free-format or invalid bitrate, torn final frame) —
    callers route to decoded=false (media_features' closed catch set).

    Returned dict: version, layer, sample_rate, n_frames, duration_ms
    (sum of spf/rate per frame, exact integer math: spf·1000·n // rate since
    rate is constant per stream), stream_bytes (frames only), is_cbr,
    bitrate_kbps_min/max, mean_bitrate_kbps (total frame bits / duration,
    rounded down), has_id3v2, has_id3v1, decoded=False (essence untouched)."""
    data = bytes(payload)
    pos = 0
    has_id3v2 = False
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise ValueError("torn ID3v2 header")
        size = _unsyncsafe(data[6:10])
        footer = 10 if (data[5] & 0x10) else 0
        pos = 10 + size + footer
        has_id3v2 = True
        if pos > len(data):
            raise ValueError("ID3v2 size exceeds payload")
    end = len(data)
    has_id3v1 = end - pos >= 128 and data[end - 128 : end - 125] == b"TAG"
    if has_id3v1:
        end -= 128

    n_frames = 0
    stream_bytes = 0
    version_bits = None
    rate = None
    brs: set[int] = set()
    first_frame: tuple[int, int] | None = None  # (offset, length)
    while pos < end:
        if end - pos < 4:
            raise ValueError(f"torn frame header at {pos}")
        h = struct.unpack_from(">I", data, pos)[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"lost sync at byte {pos}")
        vb = (h >> 19) & 0b11
        layer = (h >> 17) & 0b11
        if vb == 1:
            raise ValueError("reserved MPEG version")
        if layer != 0b01:
            raise ValueError("only Layer III streams are supported")
        bidx = (h >> 12) & 0xF
        ridx = (h >> 10) & 0b11
        if ridx == 3:
            raise ValueError("reserved sample-rate index")
        kbps = BITRATE_KBPS[(1 if vb == 3 else 2, 3)][bidx]
        if kbps is None:
            raise ValueError(
                "free-format or invalid bitrate index "
                f"{bidx} (frame length not derivable from the header)"
            )
        this_rate = SAMPLE_RATES[vb][ridx]
        if version_bits is None:
            version_bits, rate = vb, this_rate
        elif (vb, this_rate) != (version_bits, rate):
            raise ValueError("mid-stream version/sample-rate change")
        padding = (h >> 9) & 1
        flen = frame_length(vb, kbps, this_rate, padding)
        if pos + flen > end:
            raise ValueError(f"frame at {pos} overruns the stream")
        if first_frame is None:
            first_frame = (pos, flen)
        n_frames += 1
        stream_bytes += flen
        brs.add(kbps)
        pos += flen
    if n_frames == 0:
        raise ValueError("no MPEG audio frames")

    # Xing/Info VBR header (de-facto LAME spec): sits in the FIRST frame right
    # after the side info — the four spec offsets by version x channel mode.
    # The walk itself never needs it (frame lengths are self-describing); it is
    # exposed so consumers can cross-check the claimed audio-frame count.
    #
    # Accounting contract (ADVICE r9, documented rather than adjusted):
    # n_frames / duration_ms / is_cbr / mean_bitrate_kbps count EVERY physical
    # frame INCLUDING a leading Xing/Info metadata frame — the walk reports
    # the physical stream; industry tools usually subtract the info frame.
    # Consumers wanting the audio-only figure subtract 1 when has_xing (the
    # xing_frames field already carries the encoder's audio-only claim).
    has_xing = False
    xing_frames = None
    foff, flen0 = first_frame
    # 4-byte header + side info: MPEG1 stereo 32 / mono 17; MPEG2/2.5 stereo 17
    # / mono 9 — so the spec offsets are exactly {36, 21, 13}. NO-CRC
    # assumption (ADVICE r9): in CRC-protected frames (protection bit 0) the
    # side info shifts +2 bytes and these fixed offsets would miss the tag —
    # fine for this walker, whose own writer always sets protection=1 (no
    # CRC), but a CRC-protected external stream reports has_xing=False.
    for so in (36, 21, 13):
        tag = data[foff + so : foff + so + 4]
        if so + 8 <= flen0 and tag in (b"Xing", b"Info"):
            has_xing = True
            flags = struct.unpack_from(">I", data, foff + so + 4)[0]
            if flags & 1 and so + 12 <= flen0:
                xing_frames = struct.unpack_from(">I", data, foff + so + 8)[0]
            break
    spf = samples_per_frame(version_bits)
    duration_ms = n_frames * spf * 1000 // rate
    mean_kbps = stream_bytes * 8 * rate // (n_frames * spf) // 1000
    return {
        "version": VERSION_NAMES[version_bits],
        "layer": 3,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_ms": duration_ms,
        "stream_bytes": stream_bytes,
        "is_cbr": len(brs) == 1,
        "bitrate_kbps_min": min(brs),
        "bitrate_kbps_max": max(brs),
        "mean_bitrate_kbps": mean_kbps,
        "has_id3v2": has_id3v2,
        "has_id3v1": has_id3v1,
        "has_xing": has_xing,
        "xing_frames": xing_frames,  # claimed AUDIO frames (excl. the Xing frame)
        "decoded": False,  # essence honesty: headers walked, audio not decoded
    }
