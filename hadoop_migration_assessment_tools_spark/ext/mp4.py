"""Minimal-but-real ISO base media file format (MP4) container codec.

[EXT] Multimodal plumbing beyond the reference (the reference is a query-log
hook with no media surface): a from-scratch ISO/IEC 14496-12 box walk — the
container layer every video pipeline needs BEFORE any codec runs. The writer
produces a valid self-contained MJPEG-in-MP4 file (`'jpeg'` VisualSampleEntry,
the registered motion-JPEG fourcc); the parser reconstructs the sample table
(stsd/stts/stsc/stsz/stco|co64) into exact byte ranges and decodes each sample
with the in-repo JPEG decoder (ext/jpeg.py). Codec payloads this sandbox can't
decode (avc1/hev1/mp4a...) surface as NotImplementedError so callers fall back
to decoded=false — the same honesty discipline as ext/multimodal.py's MP3 path.

Torn/malformed containers normalize to ValueError (explicit bounds checks, no
raw struct.error escapes); the box walk is iterative (explicit stack) so an
adversarial deeply-nested container cannot blow the recursion limit — the same
hardening the AVI RIFF walk got in round 7.

At 100 TB these payloads are opaque binary cells moved by Arrow batches; the
container walk runs inside mapInPandas on the executors (see
ext/multimodal.py extract_features / queries/llm.py media queries) — nothing
here touches the driver.
"""

from __future__ import annotations

import struct

__all__ = ["make_mp4_mjpeg_bytes", "parse_mp4", "parse_mp4_mjpeg"]

_TIMESCALE = 1000

# fourccs we can actually decode in-repo vs ones that honestly need external codecs
_DECODABLE_VIDEO = (b"jpeg", b"mjpa", b"mjpb", b"JPEG")

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts", b"udta"}


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def _full(btype: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


def make_mp4_mjpeg_bytes(frames, fps: int = 10, quality: int = 85) -> bytes:
    """Encode (h, w, 3) uint8 frames as a self-contained MJPEG-in-MP4: one
    baseline JPEG per sample in a single mdat chunk, full sample table in a
    trailing moov. Layout ftyp|mdat|moov so stco offsets are known up front."""
    import numpy as np

    from .jpeg import make_jpeg_bytes

    fr = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not fr:
        raise ValueError("MP4 needs at least one frame")
    h, w, _ = fr[0].shape
    if any(f.shape != (h, w, 3) for f in fr):
        raise ValueError("all MP4 frames must share (h, w, 3)")
    jpegs = [make_jpeg_bytes(f, quality=quality) for f in fr]
    nf = len(jpegs)
    delta = _TIMESCALE // max(fps, 1)
    duration = nf * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom" + b"mp41")
    mdat_offset = len(ftyp) + 8  # first sample starts right after the mdat header
    mdat = _box(b"mdat", b"".join(jpegs))

    mvhd = _full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, _TIMESCALE, duration)
        + struct.pack(">iHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + _MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _MATRIX
        + struct.pack(">II", w << 16, h << 16),
        flags=0x7,  # enabled | in movie | in preview
    )
    mdhd = _full(
        b"mdhd",
        struct.pack(">IIIIHH", 0, 0, _TIMESCALE, duration, 0x55C4, 0),  # lang 'und'
    )
    hdlr = _full(
        b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00"
    )
    vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=0x1)
    dref = _full(b"dref", struct.pack(">I", 1) + _full(b"url ", b"", flags=0x1))
    dinf = _box(b"dinf", dref)
    compressor = b"\x0cMotion JPEG" + b"\x00" * 20  # 1-byte len + name, 32 total
    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count per sample
        + compressor
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stsd = _full(b"stsd", struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", struct.pack(">III", 1, nf, delta))
    stsc = _full(b"stsc", struct.pack(">IIII", 1, 1, nf, 1))
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, nf) + b"".join(struct.pack(">I", len(j)) for j in jpegs),
    )
    stco = _full(b"stco", struct.pack(">II", 1, mdat_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk_boxes(payload: bytes):
    """Iterative ISO-BMFF box walk -> yields (type, body_start, body_end, depth).
    Handles size==1 (64-bit largesize) and size==0 (extends to container end);
    malformed sizes raise ValueError."""
    stack = [(0, len(payload), 0)]
    while stack:
        pos, end, depth = stack.pop()
        while pos + 8 <= end:
            size, btype = struct.unpack_from(">I4s", payload, pos)
            header = 8
            if size == 1:
                if pos + 16 > end:
                    raise ValueError("torn largesize box header")
                (size,) = struct.unpack_from(">Q", payload, pos + 8)
                header = 16
            elif size == 0:
                size = end - pos
            if size < header or pos + size > end:
                raise ValueError(f"box {btype!r} overruns its container")
            body_start, body_end = pos + header, pos + size
            yield btype, body_start, body_end, depth
            if btype in _CONTAINERS:
                stack.append((body_end, end, depth))
                pos, end, depth = body_start, body_end, depth + 1
                continue
            pos = body_end
        # loop back to pop the resume point pushed for the parent container


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(msg)


def parse_mp4(payload: bytes) -> dict:
    """Parse an ISO-BMFF payload into its video sample table: returns a dict
    with handler, codec fourcc, width/height (from stsd), timescale, duration
    ticks, and the exact (offset, size) of every sample — reconstructed from
    stsc chunk runs + stsz sizes + stco/co64 chunk offsets. Raises ValueError
    for torn containers; this function does NOT decode samples."""
    payload = bytes(payload)
    _require(len(payload) >= 12 and payload[4:8] == b"ftyp", "not an ISO-BMFF payload")

    tracks: list[dict] = []
    cur: dict | None = None
    for btype, s, e, depth in _walk_boxes(payload):
        body = payload[s:e]
        if btype == b"trak":
            cur = {}
            tracks.append(cur)
        elif cur is None:
            continue
        elif btype == b"hdlr":
            _require(len(body) >= 12, "torn hdlr")
            cur["handler"] = body[8:12]
        elif btype == b"mdhd":
            version = body[0]
            if version == 1:
                _require(len(body) >= 32, "torn mdhd v1")
                cur["timescale"], cur["duration"] = struct.unpack_from(">IQ", body, 20)
            else:
                _require(len(body) >= 24, "torn mdhd v0")
                cur["timescale"], cur["duration"] = struct.unpack_from(">II", body, 12)
        elif btype == b"stsd":
            _require(len(body) >= 16, "torn stsd")
            (n_entries,) = struct.unpack_from(">I", body, 4)
            _require(n_entries >= 1, "empty stsd")
            entry_size, fourcc = struct.unpack_from(">I4s", body, 8)
            _require(entry_size >= 16 and 8 + entry_size <= len(body), "torn stsd entry")
            cur["codec"] = fourcc
            if len(body) >= 8 + 36 and cur.get("handler") == b"vide":
                cur["width"], cur["height"] = struct.unpack_from(">HH", body, 8 + 32)
        elif btype == b"stts":
            _require(len(body) >= 8, "torn stts header")
            (n,) = struct.unpack_from(">I", body, 4)
            _require(len(body) >= 8 + 8 * n, "torn stts")
            cur["stts"] = [struct.unpack_from(">II", body, 8 + 8 * i) for i in range(n)]
        elif btype == b"stsc":
            _require(len(body) >= 8, "torn stsc header")
            (n,) = struct.unpack_from(">I", body, 4)
            _require(len(body) >= 8 + 12 * n, "torn stsc")
            cur["stsc"] = [
                struct.unpack_from(">III", body, 8 + 12 * i) for i in range(n)
            ]
        elif btype == b"stsz":
            _require(len(body) >= 12, "torn stsz header")
            sample_size, n = struct.unpack_from(">II", body, 4)
            # every sample occupies >= 1 byte of this self-contained payload, so a
            # count beyond the payload length is a torn table (and a memory bomb)
            _require(n <= len(payload), "implausible stsz sample count")
            if sample_size:
                cur["sizes"] = [sample_size] * n
            else:
                _require(len(body) >= 12 + 4 * n, "torn stsz")
                cur["sizes"] = list(struct.unpack_from(f">{n}I", body, 12)) if n else []
        elif btype == b"stco":
            _require(len(body) >= 8, "torn stco header")
            (n,) = struct.unpack_from(">I", body, 4)
            _require(len(body) >= 8 + 4 * n, "torn stco")
            cur["chunk_offsets"] = list(struct.unpack_from(f">{n}I", body, 8)) if n else []
        elif btype == b"co64":
            _require(len(body) >= 8, "torn co64 header")
            (n,) = struct.unpack_from(">I", body, 4)
            _require(len(body) >= 8 + 8 * n, "torn co64")
            cur["chunk_offsets"] = list(struct.unpack_from(f">{n}Q", body, 8)) if n else []

    video = next((t for t in tracks if t.get("handler") == b"vide"), None)
    _require(video is not None, "MP4 contains no video track")
    for key in ("codec", "sizes", "chunk_offsets", "stsc"):
        _require(key in video, f"video track missing {key}")

    # sample-table reconstruction: expand stsc runs across the chunk list
    sizes, offsets_out = video["sizes"], []
    stsc, chunk_offsets = video["stsc"], video["chunk_offsets"]
    n_chunks = len(chunk_offsets)
    sample_idx = 0
    for run_i, (first_chunk, per_chunk, _sdi) in enumerate(stsc):
        last_chunk = (
            stsc[run_i + 1][0] - 1 if run_i + 1 < len(stsc) else n_chunks
        )
        _require(1 <= first_chunk <= last_chunk <= n_chunks, "bad stsc run")
        for chunk in range(first_chunk, last_chunk + 1):
            pos = chunk_offsets[chunk - 1]
            for _ in range(per_chunk):
                if sample_idx >= len(sizes):
                    break
                size = sizes[sample_idx]
                _require(pos + size <= len(payload), "sample overruns payload")
                offsets_out.append((pos, size))
                pos += size
                sample_idx += 1
    _require(sample_idx == len(sizes), "stsc/stsz sample count mismatch")
    return {
        "handler": video.get("handler"),
        "codec": video["codec"],
        "width": video.get("width", 0),
        "height": video.get("height", 0),
        "timescale": video.get("timescale", 0),
        "duration": video.get("duration", 0),
        "stts": video.get("stts", []),
        "samples": offsets_out,
    }


def parse_mp4_mjpeg(payload: bytes):
    """Parse + DECODE an MJPEG-in-MP4 payload -> (n_frames, width, height,
    frames ndarray (n, h, w, 3), duration_ms). Codecs without a pure-python
    decoder (avc1, hev1, vp09...) raise NotImplementedError so callers fall
    back to decoded=false."""
    import numpy as np

    from .jpeg import parse_jpeg

    payload = bytes(payload)
    info = parse_mp4(payload)
    if info["codec"] not in _DECODABLE_VIDEO:
        raise NotImplementedError(
            f"MP4 video codec {info['codec']!r} needs an external decoder"
        )
    _require(len(info["samples"]) > 0, "MP4 video track has no samples")
    frames = [parse_jpeg(payload[o : o + s]) for o, s in info["samples"]]
    h, w, _ = frames[0].shape
    _require(
        all(f.shape == (h, w, 3) for f in frames), "MP4 frames disagree on dimensions"
    )
    # cross-check the stsd-advertised dimensions against the decoded pixels —
    # a torn sample table that still yields decodable JPEGs fails loudly here
    if info["width"] and (info["width"], info["height"]) != (w, h):
        raise ValueError("stsd dimensions disagree with decoded frames")
    ts = info["timescale"] or _TIMESCALE
    duration_ms = info["duration"] * 1000 // ts if ts else 0
    return len(frames), w, h, np.stack(frames), duration_ms
