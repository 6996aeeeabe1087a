"""Dependency-free MJPEG-in-AVI container codec — stdlib only.

Same posture as the PNG/JPEG codecs (multimodal.py / jpeg.py): decode
the format for real where bounded spec work covers the common case and
reject everything else with a precise error. MJPEG-in-AVI is the
natural first video format for this engine because every frame is a
baseline JPEG the repo's own T.81 decoder (llm/jpeg.py) already
handles — the container layer is pure RIFF bookkeeping.

Coverage:

- parse: RIFF('AVI ') files with one 'vids' stream; frame chunks
  '00dc'/'00db' read in stream order from the 'movi' list (the idx1
  index, when present, is ignored — stream order is authoritative for
  a single video stream and index-less files are legal); frame timing
  from the stream header's dwScale/dwRate pair, falling back to the
  main header's dwMicroSecPerFrame.
- rejected clearly: non-RIFF/non-AVI payloads, files without a video
  stream, streams whose handler is not MJPG/mjpg (``ValueError``
  naming the feature).
- encode (fixture writer): single-stream MJPEG AVI from a list of
  pre-encoded JPEG payloads + (fps_num, fps_den), with a standard
  idx1 index so third-party players accept the fixtures too.

Scale posture: a payload is parsed ONCE per row inside Arrow-batched
``mapInPandas`` (multimodal.video_frame_features) — per-payload
parallelism exactly like the image codecs; no driver state. Frame
SELECTION consumes the same (media_id, frame_ts_ms) work units
``frame_sample_plan`` emits, so a 100 TB corpus scales by
partitioning media rows, and a future byte-range reader can split
single huge files by the idx1 offsets without changing the plan
contract.

Reference: the public RIFF/AVI format (Microsoft "AVI RIFF File
Reference"). No reference-repo counterpart — sparker has no multimodal
surface; this extends the engine per the training-data-pipeline brief.
"""

from __future__ import annotations

import struct


# ------------------------------------------------------------- parse
def _expect(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(msg)


def _chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_size) for the chunk sequence in
    buf[start:end]; chunk bodies are word-aligned (odd sizes padded)."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        _expect(body + size <= end, f"truncated chunk {fourcc!r}")
        yield fourcc, body, size
        pos = body + size + (size & 1)


class AviVideo:
    """Parsed single-stream MJPEG AVI: frame payloads + timing."""

    __slots__ = (
        "width",
        "height",
        "scale",
        "rate",
        "frames",
    )

    def __init__(self, width, height, scale, rate, frames):
        self.width = int(width)
        self.height = int(height)
        self.scale = int(scale)  # frame duration = scale/rate seconds
        self.rate = int(rate)
        self.frames = frames  # list[bytes] — JPEG payloads, stream order

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    def frame_ts_ms(self, i: int) -> int:
        """Presentation timestamp of frame i, truncated to whole ms —
        i·1000·scale/rate in exact integer arithmetic."""
        return i * 1000 * self.scale // self.rate

    @property
    def duration_ms(self) -> int:
        return self.n_frames * 1000 * self.scale // self.rate

    def frame_index_at(self, ts_ms: int) -> int:
        """Index of the frame on screen at ts_ms (floor semantics,
        clamped to the last frame) — the work-unit consumer for
        frame_sample_plan's (media_id, frame_ts_ms) rows."""
        idx = int(ts_ms) * self.rate // (1000 * self.scale)
        return max(0, min(self.n_frames - 1, idx))


def parse_avi(payload: bytes) -> AviVideo:
    """Parse an MJPEG AVI payload into frames + timing metadata.

    Every malformed-payload failure surfaces as ValueError (same shim
    as jpeg.decode): header fields shorter than the structs parsed out
    of them raise struct.error deep in the walk, which would otherwise
    escape the module's documented ValueError contract and kill a
    mapInPandas task with an unnamed error."""
    try:
        return _parse_avi_impl(payload)
    except struct.error as exc:
        raise ValueError(f"truncated AVI header ({exc})") from exc


def _parse_avi_impl(payload: bytes) -> AviVideo:
    _expect(len(payload) >= 12, "not an AVI: shorter than a RIFF header")
    _expect(payload[0:4] == b"RIFF", "not an AVI: missing RIFF magic")
    _expect(payload[8:12] == b"AVI ", "not an AVI: RIFF form is not 'AVI '")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(len(payload), 8 + riff_size)

    width = height = 0
    scale = rate = 0
    micro_per_frame = 0
    handler_ok = False
    frames: list[bytes] = []

    def walk_list(body: int, size: int) -> None:
        nonlocal width, height, scale, rate, micro_per_frame, handler_ok
        list_type = payload[body : body + 4]
        inner_start, inner_end = body + 4, body + size
        if list_type == b"movi":
            for fcc, b, s in _chunks(payload, inner_start, inner_end):
                # '##dc' compressed / '##db' uncompressed video chunk
                # of stream 00 (single-video-stream scope)
                if fcc in (b"00dc", b"00db"):
                    frames.append(payload[b : b + s])
                elif fcc == b"LIST":  # 'rec ' grouping inside movi
                    walk_list(b, s)
            return
        for fcc, b, s in _chunks(payload, inner_start, inner_end):
            if fcc == b"LIST":
                walk_list(b, s)
            elif fcc == b"avih" and s >= 40:
                # 40 = offset of dwHeight's end: dwWidth/dwHeight live
                # at body+32..40, so a shorter (still legal-looking)
                # chunk must not read past its declared body
                micro_per_frame = struct.unpack_from("<I", payload, b)[0]
                width, height = struct.unpack_from("<II", payload, b + 32)
            elif fcc == b"strh" and s >= 32:
                fcc_type = payload[b : b + 4]
                fcc_handler = payload[b + 4 : b + 8]
                if fcc_type == b"vids":
                    _expect(
                        fcc_handler.lower() in (b"mjpg", b"\x00\x00\x00\x00"),
                        f"unsupported video codec {fcc_handler!r}: only "
                        "MJPG (motion-JPEG) is decodable without "
                        "external codec libraries",
                    )
                    handler_ok = True
                    scale, rate = struct.unpack_from("<II", payload, b + 20)

    for fourcc, body, size in _chunks(payload, 12, end):
        if fourcc == b"LIST":
            walk_list(body, size)

    _expect(handler_ok, "no 'vids' stream header found")
    _expect(bool(frames), "no video frame chunks in 'movi'")
    if not (scale and rate):
        # fall back to the main header's per-frame duration
        _expect(
            micro_per_frame > 0,
            "no frame timing: strh dwScale/dwRate and avih "
            "dwMicroSecPerFrame are all zero",
        )
        scale, rate = micro_per_frame, 1_000_000
    return AviVideo(width, height, scale, rate, frames)


# ------------------------------------------------------------ encode
def encode_avi_mjpeg(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    fps_num: int = 30,
    fps_den: int = 1,
) -> bytes:
    """Build a single-stream MJPEG AVI from pre-encoded JPEG payloads.

    ``fps_num/fps_den`` is frames per second (strh dwRate/dwScale);
    fixture writer for tests + the value-hash gate, but emits a
    standards-shaped file (hdrl/movi/idx1) playable elsewhere."""
    _expect(bool(jpeg_frames), "cannot encode an AVI with zero frames")
    n = len(jpeg_frames)
    scale, rate = int(fps_den), int(fps_num)
    micro_per_frame = 1_000_000 * scale // rate
    max_bytes = max(len(f) for f in jpeg_frames)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = struct.pack(
        "<14I",
        micro_per_frame,  # dwMicroSecPerFrame
        max_bytes * rate // max(scale, 1),  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        int(width),
        int(height),
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIII",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            scale,  # dwScale
            rate,  # dwRate
            0,  # dwStart
            n,  # dwLength (frames)
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0: varying)
            0,  # rcFrame packed as one dword pair below
        )
        + struct.pack("<HH", int(width), int(height))
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        int(width),
        int(height),
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        int(width) * int(height) * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    offsets = []  # idx1 offsets: from the 'movi' fourcc
    for f in jpeg_frames:
        offsets.append(len(movi_body))
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)

    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(f))  # AVIIF_KEYFRAME
        for off, f in zip(offsets, jpeg_frames)
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body
