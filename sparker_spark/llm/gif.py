"""Dependency-free GIF codec — stdlib + numpy only.

Same posture as the PNG/JPEG/AVI/FLAC codecs: decode the format for
real where bounded spec work covers the common case, reject the rest
with a precise ``ValueError``. GIF is palette-based and LOSSLESS, so
solid-color fixtures round-trip exactly and the value-hash oracle
needs no rounding argument at all.

Coverage:

- decode: GIF87a/GIF89a, global and local color tables, full LZW
  (variable code width 3..12 bits, LSB-first packing, CLEAR/EOI,
  deferred-clear streams), interlaced images (4-pass reorder),
  multi-frame animations composited in frame order (disposal methods
  none/keep (1), restore-background (2); frames pasted at their
  (left, top) offsets), transparency index from the graphic-control
  extension, other extensions skipped.
- rejected clearly: non-GIF payloads, missing color tables, LZW code
  overruns, truncated sub-block streams, disposal method 3
  (restore-previous — rare, needs a frame stack).
- encode (fixture writer): full-canvas frames over one global color
  table, optional per-frame delay (animation), uncompressed-style LZW
  (literal root codes with periodic CLEAR — valid output every
  decoder accepts, ~1 byte/pixel at 256 colors).

API mirrors the AVI module: ``decode`` -> (n_frames, height, width,
first-frame RGB array), ``frames_rgb`` -> every composited frame, for
the frame-sampling pipeline.

Reference: the public GIF89a specification (W3C/CompuServe). No
reference-repo counterpart — sparker has no multimodal surface; this
extends the engine per the training-data-pipeline brief.
"""

from __future__ import annotations

import struct


def _expect(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(msg)


# ---------------------------------------------------------------- decode


class _LzwReader:
    """LSB-first variable-width code reader over concatenated GIF data
    sub-blocks."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_code(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("truncated GIF LZW stream")
            self.acc |= self.data[self.pos] << self.nbits
            self.nbits += 8
            self.pos += 1
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at pos; returns
    (data, position after the terminator)."""
    chunks = []
    while True:
        _expect(pos < len(payload), "truncated GIF sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        _expect(pos + n <= len(payload), "truncated GIF sub-block")
        chunks.append(payload[pos : pos + n])
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytearray:
    """GIF LZW decompression (spec appendix F) -> ``expected`` palette
    indices."""
    _expect(2 <= min_code_size <= 11, f"bad GIF LZW code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    reader = _LzwReader(data)
    out = bytearray()

    def reset():
        return (
            [bytes([i]) for i in range(clear)] + [b"", b""],
            min_code_size + 1,
        )

    table, width = reset()
    prev: bytes | None = None
    while len(out) < expected:
        code = reader.read_code(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            _expect(code < clear, "GIF LZW stream starts with a dict code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("GIF LZW code beyond dictionary")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    _expect(
        len(out) >= expected,
        f"GIF LZW stream ended early ({len(out)}/{expected} pixels)",
    )
    return out[:expected]


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(indices: bytearray, w: int, h: int) -> bytearray:
    out = bytearray(len(indices))
    src = 0
    for start, step in _INTERLACE_PASSES:
        for row in range(start, h, step):
            out[row * w : (row + 1) * w] = indices[src : src + w]
            src += w
    return out


class _Frame:
    __slots__ = ("left", "top", "w", "h", "indices", "palette",
                 "transparent", "disposal")


def _parse(payload: bytes):
    _expect(payload[:6] in (b"GIF87a", b"GIF89a"),
            "not a GIF payload (missing GIF87a/GIF89a magic)")
    width, height = struct.unpack("<HH", payload[6:10])
    _expect(width > 0 and height > 0, "GIF declares zero dimension")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        _expect(len(gct) == 3 * n, "truncated GIF global color table")
        pos += 3 * n

    frames: list[_Frame] = []
    transparent = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            _expect(pos < len(payload), "truncated GIF extension")
            label = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                _expect(
                    disposal != 3,
                    "GIF disposal method 3 (restore previous) not "
                    "supported",
                )
                transparent = data[3] if flags & 0x01 else None
            continue
        if block == 0x2C:  # image descriptor
            left, top, w, h = struct.unpack("<4H", payload[pos : pos + 8])
            ipacked = payload[pos + 8]
            pos += 9
            palette = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                palette = payload[pos : pos + 3 * n]
                _expect(len(palette) == 3 * n,
                        "truncated GIF local color table")
                pos += 3 * n
            _expect(palette is not None,
                    "GIF image has neither global nor local color table")
            _expect(pos < len(payload), "truncated GIF image data")
            min_code = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            indices = _lzw_decode(data, min_code, w * h)
            if ipacked & 0x40:
                indices = _deinterlace(indices, w, h)
            f = _Frame()
            f.left, f.top, f.w, f.h = left, top, w, h
            f.indices, f.palette = indices, palette
            f.transparent, f.disposal = transparent, disposal
            frames.append(f)
            # GCE applies to ONE following image: reset BOTH fields, or
            # a GCE's disposal would leak onto later GCE-less frames
            transparent = None
            disposal = 0
            continue
        raise ValueError(f"unknown GIF block 0x{block:02X}")
    _expect(bool(frames), "GIF contains no image data")
    return width, height, frames


def frames_rgb(payload: bytes):
    """Decode every frame, composited in order onto the logical
    canvas -> list of (H, W, 3) uint8 arrays."""
    import numpy as np

    width, height, frames = _parse(payload)
    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    out = []
    for f in frames:
        pal = np.frombuffer(f.palette, dtype=np.uint8).reshape(-1, 3)
        idx = np.frombuffer(bytes(f.indices), dtype=np.uint8).reshape(
            f.h, f.w
        )
        _expect(int(idx.max(initial=0)) < pal.shape[0],
                "GIF pixel index beyond color table")
        region = canvas[f.top : f.top + f.h, f.left : f.left + f.w]
        _expect(region.shape[:2] == (f.h, f.w),
                "GIF frame extends beyond the logical canvas")
        rgb = pal[idx]
        if f.transparent is not None:
            mask = idx != f.transparent
            region[mask] = rgb[mask]
        else:
            region[...] = rgb
        out.append(canvas.copy())
        if f.disposal == 2:  # restore to background: clear the region
            canvas[f.top : f.top + f.h, f.left : f.left + f.w] = 0
    return out


def decode(payload: bytes):
    """(n_frames, first composited frame as (H, W, 3) uint8)."""
    width, height, frames = _parse(payload)
    first = frames_rgb(payload)[0]
    return len(frames), first


# ---------------------------------------------------------------- encode


def _lzw_encode_literal(indices, min_code_size: int) -> bytes:
    """Valid LZW stream emitting only root codes: CLEAR, then literal
    indices with a CLEAR whenever the (decoder-side) dictionary growth
    would widen codes past the root width + 1 — simple, spec-exact,
    accepted by every decoder (~(min_code_size+1)/8 bytes per pixel)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    # after a CLEAR the decoder's dict has eoi+1 entries and grows by
    # one per code AFTER the first; stay below the width boundary
    budget = (1 << width) - (eoi + 1) - 1
    count = 0
    for v in indices:
        if count >= budget:
            emit(clear)
            count = 0
        emit(int(v))
        count += 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    frames,
    palette: list[tuple[int, int, int]],
    delay_cs: int = 10,
) -> bytes:
    """Build a GIF from full-canvas index rasters (each an (H, W)
    array of palette indices) over ONE global color table. One frame
    -> plain GIF; several -> animation with ``delay_cs`` per frame.
    Fixture writer mirroring avi.encode_avi_mjpeg."""
    import numpy as np

    _expect(bool(len(frames)), "cannot encode a GIF with zero frames")
    _expect(2 <= len(palette) <= 256, "palette must have 2..256 colors")
    arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = arrs[0].shape
    for a in arrs:
        _expect(a.shape == (h, w), "all GIF frames must share the canvas")
        _expect(int(a.max(initial=0)) < len(palette),
                "frame index beyond palette")
    bits = max(2, (len(palette) - 1).bit_length())
    table_n = 1 << bits
    gct = bytearray()
    for r, g, b in palette:
        gct += bytes((r, g, b))
    gct += b"\x00" * (3 * (table_n - len(palette)))

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    out += gct
    animated = len(arrs) > 1
    for a in arrs:
        if animated:
            out += b"\x21\xf9\x04" + bytes([0]) + struct.pack(
                "<H", int(delay_cs)
            ) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<4H", 0, 0, w, h) + bytes([0])
        min_code = max(2, bits)
        out += bytes([min_code])
        data = _lzw_encode_literal(a.reshape(-1), min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
