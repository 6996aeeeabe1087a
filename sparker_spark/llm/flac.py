"""Dependency-free FLAC codec — stdlib + numpy only.

Same posture as the JPEG/PNG/AVI codecs (llm/jpeg.py, multimodal.py):
decode the format for real where bounded spec work covers the common
case, reject everything else with a precise ``ValueError``. FLAC is
LOSSLESS, so — unlike the JPEG gates, which need a closed-form
round-trip argument — decoded samples are bit-identical to the input
by definition, and the audio value-hash oracle math carries over from
the WAV gate unchanged.

Coverage:

- decode: native FLAC streams ('fLaC' magic), STREAMINFO + any other
  metadata blocks (skipped), frames with fixed or variable blocking,
  all four channel assignments (independent, left/side, right/side,
  mid/side), subframe types CONSTANT, VERBATIM, FIXED (orders 0-4)
  and LPC (any order), wasted bits, RICE and RICE2 residual coding
  with any partition order including escaped (raw) partitions, 8/16/24
  bits per sample. Frame CRC-8 (header) and CRC-16 (frame) are
  verified — a corrupt payload fails loudly, not with garbled audio.
- rejected clearly: non-FLAC payloads, Ogg-encapsulated FLAC,
  reserved subframe/blocksize/rate codes — ``ValueError`` naming the
  feature.
- encode (fixture writer): 8/16-bit, any channel count, block-sized
  frames choosing per subframe among CONSTANT / FIXED orders 0-4
  (best by residual-magnitude sum) / LPC (Levinson-Durbin analysis,
  quantized coefficients) / VERBATIM fallback, rice partition order
  0, optional stereo decorrelation modes for decoder test coverage.

Determinism: lossless — encode(decode(x)) == x exactly; no rounding
contract needed.

Performance posture: identical to the JPEG entropy layer — the rice
layer is sequential bit work, O(total bits) per payload with bounded
state; everything around it (fixed-predictor reconstruction, channel
decorrelation) is numpy or tight integer loops bounded by the block
size. Engine-level parallelism is per-payload via the Arrow-batched
mapInPandas in llm/audio.py — audio corpora scale by partitioning
payloads, never by one big decode.

Reference: the public FLAC format specification (xiph.org / RFC 9639).
No reference-repo counterpart — sparker has no multimodal surface;
this extends the engine per the training-data-pipeline brief.
"""

from __future__ import annotations

import struct

FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _Bits:
    """MSB-first bit reader over bytes, tracking byte position for the
    frame CRC (FLAC CRCs cover whole bytes, so alignment operations
    expose the consumed range)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes, start_byte: int = 0):
        self.data = data
        self.bitpos = start_byte * 8

    @property
    def bytepos(self) -> int:
        return self.bitpos // 8

    def read(self, n: int) -> int:
        end = self.bitpos + n
        if end > len(self.data) * 8:
            raise ValueError("truncated FLAC bitstream")
        out = 0
        pos = self.bitpos
        while n:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            n -= take
        self.bitpos = pos
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        count = 0
        while self.read(1) == 0:
            count += 1
        return count

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


def _read_utf8_number(bits: _Bits) -> int:
    """UTF-8-style variable-length frame/sample number (up to 36 bits,
    7-byte form)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("invalid UTF-8-coded frame number")
    val = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid UTF-8-coded frame number continuation")
        val = (val << 6) | (c & 0x3F)
    return val


_BLOCKSIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BITS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def _decode_residuals(bits: _Bits, order: int, block_size: int) -> list[int]:
    """Partitioned rice residuals for one subframe (spec 9.2.7)."""
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual coding method {method}")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    part_order = bits.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise ValueError("FLAC partition order does not divide block size")
    res: list[int] = []
    for p in range(n_parts):
        count = block_size >> part_order
        if p == 0:
            count -= order
            if count < 0:
                raise ValueError("FLAC predictor order exceeds partition")
        param = bits.read(param_bits)
        if param == escape:
            raw = bits.read(5)
            for _ in range(count):
                res.append(bits.read_signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = bits.read_unary()
                r = bits.read(param) if param else 0
                zz = (q << param) | r
                res.append((zz >> 1) ^ -(zz & 1))  # zigzag decode
    return res


def _decode_subframe(bits: _Bits, block_size: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("invalid FLAC subframe sync bit")
    sftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.read_unary()
    eff = bps - wasted
    if eff <= 0:
        raise ValueError(
            f"FLAC wasted-bits count {wasted} consumes the whole "
            f"{bps}-bit sample width"
        )
    if sftype == 0:  # CONSTANT
        v = bits.read_signed(eff)
        out = [v] * block_size
    elif sftype == 1:  # VERBATIM
        out = [bits.read_signed(eff) for _ in range(block_size)]
    elif 8 <= sftype <= 12:  # FIXED order 0-4
        order = sftype - 8
        warm = [bits.read_signed(eff) for _ in range(order)]
        res = _decode_residuals(bits, order, block_size)
        coeffs = FIXED_COEFFS[order]
        out = list(warm)
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coeffs))
            out.append(pred + r)
    elif sftype >= 32:  # LPC, order = sftype - 31
        order = sftype - 31
        warm = [bits.read_signed(eff) for _ in range(order)]
        precision = bits.read(4)
        if precision == 15:
            raise ValueError("invalid FLAC LPC coefficient precision")
        precision += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coeffs = [bits.read_signed(precision) for _ in range(order)]
        res = _decode_residuals(bits, order, block_size)
        out = list(warm)
        for r in res:
            acc = sum(c * out[-i - 1] for i, c in enumerate(coeffs))
            out.append((acc >> shift) + r)
    else:
        raise ValueError(f"reserved FLAC subframe type {sftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def bits_per_sample(payload: bytes) -> int:
    """Declared sample width from STREAMINFO (callers normalizing
    amplitudes need the full-scale range; the samples contract shared
    with wav_samples does not carry it)."""
    if payload[:4] != b"fLaC" or len(payload) < 42:
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    si = _Bits(payload, 8)  # first metadata block body (STREAMINFO)
    if payload[4] & 0x7F != 0:
        raise ValueError("FLAC stream does not start with STREAMINFO")
    si.read(16 + 16 + 24 + 24 + 20 + 3)
    return si.read(5) + 1


def decode(payload: bytes):
    """Decode a native FLAC stream -> (n_channels, sample_rate,
    frames int32 array of shape (n_frames, n_channels)) — the same
    return contract as audio.wav_samples."""
    import numpy as np

    if payload[:4] == b"OggS":
        raise ValueError(
            "Ogg-encapsulated FLAC not supported (native streams only)"
        )
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    pos = 4
    streaminfo = None
    # metadata blocks
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if len(body) != size:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            streaminfo = body
        pos += 4 + size
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC stream missing STREAMINFO")
    si = _Bits(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)  # min framesize
    si.read(24)  # max framesize
    sample_rate = si.read(20)
    n_channels = si.read(3) + 1
    bps_stream = si.read(5) + 1
    total_samples = si.read(36)
    if sample_rate == 0:
        raise ValueError("FLAC STREAMINFO declares zero sample rate")

    channels: list[list[int]] = [[] for _ in range(n_channels)]
    decoded = 0
    while pos < len(payload) and (total_samples == 0 or decoded < total_samples):
        bits = _Bits(payload, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad FLAC frame sync at byte {pos}")
        if bits.read(1):
            raise ValueError("reserved FLAC frame header bit set")
        bits.read(1)  # blocking strategy (both handled via UTF-8 number)
        bs_code = bits.read(4)
        rate_code = bits.read(4)
        chan_code = bits.read(4)
        size_code = bits.read(3)
        if bits.read(1):
            raise ValueError("reserved FLAC frame header bit set")
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code 0")
        elif bs_code == 6:
            block_size = bits.read(8) + 1
        elif bs_code == 7:
            block_size = bits.read(16) + 1
        else:
            block_size = _BLOCKSIZE_CODES[bs_code]
        if rate_code == 0:
            frame_rate = sample_rate  # from STREAMINFO
        elif rate_code in _RATE_CODES:
            frame_rate = _RATE_CODES[rate_code]
        elif rate_code == 12:
            frame_rate = bits.read(8) * 1000
        elif rate_code == 13:
            frame_rate = bits.read(16)
        elif rate_code == 14:
            frame_rate = bits.read(16) * 10
        else:
            raise ValueError("invalid FLAC sample rate code 15")
        if frame_rate != sample_rate:
            # a conforming stream repeats the STREAMINFO rate; decoding
            # mixed-rate frames into one sample array would silently
            # corrupt every downstream duration/spectral feature
            raise ValueError(
                f"FLAC frame sample rate {frame_rate} disagrees with "
                f"STREAMINFO rate {sample_rate}"
            )
        if size_code == 0:
            bps = bps_stream
        elif size_code in _BITS_CODES:
            bps = _BITS_CODES[size_code]
        else:
            raise ValueError(f"reserved FLAC sample size code {size_code}")
        header_bytes = payload[pos : bits.bytepos]
        crc8 = bits.read(8)
        if _crc8(header_bytes) != crc8:
            raise ValueError(f"FLAC frame header CRC mismatch at byte {pos}")

        if chan_code < 8:
            if chan_code + 1 != n_channels:
                raise ValueError(
                    "FLAC frame channel count disagrees with STREAMINFO"
                )
            subs = [
                _decode_subframe(bits, block_size, bps)
                for _ in range(n_channels)
            ]
        elif chan_code in (8, 9, 10):
            if n_channels != 2:
                raise ValueError(
                    "FLAC stereo decorrelation in a non-stereo stream"
                )
            # the difference channel carries one extra bit
            if chan_code == 8:  # left/side
                left = _decode_subframe(bits, block_size, bps)
                side = _decode_subframe(bits, block_size, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif chan_code == 9:  # right/side
                side = _decode_subframe(bits, block_size, bps + 1)
                right = _decode_subframe(bits, block_size, bps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side: mid = (l+r)>>1, side = l-r; l+r and l-r
                # share parity, so the true sum is (mid<<1)|(side&1)
                mid = _decode_subframe(bits, block_size, bps)
                side = _decode_subframe(bits, block_size, bps + 1)
                subs = [
                    [(((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(mid, side)],
                    [(((m << 1) | (s & 1)) - s) >> 1 for m, s in zip(mid, side)],
                ]
        else:
            raise ValueError(f"reserved FLAC channel assignment {chan_code}")

        bits.align()
        frame_bytes = payload[pos : bits.bytepos]
        crc16 = bits.read(16)
        if _crc16(frame_bytes) != crc16:
            raise ValueError(f"FLAC frame CRC-16 mismatch at byte {pos}")
        for ch in range(n_channels):
            channels[ch].extend(subs[ch])
        decoded += block_size
        pos = bits.bytepos

    if total_samples and decoded < total_samples:
        # fail loudly (module contract): a payload truncated at a frame
        # boundary would otherwise return a silently short stream with
        # wrong duration/RMS features
        raise ValueError(
            f"truncated FLAC stream: {decoded} of {total_samples} "
            "declared samples decoded"
        )
    if total_samples and decoded > total_samples:
        channels = [c[:total_samples] for c in channels]
    frames = np.array(channels, dtype=np.int64).T.astype(np.int32)
    if frames.size == 0:
        frames = frames.reshape(0, n_channels)
    return n_channels, sample_rate, frames


# ---------------------------------------------------------------- encode


class _BitsW:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
            self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _write_utf8_number(w: _BitsW, val: int):
    if val < 0x80:
        w.write(val, 8)
        return
    # n-byte form carries 5n+1 payload bits
    n = 2
    while val >= (1 << (5 * n + 1)) and n < 7:
        n += 1
    payload_bits = 6 * (n - 1)
    w.write(((0xFF << (8 - n)) & 0xFF) | (val >> payload_bits), 8)
    for i in range(n - 1):
        shift = payload_bits - 6 * (i + 1)
        w.write(0x80 | ((val >> shift) & 0x3F), 8)


def _rice_cost(res: list[int], param: int) -> int:
    cost = 0
    for r in res:
        zz = (abs(r) << 1) - (1 if r < 0 else 0)  # zigzag
        cost += (zz >> param) + 1 + param
    return cost


def _write_rice(w: _BitsW, res: list[int], param: int):
    for r in res:
        zz = (abs(r) << 1) - (1 if r < 0 else 0)
        w.write_unary(zz >> param)
        if param:
            w.write(zz & ((1 << param) - 1), param)


def _best_rice_param(res: list[int], max_param: int = 14) -> tuple[int, int]:
    best = (None, None)
    for p in range(max_param + 1):
        c = _rice_cost(res, p)
        if best[1] is None or c < best[1]:
            best = (p, c)
    return best


def _lpc_analyze(block, max_order: int = 8):
    """Levinson-Durbin LPC analysis -> (order, quantized coeffs, shift)
    or None when the signal is too short/degenerate."""
    import numpy as np

    x = np.asarray(block, dtype=np.float64)
    n = x.size
    if n <= max_order + 1:
        return None
    autoc = np.array(
        [np.dot(x[: n - lag], x[lag:]) for lag in range(max_order + 1)]
    )
    if autoc[0] <= 0:
        return None
    err = autoc[0]
    lpc = np.zeros(max_order)
    for i in range(max_order):
        acc = autoc[i + 1] - np.dot(lpc[:i], autoc[i::-1][:i])
        k = acc / err
        lpc[: i + 1] = np.concatenate([lpc[:i] - k * lpc[:i][::-1], [k]])
        err *= 1 - k * k
        if err <= 0:
            return None
    order = max_order
    precision = 12
    shift = 0
    cmax = np.abs(lpc).max()
    if cmax <= 0:
        return None
    # scale coefficients into `precision` signed bits
    while (cmax * (1 << (shift + 1))) < (1 << (precision - 1)) - 1 and shift < 15:
        shift += 1
    q = np.round(lpc * (1 << shift)).astype(np.int64)
    limit = (1 << (precision - 1)) - 1
    q = np.clip(q, -limit - 1, limit)
    if not q.any():
        return None
    return order, [int(c) for c in q], shift, precision


def _encode_subframe(
    w: _BitsW, block: list[int], bps: int, use_lpc: bool
) -> None:
    n = len(block)
    if all(v == block[0] for v in block):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(block[0] & ((1 << bps) - 1), bps)
        return

    candidates = []  # (cost_bits, kind, order, res, extra)
    max_fixed = min(4, n - 1)
    for order in range(max_fixed + 1):
        coeffs = FIXED_COEFFS[order]
        res = [
            block[i] - sum(c * block[i - j - 1] for j, c in enumerate(coeffs))
            for i in range(order, n)
        ]
        param, cost = _best_rice_param(res)
        total = order * bps + 2 + 4 + 4 + cost
        candidates.append((total, "fixed", order, res, (param,)))
    if use_lpc:
        lp = _lpc_analyze(block)
        if lp is not None:
            order, coeffs, shift, precision = lp
            if n > order:
                res = []
                for i in range(order, n):
                    acc = sum(
                        coeffs[j] * block[i - j - 1] for j in range(order)
                    )
                    res.append(block[i] - (acc >> shift))
                param, cost = _best_rice_param(res)
                total = (
                    order * bps + 4 + 5 + order * precision
                    + 2 + 4 + 4 + cost
                )
                candidates.append(
                    (total, "lpc", order, res, (param, coeffs, shift, precision))
                )
    verbatim_cost = n * bps
    best = min(candidates, key=lambda c: c[0])
    if best[0] >= verbatim_cost:
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for v in block:
            w.write(v & ((1 << bps) - 1), bps)
        return

    _, kind, order, res, extra = best
    w.write(0, 1)
    if kind == "fixed":
        (param,) = extra
        w.write(8 + order, 6)
        w.write(0, 1)  # no wasted bits
    else:
        param, coeffs, shift, precision = extra
        w.write(32 + order - 1, 6)
        w.write(0, 1)
    for i in range(order):  # warmup samples
        w.write(block[i] & ((1 << bps) - 1), bps)
    if kind == "lpc":
        w.write(precision - 1, 4)
        w.write(shift & 0x1F, 5)
        for c in coeffs:
            w.write(c & ((1 << precision) - 1), precision)
    w.write(0, 2)  # residual method RICE (4-bit params)
    w.write(0, 4)  # partition order 0
    w.write(param, 4)
    _write_rice(w, res, param)


def encode(
    samples,
    sample_rate: int = 8000,
    n_channels: int = 1,
    bits_per_sample: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "independent",
    use_lpc: bool = True,
) -> bytes:
    """Encode interleaved integer samples as a native FLAC stream —
    fixture writer mirroring audio.encode_wav's signature. Lossless:
    ``flac.decode(flac.encode(x))`` returns exactly ``x``.
    ``stereo_mode`` in {'independent', 'left_side', 'right_side',
    'mid_side'} (2-channel only) forces a decorrelation so tests cover
    every decoder path."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim != 1:
        raise ValueError("samples must be a flat interleaved array")
    if arr.size % n_channels:
        raise ValueError("sample count not divisible by channel count")
    lim = 1 << (bits_per_sample - 1)
    if arr.size and (arr.max() >= lim or arr.min() < -lim):
        raise ValueError(f"samples out of int{bits_per_sample} range")
    if stereo_mode != "independent" and n_channels != 2:
        raise ValueError("stereo decorrelation requires exactly 2 channels")
    if not 16 <= block_size <= 65536:
        # the frame header's blocksize field is 16 bits (value-1) and
        # the spec floor is 16; masking instead of validating would
        # emit an undecodable stream (CRC mismatch at the first frame)
        raise ValueError("block_size must be in 16..65536")
    frames = arr.reshape(-1, n_channels)
    n_total = frames.shape[0]
    if n_total == 0:
        raise ValueError("cannot encode an empty FLAC stream")

    out = bytearray(b"fLaC")
    si = _BitsW()
    # a final partial frame may be shorter than block_size; STREAMINFO
    # wants the smallest/largest frame sizes actually emitted (a tiny
    # fixture's single short frame can legally sit below the 16-sample
    # streamable-subset floor — the field is informational)
    last = n_total % block_size or block_size
    si.write(min(block_size, last, n_total), 16)
    si.write(block_size, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_channels - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(n_total, 36)
    body = bytes(si.out) + b"\x00" * 16  # MD5 unset (legal)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    chan_code = {
        "independent": n_channels - 1,
        "left_side": 8,
        "right_side": 9,
        "mid_side": 10,
    }.get(stereo_mode)
    if chan_code is None:
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")

    frame_no = 0
    for start in range(0, n_total, block_size):
        blk = frames[start : start + block_size]
        bs = blk.shape[0]
        w = _BitsW()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy; number = frame index
        w.write(7, 4)  # block size: 16-bit field - 1
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(chan_code, 4)
        w.write(0, 3)  # bits: from STREAMINFO
        w.write(0, 1)
        _write_utf8_number(w, frame_no)
        w.write(bs - 1, 16)
        w.align()
        header = bytes(w.out)
        w.write(_crc8(header), 8)

        if stereo_mode == "independent":
            subs = [(list(map(int, blk[:, ch])), bits_per_sample)
                    for ch in range(n_channels)]
        else:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            side = list(map(int, left - right))
            if stereo_mode == "left_side":
                subs = [(list(map(int, left)), bits_per_sample),
                        (side, bits_per_sample + 1)]
            elif stereo_mode == "right_side":
                subs = [(side, bits_per_sample + 1),
                        (list(map(int, right)), bits_per_sample)]
            else:
                mid = list(map(int, (left + right) >> 1))
                subs = [(mid, bits_per_sample), (side, bits_per_sample + 1)]
        for sub, bps in subs:
            _encode_subframe(w, sub, bps, use_lpc)
        w.align()
        frame = bytes(w.out)
        w.write(_crc16(frame), 16)
        out += w.out
        frame_no += 1
    return bytes(out)
