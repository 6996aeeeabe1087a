"""Dependency-free baseline JPEG (JFIF) codec — stdlib + numpy only.

Scope mirrors the PNG codec's posture (multimodal.py): decode the
format for real where a bounded amount of spec work covers the common
case, and reject everything else with a precise error instead of
silently corrupting. Coverage:

- decode: baseline sequential DCT (SOF0), extended sequential (SOF1)
  AND progressive (SOF2 — spectral selection + successive
  approximation, all four scan kinds of T.81 G.2 including EOB runs
  and AC correction bits), 8-bit samples, grayscale or 3-component
  YCbCr, any sampling-factor combination up to 4 (4:4:4, 4:2:2,
  4:2:0, ...), multiple DQT/DHT segments, restart intervals (DRI +
  RSTn), stuffed 0xFF00 bytes. Huffman + quantization tables are read
  FROM THE STREAM, so decode does not depend on the encoder having
  used the Annex K defaults.
- rejected clearly: arithmetic coding, 12-bit precision,
  CMYK/4-component scans, partial-component interleaves —
  ``ValueError`` naming the feature (callers may fall back to pillow
  when installed; see multimodal.decode_jpeg).
- encode (fixture writer + resize sink): 8-bit grayscale or RGB,
  quality 1..100 via the IJG scaling of the Annex K tables, optional
  2x2 chroma subsampling (4:2:0), restart-free single scan; plus
  ``encode_progressive`` emitting a libjpeg-style scan script (DC
  first/refine interleaved, per-component AC band first/refine) with
  coefficients identical to the sequential encode — progressive decode
  output is therefore bit-identical to sequential decode, which is
  what makes the round-trip tests exact.

Determinism contract (shared with the SQL value-hash oracle): every
"round to nearest" in the pixel path is floor(x + 0.5) — numpy's
rint would round half-to-even while DuckDB rounds half-away, and the
oracle replicates the color math exactly.

Performance posture: the entropy-coded layer is sequential bit-level
work (a Python loop — there is no vectorizing a Huffman stream), but
it is O(bytes) per payload with zero allocation growth; everything
after it (dequantize, IDCT, upsample, color convert) is whole-image
numpy. Parallelism at engine level is per-payload via the Arrow-
batched mapInPandas in multimodal.extract_features — 100 TB of JPEGs
scale by partitioning payloads, never by one big decode.

Reference: ITU-T T.81 (the public JPEG spec); table constants from
Annex K. No reference-repo counterpart — sparker has no multimodal
surface; this extends the engine per the training-data-pipeline brief.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------- tables

# zigzag scan order: ZIGZAG[i] = (row, col) linear index of the i-th
# coefficient in scan order (T.81 Figure A.6)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1/K.2 quantization tables (luminance, chrominance)
QUANT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROM = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 "typical" Huffman tables as (bits[1..16], symbols).
# The DECODER never uses these — it builds tables from DHT segments —
# so encode/decode stay self-consistent even against other encoders'
# custom tables.
HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix():
    """8x8 orthonormal DCT-II matrix A with A[u, x] =
    C(u)/2 * cos((2x+1)*u*pi/16); forward F = A f A^T, inverse
    f = A^T F A. Cached — decode cost is dominated by the bit layer."""
    import numpy as np

    global _DCT_A
    if _DCT_A is None:
        x = np.arange(8)
        u = np.arange(8).reshape(-1, 1)
        a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
        a[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
        _DCT_A = a
    return _DCT_A


_DCT_A = None


def _round_half_up(arr):
    """floor(x + 0.5) elementwise — the codec's single rounding rule
    (see module docstring: np.rint is half-to-even, the SQL oracle is
    not)."""
    import numpy as np

    return np.floor(arr + 0.5)


# ---------------------------------------------------------------- decode


class _HuffTable:
    """Canonical Huffman decode table from a DHT (bits, symbols) spec.

    Lookup is (length, code)->symbol over at most 16 steps per symbol —
    a dict probe per extra bit. Fine for the payload sizes a features
    column carries; the numpy stages downstream are the wide part.
    """

    __slots__ = ("lookup", "maxlen")

    def __init__(self, bits, symbols):
        self.lookup = {}
        code = 0
        idx = 0
        self.maxlen = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if idx >= len(symbols):
                    raise ValueError("bad DHT: more codes than symbols")
                self.lookup[(length, code)] = symbols[idx]
                idx += 1
                code += 1
                self.maxlen = length
            code <<= 1
        if idx != len(symbols):
            raise ValueError("bad DHT: symbol count mismatch")


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; surfaces restart markers to the caller."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream (FF at end)")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif nxt == 0xD9:  # EOI reached while caller expected bits
                raise ValueError("truncated JPEG entropy stream (early EOI)")
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                )
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        out = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return out

    def huff_decode(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bits(1)
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def restart(self, expected: int):
        """Byte-align and consume the RSTn marker at a restart
        boundary."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + expected
        ):
            raise ValueError(
                f"missing restart marker RST{expected} at byte {self.pos}"
            )
        self.pos += 2


def _receive_extend(reader: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = reader.read_bits(s)
    if v < (1 << (s - 1)):  # negative branch (T.81 F.12 EXTEND)
        v -= (1 << s) - 1
    return v


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "pred", "blocks",
                 "blocks_x", "blocks_y", "nx", "ny")

    def __init__(self, cid, h, v, tq):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.pred = 0


def decode(payload: bytes):
    """Decode a baseline JPEG -> (height, width, channels) uint8 array
    (channels 1 for grayscale, 3 for RGB after YCbCr conversion).

    Every malformed-payload failure surfaces as ValueError: segment
    bodies shorter than the fields parsed out of them raise
    struct.error deep in the parse, which would otherwise escape the
    callers' documented ValueError contract (multimodal.decode_jpeg
    routes ValueError to the pillow fallback / clean capability
    error)."""
    try:
        return _decode_impl(payload)
    except struct.error as exc:
        raise ValueError(f"truncated JPEG segment ({exc})") from exc


def _decode_scan_sequential(
    reader, comps, huff_dc, huff_ac, mcus_x, mcus_y, restart_interval
):
    """Baseline/extended sequential scan: one MCU-interleaved pass
    carrying DC diff + all 63 AC coefficients per block (T.81 F.2)."""
    for c in comps:
        c.pred = 0
    rst = 0
    mcu_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                reader.restart(rst)
                rst = (rst + 1) & 7
                for c in comps:
                    c.pred = 0
            for c in comps:
                dc_tbl = huff_dc.get(c.td)
                ac_tbl = huff_ac.get(c.ta)
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("scan references missing Huffman table")
                for by in range(c.v):
                    for bx in range(c.h):
                        blk = c.blocks[
                            (my * c.v + by) * c.blocks_x + mx * c.h + bx
                        ]
                        t = reader.huff_decode(dc_tbl)
                        c.pred += _receive_extend(reader, t)
                        blk[0] = c.pred
                        k = 1
                        while k <= 63:
                            rs = reader.huff_decode(ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "AC coefficient index overflow"
                                )
                            blk[ZIGZAG[k]] = _receive_extend(reader, s)
                            k += 1
            mcu_idx += 1


def _prog_dc_first(reader, blk, comp, dc_tbl, al):
    t = reader.huff_decode(dc_tbl)
    comp.pred += _receive_extend(reader, t)
    blk[0] = comp.pred << al


def _prog_dc_refine(reader, blk, al):
    if reader.read_bits(1):
        blk[0] |= 1 << al


def _prog_ac_first(reader, blk, ac_tbl, ss, se, al, eobrun):
    """First AC scan of a band (T.81 G.1.2.2): run/size coding of the
    point-transformed coefficients plus EOB-run (EOBn) codes. Returns
    the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.huff_decode(ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1  # current block ends now
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC coefficient index overflow in band")
        blk[ZIGZAG[k]] = _receive_extend(reader, s) << al
        k += 1
    return eobrun


def _prog_ac_refine(reader, blk, ac_tbl, ss, se, al, eobrun):
    """AC refinement scan (T.81 G.1.2.3): one correction bit per
    already-nonzero coefficient, run/sign codes for newly significant
    ones, EOB runs carrying correction bits. Returns the remaining
    EOB run."""
    p1 = 1 << al
    m1 = -p1

    def correct(z):
        # correction bit for a history-nonzero coefficient: move its
        # magnitude toward the true value if the bit says so and the
        # bit at this approximation level is still 0
        if reader.read_bits(1) and not (blk[z] & p1):
            blk[z] += p1 if blk[z] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.huff_decode(ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                val = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError(
                        "invalid newly-significant magnitude in AC "
                        "refinement scan"
                    )
                val = p1 if reader.read_bits(1) else m1
            # advance over r zero-history coefficients, emitting
            # correction bits for nonzero-history ones passed over
            while k <= se:
                z = ZIGZAG[k]
                if blk[z] != 0:
                    correct(z)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        # the block that terminated with an EOB code (and every block
        # inside the run) still carries correction bits for its
        # remaining nonzero-history coefficients
        while k <= se:
            z = ZIGZAG[k]
            if blk[z] != 0:
                correct(z)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan_progressive(
    reader, comps, scan_comps, huff_dc, huff_ac,
    mcus_x, mcus_y, restart_interval, ss, se, ah, al,
):
    """One progressive scan (T.81 G.2): DC scans may be interleaved
    (MCU order over all components); AC scans are single-component and
    walk the component's own block raster. Coefficients accumulate
    across scans in each component's ``blocks`` array."""
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("progressive scan mixes DC and AC (Ss=0, Se>0)")
    # range-check the band BEFORE decoding: entropy data can push k to
    # Se via ZRL runs, and an out-of-range Se would otherwise surface
    # as an IndexError into ZIGZAG instead of the documented ValueError
    # (which callers route to the pillow fallback)
    if not 0 <= ss <= se <= 63:
        raise ValueError(
            f"invalid progressive spectral selection Ss={ss} Se={se}"
        )
    if not is_dc and len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if al > 13 or ah > 14:
        raise ValueError(
            f"invalid successive-approximation shift Ah={ah} Al={al}"
        )
    for c in scan_comps:
        c.pred = 0
    eobrun = 0
    rst = 0
    unit_idx = 0

    def at_restart_boundary():
        nonlocal rst, eobrun
        reader.restart(rst)
        rst = (rst + 1) & 7
        eobrun = 0
        for c in scan_comps:
            c.pred = 0

    if is_dc and len(scan_comps) > 1:
        if len(scan_comps) != len(comps):
            raise ValueError(
                "partial-component interleaved progressive scan not "
                "supported"
            )
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if (
                    restart_interval
                    and unit_idx
                    and unit_idx % restart_interval == 0
                ):
                    at_restart_boundary()
                for c in scan_comps:
                    if ah == 0:
                        dc_tbl = huff_dc.get(c.td)
                        if dc_tbl is None:
                            raise ValueError(
                                "scan references missing Huffman table"
                            )
                    for by in range(c.v):
                        for bx in range(c.h):
                            blk = c.blocks[
                                (my * c.v + by) * c.blocks_x + mx * c.h + bx
                            ]
                            if ah == 0:
                                _prog_dc_first(reader, blk, c, dc_tbl, al)
                            else:
                                _prog_dc_refine(reader, blk, al)
                unit_idx += 1
        return

    # single-component scan (all AC scans; DC scans with ns=1): walk
    # the component's own block raster — NOT the MCU-padded grid
    c = scan_comps[0]
    dc_tbl = huff_dc.get(c.td) if is_dc and ah == 0 else None
    ac_tbl = huff_ac.get(c.ta) if not is_dc else None
    if is_dc and ah == 0 and dc_tbl is None:
        raise ValueError("scan references missing Huffman table")
    if not is_dc and ac_tbl is None:
        raise ValueError("scan references missing Huffman table")
    for by in range(c.ny):
        for bx in range(c.nx):
            if (
                restart_interval
                and unit_idx
                and unit_idx % restart_interval == 0
            ):
                at_restart_boundary()
            blk = c.blocks[by * c.blocks_x + bx]
            if is_dc:
                if ah == 0:
                    _prog_dc_first(reader, blk, c, dc_tbl, al)
                else:
                    _prog_dc_refine(reader, blk, al)
            elif ah == 0:
                eobrun = _prog_ac_first(
                    reader, blk, ac_tbl, ss, se, al, eobrun
                )
            else:
                eobrun = _prog_ac_refine(
                    reader, blk, ac_tbl, ss, se, al, eobrun
                )
            unit_idx += 1


def _scan_end(payload: bytes, pos: int) -> int:
    """End of the entropy-coded data that starts at ``pos``: the offset
    of the first marker that is not a stuffed byte (FF00) or a restart
    marker (FFD0-FFD7). Needed for multi-scan (progressive) files,
    where more segments follow the scan.

    ``bytes.find`` hops between 0xFF positions at C speed — a Python-
    level loop over every byte would make this pre-pass rival the
    entropy decode itself on large scans (this runs once per scan,
    including the single baseline one)."""
    i = pos
    n = len(payload)
    while True:
        i = payload.find(0xFF, i)
        if i < 0 or i + 1 >= n:
            return n
        nxt = payload[i + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            i += 2
            continue
        return i


def _decode_impl(payload: bytes):
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    quant: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    comps: list[_Component] = []
    width = height = 0
    restart_interval = 0
    pos = 2
    progressive = False
    blocks_ready = False
    n_scans = 0
    mcus_x = mcus_y = 0

    def _alloc_blocks():
        nonlocal blocks_ready, mcus_x, mcus_y
        hmax = max(c.h for c in comps)
        vmax = max(c.v for c in comps)
        # replication upsampling (plane.repeat below) requires every
        # component factor to divide the max — T.81 permits layouts
        # like h=(3,2,1) that don't, and floor-division repeats would
        # then produce mismatched plane shapes and an opaque numpy
        # error
        for c in comps:
            if hmax % c.h or vmax % c.v:
                raise ValueError(
                    "unsupported JPEG sampling-factor layout h="
                    f"{[x.h for x in comps]} v={[x.v for x in comps]}: "
                    "factors must divide the max (pillow can decode these)"
                )
        mcus_x = -(-width // (8 * hmax))
        mcus_y = -(-height // (8 * vmax))
        for c in comps:
            c.blocks_x = mcus_x * c.h
            c.blocks_y = mcus_y * c.v
            # non-interleaved (single-component) scans cover only the
            # blocks of the component's own sample area (T.81 A.2.2),
            # which can be smaller than the MCU-padded grid
            comp_w = -(-width * c.h // hmax)  # ceil(width·h/hmax)
            comp_h = -(-height * c.v // vmax)
            c.nx = -(-comp_w // 8)
            c.ny = -(-comp_h // 8)
            c.blocks = np.zeros((c.blocks_y * c.blocks_x, 64), dtype=np.int32)
            c.pred = 0
        blocks_ready = True

    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede the
        # marker code — skip them rather than parsing 0xFF as a sized
        # segment (which would consume two payload bytes as a bogus
        # length and desynchronize the scan)
        while payload[pos + 1] == 0xFF:
            pos += 1
            if pos + 2 > len(payload):
                raise ValueError("truncated JPEG: fill bytes run to EOF")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI/RSTn: no body
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment header")
        (size,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + size]
        if len(body) != size - 2:
            raise ValueError("truncated JPEG segment body")
        pos += size

        if marker == 0xDB:  # DQT — one or more tables per segment
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                off += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        body[off : off + 64], dtype=np.uint8
                    ).astype(np.float64)
                    off += 64
                elif pq == 1:
                    tbl = np.frombuffer(
                        body[off : off + 128], dtype=">u2"
                    ).astype(np.float64)
                    off += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                if len(tbl) != 64:
                    raise ValueError("truncated DQT table")
                dq = np.empty(64)
                dq[ZIGZAG] = tbl  # de-zigzag into natural order
                quant[tq] = dq.reshape(8, 8)
        elif marker == 0xC4:  # DHT — one or more tables per segment
            off = 0
            while off + 17 <= len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                symbols = list(body[off + 17 : off + 17 + n])
                if len(symbols) != n:
                    raise ValueError("truncated DHT table")
                off += 17 + n
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(
                    bits, symbols
                )
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 prog
            progressive = marker == 0xC2
            prec = body[0]
            if prec != 8:
                raise ValueError(f"unsupported JPEG sample precision {prec}")
            height, width = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError(
                    f"unsupported JPEG component count {ncomp} "
                    "(grayscale and YCbCr only; no CMYK)"
                )
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(_Component(cid, hv >> 4, hv & 0x0F, tq))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("SOS before SOF")
            if width == 0 or height == 0:
                raise ValueError("JPEG declares zero dimension")
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                comp = next((c for c in comps if c.cid == cs), None)
                if comp is None:
                    raise ValueError(f"SOS references unknown component {cs}")
                comp.td, comp.ta = tdta >> 4, tdta & 0x0F
                scan_comps.append(comp)
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not blocks_ready:
                _alloc_blocks()
            end = _scan_end(payload, pos)
            reader = _BitReader(payload[pos:end])
            if progressive:
                _decode_scan_progressive(
                    reader, comps, scan_comps, huff_dc, huff_ac,
                    mcus_x, mcus_y, restart_interval, ss, se, ah, al,
                )
            else:
                if n_scans:
                    raise ValueError(
                        "multi-scan sequential JPEG not supported "
                        "(baseline single scan only)"
                    )
                if len(scan_comps) != len(comps):
                    raise ValueError(
                        "partial-component sequential scan not supported"
                    )
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError(
                        "sequential JPEG scan with non-baseline spectral/"
                        "approximation parameters"
                    )
                _decode_scan_sequential(
                    reader, comps, huff_dc, huff_ac, mcus_x, mcus_y,
                    restart_interval,
                )
            n_scans += 1
            pos = end
        # APPn / COM / anything else: skipped

    if not comps or n_scans == 0:
        raise ValueError("JPEG missing SOF or SOS")
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)

    # dequantize + IDCT, vectorized across every block of a component
    a = _dct_matrix()
    planes = []
    for c in comps:
        q = quant.get(c.tq)
        if q is None:
            raise ValueError(f"component references missing DQT {c.tq}")
        coefs = c.blocks.reshape(-1, 8, 8).astype(np.float64) * q
        pix = np.einsum("ux,nuv,vy->nxy", a, coefs, a) + 128.0
        pix = np.clip(_round_half_up(pix), 0, 255)
        plane = (
            pix.reshape(c.blocks_y, c.blocks_x, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c.blocks_y * 8, c.blocks_x * 8)
        )
        # upsample to full resolution by sample replication, then crop
        plane = plane.repeat(vmax // c.v, axis=0).repeat(hmax // c.h, axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        return planes[0].astype(np.uint8)[..., None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encode


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def _encode_codes(bits, symbols):
    """symbol -> (code, length) canonical assignment (encoder side)."""
    codes = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[symbols[idx]] = (code, length)
            idx += 1
            code += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) for EXTEND-coded value v."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, v if v >= 0 else v + (1 << s) - 1


def _scale_quant(base, quality: int):
    import numpy as np

    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    tbl = np.array(base, dtype=np.int64)  # natural (raster) order
    tbl = np.clip((tbl * scale + 50) // 100, 1, 255)
    return tbl.astype(np.float64).reshape(8, 8)


def _encode_blocks(plane, q):
    """plane (H8, W8) float64 (already level-shifted) -> (n, 64) int32
    quantized coefficients in natural order."""
    import numpy as np

    a = _dct_matrix()
    h8, w8 = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        plane.reshape(h8, 8, w8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coefs = np.einsum("ux,nxy,yv->nuv", a, blocks, a.T)
    # round-half-away on magnitude, matching sign symmetry
    qd = coefs / q
    return (np.sign(qd) * np.floor(np.abs(qd) + 0.5)).astype(np.int32).reshape(
        -1, 64
    )


def _pad_plane(plane, bh: int, bw: int):
    """Edge-replicate pad to multiples of (bh, bw)."""
    import numpy as np

    h, w = plane.shape
    ph = (-h) % bh
    pw = (-w) % bw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode(
    img, quality: int = 90, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """Encode an (H, W) or (H, W, 1) grayscale or (H, W, 3) RGB uint8
    array as a baseline JFIF JPEG. ``subsample=True`` writes 4:2:0
    (2x2 chroma decimation by mean); default is 4:4:4.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (resettable decode — what a parallel decoder keys
    on)."""
    (
        comp_blocks, factors, qids, q_lum, q_chr, gray, h, w,
        mcus_x, mcus_y,
    ) = _prepare_planes(img, quality, subsample)

    # ---- container
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0, no thumbnail

    def dqt(tid, base):
        zz = bytes(int(base.reshape(64)[ZIGZAG[i]]) for i in range(64))
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz

    out += dqt(0, q_lum)
    if not gray:
        out += dqt(1, q_chr)

    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        fh, fv = factors[i]
        sof += bytes([i + 1, (fh << 4) | fv, qids[i]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc, th, table):
        bits, symbols = table
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(symbols)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, HUFF_DC_LUM) + dht(1, 0, HUFF_AC_LUM)
    if not gray:
        out += dht(0, 1, HUFF_DC_CHROM) + dht(1, 1, HUFF_AC_CHROM)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    sos = bytes([ncomp])
    for i in range(ncomp):
        tid = 0 if i == 0 else 1
        sos += bytes([i + 1, (tid << 4) | tid])
    sos += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # ---- entropy-coded scan, MCU-interleaved
    dc_codes = [_encode_codes(*HUFF_DC_LUM)] + (
        [] if gray else [_encode_codes(*HUFF_DC_CHROM)] * 2
    )
    ac_codes = [_encode_codes(*HUFF_AC_LUM)] + (
        [] if gray else [_encode_codes(*HUFF_AC_CHROM)] * 2
    )
    writer = _BitWriter()
    preds = [0] * ncomp
    mcu_idx = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                writer.flush()
                out += writer.out
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                writer = _BitWriter()
                preds = [0] * ncomp
            mcu_idx += 1
            for ci in range(ncomp):
                fh, fv = factors[ci]
                bw_ = mcus_x * fh
                for by in range(fv):
                    for bx in range(fh):
                        blk = comp_blocks[ci][
                            (my * fv + by) * bw_ + mx * fh + bx
                        ]
                        diff = int(blk[0]) - preds[ci]
                        preds[ci] = int(blk[0])
                        s, raw = _magnitude(diff)
                        code, length = dc_codes[ci][s]
                        writer.write(code, length)
                        if s:
                            writer.write(raw, s)
                        run = 0
                        for k in range(1, 64):
                            v = int(blk[ZIGZAG[k]])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, length = ac_codes[ci][0xF0]  # ZRL
                                writer.write(code, length)
                                run -= 16
                            s, raw = _magnitude(v)
                            code, length = ac_codes[ci][(run << 4) | s]
                            writer.write(code, length)
                            writer.write(raw, s)
                            run = 0
                        if run:
                            code, length = ac_codes[ci][0x00]  # EOB
                            writer.write(code, length)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _prepare_planes(img, quality: int, subsample: bool):
    """Shared encoder front half: color convert / subsample / block DCT.
    Returns (comp_blocks, factors, qids, q_lum, q_chr, gray, h, w)."""
    import numpy as np

    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None]
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("encode expects (H,W[,1|3]) uint8")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot encode empty image")
    gray = img.shape[2] == 1
    fimg = img.astype(np.float64)
    q_lum = _scale_quant(QUANT_LUM, quality)
    q_chr = _scale_quant(QUANT_CHROM, quality)
    if gray:
        planes = [fimg[..., 0]]
        factors = [(1, 1)]
        qtabs = [q_lum]
        qids = [0]
    else:
        r, g, b = fimg[..., 0], fimg[..., 1], fimg[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        y, cb, cr = (
            np.clip(_round_half_up(p), 0, 255) for p in (y, cb, cr)
        )
        if subsample:
            cbp = _pad_plane(cb, 2, 2)
            crp = _pad_plane(cr, 2, 2)
            cb = _round_half_up(
                cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2)
                .mean(axis=(1, 3))
            )
            cr = _round_half_up(
                crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2)
                .mean(axis=(1, 3))
            )
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            factors = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qtabs = [q_lum, q_chr, q_chr]
        qids = [0, 1, 1]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    comp_blocks = []
    for plane, (fh, fv), qt in zip(planes, factors, qtabs):
        target_h = mcus_y * fv * 8
        target_w = mcus_x * fh * 8
        p = np.pad(
            plane,
            ((0, target_h - plane.shape[0]), (0, target_w - plane.shape[1])),
            mode="edge",
        )
        comp_blocks.append(_encode_blocks(p - 128.0, qt))
    return comp_blocks, factors, qids, q_lum, q_chr, gray, h, w, mcus_x, mcus_y


def encode_progressive(
    img, quality: int = 90, subsample: bool = False,
    dc_al: int = 1, ac_al: int = 1, ac_split: int = 5,
) -> bytes:
    """Encode a progressive (SOF2) JFIF JPEG — the fixture writer for
    the progressive decode path, emitting all four scan kinds a real
    web JPEG uses (libjpeg-style scan script):

      1. DC first, interleaved, successive approximation Al=``dc_al``
      2. DC refinement scan(s) down to Al=0
      3. per component: AC first scans for the two spectral bands
         (1..``ac_split``, ``ac_split``+1..63) at Al=``ac_al``
      4. per component: AC refinement scans for both bands down to Al=0

    Coefficient data is identical to :func:`encode` at the same
    quality — progressive only reorders the bits — so decode output is
    bit-identical to the sequential file's."""
    (
        comp_blocks, factors, qids, q_lum, q_chr, gray, h, w,
        mcus_x, mcus_y,
    ) = _prepare_planes(img, quality, subsample)
    ncomp = len(comp_blocks)
    if not (0 <= dc_al <= 13 and 0 <= ac_al <= 13):
        raise ValueError("successive-approximation shifts must be in 0..13")
    if not 1 <= ac_split <= 63:
        raise ValueError("ac_split must be in 1..63")

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"

    def dqt(tid, base):
        zz = bytes(int(base.reshape(64)[ZIGZAG[i]]) for i in range(64))
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz

    out += dqt(0, q_lum)
    if not gray:
        out += dqt(1, q_chr)

    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        fh, fv = factors[i]
        sof += bytes([i + 1, (fh << 4) | fv, qids[i]])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2

    def dht(tc, th, table):
        bits, symbols = table
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(symbols)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, HUFF_DC_LUM) + dht(1, 0, HUFF_AC_LUM)
    if not gray:
        out += dht(0, 1, HUFF_DC_CHROM) + dht(1, 1, HUFF_AC_CHROM)

    dc_codes = [_encode_codes(*HUFF_DC_LUM)] + (
        [] if gray else [_encode_codes(*HUFF_DC_CHROM)] * 2
    )
    ac_codes = [_encode_codes(*HUFF_AC_LUM)] + (
        [] if gray else [_encode_codes(*HUFF_AC_CHROM)] * 2
    )

    def sos_header(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            tid = 0 if ci == 0 else 1
            body += bytes([ci + 1, (tid << 4) | tid])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    # non-interleaved geometry per component (see decoder _alloc_blocks)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    geo = []
    for i in range(ncomp):
        fh, fv = factors[i]
        comp_w = -(-w * fh // hmax)
        comp_h = -(-h * fv // vmax)
        geo.append((-(-comp_w // 8), -(-comp_h // 8), mcus_x * fh))

    # ---- scan 1: DC first, interleaved, shift dc_al
    out += sos_header(list(range(ncomp)), 0, 0, 0, dc_al)
    writer = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                fh, fv = factors[ci]
                bw_ = mcus_x * fh
                for by in range(fv):
                    for bx in range(fh):
                        blk = comp_blocks[ci][
                            (my * fv + by) * bw_ + mx * fh + bx
                        ]
                        v = int(blk[0]) >> dc_al  # arithmetic shift
                        diff = v - preds[ci]
                        preds[ci] = v
                        s, raw = _magnitude(diff)
                        code, length = dc_codes[ci][s]
                        writer.write(code, length)
                        if s:
                            writer.write(raw, s)
    writer.flush()
    out += writer.out

    # ---- DC refinement scans, Al = dc_al-1 .. 0 (one raw bit/block)
    for al in range(dc_al - 1, -1, -1):
        out += sos_header(list(range(ncomp)), 0, 0, al + 1, al)
        writer = _BitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomp):
                    fh, fv = factors[ci]
                    bw_ = mcus_x * fh
                    for by in range(fv):
                        for bx in range(fh):
                            blk = comp_blocks[ci][
                                (my * fv + by) * bw_ + mx * fh + bx
                            ]
                            writer.write((int(blk[0]) >> al) & 1, 1)
        writer.flush()
        out += writer.out

    bands = [(1, ac_split), (ac_split + 1, 63)] if ac_split < 63 else [(1, 63)]

    # ---- AC first scans (per component, per band) at shift ac_al
    for ci in range(ncomp):
        nx, ny, stride = geo[ci]
        for ss, se in bands:
            out += sos_header([ci], ss, se, 0, ac_al)
            writer = _BitWriter()
            for by in range(ny):
                for bx in range(nx):
                    blk = comp_blocks[ci][by * stride + bx]
                    run = 0
                    for k in range(ss, se + 1):
                        v = int(blk[ZIGZAG[k]])
                        v = (abs(v) >> ac_al) * (1 if v >= 0 else -1)
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, length = ac_codes[ci][0xF0]  # ZRL
                            writer.write(code, length)
                            run -= 16
                        s, raw = _magnitude(v)
                        code, length = ac_codes[ci][(run << 4) | s]
                        writer.write(code, length)
                        writer.write(raw, s)
                        run = 0
                    if run:
                        code, length = ac_codes[ci][0x00]  # EOB (run 1)
                        writer.write(code, length)
            writer.flush()
            out += writer.out

    # ---- AC refinement scans, Al = ac_al-1 .. 0
    for al in range(ac_al - 1, -1, -1):
        for ci in range(ncomp):
            nx, ny, stride = geo[ci]
            for ss, se in bands:
                out += sos_header([ci], ss, se, al + 1, al)
                writer = _BitWriter()
                for by in range(ny):
                    for bx in range(nx):
                        blk = comp_blocks[ci][by * stride + bx]
                        # T.81 G.1.2.3 encoder: runs count zero-HISTORY
                        # positions; correction bits for already-
                        # significant coefficients buffer until the
                        # next emitted code
                        absval = {}
                        for k in range(ss, se + 1):
                            absval[k] = abs(int(blk[ZIGZAG[k]])) >> al
                        eob = 0  # last newly-significant index
                        for k in range(ss, se + 1):
                            if absval[k] == 1:
                                eob = k
                        run = 0
                        buffered = []
                        for k in range(ss, se + 1):
                            t = absval[k]
                            if t == 0:
                                run += 1
                                continue
                            while run > 15 and k <= eob:
                                code, length = ac_codes[ci][0xF0]
                                writer.write(code, length)
                                run -= 16
                                for bit in buffered:
                                    writer.write(bit, 1)
                                buffered = []
                            if t > 1:  # already significant: buffer bit
                                buffered.append(t & 1)
                                continue
                            # newly significant: (run, 1) + sign bit
                            code, length = ac_codes[ci][(run << 4) | 1]
                            writer.write(code, length)
                            writer.write(
                                1 if int(blk[ZIGZAG[k]]) >= 0 else 0, 1
                            )
                            run = 0
                            for bit in buffered:
                                writer.write(bit, 1)
                            buffered = []
                        if run or buffered:
                            code, length = ac_codes[ci][0x00]  # EOB run 1
                            writer.write(code, length)
                            for bit in buffered:
                                writer.write(bit, 1)
                writer.flush()
                out += writer.out

    out += b"\xff\xd9"
    return bytes(out)
