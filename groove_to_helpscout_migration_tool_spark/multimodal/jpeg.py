"""Baseline JPEG codec, pure numpy/stdlib -- no codec library.

Closes the last fake image path (multimodal/decode.py resize chain):
BMP/PNG/GIF pixel codecs were already real; JPEG pixels were a declared
deterministic fake because the environment has no image libraries. This
module implements the baseline sequential DCT process of ITU-T T.81
(public spec) end to end:

  encode_jpeg: 8x8 forward DCT -> quantize -> zigzag -> DC-diff +
    run-length AC -> canonical Huffman (Annex K luminance tables) with
    0xFF byte stuffing. Components are written 4:4:4 with ids R/G/B
    (0x52/0x47/0x42) and ALL-ONES quantization tables, which makes the
    codec EXACTLY lossless on solid-color blocks (only the DC
    coefficient survives, and quant step 1 preserves it) -- the property
    the closed-form resize oracle relies on, the same way the PNG/GIF
    fixtures do. No color transform (RGB component ids are the
    documented libjpeg convention for RGB JPEGs), so there is no
    YCbCr double-rounding to predict in SQL.

  parse_jpeg_pixels: full baseline decoder -- segment walk (DQT/SOF0/
    DHT/SOS/DRI), canonical Huffman decode with byte-unstuffing and
    restart-marker handling, dequantize, de-zigzag, float IDCT, level
    shift. Handles grayscale, RGB-component-id, and standard YCbCr
    4:4:4 streams (BT.601 inverse transform); subsampled (4:2:0 etc.)
    and progressive (SOF2) streams return None -- the caller's
    declared-unsupported path, exactly how the other parsers reject
    foreign containers.

Reference behavior note: the migration tool reads attachment bytes and
sniffs MIME from the buffer (TicketProcessor.php:295-298); pixel-level
work is this repo's LLM-pipeline extension surface.
"""

from __future__ import annotations

import numpy as np

# zigzag scan order of T.81 Figure A.6 (index = row*8 + col)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.3.3 "typical" luminance Huffman tables (public constants).
# Both encoder and decoder derive canonical codes from (bits, symbols),
# and the decoder reads them from the stream's own DHT -- internal
# consistency does not depend on these matching any other library.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_SYMS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_SYMS = [
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
]

# orthonormal 8-point DCT-II matrix: forward C = M @ B @ M.T, inverse
# B = M.T @ C @ M
_M = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _M[_k, _n] = 0.5 * (np.sqrt(0.5) if _k == 0 else 1.0) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16
        )


def _canonical_codes(bits: list[int], syms: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical assignment of T.81 C.2."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[syms[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


_FAST_TABLES: dict[bytes, list[int]] = {}


def _fast_table(bits: list[int], syms: list[int]) -> list[int]:
    """65536-entry lookup: 16-bit window -> (symbol << 5) | code length.

    One list index replaces up to 16 per-bit dict probes per symbol --
    the classic table-driven Huffman decode. Entry 0 = invalid code.
    Tables are cached by their DHT payload (the same Annex K tables
    recur across every frame of a corpus)."""
    key = bytes(bits) + bytes(syms)
    cached = _FAST_TABLES.get(key)
    if cached is not None:
        return cached
    table = [0] * 65536
    for sym, (code, length) in _canonical_codes(bits, syms).items():
        base = code << (16 - length)
        entry = (sym << 5) | length
        for suffix in range(1 << (16 - length)):
            table[base + suffix] = entry
    _FAST_TABLES[key] = table
    return table


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per F.1.2.3
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, raw bits) encoding of a coefficient per F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(v if v > 0 else -v).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(
    block: np.ndarray, dc_prev: int, w: _BitWriter,
    dc_codes: dict, ac_codes: dict,
) -> int:
    """DCT -> quant(1) -> zigzag -> Huffman one 8x8 block; returns DC."""
    coeffs = _M @ (block.astype(np.float64) - 128.0) @ _M.T
    q = np.rint(coeffs).astype(np.int64).reshape(64)[ZIGZAG]
    dc = int(q[0])
    size, bits = _magnitude(dc - dc_prev)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = 0
    for i in range(1, 64):
        if q[i] != 0:
            last_nz = i
    for i in range(1, last_nz + 1):
        if q[i] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL: 16 zeros
            w.write(code, length)
            run -= 16
        size, bits = _magnitude(int(q[i]))
        code, length = ac_codes[(run << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        run = 0
    if last_nz != 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return dc


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """(h, w, 3) BGR uint8 -> baseline JPEG bytes (4:4:4, RGB component
    ids, all-ones quant => solid-color blocks round-trip exactly)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    # channel planes in R, G, B order (component ids 'R','G','B')
    planes = [px[:, :, 2], px[:, :, 1], px[:, :, 0]]
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = []
    for p in planes:
        pp = np.empty((ph, pw), dtype=np.uint8)
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1 : h, :]  # edge-replicate pad
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)

    dc_codes = _canonical_codes(DC_BITS, DC_SYMS)
    ac_codes = _canonical_codes(AC_BITS, AC_SYMS)
    bw = _BitWriter()
    dc_prev = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for c in range(3):
                dc_prev[c] = _encode_block(
                    padded[c][by : by + 8, bx : bx + 8],
                    dc_prev[c], bw, dc_codes, ac_codes,
                )
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    dqt = seg(0xDB, bytes([0]) + bytes([1] * 64))  # table 0, all ones
    sof = seg(
        0xC0,
        bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([3])
        + bytes([0x52, 0x11, 0])  # 'R', 1x1 sampling, quant table 0
        + bytes([0x47, 0x11, 0])
        + bytes([0x42, 0x11, 0]),
    )
    dht = seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_SYMS)) + seg(
        0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_SYMS)
    )
    sos = seg(
        0xDA,
        bytes([3])
        + bytes([0x52, 0x00, 0x47, 0x00, 0x42, 0x00])  # all -> DC0/AC0
        + bytes([0, 63, 0]),
    )
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        # drop already-consumed high bits: without this mask acc grows into
        # a bignum spanning the whole scan and every << 8 costs O(scan),
        # turning decode quadratic on real-sized photos (ADVICE r4)
        self.acc &= (1 << self.nbits) - 1
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF  # pad past end (F.2.2.5)
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2  # stuffed 0xFF data byte
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: caller resyncs
                else:
                    break  # EOI / next segment
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                raise ValueError("jpeg: out of entropy data")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def peek16(self) -> int:
        """Next 16 bits without consuming (1-padded past stream end)."""
        if self.nbits < 16:
            self._fill()
            if self.nbits < 16:
                # pad with 1s (F.2.2.5) without consuming real data
                pad = 16 - self.nbits
                return ((self.acc << pad) | ((1 << pad) - 1)) & 0xFFFF
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def consume(self, n: int) -> None:
        if self.nbits < n:
            self._fill()
            if self.nbits < n:
                raise ValueError("jpeg: out of entropy data")
        self.nbits -= n

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        if self.nbits >= n:
            self.nbits -= n
            return (self.acc >> self.nbits) & ((1 << n) - 1)
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def resync(self) -> None:
        """Drop to the next restart marker boundary (DRI streams)."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _read_huff(br: _BitReader, table: list[int]) -> int:
    entry = table[br.peek16()]
    if entry == 0:
        raise ValueError("jpeg: invalid Huffman code")
    br.consume(entry & 31)
    return entry >> 5


def _extend(bits: int, size: int) -> int:
    """Signed coefficient from raw magnitude bits (F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def parse_jpeg_pixels(b: bytes):
    """JPEG bytes -> (width, height, (h, w, 3) BGR uint8) or None.

    Baseline sequential 4:4:4 (or grayscale) only -- progressive and
    subsampled streams return None rather than mis-decode."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    try:
        return _parse_jpeg(b)
    except (ValueError, IndexError, KeyError):
        return None


def _parse_jpeg(b: bytes):
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    h = w = 0
    restart_interval = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            return None  # non-baseline frame type
        seglen = int.from_bytes(b[pos + 2 : pos + 4], "big")
        seg = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT: one or more tables
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                n = 64 * (2 if prec else 1)
                raw = seg[i + 1 : i + 1 + n]
                tbl = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if prec
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                qt[tid] = tbl
                i += 1 + n
        elif marker == 0xC0:  # SOF0 baseline
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                return None
            for c in range(ncomp):
                cid, samp, qid = seg[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    return None  # subsampling unsupported (declared)
                comps.append((cid, qid))
        elif marker == 0xC4:  # DHT: one or more tables
            i = 0
            while i < len(seg):
                klass, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nsym = sum(bits)
                syms = list(seg[i + 17 : i + 17 + nsym])
                huff[(klass, tid)] = _fast_table(bits, syms)
                i += 17 + nsym
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS: scan header then entropy data
            ns = seg[0]
            if ns != len(comps):
                # non-interleaved stream (one component per scan): decoding
                # the first scan as if it were the full image would leave
                # the other planes zero -- reject rather than mis-decode,
                # matching the SOF2/subsampling guards (ADVICE r4)
                return None
            scan_map = []  # (comp index, dc table, ac table)
            for c in range(ns):
                cid, tids = seg[1 + 2 * c], seg[2 + 2 * c]
                idx = next(i for i, (k, _) in enumerate(comps) if k == cid)
                scan_map.append((idx, tids >> 4, tids & 0xF))
            data_start = pos + 2 + seglen
            return _decode_scan(
                b, data_start, h, w, comps, scan_map, qt, huff, restart_interval
            )
        pos += 2 + seglen
    return None


def _decode_scan(b, start, h, w, comps, scan_map, qt, huff, restart_interval):
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    planes = [np.zeros((ph, pw), dtype=np.float64) for _ in comps]
    br = _BitReader(b[start:])
    dc_prev = [0] * len(comps)
    mcu = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.resync()
                dc_prev = [0] * len(comps)
            for idx, dct, act in scan_map:
                dc_tab = huff[(0, dct)]
                ac_tab = huff[(1, act)]
                q = qt[comps[idx][1]]
                coeffs = np.zeros(64, dtype=np.int64)
                size = _read_huff(br, dc_tab)
                dc_prev[idx] += _extend(br.bits(size), size)
                coeffs[0] = dc_prev[idx]
                k = 1
                while k < 64:
                    sym = _read_huff(br, ac_tab)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    k += run
                    if k > 63:
                        raise ValueError("jpeg: AC index overflow")
                    coeffs[k] = _extend(br.bits(size), size)
                    k += 1
                block = (coeffs * q)[UNZIGZAG].reshape(8, 8).astype(np.float64)
                planes[idx][by : by + 8, bx : bx + 8] = (
                    _M.T @ block @ _M
                ) + 128.0
            mcu += 1
    planes = [p[:h, :w] for p in planes]
    out = np.zeros((h, w, 3), dtype=np.float64)
    ids = tuple(cid for cid, _ in comps)
    if len(comps) == 1:
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = planes[0]
    elif ids == (0x52, 0x47, 0x42):  # RGB component ids -> BGR planes
        out[:, :, 2], out[:, :, 1], out[:, :, 0] = planes
    else:  # standard YCbCr (BT.601 inverse)
        y, cb, cr = planes
        out[:, :, 2] = y + 1.402 * (cr - 128.0)
        out[:, :, 1] = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        out[:, :, 0] = y + 1.772 * (cb - 128.0)
    pixels = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return w, h, pixels
