"""Baseline JPEG, grayscale, pure NumPy (no PIL/libjpeg in sandbox).

Closes the S3 media-format gap (VERDICT r02 next-steps #5): the
reference accepts JPEG uploads (backend/application/services/
ocr_service.py:97-99 via PIL); this module supplies the ``jpgb64:``
branch of ``decode_media_ref`` with a real ITU T.81 baseline decoder.

Scope (documented, raising beyond it):

- ``encode_jpeg_gray``: baseline sequential DCT, single 8-bit
  luminance component, 1x1 sampling, Annex K quantization scaled by
  ``quality`` (libjpeg's linear scaling), Annex K Huffman tables.
  Exists to build fixtures and roundtrip tests — the engine never
  needs to WRITE JPEG in production.
- ``decode_jpeg_gray``: any baseline (SOF0) grayscale JPEG with
  tables read from the stream (not assumed standard), restart markers
  honored. Progressive (SOF2), arithmetic coding, and multi-component
  scans raise ``ValueError`` — explicit seams, same policy as the
  compressed-video branch in pipelines/media.py.

The entropy decode walks the bitstream in Python (Huffman is
inherently sequential); DCT/IDCT, dequantization, zigzag and block
assembly are vectorized over all blocks at once. Glyph-strip payloads
are tens of KB, so the per-byte Python cost is bounded by payload
size, not corpus size — and the stage runs inside the MediaDimensions
actor pool like every other decode.
"""

from __future__ import annotations

import numpy as np

# ---- constants (ITU T.81 Annex K — published standard tables) ----

Q_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)

DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# zigzag scan order: ZIGZAG[i] = flat (row*8+col) index of the i-th
# coefficient in scan order
_z = np.arange(64).reshape(8, 8)
# anti-diagonals alternate direction: odd sums walk row-ascending
# (down-left), even sums row-descending (up-right)
_order = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (rc[0] + rc[1],
                    rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
)
ZIGZAG = np.array([_z[r, c] for r, c in _order], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal 8-point DCT-II matrix (the T.81 FDCT/IDCT pair)
_k = np.arange(8)
_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) / 2.0
_C[0, :] *= 1.0 / np.sqrt(2.0)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's linear quality scaling of a base quantization table."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (q * scale + 50) // 100
    return np.clip(out, 1, 255).astype(np.int64)


def _blocks_of(img: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad (edge-replicate) to 8x8 multiples and split into
    (n_blocks, 8, 8) float blocks in raster MCU order."""
    h, w = img.shape
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    pad = np.pad(img, ((0, H - h), (0, W - w)), mode="edge")
    blocks = (pad.reshape(H // 8, 8, W // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
    return blocks.astype(np.float64) - 128.0, H // 8, W // 8


def _fdct(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C, optimize=True)


def _idct(coef: np.ndarray) -> np.ndarray:
    return np.einsum("xu,nuv,yv->nxy", _C.T, coef, _C.T, optimize=True)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1-bits
        return bytes(self.out)


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) from the (BITS, HUFFVAL) spec lists."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + offset bits for a signed coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = int(a).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg_gray(img: np.ndarray, quality: int = 90,
                     restart_interval: int = 0) -> bytes:
    """8-bit grayscale array -> baseline JFIF bytes (see module doc).

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    N MCUs — the error-resilience feature real camera/scanner JPEGs
    carry; kept here chiefly so the decoder's restart path is
    roundtrip-testable without external fixtures."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("encode_jpeg_gray expects a 2-D grayscale array")
    h, w = img.shape
    q = _quality_scale(Q_LUM, quality)

    blocks, _, _ = _blocks_of(img)
    coef = _fdct(blocks)
    quant = np.rint(coef / q[None, :, :]).astype(np.int64)
    zz = quant.reshape(-1, 64)[:, ZIGZAG]          # (n, 64) scan order

    dc_tab = _huff_encode_table(DC_BITS, DC_VALS)
    ac_tab = _huff_encode_table(AC_BITS, AC_VALS)
    bw = _BitWriter()
    scan_parts: list[bytes] = []
    prev_dc = 0
    for bi, row in enumerate(zz):
        if restart_interval and bi and bi % restart_interval == 0:
            scan_parts.append(bw.flush())
            scan_parts.append(
                bytes([0xFF, 0xD0 + ((bi // restart_interval) - 1) % 8]))
            bw = _BitWriter()
            prev_dc = 0
        diff = int(row[0]) - prev_dc
        prev_dc = int(row[0])
        size, bits = _magnitude(diff)
        code, length = dc_tab[size]
        bw.put(code, length)
        bw.put(bits, size)
        run = 0
        nz = np.nonzero(row[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(row[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_tab[0xF0]        # ZRL
                bw.put(code, length)
                run -= 16
            size, bits = _magnitude(v)
            code, length = ac_tab[(run << 4) | size]
            bw.put(code, length)
            bw.put(bits, size)
            run = 0
        if last < 63:
            code, length = ac_tab[0x00]            # EOB
            bw.put(code, length)
    scan_parts.append(bw.flush())
    scan = b"".join(scan_parts)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")                                  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(q.reshape(64)[ZIGZAG].astype(np.uint8)))
    out += seg(0xC0, b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + b"\x01" + b"\x01\x11\x00")                        # SOF0
    out += seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))      # DRI
    out += seg(0xDA, b"\x01" + b"\x01\x00" + b"\x00\x3f\x00")      # SOS
    out += scan
    out += b"\xff\xd9"                                             # EOI
    return bytes(out)


# ---- decoder ----


class _HuffDecoder:
    """Canonical Huffman decode table: (min/max code, value offset) per
    code length — the T.81 DECODE procedure (F.2.2.3)."""

    def __init__(self, bits: list[int], vals: bytes) -> None:
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            else:
                self.maxcode[length] = -1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = br.bit()
        length = 1
        while code > self.maxcode[length]:
            code = (code << 1) | br.bit()
            length += 1
            if length > 16:
                raise ValueError("corrupt JPEG: Huffman code over 16 bits")
        return self.vals[self.valptr[length] + code - self.mincode[length]]


class _BitReader:
    """Entropy-coded segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("corrupt JPEG: bitstream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:
                    # hit a marker mid-read (e.g. truncated stream)
                    raise ValueError("corrupt JPEG: marker inside scan")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Consume an RSTn marker (byte-aligned) between restart
        intervals."""
        self.nbits = 0
        if (self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 2
        else:
            raise ValueError("corrupt JPEG: expected restart marker")


def _extend(bits: int, size: int) -> int:
    """T.81 EXTEND: map magnitude-offset bits back to a signed value."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


_SOF_MODES = {0xC0: "baseline", 0xC1: "extended-sequential",
              0xC2: "progressive", 0xC3: "lossless",
              0xC5: "diff-sequential", 0xC6: "diff-progressive",
              0xC7: "diff-lossless", 0xC9: "arith-sequential",
              0xCA: "arith-progressive", 0xCB: "arith-lossless",
              0xCD: "diff-arith-sequential",
              0xCE: "diff-arith-progressive",
              0xCF: "diff-arith-lossless"}


def jpeg_info(data: bytes) -> dict:
    """Header-only JPEG metadata — (height, width, n_components,
    precision, mode) from the first SOFn marker, NO entropy decode.

    Every SOF variant shares the frame-header layout (T.81 §B.2.2),
    so this reads dimensions for progressive/arithmetic streams that
    ``decode_jpeg_gray`` deliberately refuses (VERDICT r03 #9: detect
    and describe non-baseline JPEGs instead of a generic failure).
    Metadata pipelines can report any JPEG; pixel decode remains an
    explicit baseline-only seam."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker byte — consume them so third-party streams parse.
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            break
        marker = data[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            pos += 2                               # standalone marker
            continue
        if marker in (0xD9, 0xDA):                 # EOI / scan start
            break
        seg_len = int.from_bytes(data[pos + 2:pos + 4], "big")
        if marker in _SOF_MODES:
            body = data[pos + 4:pos + 2 + seg_len]
            return {"precision": body[0],
                    "height": int.from_bytes(body[1:3], "big"),
                    "width": int.from_bytes(body[3:5], "big"),
                    "n_components": body[5],
                    "mode": _SOF_MODES[marker]}
        pos += 2 + seg_len
    raise ValueError("corrupt JPEG: no SOF frame header found")


def sof_offset(data: bytes) -> int:
    """Byte offset of the first SOFn marker's 0xFF, found by walking
    marker segments (never a raw byte search — quant/huffman table
    payloads may legally contain FF C0). Raises if absent, so callers
    that patch the frame header fail loud instead of corrupting a
    table byte (ADVICE r04 #1)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            break
        marker = data[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):
            break
        if marker in _SOF_MODES:
            return pos
        pos += 2 + int.from_bytes(data[pos + 2:pos + 4], "big")
    raise ValueError("corrupt JPEG: no SOF frame header found")


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """Baseline grayscale JPEG bytes -> (h, w) uint8 array."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    h = w = 0
    qid = 0
    restart_interval = 0
    scan_pos = -1
    dc_id = ac_id = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = data[pos + 1]
        if marker == 0xD9:                         # EOI
            break
        seg_len = int.from_bytes(data[pos + 2:pos + 4], "big")
        body = data[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:                         # DQT (may hold several)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                tbl = np.frombuffer(body[off + 1:off + 65], dtype=np.uint8)
                qtables[tq] = tbl.astype(np.int64)[UNZIGZAG].reshape(8, 8)
                off += 65
        elif marker == 0xC4:                       # DHT (may hold several)
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1:off + 17])
                n = sum(bits)
                vals = body[off + 17:off + 17 + n]
                htables[(tc, th)] = _HuffDecoder(bits, vals)
                off += 17 + n
        elif marker == 0xC0 or marker == 0xC1:     # SOF0/1 baseline
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            if body[5] != 1:
                raise ValueError("only single-component (grayscale) "
                                 "baseline JPEG supported")
            if body[7] != 0x11:
                raise ValueError("only 1x1 sampling supported")
            qid = body[8]
        elif marker == 0xC2:
            raise ValueError(
                "progressive JPEG (SOF2) unsupported: this decoder is "
                "baseline-sequential only — re-encode as baseline "
                "(e.g. cjpeg without -progressive / PIL progressive="
                "False); jpeg_info() still reads its dimensions")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (hierarchical/"
                             "arithmetic/lossless) unsupported")
        elif marker == 0xDD:                       # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:                       # SOS
            if body[0] != 1:
                raise ValueError("multi-component scan unsupported")
            dc_id, ac_id = body[2] >> 4, body[2] & 0xF
            scan_pos = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if scan_pos < 0 or h == 0:
        raise ValueError("corrupt JPEG: missing SOS/SOF")

    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    n_blocks = bh * bw_
    dc_tab = htables[(0, dc_id)]
    ac_tab = htables[(1, ac_id)]
    br = _BitReader(data, scan_pos)
    zz = np.zeros((n_blocks, 64), dtype=np.int64)
    prev_dc = 0
    for bi in range(n_blocks):
        if restart_interval and bi and bi % restart_interval == 0:
            br.align_restart()
            prev_dc = 0
        size = dc_tab.decode(br)
        prev_dc += _extend(br.bits(size), size)
        zz[bi, 0] = prev_dc
        k = 1
        while k < 64:
            rs = ac_tab.decode(br)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:                        # ZRL
                    k += 16
                    continue
                break                              # EOB
            k += r
            if k > 63:
                raise ValueError("corrupt JPEG: coefficient index overflow")
            zz[bi, k] = _extend(br.bits(s), s)
            k += 1

    q = qtables[qid]
    coef = (zz[:, UNZIGZAG].reshape(-1, 8, 8)) * q[None, :, :]
    pix = _idct(coef.astype(np.float64)) + 128.0
    full = (pix.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw_ * 8))
    return np.clip(np.rint(full), 0, 255).astype(np.uint8)[:h, :w]
