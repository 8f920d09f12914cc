"""Pure-NumPy binary image codecs: 8-bit grayscale PNG and PGM (P5).

Realizes the reference's real image-decode step (S3,
``backend/application/services/ocr_service.py:97-99`` decodes PNG/JPEG
bytes to arrays) without an imaging library: a standards-conforming
subset of PNG — 8-bit grayscale, non-interlaced, all five scanline
filters (RFC 2083 §6) — plus binary PGM. The base64 transport wrapper
(``pngb64:`` / ``pgmb64:`` media refs, functions/glyphs.decode_media_ref)
realizes the payload-decode seam (S2,
``backend/interface/api/routes/ocr.py`` base64 uploads).

Decode cost notes: filter types 0/1/2 defilter fully vectorized (type 1
is a mod-256 cumsum); types 3/4 (Average/Paeth) carry a true sequential
dependency on the left-neighbor RECONSTRUCTED byte, so those rows pay a
per-column loop — unavoidable without a compiled kernel, and only paid
for externally-produced PNGs that chose those filters.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload)))


def encode_png_gray(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a (h, w) uint8 array as an 8-bit grayscale PNG.

    ``filter_type`` selects the scanline filter for EVERY row (0=None,
    1=Sub, 2=Up, 3=Average, 4=Paeth) — useful for exercising every
    decode path in tests; 0 is the fast default."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    prev = np.zeros(w, dtype=np.int64)
    rows = []
    for y in range(h):
        raw = img[y].astype(np.int64)
        left = np.concatenate([[0], raw[:-1]])
        if filter_type == 0:
            filt = raw
        elif filter_type == 1:
            filt = raw - left
        elif filter_type == 2:
            filt = raw - prev
        elif filter_type == 3:
            filt = raw - (left + prev) // 2
        elif filter_type == 4:
            ul = np.concatenate([[0], prev[:-1]])
            filt = raw - _paeth(left, prev, ul)
        else:
            raise ValueError(f"bad filter {filter_type}")
        rows.append(bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes())
        prev = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"".join(rows))
    return (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def _defilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """PNG scanline defilter -> (h, w*bpp) int64 reconstructed bytes.
    The "left" neighbor is ``bpp`` bytes back (RFC 2083 §6.2)."""
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    scan = rows[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(ftypes[y])
        raw_row = scan[y]
        if f == 0:
            rec = raw_row
        elif f == 1:
            # per-channel mod-256 cumsum (left neighbor is bpp back)
            rec = (np.cumsum(raw_row.reshape(w, bpp), axis=0,
                             dtype=np.int64) % 256).reshape(stride)
        elif f == 2:
            rec = (raw_row + prev) % 256
        elif f in (3, 4):
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 3:
                    pred = (a + b) // 2
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                rec[x] = (raw_row[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = rec
    return out


def decode_png_gray(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG -> (h, w) uint8 grayscale.

    Grayscale (color type 0) decodes directly; truecolor RGB (type 2)
    decodes then converts via BT.601 luma — the color-aware entry (M9).
    Raises ValueError for non-PNG bytes or unsupported variants
    (palette/alpha/16-bit/interlaced)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = color = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos: pos + 4])
        tag = data[pos + 4: pos + 8]
        payload = data[pos + 8: pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload)
            if depth != 8 or color not in (0, 2) or interlace != 0:
                raise ValueError(
                    f"unsupported PNG variant (depth={depth}, color={color}, "
                    f"interlace={interlace}); this decoder handles 8-bit "
                    "grayscale/truecolor non-interlaced only")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp = 3 if color == 2 else 1
    out = _defilter(raw, h, w, bpp)
    if bpp == 1:
        return out.astype(np.uint8)
    from .image import rgb_to_gray

    return rgb_to_gray(out.reshape(h, w, 3).astype(np.uint8))


def encode_png_rgb(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a (h, w, 3) uint8 array as an 8-bit truecolor PNG
    (filter 0 or 2 rows — enough to exercise the RGB decode path)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    flat = img.reshape(h, w * 3).astype(np.int64)
    rows = []
    prev = np.zeros(w * 3, dtype=np.int64)
    for y in range(h):
        if filter_type == 0:
            filt = flat[y]
        elif filter_type == 2:
            filt = flat[y] - prev
        else:
            raise ValueError("encode_png_rgb supports filters 0 and 2")
        rows.append(bytes([filter_type])
                    + (filt % 256).astype(np.uint8).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(rows))
    return (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def encode_pgm(img: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 array as binary PGM (P5, maxval 255)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    return f"P5\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_pgm(data: bytes) -> np.ndarray:
    """Decode a binary PGM (P5) -> (h, w) uint8."""
    if not data.startswith(b"P5"):
        raise ValueError("not a binary PGM (P5)")
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos: pos + 1].isspace():
            pos += 1
        if data[pos: pos + 1] == b"#":
            while pos < len(data) and data[pos: pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos: pos + 1].isspace():
            pos += 1
        tokens.append(data[start: pos])
    pos += 1          # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError("only maxval 255 PGM supported")
    img = np.frombuffer(data, dtype=np.uint8, count=h * w, offset=pos)
    return img.reshape(h, w).copy()


# ---------------------------------------------------------------------------
# PCM WAV (RIFF) — audio needs no codec library for uncompressed PCM
# ---------------------------------------------------------------------------

def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 mono samples as a PCM WAV (RIFF) byte string."""
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    data = samples.tobytes()
    n = len(data)
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                sample_rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", n) + data


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV (RIFF, 16-bit mono/stereo->mono) ->
    (int16 samples, sample_rate). Raises ValueError for non-RIFF or
    compressed formats (a real codec plugs in beside this branch)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    rate = None
    channels = 1
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos: pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4: pos + 8])
        body = data[pos + 8: pos + 8 + length]
        pos += 8 + length + (length & 1)
        if tag == b"fmt ":
            fmt_code, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_code != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (format={fmt_code}, bits={bits}); "
                    "PCM 16-bit only — compressed audio needs a codec")
        elif tag == b"data":
            samples = np.frombuffer(body, dtype=np.int16)
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(
            axis=1).astype(np.int16)
    return samples, rate


def audio_frame_features(samples: np.ndarray, sample_rate: int,
                         frame_ms: int = 25) -> np.ndarray:
    """Per-frame audio features -> float64[(n_frames, 2)]:
    (RMS energy, zero-crossing rate). Vectorized frame windows —
    the standard first stage of any audio pipeline."""
    win = max(1, sample_rate * frame_ms // 1000)
    n = len(samples) // win
    if n == 0:
        return np.empty((0, 2))
    f = samples[: n * win].astype(np.float64).reshape(n, win)
    rms = np.sqrt((f ** 2).mean(axis=1))
    zc = (np.diff(np.signbit(f), axis=1) != 0).mean(axis=1)
    return np.stack([rms, zc], axis=1)


# ---------------------------------------------------------------------------
# Multi-frame container: length-prefixed concatenated PGM frames.
# Compressed video needs a codec library; an UNCOMPRESSED container
# does not — this makes the frame-sampling plumbing fully real.
# ---------------------------------------------------------------------------

def encode_frames(frames: list[np.ndarray]) -> bytes:
    """Pack grayscale frames as length-prefixed PGMs."""
    parts = [struct.pack("<I", len(frames))]
    for fr in frames:
        p = encode_pgm(fr)
        parts.append(struct.pack("<I", len(p)))
        parts.append(p)
    return b"".join(parts)


def decode_frames(data: bytes) -> list[np.ndarray]:
    """Unpack a length-prefixed PGM container -> list of (h, w) uint8."""
    (n,) = struct.unpack_from("<I", data, 0)
    pos = 4
    out = []
    for _ in range(n):
        (length,) = struct.unpack_from("<I", data, pos)
        pos += 4
        out.append(decode_pgm(data[pos: pos + length]))
        pos += length
    return out
