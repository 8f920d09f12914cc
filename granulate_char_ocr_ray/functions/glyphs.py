"""Granulate glyph prototypes and the deterministic strip renderer.

The 26 8x8 prototype bitmasks are the reference's published hash
mapping (``granulate_alphabet_generated.py:21-48`` — data, not code).
The renderer is this sandbox's deterministic stand-in for the
image-decode step (S3, ``ocr_service.py:97-99``): a ``media_ref`` of the
form ``"glyph:<WORD>"`` decodes to a white-on-black uint8 strip, one
upscaled prototype tile per letter, separated by blank gutters. In
production this function is replaced by a real PNG/JPEG decoder over a
binary payload column; the schema, batching and actor plumbing around it
are unchanged (see stages/classify.py).
"""

from __future__ import annotations

import numpy as np

# 64-char bitstrings, row-major 8x8, glyph bits = 1.
# Data lifted verbatim from granulate_alphabet_generated.py:21-48.
PROTOTYPE_HASHES: dict[str, str] = {
    "A": "0000000001111110011111100000111001111110001111100000100000000000",
    "B": "0000000000011110001111100011110001111100001101100011111000000000",
    "C": "0000000001111100011111100101101001011010010010100100101000000000",
    "D": "0000000001111110011011000110011001110110011111100110110000000000",
    "E": "0000000000000001011000010110000101111101011111110000001100111111",
    "F": "0000000001111110011111100111111001111110011111100011111000000000",
    "G": "0000000001111110011111100111111001111110011010100010101000000000",
    "H": "0000000001110100011111100111011001111110011101100111010000000000",
    "I": "0000000001111110011111100000101000001110011111100111010000000000",
    "J": "0000000000111110001110000011100000011110001110000001111000000000",
    "K": "0000000000101110001111100111111001111100011111000010010000000000",
    "L": "0000000000111110001001100011111000111110001111100011111000000000",
    "M": "0000000000111110011111100111010001011100011101100011001000000000",
    "N": "0000000001111010001110100011111000110110001111100000011000000000",
    "O": "0000000001110110011111000101100001111110011111100101000000000000",
    "P": "0000000000111100001111000111010001110100011101100111011000000000",
    "Q": "0000000000011100011111100001100001011110011111100111000000000000",
    "R": "0000000001100110011111100001111001111110011111100111111000000000",
    "S": "0000000000101100000111100011110000111100001111100011111000000000",
    "T": "0000000001111110011111100111111001111110011110100111000000000000",
    "U": "0000000000111100001111000111111001111110011111100011111000000000",
    "V": "0000000001000110011101100111111001111110000111000000111000000000",
    "W": "0000000001111100011110000011010001111110001111000101100000000000",
    "X": "0000000001111000011110100111110001111110011110100111100000000000",
    "Y": "0000000001111110011111100110011001111100011111000001100000000000",
    "Z": "0000000000000110011111100111011001110100011111100001100000000000",
}

LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"

SCALE = 8      # prototype pixel -> SCALE x SCALE block (tile = 64x64)
GAP = 16       # blank columns between letter tiles (> MIN_RUN_WIDTH so
               # projection segmentation always splits letters)
MARGIN = 16    # blank columns at strip edges
MEDIA_PREFIX = "glyph:"


def prototype_bitmap(letter: str) -> np.ndarray:
    """8x8 uint8 {0,1} bitmap for a letter."""
    bits = PROTOTYPE_HASHES[letter]
    return np.frombuffer(bits.encode(), dtype=np.uint8).reshape(8, 8) - ord("0")


_TILE_CACHE: dict[tuple[str, int], np.ndarray] = {}


def render_letter_tile(letter: str, scale: int = SCALE) -> np.ndarray:
    """Upscale the prototype to a (8*scale, 8*scale) uint8 {0,255} tile.

    Tiles are cached per process (the hot path renders one per letter
    per word; 26 x 64x64 = trivial memory)."""
    key = (letter, scale)
    tile = _TILE_CACHE.get(key)
    if tile is None:
        bm = prototype_bitmap(letter)
        tile = np.kron(bm * np.uint8(255), np.ones((scale, scale), dtype=np.uint8))
        tile.setflags(write=False)
        _TILE_CACHE[key] = tile
    return tile


def render_strip(word: str, scale: int = SCALE, gap: int = GAP, margin: int = MARGIN) -> np.ndarray:
    """Render WORD as a single white-on-black strip (H = 8*scale).

    Letters are separated by ``gap`` blank columns; the strip has
    ``margin`` blank columns on each side. Every letter's nonzero
    column-run is contiguous and >= 2*scale wide, so horizontal
    projection segmentation recovers exactly len(word) regions.
    """
    h = 8 * scale
    if not word:
        return np.zeros((h, max(1, 2 * margin)), dtype=np.uint8)
    tiles = [render_letter_tile(c, scale) for c in word]
    gutter = np.zeros((h, gap), dtype=np.uint8)
    edge = np.zeros((h, margin), dtype=np.uint8)
    parts = [edge]
    for i, t in enumerate(tiles):
        if i:
            parts.append(gutter)
        parts.append(t)
    parts.append(edge)
    return np.concatenate(parts, axis=1)


def decode_media_ref(media_ref: str) -> np.ndarray | None:
    """Decode a media payload to a grayscale uint8 image.

    Supported encodings:

    - ``glyph:<WORD>`` — the deterministic prototype-strip renderer
      (synthetic corpus path);
    - ``pngb64:<base64>`` — REAL binary image decode: base64 payload ->
      8-bit grayscale PNG bytes -> array via the pure-NumPy decoder
      (functions/codecs.decode_png_gray; S2+S3,
      ocr_service.py:97-99 / the API's base64 upload path);
    - ``pgmb64:<base64>`` — same for binary PGM (P5);
    - ``jpgb64:<base64>`` — baseline grayscale JPEG via the pure-NumPy
      T.81 decoder (functions/jpeg.decode_jpeg_gray; closes the S3
      format gap — the reference accepts JPG at ocr_service.py:97-99).

    Undecodable payloads (bad base64 / corrupt image) yield ``None`` —
    the reference's swallow-into-empty-result policy
    (ocr_service.py:164-171).
    """
    if not media_ref:
        return None   # empty/null payload -> empty result, never a crash
    if media_ref.startswith(MEDIA_PREFIX):
        word = media_ref[len(MEDIA_PREFIX):]
        if all(c in PROTOTYPE_HASHES for c in word):
            return render_strip(word)
        return None
    if media_ref.startswith(("pngb64:", "pgmb64:", "jpgb64:")):
        import base64 as _b64

        if media_ref.startswith("pngb64:"):
            from .codecs import decode_png_gray as decoder
        elif media_ref.startswith("pgmb64:"):
            from .codecs import decode_pgm as decoder
        else:
            from .jpeg import decode_jpeg_gray as decoder
        try:
            return decoder(_b64.b64decode(media_ref[7:], validate=True))
        except Exception:
            return None
    raise NotImplementedError(
        "unrecognized media encoding; supported: 'glyph:<WORD>', "
        "'pngb64:<b64 png>', 'pgmb64:<b64 pgm>', 'jpgb64:<b64 baseline "
        "grayscale jpeg>' — plug additional codecs into functions/codecs "
        "and route them here"
    )
