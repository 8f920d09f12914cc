"""Unit tests for the pure image ops (no Ray)."""

import numpy as np

from granulate_char_ocr_ray.functions.image import (
    hash8x8,
    morph_close_2x2,
    normalize_polarity,
    preprocess,
    resize_area,
    threshold_fixed,
    threshold_otsu,
)


def test_polarity_white_background_inverted():
    img = np.full((10, 10), 200, dtype=np.uint8)
    img[2:4, 2:4] = 10
    out = normalize_polarity(img)
    assert out[0, 0] == 55 and out[2, 2] == 245


def test_polarity_dark_background_unchanged():
    img = np.zeros((10, 10), dtype=np.uint8)
    img[2, 2] = 255
    assert (normalize_polarity(img) == img).all()


def test_threshold_fixed():
    img = np.array([[0, 128, 129, 255]], dtype=np.uint8)
    assert threshold_fixed(img).tolist() == [[0, 0, 255, 255]]


def test_otsu_bimodal():
    # two clear modes at 50 and 200 -> threshold lands between them
    img = np.concatenate(
        [np.full(500, 50, dtype=np.uint8), np.full(500, 200, dtype=np.uint8)]
    ).reshape(10, 100)
    out = threshold_otsu(img)
    assert set(np.unique(out)) == {0, 255}
    assert (out[:5] == 0).all() and (out[5:] == 255).all()


def test_otsu_blank():
    assert (threshold_otsu(np.zeros((4, 4), dtype=np.uint8)) == 0).all()


def test_morph_close_fills_single_pixel_hole():
    img = np.zeros((6, 6), dtype=np.uint8)
    img[1:5, 1:5] = 255
    img[2, 2] = 0  # pinhole
    out = morph_close_2x2(img)
    assert out[2, 2] == 255


def test_preprocess_idempotent_on_binary():
    img = np.zeros((20, 20), dtype=np.uint8)
    img[5:15, 5:15] = 255
    assert (preprocess(img) == img).all()


def test_resize_area_exact_blocks():
    # constant 8x8 blocks -> exact recovery
    src = np.kron(np.arange(64).reshape(8, 8), np.ones((8, 8))).astype(np.uint8)
    out = resize_area(src, 8, 8)
    assert np.allclose(out, np.arange(64).reshape(8, 8))


def test_hash8x8_recovers_prototype_on_full_tile():
    from granulate_char_ocr_ray.functions.glyphs import (
        PROTOTYPE_HASHES,
        render_letter_tile,
    )

    for letter, bits in PROTOTYPE_HASHES.items():
        assert hash8x8(render_letter_tile(letter)) == bits
