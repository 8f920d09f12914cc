"""Unit tests: segmentation + classification (no Ray)."""

import numpy as np

from granulate_char_ocr_ray.functions.classify import (
    build_prototype_matrix,
    classify_crops,
    classify_features,
    exact_hash_lookup,
    tight_crop,
)
from granulate_char_ocr_ray.functions.glyphs import (
    LETTERS,
    PROTOTYPE_HASHES,
    render_strip,
)
from granulate_char_ocr_ray.functions.image import preprocess
from granulate_char_ocr_ray.functions.segment import (
    segment_components,
    segment_projection,
)


def test_projection_segments_word_into_letters():
    for word in ["A", "AND", "PLEASURE", "TRANSPORTATION"]:
        strip = preprocess(render_strip(word))
        regions = segment_projection(strip)
        assert len(regions) == len(word), word
        xs = [r[0] for r in regions]
        assert xs == sorted(xs)  # left-to-right order


def test_projection_empty_and_blank():
    assert segment_projection(np.zeros((0, 0), dtype=np.uint8)) == []
    assert segment_projection(np.zeros((64, 64), dtype=np.uint8)) == []


def test_components_segments_word():
    strip = preprocess(render_strip("FOX"))
    regions = segment_components(strip)
    # CC may split a letter into several parts; every region is ordered by x
    xs = [r[0] for r in regions]
    assert xs == sorted(xs)
    assert len(regions) >= 3


def test_components_two_boxes():
    img = np.zeros((30, 60), dtype=np.uint8)
    img[5:20, 5:20] = 255
    img[5:20, 35:55] = 255
    assert segment_components(img) == [(5, 5, 15, 15), (35, 5, 20, 15)]


def test_classifier_all_letters_distance_zero_on_clean_tiles():
    proto, letters = build_prototype_matrix()
    strip_letters = [render_strip(c) for c in LETTERS]
    crops = []
    for s in strip_letters:
        b = preprocess(s)
        (x, y, w, h) = segment_projection(b)[0]
        crops.append(b[y: y + h, x: x + w])
    text, conf = classify_crops(crops, proto)
    assert text == LETTERS


def test_classifier_rejects_far_features():
    proto, _ = build_prototype_matrix()
    # alternating bits is far from every prototype
    f = np.tile(np.array([1, 0], dtype=np.uint8), 32).reshape(1, 64)
    idx, conf = classify_features(f, proto)
    assert idx[0] == -1 and conf[0] == 0.0


def test_tight_crop_blank_returns_none():
    assert tight_crop(np.zeros((8, 8), dtype=np.uint8)) is None


def test_exact_hash_lookup_roundtrip():
    for letter, bits in PROTOTYPE_HASHES.items():
        assert exact_hash_lookup(bits) == letter
    assert exact_hash_lookup("0" * 64) is None


def test_word_pipeline_end_to_end_single_process():
    from granulate_char_ocr_ray.oracle import extract_media_text

    for word in ["PLEASURE", "STOMACH", "YAMIGASHI", "HIRING"]:
        text, conf = extract_media_text("glyph:" + word)
        assert text == word
        assert 0.8 < conf <= 1.0


def test_decode_empty_and_bad_media_refs():
    from granulate_char_ocr_ray.functions.glyphs import decode_media_ref
    from granulate_char_ocr_ray.oracle import extract_media_text

    assert decode_media_ref("") is None
    assert decode_media_ref("glyph:a?z") is None
    assert extract_media_text("") == ("", 0.0)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_media_ref("png:deadbeef")
