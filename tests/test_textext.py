"""Unit tests: text-span extractors (no Ray)."""

from granulate_char_ocr_ray.functions.textext import (
    extract_html_main,
    extract_pdf_layout,
    extract_text,
    html_wrap,
    normalize_ws,
    pdf_layout_encode,
)


def test_normalize_ws():
    assert normalize_ws("  a\t\tb\n c  ") == "a b c"
    assert normalize_ws("") == ""
    assert normalize_ws(" \n\t ") == ""


def test_html_template_roundtrip():
    body = "The   quick brown\tfox & <friends>."
    assert extract_html_main(html_wrap(body)) == normalize_ws(body)


def test_html_strips_boilerplate_without_main():
    html = (
        "<html><head><script>x()</script></head><body>"
        "<nav>menu</nav><p>real content here</p>"
        "<footer>foot</footer></body></html>"
    )
    assert extract_html_main(html) == "real content here"


def test_html_prefers_main_over_body():
    html = "<body>outside <main>inside content</main> trailing</body>"
    assert extract_html_main(html) == "inside content"


def test_html_nested_boilerplate():
    html = "<main>keep <nav>drop <p>also drop</p></nav> this</main>"
    assert extract_html_main(html) == "keep this"


def test_pdf_layout_roundtrip():
    text = " ".join(f"tok{i}" for i in range(40))
    for seed in range(5):
        payload = pdf_layout_encode(text, seed=seed)
        assert extract_pdf_layout(payload) == text


def test_pdf_reading_order():
    payload = "5|30|third line\n5|10|first line\n90|10|after first\n5|20|second"
    assert extract_pdf_layout(payload) == "first line after first second third line"


def test_pdf_malformed_lines_skipped():
    payload = "notaline\n5|x|bad\n5|10|good"
    assert extract_pdf_layout(payload) == "good"


def test_extract_text_is_normalize():
    assert extract_text("  a  b ") == "a b"


def test_storage_seam_routes_jsonl_and_csv(tmp_path):
    """The storage seam reads line-JSON and CSV sources through the
    same read_table entry (S5 analog: the reference persists JSON)."""
    import pandas as pd

    from granulate_char_ocr_ray.sources.storage import read_table

    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a", "b", "c"],
                       "extra": [9, 8, 7]})
    jp = str(tmp_path / "docs.jsonl")
    cp = str(tmp_path / "docs.csv")
    df.to_json(jp, orient="records", lines=True)
    df.to_csv(cp, index=False)
    for p in (jp, cp):
        got = read_table(p, columns=["doc_id", "text"]).to_pandas()
        got = got.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got, df[["doc_id", "text"]], check_dtype=False)
