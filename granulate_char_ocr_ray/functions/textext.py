"""Text-span extractors: whitespace normalize, HTML boilerplate strip,
PDF layout reconstruction. Stdlib-only, stateless, deterministic.

These are the graft's text axis (BASELINE.json north_rule: "HTML
boilerplate strip, PDF/layout parse, DOM heuristics"); the reference has
no HTML/PDF code, so the semantics are defined here and pinned by the
oracle + SQL parity tests:

- text:  extractor output == whitespace-normalized payload
- html:  output == whitespace-normalized text content of the main
         content element, with <script>/<style>/<nav>/<header>/<footer>/
         <aside>/<form>/<template> subtrees (boilerplate chrome) removed
- pdf:   payload is a serialized line layout "x|y|content\\n..."; output
         == contents joined in reading order (sort by y, then x)
"""

from __future__ import annotations

import html as _html
import re
from html.parser import HTMLParser

_WS = re.compile(r"\s+")

BOILERPLATE_TAGS = frozenset(
    {"script", "style", "nav", "header", "footer", "aside", "form",
     "template", "noscript", "head", "iframe", "svg", "button"}
)
# void elements never push onto the open-tag stack
_VOID = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr"}
)
MAIN_TAGS = frozenset({"main", "article"})


def normalize_ws(text: str) -> str:
    """Collapse all whitespace runs to single spaces and trim."""
    return _WS.sub(" ", text).strip()


class _MainContentParser(HTMLParser):
    """DOM-heuristic main-content extractor (stack machine).

    Collects text that is (a) not inside any boilerplate subtree and
    (b) inside a <main>/<article> subtree when one exists, else anywhere
    in <body>. Two passes are avoided by collecting both candidate
    streams in one walk.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.boiler_depth = 0
        self.main_depth = 0
        self.saw_main = False
        self.main_chunks: list[str] = []
        self.all_chunks: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID:
            return
        if tag in BOILERPLATE_TAGS:
            self.boiler_depth += 1
        if tag in MAIN_TAGS:
            self.main_depth += 1
            self.saw_main = True

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID:
            return
        if tag in BOILERPLATE_TAGS and self.boiler_depth > 0:
            self.boiler_depth -= 1
        if tag in MAIN_TAGS and self.main_depth > 0:
            self.main_depth -= 1

    def handle_data(self, data: str) -> None:
        if self.boiler_depth > 0:
            return
        self.all_chunks.append(data)
        if self.main_depth > 0:
            self.main_chunks.append(data)


def _extract_html_main_slow(payload: str) -> str:
    """Reference path: the stdlib HTMLParser stack machine."""
    p = _MainContentParser()
    p.feed(payload)
    p.close()
    chunks = p.main_chunks if p.saw_main else p.all_chunks
    return normalize_ws(" ".join(chunks))


# name charset mirrors stdlib tagfind_tolerant: a namespaced
# <svg:rect> must NOT match the bare "svg" boilerplate entry
_TAG_NAME = re.compile(r"<(/?)([a-zA-Z][^\t\n\r\f />\x00]*)")
# stdlib endtagfind shape: "</ p >" closes p
_ENDTAG_WS = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
# plainly well-formed tag: name + optional name[=value] attributes
# (values quoted or bare), optional self-close. Tokens outside this
# shape take the stdlib path wholesale — its tolerant recovery for
# malformed tags (prefix re-emitted as data, odd stops at '/') is not
# worth emulating in the fast scanner.
_SIMPLE_TAG = re.compile(
    r"</?[a-zA-Z][^\t\n\r\f />\x00]*"
    r"(?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*"
    r"(?:\s*=\s*(?:'[^'<>]*'|\"[^\"<>]*\"|[^\s'\"<>/]+))?)*"
    r"\s*/?>\Z")

# token -> (closing, name, startend) | None (= bail to stdlib).
# Tag tokens repeat heavily (templated markup), so the gate regex +
# name parse run once per DISTINCT token; capped to bound memory.
_TOKEN_CACHE: dict = {}
_TOKEN_CACHE_MAX = 65536


def _parse_tag_token(token: str):
    try:
        return _TOKEN_CACHE[token]
    except KeyError:
        pass
    if _SIMPLE_TAG.match(token) is None:
        info = None
    else:
        m = _TAG_NAME.match(token)  # guaranteed: "</?letter..."
        info = (m.group(1) == "/", m.group(2).lower(),
                token.endswith("/>"))
    if len(_TOKEN_CACHE) < _TOKEN_CACHE_MAX:
        _TOKEN_CACHE[token] = info
    return info
# stdlib set_cdata_mode shape: r'</\s*<elem>' case-insensitively ends
# the CDATA scan (whitespace after "</" allowed)
_RAWTEXT_CLOSE = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}


def extract_html_main(payload: str) -> str:
    """Strip boilerplate and return the whitespace-normalized main text.

    Fast path: a compiled-regex tag scanner replacing the stdlib
    ``HTMLParser`` (~95 us -> ~8 us per synthetic document; the HTML
    extractor dominated the flagship's text-extraction CPU). It
    reproduces the stack machine's observable behavior — boilerplate
    depth, main/article capture, void elements, ``<!...>``/``<?...>``
    skipping, comment skipping, ``<x/>`` start+end, literal ``<`` as
    text, charref decoding, script/style CDATA jumps — and BAILS to
    the stdlib parser whenever a tag token carries unbalanced quotes
    (the one construct where a naive ``>`` split could misparse, e.g.
    ``title="a>b"``). Equivalence is pinned by a randomized
    cross-check test over an adversarial HTML grammar
    (tests/test_properties.py)."""
    n = len(payload)
    pos = 0
    boiler = 0
    main_d = 0
    saw_main = False
    main_chunks: list[str] = []
    all_chunks: list[str] = []

    def emit(chunk: str) -> None:
        if boiler == 0 and chunk:
            if "&" in chunk:
                chunk = _html.unescape(chunk)
            all_chunks.append(chunk)
            if main_d > 0:
                main_chunks.append(chunk)

    while pos < n:
        lt = payload.find("<", pos)
        if lt == -1:
            emit(payload[pos:])
            break
        if lt > pos:
            emit(payload[pos:lt])
        nxt = payload[lt + 1: lt + 2]
        if not (nxt.isalpha() or nxt in "/!?"):
            # literal '<' (stdlib emits it as data)
            emit("<")
            pos = lt + 1
            continue
        if nxt == "!":
            if payload.startswith("<!--", lt):
                end = payload.find("-->", lt + 4)
                if end == -1:
                    return _extract_html_main_slow(payload)
                pos = end + 3
                continue
            if payload.startswith("<![", lt):
                # marked section (may contain '>' before ']]>')
                return _extract_html_main_slow(payload)
        gt = payload.find(">", lt)
        if gt == -1:
            return _extract_html_main_slow(payload)
        token = payload[lt: gt + 1]
        pos = gt + 1
        if nxt in "!?":
            continue  # declaration / processing instruction: no data
        info = _parse_tag_token(token)
        if info is None:
            # anything beyond a plainly well-formed tag — unterminated
            # quotes ('>' inside an attribute split the token early),
            # interior '<', slashes/quotes in odd positions — risks
            # diverging from stdlib's tolerant recovery: take the
            # stdlib path for the whole payload
            return _extract_html_main_slow(payload)
        closing, name, ends_slash = info
        if name in _VOID:
            continue
        startend = not closing and ends_slash
        if not closing:
            if name in BOILERPLATE_TAGS:
                boiler += 1
            if name in MAIN_TAGS:
                main_d += 1
                saw_main = True
            if name in _RAWTEXT_CLOSE and not startend:
                # stdlib enters CDATA mode: no tags until a VALID
                # closing tag of this element (parse_endtag keeps the
                # cdata open on "</scriptx>" / "</script foo>"; EOF
                # swallows the rest). Content needs no emit: script/
                # style are boilerplate, so it is dropped either way.
                close = _RAWTEXT_CLOSE[name]
                scan = pos
                while True:
                    mm = close.search(payload, scan)
                    if mm is None:
                        pos = n     # unterminated: swallow to EOF
                        break
                    gt2 = payload.find(">", mm.start() + 1)
                    if gt2 == -1:
                        pos = n
                        break
                    tm = _ENDTAG_WS.match(payload[mm.start(): gt2 + 1])
                    if tm is not None and tm.group(1).lower() == name:
                        pos = mm.start()  # outer loop closes the elem
                        break
                    scan = gt2  # wrong-name/malformed endtag: still
                    #             inside the cdata (stdlib resumes at
                    #             its '>')
                continue
        if closing or startend:
            if name in BOILERPLATE_TAGS and boiler > 0:
                boiler -= 1
            if name in MAIN_TAGS and main_d > 0:
                main_d -= 1
    chunks = main_chunks if saw_main else all_chunks
    return normalize_ws(" ".join(chunks))


def extract_pdf_layout(payload: str) -> str:
    """Reconstruct reading order from a serialized line layout.

    Each line of the payload is ``x|y|content`` (ints x, y). Lines are
    sorted by (y, x) — top-to-bottom, left-to-right — and contents
    joined with single spaces, then whitespace-normalized. Malformed
    lines are skipped (mirrors the reference's swallow-and-continue
    error policy, ocr_service.py:164-171).
    """
    entries: list[tuple[int, int, str]] = []
    for line in payload.split("\n"):
        if not line:
            continue
        parts = line.split("|", 2)
        if len(parts) != 3:
            continue
        try:
            x, y = int(parts[0]), int(parts[1])
        except ValueError:
            continue
        entries.append((y, x, parts[2]))
    entries.sort(key=lambda e: (e[0], e[1]))
    return normalize_ws(" ".join(e[2] for e in entries))


def extract_text(payload: str) -> str:
    """Plain-text span extractor: whitespace normalization only."""
    return normalize_ws(payload)


def html_wrap(body_text: str, title: str = "doc") -> str:
    """Deterministic HTML template used by the synthetic corpus: chrome
    (nav/header/footer/script/aside) wrapping one <main> body. The
    extractor must recover exactly ``normalize_ws(body_text)``."""
    esc = _html.escape(body_text)
    return (
        "<!DOCTYPE html><html><head><title>" + _html.escape(title) + "</title>"
        "<style>body{margin:0}</style><script>var t=1;</script></head>"
        "<body><header><h1>Site Chrome</h1></header>"
        "<nav><a href='/'>home</a><a href='/x'>other</a></nav>"
        "<aside>sidebar junk</aside>"
        "<main><article><p>" + esc + "</p></article></main>"
        "<footer>copyright chrome 2026</footer>"
        "<script>trackPageview();</script></body></html>"
    )


def pdf_layout_encode(text: str, seed: int, tokens_per_line: int = 8) -> str:
    """Deterministic pseudo-PDF layout for the synthetic corpus.

    Splits the normalized text into lines of ``tokens_per_line`` tokens,
    assigns (x=5, y=10+20*i) positions, then serializes the lines in a
    seed-dependent permuted order (an LCG-driven shuffle) so extraction
    must actually sort by (y, x) to reconstruct the text.
    """
    toks = normalize_ws(text).split(" ") if normalize_ws(text) else []
    lines = [" ".join(toks[i: i + tokens_per_line]) for i in range(0, len(toks), tokens_per_line)]
    entries = [(5, 10 + 20 * i, content) for i, content in enumerate(lines)]
    # deterministic permutation: repeated LCG-pick without replacement
    order = list(range(len(entries)))
    state = (seed * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
    shuffled: list[int] = []
    while order:
        state = (state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        shuffled.append(order.pop(state % len(order)))
    return "\n".join(f"{entries[i][0]}|{entries[i][1]}|{entries[i][2]}" for i in shuffled)
