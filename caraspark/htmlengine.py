"""HTML main-content extraction (SURVEY.md C26, HTML side of north_rule).

Boilerplate stripping in the jusText/Readability tradition — text-density +
link-density block heuristics over a tolerant stdlib ``html.parser`` parse
(no lxml/bs4 in the environment, and none needed).

FROZEN SPEC (implemented twice — here and independently in ``oracle/`` —
and compared byte-for-byte per url):

* Parse with html.parser, convert_charrefs=True (entities & charrefs decode
  to unicode before any counting).
* DROP subtrees rooted at: script style noscript template nav header footer
  aside iframe svg math form button select option object embed head title
  — nesting-counted per tag so unclosed tags can't leak boilerplate in.
* BLOCK boundaries: p div h1–h6 li ul ol table tr td th article section
  main blockquote pre dl dt dd figure figcaption br hr — both open and
  close (and self-closing) flush the current block.
* Inside a block: text chunks accumulate; characters inside <a> also count
  toward the block's link tally (non-whitespace chars).
* Block flush: normalize = " ".join(text.split()); empty → discarded;
  link_chars / total_chars > 0.66 → discarded (link farm);
* Output = "\n".join(kept blocks) as UTF-8; nothing kept → b"".
"""

from __future__ import annotations

from html.parser import HTMLParser

DROP_TAGS = frozenset(
    """script style noscript template nav header footer aside iframe svg
       math form button select option object embed head title""".split()
)
BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li ul ol table tr td th article section
       main blockquote pre dl dt dd figure figcaption br hr""".split()
)
LINK_DENSITY_MAX = 0.66


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._buf: list[str] = []
        self._drop_depth = 0
        self._a_depth = 0
        self._link_chars = 0
        self._total_chars = 0

    # -- block lifecycle
    def _flush(self) -> None:
        text = " ".join("".join(self._buf).split())
        link, total = self._link_chars, self._total_chars
        self._buf.clear()
        self._link_chars = 0
        self._total_chars = 0
        if not text:
            return
        if total > 0 and link / total > LINK_DENSITY_MAX:
            return
        self.blocks.append(text)

    # -- parser events
    def handle_starttag(self, tag, attrs):
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._a_depth += 1

    def handle_endtag(self, tag):
        if tag in DROP_TAGS:
            if self._drop_depth:
                self._drop_depth -= 1
            return
        if self._drop_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        elif tag == "a" and self._a_depth:
            self._a_depth -= 1

    def handle_startendtag(self, tag, attrs):
        if self._drop_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth or not data:
            return
        self._buf.append(data)
        n = len("".join(data.split()))
        self._total_chars += n
        if self._a_depth:
            self._link_chars += n


def extract_html_text(html: bytes) -> bytes:
    """blob → extracted main-content text bytes (UTF-8), per the SPEC."""
    try:
        src = html.decode("utf-8")
    except UnicodeDecodeError:
        src = html.decode("utf-8", "replace")
    p = _Extractor()
    try:
        p.feed(src)
        p.close()
    except Exception:  # noqa: BLE001 — parser must be total on garbage
        pass
    p._flush()
    if not p.blocks:
        return b""
    return "\n".join(p.blocks).encode("utf-8")


class _FoundContent(Exception):
    """Internal early-exit signal for ``html_has_content``."""


class _Prober(_Extractor):
    def _flush(self) -> None:
        super()._flush()
        if self.blocks:
            raise _FoundContent


def html_has_content(html: bytes) -> bool:
    """Exactly ``bool(extract_html_text(html))`` but stops parsing at the
    FIRST block the SPEC would emit — the cheap emptiness probe the
    want_text=False stats mode uses so it never pays full extraction just
    to keep its error taxonomy aligned with the full run."""
    try:
        src = html.decode("utf-8")
    except UnicodeDecodeError:
        src = html.decode("utf-8", "replace")
    p = _Prober()
    try:
        p.feed(src)
        p.close()
    except _FoundContent:
        return True
    except Exception:  # noqa: BLE001 — same totality stance as extraction
        pass
    try:
        p._flush()
    except _FoundContent:
        return True
    return bool(p.blocks)
