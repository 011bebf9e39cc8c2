"""Lightweight HTML document model built on the stdlib ``html.parser``.

The container has no bs4/lxml/selectolax, so we parse with
``html.parser.HTMLParser`` — deterministic, dependency-free, and fast enough
when driven batch-at-a-time from Arrow-vectorized pandas UDFs. At cluster
scale the extraction UDF is the unit you swap for a C-backed parser; the
document model below is the stable interface.

Extracted once per page, consumed by every analyzer (the reference re-parses
with BeautifulSoup inside each analyzer — ``core/crawler.py:166-167`` and
re-fetches pages a second time in ``main.py:202``; we parse exactly once).

``get_text()`` semantics mirror bs4: concatenation of all text descendants,
entities decoded, comments and script/style data excluded from element text.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
_VOID_TAGS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
})


@dataclass
class Element:
    """One extracted element: tag name, attributes, raw start-tag text,
    document position, and subtree text (headings/title/anchors only)."""

    tag: str
    attrs: dict[str, str]
    raw: str  # raw start-tag source
    pos: int  # 0-based document order among *all* start tags
    text: str = ""
    # raw OUTER source (start tag through matching end tag) — filled for
    # container tags the mixed-content report stringifies whole (the
    # reference uses bs4's str(element), which re-serializes; we report the
    # original source bytes — same content, original formatting)
    outer: str = ""

    def attr(self, name: str, default: str = "") -> str:
        v = self.attrs.get(name)
        return default if v is None else v


@dataclass
class HtmlDoc:
    """Parsed page: everything the analyzers need, in document order."""

    title: str = ""  # first <title> subtree text (not stripped)
    headings: list[Element] = field(default_factory=list)
    metas: list[Element] = field(default_factory=list)
    links: list[Element] = field(default_factory=list)        # <link>
    anchors: list[Element] = field(default_factory=list)      # <a href>
    imgs: list[Element] = field(default_factory=list)
    scripts: list[Element] = field(default_factory=list)
    iframes: list[Element] = field(default_factory=list)
    media: list[Element] = field(default_factory=list)        # video/audio/source
    forms: list[Element] = field(default_factory=list)
    style_blocks: list[Element] = field(default_factory=list)  # <style> content in .text
    styled: list[Element] = field(default_factory=list)        # any element w/ style attr

    def find_meta(self, **match: str) -> Element | None:
        """First <meta> whose attributes include all of ``match``
        (bs4 ``soup.find('meta', attrs=...)`` equivalent)."""
        for m in self.metas:
            if all(m.attrs.get(k) == v for k, v in match.items()):
                return m
        return None

    def find_link(self, rel: str) -> Element | None:
        """First <link rel=...>; bs4 matches rel as a space-separated list."""
        for l in self.links:
            if rel in l.attr("rel").split():
                return l
        return None


_CONTAINER_TAGS = frozenset({
    "script", "iframe", "video", "audio", "object", "embed", "form", "style",
})


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.doc = HtmlDoc()
        self._pos = 0
        # stack of (element, collect_into) for text-subtree capture
        self._capture: list[tuple[str, list[str]]] = []
        self._title_parts: list[str] | None = None
        self._style_parts: list[str] | None = None
        self._seen_title = False
        # outer-HTML span tracking (mixed-content `element` field)
        self._source: str = ""
        self._line_starts: list[int] | None = None
        self._open_spans: dict[str, list[tuple[Element, tuple[int, int]]]] = {}

    def _offset(self, linecol: tuple[int, int]) -> int:
        if self._line_starts is None:  # lazy: one scan, only when needed
            starts = [0]
            find = self._source.find
            i = find("\n")
            while i != -1:
                starts.append(i + 1)
                i = find("\n", i + 1)
            self._line_starts = starts
        line, col = linecol
        return self._line_starts[line - 1] + col

    # -- helpers ----------------------------------------------------------
    def _element(self, tag: str, attrs: list[tuple[str, str | None]]) -> Element:
        el = Element(
            tag=tag,
            attrs={k: (v if v is not None else "") for k, v in attrs},
            raw=self.get_starttag_text() or f"<{tag}>",
            pos=self._pos,
        )
        self._pos += 1
        return el

    def _route(self, el: Element) -> None:
        d = self.doc
        t = el.tag
        if t in _HEADING_TAGS:
            d.headings.append(el)
        elif t == "meta":
            d.metas.append(el)
        elif t == "link":
            d.links.append(el)
        elif t == "a":
            if "href" in el.attrs:
                d.anchors.append(el)
        elif t == "img":
            d.imgs.append(el)
        elif t == "script":
            if "src" in el.attrs:
                d.scripts.append(el)
        elif t == "iframe":
            d.iframes.append(el)
        elif t in ("video", "audio", "source"):
            d.media.append(el)
        elif t == "form":
            d.forms.append(el)
        if "style" in el.attrs:
            d.styled.append(el)

    # -- parser hooks ------------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        el = self._element(tag, attrs)
        self._route(el)
        if tag in _HEADING_TAGS:
            parts: list[str] = []
            el_ref = el
            self._capture.append((tag, parts))
            # bind capture buffer so endtag can flush into the element
            el_ref._parts = parts  # type: ignore[attr-defined]
        elif tag == "title" and not self._seen_title:
            self._title_parts = []
        elif tag == "style":
            self._style_parts = []
            self.doc.style_blocks.append(el)
        if tag in _CONTAINER_TAGS:
            self._open_spans.setdefault(tag, []).append((el, self.getpos()))
        if tag in _VOID_TAGS:
            return

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        el = self._element(tag, attrs)
        self._route(el)
        if tag in _HEADING_TAGS:
            el.text = ""

    def handle_endtag(self, tag: str) -> None:
        if tag in _HEADING_TAGS:
            # close the innermost open heading of this tag (tolerates nesting)
            for i in range(len(self._capture) - 1, -1, -1):
                if self._capture[i][0] == tag:
                    _, parts = self._capture.pop(i)
                    # find the matching element (last heading of tag w/o text set)
                    for h in reversed(self.doc.headings):
                        if h.tag == tag and getattr(h, "_parts", None) is parts:
                            h.text = "".join(parts)
                            break
                    break
        elif tag == "title" and self._title_parts is not None:
            self.doc.title = "".join(self._title_parts)
            self._title_parts = None
            self._seen_title = True
        elif tag == "style" and self._style_parts is not None:
            if self.doc.style_blocks:
                self.doc.style_blocks[-1].text = "".join(self._style_parts)
            self._style_parts = None
        if tag in _CONTAINER_TAGS:
            stack = self._open_spans.get(tag)
            if stack:
                el, start = stack.pop()
                el.outer = (self._source[self._offset(start):
                                         self._offset(self.getpos())]
                            + f"</{tag}>")

    def handle_data(self, data: str) -> None:
        for _, parts in self._capture:
            parts.append(data)
        if self._title_parts is not None:
            self._title_parts.append(data)
        if self._style_parts is not None:
            self._style_parts.append(data)


def parse_html(html: str | None) -> HtmlDoc:
    """Parse a page into an :class:`HtmlDoc`. Never raises on bad input."""
    ex = _Extractor()
    ex._source = html or ""
    try:
        ex.feed(html or "")
        ex.close()
    except Exception:
        pass
    return ex.doc
