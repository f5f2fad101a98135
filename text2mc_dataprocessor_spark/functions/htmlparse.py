"""Minimal DOM with selenium-equivalent accessor semantics.

The reference scraper (``/root/reference/scraper/selenium_scraper.py``)
reads pages through a live WebDriver. The extraction UDFs in this
engine parse the stored ``html`` bytes instead, but must reproduce the
exact observable semantics the reference depends on:

- ``find_elements(By.CLASS_NAME, c)`` — class *token* match, document
  order (selenium_scraper.py:151, 434, 351, 370).
- ``find_element(By.CSS_SELECTOR, 'a[href^="/project"]')`` — attribute
  prefix match on the *raw* attribute (selenium_scraper.py:158-160).
- ``get_attribute("href")`` — absolute URL, resolved against the page
  URL (WebDriver resolves relative hrefs).
- ``get_attribute("srcset"|"title"|"innerHTML")`` — raw values; for
  ``innerHTML`` of ``<script>``, the raw text content.
- ``element.text`` — concatenated descendant text, stripped.

Pure stdlib (html.parser); no per-row Python leaks into Spark — this
module is only ever called from Arrow-batched pandas UDFs.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Element:
    __slots__ = ("tag", "attrs", "children", "parent", "_texts")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Element | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Element] = []
        self.parent = parent
        self._texts: list[str] = []  # direct text chunks, interleaved order not kept

    # -- selenium-equivalent accessors ------------------------------------
    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    def attr(self, name: str) -> str | None:
        return self.attrs.get(name)

    def text(self) -> str:
        """Concatenated descendant text, whitespace-collapsed + stripped
        (approximates WebElement.text for simple fixture markup)."""
        parts: list[str] = []
        self._collect_text(parts)
        return " ".join(" ".join(parts).split())

    def _collect_text(self, out: list[str]) -> None:
        out.extend(self._texts)
        for c in self.children:
            c._collect_text(out)

    def inner_html_text(self) -> str:
        """Raw text content — what get_attribute('innerHTML') yields for
        a <script> element (scripts hold only character data)."""
        parts: list[str] = []
        self._collect_text_raw(parts)
        return "".join(parts)

    def _collect_text_raw(self, out: list[str]) -> None:
        out.extend(self._texts)
        for c in self.children:
            c._collect_text_raw(out)

    # -- tree queries (document order) -------------------------------------
    def iter(self):
        yield self
        for c in self.children:
            yield from c.iter()

    def find_all_by_class(self, token: str) -> list["Element"]:
        return [e for e in self.iter() if token in e.classes()]

    def find_all_by_tag(self, tag: str) -> list["Element"]:
        return [e for e in self.iter() if e.tag == tag]

    def find_by_id(self, eid: str) -> "Element | None":
        for e in self.iter():
            if e.attrs.get("id") == eid:
                return e
        return None


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("#document", {}, None)
        self.stack = [self.root]
        self._in_script = False

    def handle_starttag(self, tag, attrs):
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(el)
        if tag == "script":
            self._in_script = True
            self.stack.append(el)
        elif tag not in _VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag):
        if tag == "script":
            self._in_script = False
        # pop to the matching open tag if present (tolerant of misnesting)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1]._texts.append(data)


def parse_html(html: str | bytes) -> Element:
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


def resolve_href(page_url: str, href: str | None) -> str:
    """WebDriver's get_attribute('href') returns the absolutized URL."""
    if href is None:
        return ""
    return urljoin(page_url, href)
