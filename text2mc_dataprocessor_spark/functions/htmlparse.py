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

import re

from html import unescape
from html.parser import HTMLParser, commentclose, tagfind_tolerant
from urllib.parse import urljoin

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# class-attr string → split token tuple (class strings repeat across
# elements and pages; splitting each once per process is enough)
_CLASS_SPLIT_MEMO: dict[str, tuple[str, ...]] = {}


class Element:
    __slots__ = ("tag", "attrs", "children", "parent", "_texts", "_all", "_idx")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Element | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Element] = []
        self.parent = parent
        self._texts: list[str] = []  # direct text chunks, interleaved order not kept
        # document-order flat index of every descendant element —
        # populated on the root by both parsers so whole-document
        # find_all_* queries skip the tree walk
        self._all: list[Element] | None = None
        # lazy (class-token, tag, id) lookup tables over _all — built in
        # ONE pass on the first whole-document query so each further
        # query is a dict hit instead of a full scan
        self._idx: tuple[dict, dict, dict] | None = None

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
        # iterative preorder (document order): ~3x the recursive
        # generator chain on the deep trees real pages produce
        stack = [self]
        pop = stack.pop
        while stack:
            e = pop()
            yield e
            if e.children:
                stack.extend(reversed(e.children))

    def _scan(self):
        # the root's flat index includes the root itself first (same as
        # iter()); subtree queries fall back to the preorder walk
        if self._all is not None:
            return self._all
        return self.iter()

    def _indexes(self) -> tuple[dict, dict, dict]:
        """Build (class-token, tag, id) → document-order element lists
        in one pass over the root's flat index. Only called when
        ``_all`` is populated (i.e. on parse roots); lists keep document
        order because ``_all`` does."""
        if self._idx is None:
            by_class: dict[str, list[Element]] = {}
            by_tag: dict[str, list[Element]] = {}
            by_id: dict[str, Element] = {}
            split_memo = _CLASS_SPLIT_MEMO
            for e in self._all:
                attrs = e.attrs
                if attrs:
                    c = attrs.get("class")
                    if c is not None:
                        toks = split_memo.get(c)
                        if toks is None:
                            toks = tuple(c.split())
                            if len(split_memo) < 4096:
                                split_memo[c] = toks
                        for tok in toks:
                            lst = by_class.get(tok)
                            if lst is None:
                                by_class[tok] = [e]
                            else:
                                lst.append(e)
                    i = attrs.get("id")
                    if i is not None and i not in by_id:
                        by_id[i] = e
                t = e.tag
                lst = by_tag.get(t)
                if lst is None:
                    by_tag[t] = [e]
                else:
                    lst.append(e)
            self._idx = (by_class, by_tag, by_id)
        return self._idx

    def find_all_by_class(self, token: str) -> list["Element"]:
        if self._all is not None:
            return list(self._indexes()[0].get(token, ()))
        out = []
        for e in self._scan():
            c = e.attrs.get("class")
            if c is not None and token in c.split():
                out.append(e)
        return out

    def find_all_by_tag(self, tag: str) -> list["Element"]:
        if self._all is not None:
            return list(self._indexes()[1].get(tag, ()))
        return [e for e in self._scan() if e.tag == tag]

    def find_by_id(self, eid: str) -> "Element | None":
        if self._all is not None:
            return self._indexes()[2].get(eid)
        for e in self._scan():
            if e.attrs.get("id") == eid:
                return e
        return None


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("#document", {}, None)
        self.stack = [self.root]
        self._elements = [self.root]  # document order, for root._all
        self._in_script = False

    def handle_starttag(self, tag, attrs):
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(el)
        self._elements.append(el)
        if tag == "script":
            self._in_script = True
            self.stack.append(el)
        elif tag not in _VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(el)
        self._elements.append(el)

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


# ---------------------------------------------------------------------------
# Fast tokenizer (the extraction hot path)
# ---------------------------------------------------------------------------
# A regex tokenizer that builds the IDENTICAL Element tree to the
# html.parser-based ``_TreeBuilder`` above, ~3x faster (the stdlib
# parser spends most of its time in goahead() dispatch, updatepos()
# bookkeeping and per-callback method layers). Equivalence contract:
# every construct the fast path consumes is handled exactly as CPython
# 3.11 html/parser.py handles it (same tolerant regex languages, same
# recovery on unterminated constructs, same charref conversion); any
# construct outside the fast set — marked sections ``<![``, start tags
# the strict tag regex rejects — aborts the fast parse and the WHOLE
# document is re-parsed with the stdlib builder, so exotic inputs get
# stdlib behavior by construction. tests/test_htmlparse.py runs a
# differential suite (fixture corpus + adversarial + hypothesis random
# markup) asserting tree equality between both parsers.

# start tag: strict subset of tagfind_tolerant/attrfind_tolerant —
# whitespace-separated attrs with conservative names
# ([a-zA-Z_:] then word/-/./: chars), a single '=', quoted / bare /
# empty values (bare values may not START with '='). Anything this
# rejects — '/'-separated attrs, punctuation-only or quote names,
# 'a==b' multi-equals, '= <quoted>' where the quote could be read as
# a name — falls back to the stdlib parser wholesale. The name/value
# restrictions are what make the subset SAFE: whenever the strict
# grammar stops early, the next char is one no continuation
# (`\s+name`, `\s*=`, `\s*/?>`) can start with, so the whole match
# fails and the document takes the stdlib path instead of silently
# segmenting a tag differently than html.parser would (fuzz-found
# r5: "<p != '>'" and "<p f=='>" built trees the stdlib refuses).
_FAST_START = re.compile(
    r"<([a-zA-Z][^\t\n\r\f />\x00]*)"
    r"((?:\s+[a-zA-Z_:][-.\w:]*"
    r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^>\s'\"=][^>\s]*|(?=[\s>])))?"
    r")*)"
    r"\s*(/?)>"
)
# the SAME attr grammar, anchored, for stepping over the captured
# blob (end-of-blob stands in for the `\s*/?>` boundary). Stepping
# with .match + a full-consumption check — not a laxer finditer —
# guarantees the blob segmentation is the one _FAST_START validated.
_FAST_ATTR = re.compile(
    r"\s+([a-zA-Z_:][-.\w:]*)"
    r"(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^>\s'\"=][^>\s]*|(?=\s|\Z)))?"
)
# end tag: html.parser's endtagfind, verbatim
_FAST_END = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
# CDATA close: html.parser's set_cdata_mode interesting regex, verbatim
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.I),
    "style": re.compile(r"</\s*style\s*>", re.I),
}
_ASCII_LETTERS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
)

# attr-blob → parsed attrs memo. Real pages repeat the same start tags
# constantly (every `<div class="comment">`, nav item, …), so the attr
# regex loop re-derives identical dicts thousands of times per task.
# Parsing is a pure function of the blob, and Element never mutates its
# attrs dict after construction (grep-audited), so sharing one dict per
# distinct blob is safe. Only digit-free short blobs are inserted —
# blobs embedding ids (`href="/project/b123/"`) are one-shot and would
# churn the table — with a hard cap as backstop.
_ATTRS_MEMO: dict[str, dict[str, str]] = {}
# end-tag slice → lowered tag name ("</div>" → "div"): end tags are a
# handful of distinct strings per corpus, so the _FAST_END regex only
# runs on first sight of each
_END_MEMO: dict[str, str] = {}
_HAS_DIGIT = re.compile(r"\d")


def _pop_to(stack: list[Element], tag: str) -> None:
    """Pop to the matching open tag if present (tolerant of misnesting)
    — same loop as _TreeBuilder.handle_endtag."""
    if stack[-1].tag == tag:  # well-nested fast path
        stack.pop()
        return
    for i in range(len(stack) - 2, 0, -1):
        if stack[i].tag == tag:
            del stack[i:]
            break


def _parse_fast(html: str) -> Element | None:
    """One-pass tokenizer. Returns the tree, or None → caller must
    re-parse with the stdlib builder."""
    root = Element("#document", {}, None)
    stack = [root]
    all_els = [root]
    find = html.find
    i, n = 0, len(html)

    def _data(chunk: str) -> None:
        # goahead() convert_charrefs path: handle_data(unescape(chunk))
        stack[-1]._texts.append(unescape(chunk) if "&" in chunk else chunk)

    def _recover(at: int) -> int:
        # goahead()'s k<0 recovery at end-of-input: emit up to (and
        # including) the next '>', else up to the next '<', else one char
        k = find(">", at + 1)
        if k < 0:
            k = find("<", at + 1)
            if k < 0:
                k = at + 1
        else:
            k += 1
        _data(html[at:k])
        return k

    while i < n:
        lt = find("<", i)
        if lt < 0:
            if i < n:
                _data(html[i:])
            break
        if lt > i:
            _data(html[i:lt])
        c = html[lt + 1 : lt + 2]
        if c in _ASCII_LETTERS:  # starttagopen
            m = _FAST_START.match(html, lt)
            if m is None:
                # exotic or truncated start tag -> stdlib semantics
                return None
            tag, blob, selfclose = m.group(1, 2, 3)
            tag = tag.lower()
            if blob:
                cached = _ATTRS_MEMO.get(blob)
                if cached is not None:
                    attrs = cached
                else:
                    attrs = {}
                    pos, blen = 0, len(blob)
                    while pos < blen:
                        am = _FAST_ATTR.match(blob, pos)
                        if am is None or am.end() == pos:
                            # blob segmentation disagrees with the tag
                            # match (should be unreachable) -> stdlib
                            return None
                        v = am.group(2)
                        if v is None or not v:
                            v = ""
                        elif v[0] in "\"'":
                            v = v[1:-1]
                        if v and "&" in v:
                            v = unescape(v)
                        attrs[am.group(1).lower()] = v
                        pos = am.end()
                    if blen < 256 and _HAS_DIGIT.search(blob) is None:
                        if len(_ATTRS_MEMO) >= 4096:
                            _ATTRS_MEMO.clear()
                        _ATTRS_MEMO[blob] = attrs
            else:
                attrs = {}
            el = Element(tag, attrs, stack[-1])
            stack[-1].children.append(el)
            all_els.append(el)
            i = m.end()
            if selfclose:  # '/>' -> handle_startendtag: leaf, no CDATA mode
                continue
            if tag in _CDATA_CLOSE:
                # set_cdata_mode: raw data (no charref conversion) up to
                # the matching end tag; unterminated -> content dropped
                stack.append(el)
                em = _CDATA_CLOSE[tag].search(html, i)
                if em is None:
                    break
                if em.start() > i:
                    el._texts.append(html[i : em.start()])
                _pop_to(stack, tag)
                i = em.end()
            elif tag not in _VOID_TAGS:
                stack.append(el)
        elif c == "/":
            gt = find(">", lt + 1)
            if gt < 0:  # parse_endtag -> -1 -> recovery
                i = _recover(lt)
                continue
            # memo hit: the whole slice is a known well-formed end tag.
            # _FAST_END's grammar admits no '>' before its final one, so
            # a successful match always ends exactly at gt+1 — caching
            # slice → name reproduces the regex byte-for-byte.
            sl = html[lt : gt + 1]
            tagname = _END_MEMO.get(sl)
            if tagname is not None:
                if stack[-1].tag == tagname:  # well-nested fast path
                    stack.pop()
                else:
                    _pop_to(stack, tagname)
                i = gt + 1
                continue
            m = _FAST_END.match(html, lt)
            if m is not None:
                tagname = m.group(1).lower()
                if len(sl) < 64 and _HAS_DIGIT.search(sl) is None:
                    if len(_END_MEMO) >= 4096:
                        _END_MEMO.clear()
                    _END_MEMO[sl] = tagname
                _pop_to(stack, tagname)
                i = m.end()
                continue
            if html[lt : lt + 3] == "</>":
                i = lt + 3
                continue
            nm = tagfind_tolerant.match(html, lt + 2)
            if nm is not None:
                # '</tag junk>' -> handle_endtag(tag), skip to '>'
                _pop_to(stack, nm.group(1).lower())
                i = find(">", nm.end()) + 1
            else:
                # parse_bogus_comment: skip to '>', no event
                i = gt + 1
        elif c == "!":
            if html[lt : lt + 4] == "<!--":
                em = commentclose.search(html, lt + 4)
                if em is None:
                    i = _recover(lt)
                else:
                    i = em.end()
            elif html[lt : lt + 3] == "<![":
                return None  # marked section -> stdlib semantics
            elif html[lt : lt + 9].lower() == "<!doctype":
                gt = find(">", lt + 9)
                i = _recover(lt) if gt < 0 else gt + 1
            else:
                gt = find(">", lt + 2)  # parse_bogus_comment
                i = _recover(lt) if gt < 0 else gt + 1
        elif c == "?":
            gt = find(">", lt + 2)  # parse_pi
            i = _recover(lt) if gt < 0 else gt + 1
        elif c:
            # stray '<': its own data chunk, advance one
            _data("<")
            i = lt + 1
        else:
            # lone '<' as the last char: flushed as data on close()
            _data("<")
            break
    root._all = all_els
    return root


def _parse_html_stdlib(html: str) -> Element:
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    b.root._all = b._elements
    return b.root


def parse_html(html: str | bytes) -> Element:
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    root = _parse_fast(html)
    if root is None:
        root = _parse_html_stdlib(html)
    return root


def resolve_href(page_url: str, href: str | None) -> str:
    """WebDriver's get_attribute('href') returns the absolutized URL."""
    if href is None:
        return ""
    return urljoin(page_url, href)
