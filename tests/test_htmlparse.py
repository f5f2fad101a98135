"""Mini-DOM selenium-semantics unit tests (pure Python, no Spark)."""

from text2mc_dataprocessor_spark.functions.htmlparse import parse_html, resolve_href


def test_class_token_matching():
    root = parse_html(
        '<div class="r-info featured">a</div>'
        '<div class="r-infox">b</div>'
        '<span class="x r-info">c</span>'
    )
    hits = root.find_all_by_class("r-info")
    assert [e.tag for e in hits] == ["div", "span"]  # token match, doc order


def test_text_concatenation_and_strip():
    # direct text renders before descendant text (interleaving is not
    # preserved — irrelevant for the reference's selectors, which only
    # read leaf anchors/attributes), whitespace collapsed + stripped
    root = parse_html("<div> Hello   there <b> big </b></div>")
    assert root.find_all_by_tag("div")[0].text() == "Hello there big"
    leaf = parse_html('<span class="tag"><a> City Build </a></span>')
    assert leaf.find_all_by_tag("a")[0].text() == "City Build"


def test_script_inner_html_raw():
    root = parse_html('<script>var x = { schematic: "a<b", };</script>')
    body = root.find_all_by_tag("script")[0].inner_html_text()
    assert 'schematic: "a<b",' in body


def test_void_and_misnested_tags_tolerated():
    root = parse_html("<div><img src=x><br><p>one<p>two</div><span>tail</span>")
    assert len(root.find_all_by_tag("p")) == 2
    assert root.find_all_by_tag("span")[0].text() == "tail"


def test_find_by_id_and_attrs():
    root = parse_html('<a id="downloadButton" href="/dl">x</a>')
    el = root.find_by_id("downloadButton")
    assert el is not None and el.attr("href") == "/dl"
    assert root.find_by_id("nope") is None


def test_resolve_href_absolutization():
    assert resolve_href("https://h.example/a/b/", "/project/x/") == "https://h.example/project/x/"
    assert resolve_href("https://h.example/a/b/", "c") == "https://h.example/a/b/c"
    assert resolve_href("https://h.example/", "https://other/z") == "https://other/z"
    assert resolve_href("https://h.example/", None) == ""


def test_bytes_input_and_bad_utf8():
    root = parse_html(b"<p>ok \xff\xfe</p>")
    assert "ok" in root.find_all_by_tag("p")[0].text()


# ---------------------------------------------------------------------------
# Differential suite: the fast tokenizer must build the IDENTICAL tree
# to the stdlib html.parser-based builder (the semantics reference).
# ---------------------------------------------------------------------------

from text2mc_dataprocessor_spark.functions.htmlparse import (  # noqa: E402
    _parse_fast,
    _parse_html_stdlib,
)


def _tree(el):
    return (el.tag, sorted(el.attrs.items()), el._texts,
            [_tree(c) for c in el.children])


def _assert_equivalent(s):
    fast = _parse_fast(s)
    if fast is None:  # fast path bailed -> parse_html uses stdlib wholesale
        return
    std = _parse_html_stdlib(s)
    assert _tree(fast) == _tree(std), repr(s)
    assert [e.tag for e in fast._all] == [e.tag for e in fast.iter()], repr(s)


ADVERSARIAL = [
    "",
    "plain text &amp; entities &#65; &#x42; &unknown; &broken &amp",
    "<div> Hello   there <b> big </b></div>",
    '<script>var x = { schematic: "a<b", };</script>',
    "<div><img src=x><br><p>one<p>two</div><span>tail</span>",
    "<!DOCTYPE html><html><body><!-- c --><p>x</p></body></html>",
    "<!-- unterminated",
    "<!-- with a > inside",
    "<!-- proper -- >loose close<p>t</p>",
    "<?php echo ?><p>t</p>",
    "<?unterminated",
    "<!bogus decl><p>u</p>",
    "<!bogus unterminated",
    "<p>a < b</p>",
    "<p>a <3 b</p>",
    "<p>x<",
    "<p>x</",
    "<p>x<!",
    "<br/><div/>x",
    "<script/>alert</script><p>y</p>",
    "<SCRIPT>x</SCRIPT>after",
    "<script>never closed",
    "<script>a</scriptx></script>b",
    "<style>p { color: red; } </ style >x</style><p>z</p>",
    "</><p>q</p>",
    "</div junk><p>r</p>",
    "</1><p>s</p>",
    "</ div><p>ws-endtag</p>",
    "<a href='/x' TITLE=\"T&amp;T\" data-x=1>t</a>",
    "<a foo>u</a>",
    "<a foo=>v</a>",
    "<a foo= bar>w</a>",
    "<a foo==x>y</a>",
    "<a foo='x' / >mixed-slash</a>",
    "<a foo=/>bare-slash-value</a>",
    "<b><i>misnest</b></i><p>after</p>",
    "<div class='a b'><div class='a'><span class='b'>n</span></div></div>",
    "<UL><LI>upper<li>case</ul>",
    "<em></em \t><p>after-endjunk</p>",
    "<div>&nbsp;&gt;x</div>",
    "<a b=\"x>y\">gt-in-quoted</a>",
    "<a b='x\"y'>quote-in-quoted</a>",
    "<a 'b'>quoted-attr-name</a>",
    # r5 fuzz-found divergences (code-review): the pre-strict grammar
    # segmented these as start tags where html.parser sees incomplete
    # input (text) or a different attr split. Both must now agree —
    # via wholesale fallback, which _assert_equivalent accepts.
    "<p != '>'",
    "<p f=='>",
    "<p f= '>x",
    "<p a='x' = 'y'>t</p>",
    "<p f='a>b'",
]


def test_fast_parser_differential_adversarial():
    for s in ADVERSARIAL:
        _assert_equivalent(s)


def test_fast_parser_fallback_cases():
    # constructs the fast path must route to the stdlib parser
    for s in ["<![CDATA[raw <b>]]><p>after</p>",
              "<a =foo>odd2</a>", "<a foo=\"x\"y>z</a>",
              "<abc", "<a href="]:
        assert _parse_fast(s) is None
        parse_html(s)  # and the public entry point still parses them


def test_fast_parser_differential_hypothesis():
    from hypothesis import given, settings, strategies as st

    alphabet = "<>/!?=-&;'\" \tabPcS[#]x0"

    @settings(max_examples=400, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=80))
    def check(s):
        _assert_equivalent(s)

    check()


def test_fast_parser_differential_seeded_fuzz():
    """Seeded random-markup fuzz (deterministic, no hypothesis budget).

    The r5 review found divergences at a ~1/4500 rate the 400-example
    hypothesis run missed; this pins 30k seeded cases (plus 30k
    tag-shaped ones) so the rate would have to fall below ~1/60k to
    slip through. Divergence here means the fast grammar accepted a
    segmentation the stdlib refuses — tighten _FAST_START, never relax
    the assert."""
    import random

    rng = random.Random(20260819)
    alphabet = "<>/='\"! abpdivf\t\nxq&;-:_.@,`%"
    for _ in range(30000):
        _assert_equivalent(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 28))))
    for _ in range(30000):
        parts = ["<p"]
        for _ in range(rng.randint(0, 4)):
            parts.append(rng.choice([" ", "  ", "/"]))
            parts.append("".join(rng.choice("af!='\"> x-:.@1")
                                 for _ in range(rng.randint(1, 6))))
        parts.append(rng.choice([">", "/>", "", "'>", '">']))
        _assert_equivalent("".join(parts) + rng.choice(["", "tail", "<b>t</b>"]))


def test_fast_parser_differential_fixture_corpus():
    from text2mc_dataprocessor_spark.sources import fixtures

    corpus = fixtures.generate_corpus(seed=7)
    fallbacks = 0
    for html in corpus.pages["html"]:
        if isinstance(html, (bytes, bytearray)):
            html = html.decode("utf-8", errors="replace")
        fast = _parse_fast(html)
        if fast is None:
            fallbacks += 1
            continue
        assert _tree(fast) == _tree(_parse_html_stdlib(html))
    # every generated page must take the fast path (they are well-formed)
    assert fallbacks == 0
