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
