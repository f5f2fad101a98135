"""Generic HTML→text (functions/html2text.py): per-rule behavior, the
Java↔RE2 parity of the step chain (DuckDB replays ``html2text_sql``
verbatim — also the ``html_to_text`` driver query at corpus scale),
and the composed WARC → extract → WET distributed pipeline."""

import duckdb
import pandas as pd

from text2mc_dataprocessor_spark.functions.html2text import (
    html2text_sql,
    html_to_text,
    html_to_text_col,
)


def _convert(spark, html: str) -> str:
    df = spark.createDataFrame(pd.DataFrame({"html": [html.encode()]}))
    return html_to_text(df).collect()[0].text


def test_script_style_comments_dropped(spark):
    out = _convert(
        spark,
        "<body>keep<script>if (a < b) { x(); }</script>"
        "<style>p {color: red}</style><!-- secret -->also</body>",
    )
    assert "keep also" in out
    for bad in ("secret", "color", "x()"):
        assert bad not in out


def test_block_tags_become_lines_and_entities_decode(spark):
    out = _convert(
        spark,
        "<p>First para.</p><p>A &amp; B &lt;ok&gt;</p>"
        "<ul><li>one</li><li>two</li></ul>tail&nbsp;end",
    )
    assert out.splitlines()[0] == "First para."
    assert "A & B <ok>" in out
    assert "tail end" in out
    # double-escaped entity decodes ONE level, like a real parser
    assert "&lt;" in _convert(spark, "<p>literal &amp;lt; stays</p>")


def test_whitespace_collapse_and_edge_trim(spark):
    out = _convert(
        spark, "  <div>  spaced   out  </div>\n\n\n<div>end</div>  ")
    # blank source lines between blocks survive as ONE paragraph break
    assert out == "spaced out\n\nend"
    # each block tag contributes a newline: adjacent </div><div> is a
    # paragraph break too, a single <br> a plain line break
    assert _convert(spark, "<div>a</div><div>b</div>") == "a\n\nb"
    assert _convert(spark, "a<br>b") == "a\nb"


def test_sql_mirror_is_bit_identical(spark):
    """The DuckDB replay of HTML2TEXT_STEPS must reproduce the Spark
    output byte-for-byte on a nasty page (this parity is what makes
    the driver oracle meaningful)."""
    html = ("<html><head><title>T&amp;T</title><style>a{b}</style>"
            "<script>s<t&&u</script></head><body><!-- c -->"
            "<p> A&nbsp;B </p><br>C &#39;q&#39;  D\t\tE</body>")
    got_spark = _convert(spark, html)
    got_duck = duckdb.connect().execute(
        "SELECT " + html2text_sql("h") + " FROM (SELECT ? AS h)", [html]
    ).fetchone()[0]
    assert got_spark == got_duck


def test_warc_to_wet_pipeline(spark, tmp_path):
    """The composed distributed job: WARC blobs → warc_records →
    html_to_text → write_wet_archive → wet_records reads the texts
    back byte-identically."""
    import os

    from pyspark.sql import functions as F

    from text2mc_dataprocessor_spark.sources.warc import (
        encode_warc,
        warc_records,
        wet_records,
        write_wet_archive,
    )

    pages = [
        (f"https://h{i % 2}.example.com/p{i}",
         "2024-03-01T10:00:%02dZ" % i,
         f"<html><body><p>Doc {i} body &amp; more.</p></body></html>"
         .encode())
        for i in range(7)
    ]
    blobs = spark.createDataFrame(
        [(0, bytearray(encode_warc(pages)))], "file_id long, content binary")
    texts = html_to_text(warc_records(blobs)).select(
        "url", "warc_ts", "text")
    out_dir = str(tmp_path / "wet")
    idx = write_wet_archive(texts, out_dir, records_per_file=4).toPandas()
    assert idx.error.isna().all() and len(idx) == 7
    back = wet_records(spark.createDataFrame(
        [(i, bytearray(open(os.path.join(out_dir, f), "rb").read()))
         for i, f in enumerate(sorted(set(idx.filename)))],
        "file_id long, content binary",
    )).orderBy("url").collect()
    assert {r.url: r.text for r in back} == {
        u: f"Doc {i} body & more." for i, (u, _, _) in enumerate(pages)}


def test_prefix_sharing_tags_are_not_block_tags(spark):
    """ADVICE r4: <pre>/<param>/<picture>/<progress>/<link> share a
    name prefix with block tags (p, pr…) but are NOT in the block set —
    they must become a space (generic tag delete), not a newline."""
    out = _convert(
        spark,
        "a<pre>x</pre>b<param name=q>c<picture>y</picture>d"
        "<progress>z</progress>e<link rel=s>f",
    )
    assert "\n" not in out
    assert out == "a x b c y d z e f"
    # real block tags with attributes / self-closing slash still break
    assert _convert(spark, 'a<p class="x">b</p>c<br/>d').splitlines()[0] == "a"
