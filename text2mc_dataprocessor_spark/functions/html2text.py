"""HTML → plain text, JVM-side: the WARC→WET conversion step.

Common Crawl derives each .wet file from its .warc by stripping markup
from the response bodies (the reference scraper instead picks specific
DOM nodes — that byte-identical path is ``functions/extract.py`` over
the mini-DOM in ``functions/htmlparse.py``). This module is the
corpus-scale counterpart for GENERIC pages: a fixed chain of
``regexp_replace`` column expressions, so a 100 TB archive converts
inside the scan stage with no Python worker in the loop — compose
``warc_records`` → ``html_to_text_col`` → ``write_wet_archive`` for a
distributed WARC→WET job (pytest-checked end-to-end).

Exact semantics (the DuckDB oracle ``html_to_text`` runs the IDENTICAL
pattern strings — the chain stays inside the Java-regex ∩ RE2 dialect:
``(?is)`` inline flags, lazy ``.*?``, char classes; no lookarounds, no
backreferences):

1. drop ``<script>``/``<style>`` elements wholesale (their text is
   code, not content) and HTML comments ``<!-- … -->``;
2. BLOCK-boundary tags (p, div, br, li, tr, h1-h6, title closers, …)
   become a newline — layout structure survives as line structure;
3. every remaining tag is deleted;
4. the five predefined character entities plus ``&nbsp;``/``&#160;``
   are decoded (``&amp;`` LAST, so ``&amp;lt;`` decodes to the literal
   ``&lt;`` exactly like a real parser);
5. horizontal whitespace collapses to one space, space around newlines
   is dropped, 3+ newlines collapse to 2 (paragraph break), and the
   result is trimmed.

Numeric/named entities beyond the predefined set are out of scope
(documented): full entity tables are a per-row lookup task, not a
regex — the mini-DOM path handles reference pages that need them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ordered (pattern, replacement) chain — the module contract. Kept as
#: data so the DuckDB oracle and any auditor can replay it verbatim.
HTML2TEXT_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    # \b after the name keeps prefix-sharing tags (<pre>, <param>,
    # <picture>, <link>, …) OUT of the block set — they fall through to
    # the generic tag-delete step and become a space, not a newline.
    (r"(?i)</?(p|div|br|li|ul|ol|tr|table|h[1-6]|title|header|footer|"
     r"section|article|blockquote)\b[^>]*>", "\n"),
    (r"(?s)<[^>]*>", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"(&nbsp;|&#160;)", " "),
    (r"&amp;", "&"),
    (r"[ \t\r]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{3,}", "\n\n"),
    # SQL trim() strips spaces only, in Spark and DuckDB alike — edge
    # newlines need their own steps
    (r"^\n+", ""),
    (r"\n+$", ""),
)


def html2text_sql(expr: str) -> str:
    """The IDENTICAL chain as a nested DuckDB ``regexp_replace`` SQL
    expression over ``expr`` — the oracle replays the module contract
    verbatim (patterns in non-escaping '' literals so regex
    backslashes survive; newline replacements via chr(10))."""
    for pat, repl in HTML2TEXT_STEPS:
        p = pat.replace("'", "''")
        r = "chr(10)" if repl == "\n" else "'" + repl.replace("'", "''") + "'"
        expr = f"regexp_replace({expr}, '{p}', {r}, 'g')"
    return f"trim({expr})"


def html_to_text_col(html: Column) -> Column:
    """The conversion as one column expression (fold of the step
    chain + trim); input is the decoded HTML string column."""
    out = html
    for pat, repl in HTML2TEXT_STEPS:
        out = F.regexp_replace(out, pat, repl)
    return F.trim(out)


def html_to_text(pages: DataFrame, html_col: str = "html",
                 text_col: str = "text",
                 binary: bool = True) -> DataFrame:
    """Append ``text_col`` extracted from ``html_col``. ``binary``
    decodes UTF-8 bytes first (the ``warc_records`` output shape);
    pass False when the column is already a string."""
    src = F.col(html_col)
    if binary:
        src = F.decode(src, "UTF-8")
    return pages.withColumn(text_col, html_to_text_col(src))
