"""C4-style line/page cleaning rules (operators/textclean.py) — each
rule exercised in isolation plus the reassembly order and passthrough
columns. The corpus-scale hash check against the DuckDB mirror is the
``c4_line_clean`` driver query."""

import pandas as pd

from text2mc_dataprocessor_spark.operators.textclean import c4_clean


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "extra", "text"])
    )


def _clean_map(spark, rows, **kw):
    out = c4_clean(_docs(spark, rows), **kw).toPandas()
    return {r.doc_id: (r.text, r.n_kept_lines) for r in out.itertuples()}


GOOD = "This line is fine.\nAnother good line here!\nAnd a third one?"


def test_line_rules(spark):
    rows = [
        # terminal punctuation required: middle line dropped
        (0, "a", "One good line stays.\nno terminal punct\nSecond good line stays.\nThird good line stays."),
        # word-count floor: two-word line dropped
        (1, "b", "Too short.\nLong enough line one.\nLong enough line two.\nLong enough line three."),
        # javascript mention dropped even when otherwise well-formed
        (2, "c", GOOD + "\nPlease enable JavaScript to continue."),
    ]
    got = _clean_map(spark, rows)
    assert got[0][1] == 3 and "no terminal punct" not in got[0][0]
    assert got[1][1] == 3 and "Too short." not in got[1][0]
    assert got[2][1] == 3 and "JavaScript" not in got[2][0]


def test_page_rules(spark):
    rows = [
        (0, "a", GOOD),                          # survives (3 kept lines)
        (1, "b", "Only one good line here."),    # < min_kept_lines
        (2, "c", GOOD + "\nlorem ipsum dolor."),  # marker drops the page
        (3, "d", GOOD + "\nvar x = {1};"),        # curly brace drops it
    ]
    got = _clean_map(spark, rows)
    assert set(got) == {0}
    assert got[0] == (GOOD, 3)


def test_order_preserved_and_columns_pass_through(spark):
    text = "Zeta comes first here.\nskip\nAlpha comes second here."
    out = c4_clean(
        _docs(spark, [(7, "keepme", text)]), min_kept_lines=2
    ).toPandas()
    assert list(out.columns) == ["doc_id", "extra", "text", "n_kept_lines"]
    assert out.extra[0] == "keepme"
    assert out.text[0] == "Zeta comes first here.\nAlpha comes second here."


def test_lines_trimmed_in_output(spark):
    text = "  Padded line stays here.  \nAnother padded line stays.\nA third padded line stays."
    out = c4_clean(_docs(spark, [(1, "x", text)])).toPandas()
    assert out.text[0].startswith("Padded line stays here.")
    assert out.n_kept_lines[0] == 3


def test_scrub_pii_rewrites_and_counts(spark):
    from text2mc_dataprocessor_spark.operators.textclean import scrub_pii

    rows = [
        (0, "x", "mail a.b-c_d@sub.example.co.uk now"),
        (1, "y", "host 192.168.0.1 and 8.8.8.8 up"),
        (2, "z", "user@1.2.3.4 stays ip-ish"),   # no TLD -> not an email
        (3, "w", "nothing to scrub here"),
    ]
    out = {r.doc_id: r for r in scrub_pii(_docs(spark, rows)).toPandas().itertuples()}
    assert out[0].text == "mail <EMAIL> now" and out[0].n_emails == 1
    assert out[1].text == "host <IP> and <IP> up" and out[1].n_ips == 2
    assert out[2].text == "user@<IP> stays ip-ish"
    assert (out[2].n_emails, out[2].n_ips) == (0, 1)
    assert out[3].text == rows[3][2] and out[3].n_emails == 0
    # schema: text rewritten in place, counts appended, others pass through
    assert out[0].extra == "x"


def test_scrub_pii_custom_tokens(spark):
    from text2mc_dataprocessor_spark.operators.textclean import scrub_pii

    out = scrub_pii(
        _docs(spark, [(0, "a", "see a@b.io at 1.2.3.4")]),
        email_token="[E]", ip_token="[I]",
    ).toPandas()
    assert out.text[0] == "see [E] at [I]"


def test_badwords_filter_tokens_and_phrases(spark):
    from text2mc_dataprocessor_spark.operators.textclean import (
        badwords_filter,
    )

    rows = [
        (0, "a", "clean text with nothing bad at all"),
        (1, "b", "contains BadWord here"),            # case-insensitive
        (2, "c", "some bad phrase here twice: bad phrase here"),
        (3, "d", "badword and bad phrase here both"),
        (4, "e", "badwordish is NOT a match"),        # whole-word only
    ]
    out = {r.doc_id: r for r in badwords_filter(
        _docs(spark, rows), ["badword", "Bad Phrase Here"]
    ).toPandas().itertuples()}
    assert out[0].n_badwords == 0 and out[0].badwords_ok
    assert out[1].n_badwords == 1 and not out[1].badwords_ok
    assert out[2].n_badwords == 2 and not out[2].badwords_ok
    assert out[3].n_badwords == 2 and not out[3].badwords_ok
    assert out[4].n_badwords == 0 and out[4].badwords_ok
    # passthrough columns intact
    assert out[1].extra == "b"


def test_badwords_filter_hof_and_join_paths_agree(spark, monkeypatch):
    """r6 optimization: short token lists count via a zero-shuffle
    higher-order filter instead of explode + broadcast join + join-back.
    The two paths must agree bit-for-bit (counts, flags, column order)
    and the fast path's plan must be join-free."""
    import text2mc_dataprocessor_spark.operators.textclean as tc

    rows = [
        (0, "a", "badtokena end Bad Phrase Two here"),
        (1, "b", ""),
        (2, "c", "nothing bad here"),
        (3, "d", "BADTOKENA badtokena badtokenb bad phrase two bad phrase two"),
        (4, "e", "  spaced   badtokena\ttabbed  "),
        (5, "f", "punct badtokena, not a word-match"),
    ]
    bw = ["badtokena", "badtokenb", "Bad Phrase Two"]
    fast_df = tc.badwords_filter(_docs(spark, rows), bw)
    fast = fast_df.orderBy("doc_id").collect()
    assert "Join" not in fast_df._jdf.queryExecution().executedPlan().toString()
    monkeypatch.setattr(tc, "_HOF_TOKEN_MAX", -1)  # force the join shape
    slow_df = tc.badwords_filter(_docs(spark, rows), bw)
    assert slow_df.columns == fast_df.columns
    assert [tuple(r) for r in fast] == [
        tuple(r) for r in slow_df.orderBy("doc_id").collect()]


def test_scrub_pii_ip_count_matches_replacements(spark):
    """ADVICE r4: an IPv4-shaped substring inside a matched email
    (user@1.2.3.4.example.com) is consumed by the email replace — n_ips
    must count replacements actually made, not raw-text matches."""
    from text2mc_dataprocessor_spark.operators.textclean import scrub_pii

    rows = [(0, "a", "mail user@1.2.3.4.example.com plus real 5.6.7.8")]
    out = scrub_pii(_docs(spark, rows)).toPandas()
    assert out.text[0] == "mail <EMAIL> plus real <IP>"
    assert (int(out.n_emails[0]), int(out.n_ips[0])) == (1, 1)
    assert out.text[0].count("<IP>") == int(out.n_ips[0])
