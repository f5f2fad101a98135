"""Gopher quality/repetition rules (operators/quality.py) — each rule
in isolation, the top-n-gram argmax determinism + clamp, and the
composed gopher_clean gate. The corpus-scale hash checks vs the DuckDB
mirrors are the ``gopher_quality_flags`` / ``gopher_repetition_stats``
driver queries."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.operators.quality import (
    gopher_clean,
    gopher_quality,
    gopher_repetition,
    top_ngram_char_frac,
)

# 57 distinct words (so no repeated n-gram anywhere), stop words
# present, mean word length in range
GOOD = " ".join(
    f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}" for i in range(8)
) + " the cat sat of mats and dogs that bark have fun with joy be well to all"


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def _qmap(spark, texts):
    out = gopher_quality(_docs(spark, texts)).toPandas()
    return {r.doc_id: r for r in out.itertuples()}


def test_quality_word_count_and_stop_words(spark):
    got = _qmap(spark, [
        GOOD,                                   # passes everything
        "too few words here.",                  # < 50 words
        " ".join(f"w{i}" for i in range(60)),   # no stop words
    ])
    assert got[0].gopher_quality_ok
    assert got[0].word_count == 57 and not got[1].gopher_quality_ok
    assert got[2].n_stop_words == 0 and not got[2].gopher_quality_ok


def test_quality_symbol_ratios_and_lines(spark):
    got = _qmap(spark, [
        GOOD + " " + "# " * 10,                    # hash ratio > 0.1
        GOOD + " wait... then... more... so...  done... now... yes...",
        GOOD + "\n" + "\n".join(f"- b{i} item" for i in range(20)),
        GOOD + "\n" + "\n".join(f"line {i} trails..." for i in range(3)),
    ])
    assert got[0].hash_word_ratio > 0.1 and not got[0].gopher_quality_ok
    assert got[1].ellipsis_word_ratio > 0.1 and not got[1].gopher_quality_ok
    assert got[2].bullet_line_frac > 0.9 and not got[2].gopher_quality_ok
    assert got[3].ellipsis_line_frac > 0.3 and not got[3].gopher_quality_ok


def test_quality_mean_word_len_and_alpha(spark):
    long_words = " ".join("superlongword%d" % i for i in range(60))
    digits = GOOD + " " + " ".join("123" for _ in range(20))
    got = _qmap(spark, [long_words, digits])
    assert got[0].mean_word_len > 10 and not got[0].gopher_quality_ok
    assert got[1].alpha_word_frac < 0.8 and not got[1].gopher_quality_ok


def test_quality_empty_text_is_rejected_not_crashed(spark):
    got = _qmap(spark, ["", "   "])
    assert got[0].word_count == 0 and not got[0].gopher_quality_ok
    assert got[1].word_count == 0 and not got[1].gopher_quality_ok


def test_repetition_dup_lines_and_paras(spark):
    tripled = "unique opening line\n" + "same line\n" * 5
    dup_para = "para one is here\n\npara two\n\npara two"
    out = gopher_repetition(_docs(spark, [tripled, dup_para])).toPandas()
    r0, r1 = out.sort_values("doc_id").itertuples()
    assert r0.dup_line_frac == pytest.approx(4 / 6)
    assert r0.dup_line_char_frac == pytest.approx(
        1 - (len("unique opening line") + len("same line"))
        / (len("unique opening line") + 5 * len("same line")))
    assert not r0.gopher_repetition_ok
    assert r1.dup_para_frac == pytest.approx(1 / 3)
    assert not r1.gopher_repetition_ok


def test_top_ngram_overlap_clamped_and_short_docs(spark):
    out = top_ngram_char_frac(
        _docs(spark, ["aaa " * 60, "one word", "solo"]), n=2
    ).toPandas().sort_values("doc_id")
    fracs = list(out.top_2gram_char_frac)
    assert fracs[0] == 1.0          # overlapping "aaa aaa" clamps at 1
    assert fracs[1] == 1.0          # a 2-word doc IS its own top 2-gram
    assert fracs[2] == 0.0          # fewer words than n -> 0


def test_top_ngram_counts_and_tiebreak(spark):
    # "b c" occurs twice (mass 2·2=4); singles have mass 2; total 7 chars
    txt = "a b c d b c e"
    out = top_ngram_char_frac(_docs(spark, [txt]), n=2).toPandas()
    assert out.top_2gram_char_frac[0] == pytest.approx(2 * 2 / 7)
    # all 2-grams distinct and equal mass -> lexicographically smallest
    # wins; value is its mass / total regardless, determinism is what
    # the repeated-run equality checks
    tie = "aa bb cc dd"
    a = top_ngram_char_frac(_docs(spark, [tie]), n=2).toPandas()
    b = top_ngram_char_frac(_docs(spark, [tie]), n=2).toPandas()
    assert a.top_2gram_char_frac[0] == b.top_2gram_char_frac[0]


def test_gopher_clean_composes_and_passes_through(spark):
    df = _docs(spark, [GOOD, "tiny.", GOOD + "\n" + "dup\n" * 9]) \
        .withColumn("extra", F.lit("keep"))
    out = gopher_clean(df).toPandas()
    assert list(out.doc_id) == [0]
    assert list(out.columns) == ["doc_id", "text", "extra"]
    assert out.extra[0] == "keep"


def test_repeated_ngram_coverage(spark):
    from text2mc_dataprocessor_spark.operators.quality import (
        repeated_ngram_char_fracs,
    )

    docs = _docs(spark, [
        "a b c d e f g a b c d e f g x",   # dup 5-grams cover 14/15 words
        "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9",   # all distinct -> 0
        "",                                  # empty -> 0, no crash
    ])
    out = repeated_ngram_char_fracs(docs, ns=(5, 10)).toPandas() \
        .sort_values("doc_id")
    assert list(out.rep_5gram_char_frac) == pytest.approx([14 / 15, 0.0, 0.0])
    assert list(out.rep_10gram_char_frac) == [0.0, 0.0, 0.0]


def test_repetition_with_rep_ngrams_gates(spark):
    from text2mc_dataprocessor_spark.operators.quality import (
        gopher_repetition,
    )

    # 60 distinct words, then the first 10 re-appended: repeated
    # 5..10-grams cover ~20/70 words (> all caps) but no line dups
    words = [f"word{i}x" for i in range(60)]
    txt = " ".join(words + words[:10])
    out = gopher_repetition(
        _docs(spark, [txt]), rep_ngram_ns=(5, 6, 7, 8, 9, 10)
    ).toPandas()
    assert out.rep_5gram_char_frac[0] > 0.15
    assert not out.gopher_repetition_ok[0]
    # without rep ngrams the same doc passes (top-n-gram mass is tiny)
    out2 = gopher_repetition(_docs(spark, [txt])).toPandas()
    assert out2.gopher_repetition_ok[0]


def test_pure_jvm_plans_have_no_exchange_or_python(spark):
    """gopher_quality / c4_clean / scrub_pii must stay single-stage:
    no shuffle Exchange, no Python eval — the 100 TB posture is 'rides
    the scan'."""
    from text2mc_dataprocessor_spark.operators.quality import gopher_quality
    from text2mc_dataprocessor_spark.operators.textclean import (
        c4_clean,
        scrub_pii,
    )

    docs = _docs(spark, [GOOD])
    for df in (gopher_quality(docs), c4_clean(docs), scrub_pii(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ngram_metrics_arrow_matches_relational(spark):
    """The zero-shuffle Arrow path must be bit-identical to the
    relational (keyed-shuffle) mirror on every n-gram metric —
    including the whitespace edge cases where Java split/trim
    semantics bite (leading/trailing runs kept as empty tokens, NBSP
    is NOT whitespace, trim strips spaces only)."""
    texts = [
        GOOD,
        "spam ham spam ham spam ham spam ham spam ham eggs",
        ("one two three four five six seven " * 4) + "tail",
        "aaa aaa aaa aaa aaa aaa aaa aaa",           # self-overlap clamp
        "  leading spaces then\nnewline\tand tab  ",
        "\nleading newline kept as empty token",
        "trailing newline token kept\n",
        "nbsp is not whitespace here at all",
        "",
        "   ",
        "one",
        "Mixed CASE Words mixed case WORDS mixed case words",
        # r5 review: tabs-only text splits (Java trim strips spaces
        # only) into >= n EMPTY tokens → 0 total chars; the relational
        # 0/0 threw DIVIDE_BY_ZERO under ANSI while Arrow returned 0.0
        "\t\t",
        "\t\n\t \n",
    ]
    docs = _docs(spark, texts)
    ns, rep = (2, 3, 4), (5, 6, 7, 8, 9, 10)
    cols = [f"top_{n}gram_char_frac" for n in ns] + [
        f"rep_{n}gram_char_frac" for n in rep]
    a = gopher_repetition(docs, ngram_ns=ns, rep_ngram_ns=rep,
                          impl="arrow").select("doc_id", *cols).toPandas()
    r = gopher_repetition(docs, ngram_ns=ns, rep_ngram_ns=rep,
                          impl="relational").select("doc_id", *cols).toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    r = r.sort_values("doc_id").reset_index(drop=True)
    for c in cols:
        assert list(a[c]) == list(r[c]), c


def test_gopher_repetition_arrow_plan_has_no_exchange(spark):
    """The point of the Arrow path: the entire repetition family is a
    projection — no Exchange anywhere in the plan."""
    docs = _docs(spark, [GOOD] * 4)
    plan = gopher_repetition(
        docs, rep_ngram_ns=(5, 6, 7, 8, 9, 10)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
