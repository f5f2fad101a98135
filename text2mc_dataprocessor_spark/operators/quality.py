"""Gopher-style document quality and repetition filters.

The Gopher / MassiveText data pipeline (Rae et al. 2021, "Scaling
Language Models: Methods, Analysis & Insights from Training Gopher",
§A.1.1 — public paper) filters web documents with deterministic
quality heuristics and repetition caps; every serious web-text
pipeline since (MassiveWeb, RefinedWeb, Dolma, FineWeb) reuses the
same rule family. This module implements them Spark-first:

- ``gopher_quality``: document-level quality metrics + verdict as ONE
  pure-JVM projection (split/aggregate/filter higher-order
  expressions — no Python, no shuffle; at 100 TB the whole pass stays
  inside the scan stage with the text column pruned straight out of
  parquet).
- ``gopher_repetition``: duplicate line/paragraph fractions (pure-JVM,
  ``array_distinct`` over the split arrays) and the top-n-gram
  character-fraction caps (n = 2, 3, 4). Top-n-gram needs a per-doc
  mode, which no higher-order expression gives — that path explodes
  (doc_id, ngram) and aggregates: one shuffle per n, keyed on
  (doc_id, ngram) so a skewed corpus still spreads (a single doc's
  n-grams hash across partitions; the final per-doc max is a tiny
  (doc_id, frac) aggregate).
- ``gopher_clean``: the composed keep-filter.

Exact definitions (the DuckDB oracle ``gopher_quality_flags`` /
``gopher_top_ngram`` mirrors these literally):

- words = whitespace-split of trimmed text; word_count its size (0 for
  all-whitespace text). mean_word_len = sum(len(word)) / word_count.
- symbol ratios: non-overlapping occurrence counts of ``#`` and of
  ``...`` / ``…`` (counted via length-delta under ``replace``),
  divided by word_count.
- line metrics are over trimmed nonempty lines (``\\n``-split);
  bullet-start set = ``- * •``; ellipsis-end = trailing ``...`` or
  ``…``.
- alpha_word_frac = fraction of words containing an ASCII letter.
- n_stop_words = how many DISTINCT members of the 8-word English stop
  list {the, be, to, of, and, that, have, with} appear among the
  lowercased words.
- quality verdict (Rae et al. Table A1): 50 ≤ word_count ≤ 100000,
  3 ≤ mean_word_len ≤ 10, both symbol ratios ≤ 0.1,
  bullet_line_frac ≤ 0.9, ellipsis_line_frac ≤ 0.3,
  alpha_word_frac ≥ 0.8, n_stop_words ≥ 2.
- dup_line_frac = 1 − distinct/total over the trimmed nonempty lines;
  dup_line_char_frac = 1 − chars(distinct)/chars(all) (i.e. repeats
  after each value's first occurrence are the duplicated mass);
  paragraphs (``\\n\\n``-split) analogously. Caps: 0.30 / 0.20.
- top_{n}gram_char_frac = min(1, occurrences(top n-gram) ·
  wordchars(top n-gram) / wordchars(all words)); n-grams are over
  lowercased words, overlapping positions counted, char masses EXCLUDE
  joining spaces. This is the occurrence-mass form most
  reimplementations use (frequency × n-gram length over text length) —
  NOT strict positional coverage, which differs only when the top
  n-gram self-overlaps (e.g. "aaa aaa" in a run of "aaa"), hence the
  min(1, ·) clamp. Ties on (count · mass) break toward the
  lexicographically smallest n-gram (determinism). Caps (Table A1):
  2-gram 0.20, 3-gram 0.18, 4-gram 0.16.

- rep_{n}gram_char_frac (n = 5…10, ``repeated_ngram_char_frac``) is
  the OTHER half of Table A1 and, unlike top-n-gram, IS strict
  positional coverage: mark every word position covered by any
  occurrence of any n-gram that appears ≥ 2 times in the doc, then
  chars(marked words) / chars(all words) — overlapping duplicate
  n-grams never double-count a position. Caps (Table A1): 0.15, 0.14,
  0.13, 0.12, 0.11, 0.10 for n = 5…10.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: (threshold constants from Rae et al. 2021 Table A1)
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3.0, 10.0
MAX_SYMBOL_RATIO = 0.1
MAX_BULLET_LINE_FRAC = 0.9
MAX_ELLIPSIS_LINE_FRAC = 0.3
MIN_ALPHA_WORD_FRAC = 0.8
MIN_STOP_WORDS = 2
MAX_DUP_LINE_FRAC = MAX_DUP_PARA_FRAC = 0.30
MAX_DUP_LINE_CHAR_FRAC = MAX_DUP_PARA_CHAR_FRAC = 0.20
TOP_NGRAM_CAPS = {2: 0.20, 3: 0.18, 4: 0.16}
REP_NGRAM_CAPS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def _words(text: Column) -> Column:
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+"))


def _occurrences(text: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via replace length-delta."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def _charlen(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0).cast("long"),
                       lambda acc, x: acc + F.length(x))


def _nonempty_trimmed(parts: Column) -> Column:
    # NB: not F.transform(parts, F.trim) — F.trim takes an optional
    # second arg, so transform would feed it the element INDEX as a
    # trim-character set instead of trimming whitespace
    return F.filter(F.transform(parts, lambda p: F.trim(p)),
                    lambda p: p != "")


def gopher_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the quality metric columns + ``gopher_quality_ok``.

    One narrow projection — every metric is a JVM expression over the
    in-flight row, so the plan stays a single whole-stage-codegen scan
    with zero exchanges."""
    text = F.col(text_col)
    words = _words(text)
    wc = F.size(words)
    wcd = F.when(wc > 0, wc.cast("double"))  # NULL-div guard: 0 words
    lines = _nonempty_trimmed(F.split(text, "\n"))
    nl = F.size(lines)
    nld = F.when(nl > 0, nl.cast("double"))
    lower_words = F.transform(words, F.lower)
    stop_arr = F.array(*[F.lit(s) for s in STOP_WORDS])
    out = docs.select(
        "*",
        wc.cast("long").alias("word_count"),
        (_charlen(words) / wcd).alias("mean_word_len"),
        (_occurrences(text, "#") / wcd).alias("hash_word_ratio"),
        ((_occurrences(text, "...") + _occurrences(text, "…")) / wcd)
        .alias("ellipsis_word_ratio"),
        (F.size(F.filter(lines, lambda l: F.substring(l, 1, 1).isin(
            "-", "*", "•"))) / nld).alias("bullet_line_frac"),
        (F.size(F.filter(lines, lambda l: l.endswith("...")
                         | l.endswith("…"))) / nld)
        .alias("ellipsis_line_frac"),
        (F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / wcd)
        .alias("alpha_word_frac"),
        F.size(F.filter(stop_arr, lambda s: F.array_contains(lower_words, s)))
        .cast("long").alias("n_stop_words"),
    )
    ok = (
        F.col("word_count").between(MIN_WORDS, MAX_WORDS)
        & F.col("mean_word_len").between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN)
        & (F.col("hash_word_ratio") <= MAX_SYMBOL_RATIO)
        & (F.col("ellipsis_word_ratio") <= MAX_SYMBOL_RATIO)
        & (F.coalesce(F.col("bullet_line_frac"), F.lit(0.0))
           <= MAX_BULLET_LINE_FRAC)
        & (F.coalesce(F.col("ellipsis_line_frac"), F.lit(0.0))
           <= MAX_ELLIPSIS_LINE_FRAC)
        & (F.col("alpha_word_frac") >= MIN_ALPHA_WORD_FRAC)
        & (F.col("n_stop_words") >= MIN_STOP_WORDS)
    )
    return out.withColumn("gopher_quality_ok", F.coalesce(ok, F.lit(False)))


def _dup_fracs(parts: Column, prefix: str) -> list[Column]:
    n = F.size(parts)
    nd = F.when(n > 0, n.cast("double"))
    chars = _charlen(parts)
    charsd = F.when(chars > 0, chars.cast("double"))
    distinct = F.array_distinct(parts)
    return [
        (F.lit(1.0) - F.size(distinct) / nd).alias(f"dup_{prefix}_frac"),
        (F.lit(1.0) - _charlen(distinct) / charsd)
        .alias(f"dup_{prefix}_char_frac"),
    ]


# ---------------------------------------------------------------------------
# n-gram repetition metrics — Arrow path (default) and relational path
# (the parity/oracle mirror).
#
# Both top-n-gram mass and repeated-n-gram coverage are PER-DOCUMENT
# metrics: nothing about them needs data from any other document. The
# relational forms below (explode (doc, gram) → keyed shuffles) are
# correct but shuffle ~60× the corpus bytes in gram strings for a
# computation that is local to each row — measured 0.2 MB/s on a
# realistic-length corpus vs 30-90 MB/s for the stack's pure-JVM
# passes. The Arrow path computes EVERY requested n in one vectorized
# pandas_udf projection (zero Exchange — at 100 TB it rides the scan
# stage like the rest of the cleaning stack); the relational forms are
# kept as the independently-derived mirror and parity-tested
# bit-for-bit in tests/test_quality.py.
# ---------------------------------------------------------------------------

#: the Java-regex \s class (ASCII-only) — Python's \s would also match
#: unicode whitespace and diverge from the JVM/DuckDB splits
_WS_SPLIT = re.compile(r"[ \t\n\x0b\f\r]+")


def _py_words_lower(text: str | None) -> list[str]:
    """Bit-exact Python mirror of ``F.transform(_words(text), F.lower)``:
    Spark ``trim`` strips SPACES only; ``split`` (limit −1) keeps
    leading/trailing empty tokens."""
    if text is None:
        return []
    t = text.strip(" ")
    if t == "":
        return []
    # one .lower() per doc == per-token lower: Unicode case mapping
    # never produces or consumes the ASCII whitespace the split keys on
    return _WS_SPLIT.split(t.lower())


def _doc_ngram_metrics(words: list[str], ngram_ns: tuple[int, ...],
                       rep_ns: tuple[int, ...]) -> list[float]:
    # Integer-encode words once (one dict pass over the doc), then group
    # every n's gram start positions by gram identity with an
    # INCREMENTAL pair-encoding chain: level n's gram label is
    # relabel(label_{n-1} · |vocab| + word_id), one plain-int64
    # ``np.unique`` per level, shared by every requested n. Counting is
    # exact (labels, not hashes — |label|·|vocab| < wc² stays far below
    # 2^63 for any document the 50 MB artifact cap admits), so the
    # bit-for-bit parity contract with the relational mirror holds. The
    # previous tuple-of-words dict counting built wc·Σn Python tuples
    # per document and ran at ~4 ms/doc (13 MB/s), the slowest operator
    # of the cleaning stack; this form is ~0.4 ms/doc.
    wc = len(words)
    if wc == 0:
        return [0.0] * (len(ngram_ns) + len(rep_ns))
    idx: dict[str, int] = {}
    ids = np.empty(wc, dtype=np.int64)
    for i, w in enumerate(words):
        ids[i] = idx.setdefault(w, len(idx))
    vocab = len(idx)
    lens = np.fromiter(map(len, words), dtype=np.int64, count=wc)
    total = int(lens.sum())
    cl = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(lens)])

    needed = sorted({n for n in (*ngram_ns, *rep_ns) if n <= wc})
    groups: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    if needed:
        labels = ids  # level 1: word ids are already dense labels
        if 1 in needed:
            groups[1] = (labels, np.bincount(labels))
        for n in range(2, needed[-1] + 1):
            raw = labels[: wc - n + 1] * vocab + ids[n - 1:]
            _, labels, counts = np.unique(
                raw, return_inverse=True, return_counts=True)
            if n in needed:
                groups[n] = (labels, counts)
    out: list[float] = []
    for n in ngram_ns:
        if total == 0 or wc < n:
            out.append(0.0)
            continue
        m = wc - n + 1
        inv, counts = groups[n]
        # mass = occurrences × gram word-chars; ties share the same
        # mass, hence the same fraction — no tie-break needed for the
        # VALUE (the relational form's lexicographic tie-break only
        # picks which equal-mass row survives)
        gram_chars = cl[n:n + m] - cl[:m]
        per_uniq_chars = np.zeros(len(counts), dtype=np.int64)
        per_uniq_chars[inv] = gram_chars
        best = int((counts * per_uniq_chars).max())
        out.append(min(1.0, best / total))
    for n in rep_ns:
        if total == 0 or wc < n:
            out.append(0.0)
            continue
        inv, counts = groups[n]
        starts = np.nonzero(counts[inv] >= 2)[0]
        # union of [i, i+n) intervals via a diff array (overlaps once)
        delta = np.zeros(wc + 1, dtype=np.int64)
        delta[starts] += 1
        delta[starts + n] -= 1
        covered = np.cumsum(delta[:-1]) > 0
        cov = int(lens[covered].sum())
        out.append(cov / total)
    return out


def ngram_metrics_udf(ngram_ns: tuple[int, ...] = (2, 3, 4),
                      rep_ns: tuple[int, ...] = ()):
    """Vectorized pandas_udf: text → struct of every
    ``top_{n}gram_char_frac`` / ``rep_{n}gram_char_frac``. One Arrow
    crossing per batch, zero shuffle."""
    fields = [T.StructField(f"top_{n}gram_char_frac", T.DoubleType())
              for n in ngram_ns]
    fields += [T.StructField(f"rep_{n}gram_char_frac", T.DoubleType())
               for n in rep_ns]
    schema = T.StructType(fields)
    names = [f.name for f in fields]

    @F.pandas_udf(schema)
    def metrics(text: pd.Series) -> pd.DataFrame:
        rows = [
            _doc_ngram_metrics(_py_words_lower(t), ngram_ns, rep_ns)
            for t in text
        ]
        return pd.DataFrame(rows, columns=names, dtype="float64")

    return metrics


def top_ngram_char_frac(docs: DataFrame, n: int, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """``(id_col, top_{n}gram_char_frac)`` — one shuffle keyed on
    (doc, ngram), then a tiny per-doc max. Docs with < n words get 0."""
    words = F.transform(_words(F.col(text_col)), F.lower)
    wc = F.size(words)
    grams = docs.select(
        F.col(id_col),
        _charlen(words).alias("_total_chars"),
        F.explode(
            # positions 1..wc-n+1; slice is 1-based (start, length)
            F.when(wc >= n, F.transform(
                F.sequence(F.lit(1), wc - n + 1),
                lambda i: F.slice(words, i, n),
            )).otherwise(F.array().cast("array<array<string>>"))
        ).alias("_gram_words"),
    ).select(
        id_col, "_total_chars",
        F.array_join("_gram_words", " ").alias("_gram"),
        _charlen(F.col("_gram_words")).alias("_gram_chars"),
    )
    per_gram = grams.groupBy(id_col, "_gram").agg(
        F.count("*").alias("_cnt"),
        F.first("_gram_chars").alias("_gram_chars"),
        F.first("_total_chars").alias("_total_chars"),
    )
    col = f"top_{n}gram_char_frac"
    top = per_gram.groupBy(id_col).agg(
        F.min_by(
            # _total_chars = 0 (every "word" empty: tabs/newline-only
            # text still splits into >= n empty strings) must yield
            # 0.0 like the Arrow path — the bare 0/0 division throws
            # DIVIDE_BY_ZERO under this repo's ANSI default.
            F.when(
                F.col("_total_chars") > 0,
                F.least(
                    F.lit(1.0),
                    (F.col("_cnt") * F.col("_gram_chars")).cast("double")
                    / F.col("_total_chars"),
                ),
            ).otherwise(F.lit(0.0)),
            # deterministic argmax: min of (−mass, gram) = largest mass,
            # lexicographically smallest gram on ties
            F.struct((-F.col("_cnt") * F.col("_gram_chars")).alias("m"),
                     F.col("_gram").alias("g")),
        ).alias(col)
    )
    return docs.select(id_col).join(top, id_col, "left").select(
        id_col, F.coalesce(F.col(col), F.lit(0.0)).alias(col))


def repeated_ngram_char_fracs(docs: DataFrame,
                              ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
                              id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """``(id_col, rep_{n}gram_char_frac …)`` — strict positional
    coverage: the fraction of word characters inside ANY occurrence of
    ANY n-gram repeated ≥ 2× in the doc (overlaps counted once).

    One fused pipeline for ALL requested n: every (n, start, gram)
    triple is generated JVM-side and exploded once, so the whole
    family costs three keyed shuffles total — (doc, n, gram) for the
    ≥2 count, (doc, n, widx) for the coverage-dedup, (doc, widx) for
    the char join — instead of three per n. All keys carry the doc id,
    so a skewed corpus still spreads and no stage is all-pairs."""
    words = F.transform(_words(F.col(text_col)), F.lower)
    base = docs.select(
        F.col(id_col), words.alias("_w"), _charlen(words).alias("_total"))
    empty = F.array().cast("array<struct<n:int,i:int,g:string>>")

    def _gram_structs(n: int):
        # one-arg closure on purpose: a two-parameter callable (e.g.
        # ``lambda i, n=n``) would make F.transform pass (element,
        # index) and silently rebind n to the array index
        def make(i):
            return F.struct(
                F.lit(n).alias("n"), i.alias("i"),
                F.array_join(F.slice("_w", i, n), " ").alias("g"))

        return F.when(F.size("_w") >= n, F.transform(
            F.sequence(F.lit(1), F.size("_w") - n + 1), make,
        )).otherwise(empty)

    parts = [_gram_structs(n) for n in ns]
    g = base.select(
        id_col, F.explode(F.concat(*parts)).alias("_x")
    ).select(id_col, "_x.n", "_x.i", "_x.g")
    dup = (g.groupBy(id_col, "n", "g").count()
           .filter(F.col("count") >= 2).drop("count"))
    cov = (
        g.join(dup, [id_col, "n", "g"])
        .select(id_col, "n",
                F.explode(F.sequence(
                    F.col("i"), F.col("i") + F.col("n") - 1)).alias("widx"))
        .distinct()
    )
    wl = base.select(
        id_col, F.posexplode("_w").alias("_p", "_word")
    ).select(id_col, (F.col("_p") + 1).alias("widx"),
             F.length("_word").alias("_len"))
    per_n = (
        cov.join(wl, [id_col, "widx"])
        .groupBy(id_col, "n").agg(F.sum("_len").alias("_cov"))
        .groupBy(id_col).pivot("n", list(ns))
        .agg(F.first("_cov"))
    )
    out = base.select(id_col, "_total").join(per_n, id_col, "left")
    return out.select(
        id_col,
        *[
            F.when(F.col("_total") > 0,
                   F.coalesce(F.col(f"`{n}`"), F.lit(0)).cast("double")
                   / F.col("_total"))
            .otherwise(F.lit(0.0)).alias(f"rep_{n}gram_char_frac")
            for n in ns
        ],
    )


def gopher_repetition(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      ngram_ns: tuple[int, ...] = (2, 3, 4),
                      rep_ngram_ns: tuple[int, ...] = (),
                      impl: str = "arrow") -> DataFrame:
    """Append dup line/paragraph fractions (pure-JVM), the top-n-gram
    char fractions and (``rep_ngram_ns``) the repeated-n-gram coverage
    fractions, plus ``gopher_repetition_ok``.

    ``impl='arrow'`` (default): every n-gram metric from ONE vectorized
    pandas_udf projection — zero Exchange, the whole repetition pass
    rides the scan stage. ``impl='relational'``: the keyed-shuffle
    formulation (``top_ngram_char_frac`` join per n + the fused
    ``repeated_ngram_char_fracs`` pipeline) — the independently-derived
    mirror the parity tests hold the Arrow path against."""
    text = F.col(text_col)
    lines = _nonempty_trimmed(F.split(text, "\n"))
    paras = _nonempty_trimmed(F.split(text, "\n\n"))
    out = docs.select(
        "*", *_dup_fracs(lines, "line"), *_dup_fracs(paras, "para"))
    if impl == "arrow":
        m = ngram_metrics_udf(tuple(ngram_ns), tuple(rep_ngram_ns))
        out = out.withColumn("_ngm", m(text))
        for n in ngram_ns:
            out = out.withColumn(f"top_{n}gram_char_frac",
                                 F.col(f"_ngm.top_{n}gram_char_frac"))
        for n in rep_ngram_ns:
            out = out.withColumn(f"rep_{n}gram_char_frac",
                                 F.col(f"_ngm.rep_{n}gram_char_frac"))
        out = out.drop("_ngm")
    elif impl == "relational":
        for n in ngram_ns:
            out = out.join(top_ngram_char_frac(docs, n, id_col, text_col),
                           id_col, "left")
        if rep_ngram_ns:
            out = out.join(
                repeated_ngram_char_fracs(docs, rep_ngram_ns, id_col,
                                          text_col),
                id_col, "left")
    else:
        raise ValueError(f"impl must be 'arrow' or 'relational': {impl!r}")
    ok = (
        (F.coalesce(F.col("dup_line_frac"), F.lit(0.0)) <= MAX_DUP_LINE_FRAC)
        & (F.coalesce(F.col("dup_para_frac"), F.lit(0.0))
           <= MAX_DUP_PARA_FRAC)
        & (F.coalesce(F.col("dup_line_char_frac"), F.lit(0.0))
           <= MAX_DUP_LINE_CHAR_FRAC)
        & (F.coalesce(F.col("dup_para_char_frac"), F.lit(0.0))
           <= MAX_DUP_PARA_CHAR_FRAC)
    )
    for n in ngram_ns:
        cap = TOP_NGRAM_CAPS.get(n)
        if cap is not None:
            ok = ok & (F.col(f"top_{n}gram_char_frac") <= cap)
    for n in rep_ngram_ns:
        cap = REP_NGRAM_CAPS.get(n)
        if cap is not None:
            ok = ok & (F.col(f"rep_{n}gram_char_frac") <= cap)
    return out.withColumn("gopher_repetition_ok", ok)


def gopher_clean(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 rep_ngram_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
                 ) -> DataFrame:
    """Documents passing BOTH the quality and repetition gates (the
    full Table A1 family: quality rules, dup fractions, top-n-gram
    caps AND repeated-n-gram coverage caps)."""
    metric_cols = [
        "word_count", "mean_word_len", "hash_word_ratio",
        "ellipsis_word_ratio", "bullet_line_frac", "ellipsis_line_frac",
        "alpha_word_frac", "n_stop_words", "gopher_quality_ok",
        "dup_line_frac", "dup_line_char_frac", "dup_para_frac",
        "dup_para_char_frac", "gopher_repetition_ok",
    ] + [f"top_{n}gram_char_frac" for n in TOP_NGRAM_CAPS] \
      + [f"rep_{n}gram_char_frac" for n in rep_ngram_ns]
    out = gopher_repetition(gopher_quality(docs, text_col), id_col, text_col,
                            rep_ngram_ns=rep_ngram_ns)
    keep = F.col("gopher_quality_ok") & F.col("gopher_repetition_ok")
    return out.filter(keep).drop(*metric_cols)
