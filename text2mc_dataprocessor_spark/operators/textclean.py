"""C4-style heuristic text cleaning — line and page rules.

The C4 corpus construction (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning…", §2.2 — public paper) cleans Common-Crawl text
with deterministic heuristics; this module implements the
line/page-rule subset as pure-JVM column expressions (one
``filter``/``transform`` pass over the line array — no Python, no
shuffle; a 100 TB corpus cleans inside the scan stage):

line rules (a line survives iff ALL hold):
- ends in a terminal punctuation mark (``. ! ? "``),
- has at least ``min_words_per_line`` whitespace-separated words,
- does not contain "javascript" (case-insensitive);

page rules (a page survives iff ALL hold):
- at least ``min_kept_lines`` surviving lines,
- does not contain "lorem ipsum" (case-insensitive),
- does not contain a curly brace ``{``.

Out of scope (documented): C4's three-sentence-span global dedup is the
corpus-level exact-span dedup — ``operators/dedup.py``'s
``dedup_paragraphs`` is the engine's span-dedup primitive. The
bad-words page rule is ``badwords_filter`` below — the LIST stays
injectable (it is environment-specific), the mechanism is not. Kept
lines are rejoined with the original separator, order preserved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TERMINAL_RE = '[.!?"]$'

#: badwords_filter: token lists at or below this size are counted with
#: the zero-shuffle literal-array higher-order filter; larger lists use
#: the explode + broadcast-join shape (a literal array is scanned per
#: word, so it must stay small enough that the per-word membership test
#: is cheaper than the exploded join's shuffle).
_HOF_TOKEN_MAX = 64


def c4_line_keep_expr(line: Column, min_words_per_line: int = 3) -> Column:
    """The line predicate over one (untrimmed) line value."""
    t = F.trim(line)
    words = F.size(F.split(t, r"\s+"))
    return (
        (t != "")
        & t.rlike(_TERMINAL_RE)
        & (words >= min_words_per_line)
        & ~F.contains(F.lower(t), F.lit("javascript"))
    )


#: FineWeb-style PII anonymization (Penedo et al. 2024 §3.5 — public
#: paper/dataset card): web corpora destined for training scrub email
#: addresses and public IPv4 addresses with fixed placeholder tokens.
#: The patterns stay inside the common Java-regex ∩ RE2 dialect
#: (char classes, \d, \b, bounded quantifiers — no lookarounds), so
#: the DuckDB oracle runs the IDENTICAL pattern strings.
EMAIL_RE = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"
IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"


def scrub_pii(docs: DataFrame, text_col: str = "text",
              email_token: str = EMAIL_TOKEN,
              ip_token: str = IP_TOKEN) -> DataFrame:
    """Rewrite ``text_col`` with emails/IPv4s replaced by placeholder
    tokens and append match counts (``n_emails``, ``n_ips``) — all
    JVM-side ``regexp_replace``/``regexp_count``, no Python, no
    shuffle: at 100 TB the scrub rides the scan stage. Emails are
    scrubbed FIRST so an address's host part is never half-matched as
    an IP-looking string by the second pass."""
    text = F.col(text_col)
    others = [c for c in docs.columns if c != text_col]
    return docs.select(
        *others,
        F.regexp_replace(
            F.regexp_replace(text, EMAIL_RE, email_token),
            IPV4_RE, ip_token,
        ).alias(text_col),
        F.regexp_count(text, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        # IPs are counted on the EMAIL-SCRUBBED text, so an IPv4-shaped
        # substring inside a matched email (user@1.2.3.4.example.com)
        # never inflates n_ips past the replacements actually made —
        # counts and rewritten text always agree.
        F.regexp_count(
            F.regexp_replace(text, EMAIL_RE, email_token), F.lit(IPV4_RE)
        ).cast("long").alias("n_ips"),
    )


def badwords_filter(docs: DataFrame, badwords: list[str],
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """C4's remaining page rule — drop any page containing a word from
    a blocklist — with the LIST injectable (the canonical list is
    environment-specific; the mechanism is the engine's job). Appends
    ``n_badwords`` (total occurrences) and ``badwords_ok`` (zero
    tolerance, C4 semantics); the caller filters on the flag.

    Matching is over lowercased whitespace-split words. Short token
    lists (≤ ``_HOF_TOKEN_MAX``, the overwhelmingly common case) are
    counted with a zero-shuffle higher-order filter against a literal
    array — the whole page rule rides the scan stage, no explode, no
    join, no Exchange. Longer lists fall back to the explode +
    broadcast equi-join shape (word-row × tiny broadcast — at 100 TB
    never a per-word linear scan of a big list). Multi-word entries
    (phrases) are matched as lowercased substrings with an OR-fold JVM
    expression — phrase lists are short in practice; both counts land
    in ``n_badwords``. (The two token paths agree whenever ``id_col``
    is a key, which every caller guarantees; under duplicated ids the
    join shape summed counts across rows sharing an id, a degenerate
    aggregation no caller relies on.)"""
    spark = docs.sparkSession
    lower = [b.lower() for b in badwords]
    tokens = [b for b in lower if " " not in b]
    phrases = [b for b in lower if " " in b]
    lowered = F.lower(F.col(text_col))
    phrase_n = None
    for p in phrases:
        occ = ((F.length(lowered) - F.length(
            F.replace(lowered, F.lit(p), F.lit("")))) / len(p)).cast("long")
        phrase_n = occ if phrase_n is None else phrase_n + occ
    if len(tokens) <= _HOF_TOKEN_MAX:
        words = F.split(F.trim(lowered), r"\s+")
        if tokens:
            tok_arr = F.array(*[F.lit(t) for t in tokens])
            tok_n = F.size(
                F.filter(words, lambda w: F.array_contains(tok_arr, w))
            ).cast("long")
        else:
            tok_n = F.lit(0).cast("long")
        n = (tok_n + (phrase_n if phrase_n is not None else F.lit(0))).cast(
            "long")
        return docs.withColumn("n_badwords", n).withColumn(
            "badwords_ok", F.col("n_badwords") == 0)
    counts = docs.select(F.col(id_col))
    if tokens:
        bad_df = spark.createDataFrame([(t,) for t in tokens], "_bad string")
        words = F.split(F.trim(lowered), r"\s+")
        exploded = docs.select(
            F.col(id_col), F.explode(words).alias("_bad"))
        tok_counts = (
            exploded.join(F.broadcast(bad_df), "_bad")
            .groupBy(id_col).agg(F.count("*").alias("_n_tok"))
        )
        counts = counts.join(tok_counts, id_col, "left")
    else:
        counts = counts.withColumn("_n_tok", F.lit(None).cast("long"))
    out = docs.join(counts, id_col, "left").withColumn(
        "n_badwords",
        (F.coalesce(F.col("_n_tok"), F.lit(0))
         + (phrase_n if phrase_n is not None else F.lit(0))).cast("long"),
    ).drop("_n_tok")
    return out.withColumn("badwords_ok", F.col("n_badwords") == 0)


def c4_clean(docs: DataFrame, text_col: str = "text",
             min_words_per_line: int = 3, min_kept_lines: int = 3,
             sep: str = "\n") -> DataFrame:
    """→ the surviving pages, ``text_col`` rewritten to the kept lines
    (original order, ``sep``-rejoined) plus ``n_kept_lines``. All other
    input columns pass through unchanged."""
    lines = F.split(F.col(text_col), sep)
    kept = F.filter(lines, lambda l: c4_line_keep_expr(l, min_words_per_line))
    lowered = F.lower(F.col(text_col))
    page_ok = (
        (F.size(kept) >= min_kept_lines)
        & ~F.contains(lowered, F.lit("lorem ipsum"))
        & ~F.contains(F.col(text_col), F.lit("{"))
    )
    others = [c for c in docs.columns if c != text_col]
    return (
        docs.withColumn("_kept", kept)
        .filter(page_ok)
        .select(
            *others,
            F.array_join(F.transform("_kept", lambda l: F.trim(l)),
                         sep).alias(text_col),
            F.size("_kept").cast("long").alias("n_kept_lines"),
        )
    )
