"""Flagship end-to-end corpus pipeline (VERDICT r4 #6): crawl → WARC
archive → WARC scan → HTML→text → C4 + Gopher cleaning → minhash
dedup → paragraph dedup → sequence packing, as ONE composed query.

Every stage is individually oracle-checked by its own driver query;
what this test pins is the stage HANDOFFS — schema compatibility,
archive byte round-trip, and order determinism across the whole chain.
The fixture plants one casualty per cleaning stage so a silent no-op
in any stage changes the row set, and the packing columns pin the
exact surviving token stream.
"""

from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.queries import QUERIES


def _rows(spark):
    df = QUERIES["corpus_pipeline"](spark, "unused-sf-dir")
    return {r["url"]: r.asDict() for r in df.collect()}


def test_corpus_pipeline_casualties_and_packing(spark):
    rows = _rows(spark)

    # 16 detail pages minus exactly the three planted casualties.
    assert len(rows) == 13
    # C4 page rule: b0-5 carries "Lorem ipsum".
    assert "https://h0.planetminecraft.com/project/b0-5/" not in rows
    # Gopher dup_line_frac: b1-5 is one line repeated 8 times.
    assert "https://h1.planetminecraft.com/project/b1-5/" not in rows
    # Minhash pair (b0-2, b1-2): min-url representative b0-2 survives.
    assert "https://h1.planetminecraft.com/project/b1-2/" not in rows
    assert "https://h0.planetminecraft.com/project/b0-2/" in rows

    # Paragraph dedup: the boilerplate paragraph (and the pool
    # sentences reused across hosts) survive only in their first
    # document — crawl order puts h0 first, so every h1 page keeps
    # only its unique per-slug paragraph.
    for url, r in rows.items():
        if "h1.planetminecraft" in url:
            assert r["n_kept"] == 1, (url, r)
    # b0-0 (first fetched detail page) keeps all six paragraphs.
    assert rows["https://h0.planetminecraft.com/project/b0-0/"]["n_kept"] == 6

    # Packing invariants: tok_start is the exclusive cumsum of
    # n_tokens in url order, and seq_pos = tok_start - seq_id*budget.
    ordered = [rows[u] for u in sorted(rows)]
    cum = 0
    for r in ordered:
        assert r["tok_start"] == cum, r
        assert r["seq_pos"] == r["tok_start"] - r["seq_id"] * 128, r
        cum += r["n_tokens"]


def test_corpus_pipeline_matches_frozen_capture(spark):
    """The full output is a constant of seed=42 — identical to the
    DuckDB oracle VALUES (which scripts/oracle_check.py re-verifies
    hash-level); here we pin the total token budget and sequence
    count so a drift shows up without DuckDB."""
    df = QUERIES["corpus_pipeline"](spark, "unused-sf-dir")
    agg = df.agg(
        F.sum("n_tokens").alias("tok"),
        F.countDistinct("seq_id").alias("seqs"),
    ).first()
    assert agg["tok"] == 526
    assert agg["seqs"] == 4
