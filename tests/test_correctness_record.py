"""Guard (VERDICT r4 #1): every registered driver query must appear in
the NEWEST official CORRECTNESS_r*.json. Round 4's snapshot was taken
before the round's last four commits and silently missed 17 queries —
the judge had to re-verify them by hand. This test turns that gap into
a visible failure the round it happens: if the suite is green but the
record is stale, the record (not the code) is what needs regenerating.

Queries that are YOUNGER than the record (first committed after the
record's commit, or not yet committed at all) are exempt — they cannot
possibly be in a snapshot that predates them; they become enforced the
moment the next record lands. The known r4 gap (judge-verified green,
VERDICT r4) is exempted explicitly while r04 is still the newest
record. No Spark session needed.
"""

import json
import re
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

#: the 17 queries CORRECTNESS_r04.json missed because the driver
#: snapshot predated commits c626f1d/ed6fced/55fb66e — each re-verified
#: rows+schema+hash green by the r4 judge (VERDICT r4 "LLM-data-pipeline
#: operators" table). Exempt ONLY while r04 is the newest record.
KNOWN_R4_GAP = {
    "dup_cluster_representatives", "paragraph_dedup", "c4_line_clean",
    "badwords_page_filter", "gopher_quality_flags",
    "gopher_repetition_stats", "gopher_repeated_ngrams", "pii_scrub",
    "html_to_text", "warc_archive_index", "wet_text_records",
    "cdxj_index", "sitemap_seed_urls", "crawl_delay_budget_dequeue",
    "sequence_packing", "host_pagerank", "canonical_urls",
}


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(REPO), *args],
        capture_output=True, text=True, check=False,
    ).stdout.strip()


def _newest_record():
    recs = sorted(
        REPO.glob("CORRECTNESS_r*.json"),
        key=lambda p: (int(re.search(r"r(\d+)", p.name).group(1)), p.name),
    )
    if not recs:
        return None
    p = recs[-1]
    try:
        return p, json.loads(p.read_text())
    except (OSError, json.JSONDecodeError):
        return p, {}


def _commit_ts_of(path: Path) -> int | None:
    out = _git("log", "-1", "--format=%ct", "--", str(path.relative_to(REPO)))
    return int(out) if out else None


def _first_appearance_ts(name: str) -> int | None:
    """Unix time the query name string first entered the repo history
    (None = not committed yet, i.e. added this session)."""
    out = _git("log", "--reverse", "--format=%ct", "-S", f'"{name}"',
               "--", "text2mc_dataprocessor_spark", "__spark_entry__.py")
    return int(out.splitlines()[0]) if out else None


def test_every_registered_query_is_in_newest_correctness_record():
    from text2mc_dataprocessor_spark.queries import register_all

    rec = _newest_record()
    if rec is None:
        pytest.skip("no CORRECTNESS_r*.json yet (round 1)")
    path, data = rec
    registered = set(register_all()[0])
    missing = sorted(registered - set(data))
    record_ts = _commit_ts_of(path)
    stale = []
    for name in missing:
        if path.name == "CORRECTNESS_r04.json" and name in KNOWN_R4_GAP:
            continue  # judge-verified green (VERDICT r4)
        born = _first_appearance_ts(name)
        if born is not None and record_ts is not None and born <= record_ts:
            stale.append(name)
    assert not stale, (
        f"{len(stale)} queries existed before {path.name} was recorded but "
        f"are absent from it: {stale} — the official record is stale; the "
        "driver correctness check must run at HEAD (verify now with "
        "scripts/oracle_check.py)"
    )


def test_newest_correctness_record_is_all_green():
    rec = _newest_record()
    if rec is None:
        pytest.skip("no CORRECTNESS_r*.json yet (round 1)")
    path, data = rec
    bad = {
        q: r for q, r in data.items()
        if not (r.get("rows_match") and r.get("schema_match"))
        or r.get("err") is not None
    }
    assert not bad, f"non-green entries in {path.name}: {sorted(bad)}"
