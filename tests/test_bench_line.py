"""Guard for the driver-contract stdout line emitted by bench.py.

The driver records (and parses) only the LAST 2000 CHARS of bench
stdout: BENCH_r04's full-fidelity ~4 KB line was cut mid-JSON and the
official round record came back ``parsed: null``, losing the suite
total and 17 query timings. ``_fit_stdout_line`` must therefore always
produce a line under budget, keep the contract + headline fields, and
make any truncation explicit. No Spark session needed.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def _out(n_queries: int = 70, n_text: int = 6) -> dict:
    queries = {f"some_oracle_query_name_{i:02d}": 0.1 + i * 0.37 for i in range(n_queries)}
    queries.update({"crawl_1exec": 485.47, "crawl_4exec": 137.08,
                    "crawl_pruned_4exec": 56.46})
    for i in range(n_text):
        queries[f"textcorpus_op_{i}"] = 12.345
    return {
        "metric": "bench_suite_total",
        "value": sum(queries.values()),
        "unit": "sec",
        "sf": 0.1,
        "queries": queries,
        "urls_per_sec_1exec": 2119.9,
        "urls_per_sec_4exec": 7507.6,
        "scaling_efficiency": 0.885,
        "scaling_efficiency_median": 0.873,
        "scaling_epochs": [{"eff": 0.885}] * 3,  # must NOT leak into the line
    }


def test_line_fits_budget_and_parses():
    line = bench._fit_stdout_line(_out())
    assert len(line) <= bench.STDOUT_LINE_BUDGET
    d = json.loads(line)
    assert d["metric"] == "bench_suite_total"
    assert d["unit"] == "sec"
    assert d["sf"] == 0.1
    assert d["scaling_efficiency"] == 0.885
    assert d["scaling_efficiency_median"] == 0.873
    assert d["urls_per_sec_1exec"] == 2120
    assert d["urls_per_sec_4exec"] == 7508
    assert "scaling_epochs" not in d  # diagnostics live in result.json


def test_crawl_legs_never_dropped_and_omission_is_explicit():
    out = _out()
    line = bench._fit_stdout_line(out)
    d = json.loads(line)
    for leg in ("crawl_1exec", "crawl_4exec", "crawl_pruned_4exec"):
        assert leg in d["queries"]
    dropped = set(out["queries"]) - set(d["queries"])
    if dropped:
        assert d["queries_omitted"] == len(dropped)
        # textcorpus diagnostics go before any oracle query
        kept_text = [k for k in d["queries"] if k.startswith("textcorpus_")]
        dropped_oracle = [k for k in dropped if not k.startswith("textcorpus_")]
        assert not (kept_text and dropped_oracle)


def test_small_payload_keeps_everything():
    out = _out(n_queries=10, n_text=2)
    d = json.loads(bench._fit_stdout_line(out))
    assert set(d["queries"]) == set(out["queries"])
    assert "queries_omitted" not in d


def test_huge_payload_still_fits():
    out = _out(n_queries=400)
    line = bench._fit_stdout_line(out)
    assert len(line) <= bench.STDOUT_LINE_BUDGET
    assert json.loads(line)["queries_omitted"] > 0
