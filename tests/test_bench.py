"""bench.py's one-line JSON artifact: the grading driver captures only a
bounded tail of merged output, so the line must stay short, parse on its
own, and degrade (never crash) if the registry outgrows the window."""

from __future__ import annotations

import json

from bench import build_line

_SUMMARY = {
    "metric": "total_query_wall_seconds",
    "value": 1.0,
    "unit": "sec",
    "n_queries": 166,
    "sf": 0.1,
}


def test_line_is_compact_and_parseable_at_registry_size():
    # real registry key widths: q01..q99, then q100..q166
    timings = {
        f"q{i:02d}_some_operator_name": 0.1 * (i % 40) for i in range(1, 167)
    }
    line = build_line(_SUMMARY, timings)
    assert len(line) < 1900
    d = json.loads(line)
    assert d["n_queries"] == 166
    # short keys, 1dp values
    assert d["queries"]["q01"] == 0.1
    assert len(d["queries"]) == 166


def test_line_degrades_to_slowest_queries_when_over_window():
    # a hypothetical 400-query registry cannot fit; the line must still
    # parse, keep the slowest entries, and report the dropped count
    timings = {f"q{i:03d}_op": float(i % 97) + 0.1 for i in range(1, 401)}
    line = build_line(_SUMMARY, timings)
    assert len(line) < 1900
    d = json.loads(line)
    assert d["queries_truncated"] == 400 - len(d["queries"])
    kept = set(d["queries"])
    dropped_max = max(
        round(v, 1) for n, v in timings.items() if n.split("_", 1)[0] not in kept
    )
    kept_min = min(d["queries"].values())
    assert kept_min >= dropped_max  # slowest-first retention


def test_line_shrinks_below_window_even_with_extra_summary_keys():
    # r11: the printed line carries spark_passes/duckdb_passes; the
    # truncation loop must keep shrinking until the line fits rather than
    # assuming 120 entries always fit
    summary = {**_SUMMARY, "spark_passes": 3, "duckdb_passes": 3}
    timings = {f"q{i:03d}_{'x' * 30}": float(i % 97) + 0.1 for i in range(1, 401)}
    line = build_line(summary, timings)
    assert len(line) < 1900
    d = json.loads(line)
    assert d["spark_passes"] == 3 and d["duckdb_passes"] == 3
    assert d["queries_truncated"] == 400 - len(d["queries"])
