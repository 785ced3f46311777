"""Pin the bench stdout contract: the FINAL line is scalar-only and short.

The driver parses a ~2000-byte tail of bench.py's stdout; any per-query
collection on the final line eventually outgrows that window as HEADLINE
grows (it did in rounds 6 and 8). This test feeds a synthetic 500-query
timings dict through the exact line builder bench.main() uses and asserts
the final line stays under 1000 bytes and parseable, so the invariant
cannot rot as queries are added (VERDICT r8 ask #1).

Round 11 additionally showed the single headline_detail line outgrows the
tail window itself, leaving PERF per_query empty. Per VERDICT r11 ask #1,
per-query warm timings are re-emitted as many small headline_chunk lines;
these tests pin that every chunk line is individually small, the chunks
cover the timings dict exactly, and a 2000-byte tail cut anywhere yields
parseable chunk lines plus the final line.
"""

from __future__ import annotations

import json

import bench


def _synthetic(n: int) -> dict[str, float]:
    return {f"query_with_a_reasonably_long_name_{i:04d}": 123.456 for i in range(n)}


def test_final_line_is_scalar_only_and_bounded_at_500_queries():
    timings = _synthetic(500)
    cold = _synthetic(500)
    detail_line, chunk_lines, final_line = bench.summary_lines(
        timings, cold, total=61728.0, loadavg=[12.34, 11.11, 10.0], sf_val=0.1
    )
    assert len(final_line) < 1000, (
        f"final bench line is {len(final_line)} bytes at 500 queries — "
        "it must never carry per-query collections"
    )
    parsed = json.loads(final_line)
    assert parsed["metric"] == "headline_total"
    assert parsed["value"] == 61728.0
    assert parsed["n_queries"] == 500
    assert parsed["sf"] == 0.1
    # no list/dict values other than the fixed-size loadavg triple
    for key, val in parsed.items():
        if key == "loadavg":
            assert len(val) == 3
            continue
        assert not isinstance(val, (list, dict)), f"{key} is a collection"
    # the detail line still carries the full per-query record
    detail = json.loads(detail_line)
    assert detail["metric"] == "headline_detail"
    assert len(detail["queries"]) == 500
    assert len(detail["cold_queries"]) == 500


def test_chunk_lines_are_small_ordered_and_cover_all_queries():
    timings = _synthetic(123)
    _, chunk_lines, _ = bench.summary_lines(
        timings, timings, total=1.0, loadavg=[0.0, 0.0, 0.0], sf_val=0.1
    )
    merged: dict[str, float] = {}
    for k, line in enumerate(chunk_lines):
        # each chunk line must parse on its own and stay far inside the
        # driver's tail window
        assert len(line) < 600, f"chunk {k} is {len(line)} bytes"
        parsed = json.loads(line)
        assert parsed["metric"] == "headline_chunk"
        assert parsed["i"] == k
        assert parsed["n"] == len(chunk_lines)
        assert 1 <= len(parsed["queries"]) <= bench.CHUNK_QUERIES
        merged.update(parsed["queries"])
    assert merged == timings
    # emission order is ascending warm time (ties by name): the chunks
    # nearest the final line — the only ones guaranteed inside the
    # driver's 2000-byte tail — carry the slowest queries, which is
    # where round-over-round comparison has signal (sub-second entries
    # are the documented ±30% noise class on the bench box)
    order = [
        name
        for line in chunk_lines
        for name in json.loads(line)["queries"]
    ]
    assert order == sorted(timings, key=lambda n: (timings[n], n))


def test_final_line_is_last_and_tail_yields_per_query_chunks():
    # simulate the driver: concatenate all lines, take the tail, parse
    # every complete line in it
    timings = _synthetic(500)
    detail_line, chunk_lines, final_line = bench.summary_lines(
        timings, timings, total=1.0, loadavg=[0.0, 0.0, 0.0], sf_val=0.01
    )
    stdout = "\n".join([detail_line, *chunk_lines, final_line]) + "\n"
    tail = stdout[-2000:]
    lines = [ln for ln in tail.splitlines() if ln.strip()]
    parsed_last = json.loads(lines[-1])
    assert parsed_last["metric"] == "headline_total"
    # every fully-captured chunk line in the tail parses and carries
    # per-query timings (the first tail line may be cut mid-object)
    per_query: dict[str, float] = {}
    for ln in lines[1:-1]:
        parsed = json.loads(ln)
        assert parsed["metric"] == "headline_chunk"
        per_query.update(parsed["queries"])
    assert len(per_query) >= 2 * bench.CHUNK_QUERIES, (
        "a 2000-byte tail must recover multiple chunks of per-query timings"
    )
    assert all(timings[k] == v for k, v in per_query.items())
