"""Pin the bench stdout contract: the FINAL line is scalar-only and short.

The driver parses a ~2000-byte tail of bench.py's stdout; any per-query
collection on the final line eventually outgrows that window as HEADLINE
grows (it did in rounds 6 and 8). This test feeds a synthetic 500-query
timings dict through the exact line builder bench.main() uses and asserts
the final line stays under 1000 bytes and parseable, so the invariant
cannot rot as queries are added (VERDICT r8 ask #1).
"""

from __future__ import annotations

import json

import bench


def _synthetic(n: int) -> dict[str, float]:
    return {f"query_with_a_reasonably_long_name_{i:04d}": 123.456 for i in range(n)}


def test_final_line_is_scalar_only_and_bounded_at_500_queries():
    timings = _synthetic(500)
    cold = _synthetic(500)
    detail_line, final_line = bench.summary_lines(
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


def test_final_line_is_last_and_parseable_from_a_2000_byte_tail():
    # simulate the driver: concatenate the two lines, take the tail,
    # parse the last complete line
    timings = _synthetic(500)
    detail_line, final_line = bench.summary_lines(
        timings, timings, total=1.0, loadavg=[0.0, 0.0, 0.0], sf_val=0.01
    )
    stdout = detail_line + "\n" + final_line + "\n"
    tail = stdout[-2000:]
    last = [ln for ln in tail.splitlines() if ln.strip()][-1]
    parsed = json.loads(last)
    assert parsed["metric"] == "headline_total"
