"""Pins bench.py's driver-facing final line under the measured stdout cap.

The grading driver keeps only the last 2000 characters of bench stdout and
parses the final JSON line.  Rounds 2-4 recorded ``"parsed": null`` because
the full per-query map overflowed that tail.  bench.final_line must therefore
stay under FINAL_BUDGET (1800) even in a worst case far beyond the real
registry: 300 queries with 40-char names and large float timings.
"""

import json

import bench


def _record(n_queries: int, name_len: int = 40) -> dict:
    queries = {
        ("q" + str(i)).ljust(name_len, "x"): 1234.567 + i for i in range(n_queries)
    }
    return {
        "metric": "headline_suite_wall_clock",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
    }


def test_final_line_under_driver_tail_cap_worst_case():
    line = bench.final_line(_record(300))
    assert len(line) < bench.FINAL_BUDGET < 2000
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_suite_wall_clock"
    assert parsed["value"] == _record(300)["value"]
    assert parsed["full_record"] == "BENCH_LOCAL.json"
    assert len(parsed["queries"]) <= bench.MAX_FINAL_QUERIES
    assert parsed["queries_omitted"] == 300 - len(parsed["queries"])


def test_final_line_keeps_slowest_queries():
    rec = _record(50, name_len=8)
    line = bench.final_line(rec)
    parsed = json.loads(line)
    kept = parsed["queries"]
    # The kept entries must be exactly the slowest MAX_FINAL_QUERIES.
    expected = dict(
        sorted(rec["queries"].items(), key=lambda kv: -kv[1])[: bench.MAX_FINAL_QUERIES]
    )
    assert set(kept) == set(expected)
    for k, v in kept.items():
        assert v == round(expected[k], 2)


def test_final_line_current_headline_suite_fits():
    # The real suite: every HEADLINE name with a plausible timing.
    queries = {name: 3.141 for name in bench.HEADLINE}
    rec = {
        "metric": "headline_suite_wall_clock",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
    }
    line = bench.final_line(rec)
    assert len(line) < bench.FINAL_BUDGET
    json.loads(line)


def test_final_line_property_never_overflows():
    """Property: for ANY query map (names up to 64 chars, values up to
    1e6, up to 500 entries), the final line stays under budget and
    round-trips the exact total."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    names = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz_0123456789", min_size=1, max_size=64
    )
    timings = st.dictionaries(
        names, st.floats(min_value=0, max_value=1e6, allow_nan=False), max_size=500
    )

    @settings(max_examples=200, deadline=None)
    @given(timings=timings)
    def check(timings):
        rec = {
            "metric": "headline_suite_wall_clock",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": timings,
            "sf": 0.1,
        }
        line = bench.final_line(rec)
        assert len(line) < bench.FINAL_BUDGET
        parsed = json.loads(line)
        assert parsed["value"] == rec["value"]
        assert set(parsed["queries"]) <= set(timings)

    check()
