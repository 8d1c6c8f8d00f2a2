"""Bench output-protocol tests (no Spark needed).

The round driver parses bench.py's LAST stdout line; rounds 3-4 recorded
``parsed: null`` because that line grew past ~2 kB with 65 queries. These
tests pin the two-line protocol: a complete detail line plus a final line
that stays under 500 bytes at any realistic headline-set size.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import EXTENDED, GRADUATING_R9, HEADLINE, format_output  # noqa: E402


def _fake_timings(n):
    # worst-case realistic widths: long names, 4-digit-second timings
    return {
        f"pipeline_extremely_long_operator_name_{i:03d}": 123.456 + i
        for i in range(n)
    }


def test_final_line_compact_at_current_headline_size():
    timings = {name: 1.234 for name in HEADLINE}
    detail, final = format_output(timings, {}, 0.1, 2, candidate_build=1.337)
    assert len(final) < 500, len(final)
    parsed = json.loads(final)
    assert parsed["metric"] == "headline_queries_wall_sec"
    assert parsed["unit"] == "sec"
    assert parsed["n_queries"] == len(HEADLINE)
    assert parsed["errors"] == 0
    assert len(parsed["queries"]) <= 5
    assert parsed["value"] == round(sum(timings.values()), 3)
    # the one-time candidate build cost is its own line item on BOTH lines
    assert parsed["candidate_build"] == 1.337
    # detail line carries the FULL map
    assert json.loads(detail)["queries"] == timings
    assert json.loads(detail)["candidate_build"] == 1.337


def test_extended_queries_excluded_from_trend_value():
    """EXTENDED operators are timed and land in the detail map, but the
    final line's value/n_queries stay the comparable HEADLINE-only sum —
    their cost surfaces via the additive extended_sec/n_extended keys.
    (Synthetic extended list: the real EXTENDED refilled at the r10
    graduation and its size floats; the mechanics are list-agnostic.)"""
    ext = ["ext_op_a", "ext_op_b"]
    timings = {name: 1.0 for name in HEADLINE}
    timings.update({name: 10.0 for name in ext})
    detail, final = format_output(
        timings,
        {},
        0.1,
        2,
        candidate_build=1.0,
        extended=ext,
        probe_build=0.5,
    )
    assert len(final) < 500, len(final)
    parsed = json.loads(final)
    assert parsed["value"] == round(1.0 * len(HEADLINE), 3)
    assert parsed["n_queries"] == len(HEADLINE)
    assert parsed["extended_sec"] == round(10.0 * len(ext), 3)
    assert parsed["n_extended"] == len(ext)
    assert parsed["probe_build"] == 0.5
    assert json.loads(detail)["probe_build"] == 0.5
    # full map (headline + extended) on the detail line
    assert json.loads(detail)["queries"] == timings


def test_extended_registry_membership():
    """Every EXTENDED / GRADUATING_R9 name must be a registered query and
    the three benchmark sets must be pairwise disjoint (overlap would
    double-count an operator's time in one of the sums)."""
    from iceberg_explorer_spark.operators import QUERIES

    assert not set(EXTENDED) & set(HEADLINE)
    assert not set(GRADUATING_R9) & set(HEADLINE)
    assert not set(GRADUATING_R9) & set(EXTENDED)
    missing = [
        n for n in [*HEADLINE, *GRADUATING_R9, *EXTENDED] if n not in QUERIES
    ]
    assert not missing, missing


def test_final_line_compact_even_at_200_queries_with_errors():
    timings = _fake_timings(200)
    errors = {f"broken_query_{i}": "SomeError: " + "x" * 400 for i in range(30)}
    detail, final = format_output(timings, errors, 0.1, 2)
    assert len(final) < 500, len(final)
    parsed = json.loads(final)
    assert parsed["n_queries"] == 200 and parsed["errors"] == 30
    # whatever slowest-map size fits the 500-byte budget (5 normally,
    # degrading to 3 with these 40-char synthetic names), the entries
    # reported really are the slowest, in rank order
    slowest = set(parsed["queries"])
    assert len(slowest) in (3, 5)
    ranked = sorted(timings, key=lambda k: -timings[k])
    assert slowest == set(ranked[: len(slowest)])
    assert json.loads(detail)["errors"] == errors


def test_final_line_survives_empty_run():
    detail, final = format_output({}, {"only_query": "boom"}, None, 1)
    parsed = json.loads(final)
    assert parsed["value"] == 0 and parsed["n_queries"] == 0
    assert parsed["errors"] == 1


def test_final_line_degrades_instead_of_raising():
    """Grotesquely long query names must shrink the slowest-queries map
    (5 -> 3 -> 0 entries), never raise after a completed run."""
    timings = {("q" * 200) + str(i): 1.0 + i for i in range(10)}
    detail, final = format_output(timings, {}, 0.1, 2)
    assert len(final) < 500
    parsed = json.loads(final)
    assert parsed["n_queries"] == 10
    assert len(parsed["queries"]) < 5
    assert json.loads(detail)["queries"] == timings


def test_slowest_map_excludes_extended_entries():
    """The compact line's slowest map sits next to the HEADLINE-only
    `value` — a multi-second EXTENDED entry must never fill it, or the
    named slowest stop explaining the trend number they accompany."""
    timings = {f"h{i}": 0.1 * (i + 1) for i in range(10)}
    timings["ext_monster"] = 99.0
    detail, final = format_output(
        timings, {}, 0.1, 2, extended=["ext_monster"]
    )
    parsed = json.loads(final)
    assert "ext_monster" not in parsed["queries"]
    assert parsed["extended_sec"] == 99.0 and parsed["n_extended"] == 1
    assert abs(parsed["value"] - sum(v for k, v in timings.items()
                                     if k != "ext_monster")) < 1e-9
    assert json.loads(detail)["queries"]["ext_monster"] == 99.0


def test_headline_version_and_graduation_policy():
    """Pins the HEADLINE graduation mechanics declared at
    bench.HEADLINE_VERSION, now EXECUTING the r10 overlap round: (1)
    every final line names the measurement set its `value` covers via an
    integer `headline_version` key; (2) this round the version is STILL
    1 and `value` sums exactly the v1 HEADLINE set (GRADUATING_R9 and
    EXTENDED both excluded); (3) the additive `value_v2`/`n_queries_v2`
    keys carry HEADLINE + GRADUATING_R9 — the v2 sum the r11 trend line
    resets to — and the line stays compact with all keys present."""
    import bench

    timings = {name: 1.234 for name in HEADLINE}
    timings.update({name: 2.0 for name in GRADUATING_R9})
    timings.update({name: 10.0 for name in EXTENDED})
    _, final = format_output(
        timings,
        {},
        0.1,
        2,
        candidate_build=1.337,
        extended=EXTENDED,
        graduating=GRADUATING_R9,
    )
    assert len(final) < 500, len(final)
    parsed = json.loads(final)
    assert isinstance(parsed["headline_version"], int)
    assert parsed["headline_version"] == bench.HEADLINE_VERSION == 1
    assert parsed["n_queries"] == len(HEADLINE)
    assert parsed["value"] == round(1.234 * len(HEADLINE), 3)
    # the overlap round's v2 sum: HEADLINE + the graduating cohort,
    # EXTENDED still outside both sums
    assert parsed["n_queries_v2"] == len(HEADLINE) + len(GRADUATING_R9)
    assert parsed["value_v2"] == round(
        1.234 * len(HEADLINE) + 2.0 * len(GRADUATING_R9), 3
    )
    assert parsed["extended_sec"] == round(10.0 * len(EXTENDED), 3)
    # graduating entries never fill the slowest map (it explains `value`)
    assert not set(parsed["queries"]) & set(GRADUATING_R9)
    # without a graduating cohort (r11 on) the v2 keys are absent
    _, final_plain = format_output(
        {name: 1.0 for name in HEADLINE}, {}, 0.1, 2
    )
    assert "value_v2" not in json.loads(final_plain)
    # the policy text itself must stay in the source next to the constant
    import inspect

    src = inspect.getsource(bench)
    assert "HEADLINE GRADUATION POLICY" in src
    assert "round 10" in src and "value_v2" in src
