"""Server-side sort/filter parity (A16/A17) — behavior matrix mirroring the
reference UI semantics (reference: src/iceberg_explorer/templates/
query.html:629-715)."""

from __future__ import annotations

import pytest

from iceberg_explorer_spark.service.postprocess import (
    SortState,
    apply_filters,
    apply_sort,
    postprocess,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "Apple", 10.5, None),
        (2, "banana", None, True),
        (3, None, -3.25, False),
        (4, "Cherry pit", 100.0, True),
        (5, "null-ish text", 10.5, None),
    ]
    return spark.createDataFrame(
        rows, "id long, name string, score double, flag boolean"
    )


# --- sort cycle ------------------------------------------------------------
def test_sort_cycle_asc_desc_none():
    s = SortState()
    s = s.toggled("name")
    assert (s.column, s.direction) == ("name", "asc")
    s = s.toggled("name")
    assert (s.column, s.direction) == ("name", "desc")
    s = s.toggled("name")
    assert s.column is None
    # clicking a new column resets to asc
    assert SortState("name", "desc").toggled("score") == SortState("score", "asc")


# --- sort comparator -------------------------------------------------------
def test_sort_numeric_nulls_largest(df):
    asc = [r["id"] for r in apply_sort(df, SortState("score", "asc")).collect()]
    assert asc[:2] == [3, 1] and asc[-1] == 2  # nulls last under asc
    desc = [r["id"] for r in apply_sort(df, SortState("score", "desc")).collect()]
    assert desc[0] == 2 and desc[1] == 4  # nulls first under desc


def test_sort_string_case_insensitive(df):
    got = [
        r["name"]
        for r in apply_sort(df, SortState("name", "asc")).collect()
    ]
    assert got == ["Apple", "banana", "Cherry pit", "null-ish text", None]


def test_sort_inactive_is_noop(df):
    assert apply_sort(df, SortState()).count() == 5


# --- filters ---------------------------------------------------------------
def test_filter_contains_case_insensitive(df):
    got = {r["id"] for r in apply_filters(df, {"name": "CHERRY"}).collect()}
    assert got == {4}


def test_filter_null_literal_matches_null_and_null_text(df):
    # reference behavior: 'null' matches NULL cells AND cells containing
    # the text "null" (query.html:683-703 — contains-fallback still applies)
    got = {r["id"] for r in apply_filters(df, {"name": "null"}).collect()}
    assert got == {3, 5}


def test_filter_numeric_range_ops(df):
    assert {r["id"] for r in apply_filters(df, {"score": "> 10"}).collect()} == {1, 4, 5}
    assert {r["id"] for r in apply_filters(df, {"score": "<0"}).collect()} == {3}
    assert {r["id"] for r in apply_filters(df, {"score": ">=10.5"}).collect()} == {1, 4, 5}
    assert {r["id"] for r in apply_filters(df, {"score": "<=-3.25"}).collect()} == {3}


def test_filter_range_never_matches_null_cells(df):
    got = {r["id"] for r in apply_filters(df, {"score": "<= 1000"}).collect()}
    assert 2 not in got


def test_filter_range_pattern_on_string_column_is_contains(df):
    # ">100" on a non-numeric column falls through to substring matching
    assert apply_filters(df, {"name": ">100"}).count() == 0


def test_filter_numeric_contains_fallback(df):
    # non-range text on a numeric column matches the cell's string form
    got = {r["id"] for r in apply_filters(df, {"score": "10.5"}).collect()}
    assert got == {1, 5}


def test_filter_conjunction_and_empty_passthrough(df):
    got = {
        r["id"]
        for r in apply_filters(
            df, {"score": ">0", "flag": "true", "name": "  "}
        ).collect()
    }
    assert got == {4}


def test_filter_unknown_column_raises(df):
    with pytest.raises(KeyError):
        apply_filters(df, {"nope": "x"})


def test_postprocess_filters_then_sorts(df):
    got = [
        r["id"]
        for r in postprocess(
            df, filters={"score": ">5"}, sort=SortState("score", "desc")
        ).collect()
    ]
    assert got == [4, 1, 5] or got == [4, 5, 1]  # 1 and 5 tie at 10.5


# ---------------------------------------------------------------------------
# Generative parity: apply_filters/apply_sort vs an independent Python
# transcription of the reference UI semantics (query.html:629-715).
# ---------------------------------------------------------------------------


def _ref_filter_match(cell, text, numeric):
    """Reference applyFilters semantics, transcribed directly."""
    text = text.strip()
    if cell is None:
        return text.lower() == "null"
    if numeric:
        import re as _re

        m = _re.match(r"^([<>]=?)\s*(-?\d+\.?\d*)$", text)
        if m:
            op, num = m.group(1), float(m.group(2))
            return {
                ">": cell > num,
                "<": cell < num,
                ">=": cell >= num,
                "<=": cell <= num,
            }[op]
    return text.lower() in str(cell).lower()


def test_filter_parity_generative(spark):
    """Any combination of numeric/text filters over a table with NULLs,
    negatives, and 'null'-containing strings must keep exactly the rows
    the reference's client-side filter keeps."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rows = [
        (0, None, None),
        (1, -5, "Null and void"),
        (2, 0, "plain"),
        (3, 7, None),
        (4, 100, "NULL"),
        (5, 3, "contains null inside"),
        (6, -1, ""),
        (7, 42, "UPPER lower"),
    ]
    df = spark.createDataFrame(rows, "id long, n int, s string").cache()
    py = {r[0]: r for r in rows}

    num_filters = st.sampled_from(
        ["", "null", "> 2", "<0", ">= 7", "<= -1", "4", ">abc", "  "]
    )
    txt_filters = st.sampled_from(
        ["", "null", "NULL", "plain", "lower", "VOID", "inside", "x"]
    )

    @settings(max_examples=80, deadline=None)
    @given(fn=num_filters, fs=txt_filters)
    def run(fn, fs):
        got = sorted(
            r["id"]
            for r in apply_filters(df, {"n": fn, "s": fs}).select("id").collect()
        )
        want = sorted(
            i
            for i, (_, n, s) in py.items()
            if (not fn.strip() or _ref_filter_match(n, fn, True))
            and (not fs.strip() or _ref_filter_match(s, fs, False))
        )
        assert got == want, (fn, fs, got, want)

    run()


def test_sort_parity_generative(spark):
    """Sort on any column/direction must equal the reference comparator:
    NULLs largest, numerics native, strings lowercased."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rows = [
        (0, None, "b"),
        (1, -5, None),
        (2, 0, "A"),
        (3, 7, "a"),
        (4, 7, "Z"),
        (5, None, "0digit"),
    ]
    df = spark.createDataFrame(rows, "id long, n int, s string").cache()
    py = {r[0]: r for r in rows}

    @settings(max_examples=40, deadline=None)
    @given(
        column=st.sampled_from(["n", "s"]),
        direction=st.sampled_from(["asc", "desc"]),
    )
    def run(column, direction):
        got = [
            r["id"]
            for r in apply_sort(df, SortState(column, direction)).select(
                "id", column
            ).collect()
        ]
        idx = 1 if column == "n" else 2

        def key(i):
            v = py[i][idx]
            if v is None:
                return (1, 0)  # NULL largest
            return (0, v if column == "n" else str(v).lower())

        want = sorted(py, key=key, reverse=(direction == "desc"))
        # compare as grouped sequences: ties may order arbitrarily
        def grouped(ids):
            return [key(i) for i in ids]

        assert grouped(got) == grouped(want), (column, direction, got, want)

    run()
