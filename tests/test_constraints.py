"""Data-quality constraint suite (operators/constraints.py):
per-kind verdicts, null/vacuous handling, referential integrity, and
the one-scan plan shape for row-level checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hypermap_etl_spark.operators.constraints import (
    check_constraints,
    completeness,
    in_range,
    in_set,
    matches,
    non_negative,
    not_null,
    references,
    row_count,
    suite_passed,
    unique,
)


def _report(df, checks, refs=None):
    rows = check_constraints(df, checks, refs=refs).collect()
    return {r["constraint"]: r for r in rows}


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, "US"),
            (2, "b", -5.0, "DE"),
            (3, None, 20.0, "US"),
            (4, "d", None, "XX"),
            (4, "e", 30.0, "FR"),
        ],
        "id int, name string, score double, country string",
    )


def test_not_null_and_completeness(frame):
    rep = _report(
        frame, [not_null("id"), not_null("name"), completeness("name", 0.7)]
    )
    assert rep["not_null(id)"]["passed"] is True
    assert rep["not_null(id)"]["observed"] == 1.0
    assert rep["not_null(name)"]["passed"] is False
    assert rep["not_null(name)"]["observed"] == 0.8
    assert rep["completeness(name)"]["passed"] is True
    assert rep["completeness(name)"]["threshold"] == 0.7


def test_unique(frame):
    rep = _report(frame, [unique("id"), unique("name")])
    # id has 4 duplicated into 5 rows -> 4/5
    assert rep["unique(id)"]["passed"] is False
    assert rep["unique(id)"]["observed"] == 0.8
    # name: 4 non-null, all distinct (nulls are completeness's business)
    assert rep["unique(name)"]["passed"] is True
    assert rep["unique(name)"]["observed"] == 1.0


def test_in_range_and_non_negative(frame):
    rep = _report(
        frame,
        [in_range("score", lo=-10, hi=100), non_negative("score")],
    )
    assert rep["in_range(score,-10,100)"]["passed"] is True
    # 3 of 4 non-null scores are >= 0
    assert rep["in_range(score,0,None)"]["observed"] == 0.75
    assert rep["in_range(score,0,None)"]["passed"] is False
    # two checks differing only in threshold share an id: rejected
    with pytest.raises(ValueError, match="duplicate"):
        check_constraints(
            frame, [non_negative("score"), non_negative("score", at_least=0.7)]
        )


def test_in_set_and_matches(frame):
    rep = _report(
        frame,
        [
            in_set("country", ["US", "DE", "FR"], at_least=0.7),
            matches("country", "^[A-Z]{2}$"),
        ],
    )
    assert rep["in_set(country)"]["observed"] == 0.8
    assert rep["in_set(country)"]["passed"] is True
    assert rep["matches(country)"]["passed"] is True


def test_row_count(frame):
    rep = _report(frame, [row_count(at_least=5, at_most=5), row_count(at_most=3)])
    assert rep["row_count(5,5)"]["passed"] is True
    assert rep["row_count(5,5)"]["observed"] == 5.0
    assert rep["row_count(None,3)"]["passed"] is False
    assert rep["row_count(None,3)"]["threshold"] is None


def test_references(spark, frame):
    dims = spark.createDataFrame([("US",), ("DE",), (None,)], "code string")
    rep = _report(
        frame,
        [references("country", "dims", "code")],
        refs={"dims": dims},
    )
    r = rep["references(country->dims.code)"]
    assert r["observed"] == 2.0  # XX and FR
    assert r["passed"] is False


def test_vacuous_on_empty(spark):
    empty = spark.createDataFrame([], "id int, v string")
    rep = _report(
        empty,
        [not_null("id"), unique("id"), in_set("v", ["x"]), row_count(at_least=1)],
    )
    assert rep["not_null(id)"]["observed"] == 1.0
    assert rep["unique(id)"]["passed"] is True
    assert rep["in_set(v)"]["observed"] == 1.0
    assert rep["row_count(1,None)"]["passed"] is False


def test_suite_passed(frame):
    good = check_constraints(frame, [not_null("id"), row_count(at_least=1)])
    bad = check_constraints(frame, [not_null("name")])
    assert suite_passed(good) is True
    assert suite_passed(bad) is False


def test_validation_errors(spark, frame):
    with pytest.raises(ValueError, match="no checks"):
        check_constraints(frame, [])
    with pytest.raises(ValueError, match="duplicate"):
        check_constraints(frame, [not_null("id"), not_null("id")])
    with pytest.raises(ValueError, match="not in frame"):
        check_constraints(frame, [not_null("nope")])
    with pytest.raises(ValueError, match="unregistered"):
        check_constraints(frame, [references("id", "missing", "k")])
    with pytest.raises(ValueError, match="at least one bound"):
        in_range("id")
    with pytest.raises(ValueError, match="non-empty"):
        in_set("id", [])
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        completeness("id", 1.5)


def test_one_scan_for_row_level_checks(frame):
    """All row-level checks fold into ONE aggregate over ONE scan —
    the declared 100 TB contract."""
    rep = check_constraints(
        frame,
        [
            not_null("id"),
            completeness("name", 0.5),
            in_range("score", lo=0),
            in_set("country", ["US"]),
            matches("name", "^[a-z]$"),
            row_count(at_least=1),
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") <= 1


def test_nulls_never_count_as_ok(frame):
    # score has a null; in_range's ok-numerator must exclude it even
    # though NULL >= 0 is NULL (not False) in SQL
    rep = _report(frame, [in_range("score", lo=-100, hi=100)])
    assert rep["in_range(score,-100,100)"]["observed"] == 1.0
