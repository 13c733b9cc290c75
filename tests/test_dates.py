"""Date precision parsing + SimilarDates scoring semantics.

Oracle: the reference's logic via pandas.Period (linker/features.py:349-403,
linker/workflow.py:673-719) reimplemented inline with pandas — dependency-
light, no reference import needed beyond semantics documented in SURVEY.md.
"""

from __future__ import annotations

import pandas as pd
import pytest

from soweego_spark.functions import dates

# The reference pins pandas<1 names ("A-DEC", "T"); pandas 2 renamed them.
PD_FREQ_DEPTH = {
    "A-DEC": 0, "YE-DEC": 0, "M": 1, "ME": 1, "D": 2, "H": 3, "h": 3,
    "T": 4, "min": 4, "S": 5, "s": 5,
}


def _ref_score(left_periods, right_periods):
    best = 0.0
    for s in left_periods:
        for t in right_periods:
            sp = PD_FREQ_DEPTH[s.freq.name]
            tp = PD_FREQ_DEPTH[t.freq.name]
            lowest = min(sp, tp)
            cur = 0
            for need, attr in enumerate(
                ["year", "month", "day", "hour", "minute", "second"]
            ):
                if lowest >= need and getattr(s, attr) == getattr(t, attr):
                    cur += 1
                else:
                    break
            best = max(best, cur / (lowest + 1))
    return best


def _mk(ts, prec):
    parsed = dates.parse_date(ts, prec)
    slice_len = {9: 4, 10: 7, 11: 10, 12: 13, 13: 16}.get(max(prec, 9), len(ts))
    period = pd.Period(ts.split("Z")[0][:slice_len])
    return parsed, period

CASES = [
    # (left list, right list) of (ts, precision)
    ([("1939-03-03T00:00:00Z", 11)], [("1939-03-03T00:00:00Z", 11)]),
    ([("1939-03-03T00:00:00Z", 11)], [("1939-00-00T00:00:00Z", 9)]),
    ([("1939-03-03T00:00:00Z", 11)], [("1939-04-00T00:00:00Z", 10)]),
    ([("1939-03-03T00:00:00Z", 11)], [("1940-03-03T00:00:00Z", 11)]),
    ([("1939-03-03T00:00:00Z", 11), ("1950-01-01T00:00:00Z", 9)],
     [("1950-06-00T00:00:00Z", 10)]),
    ([("1743-00-00T00:00:00Z", 9)], [("1743-00-00T00:00:00Z", 7)]),  # decade→year
    ([("1980-05-17T12:00:00Z", 12)], [("1980-05-17T12:30:00Z", 13)]),
]


@pytest.mark.parametrize("left,right", CASES)
def test_date_pair_score_matches_period_semantics(left, right):
    lp, lref = zip(*[_mk(ts, p) for ts, p in left])
    rp, rref = zip(*[_mk(ts, p) for ts, p in right])
    ours = dates.date_pair_score(list(lp), list(rp))
    theirs = _ref_score(list(lref), list(rref))
    assert ours == pytest.approx(theirs)


def test_null_handling():
    assert dates.date_pair_score(None, [(1, 1, 1, 0, 0, 0, 0)]) is None
    assert dates.date_pair_score([], []) is None


def test_dates_match_boolean():
    a = dates.parse_date("1939-03-03T00:00:00Z", 11)
    b = dates.parse_date("1939-00-00T00:00:00Z", 9)
    c = dates.parse_date("1940-03-03T00:00:00Z", 11)
    assert dates.dates_match(a, b)       # year-level agreement
    assert not dates.dates_match(a, c)   # year differs
    assert not dates.dates_match(a, None)
