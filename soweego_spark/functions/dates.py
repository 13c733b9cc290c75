"""Date handling with explicit precision (Wikidata-style).

A date value is a ``(ts_string, precision_int)`` pair — precision integers
follow the Wikidata vocabulary (soweego/wikidata/vocabulary.py:232-246):
9=year, 10=month, 11=day, 12=hour, 13=minute, 14=second; anything below 9
(decade..billion years) degrades to year, matching the reference parser
(linker/workflow.py:673-719).

Internally we keep dates as a struct ``(y, mo, d, h, mi, s, prec)`` of ints
where ``prec`` is 0-based attribute depth (0=year .. 5=second) — the same
shape the reference reaches via ``pandas.Period`` and
``PD_PERIOD_PRECISIONS.index`` (commons/constants.py:414-423).

``date_pair_score`` is the SimilarDates semantics
(linker/features.py:349-403): best over the cross product of the two date
lists of ``matched_attrs / (shared_prec + 1)``, where attributes are compared
from year downward and comparison stops at the first mismatch.

``dates_match`` is the baseline's boolean variant (linker/baseline.py:366-397).
"""

from __future__ import annotations

# Wikidata precision int -> number of ISO-prefix chars to keep (ref
# workflow.py:686-702) and -> 0-based attribute depth.
_PRECISION_TO_SLICE = {9: 4, 10: 7, 11: 10, 12: 13, 13: 16}
_PRECISION_TO_DEPTH = {9: 0, 10: 1, 11: 2, 12: 3, 13: 4, 14: 5}

ATTR_DEPTH_YEAR = 0
ATTR_DEPTH_SECOND = 5


def parse_date(ts: str, precision: int) -> tuple[int, int, int, int, int, int, int] | None:
    """Parse an ISO-ish timestamp + Wikidata precision into the int struct.

    Returns ``(y, mo, d, h, mi, s, depth)`` or None when unparseable.
    Sub-year precisions fall back to year, like the reference.
    """
    if ts is None or precision is None:
        return None
    prec = int(precision)
    if prec < 9:
        prec = 9
    depth = _PRECISION_TO_DEPTH.get(prec, 5)
    body = ts.split("T")
    date_parts = body[0].split("-")
    time_parts = body[1].rstrip("Z").split(":") if len(body) > 1 else []
    try:
        y = int(date_parts[0])
        mo = int(date_parts[1]) if len(date_parts) > 1 and int(date_parts[1]) else 1
        d = int(date_parts[2]) if len(date_parts) > 2 and int(date_parts[2]) else 1
        h = int(time_parts[0]) if len(time_parts) > 0 else 0
        mi = int(time_parts[1]) if len(time_parts) > 1 else 0
        s = int(time_parts[2]) if len(time_parts) > 2 else 0
    except (ValueError, IndexError):
        return None
    return (y, mo, d, h, mi, s, depth)


def date_pair_score(
    left: list[tuple] | None, right: list[tuple] | None
) -> float | None:
    """SimilarDates: best cross-product score in [0, 1]; None when a side is
    null/empty (caller fills with the feature missing value)."""
    if not left or not right:
        return None
    best = 0.0
    for lv in left:
        for rv in right:
            if lv is None or rv is None:
                continue
            shared = min(lv[6], rv[6])
            matched = 0
            for i in range(shared + 1):
                if lv[i] == rv[i]:
                    matched += 1
                else:
                    break
            best = max(best, matched / (shared + 1))
    return best


def dates_match(left: tuple | None, right: tuple | None) -> bool:
    """Baseline boolean match: all attributes up to the shared precision are
    equal (baseline.py:366-397; shared precision below year refuses)."""
    if left is None or right is None:
        return False
    shared = min(left[6], right[6])
    return all(left[i] == right[i] for i in range(shared + 1))
