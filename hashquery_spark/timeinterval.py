"""Calendar-aware time intervals.

Mirrors the semantics of the reference's ``timeinterval`` utility
(reference: src/utils/timeinterval.py:4-24) plus the ``timedelta``
normalization rules used during compilation
(reference: src/run/compile/column_expression/compilers/py_value.py:83-131):
a ``timedelta`` is normalized to the *widest whole unit* that exactly
represents it (weeks -> days -> hours -> minutes -> seconds), and
sub-second precision is truncated.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import timedelta

_UNITS = ("year", "quarter", "month", "week", "day", "hour", "minute", "second")


@dataclass(frozen=True)
class timeinterval:
    """A calendar interval of ``num`` ``unit``s (e.g. 3 months)."""

    unit: str
    num: int

    def __post_init__(self):
        unit = self.unit.rstrip("s") if self.unit.endswith("s") else self.unit
        if unit not in _UNITS:
            raise ValueError(f"unknown interval unit: {self.unit!r} (expected one of {_UNITS})")
        object.__setattr__(self, "unit", unit)

    def __neg__(self) -> "timeinterval":
        return timeinterval(self.unit, -self.num)

    def __repr__(self) -> str:
        return f"timeinterval({self.unit!r}, {self.num})"


def normalize_timedelta(delta: timedelta) -> timeinterval:
    """Convert a ``timedelta`` to the widest whole-unit ``timeinterval``.

    Sub-second precision is truncated, matching the reference
    (src/run/compile/column_expression/compilers/py_value.py:110-129).
    """
    total_seconds = int(delta.total_seconds())
    for unit, seconds_per in (
        ("week", 7 * 86400),
        ("day", 86400),
        ("hour", 3600),
        ("minute", 60),
    ):
        if total_seconds != 0 and total_seconds % seconds_per == 0:
            return timeinterval(unit, total_seconds // seconds_per)
    return timeinterval("second", total_seconds)
