"""Date / datetime / interval encodings and literal parsing.

Capability parity with the reference's DateLit/DatetimeLit/IntervalLit
(types/DatetimeLit.hpp, types/IntervalLit.hpp, types/IntervalParser.hpp).

DATE device encoding: int32 packed as (year << 9) | (month << 5) | day.
Order-preserving, so device comparisons work on raw codes; EXTRACT is shift/mask;
month/year arithmetic is cheap bit math. Day-granularity arithmetic converts through a
day-number (host-side for literal folding; device helpers provided for column ops).

DATETIME: int64 microseconds since Unix epoch. Intervals: DATETIME_INTERVAL = int64
microseconds, YEARMONTH_INTERVAL = int32 months.
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Tuple

US_PER_SECOND = 1_000_000
US_PER_DAY = 86_400 * US_PER_SECOND

_DAYS_IN_MONTH = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def _is_leap(y: int) -> bool:
    return (y % 4 == 0 and y % 100 != 0) or y % 400 == 0


def days_in_month(y: int, m: int) -> int:
    if m == 2 and _is_leap(y):
        return 29
    return _DAYS_IN_MONTH[m - 1]


def date_encode(year: int, month: int, day: int) -> int:
    return (year << 9) | (month << 5) | day


def date_decode(code: int) -> Tuple[int, int, int]:
    return code >> 9, (code >> 5) & 0xF, code & 0x1F


def date_to_str(code: int) -> str:
    y, m, d = date_decode(int(code))
    return f"{y:04d}-{m:02d}-{d:02d}"


def date_add_months(code: int, months: int) -> int:
    """DATE + YEARMONTH_INTERVAL, clamping the day (reference DateOperatorOverloads.hpp)."""
    y, m, d = date_decode(code)
    t = (y * 12 + (m - 1)) + months
    ny, nm = divmod(t, 12)
    nm += 1
    nd = min(d, days_in_month(ny, nm))
    return date_encode(ny, nm, nd)


def date_add_days(code: int, days: int) -> int:
    y, m, d = date_decode(code)
    nd = _dt.date(y, m, d) + _dt.timedelta(days=days)
    return date_encode(nd.year, nd.month, nd.day)


def date_to_ordinal(code: int) -> int:
    y, m, d = date_decode(code)
    return _dt.date(y, m, d).toordinal()


def datetime_encode(year, month, day, hour=0, minute=0, second=0, us=0) -> int:
    epoch = _dt.datetime(1970, 1, 1)
    t = _dt.datetime(year, month, day, hour, minute, second)
    return int((t - epoch).total_seconds()) * US_PER_SECOND + us


def datetime_to_str(us_since_epoch: int) -> str:
    us = int(us_since_epoch)
    secs, sub = divmod(us, US_PER_SECOND)
    t = _dt.datetime(1970, 1, 1) + _dt.timedelta(seconds=secs)
    base = t.strftime("%Y-%m-%d %H:%M:%S")
    if sub:
        base += f".{sub:06d}".rstrip("0")
    return base


_DATE_RE = re.compile(r"^\+?(\d{1,5})-(\d{1,2})-(\d{1,2})$")
_DATETIME_RE = re.compile(
    r"^(\d{1,5})-(\d{1,2})-(\d{1,2})[ T](\d{1,2}):(\d{1,2})(?::(\d{1,2})(?:\.(\d{1,6}))?)?$")


def parse_date_literal(text: str) -> int:
    m = _DATE_RE.match(text.strip())
    if not m:
        raise ValueError(f"invalid DATE literal: {text!r}")
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if not (1 <= mo <= 12 and 1 <= d <= days_in_month(y, mo)):
        raise ValueError(f"invalid DATE literal: {text!r}")
    return date_encode(y, mo, d)


def parse_datetime_literal(text: str) -> int:
    m = _DATETIME_RE.match(text.strip())
    if not m:
        # A bare date is a valid datetime at midnight.
        code = parse_date_literal(text)
        y, mo, d = date_decode(code)
        return datetime_encode(y, mo, d)
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    h, mi = int(m.group(4)), int(m.group(5))
    s = int(m.group(6) or 0)
    us = int((m.group(7) or "0").ljust(6, "0"))
    return datetime_encode(y, mo, d, h, mi, s, us)


_INTERVAL_UNITS_US = {
    "microsecond": 1, "us": 1,
    "millisecond": 1000, "ms": 1000,
    "second": US_PER_SECOND, "seconds": US_PER_SECOND, "s": US_PER_SECOND,
    "minute": 60 * US_PER_SECOND, "minutes": 60 * US_PER_SECOND,
    "hour": 3600 * US_PER_SECOND, "hours": 3600 * US_PER_SECOND,
    "day": US_PER_DAY, "days": US_PER_DAY,
    "week": 7 * US_PER_DAY, "weeks": 7 * US_PER_DAY,
}
_INTERVAL_UNITS_MONTHS = {
    "month": 1, "months": 1,
    "year": 12, "years": 12,
}


def parse_interval_literal(text: str) -> Tuple[str, int]:
    """Parse "<n> <unit>" (e.g. "3 month", "90 day") as the reference IntervalParser does.

    Returns ("datetime_interval", microseconds) or ("yearmonth_interval", months).
    """
    parts = text.strip().lower().split()
    if len(parts) != 2:
        raise ValueError(f"invalid INTERVAL literal: {text!r}")
    qty = int(parts[0])
    unit = parts[1].rstrip("s") if parts[1] not in _INTERVAL_UNITS_US else parts[1]
    if parts[1] in _INTERVAL_UNITS_MONTHS or unit in _INTERVAL_UNITS_MONTHS:
        mult = _INTERVAL_UNITS_MONTHS.get(parts[1], _INTERVAL_UNITS_MONTHS.get(unit))
        return ("yearmonth_interval", qty * mult)
    mult = _INTERVAL_UNITS_US.get(parts[1], _INTERVAL_UNITS_US.get(unit))
    if mult is None:
        raise ValueError(f"invalid INTERVAL unit: {parts[1]!r}")
    return ("datetime_interval", qty * mult)
