"""Query results + PrintToScreen-parity formatting.

Byte-exact output parity with the reference's cli/PrintToScreen.{hpp,cpp}:
column width = max(display-name length, Type::getPrintWidth, 4 if nullable)
(PrintToScreen.cpp:76-93); header names left-justified (%-*s, :99-106); every
value right-justified in its column (%*d / %*.*g / %*.*s / %*s per type,
types/IntType.cpp:73, FloatType.cpp:93 %.9g, DoubleType.cpp:93 %.17g,
CharType.cpp:107, DateType.cpp:89); NULL printed as right-justified "NULL"
(PrintToScreen.cpp:155-159).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from quickstep_tpu.types import Type, TypeID


@dataclasses.dataclass
class QueryResult:
    column_names: List[str]
    types: List[Type]
    rows: List[tuple]
    rows_affected: Optional[int] = None   # DML
    message: Optional[str] = None         # DDL / commands
    execution_time: float = 0.0

    @property
    def num_rows(self) -> int:
        return len(self.rows)

    def format_value(self, v, t: Type) -> str:
        """One value as the reference prints it (width-0 form)."""
        return _format_cell(v, t)

    def to_table(self) -> str:
        """PrintToScreen::PrintRelation byte-parity table (no trailing \\n)."""
        if self.message is not None and not self.column_names:
            return self.message
        widths = []
        for name, t in zip(self.column_names, self.types):
            w = max(len(name), t.print_width)
            if t.nullable and w < 4:
                w = 4
            widths.append(w)
        hbar = "+" + "".join("-" * w + "+" for w in widths)
        lines = [hbar]
        lines.append("|" + "".join(
            f"{n:<{w}}|" for n, w in zip(self.column_names, widths)))
        lines.append(hbar)
        for row in self.rows:
            lines.append("|" + "".join(
                f"{_format_cell(v, t):>{w}}|"
                for v, t, w in zip(row, self.types, widths)))
        lines.append(hbar)
        return "\n".join(lines)

    def output_size(self) -> str:
        """PrintToScreen::PrintOutputSize parity."""
        n = self.num_rows
        return f"({n} {'row' if n == 1 else 'rows'})"


def _format_cell(v, t: Type) -> str:
    if v is None:
        return "NULL"
    tid = t.type_id
    if tid == TypeID.FLOAT:
        return "%.9g" % float(v)
    if tid == TypeID.DOUBLE:
        return "%.17g" % float(v)
    if tid == TypeID.DECIMAL:
        # values are exact scaled integers; print exact fixed-point
        return "%.*f" % (t.scale, float(v))
    if t.is_string:
        # CharType prints %*.*s with precision = declared length
        return str(v)[:t.length] if t.length else str(v)
    if tid == TypeID.DATETIME:
        # decoded as "YYYY-MM-DD HH:MM:SS[.ssssss]" -> ISO 'T' form with
        # fixed 6-digit subseconds (DatetimeType.cpp:94-112)
        s = str(v).replace(" ", "T", 1)
        if "." in s:
            head, sub = s.split(".", 1)
            s = f"{head}.{sub:<06s}"[:len(head) + 7]
        return s
    if tid == TypeID.DATETIME_INTERVAL:
        return _format_dt_interval(int(v))
    if tid == TypeID.YEARMONTH_INTERVAL:
        return _format_ym_interval(int(v))
    return str(v)


def _format_dt_interval(us: int) -> str:
    """DatetimeIntervalType::printValueToString parity
    ("D day[s] HH:MM:SS[.ssssss]", types/DatetimeIntervalType.cpp:72-99)."""
    neg = us < 0
    us = abs(us)
    secs, sub = divmod(us, 1_000_000)
    days, rem = divmod(secs, 86400)
    h, rem = divmod(rem, 3600)
    m, s = divmod(rem, 60)
    out = "-" if neg else ""
    if days:
        out += f"{days} day " if days == 1 else f"{days} days "
    out += f"{h:02d}:{m:02d}:{s:02d}"
    if sub:
        out += f".{sub:06d}"
    return out


def _format_ym_interval(months: int) -> str:
    """YearMonthIntervalType::printValueToString parity (years printed only
    when nonzero, singular/plural "year"/"mon" forms)."""
    neg = months < 0
    months = abs(months)
    y, m = divmod(months, 12)
    out = "-" if neg else ""
    if y:
        out += f"{y} year" + ("" if y == 1 else "s")
    if m or not y:
        if y:
            out += " "
        out += f"{m} mon" + ("" if m == 1 else "s")
    return out
