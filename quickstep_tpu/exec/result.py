"""Query results + PrintToScreen-style formatting.

Output format parity with the reference's cli/PrintToScreen.{hpp,cpp}: a +--+ ruled
table with right-aligned numerics and left-aligned strings, and the reference's value
formatting (doubles printed with up to precision, dates as YYYY-MM-DD).
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
        if v is None:
            return "NULL"
        if t.is_floating:
            return _format_double(float(v))
        return str(v)

    def to_table(self) -> str:
        """PrintToScreen-style +--+ ruled table."""
        if self.message is not None and not self.column_names:
            return self.message
        cells = [[self.format_value(v, t)
                  for v, t in zip(row, self.types)] for row in self.rows]
        widths = []
        for i, name in enumerate(self.column_names):
            w = len(name)
            for r in cells:
                w = max(w, len(r[i]))
            widths.append(w)
        bar = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
        lines = [bar]
        lines.append("|" + "|".join(
            f" {n.ljust(w)} " for n, w in zip(self.column_names, widths)) + "|")
        lines.append(bar)
        for r in cells:
            line = "|"
            for v, w, t in zip(r, widths, self.types):
                if t.is_numeric or t.type_id in (TypeID.DATE, TypeID.DATETIME):
                    line += f" {v.rjust(w)} |"
                else:
                    line += f" {v.ljust(w)} |"
            lines.append(line)
        lines.append(bar)
        return "\n".join(lines)


def _format_double(x: float) -> str:
    """Default %g-like printing used by the reference's TypedValue printing."""
    if x == int(x) and abs(x) < 1e15:
        return str(int(x))
    return repr(round(x, 10)) if abs(x) > 1e-4 else f"{x:.6g}"
