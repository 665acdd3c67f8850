"""User-facing SQL errors with line/column caret formatting.

Capability parity with the reference's SqlError (utility/SqlError.hpp), which formats a
parse/resolution error with the offending query line and a caret under the column.
"""

from __future__ import annotations


class QuickstepError(Exception):
    """Base class for all engine errors."""


class SqlError(QuickstepError):
    """A SQL syntax or semantic error, optionally bound to a source location."""

    def __init__(self, message: str, line: int = -1, column: int = -1):
        super().__init__(message)
        self.message = message
        self.line = line      # 0-based
        self.column = column  # 0-based

    def format(self, sql_text: str) -> str:
        """Render `message` with the source line and a caret marking the column."""
        if self.line < 0:
            return f"ERROR: {self.message}"
        lines = sql_text.split("\n")
        out = [f"ERROR: {self.message} (line {self.line + 1}, column {self.column + 1})"]
        if 0 <= self.line < len(lines):
            src = lines[self.line]
            # Trim very long lines around the error position, as the reference does.
            start = max(0, self.column - 60)
            frag = src[start:start + 120]
            out.append(frag)
            out.append(" " * (self.column - start) + "^")
        return "\n".join(out)


class ParseError(SqlError):
    pass


class ResolutionError(SqlError):
    pass


class ExecutionError(QuickstepError):
    pass
