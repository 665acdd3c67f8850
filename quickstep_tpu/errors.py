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
        """Render `message` with the source snippet and a caret, byte-compatible
        with the reference's SqlError::formatMessage (utility/SqlError.cpp:37-123):
        'ERROR: <msg> (<line> : <col>)', a <=40-left/30-right char window around
        the error (never splitting alphanumeric words, '...' marking omissions),
        and a caret line."""
        if self.line < 0 or not sql_text:
            return f"ERROR: {self.message}"
        line_begin = 0
        for _ in range(self.line):
            nl = sql_text.find("\n", line_begin)
            if nl < 0:
                break
            line_begin = nl + 1
        err_line, err_col = self.line, self.column
        if line_begin == len(sql_text) and self.column == 0:
            # error position beyond the last line: move to end of previous line
            line_end = line_begin - 1
            line_begin = sql_text.rfind("\n", 0, max(line_end - 1, 0)) + 1
            err_line -= 1
            err_col = line_end - line_begin
        else:
            line_end = sql_text.find("\n", line_begin)
            if line_end < 0:
                line_end = len(sql_text) - 1
        center = err_col + line_begin
        # window start: <=40 chars left, clamped to line start, then widened
        # left to a word boundary
        if center == 0:
            start = 0
        else:
            start = max(center - 40, sql_text.rfind("\n", 0, center) + 1)
            if start < len(sql_text) and sql_text[start].isalnum():
                while start > 0 and sql_text[start - 1].isalnum():
                    start -= 1
        # window end: <=30 chars right, clamped to line end, widened right
        end = center + 30
        nl = sql_text.find("\n", center)
        cur_line_end = nl if nl >= 0 else len(sql_text)
        end = min(end, cur_line_end)
        if end < len(sql_text) and sql_text[end].isalnum():
            while end < len(sql_text) - 1 and sql_text[end + 1].isalnum():
                end += 1
        out = [f"ERROR: {self.message} ({err_line + 1} : {err_col + 1})"]
        omitted = start > line_begin
        snippet = ("..." if omitted else "") + sql_text[start:end]
        if end < line_end:
            snippet += "..."
        out.append(snippet)
        caret = "   " if omitted else ""
        for i in range(start, center):
            caret += "\t" if sql_text[i] == "\t" else " "
        out.append(caret + "^")
        return "\n".join(out)


class ParseError(SqlError):
    pass


class ResolutionError(SqlError):
    pass


class ExecutionError(QuickstepError):
    pass
