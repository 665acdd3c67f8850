"""SQL lexer.

Hand-written tokenizer with the token surface of the reference's flex lexer
(parser/SqlLexer.lpp: 123 keywords, quoted strings with '' escapes and e'\\x' escaped
strings, double-quoted identifiers, numeric literals, -- and C-style comments).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from quickstep_tpu.errors import ParseError

KEYWORDS = {
    "add", "all", "alter", "and", "as", "asc", "between", "bigint", "bit",
    "bitweaving", "blockproperties", "blocksample", "bloom", "by", "case", "cast",
    "character", "char", "check", "column", "constraint", "copy", "create", "csbtree",
    "current", "date", "datetime", "day", "decimal", "default", "delete", "delimiter",
    "desc", "distinct", "double", "drop", "else", "end", "escape_strings", "except",
    "exists",
    "extract", "false", "first", "float", "following", "for", "foreign", "from", "full",
    "group", "hash", "having", "hour", "in", "index", "inner", "insert", "integer", "int",
    "intersect", "interval", "into", "is", "join", "key", "last", "left", "like", "limit",
    "long", "minute", "month", "not", "null", "nulls", "off", "on", "or", "order", "outer",
    "over", "partition", "partitions", "percent", "preceding", "primary", "priority",
    "quit", "range", "real", "references", "regexp", "right", "row", "rows", "second",
    "select", "set", "sma", "smallint", "stderr", "stdout", "substring", "table", "then",
    "time", "timestamp", "true", "tuplesample", "unbounded", "union", "unique", "update",
    "using", "values", "varchar", "week", "when", "where", "window", "with", "year",
    "yearmonth",
}

MULTI_CHAR_OPS = ["<>", "!=", "<=", ">=", "||"]
SINGLE_CHAR_OPS = "+-*/%(),.;=<>[]"


@dataclasses.dataclass
class Token:
    kind: str        # 'keyword' | 'ident' | 'number' | 'string' | 'op' | 'command' | 'eof'
    value: object
    line: int
    column: int
    text: Optional[str] = None   # raw source spelling (numbers: display names)

    def is_kw(self, kw: str) -> bool:
        return self.kind == "keyword" and self.value == kw


def tokenize(text: str) -> List[Token]:
    toks: List[Token] = []
    i, line, col = 0, 0, 0
    n = len(text)

    def err(msg: str) -> ParseError:
        return ParseError(msg, line, col)

    while i < n:
        c = text[i]
        # whitespace
        if c in " \t\r":
            i += 1
            col += 1
            continue
        if c == "\n":
            i += 1
            line += 1
            col = 0
            continue
        # comments
        if text.startswith("--", i):
            j = text.find("\n", i)
            i = n if j < 0 else j
            continue
        if text.startswith("/*", i):
            j = text.find("*/", i + 2)
            if j < 0:
                raise err("unterminated comment")
            seg = text[i:j + 2]
            line += seg.count("\n")
            col = len(seg) - seg.rfind("\n") - 1 if "\n" in seg else col + len(seg)
            i = j + 2
            continue
        # backslash CLI command: consume to end of line
        if c == "\\":
            j = text.find("\n", i)
            j = n if j < 0 else j
            toks.append(Token("command", text[i:j].strip(), line, col))
            col += j - i
            i = j
            continue
        # string literal
        if c == "'":
            start_line, start_col = line, col
            j = i + 1
            buf = []
            while True:
                if j >= n:
                    raise ParseError("unterminated string literal", start_line, start_col)
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                if text[j] == "\n":
                    line += 1
                buf.append(text[j])
                j += 1
            toks.append(Token("string", "".join(buf), start_line, start_col))
            col += j + 1 - i
            i = j + 1
            continue
        # escaped string e'...'
        if c in "eE" and i + 1 < n and text[i + 1] == "'":
            start_col = col
            j = i + 2
            buf = []
            while True:
                if j >= n:
                    raise err("unterminated string literal")
                ch = text[j]
                if ch == "\\" and j + 1 < n:
                    esc = text[j + 1]
                    mapping = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'"}
                    buf.append(mapping.get(esc, esc))
                    j += 2
                    continue
                if ch == "'":
                    break
                buf.append(ch)
                j += 1
            toks.append(Token("string", "".join(buf), line, start_col))
            col += j + 1 - i
            i = j + 1
            continue
        # quoted identifier
        if c == '"':
            j = text.find('"', i + 1)
            if j < 0:
                raise err("unterminated quoted identifier")
            toks.append(Token("ident", text[i + 1:j], line, col))
            col += j + 1 - i
            i = j + 1
            continue
        # number
        if c.isdigit() or (c == "." and i + 1 < n and text[i + 1].isdigit()):
            j = i
            seen_dot = False
            seen_exp = False
            while j < n:
                ch = text[j]
                if ch.isdigit():
                    j += 1
                elif ch == "." and not seen_dot and not seen_exp:
                    seen_dot = True
                    j += 1
                elif ch in "eE" and not seen_exp and j + 1 < n and \
                        (text[j + 1].isdigit() or text[j + 1] in "+-"):
                    seen_exp = True
                    j += 2 if text[j + 1] in "+-" else 1
                else:
                    break
            lit = text[i:j]
            val = float(lit) if (seen_dot or seen_exp) else int(lit)
            toks.append(Token("number", val, line, col, text=lit))
            col += j - i
            i = j
            continue
        # identifier / keyword
        if c.isalpha() or c == "_":
            j = i
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            word = text[i:j]
            lw = word.lower()
            if lw in KEYWORDS:
                toks.append(Token("keyword", lw, line, col))
            else:
                toks.append(Token("ident", word, line, col))
            col += j - i
            i = j
            continue
        # operators
        matched: Optional[str] = None
        for op in MULTI_CHAR_OPS:
            if text.startswith(op, i):
                matched = op
                break
        if matched:
            toks.append(Token("op", "<>" if matched == "!=" else matched, line, col))
            i += len(matched)
            col += len(matched)
            continue
        if c in SINGLE_CHAR_OPS:
            toks.append(Token("op", c, line, col))
            i += 1
            col += 1
            continue
        raise err(f"illegal character {c!r}")

    toks.append(Token("eof", None, line, col))
    return toks
