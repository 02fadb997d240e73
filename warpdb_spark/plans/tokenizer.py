"""Tokenizer for the WarpDB dialect.

Spec distilled from the reference lexer (src/expression.cpp:22-120):

- identifiers start with a letter/underscore and may contain letters,
  digits, underscores and dots (qualified ``a.b`` names survive as one
  token — src/expression.cpp:48-54);
- numbers are digits with an optional fractional part;
- two-char operators ``>= <= == !=`` are recognized before single-char
  ones (src/expression.cpp:85-98); bare ``=`` is equality;
- keywords are case-insensitive reserved words;
- every token carries 1-based line/column, and unknown characters raise
  a position-carrying error (tests/tokenize_error_test.cpp:8-19).

Supersets: single-quoted string literals ('' escapes a quote) and the
extra keywords for NOT/BETWEEN/IN/LIKE/IS NULL/CASE/joins/set-ops.
"""

from __future__ import annotations

from dataclasses import dataclass

from warpdb_spark.errors import TokenizeError

KEYWORDS = {
    "SELECT", "DISTINCT", "FROM", "JOIN", "INNER", "LEFT", "RIGHT", "FULL",
    "OUTER", "SEMI", "ANTI", "CROSS", "ON", "WHERE", "GROUP", "BY", "HAVING",
    "ORDER", "ASC", "DESC", "LIMIT", "OFFSET", "AND", "OR", "NOT", "BETWEEN",
    "IN", "LIKE", "IS", "NULL", "CASE", "WHEN", "THEN", "ELSE", "END", "OVER",
    "PARTITION", "ROWS", "RANGE", "PRECEDING", "FOLLOWING", "UNBOUNDED",
    "CURRENT", "ROW", "AS", "UNION", "INTERSECT", "EXCEPT", "ALL", "TRUE",
    "FALSE", "EXISTS", "WITH", "WINDOW", "QUALIFY", "RECURSIVE", "ILIKE",
    "FETCH",
}

# token kinds
NUMBER, IDENT, STRING, OP, KEYWORD, EOF = "NUMBER", "IDENT", "STRING", "OP", "KEYWORD", "EOF"
HINT = "HINT"  # /*+ ... */ optimizer hint (content as the value)

_TWO_CHAR_OPS = (">=", "<=", "==", "!=")
_ONE_CHAR_OPS = "+-*/%(),><="


@dataclass
class Token:
    kind: str
    value: str
    line: int
    column: int

    def is_kw(self, *names: str) -> bool:
        return self.kind == KEYWORD and self.value in names

    def __repr__(self):
        return f"Token({self.kind},{self.value!r},{self.line}:{self.column})"


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    i, line, col = 0, 1, 1
    n = len(text)
    while i < n:
        ch = text[i]
        if ch == "\n":
            i += 1
            line += 1
            col = 1
            continue
        if ch.isspace():
            i += 1
            col += 1
            continue
        # SQL comments: -- to end of line, /* ... */ (may span lines)
        if ch == "-" and i + 1 < n and text[i + 1] == "-":
            while i < n and text[i] != "\n":
                i += 1
            continue  # the \n branch handles line/col
        if ch == "/" and i + 1 < n and text[i + 1] == "*":
            is_hint = i + 2 < n and text[i + 2] == "+"
            start_line, start_col = line, col
            i += 3 if is_hint else 2
            col += 3 if is_hint else 2
            body_start = i
            while True:
                if i + 1 >= n:
                    raise TokenizeError("Unterminated block comment", start_line, start_col)
                if text[i] == "*" and text[i + 1] == "/":
                    if is_hint:
                        tokens.append(
                            Token(HINT, text[body_start:i].strip(), start_line, start_col)
                        )
                    i += 2
                    col += 2
                    break
                if text[i] == "\n":
                    line += 1
                    col = 1
                else:
                    col += 1
                i += 1
            continue
        start_line, start_col = line, col
        if ch.isdigit() or (ch == "." and i + 1 < n and text[i + 1].isdigit()):
            j = i
            seen_dot = False
            while j < n and (text[j].isdigit() or (text[j] == "." and not seen_dot)):
                if text[j] == ".":
                    # ".." would end the number at the first dot
                    if j + 1 >= n or not text[j + 1].isdigit():
                        break
                    seen_dot = True
                j += 1
            tokens.append(Token(NUMBER, text[i:j], start_line, start_col))
            col += j - i
            i = j
            continue
        if ch.isalpha() or ch == "_":
            j = i
            while j < n and (text[j].isalnum() or text[j] in "_."):
                j += 1
            word = text[i:j]
            upper = word.upper()
            if upper in KEYWORDS and "." not in word:
                tokens.append(Token(KEYWORD, upper, start_line, start_col))
            else:
                tokens.append(Token(IDENT, word, start_line, start_col))
            col += j - i
            i = j
            continue
        if ch == "'":
            j = i + 1
            buf = []
            while True:
                if j >= n:
                    raise TokenizeError("Unterminated string literal", start_line, start_col)
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(text[j])
                j += 1
            tokens.append(Token(STRING, "".join(buf), start_line, start_col))
            col += j + 1 - i
            i = j + 1
            continue
        if text[i : i + 3] == "->>":  # JSON text-extract operator
            tokens.append(Token(OP, "->>", start_line, start_col))
            i += 3
            col += 3
            continue
        two = text[i : i + 2]
        if two in _TWO_CHAR_OPS:
            tokens.append(Token(OP, two, start_line, start_col))
            i += 2
            col += 2
            continue
        if ch in _ONE_CHAR_OPS:
            tokens.append(Token(OP, ch, start_line, start_col))
            i += 1
            col += 1
            continue
        raise TokenizeError(f"Unknown character '{ch}'", line, col)
    tokens.append(Token(EOF, "", line, col))
    return tokens
