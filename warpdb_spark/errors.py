"""Error types mirroring the reference's diagnostics.

The reference raises ``std::runtime_error`` with position-carrying
messages from the tokenizer (src/expression.cpp:22-120), ``Unexpected
token`` / ``Expected keyword`` from the parser
(src/expression.cpp:275-286,524-527), and ``Unknown column: X`` with
clause context from semantic validation (src/warpdb.cpp:17-44,309-334).
"""

from __future__ import annotations


class WarpDBError(Exception):
    """Base error for the engine."""


class TokenizeError(WarpDBError):
    """Lexing failure; carries 1-based line/column like the reference."""

    def __init__(self, message: str, line: int, column: int):
        super().__init__(f"{message} at line {line} column {column}")
        self.line = line
        self.column = column


class ParseError(WarpDBError):
    """Grammar failure (unexpected/trailing token, missing keyword)."""


class ValidationError(WarpDBError):
    """Semantic failure, e.g. ``Unknown column: X in WHERE clause``."""
