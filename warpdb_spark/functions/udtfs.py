"""Python UDTFs — table-valued functions callable from the dialect's
FROM clause.

The reference exposes a generic function-call surface for scalar
expressions (src/expression.cpp:210-223); this generalizes that call
syntax to table position (superset): ``SELECT ... FROM
split_ngrams(documents.text, 2)`` laterally applies the registered
Spark UDTF to every row of ``documents``, exposing the source columns
plus the UDTF's output columns.

Scale notes: a Python UDTF is Arrow-batched per partition but still
Python-rate — it belongs on bounded/pre-filtered inputs (the planner
keeps the source table's pushed-down filters ahead of the lateral
join). For n-gram extraction at full-corpus scale prefer the pure-HOF
``functions/text.py::word_ngrams`` path (zero Python); the UDTF
surface exists for logic that genuinely needs imperative Python per
row producing MULTIPLE rows.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

# ASCII \s semantics, matching Java/DuckDB regex '\s+' on this corpus —
# Python's str \s would also match unicode spaces and drift from the
# oracle engine.
_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def _normalize(text: str) -> str:
    """lower + collapse whitespace + trim — the same contract as
    functions/text.py::normalized_text and the DuckDB oracle's
    trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))."""
    return _WS_RE.sub(" ", text.lower()).strip()


@udtf(returnType="pos: int, ngram: string")
class SplitNgrams:
    """``split_ngrams(text, n)`` — one output row per word n-gram of
    the normalized text: (position, space-joined gram). NULL text, a
    NULL/non-positive n, or fewer than n tokens yield no rows (the
    lateral join drops the source row, matching an unnest of an empty
    list)."""

    def eval(self, text, n):
        if text is None or n is None:
            return
        if n != int(n):
            # reject silently-lossy fractional n loudly, matching the
            # dialect's strictness on malformed arguments elsewhere
            raise ValueError(f"split_ngrams: n must be an integer, got {n!r}")
        n = int(n)
        if n < 1:
            return
        norm = _normalize(text)
        if not norm:
            return
        toks = norm.split(" ")
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


@udtf(returnType="sent_idx: int, sentence: string, char_start: int, char_end: int")
class SentenceSplit:
    """``sentence_split(text)`` — one output row per sentence with its
    character span in the ORIGINAL text: (index, sentence, start, end).
    Sentences are the maximal runs between literal ``'. '`` separators
    (a deterministic, engine-replayable rule — a regex boundary model
    would drift from any SQL oracle), so ``char_start`` advances by
    ``len(sentence) + 2`` per row and ``char_end`` is exclusive. NULL
    text yields no rows (lateral drop); an empty string yields a single
    empty sentence, matching DuckDB's ``string_split('', '. ')``.

    Demonstrates the multi-column lateral surface beyond SplitNgrams:
    four typed output columns with per-row running state (the offset),
    still a pure function of the input row — deterministic-marked so
    source predicates push below the Python stage into the scan."""

    def eval(self, text):
        if text is None:
            return
        pos = 0
        for i, sent in enumerate(text.split(". ")):
            yield i, sent, pos, pos + len(sent)
            pos += len(sent) + 2


def default_udtfs() -> dict[str, object]:
    """Name -> decorated UDTF object preloaded into every registry (the
    analog of custom.cu's always-available device functions).

    SplitNgrams is pure, so it is marked deterministic — REQUIRED for
    scale: only then does Catalyst push WHERE predicates on source
    columns below the BatchEvalPythonUDTF into the parquet scan's
    DataFilters (verified in tests/test_udtf.py); a non-deterministic
    UDTF runs Python over every row first. User registrations should
    call ``.asDeterministic()`` when their eval() is pure."""
    return {
        "split_ngrams": SplitNgrams.asDeterministic(),
        "sentence_split": SentenceSplit.asDeterministic(),
    }
