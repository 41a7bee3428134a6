"""Deterministic text extraction + normalization (SURVEY.md §2 B3/B4).

``extract_text`` is the versioned ("xt-1") pure function html-bytes →
text demanded by BASELINE.json:15: byte-identical output per url across
runs, partitionings, and parallelism levels. It is locale- and
environment-independent: utf-8 decode with replacement, fixed regexes,
``html.unescape`` (pure table lookup), NFC via ``unicodedata`` — no
wall-clock, no randomness, no external libraries.

``normalize_text`` is the similarity-side canonicalization (lower,
collapse ASCII whitespace, strip). It exists twice on purpose — as a
Spark Column expression (JVM, whole-stage codegen) and as a Python twin
used by extract_text's tail and the brute-force oracle — pinned to the
same restricted whitespace class (config.WHITESPACE_RE) so Java vs
Python ``\\s`` unicode differences cannot desynchronize them.
"""

from __future__ import annotations

import html as _html
import re
import unicodedata
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from dedup.config import EXTRACTOR_VERSION, WHITESPACE_RE

__all__ = [
    "extract_text",
    "extract_text_udf",
    "normalize_text",
    "normalize_text_py",
    "EXTRACTOR_VERSION",
]

_SCRIPT_RE = re.compile(rb"(?is)<(script|style|noscript)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(rb"(?s)<!--.*?-->")
_TAG_RE = re.compile(rb"(?s)<[^>]*>")
_WS_PY_RE = re.compile("[ \t\n\r\f\x0b]+")


def extract_text(html_bytes: bytes | None) -> str:
    """Pure html → text, version "xt-1". Pinned steps, in order:
    strip comments, strip script/style/noscript blocks, strip tags → ' ',
    utf-8 decode (errors=replace), unescape entities, NFC, collapse ASCII
    whitespace, strip. Changing ANY step requires bumping
    config.EXTRACTOR_VERSION."""
    if html_bytes is None:
        return ""
    b = _COMMENT_RE.sub(b" ", html_bytes)
    b = _SCRIPT_RE.sub(b" ", b)
    b = _TAG_RE.sub(b" ", b)
    s = b.decode("utf-8", errors="replace")
    s = _html.unescape(s)
    s = unicodedata.normalize("NFC", s)
    return _WS_PY_RE.sub(" ", s).strip()


@F.pandas_udf(StringType())
def extract_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Arrow-batched lift of extract_text (iterator form, SURVEY §2 K1).
    Per-element Python inside a pandas UDF is the sanctioned path for
    logic that isn't expressible as numpy/Spark exprs (BASELINE.json:15
    bans per-row `udf()`, i.e. row-at-a-time pickling, not this)."""
    for s in batches:
        yield s.map(extract_text)


def normalize_text(col: Column | str) -> Column:
    """Spark-side normalization: lower → collapse ASCII ws → trim.
    Pure JVM expressions; stays inside whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), WHITESPACE_RE, " "))


def normalize_text_py(s: str | None) -> str:
    """Python twin of normalize_text — used by the oracle. Must stay
    semantically identical to the Spark expression above."""
    if s is None:
        return ""
    return _WS_PY_RE.sub(" ", s.lower()).strip()
