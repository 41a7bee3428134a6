"""Text-analysis operators for training-data pipelines (SURVEY.md §2 B6
scope, prompt-mandated text ops): token counting, quality scoring,
language-ID heuristic, document fingerprinting.

All hot-path ops are pure Column expressions (whole-stage codegen, no
Python) so they survive a 100 TB scan: a quality filter over a trillion
docs is exactly the kind of stage that must never cross the Arrow
boundary. Fingerprinting reuses the shingle machinery (xxhash64
JVM-side) with a winnowing min-window — again pure SQL higher-order
functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: pinned stopword lists for the language-ID heuristic. Tiny on purpose:
#: they are broadcast as literals inside the expression (no join, no UDF).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "fr": ["le", "la", "de", "et", "un", "est", "les", "des"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den"],
}

#: word-ish token pattern shared by token_count / quality exprs (a
#: BPE-ish lower-alnum chunking; identical Java/duckdb regex semantics).
TOKEN_RE = "[a-z0-9]+"


def tokens_expr(col: str | Column) -> Column:
    """Whitespace tokens of an (already lowercased/normalized) text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count_expr(col: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens_expr(col))


def regex_token_count_expr(col: str | Column) -> Column:
    """Count of TOKEN_RE matches — the BPE-ish sub-word token proxy."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), F.lit(0)))


def stopword_hits_expr(col: str | Column, lang: str) -> Column:
    """Number of *distinct* stopwords of ``lang`` present in the text."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(tokens_expr(col)), sw))


def lang_id_expr(col: str | Column) -> Column:
    """Heuristic language guess: argmax of per-language distinct-stopword
    hits, ties broken by fixed language order (en, fr, es, de), 'und'
    (undetermined) when no stopword hits at all. Pure SQL; the DuckDB
    oracle replays the identical CASE chain."""
    hits = {lg: stopword_hits_expr(col, lg) for lg in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # build the CASE from lowest to highest priority so earlier langs win ties
    for lg in reversed(list(STOPWORDS)):
        expr = F.when(hits[lg] == best, F.lit(lg)).otherwise(expr)
    return F.when(best <= 0, F.lit("und")).otherwise(expr)


def quality_exprs(col: str | Column) -> dict[str, Column]:
    """Quality-scoring feature set over normalized text. All doubles are
    rounded to 4 places so engine-to-engine float hashing is stable."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count_expr(c)
    n_chars = F.length(c)
    alnum_chars = F.length(F.regexp_replace(c, "[^a-z0-9]", ""))
    return {
        "n_tokens": n_tok.cast("long"),
        "mean_tok_len": F.round((n_chars - n_tok + 1) / n_tok, 4),
        "alnum_ratio": F.round(alnum_chars / F.greatest(n_chars, F.lit(1)), 4),
        "stop_ratio": F.round(
            stopword_hits_expr(c, "en") / F.greatest(n_tok, F.lit(1)), 4
        ),
        "uniq_tok_ratio": F.round(
            F.size(F.array_distinct(tokens_expr(c))) / F.greatest(n_tok, F.lit(1)), 4
        ),
    }


def quality_score_expr(col: str | Column) -> Column:
    """Composite quality score in [0,4]: sum of four bounded features.
    A doc is 'high quality' when long enough, lexically diverse, and
    stopword-bearing — the standard web-corpus filter shape.

    Deliberately an UNSCALED sum: each term is a 4-decimal rounded value,
    so the sum has no 5th decimal digit and the final round(·,4) can
    never land on a decimal tie — dividing by 4 would create exact
    .xxxx5 ties where Spark (HALF_UP on the decimal string) and other
    engines (round on the binary double) disagree by one ulp-digit."""
    q = quality_exprs(col)
    c = F.col(col) if isinstance(col, str) else col
    len_ok = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    return F.round(
        len_ok + q["alnum_ratio"] + F.least(q["stop_ratio"] * 10, F.lit(1.0))
        + q["uniq_tok_ratio"],
        4,
    )


def fingerprint_expr(shingle_col: str | Column, window: int = 4) -> Column:
    """Winnowing document fingerprint (Schleimer et al. 2003 shape):
    min shingle hash of every ``window``-wide sliding window, distinct,
    sorted. Robust rolling-hash selection, pure SQL over the already
    JVM-hashed shingle array."""
    c = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col
    n = F.size(c)
    wins = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (window - 1), F.lit(1))),
        lambda i: F.array_min(F.slice(c, i, window)),
    )
    return F.sort_array(F.array_distinct(wins))
