"""Deterministic synthetic web_pages generator (SURVEY.md §2 A5, FIXTURES.md §1).

Everything is a pure function of ``(seed, row_index)`` — no wall clock, no
external data — so the same rows come out whether generated driver-side
(pandas, for unit tests) or distributed (``spark.range(n).mapInPandas``,
for 100k+ bench runs), at any partitioning. Rows are laid out in tiles of
100 with a fixed duplicate-injection schedule (FIXTURES.md shares):

  slots  0-69  singleton (unique text)                       70%
  slots 70-77  exact dup of an earlier singleton in-tile      8%
  slots 78-89  near dup (1-10% token edits)                  12%
  slots 90-94  containment (base + 20-200 extra tokens,       5%
               or truncation to ~60%)
  slots 95-97  boilerplate: per-tile 150-token boilerplate     3%
               + 0-20 unique tokens → high pairwise Jaccard
               AND a hot LSH bucket (exercises salting)
  slots 98-99  chain: 98 edits slot 0, 99 edits 98 →           2%
               A≈B≈C transitive cluster

The ``html`` column is a fixed template; the ``text`` column is defined
as ``extract_text(html)`` so the BASELINE.json:15 byte-identical
invariant holds by construction. The ground-truth side table
``truth(url, dup_of_url, kind)`` is for tests only — the pipeline never
sees it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from dedup.text import extract_text

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)
_LANGS = np.array(["en", "fr", "es", "de", "zh"])
_LANG_P = np.array([0.5, 0.15, 0.15, 0.1, 0.1])
_VOCAB = np.array([f"w{i:03d}" for i in range(500)])
# Zipf-ish weights over the vocabulary, fixed
_VW = 1.0 / np.arange(1, 501)
_VW /= _VW.sum()


def _rng(seed: int, *key: int) -> np.random.Generator:
    return np.random.default_rng([seed, *key])


def _base_tokens(seed: int, i: int) -> list[str]:
    r = _rng(seed, i, 0)
    n = int(r.integers(40, 401))
    return list(_VOCAB[r.choice(500, size=n, p=_VW)])


def _boiler_tokens(seed: int, tile: int) -> list[str]:
    r = _rng(seed, tile, 1)
    return list(_VOCAB[r.choice(500, size=150, p=_VW)])


def _edit_tokens(tokens: list[str], r: np.random.Generator, rate: float) -> list[str]:
    """Replace/delete/insert ~rate of tokens (token-level near-dup)."""
    out = list(tokens)
    n_edits = max(1, int(len(out) * rate))
    for _ in range(n_edits):
        op = int(r.integers(0, 3))
        pos = int(r.integers(0, len(out))) if out else 0
        tok = str(_VOCAB[int(r.integers(0, 500))])
        if op == 0 and out:
            out[pos] = tok
        elif op == 1 and len(out) > 1:
            del out[pos]
        else:
            out.insert(pos, tok)
    return out


def _tokens_and_base(seed: int, i: int) -> tuple[list[str], int | None, str]:
    """Returns (body tokens, dup_of index or None, kind) for row i."""
    tile, slot = divmod(i, 100)
    t0 = tile * 100
    if slot < 70:
        return _base_tokens(seed, i), None, "single"
    r = _rng(seed, i, 2)
    if slot < 78:  # exact
        j = t0 + (slot - 70) * 9 % 70
        return _base_tokens(seed, j), j, "exact"
    if slot < 90:  # near
        j = t0 + (slot - 78) * 5 % 70
        return _edit_tokens(_base_tokens(seed, j), r, float(r.uniform(0.01, 0.10))), j, "near"
    if slot < 95:  # containment
        j = t0 + (slot - 90) * 13 % 70
        base = _base_tokens(seed, j)
        if r.integers(0, 2) == 0:
            extra = list(_VOCAB[r.choice(500, size=int(r.integers(20, 201)), p=_VW)])
            return base + extra, j, "contain"
        return base[: max(10, int(len(base) * 0.6))], j, "contain"
    if slot < 98:  # boilerplate
        uniq = list(_VOCAB[r.choice(500, size=int(r.integers(0, 21)), p=_VW)])
        return _boiler_tokens(seed, tile) + uniq, None, "boiler"
    # chain: 98 edits slot 0; 99 edits 98
    j = t0 if slot == 98 else t0 + 98
    base, _, _ = _tokens_and_base(seed, j) if slot == 99 else (_base_tokens(seed, t0), None, "")
    return _edit_tokens(base, r, 0.08), j, "chain"


def _row(seed: int, i: int) -> dict:
    tokens, dup_of, kind = _tokens_and_base(seed, i)
    title = " ".join(tokens[:4]) if tokens else "untitled"
    body = " ".join(tokens)
    html = (
        f"<html><head><title>{title}</title></head>"
        f"<body><p>{body}</p></body></html>"
    ).encode("utf-8")
    # lang follows the base doc so dup pairs share a language
    lang_src = dup_of if dup_of is not None else i
    lang = str(_rng(seed, lang_src, 3).choice(_LANGS, p=_LANG_P))
    url = f"https://src{i % 200}.example.org/p/" + hashlib.sha1(
        f"{seed}:{i}".encode()
    ).hexdigest()[:12]
    return {
        "url": url,
        "warc_ts": _EPOCH + timedelta(seconds=137 * i),
        "html": html,
        "text": extract_text(html),  # byte-identical invariant by construction
        "lang": lang,
        "_i": i,
        "_dup_of": dup_of,
        "_kind": kind,
    }


def gen_pages_pdf(n: int, seed: int = 42) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Driver-side generation: (pages_df, truth_df). Use for n ≤ ~20k."""
    rows = [_row(seed, i) for i in range(n)]
    pdf = pd.DataFrame(rows)
    url_by_i = dict(zip(pdf["_i"], pdf["url"]))
    truth = pdf[pdf["_dup_of"].notna()][["url", "_dup_of", "_kind"]].copy()
    truth["dup_of_url"] = truth["_dup_of"].map(lambda j: url_by_i.get(int(j)))
    truth = truth.rename(columns={"_kind": "kind"})[["url", "dup_of_url", "kind"]]
    pages = pdf[["url", "warc_ts", "html", "text", "lang"]]
    return pages, truth


def gen_pages(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed generation for bench scale; identical rows to
    gen_pages_pdf at any partitioning (pure function of (seed, id))."""
    from pyspark.sql import functions as F  # noqa: N812

    from dedup.schema import PAGES

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [_row(seed, int(i)) for i in b["id"]]
            out = pd.DataFrame(rows)[["url", "warc_ts", "html", "text", "lang"]]
            yield out

    rng = spark.range(n)
    if partitions:
        rng = rng.repartition(partitions, F.col("id"))
    return rng.mapInPandas(gen, schema=PAGES)
