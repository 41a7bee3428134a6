"""Generator determinism: pandas path ≡ distributed path, invariants hold."""

from __future__ import annotations

from dedup.datagen import gen_pages, gen_pages_pdf
from dedup.text import extract_text


def test_gen_deterministic():
    a, ta = gen_pages_pdf(300, seed=42)
    b, tb = gen_pages_pdf(300, seed=42)
    assert a.equals(b) and ta.equals(tb)
    c, _ = gen_pages_pdf(300, seed=7)
    assert not a["text"].equals(c["text"])


def test_gen_invariants(tiny_pages):
    pages, truth = tiny_pages
    assert len(pages) == 1000
    assert pages["url"].is_unique
    # byte-identical invariant holds by construction
    sample = pages.sample(50, random_state=0)
    for _, r in sample.iterrows():
        assert r["text"] == extract_text(r["html"])
    # schedule shares (per FIXTURES.md): 27% injected dups carry a single
    # dup_of pointer (boilerplate rows form a group, no single base)
    assert len(truth) == 270
    assert set(truth["kind"]) == {"exact", "near", "contain", "chain"}
    kinds = truth["kind"].value_counts()
    assert kinds["exact"] == 80 and kinds["near"] == 120
    assert kinds["contain"] == 50 and kinds["chain"] == 20
    # exact dups really are exact
    by_url = dict(zip(pages["url"], pages["text"]))
    for _, r in truth[truth["kind"] == "exact"].iterrows():
        assert by_url[r["url"]] == by_url[r["dup_of_url"]]


def test_gen_spark_matches_pandas(spark, tiny_pages):
    pages, _ = tiny_pages
    sdf = gen_pages(spark, 1000, seed=42, partitions=6)
    got = sdf.select("url", "text", "lang").toPandas().sort_values("url").reset_index(drop=True)
    want = pages[["url", "text", "lang"]].sort_values("url").reset_index(drop=True)
    assert got.equals(want)
