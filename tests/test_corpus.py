"""Corpus-hygiene operators (dedup/corpus.py): boilerplate-line removal,
decontamination, repetition counts — unit semantics on hand corpora; the
sf0.01 DuckDB twins are pinned by the driver-mirror suite
(test_queries_oracle.py) like every other SQL-oracle qkey."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedup.corpus import (
    canonical_url_expr,
    chunk_lines_expr,
    decontaminate,
    remove_common_lines,
    repetition_counts,
    token_vocab,
    word_ngrams_expr,
)


def test_word_ngrams_expr_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a  b "),  # double/edge spaces -> empty tokens removed
            (3, "only"),  # shorter than n -> empty list, not partial gram
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", word_ngrams_expr("text", 2).alias("g")
        ).collect()
    }
    assert got[1] == ["a b", "b c", "c d"]
    assert got[2] == ["a b"]
    assert got[3] == []
    assert got[4] == []


def test_repetition_counts(spark):
    df = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "a b c d")], "doc_id long, text string"
    )
    rc = repetition_counts("text", n=2)
    got = {
        r.doc_id: (r.n, r.d)
        for r in df.select(
            "doc_id", rc["n_ngrams"].alias("n"), rc["n_distinct_ngrams"].alias("d")
        ).collect()
    }
    assert got[1] == (5, 2)  # grams: xy yx xy yx xy
    assert got[2] == (3, 3)


def test_chunk_lines_and_remove_common_lines(spark):
    # docs 1 and 2 share their first 10-token chunk exactly (boilerplate);
    # tails are unique. doc 3 is entirely unique. doc 4 is ALL boilerplate.
    boiler = " ".join(f"b{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, boiler + " tail one body text here"),
            (2, boiler + " other tail entirely"),
            (3, "fully unique document body of words"),
            (4, boiler),
        ],
        "doc_id long, text string",
    )
    lines = df.select("doc_id", chunk_lines_expr("text", width=10).alias("lines"))
    out = {
        r.doc_id: r
        for r in remove_common_lines(lines, max_df=1).collect()
    }
    assert set(out) == {1, 2, 3, 4}  # every doc keeps a row
    assert out[1].n_lines == 2 and out[1].n_kept == 1
    assert out[1].clean_text == "tail one body text here"
    assert out[2].clean_text == "other tail entirely"
    assert out[3].n_kept == out[3].n_lines == 1
    assert out[3].clean_text == "fully unique document body of words"
    assert out[4].n_kept == 0 and out[4].clean_text == ""


def test_remove_common_lines_preserves_order(spark):
    # surviving lines must be rejoined in ORIGINAL order even though
    # collect_list order is partition-dependent
    n = 6
    text = " ".join(
        " ".join(f"t{c}{i}" for i in range(10)) for c in range(n)
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string").repartition(4)
    lines = df.select("doc_id", chunk_lines_expr("text", width=10).alias("lines"))
    row = remove_common_lines(lines, max_df=1).collect()[0]
    assert row.clean_text == text


def test_remove_common_lines_broadcast_gate_identical(spark):
    # round-3 verdict item 2: the boilerplate set must be usable through
    # BOTH join strategies — forced broadcast and forced shuffle anti-join
    # produce identical output (the counted auto gate picks between them)
    df = spark.createDataFrame(
        [
            (1, " ".join(f"b{i}" for i in range(10)) + " tail one"),
            (2, " ".join(f"b{i}" for i in range(10)) + " tail two"),
            (3, "unique words only here now ok yes no maybe so"),
        ],
        "doc_id long, text string",
    )
    lines = df.select("doc_id", chunk_lines_expr("text", width=10).alias("lines"))
    on = sorted(
        tuple(r) for r in remove_common_lines(lines, broadcast_boiler=True).collect()
    )
    off = sorted(
        tuple(r) for r in remove_common_lines(lines, broadcast_boiler=False).collect()
    )
    auto = sorted(tuple(r) for r in remove_common_lines(lines).collect())
    assert on == off == auto


def test_remove_common_lines_max_df_frac(spark):
    # threshold = max(max_df, frac * n_docs): with 4 docs and frac=0.5 a
    # line must appear in MORE than 2 docs to be boilerplate
    shared2 = " ".join(f"s{i}" for i in range(10))  # in 2 docs -> kept
    shared3 = " ".join(f"t{i}" for i in range(10))  # in 3 docs -> removed
    df = spark.createDataFrame(
        [
            (1, shared2 + " " + shared3),
            (2, shared2 + " " + shared3),
            (3, shared3 + " own body of text right here words"),
            (4, "fully unique document body of words"),
        ],
        "doc_id long, text string",
    )
    lines = df.select("doc_id", chunk_lines_expr("text", width=10).alias("lines"))
    out = {
        r.doc_id: r
        for r in remove_common_lines(lines, max_df=1, max_df_frac=0.5).collect()
    }
    assert out[1].clean_text == shared2
    assert out[2].clean_text == shared2
    assert out[3].n_kept == 1 and shared3 not in out[3].clean_text


def test_decontaminate_broadcast_flag_identical(spark):
    df = spark.createDataFrame(
        [(i, f"common prefix words one two three four five unique tail {i} x y z")
         for i in range(8)],
        "doc_id long, text string",
    )
    bench = df.filter(F.col("doc_id") < 2)
    on = sorted(
        tuple(r) for r in decontaminate(df, bench, broadcast_bench=True).collect()
    )
    off = sorted(
        tuple(r) for r in decontaminate(df, bench, broadcast_bench=False).collect()
    )
    assert on == off


def test_decontaminate_hash_matches_strings(spark):
    df = spark.createDataFrame(
        [(i, f"common prefix words one two three four five unique tail {i} x y z")
         for i in range(20)],
        "doc_id long, text string",
    )
    bench = df.filter(F.col("doc_id") < 2)
    a = {
        (r.doc_id, r.n_hits, r.contaminated)
        for r in decontaminate(df, bench, n=8, hash_grams=True).collect()
    }
    b = {
        (r.doc_id, r.n_hits, r.contaminated)
        for r in decontaminate(df, bench, n=8, hash_grams=False).collect()
    }
    assert a == b
    got = dict((r[0], r[2]) for r in a)
    # every doc shares the 8-gram 'common prefix ... five' window with bench
    assert all(got.values())
    assert len(a) == 20


def test_canonical_url_expr(spark):
    cases = [
        # (input, expected canonical)
        ("HTTPS://Example.COM:443/a/b/?b=2&a=1#frag", "https://example.com/a/b?a=1&b=2"),
        ("https://example.com/a/b?a=1&b=2", "https://example.com/a/b?a=1&b=2"),
        ("http://example.com:80/x", "http://example.com/x"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),  # non-default port kept
        ("http://example.com/", "http://example.com"),
        ("http://EXAMPLE.com/path///", "http://example.com/path"),
        # userinfo preserved verbatim (credentials are case-sensitive)
        ("http://User:Pw@Example.COM/x", "http://User:Pw@example.com/x"),
        # percent-escape hex canonicalized to uppercase in path AND query;
        # query sort happens AFTER escape normalization
        ("http://example.com/a%2fb?x=%3d1&a=2", "http://example.com/a%2Fb?a=2&x=%3D1"),
        # malformed URL (invalid escape): NULL canonical, never a throw
        ("http://example.com/a%zz", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r.c for r in df.select(canonical_url_expr("u").alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_token_vocab_counts_and_tie_order(spark):
    df = spark.createDataFrame(
        [(1, "b b a a c"), (2, "a b  z")], "doc_id long, text string"
    )
    rows = token_vocab(df, k=3).collect()
    assert [(r.tok, r.n_occurrences, r.n_docs) for r in rows] == [
        ("a", 3, 2),
        ("b", 3, 2),  # tie with 'a' broken by token asc
        ("c", 1, 1),  # tie with 'z' broken by token asc at the LIMIT edge
    ]


def test_redact_pii_semantics(spark):
    from dedup.corpus import redact_pii_expr

    cases = [
        ("mail me at a.b+c@Example.co.uk now", "mail me at <EMAIL> now"),
        ("server 192.168.0.1 down", "server <IP> down"),
        ("call +4915112345678 today", "call <PHONE> today"),
        # email wins over phone digits in its local part; short digit
        # runs and bare words untouched
        ("x 12345@test.org +123 y", "x <EMAIL> +123 y"),
        ("no pii here 1.2 ok", "no pii here 1.2 ok"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "t string")
    got = [r.c for r in df.select(redact_pii_expr("t").alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_chunk_plan_semantics(spark):
    """Concat-then-chunk at capacity 5: doc token runs 3,4,5,1 pack to
    cumulative [0,3) [3,7) [7,12) [12,13) → chunk ranges [0,0] [0,1]
    [1,2] [2,2]; a second shard packs independently from chunk 0."""
    from dedup.corpus import chunk_plan

    rows = [
        (1, "a", "t t t"),
        (2, "a", "t t t t"),
        (3, "a", "t t t t t"),
        (4, "a", "t"),
        (10, "b", "t t t t t t"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, norm_text string")
    got = {
        r.doc_id: (r.n_tokens, r.start_chunk, r.end_chunk)
        for r in chunk_plan(df, capacity=5, shard_col="lang").collect()
    }
    assert got[1] == (3, 0, 0)
    assert got[2] == (4, 0, 1)
    assert got[3] == (5, 1, 2)
    assert got[4] == (1, 2, 2)
    assert got[10] == (6, 0, 1)  # shard b starts over


def test_chunk_plan_matches_python_reference_fuzz(spark):
    """chunk_plan ≡ the sequential concat-then-chunk reference over a
    seeded grid of token-count profiles and capacities, with shards and
    a partition-count shuffle (window order must not depend on physical
    layout). Invariants: start ≤ end; per-shard chunk ranges are
    monotone non-decreasing in id order; token spans tile the stream."""
    import random

    from dedup.corpus import chunk_plan

    rng = random.Random(7)
    rows = []
    for i in range(300):
        shard = f"s{rng.randrange(3)}"
        n_tok = rng.choice([1, 2, 3, 5, 8, 13, 40, 100])
        rows.append((i, shard, " ".join("t" for _ in range(n_tok))))
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, norm_text string"
    ).repartition(7)
    for cap in (5, 64, 512):
        got = {
            r.doc_id: (r.n_tokens, r.start_chunk, r.end_chunk)
            for r in chunk_plan(df, capacity=cap, shard_col="lang").collect()
        }
        cum: dict[str, int] = {}
        for i, shard, text in rows:
            tok = len(text.split(" "))
            before = cum.get(shard, 0)
            after = before + tok
            cum[shard] = after
            want = (tok, before // cap, max(before // cap, (after - 1) // cap))
            assert got[i] == want, (cap, i, got[i], want)


def test_decontaminate_clean_corpus(spark):
    df = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(6)],
        "doc_id long, text string",
    )
    out = decontaminate(df, df.filter(F.col("doc_id") < 2), n=8).collect()
    by = {r.doc_id: r for r in out}
    assert by[0].contaminated and by[1].contaminated  # bench ∩ itself
    assert not any(by[i].contaminated for i in (2, 3, 4, 5))
    assert all(by[i].n_hits == 0 for i in (2, 3, 4, 5))


def test_host_and_apex_domain_exprs(spark):
    from dedup.corpus import apex_domain_expr, host_expr

    df = spark.createDataFrame(
        [
            (1, "https://u:p@WWW.Sub.Example.ORG:8080/p?q=1#f"),
            (2, "http://localhost/x"),
            (3, "ftp+ssh://a.b.co"),
            (4, "not a url"),
            (5, "https://example.org"),
        ],
        "doc_id long, url string",
    )
    got = {
        r.doc_id: (r.h, r.a)
        for r in df.select(
            "doc_id",
            host_expr("url").alias("h"),
            apex_domain_expr("url").alias("a"),
        ).collect()
    }
    assert got[1] == ("www.sub.example.org", "example.org")
    assert got[2] == ("localhost", "localhost")  # single label -> host
    assert got[3] == ("a.b.co", "b.co")
    assert got[4] == ("", "")  # unparsable -> empty, never a throw
    assert got[5] == ("example.org", "example.org")


def test_domain_stats_aggregation(spark):
    from dedup.corpus import domain_stats

    df = spark.createDataFrame(
        [
            (1, "https://a.x.org/1", "en", "aaaa"),
            (2, "https://b.x.org/2", "de", "bb"),
            (3, "https://a.x.org/3", "en", "c"),
            (4, "https://y.net/1", "en", "dd"),
        ],
        "doc_id long, url string, lang string, text string",
    )
    got = {r.domain: r.asDict() for r in domain_stats(df).collect()}
    assert got["x.org"]["n_docs"] == 3
    assert got["x.org"]["n_hosts"] == 2
    assert got["x.org"]["n_langs"] == 2
    assert got["x.org"]["total_chars"] == 7
    assert got["y.net"]["n_docs"] == 1 and got["y.net"]["n_hosts"] == 1


def test_keep_first_paragraphs_semantics(spark):
    from dedup.corpus import keep_first_paragraphs

    df = spark.createDataFrame(
        [
            (1, ["P", "Q", "P"]),  # intra-doc dup: second P dropped
            (2, ["Q", "R"]),  # cross-doc dup: Q already seen in doc 1
            (3, ["P"]),  # everything already seen -> n_kept 0
            (4, []),  # empty doc keeps a row
        ],
        "doc_id long, paras array<string>",
    )
    got = {r.doc_id: r.asDict() for r in keep_first_paragraphs(df).collect()}
    assert got[1] == {"doc_id": 1, "n_paras": 3, "n_kept": 2, "clean_text": "P Q"}
    assert got[2] == {"doc_id": 2, "n_paras": 2, "n_kept": 1, "clean_text": "R"}
    assert got[3] == {"doc_id": 3, "n_paras": 1, "n_kept": 0, "clean_text": ""}
    assert got[4] == {"doc_id": 4, "n_paras": 0, "n_kept": 0, "clean_text": ""}


def test_keep_first_paragraphs_total_kept_is_distinct_count(spark):
    """Across the corpus exactly one copy of every distinct paragraph
    survives — the keep-first invariant, independent of partitioning."""
    from dedup.corpus import keep_first_paragraphs

    rows = [(i, [f"p{(i * 7 + j) % 13}" for j in range(5)]) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, paras array<string>").repartition(8)
    out = keep_first_paragraphs(df)
    total_kept = out.agg(F.sum("n_kept")).collect()[0][0]
    n_distinct = (
        df.select(F.explode("paras").alias("p")).select("p").distinct().count()
    )
    assert total_kept == n_distinct == 13


def test_stratified_sample_deterministic_subset(spark):
    from dedup.corpus import SAMPLE_DENOM, sample_hash_expr, stratified_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "xx") for i in range(400)],
        "doc_id long, lang string",
    )
    out1 = stratified_sample(df, rates={"en": 0.5}, default_rate=0.1)
    out2 = stratified_sample(df.repartition(7), rates={"en": 0.5}, default_rate=0.1)
    r1 = sorted(tuple(r) for r in out1.collect())
    assert r1 == sorted(tuple(r) for r in out2.collect())  # layout-independent
    # every kept row satisfies its stratum threshold; buckets match the hash
    h = {
        r.doc_id: r.b
        for r in df.select(
            "doc_id", sample_hash_expr("doc_id").alias("b")
        ).collect()
    }
    for doc_id, lang, bucket in r1:
        assert bucket == h[doc_id]
        assert bucket < int((0.5 if lang == "en" else 0.1) * SAMPLE_DENOM)


def test_tfidf_topk_semantics(spark):
    from dedup.corpus import tfidf_topk

    df = spark.createDataFrame(
        [
            (1, "rare rare common"),
            (2, "common other"),
            (3, "common unique"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_topk(df, k=1)
    got = {r.doc_id: r.asDict() for r in out.collect()}
    # doc 1: 'rare' tf=2 df=1 -> 2e6 beats 'common' tf=1 df=3
    assert got[1]["tok"] == "rare" and got[1]["score"] == 2_000_000
    # doc 2: 'other' df=1 score 1e6 beats 'common' 333333
    assert got[2]["tok"] == "other"
    assert got[3]["tok"] == "unique"


def test_cap_per_domain_semantics_and_gate(spark):
    from dedup.corpus import cap_per_domain

    # d1.org: 6 docs (over cap 3) / d2.org: 2 docs (under -> pass through)
    rows = [(i, "https://a.d1.org/x") for i in range(6)] + [
        (10, "https://b.d2.org/x"),
        (11, "https://c.d2.org/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = cap_per_domain(df, cap=3)
    got = sorted((r.domain, r.doc_id) for r in out.collect())
    by_dom = {}
    for dom, i in got:
        by_dom.setdefault(dom, []).append(i)
    assert len(by_dom["d1.org"]) == 3
    assert sorted(by_dom["d2.org"]) == [10, 11]  # under-cap untouched
    # both gate paths and any partitioning pick the identical subset
    for alt in (
        cap_per_domain(df, cap=3, broadcast_over=False),
        cap_per_domain(df.repartition(5), cap=3, broadcast_over=True),
    ):
        assert sorted((r.domain, r.doc_id) for r in alt.collect()) == got


def test_filter_funnel_counts(spark):
    from dedup.corpus import filter_funnel

    long_en = "tok " * 60  # 240 chars, 60 tokens, zero repeated bigrams? all same!
    varied_en = " ".join(f"w{i}" for i in range(60)) + " " + "x" * 60
    df = spark.createDataFrame(
        [
            (1, varied_en, "en"),  # survives all gates
            (2, long_en, "en"),  # repetitive: all bigrams identical -> rep fail
            (3, "short", "en"),  # len fail
            (4, varied_en, "ja"),  # lang fail
        ],
        "doc_id long, text string, lang string",
    )
    got = {r.stage: r.n_docs for r in filter_funnel(df).collect()}
    assert got == {"total": 4, "len_ok": 3, "tok_ok": 3, "rep_ok": 2, "lang_ok": 1}
    idx = {r.stage: r.stage_idx for r in filter_funnel(df).collect()}
    assert idx == {"total": 0, "len_ok": 1, "tok_ok": 2, "rep_ok": 3, "lang_ok": 4}


def test_sample_hash_negative_ids_in_range(spark):
    from dedup.corpus import SAMPLE_DENOM, sample_hash_expr

    df = spark.createDataFrame(
        [(-5,), (-1000004,), (0,), (7,)], "doc_id long"
    ).select(sample_hash_expr("doc_id").alias("b"))
    for (b,) in df.collect():
        assert 0 <= b < SAMPLE_DENOM


def test_length_quantiles_semantics(spark):
    from dedup.corpus import length_quantiles

    df = spark.createDataFrame(
        [(i, "en", v) for i, v in enumerate([10, 20, 30, 40, 50])]
        + [(9, "de", 7)],
        "doc_id long, lang string, n_chars long",
    )
    got = {r.lang: r.asDict() for r in length_quantiles(df).collect()}
    assert got["en"]["n_docs"] == 5
    assert got["en"]["p50"] == 30.0
    assert got["en"]["p10"] == 14.0  # pos = 0.1*(5-1) = 0.4 -> 10 + 0.4*10
    assert got["en"]["p90"] == 46.0
    assert got["de"]["p10"] == got["de"]["p50"] == got["de"]["p90"] == 7.0
