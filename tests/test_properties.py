"""Property-based + seeded-fuzz tests for the subtle pure kernels.

Hypothesis drives the pure-Python/numpy functions (shrinking finds
minimal counterexamples); Spark-side expressions are fuzzed with ONE
batched DataFrame per test (per-example Spark jobs would be 100×
slower for no extra coverage).
"""

from __future__ import annotations

import math
import random
import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# -- suffix-doubling + Kasai longest-common-substring kernel ---------------


def _lcs_substr_brute(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="ab", max_size=24),
    st.text(alphabet="ab", max_size=24),
)
def test_longest_common_substring_matches_brute_force(a, b):
    """Tiny alphabet maximizes repeated substrings — the regime where
    the suffix-array rank-doubling and Kasai LCP bookkeeping can break."""
    from dedup.verify import longest_common_substring_len

    assert longest_common_substring_len(a, b) == _lcs_substr_brute(a, b)


@settings(max_examples=50, deadline=None)
@given(
    st.text(alphabet=string.ascii_lowercase + "é中 ", max_size=30),
    st.text(alphabet=string.ascii_lowercase + "é中 ", max_size=30),
)
def test_longest_common_substring_unicode(a, b):
    from dedup.verify import longest_common_substring_len

    assert longest_common_substring_len(a, b) == _lcs_substr_brute(a, b)


# -- LCS (subsequence) DP ---------------------------------------------------


def _lcs_brute(a: str, b: str) -> int:
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b):
            cur.append(max(prev[j + 1], cur[-1], prev[j] + (x == y)))
        prev = cur
    return prev[-1]


@settings(max_examples=150, deadline=None)
@given(
    st.text(alphabet="abc", max_size=20),
    st.text(alphabet="abc", max_size=20),
)
def test_lcs_len_matches_brute_force(a, b):
    from dedup.verify import _lcs_len_exact

    assert _lcs_len_exact(a, b) == _lcs_brute(a, b)


# -- normalization parity (oracle twin is the pinned truth) -----------------


def test_normalize_fuzz_parity(spark):
    """Seeded fuzz batch: Spark normalize_text == the Python oracle twin
    on adversarial whitespace/unicode mixes (one Spark job total)."""
    from dedup.text import normalize_text, normalize_text_py

    rng = random.Random(7)
    pieces = ["a", "B", " ", "\t", "\n", "\r", "\f", "\x0b", "é", "中", "x  y", ""]
    rows = [
        ("".join(rng.choice(pieces) for _ in range(rng.randrange(0, 40))),)
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "t string")
    got = [
        (r.t, r.n)
        for r in df.select("t", normalize_text("t").alias("n")).collect()
    ]
    for t, n in got:
        assert n == normalize_text_py(t), repr(t)


# -- URL canonicalization ---------------------------------------------------


def test_canonical_url_idempotent_fuzz(spark):
    """canon(canon(u)) == canon(u) and case-insensitivity of scheme/host
    over a seeded grid of url shapes (one Spark job)."""
    from dedup.corpus import canonical_url_expr

    rng = random.Random(11)
    urls = []
    for _ in range(200):
        proto = rng.choice(["http", "https", "HTTP", "HtTpS"])
        userinfo = rng.choice(["", "u@", "User:Pw@", "a%2fb@"])
        host = rng.choice(["example.com", "Sub.Example.COM", "a.b.c"])
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = rng.choice(["", "/", "/x", "/x/y/", "/x//", "/a%2fb", "/a%2Fb", "/%zz"])
        q = rng.choice(["", "?b=2&a=1", "?z=9", "?a=1&a=0", "?k=%3d", "?k=%3D&j=%2f"])
        frag = rng.choice(["", "#f", "#a/b?c=1"])
        urls.append((f"{proto}://{userinfo}{host}{port}{path}{q}{frag}",))
    df = spark.createDataFrame(urls, "u string")
    out = df.select(
        canonical_url_expr("u").alias("c1"),
    ).withColumn("c2", canonical_url_expr(F.col("c1")))
    for r in out.collect():
        if r.c1 is None:  # malformed URL (e.g. bad %-escape): NULL canonical
            assert r.c2 is None
            continue
        assert r.c1 == r.c2, r
        assert "#" not in r.c1
        host_part = (
            r.c1.split("://", 1)[1].split("/", 1)[0].split("?", 1)[0].split("@")[-1]
        )
        assert host_part == host_part.lower()
        # only the PROTOCOL-DEFAULT port is dropped (http:80 / https:443);
        # a mismatched port (e.g. https://h:80) is a real address and stays
        proto_part = r.c1.split("://", 1)[0]
        if proto_part == "http":
            assert not host_part.endswith(":80")
        if proto_part == "https":
            assert not host_part.endswith(":443")


# -- connected components vs brute-force union-find -------------------------


def test_connected_components_random_graphs(spark):
    """Seeded random graphs (incl. chains and a dense blob) vs a pure
    Python union-find; also pins label = min vertex id per component.
    Exercises both the single-task numpy path and (via the threshold
    knob) the iterative loop."""
    from dedup.components import connected_components

    rng = random.Random(3)
    for trial, force_loop in [(0, False), (1, False), (2, True)]:
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(70)]
        edges += [(i, i + 1) for i in range(40, 50)]  # a chain
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {}
        verts = {v for e in edges for v in e}
        for v in verts:
            want[v] = find(v)

        df = spark.createDataFrame(edges, "src long, dst long")
        kw = {"small_graph_edges": 0} if force_loop else {}
        got = {
            r.doc_id: r.cluster_id
            for r in connected_components(df, **kw).collect()
        }
        assert got == want, (trial, force_loop)


# -- corpus curation operators vs pure-Python references -------------------


def test_keep_first_paragraphs_fuzz_vs_python(spark):
    """Random corpora with heavy paragraph reuse: the Spark op must
    equal the obvious sequential keep-first reference exactly."""
    rng = random.Random(77)
    rows = [
        (i, [f"p{rng.randrange(9)}" for _ in range(rng.randrange(6))])
        for i in range(60)
    ]
    from dedup.corpus import keep_first_paragraphs

    df = spark.createDataFrame(rows, "doc_id long, paras array<string>")
    got = {
        r.doc_id: (r.n_paras, r.n_kept, r.clean_text)
        for r in keep_first_paragraphs(df.repartition(7)).collect()
    }
    seen: set[str] = set()
    for i, paras in rows:  # rows are in (doc_id, pos) order already
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        assert got[i] == (len(paras), len(kept), " ".join(kept)), i


def test_cap_per_domain_fuzz_vs_python(spark):
    """cap_per_domain must keep, per domain, exactly the cap lowest
    (hash, id) rows — checked against a Python argsort reference."""
    from dedup.corpus import SAMPLE_DENOM, cap_per_domain

    rng = random.Random(13)
    doms = ["a.org", "b.net", "c.io", "d.co"]
    rows = [(i, f"https://www.{rng.choice(doms)}/p") for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = sorted((r.domain, r.doc_id) for r in cap_per_domain(df, cap=15).collect())

    def h(i):
        return ((i % 1000003) * 2654435761 + 40503) % SAMPLE_DENOM

    exp = []
    for dom in doms:
        ids = [i for i, u in rows if dom in u]
        exp += [(dom, i) for i in sorted(ids, key=lambda i: (h(i), i))[:15]]
    assert got == sorted(exp)


def test_tfidf_topk_fuzz_vs_python(spark):
    """tfidf_topk vs a Counter-based reference, including the total
    (score desc, tok asc) tie order at the k boundary."""
    from collections import Counter

    from dedup.corpus import tfidf_topk

    rng = random.Random(5)
    vocab = [f"w{j}" for j in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 30))))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.tok, r.tf, r.df, r.score) for r in tfidf_topk(df, k=3).collect()
    )
    tfs = {i: Counter(t.split()) for i, t in rows}
    dfreq = Counter(tok for c in tfs.values() for tok in c)
    exp = []
    for i, c in tfs.items():
        scored = sorted(
            (
                # floor of the DOUBLE quotient, matching both engines'
                # long/long -> double division (== // while magnitudes
                # stay inside 2^53; the fuzz vocab is far inside)
                (tok, tf, dfreq[tok], math.floor(tf * 1000000 / dfreq[tok]))
                for tok, tf in c.items()
            ),
            key=lambda x: (-x[3], x[0]),
        )[:3]
        exp += [(i, tok, tf, d, s) for tok, tf, d, s in scored]
    assert got == sorted(exp)


def test_sessionize_fuzz_vs_python(spark):
    """sessionize vs a plain-python reference on a corpus with equal
    timestamps (total order must fall back to event_id), singleton
    sessions, and gap boundaries hit exactly (> semantics, not >=)."""
    from dedup.events import sessionize

    rng = random.Random(11)
    gap_s = 100
    rows = []
    eid = 0
    for u in range(12):
        t = 1_700_000_000_000_000  # epoch micros
        for _ in range(rng.randrange(1, 40)):
            step = rng.choice(
                [0, 1, 50_000_000, 100_000_000, 100_000_001, 400_000_000]
            )
            t += step
            rows.append((u, eid, t))
            eid += 1
    import datetime

    df = spark.createDataFrame(
        [
            (
                u,
                e,
                datetime.datetime.fromtimestamp(
                    t / 1e6, tz=datetime.timezone.utc
                ).replace(tzinfo=None),
            )
            for u, e, t in rows
        ],
        "user_id long, event_id long, ts timestamp_ntz",
    )
    got = sorted(
        (r.user_id, r.session_idx, r.n_events, r.start_us, r.end_us)
        for r in sessionize(df, gap_s=gap_s).collect()
    )

    from collections import defaultdict

    by_user = defaultdict(list)
    for u, e, t in rows:
        by_user[u].append((t, e))
    exp = []
    for u, evs in by_user.items():
        evs.sort()
        sess, start, last, n = 0, None, None, 0
        for t, e in evs:
            if last is None or t - last > gap_s * 1_000_000:
                if n:
                    exp.append((u, sess, n, start, last))
                sess, start, n = sess + 1, t, 0
            n += 1
            last = t
        exp.append((u, sess, n, start, last))
    assert got == sorted(exp)


def test_event_funnel_fuzz_vs_python(spark):
    """event_funnel vs a brute-force python reference: random small
    per-user event streams with duplicate timestamps and missing
    stages; strict (>) chain semantics, greedy-earliest chain."""
    from dedup.events import event_funnel

    rng = random.Random(23)
    types = ["view", "click", "purchase", "error"]
    rows = []
    for u in range(40):
        t = 1_700_000_000_000_000
        for _ in range(rng.randrange(0, 12)):
            t += rng.choice([0, 1, 1_000_000])
            rows.append((u, rng.choice(types), t))
    import datetime

    df = spark.createDataFrame(
        [
            (
                u,
                k,
                datetime.datetime.fromtimestamp(
                    t / 1e6, tz=datetime.timezone.utc
                ).replace(tzinfo=None),
            )
            for u, k, t in rows
        ],
        "user_id long, event_type string, ts timestamp_ntz",
    )
    got = sorted(
        (r.user_id, r.t1_us, r.t2_us, r.t3_us, r.stage_reached)
        for r in event_funnel(df).collect()
    )

    from collections import defaultdict

    by_user = defaultdict(list)
    for u, k, t in rows:
        by_user[u].append((t, k))
    exp = []
    for u, evs in by_user.items():
        def first_after(kind, after):
            c = [t for t, k in evs if k == kind and (after is None or t > after)]
            return min(c) if c else None

        t1 = first_after("view", None)
        if t1 is None:
            continue
        t2 = first_after("click", t1)
        t3 = first_after("purchase", t2) if t2 is not None else None
        exp.append(
            (u, t1, t2, t3, 1 + (t2 is not None) + (t3 is not None))
        )
    assert got == sorted(exp)
    assert any(r[4] == 3 for r in got) and any(r[4] < 3 for r in got)
