"""Streaming suite (SURVEY.md §5.2.7): watermark dedup, windowed rates,
and the foreachBatch incremental pipeline ≡ one-shot batch run."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dedup.config import DEFAULT_CONFIG
from dedup.schema import PAGES
from dedup.streaming import (
    incremental_dedup_query,
    ingest_rate,
    process_batch,
    read_page_stream,
    watermark_dedup,
)
from dedup.tableio import TableIO


def _write_batch(spark, pdf, staging, name):
    """Land one parquet file inside the flat staging dir (the file
    stream source does not recurse into subdirectories)."""
    import glob
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    spark.createDataFrame(pdf, schema=PAGES).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(tmp, "out"))
    os.makedirs(staging, exist_ok=True)
    part = glob.glob(os.path.join(tmp, "out", "part-*.parquet"))[0]
    shutil.move(part, os.path.join(staging, f"{name}.parquet"))
    shutil.rmtree(tmp)


@pytest.fixture(scope="module")
def pages_pdf():
    from dedup.datagen import gen_pages_pdf

    pages, _ = gen_pages_pdf(300, seed=42)
    return pages


def test_watermark_dedup_drops_in_window_duplicates(spark, tmp_path, pages_pdf):
    staging = str(tmp_path / "staging")
    dup = pages_pdf.head(50)
    both = __import__("pandas").concat([dup, dup])  # every url twice, same ts
    _write_batch(spark, both, staging, "b0")

    out = (
        watermark_dedup(read_page_stream(spark, staging))
        .select("url")
        .writeStream.format("memory")
        .queryName("wmdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(120)
    rows = spark.sql("SELECT count(*) c, count(DISTINCT url) d FROM wmdedup").collect()[0]
    assert rows.c == rows.d == 50


def test_ingest_rate_windows(spark, tmp_path, pages_pdf):
    staging = str(tmp_path / "staging_rate")
    _write_batch(spark, pages_pdf, staging, "b0")
    q = (
        ingest_rate(read_page_stream(spark, staging), window="1 hour")
        .writeStream.format("memory")
        .queryName("rate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    total = spark.sql("SELECT sum(n_pages) s FROM rate").collect()[0].s
    # append mode only emits windows closed by the watermark; the last
    # open window is withheld, so total ≤ input and > 0
    assert total and 0 < total <= len(pages_pdf)


def test_session_rate_windows(spark, tmp_path, pages_pdf):
    """J3 session-window variant: captures 137 s apart with a 1-minute
    gap each form their own session; with the 1-hour watermark and an
    ~11-hour event span, most sessions close and are emitted in append
    mode. Totals stay bounded by the input."""
    from dedup.streaming import session_rate

    staging = str(tmp_path / "staging_sess")
    _write_batch(spark, pages_pdf, staging, "b0")
    q = (
        session_rate(read_page_stream(spark, staging), gap="1 minute")
        .writeStream.format("memory")
        .queryName("sessrate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT sum(n_pages) s, count(*) c FROM sessrate"
    ).collect()[0]
    assert rows.s and 0 < rows.s <= len(pages_pdf)
    assert rows.c > 10  # the 1-minute gap really splits sessions


def test_incremental_equals_oneshot(spark, tmp_path, pages_pdf):
    """3 microbatches through process_batch ≡ one batch run (same final
    cluster assignment), including cross-batch near-dup pairs.

    The cuts deliberately SPLIT gen_pages' 100-doc duplicate tiles
    (cuts at 130/230, not 100/200): tile-aligned batches would put
    every dup pair inside one batch and never exercise the cross-batch
    candidate probe or the committed-cluster contraction — the paths
    this test exists to pin."""
    cfg = DEFAULT_CONFIG
    n = len(pages_pdf)
    assert n == 300
    cuts = [0, 130, 230, n]

    tio = TableIO(spark, str(tmp_path / "wh_inc"), backend="parquet")
    for i in range(3):
        b = spark.createDataFrame(pages_pdf.iloc[cuts[i] : cuts[i + 1]], schema=PAGES)
        process_batch(spark, tio, cfg, b)

    inc = {
        (r.url, r.cluster_id)
        for r in tio.read("clusters").select("url", "cluster_id").collect()
    }

    from dedup.pipeline import run_dedup

    res = run_dedup(spark.createDataFrame(pages_pdf, schema=PAGES), cfg)
    one = {
        (r.url, r.cluster_id)
        for r in res.clusters.select("url", "cluster_id").collect()
    }
    assert inc == one


def test_incremental_merges_two_committed_clusters(spark, tmp_path):
    """The contracted-CC merge path, isolated: batch 1 commits cluster
    {A1,A2}, batch 2 commits disjoint cluster {B1,B2}, batch 3 adds one
    doc C near-similar to BOTH — the three committed clusters must
    collapse to ONE with the global min doc_id as label, and untouched
    singletons keep their labels."""
    import datetime

    import pandas as pd

    from dedup.schema import PAGES

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 6
    other = ("one two three four five six seven eight nine ten "
             "eleven twelve thirteen fourteen fifteen sixteen ") * 6

    def page(url, text, i):
        return {
            "url": url,
            "warc_ts": datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=i),
            "html": None,
            "text": text,
            "lang": "en",
        }

    # Construction: committed clusters can only merge later if a NEW
    # doc is near BOTH yet the two olds are not near each other —
    # b1 edits every 6th token of a1's text (J(a1,b1) below thresh),
    # c applies exactly HALF of b1's edits (same positions, same
    # replacements), sitting between them (J(c,a1) and J(c,b1) both
    # above thresh).
    toks = base.split()
    n_t = len(toks)
    b1_toks = list(toks)
    for i in range(0, n_t, 6):
        b1_toks[i] = f"edit{i}"
    c_toks = list(toks)
    for i in range(0, n_t, 18):
        c_toks[i] = f"edit{i}"
    rows1 = [page("u://a1", " ".join(toks), 1)]
    rows2 = [page("u://b1", " ".join(b1_toks), 2), page("u://x", other, 3)]
    rows3 = [page("u://c", " ".join(c_toks), 4)]

    # measured char-5-gram Jaccards for this construction: J(a1,b1) =
    # 0.466, J(c,a1) = 0.648, J(c,b1) = 0.719 — thresh 0.55 separates
    # with ≥0.08 margin on both sides; HIGH_RECALL banding catches the
    # 0.6-0.7 bridge pairs
    cfg = DEFAULT_CONFIG.with_(bands=32, rows_per_band=4, jaccard_thresh=0.55)
    tio = TableIO(spark, str(tmp_path / "wh_merge"), backend="parquet")
    for rows in (rows1, rows2, rows3):
        process_batch(
            spark, tio, cfg, spark.createDataFrame(pd.DataFrame(rows), schema=PAGES)
        )
    cl = {r.url: r.cluster_id for r in tio.read("clusters").collect()}
    assert len(cl) == 4
    # after batch 2, a1 and b1 were separate committed clusters (their
    # Jaccard is below thresh); c bridges them in batch 3
    assert cl["u://a1"] == cl["u://b1"] == cl["u://c"]
    assert cl["u://x"] not in (cl["u://a1"],)
    # label is the min doc_id across the MERGED component
    import builtins

    merged_ids = [
        r.doc_id for r in tio.read("docs").collect() if r.url != "u://x"
    ]
    assert cl["u://a1"] == builtins.min(merged_ids)


@pytest.mark.parametrize("fail_on", ["clusters", "docs"])
def test_process_batch_retry_after_partial_commit(
    spark, tmp_path, pages_pdf, fail_on
):
    """The commit-order crash-consistency protocol, fault-injected:
    batch 2's write to `fail_on` raises AFTER every earlier table in
    the commit sequence has landed (fail_on='clusters' = derived logs
    committed; fail_on='docs' = clusters ALREADY overwritten — the
    subtlest window, where the retry sees its own batch in prev). The
    straight retry plus a further batch must converge to exactly the
    one-shot clustering despite the duplicate log appends the retry
    produces."""
    from pyspark.sql import functions as F  # noqa: F811

    class FailingTIO(TableIO):
        def __init__(self, *a, fail_table, **k):
            super().__init__(*a, **k)
            self.fail_table = fail_table
            self.armed = True

        def write(self, df, table, mode="append", sort_within=None):
            if self.armed and table == self.fail_table:
                self.armed = False
                raise RuntimeError(f"injected crash at {table} commit")
            return super().write(df, table, mode=mode, sort_within=sort_within)

    cfg = DEFAULT_CONFIG
    wh = str(tmp_path / f"wh_retry_{fail_on}")
    tio = TableIO(spark, wh, backend="parquet")

    def batch(lo, hi):
        return spark.createDataFrame(pages_pdf.iloc[lo:hi], schema=PAGES)

    process_batch(spark, tio, cfg, batch(0, 130), batch_id=0)
    ft = FailingTIO(spark, wh, backend="parquet", fail_table=fail_on)
    with pytest.raises(RuntimeError, match="injected crash"):
        process_batch(spark, ft, cfg, batch(130, 230), batch_id=1)
    s_retry = process_batch(spark, tio, cfg, batch(130, 230), batch_id=1)
    assert s_retry["new_docs"] == 100  # docs never landed → full re-run
    process_batch(spark, tio, cfg, batch(230, 300), batch_id=2)

    # per-microbatch lineage/metrics landed inside the commit protocol:
    # every committed batch has docs+edges lineage rows; the retried
    # batch appended its logs TWICE (both attempts reached the lineage
    # writes, which precede the fail_on table) — duplicate audit rows
    # are the documented at-least-once contract, never missing ones
    lin = tio.read("lineage").select("stage").collect()
    stages = [r.stage for r in lin]
    for b in (0, 1, 2):
        assert f"batch-{b}/docs" in stages and f"batch-{b}/edges" in stages
    met = tio.read("metrics")
    m1 = met.filter("stage = 'batch-1' AND key = 'new_docs'").collect()
    assert len(m1) == 2  # crashed attempt + retry, both logged
    assert all(r.value == 100.0 for r in m1)

    inc = {
        (r.url, r.cluster_id)
        for r in tio.read("clusters").select("url", "cluster_id").collect()
    }
    assert len(inc) == 300  # no duplicate/missing cluster rows

    from dedup.pipeline import run_dedup

    res = run_dedup(spark.createDataFrame(pages_pdf, schema=PAGES), cfg)
    one = {
        (r.url, r.cluster_id)
        for r in res.clusters.select("url", "cluster_id").collect()
    }
    assert inc == one


def test_process_batch_rejects_cfg_layout_drift(spark, tmp_path, pages_pdf):
    """Round-3 advice: restarting a stream with a changed signature
    LAYOUT must fail fast (committed bands/chunks/signatures bake the
    layout in; probing them with mismatched keys silently drops
    candidate pairs). Threshold-only knobs are NOT layout and may change
    freely across restarts."""
    cfg = DEFAULT_CONFIG
    tio = TableIO(spark, str(tmp_path / "wh_drift"), backend="parquet")
    b = spark.createDataFrame(pages_pdf.iloc[:60], schema=PAGES)
    process_batch(spark, tio, cfg, b)

    changed_layout = cfg.with_(bands=32, rows_per_band=4)
    with pytest.raises(ValueError, match="layout mismatch"):
        process_batch(
            spark, tio, changed_layout,
            spark.createDataFrame(pages_pdf.iloc[60:80], schema=PAGES),
        )

    # thresholds are free to move: same layout, different jaccard_thresh
    s = process_batch(
        spark, tio, cfg.with_(jaccard_thresh=0.9),
        spark.createDataFrame(pages_pdf.iloc[60:80], schema=PAGES),
    )
    assert s["new_docs"] == 20


def test_process_batch_frees_its_spill(spark, tmp_path, pages_pdf):
    """Round-3 advice (medium): a long-running stream must not
    accumulate per-batch signature spills on the (RAM-backed) scratch —
    each batch's spill dir is removed before process_batch returns."""
    from dedup.pipeline import _SPILL_DIRS

    cfg = DEFAULT_CONFIG
    tio = TableIO(spark, str(tmp_path / "wh_spill"), backend="parquet")
    before = set(_SPILL_DIRS)
    process_batch(
        spark, tio, cfg, spark.createDataFrame(pages_pdf.iloc[:60], schema=PAGES)
    )
    leaked = [d for d in set(_SPILL_DIRS) - before if "stream-sigs" in d]
    assert leaked == []


def test_compact_mid_stream_preserves_incremental_result(spark, tmp_path, pages_pdf):
    """TableIO.compact run between microbatches (the maintenance-job
    deployment shape: the append-heavy docs/edges logs get rewritten
    while the stream is between triggers) must not change what later
    batches compute — the url anti-join, probes, and cluster contraction
    read content, not file layout."""
    cfg = DEFAULT_CONFIG
    tio = TableIO(spark, str(tmp_path / "wh_cmp"), backend="parquet")
    cuts = [0, 130, 230, 300]
    for i in range(3):
        b = spark.createDataFrame(pages_pdf.iloc[cuts[i]: cuts[i + 1]], schema=PAGES)
        process_batch(spark, tio, cfg, b)
        if i == 0:
            tio.compact("docs", target_files=2, sort_within=["doc_id"])
            tio.compact("edges", target_files=1)
        elif i == 1:
            tio.compact("bands", target_files=2)

    inc = {
        (r.url, r.cluster_id)
        for r in tio.read("clusters").select("url", "cluster_id").collect()
    }
    from dedup.pipeline import run_dedup

    res = run_dedup(spark.createDataFrame(pages_pdf, schema=PAGES), cfg)
    one = {
        (r.url, r.cluster_id)
        for r in res.clusters.select("url", "cluster_id").collect()
    }
    assert inc == one


def test_incremental_batch_proportional_work(spark, tmp_path, pages_pdf):
    """Round-2 verdict item 4: per-batch band/chunk explode and CC input
    must scale with the BATCH, not the corpus. A large first batch (250
    docs) then a small second batch (50 docs): the small batch's band
    explode covers only its own (representative) docs, and its CC runs
    on the contracted graph (≤ its own new edges), even though the
    committed corpus/edge log is 5× larger. Correctness of the
    incremental labels vs a one-shot run is pinned separately by
    test_incremental_equals_oneshot."""
    cfg = DEFAULT_CONFIG
    tio = TableIO(spark, str(tmp_path / "wh_prop"), backend="parquet")
    big = pages_pdf.iloc[:250]
    small = pages_pdf.iloc[250:300]
    s_big = process_batch(spark, tio, cfg, spark.createDataFrame(big, schema=PAGES))
    s_small = process_batch(
        spark, tio, cfg, spark.createDataFrame(small, schema=PAGES)
    )
    assert s_small["new_docs"] == 50
    # band explode input ∝ batch: ≤ 50 reps × bands rows (was: the whole
    # committed signature table re-banded every batch)
    assert s_small["banded_rows"] <= 50 * cfg.bands
    assert s_big["banded_rows"] <= 250 * cfg.bands
    # CC input = this batch's kept edges only (was: the full edge log);
    # the committed log after batch 1 is strictly larger than that
    total_edges = tio.read("edges").count()
    assert s_small["cc_edges"] <= s_small["new_edges"]
    assert total_edges > s_small["cc_edges"]


def test_incremental_query_plumbing(spark, tmp_path, pages_pdf):
    """The actual readStream→foreachBatch→checkpoint wiring runs and
    commits; a second availableNow pass adds nothing (idempotent)."""
    staging = str(tmp_path / "staging_q")
    _write_batch(spark, pages_pdf.head(100), staging, "b0")
    wh = str(tmp_path / "wh_q")
    ckpt = str(tmp_path / "ckpt_q")

    q = incremental_dedup_query(spark, staging, wh, ckpt, DEFAULT_CONFIG)
    q.awaitTermination(300)
    tio = TableIO(spark, wh, backend="parquet")
    n1 = tio.read("docs").count()
    assert n1 == 100

    # restart with no new files: checkpoint says nothing to do
    q2 = incremental_dedup_query(spark, staging, wh, ckpt, DEFAULT_CONFIG)
    q2.awaitTermination(300)
    assert tio.read("docs").count() == n1


def test_stateful_sketch_equals_batch_union_min(spark, tmp_path):
    """J5: the cross-trigger RocksDB state must make the final emitted
    sketch per lang equal the batch elementwise uint64-min of all member
    signatures, with exact doc counts — proven over TWO microbatches so
    the state genuinely carries between triggers."""
    import glob
    import shutil

    import numpy as np

    from dedup.session import enable_rocksdb_state
    from dedup.signatures import with_shingles, with_signatures
    from dedup.streaming import stateful_minhash_sketch

    enable_rocksdb_state(spark)
    cfg = DEFAULT_CONFIG
    docs = spark.createDataFrame(
        [
            (i, f"lang{i % 2}", f"some web page body text number {i} " * 10)
            for i in range(40)
        ],
        "doc_id long, lang string, norm_text string",
    )
    sigs = (
        with_signatures(with_shingles(docs.select("doc_id", "norm_text"), cfg), cfg)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("lang", "minhash")
    )
    expect = {}
    for r in sigs.collect():
        sk = np.asarray(r.minhash, dtype=np.int64).view(np.uint64)
        cur, n = expect.get(r.lang, (None, 0))
        expect[r.lang] = (sk if cur is None else np.minimum(cur, sk), n + 1)

    staging = str(tmp_path / "sketch-staging")
    os.makedirs(staging, exist_ok=True)
    tmp = str(tmp_path / "sketch-tmp")
    sigs.repartition(2).write.mode("overwrite").parquet(tmp)
    parts = sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))
    assert len(parts) == 2
    for i, part in enumerate(parts):
        shutil.move(part, os.path.join(staging, f"b{i}.parquet"))

    stream = (
        spark.readStream.schema("lang string, minhash array<bigint>")
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    q = (
        stateful_minhash_sketch(stream, cfg)
        .writeStream.format("memory")
        .queryName("sketch_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("sketch_test").collect()
    assert len(out) >= 2  # at least one emission per lang
    final = {}
    for r in out:
        if r.lang not in final or r.n_docs > final[r.lang].n_docs:
            final[r.lang] = r
    assert set(final) == set(expect)
    for lang, r in final.items():
        want_sketch, want_n = expect[lang]
        assert r.n_docs == want_n
        got = np.asarray(r.sketch, dtype=np.int64).view(np.uint64)
        assert (got == want_sketch).all()
        assert r.est_distinct_shingles > 0
