"""End-to-end curation job (jobs/curate_corpus.py): gates → shared
near-dup stage chain → canonical pick → optional sampling → packing
plan, all through the committed/resumable Runner machinery."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedup.config import DEFAULT_CONFIG
from dedup.tableio import TableIO
from jobs.curate_corpus import run_curate


def _run(spark, pages, tmp_path, name, **kw):
    tio = TableIO(spark, str(tmp_path / name), backend="parquet")
    r = run_curate(spark, tio, DEFAULT_CONFIG, "c1", pages, **kw)
    return tio, r


def test_curate_job_end_to_end_and_resume(spark, tiny_pages_df, tmp_path):
    pages = tiny_pages_df.limit(300)
    tio, r = _run(spark, pages, tmp_path, "whA", min_chars=80, min_tokens=10)
    assert r.ran == [
        "docs", "signals", "funnel", "signatures", "edges", "clusters",
        "report", "deduped", "corpus",
    ]
    assert r.skipped == []

    signals = tio.read("signals")
    funnel = {x.stage: x.n_docs for x in tio.read("funnel").collect()}
    # funnel is cumulative over the gate chain and starts at the corpus size
    assert funnel["total"] == tio.read("docs").count()
    assert (
        funnel["total"] >= funnel["len_ok"] >= funnel["tok_ok"]
        >= funnel["rep_ok"] >= funnel["kept"]
    )
    assert funnel["kept"] == signals.filter("kept").count() > 0

    # every curated doc passed the gates, and exactly one doc survives
    # per cluster — the canonical (min doc_id) member
    corpus = tio.read("corpus")
    n_bad = corpus.join(signals.filter("kept"), "doc_id", "left_anti").count()
    assert n_bad == 0
    clusters = tio.read("clusters")
    canon = clusters.groupBy("cluster_id").agg(F.min("doc_id").alias("doc_id"))
    deduped_ids = {x.doc_id for x in tio.read("deduped").select("doc_id").collect()}
    assert deduped_ids == {x.doc_id for x in canon.collect()}
    assert corpus.count() == len(deduped_ids)

    # packing plan sanity: ranges are ordered and token counts match the
    # token_count semantics on the normalized text
    bad = corpus.filter(
        (F.col("start_chunk") > F.col("end_chunk"))
        | (F.col("n_tokens") != F.size(F.split("norm_text", " ")))
    ).count()
    assert bad == 0

    # the corpus table is hive-partitioned by lang (per-language shards)
    import glob
    import os

    part_dirs = glob.glob(
        os.path.join(str(tmp_path / "whA"), "corpus", "data", "*", "lang=*")
    )
    assert part_dirs, "corpus stage must land lang=<v> partition dirs"
    assert corpus.count() == corpus.select("doc_id").distinct().count()

    # resume: identical invocation skips every stage
    r2 = run_curate(
        spark, tio, DEFAULT_CONFIG, "c1", pages, min_chars=80, min_tokens=10
    )
    assert r2.ran == [] and len(r2.skipped) == 9

    # a changed gate reuses ONLY the gate-independent ingest stage
    r3 = run_curate(
        spark, tio, DEFAULT_CONFIG, "c1", pages, min_chars=120, min_tokens=10
    )
    assert r3.skipped == ["docs"]
    assert "signals" in r3.ran and "signatures" in r3.ran


def test_curate_job_sampling_stage(spark, tiny_pages_df, tmp_path):
    from dedup.corpus import SAMPLE_DENOM, sample_hash_expr

    pages = tiny_pages_df.limit(250)
    tio, r = _run(
        spark, pages, tmp_path, "whB",
        min_chars=40, min_tokens=5,
        sample_rates={"en": 0.5}, sample_default_rate=0.5,
    )
    assert "sampled" in r.ran and r.ran[-1] == "corpus"
    deduped = tio.read("deduped")
    sampled = tio.read("sampled")
    # sampled ⊆ deduped, selected exactly by the deterministic hash rule
    assert sampled.join(deduped, "doc_id", "left_anti").count() == 0
    expect = deduped.withColumn("b", sample_hash_expr("doc_id")).filter(
        F.col("b") < int(0.5 * SAMPLE_DENOM)
    )
    got = {x.doc_id for x in sampled.select("doc_id").collect()}
    assert got == {x.doc_id for x in expect.select("doc_id").collect()}
    # the final corpus is the sampled set
    assert {x.doc_id for x in tio.read("corpus").select("doc_id").collect()} == got
