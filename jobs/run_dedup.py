"""Production entry point (SURVEY.md §3.2 EP1): staged, resumable
near-dup pipeline with committed snapshots, lineage, and metrics.

Run locally::

    python jobs/run_dedup.py --input /root/testdata/sf0.001/documents.parquet \
        --input-kind documents --warehouse /tmp/dedup_wh --run-id r1

Or on a cluster (BASELINE.json:6 "spark-submit --py-files")::

    python -m zipfile -c dedup.zip dedup/
    spark-submit --py-files dedup.zip jobs/run_dedup.py \
        --input s3://…/web_pages --warehouse s3://…/warehouse --run-id r1

Every stage is pure (read committed inputs → DataFrame → commit); a
stage whose ``(run_id, stage, config_hash)`` marker exists is SKIPPED
and its snapshot is reused — kill the job at any point and rerun with
the same ``--run-id`` to resume from the last committed stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dedup.components import assign_clusters, connected_components  # noqa: E402
from dedup.config import DEFAULT_CONFIG, DedupConfig  # noqa: E402
from dedup.ingest import exact_edges, representatives, to_docs  # noqa: E402
from dedup.lineage import StageTimer, metrics_df, partition_lineage  # noqa: E402
from dedup.pipeline import cluster_report  # noqa: E402
from dedup.signatures import (  # noqa: E402
    range_partition_by_sig_prefix,
    with_bands,
    with_slim_signatures,
)
from dedup.candidates import cap_buckets, simhash_candidates_arrow  # noqa: E402
from dedup.skew import salted_lsh_candidates  # noqa: E402
from dedup.tableio import TableIO  # noqa: E402
from dedup.verify import est_filter_pairs, verify_jaccard_lazy  # noqa: E402


def load_pages(spark: SparkSession, path: str, kind: str) -> DataFrame:
    if kind == "pages":
        return spark.read.parquet(path)
    # documents-table adapter (harness/test data shape)
    return spark.read.parquet(path).select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        "lang",
    )


class Runner:
    """Stage driver: commit-or-skip around pure stage functions."""

    def __init__(self, spark, tio: TableIO, cfg: DedupConfig, run_id: str):
        self.spark, self.tio, self.cfg, self.run_id = spark, tio, cfg, run_id
        self.ran: list[str] = []
        self.skipped: list[str] = []

    def stage(self, name: str, fn, sort_within=None, extra_key: str = "") -> DataFrame:
        # extra_key folds stage-affecting flags that live OUTSIDE
        # DedupConfig (e.g. --use-containment) into the resume key, so
        # re-running a run_id with a flipped flag recomputes the affected
        # stages instead of silently reusing a stale snapshot
        ch = self.cfg.config_hash() + extra_key
        marker = self.tio.find_stage(self.run_id, name, ch)
        if marker:
            self.skipped.append(name)
            return self.tio.read(marker["table"], marker["snapshot_id"])
        with StageTimer() as t:
            df = fn()
            snap = self.tio.write(df, name, mode="overwrite", sort_within=sort_within)
        out = self.tio.read(name, snap)
        self.tio.write(
            partition_lineage(out, self.run_id, name, t.wall_ms, snap),
            "lineage",
            mode="append",
        )
        self.tio.write(
            metrics_df(
                self.spark, self.run_id, name,
                {"rows": out.count(), "wall_ms": t.wall_ms},
            ),
            "metrics",
            mode="append",
        )
        self.tio.mark_stage(self.run_id, name, ch, name, snap)
        self.ran.append(name)
        return out


def run(spark, tio: TableIO, cfg: DedupConfig, run_id: str, pages: DataFrame,
        use_containment: bool = False) -> Runner:
    r = Runner(spark, tio, cfg, run_id)

    docs = r.stage("docs", lambda: to_docs(pages, cfg), sort_within=["doc_id"])
    docs = docs.persist()
    docs.count()

    # committed signature table is the SLIM form (band hashes + byte-packed
    # est prefix + simhash): 2.5× less I/O than full-width minhash, and
    # everything downstream — banding, est prefilter, simhash blocking —
    # reads only it. Same fused flow as pipeline.build_edges.
    def mk_sigs():
        return range_partition_by_sig_prefix(
            with_slim_signatures(representatives(docs, cfg), cfg)
        )

    sigs = r.stage("signatures", mk_sigs, sort_within=["doc_id"])

    def mk_edges():
        bands, _hot = cap_buckets(with_bands(sigs, cfg), cfg.bucket_cap)
        cands = salted_lsh_candidates(bands, cfg, dedupe=False).union(
            simhash_candidates_arrow(sigs, cfg, dedupe=False)
        )
        # est filter fused pre-distinct: the overcomplete flood never
        # crosses a shuffle; exact shingle Jaccard (recomputed only for
        # est survivors inside verify_jaccard_lazy) decides every edge
        cands = est_filter_pairs(cands, sigs, cfg).dropDuplicates(["src", "dst"])
        near = verify_jaccard_lazy(cands, docs, cfg, signatures=sigs)
        e = exact_edges(docs).unionByName(near)
        if use_containment:
            # E5 at-scale surface (--use-containment): candidates that
            # FAILED the near-Jaccard verify get the suffix-array
            # longest-common-substring check → 'substr' edges (same
            # composition as pipeline.build_edges)
            from dedup.verify import verify_containment

            sub = verify_containment(
                cands.join(near.select("src", "dst"), ["src", "dst"], "left_anti"),
                docs,
                cfg,
            )
            e = e.unionByName(sub)
        return e.dropDuplicates(["src", "dst"])

    ck = "-containment" if use_containment else ""
    edges = r.stage("edges", mk_edges, sort_within=["src", "dst"], extra_key=ck)
    kinds = ("exact", "near", "substr") if use_containment else ("exact", "near")

    def mk_clusters():
        comp = connected_components(
            edges.filter(F.col("kind").isin(*kinds)),
            max_iter=cfg.max_cc_iter,
        )
        return assign_clusters(docs, comp).select("doc_id", "url", "cluster_id")

    clusters = r.stage(
        "clusters", mk_clusters, sort_within=["cluster_id", "doc_id"], extra_key=ck
    )

    r.stage(
        "report",
        lambda: cluster_report(
            clusters.join(docs.select("doc_id", "warc_ts", "n_chars"), "doc_id")
        ),
        extra_key=ck,
    )
    docs.unpersist()
    return r


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path of input pages")
    ap.add_argument("--input-kind", choices=["pages", "documents"], default="pages")
    ap.add_argument("--warehouse", required=True, help="TableIO root directory")
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--config", help="JSON file with DedupConfig overrides")
    ap.add_argument(
        "--use-containment",
        action="store_true",
        help="also emit suffix-array 'substr' containment edges (E5) and "
        "include them in clustering",
    )
    args = ap.parse_args(argv)

    cfg = DEFAULT_CONFIG
    if args.config:
        with open(args.config) as f:
            cfg = DedupConfig(**{**json.load(f)})

    from dedup.session import get_spark

    spark = get_spark(app_name=f"dedup-{args.run_id}")
    tio = TableIO(spark, args.warehouse)
    pages = load_pages(spark, args.input, args.input_kind)
    r = run(spark, tio, cfg, args.run_id, pages,
            use_containment=args.use_containment)
    print(json.dumps({"run_id": args.run_id, "ran": r.ran, "skipped": r.skipped}))


if __name__ == "__main__":
    main()
