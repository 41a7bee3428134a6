"""Per-stage wall-clock profile of run_dedup — identifies which stages
scale with cores and which are fixed overhead (drives the scaling-
efficiency work; see BENCH/bench_scaling.py).

Usage: python BENCH/profile_stages.py [--n-docs 100000] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def profile(cores: int, path: str) -> dict:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from dedup.components import assign_clusters, connected_components
    from dedup.config import DEFAULT_CONFIG as cfg
    from dedup.candidates import simhash_candidates
    from dedup.skew import salted_lsh_candidates
    from dedup.ingest import exact_edges, representatives, to_docs
    from dedup.pipeline import _spill
    from dedup.session import get_spark
    from dedup.signatures import with_bands, with_shingle_signatures
    from dedup.verify import verify_jaccard_lazy

    spark = get_spark(
        app_name=f"profile-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    # warm-up: full pipeline once (codegen + python workers)
    from dedup.pipeline import run_dedup

    pages = spark.read.parquet(path)
    res = run_dedup(pages, cfg)
    res.clusters.select("cluster_id").distinct().count()
    for df in (res.docs, res.signatures, res.edges):
        df.unpersist()
    spark.catalog.clearCache()

    t: dict[str, float] = {}

    def tick(name):
        t[name] = round(time.perf_counter() - tick.t0, 2)
        tick.t0 = time.perf_counter()

    tick.t0 = time.perf_counter()

    docs = to_docs(pages, cfg).persist(StorageLevel.MEMORY_AND_DISK_DESER)
    docs.count()
    tick("docs_persist")

    reps = representatives(docs, cfg)
    sigs = _spill(with_shingle_signatures(reps, cfg), "profile-sigsh")
    tick("fused_signatures_spill")

    bands = with_bands(sigs, cfg)
    cands = salted_lsh_candidates(bands, cfg)
    cands = cands.union(simhash_candidates(sigs, cfg)).dropDuplicates(["src", "dst"])
    n_cands = cands.count()
    tick("candidates_count")

    near = verify_jaccard_lazy(cands, docs, cfg, signatures=sigs)
    edges = (
        exact_edges(docs)
        .unionByName(near)
        .dropDuplicates(["src", "dst"])
        .persist(StorageLevel.MEMORY_AND_DISK_DESER)
    )
    n_edges = edges.count()
    tick("verify_edges_persist")

    comp = connected_components(
        edges.filter(F.col("kind").isin("exact", "near")), max_iter=cfg.max_cc_iter
    )
    clusters = assign_clusters(docs, comp)
    n_clusters = clusters.select("cluster_id").distinct().count()
    tick("cc_assign_count")

    spark.stop()
    t["total"] = round(sum(t.values()), 2)
    return {
        "cores": cores,
        "stages": t,
        "n_cands": n_cands,
        "n_edges": n_edges,
        "n_clusters": n_clusters,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--cores", default="32")
    args = ap.parse_args()
    path = os.path.join("/tmp", f"bench_pages_{args.n_docs}")
    for c in args.cores.split(","):
        print(json.dumps(profile(int(c), path)))


if __name__ == "__main__":
    main()
