"""Brute-force O(n²) oracle — the ground-truth twin of the pipeline
(SURVEY.md §5.2). Pure python/numpy, no Spark: same pinned config
(normalize, k, jaccard threshold, min-id labeling), raw-string shingle
sets (identical to hashed sets modulo 64-bit collisions). The pipeline
must reproduce this oracle's pair set with recall ≥ 0.99 and its exact
cluster partition (BASELINE.json:2,14).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import pandas as pd

from dedup.config import DedupConfig
from dedup.hashing import xxh64_str
from dedup.text import normalize_text_py


def shingle_set(norm_text: str, k: int) -> frozenset[str]:
    if len(norm_text) < k:
        return frozenset([norm_text])
    return frozenset(norm_text[i : i + k] for i in range(len(norm_text) - k + 1))


def jaccard(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


class UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        root = x
        while self.parent.setdefault(root, root) != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # keep min as root → min-id labeling for free
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb


@dataclass
class OracleResult:
    doc_ids: dict[str, int]                    # url → doc_id
    exact_edges: set[tuple[int, int]]          # canonical (src<dst)
    near_pairs: set[tuple[int, int]]           # truth: exact J ≥ thresh, reps only
    near_jaccard: dict[tuple[int, int], float]
    clusters: dict[int, int]                   # doc_id → cluster_id (min-id)
    reps: set[int] = field(default_factory=set)


def run_oracle(pages: pd.DataFrame, cfg: DedupConfig) -> OracleResult:
    """pages(url, text, …) → ground truth under the pinned config.
    Mirrors the pipeline rule set exactly: latest-per-url, exact groups
    by sha256(norm_text), near = exact Jaccard ≥ thresh between exact-
    group representatives with n_chars ≥ min_text_len, clusters =
    union-find over exact ∪ near, min-id labels."""
    latest = (
        pages.sort_values(["url", "warc_ts"])
        .groupby("url", as_index=False)
        .last()
    )
    rows = []
    for _, r in latest.iterrows():
        norm = normalize_text_py(r["text"])
        rows.append(
            {
                "url": r["url"],
                "doc_id": xxh64_str(r["url"]),
                "norm": norm,
                "sha": hashlib.sha256(norm.encode("utf-8")).hexdigest(),
            }
        )
    df = pd.DataFrame(rows)
    doc_ids = dict(zip(df["url"], df["doc_id"]))

    uf = UnionFind()
    for d in df["doc_id"]:
        uf.find(int(d))

    # exact groups → star edges from min member
    exact_edges: set[tuple[int, int]] = set()
    reps_rows = []
    for _, grp in df.groupby("sha"):
        ids = sorted(int(x) for x in grp["doc_id"])
        canon = ids[0]
        for other in ids[1:]:
            exact_edges.add((canon, other))
            uf.union(canon, other)
        reps_rows.append((canon, grp["norm"].iloc[0]))

    # near pairs among representatives (the quadratic part)
    shingles = {
        did: shingle_set(norm, cfg.k)
        for did, norm in reps_rows
        if len(norm) >= cfg.min_text_len
    }
    ids = sorted(shingles)
    near_pairs: set[tuple[int, int]] = set()
    near_jaccard: dict[tuple[int, int], float] = {}
    for i in range(len(ids)):
        si = shingles[ids[i]]
        for j in range(i + 1, len(ids)):
            jac = jaccard(si, shingles[ids[j]])
            if jac >= cfg.jaccard_thresh:
                pair = (ids[i], ids[j])
                near_pairs.add(pair)
                near_jaccard[pair] = jac
                uf.union(*pair)

    clusters = {int(d): uf.find(int(d)) for d in df["doc_id"]}
    return OracleResult(
        doc_ids=doc_ids,
        exact_edges=exact_edges,
        near_pairs=near_pairs,
        near_jaccard=near_jaccard,
        clusters=clusters,
        reps=set(shingles),
    )


def partition_of(clusters: dict[int, int]) -> set[frozenset[int]]:
    """Cluster partition as a set of frozensets (labeling-independent)."""
    groups: dict[int, set[int]] = {}
    for doc, c in clusters.items():
        groups.setdefault(c, set()).add(doc)
    return {frozenset(g) for g in groups.values()}
