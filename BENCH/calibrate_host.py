"""Host scaling ceiling calibration (context for BENCH/BASELINE.md).

Runs an embarrassingly parallel, Spark-free workload — the pipeline's
own numpy signature kernels over synthetic shingle data — in K worker
PROCESSES (no GIL, no shuffle, no JVM) and reports aggregate throughput
at each K. The ratio between K=8·m and K=2·m bounds what ANY job can
show on this VM: if raw numpy at 4× processes yields < 4× throughput,
the gap is hypervisor CPU throttling / memory bandwidth, not the
pipeline's orchestration.

Usage: python BENCH/calibrate_host.py [--levels 2,8,32] [--seconds 10]
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(seconds: float, out) -> None:
    import numpy as np

    from dedup.hashing import minhash_batch, perm_consts, simhash_batch

    rng = np.random.default_rng(os.getpid())
    # ~2k docs x ~200 shingles per iteration, like a real Arrow batch
    lengths = rng.integers(50, 400, size=2000).astype(np.int64)
    flat = rng.integers(0, 2**63, size=int(lengths.sum()), dtype=np.int64)
    consts = perm_consts(128, 42)
    t_end = time.perf_counter() + seconds
    iters = 0
    while time.perf_counter() < t_end:
        minhash_batch(flat, lengths, consts)
        simhash_batch(flat, lengths)
        iters += 1
    out.put(iters * len(lengths))


def measure(k: int, seconds: float) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=worker, args=(seconds, q)) for _ in range(k)]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    dt = time.perf_counter() - t0
    return total / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,4,8,16,32")
    ap.add_argument("--seconds", type=float, default=10.0)
    args = ap.parse_args()
    base = None
    for k in (int(x) for x in args.levels.split(",")):
        thr = measure(k, args.seconds)
        if base is None:
            base_k, base = k, thr
        print(
            f"procs={k:3d}  docs/sec={thr:12.0f}  "
            f"speedup_vs_{base_k}={thr / base:5.2f}  "
            f"efficiency={thr / base / (k / base_k):5.3f}"
        )


if __name__ == "__main__":
    main()
