"""Job-level profile of run_dedup via Spark event logs.

Runs the EXACT bench workload (warm-up + timed warm run of
``dedup.pipeline.run_dedup``) with ``spark.eventLog.enabled``, then
parses the event log to report, for every Spark job of the timed run:
wall clock, summed task time, effective parallelism (task_time / wall),
and the driver-side gap since the previous job. Jobs whose effective
parallelism is far below the core count — and the gaps — are the
non-scaling time that caps the local[8] → local[32] efficiency.

Usage: python BENCH/profile_jobs.py [--n-docs 500000] [--cores 32]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cores: int, path: str, evdir: str) -> tuple[float, float]:
    from dedup.config import DEFAULT_CONFIG
    from dedup.pipeline import run_dedup
    from dedup.session import get_spark

    spark = get_spark(
        app_name=f"profile-jobs-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=64,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
        },
    )

    def once():
        pages = spark.read.parquet(path)
        t0 = time.perf_counter()
        res = run_dedup(pages, DEFAULT_CONFIG)
        res.clusters.select("cluster_id").distinct().count()
        dt = time.perf_counter() - t0
        for df in (res.docs, res.signatures, res.edges):
            df.unpersist()
        spark.catalog.clearCache()
        return dt

    once()  # warm-up
    spark.sparkContext._jvm.System.gc()  # reclaim warm-up shuffle files
    time.sleep(2)
    t_mark = time.time() * 1000  # ms epoch: jobs after this are the timed run
    warm = once()
    spark.stop()
    return warm, t_mark


def _event_files(evdir: str) -> list[str]:
    """Spark 4 rolling logs are DIRECTORIES (eventlog_v2_*/events_*);
    single-file logs also occur. Return all event files, oldest first."""
    out = []
    for p in sorted(glob.glob(os.path.join(evdir, "*")), key=os.path.getmtime):
        if os.path.isdir(p):
            out.extend(
                sorted(glob.glob(os.path.join(p, "events_*")), key=os.path.getmtime)
            )
        elif os.path.basename(p).startswith((".", "appstatus")):
            continue
        else:
            out.append(p)
    return out


def _open_events(path: str):
    """Event files may be zstd-compressed (rolling log default). Use
    pyarrow's bundled zstd (no `zstd` binary on this host)."""
    if path.endswith(".zstd"):
        import io

        import pyarrow as pa

        with pa.input_stream(path, compression="zstd") as s:
            return io.StringIO(s.read().decode())
    return open(path)


def parse(evdir: str, t_mark: float, cores: int, warm: float) -> None:
    logs = _event_files(evdir)
    jobs: dict[int, dict] = {}
    stage_names: dict[int, str] = {}
    task_time: dict[int, float] = {}  # per stage, ms
    stage_metrics: dict[int, dict] = {}  # per stage: cpu/gc/shufW ms, bytes
    stage_jobs: dict[int, int] = {}
    task_spans: list[tuple[float, float]] = []  # (launch_ms, finish_ms)
    def lines():
        for p in logs:
            with _open_events(p) as f:
                yield from f

    for line in lines():
        if True:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:90],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
                for s in ev["Stage Infos"]:
                    stage_names[s["Stage ID"]] = s["Stage Name"].split("\n")[0][:70]
                    stage_jobs[s["Stage ID"]] = jid
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                info = ev.get("Task Info", {})
                task_time[sid] = task_time.get(sid, 0.0) + (
                    info.get("Finish Time", 0) - info.get("Launch Time", 0)
                )
                task_spans.append(
                    (info.get("Launch Time", 0), info.get("Finish Time", 0))
                )
                m = ev.get("Task Metrics") or {}
                d = stage_metrics.setdefault(
                    sid, dict(cpu=0.0, gc=0.0, sw=0.0, sw_b=0, sr_b=0)
                )
                d["cpu"] += m.get("Executor CPU Time", 0) / 1e6
                d["gc"] += m.get("JVM GC Time", 0)
                d["sw"] += (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Write Time", 0
                ) / 1e6
                d["sw_b"] += (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
                sr = m.get("Shuffle Read Metrics") or {}
                d["sr_b"] += sr.get("Local Bytes Read", 0) + sr.get(
                    "Remote Bytes Read", 0
                )

    timed = {
        j: v for j, v in jobs.items() if v.get("start", 0) >= t_mark and "end" in v
    }
    print(f"\n=== cores={cores} warm_total={warm:.1f}s  jobs(timed run)={len(timed)}")

    # --- per-description rollup (descriptions set by dedup.pipeline) ---
    by_desc: dict[str, list] = {}
    for jid, v in sorted(timed.items()):
        d = v["desc"] or "(none)"
        wall = (v["end"] - v["start"]) / 1000
        tt = sum(task_time.get(s, 0.0) for s in v["stages"]) / 1000
        by_desc.setdefault(d, [0.0, 0.0, 0, dict(cpu=0.0, gc=0.0, sw=0.0, sw_b=0, sr_b=0)])
        by_desc[d][0] += wall
        by_desc[d][1] += tt
        by_desc[d][2] += 1
        for s in v["stages"]:
            if s in stage_metrics:
                for k, val in stage_metrics[s].items():
                    by_desc[d][3][k] += val
    for d, (wall, tt, n, m) in sorted(by_desc.items(), key=lambda kv: -kv[1][0]):
        # "other" = task time neither on JVM CPU, in GC, nor writing
        # shuffle — for mapInArrow stages that is Python-worker time; for
        # joins it is shuffle-fetch/spill/lock waiting. The split is what
        # distinguishes bandwidth saturation from idle cores.
        other = tt - (m["cpu"] + m["gc"] + m["sw"]) / 1000
        print(
            f"  {wall:7.2f}s wall  {tt:8.1f}s task∑  par {tt/max(wall,.01):5.1f}  "
            f"jobs {n:3d}  [cpu {m['cpu']/1000:6.1f}s gc {m['gc']/1000:5.1f}s "
            f"shufW {m['sw']/1000:5.1f}s other {other:6.1f}s "
            f"shW {m['sw_b']/1e9:5.2f}GB shR {m['sr_b']/1e9:5.2f}GB]  {d}"
        )

    # --- core-occupancy timeline over the timed run: the time spent at
    # ≤1 running task is the true serial (Amdahl) component ---
    t0 = min(v["start"] for v in timed.values())
    t1 = max(v["end"] for v in timed.values())
    span = (t1 - t0) / 1000
    n_bins = max(int(span * 10), 1)
    occ = [0.0] * n_bins
    for ls, fs in task_spans:
        if fs <= t0 or ls >= t1:
            continue
        b0 = max(int((ls - t0) / 1000 * 10), 0)
        b1 = min(int((fs - t0) / 1000 * 10), n_bins - 1)
        for b in range(b0, b1 + 1):
            occ[b] += 1
    idle = sum(1 for o in occ if o < 0.5) / 10
    serial = sum(1 for o in occ if 0.5 <= o <= 1.5) / 10
    low = sum(1 for o in occ if 1.5 < o <= cores / 4) / 10
    mid = sum(1 for o in occ if cores / 4 < o <= cores * 0.75) / 10
    full = sum(1 for o in occ if o > cores * 0.75) / 10
    print(
        f"--- span={span:.1f}s  occupancy: idle(<1 task)={idle:.1f}s  "
        f"serial(~1)={serial:.1f}s  low(≤{cores//4})={low:.1f}s  "
        f"mid={mid:.1f}s  full(>{int(cores*0.75)})={full:.1f}s"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=500_000)
    ap.add_argument("--cores", default="32")
    args = ap.parse_args()
    path = os.path.join("/tmp", f"bench_pages_{args.n_docs}")
    for c in args.cores.split(","):
        evdir = f"/tmp/spark-events-{c}"
        if os.path.isdir(evdir):
            import shutil

            shutil.rmtree(evdir)
        os.makedirs(evdir)
        warm, t_mark = run(int(c), path, evdir)
        parse(evdir, t_mark, int(c), warm)


if __name__ == "__main__":
    main()
