"""SparkSession factory with the pipeline's pinned runtime configuration.

Settings follow SURVEY.md §4: AQE on (incl. skew-join), Arrow on with a
bounded batch size for the pandas UDFs, UTC session timezone so timestamp
outputs are engine-independent, and shuffle partitions sized for the
local[N] sandbox (on a real cluster spark-submit overrides these).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def scratch_dir() -> str:
    """RAM-backed scratch when available (shuffle files, pipeline spills).

    On a real cluster every executor has its own local NVMe for shuffle;
    in this sandbox all local[N] task threads share ONE virtio disk, and
    at 32 concurrent writers the measured shuffle-write time inflates
    ~20x (disk queue contention) — which is a property of the sandbox,
    not the job. /dev/shm restores per-core write bandwidth. Override
    with $DEDUP_SCRATCH.

    MEMORY BUDGET: tmpfs scratch + uncompressed shuffle/spills trade RAM
    for bandwidth — heap + shuffle + spills must fit the host (measured:
    2M docs at local[32] with a 48g heap OOM-killed a 128 GB host).
    Beyond ~1M local docs set $DEDUP_SCRATCH to a disk path (compression
    auto-re-enables, see _is_tmpfs call sites)."""
    d = os.environ.get("DEDUP_SCRATCH")
    if d:
        return d
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        return "/dev/shm/dedup-scratch"
    import tempfile

    return tempfile.gettempdir()


def _tune_worker_malloc() -> None:
    """Raise glibc's mmap/trim thresholds for the Python workers.

    The Arrow-batch kernels allocate multi-MB numpy temporaries per
    batch; above glibc's default 128 KB threshold every one is a fresh
    mmap and every free a munmap — page faults on first touch plus
    cross-CPU TLB shootdowns on unmap, kernel-side costs that grow
    superlinearly with concurrent workers (invisible to the raw-numpy
    host calibration, whose buffers live across iterations). Forcing
    large allocations onto the reused heap removed ~12% of warm
    pipeline wall at local[16] on the 500k-doc bench (55.7 → 49.0 s)
    and more at local[32]. Env must be set before the JVM starts: the
    pyspark daemon (and thus every forked worker) inherits it. On a
    real cluster the same knobs ship as
    ``spark.executorEnv.MALLOC_MMAP_THRESHOLD_`` etc."""
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(512 * 1024 * 1024))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(512 * 1024 * 1024))
    os.environ.setdefault("MALLOC_TOP_PAD_", str(128 * 1024 * 1024))


def _is_tmpfs(path: str) -> bool:
    """True when ``path`` is RAM-backed (tmpfs/ramfs) — decides whether
    shuffle compression buys anything (see get_spark)."""
    try:
        import subprocess

        out = subprocess.run(
            ["stat", "-f", "-c", "%T", path], capture_output=True, text=True
        )
        return out.stdout.strip() in ("tmpfs", "ramfs")
    except Exception:
        return False


def get_spark(
    app_name: str = "pyspark-webdedup",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    _tune_worker_malloc()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    local_dir = os.path.join(scratch_dir(), "spark-local")
    os.makedirs(local_dir, exist_ok=True)
    driver_mem = os.environ.get("SPARK_DRIVER_MEM", "8g")
    # Pin + pre-touch the heap and back it with transparent huge pages:
    # a multi-GB G1 heap that grows/shrinks on demand pays kernel-side
    # page-fault + TLB-shootdown costs on every expansion and every
    # uncommit/refault cycle, billed as task CPU and GC time. Measured on
    # the 500k-doc pipeline at local[32]: no flags 154 s warm, -Xms+
    # AlwaysPreTouch 57 s, +UseTransparentHugePages 32 s — and run-to-run
    # variance collapsed (system-CPU share of the run dropped from ~60%).
    # THP is madvise-mode on this host, so the JVM must opt in; pretouch
    # happens once at JVM start (cold path). Same flags are what you'd
    # set via spark-submit --driver-java-options on a real cluster
    # (executors: spark.executor.extraJavaOptions).
    jvm_opts = os.environ.get(
        "DEDUP_JVM_OPTS",
        f"-Xms{driver_mem} -XX:+AlwaysPreTouch -XX:+UseTransparentHugePages",
    )
    extra_conf = dict(extra_conf or {})
    user_opts = extra_conf.pop("spark.driver.extraJavaOptions", "")
    if user_opts:
        jvm_opts = f"{jvm_opts} {user_opts}"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # post-shuffle grain: AQE's 64 MB advisory is tuned for JVM-cheap
        # operators; this pipeline's post-shuffle stages are python-CPU
        # heavy (signature/verify kernels), where 64 MB ⇒ ~10 fat tasks
        # that quantize badly onto the executor slots (measured: half a
        # stage running one straggler task at local[8]). 16 MB keeps
        # task grain fine enough to balance; tiny frames still coalesce.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 16k-row Arrow batches: the exchange-fed numpy kernels (LSH
        # bucket scan, simhash scan — ~60 B/row) pay a fixed JVM cost
        # per batch flush (vector alloc/reset + IPC framing); at the
        # default-ish 4096 rows that overhead dominated the conversion
        # (profiled 53 JVM-cpu-s for 7.4M rows at local[32]; 16k rows
        # cut the 500k-doc warm run 29 → 25 s and collapsed run-to-run
        # variance). Text stages stay bounded: ~1 KB/doc → ≤ ~16 MB
        # per batch at the Python boundary.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", driver_mem)
        .config("spark.driver.extraJavaOptions", jvm_opts)
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # shuffle write path: 1 MB file buffers (default 32k) cut
        # per-record syscall/flush overhead ~30×; profiled shuffle-write
        # time on IDENTICAL bytes inflated 19× going local[4]→local[16]
        # (4.1→79.4 s for 1.7 GB on tmpfs) — buffer contention, not
        # bandwidth. Larger lz4 blocks amortize the compressor the same
        # way. Memory cost: 1 MB × concurrent shuffle-map tasks, trivial
        # against the driver heap.
        # scan-split grain: 16 MB split target so a few-hundred-MB spill
        # or input table fans out to ~2 waves at local[32] instead of a
        # handful of 128 MB fat tasks (pairs with the spill writer's
        # maxRecordsPerFile — parquet can't split below a row group, so
        # files must be small for this to bite). On a real cluster the
        # inputs are TB-scale and the default 128 MB grain is right —
        # spark-submit overrides these like every other session conf.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.shuffle.file.buffer", "1m")
        .config("spark.shuffle.unsafe.file.output.buffer", "1m")
        .config("spark.shuffle.spill.diskWriteBufferSize", "1m")
        .config("spark.io.compression.lz4.blockSize", "512k")
        # ALWAYS use the sort-based (Unsafe) shuffle writer, never the
        # bypass-merge one. Below the default bypassMergeThreshold (200)
        # a non-aggregating shuffle opens one stream PER REDUCE PARTITION
        # per map task — at 64 partitions × 32 local tasks that is ~2k
        # concurrent streams × (1 MB file buffer + lz4 buffers) of
        # allocation churn, profiled as 5-60× task-time inflation on the
        # pipeline's exchange stages at local[32] (the single worst
        # scaling pathology found; fixing it took the 500k-doc warm run
        # 49 s → 29 s). A real cluster runs shuffle.partitions ≫ 200, so
        # the sort writer is the at-scale code path anyway — this just
        # stops the sandbox's 64-partition shuffles falling into a
        # writer the design target would never use.
        .config("spark.shuffle.sort.bypassMergeThreshold", "4")
        .config("spark.local.dir", local_dir)
    )
    if _is_tmpfs(local_dir):
        # Shuffle files live in RAM: lz4 here only burns the shared
        # memory bandwidth the kernels need (measured 49 → 35 s warm at
        # local[32] from this alone; combined with the sort writer,
        # 27 s). On a real cluster shuffle crosses disks + network and
        # compression pays for itself — the default (on) stands there
        # because local.dir is then a real disk.
        b = b.config("spark.shuffle.compress", "false")
        b = b.config("spark.shuffle.spill.compress", "false")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def enable_rocksdb_state(spark: SparkSession) -> None:
    """Switch streaming state storage to the bundled RocksDB provider —
    used by the stateful-sketch operator (SURVEY.md §2 J5) and the right
    choice at scale anyway: state lives off-heap/on-disk per executor
    instead of in the HDFS-backed in-memory map, so a 100 TB corpus's
    per-key sketches don't compete with shuffle memory."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an iceberg-spark-runtime jar is on the JVM classpath.
    Locally there is none (SURVEY.md §0); TableIO then uses the
    parquet+manifest fallback with the same interface."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False
