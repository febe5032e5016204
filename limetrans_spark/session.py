"""SparkSession factory tuned for the index-build workload.

Mirrors the operational posture of the reference pipeline (single JVM,
bounded memory, bulk-write oriented: ``ElasticsearchClient.java:39-47``)
but exposes the knobs that matter on a real multi-executor cluster:
shuffle partitions, AQE (runtime coalescing + skew handling), and Arrow
for the vectorized pandas UDF path (``input_hint``: no per-row Python).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "limetrans-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``.  On a cluster, spark-submit supplies the master and
    this function only applies the SQL confs.
    """
    # glibc malloc tuning inherited by the JVM and every forked Python
    # worker: keep freed large blocks on the heap instead of returning
    # them to the kernel (munmap/trim), so repeated per-task NumPy/Arrow
    # buffers reuse already-faulted pages.  On this sandbox first-touch
    # page faults dominate fresh allocations (measured: an identical 4 M-
    # row kernel ran 4.7 s cold vs 0.31 s warm); long-lived executors on
    # a real cluster want the same behaviour.  Overridable via the
    # environment; set only when absent.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "268435456")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "268435456")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    # Shuffle scratch: honour SPARK_LOCAL_DIRS when the deployment sets
    # it; otherwise prefer the memory-backed /dev/shm over /tmp on a
    # block device (guide §2.1: local disk bandwidth for shuffle files
    # can be the tighter limit — measured here as multi-second variance
    # between identical shuffle-heavy runs).  On a real cluster
    # SPARK_LOCAL_DIRS points at the fast local disks instead.
    local_dirs = os.environ.get("SPARK_LOCAL_DIRS")
    if not local_dirs and os.path.isdir("/dev/shm"):
        local_dirs = "/dev/shm/spark-local"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime partition coalescing + skew-join splitting. GroupBy
        # skew on high-DF terms is handled explicitly (operators/build.py),
        # AQE covers the join side.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # InferFiltersFromGenerate copies the full generator input
        # expression into a pushed-down size()/isnotnull() filter; for
        # explode(tokenize(text)) that re-runs the regex tokenizer per
        # row (measured: a 1.2 M-row token explode at sf1.0 dropped
        # 4.4 s → 0.9 s without it; guide §7.2 duplicated-subtree
        # check).  The rule only prunes empty/null arrays early —
        # excluding it is semantics-preserving.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # Arrow transfer for pandas UDFs / mapInPandas (the tokenizer and
        # the SPIMI block writer are Arrow-batched, never per-row Python).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # Keep scan splits small enough that a 100 TB corpus yields
        # balanced tokenize tasks (128 MiB is the Spark default; pinned
        # here so behavior is stable across deployments).
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # local mode runs driver AND all executor tasks in one JVM; at 8g
        # the shuffle + Arrow churn of a 32-core suite keeps the collector
        # running (measured: the same warm query sequence ran 19.2 s vs
        # 4.6 s on the heavy dedup op purely from heap size — guide §5).
        # Deployments override via SPARK_DRIVER_MEM / spark-submit.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "20g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if local_dirs:
        builder = builder.config("spark.local.dir", local_dirs)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
