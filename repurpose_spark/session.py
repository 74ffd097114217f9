"""SparkSession factory with scale-oriented defaults.

The conf mirrors what we would submit on a real 1000-executor cluster via
``spark-submit --py-files`` (AQE on, skew-join on, Arrow on); locally the
master defaults to ``local[N]``.  Shuffle partitions default to 2x cores
locally but should be sized to ~128MB-per-partition at cluster scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "repurpose_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    task_retries: int = 4,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Parameters mirror spark-submit conf; on a cluster, master/cores come
    from the submitter and only the sql conf below matters.
    """
    # make the engine importable in spawned python workers regardless of the
    # driver's cwd — the local-mode analog of `spark-submit --py-files`
    # (workers inherit PYTHONPATH from the JVM, which inherits it from here;
    # on a real cluster the launcher ships a zip via --py-files instead)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + pp if pp else "")
        )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # local heuristic: 2x parallelism; at cluster scale this is set by
        # the submitter to total-cores * 2..3 (AQE coalesces down anyway).
        n = cpus if master.startswith("local") else 200
        shuffle_partitions = 2 * n

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime re-plan, partition coalescing, skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for all pandas UDF / toPandas boundaries.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Parquet: zstd everywhere (the engine's analog of the reference's
        # zlib-6 chunk compression, ts2img.py:413-419).
        .config("spark.sql.parquet.compression.codec", "zstd")
        # timestamps without timezone surprises
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        # v2 committer: task outputs move to the final dir at task commit,
        # so job commit is O(1) instead of a serial rename of every file
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
            "2",
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # transient-IO resilience: the reference wraps every image read in
        # a retry loop (ImageBaseConnection, process.py:26-113, <=99
        # attempts); Spark's analog is task-level retry — a task that dies
        # on a flaky read is rescheduled up to task_retries times before
        # the job fails.  NB: a plain local[N] master ignores this conf;
        # local testing needs the local[N, maxFailures] form
        # (tests/test_retry.py drives it end-to-end).
        .config("spark.task.maxFailures", str(task_retries))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
