"""Transient-failure resilience (S3): the reference retries flaky image
reads in ImageBaseConnection (process.py:26-113, <=99 attempts with
backoff); the Spark-native analog is task-level retry
(spark.task.maxFailures, set by session.get_spark).

Local mode only honors retries with the ``local[N, maxFailures]`` master
form, which conflicts with the session-scoped fixture — so this test
drives a dedicated session in a subprocess: a source whose first read
attempt per partition raises IOError must still yield the complete,
correct result through task rescheduling.
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_flaky_source_recovers_via_task_retry(tmp_path):
    script = textwrap.dedent(
        f"""
        import os, sys
        sys.path.insert(0, {repr(REPO)})
        from pyspark import TaskContext
        from repurpose_spark.session import get_spark

        spark = get_spark(
            app_name="retry_test",
            master="local[2, 3]",  # 2 threads, 3 attempts per task
            shuffle_partitions=4,
            extra_conf={{"spark.ui.enabled": "false",
                         "spark.driver.memory": "2g"}},
        )
        spark.sparkContext.setLogLevel("ERROR")
        marker_dir = {repr(str(tmp_path))}

        def flaky_read(batches):
            ctx = TaskContext.get()
            pid = ctx.partitionId()
            marker = os.path.join(marker_dir, f"seen_{{pid}}")
            if not os.path.exists(marker):
                open(marker, "w").close()
                raise IOError(f"transient read failure, partition {{pid}}")
            for b in batches:
                yield b

        df = spark.range(0, 1000, numPartitions=4)
        out = df.mapInPandas(flaky_read, "id long")
        total = out.groupBy().sum("id").collect()[0][0]
        assert total == 499500, total
        # every partition failed exactly once before succeeding
        markers = [m for m in os.listdir(marker_dir) if m.startswith("seen_")]
        assert len(markers) == 4, markers
        spark.stop()
        print("RETRY_OK")
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert "RETRY_OK" in proc.stdout, proc.stderr[-3000:]
