"""Plan-level guards: narrow-scan widening."""

from repurpose_spark.plans.parallelism import ensure_parallelism


def test_ensure_parallelism_widens_narrow_input(spark):
    narrow = spark.range(0, 10_000, 1, numPartitions=1)
    wide = ensure_parallelism(narrow)
    assert (
        wide.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    assert wide.count() == 10_000


def test_ensure_parallelism_noop_on_wide_input(spark):
    target = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000, 1, numPartitions=target + 4)
    out = ensure_parallelism(wide)
    # pass-through: same object, no repartition inserted
    assert out is wide


def test_ensure_parallelism_respects_explicit_min(spark):
    narrow = spark.range(0, 100, 1, numPartitions=2)
    assert ensure_parallelism(narrow, min_partitions=2) is narrow
    assert ensure_parallelism(narrow, min_partitions=6).rdd.getNumPartitions() == 6
