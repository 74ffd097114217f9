"""Z-order clustering: row-group min/max stats must cover small spans in
EVERY clustered dimension (the data-skipping property), unlike a
single-column sort which leaves the second dimension full-span."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from repurpose_spark.functions.zorder import zorder_sort_key


@pytest.fixture(scope="module")
def grid(spark):
    # 2-D grid in shuffled order: both dims uniform in [0, 256)
    return spark.range(65536).select(
        F.shiftright("id", 8).alias("a"),
        (F.col("id") % 256).alias("b"),
        F.xxhash64("id").alias("shuffle"),
    ).orderBy("shuffle").drop("shuffle")


def _row_group_spans(path, cols):
    import glob

    spans = {c: [] for c in cols}
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c in cols:
                st = g.column(names.index(c)).statistics
                spans[c].append(st.max - st.min)
    return {c: sum(v) / len(v) for c, v in spans.items()}


def _write_sorted(df, path, key):
    (
        df.repartition(1)
        .sortWithinPartitions(key)
        .write.option("parquet.block.size", 64 * 1024)
        .parquet(path)
    )


def test_zorder_bounds_spans_in_both_dims(spark, grid, tmp_path):
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    _write_sorted(grid, zpath, zorder_sort_key(grid, ["a", "b"]))
    _write_sorted(grid, spath, F.col("a"))

    z = _row_group_spans(zpath, ["a", "b"])
    s = _row_group_spans(spath, ["a", "b"])
    # single-column sort: 'a' is perfectly clustered, 'b' is full-span
    assert s["a"] < 32
    assert s["b"] > 200
    # z-order: BOTH dims bounded well below full span — range predicates
    # on either column can skip most row groups via min/max stats
    assert z["a"] < 128 and z["b"] < 128
    assert z["a"] + z["b"] < s["a"] + s["b"]


def test_zorder_key_is_deterministic_and_total(spark, grid):
    k1 = grid.select(zorder_sort_key(grid, ["a", "b"])).collect()
    k2 = grid.select(zorder_sort_key(grid, ["a", "b"])).collect()
    assert k1 == k2
    vals = [r[0] for r in k1]
    assert len(set(vals)) > 1000  # a real interleave, not a constant


def test_zorder_constant_column_contributes_zero(spark):
    df = spark.range(100).select(
        F.lit(7).alias("c"), F.col("id").alias("x")
    )
    keys = [r[0] for r in df.select(zorder_sort_key(df, ["c", "x"])).collect()]
    # with the constant dim at rank 0, the key is just x's spread bits —
    # strictly monotone in x
    assert keys == sorted(keys)


def test_zorder_bits_cap(spark):
    df = spark.range(10).select(F.col("id").alias("x"))
    with pytest.raises(ValueError, match="<= 63"):
        zorder_sort_key(df, ["x"] * 8, bits=8)
