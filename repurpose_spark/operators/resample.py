"""Spatial k-NN resampling as a relational join (J1/J2, SURVEY.md §2.3).

The reference resamples image points onto a target grid with a kd-tree:
``kd_tree.get_neighbour_info`` finds ≤k source neighbours within
``search_rad`` of each target point, drops targets with fewer than
``min_neighbours``, and either takes neighbour column 0 (nearest) or a
``weight_funcs(distance)``-weighted mean per variable
(/root/reference/src/repurpose/resample.py:70-147, entry :152-246;
Hamming window weight :249-268).

Spark-first shape: grids are *dimension tables* (thousands-to-millions of
points, tiny next to the fact data), so the neighbour relation is
precomputed ONCE into a pairs table ``(target_key, source_key, dist,
rank)`` and broadcast; every image/time-slice then resamples with a
map-side hash join + ``groupBy(target).agg(sum(w*v)/sum(w))`` — no
kd-tree per slice, no shuffle of the fact table beyond the final agg,
and Catalyst reuses the broadcast across variables and slices.

The pairs builder is driver-side numpy brute force — exact, deterministic
(ties broken by source_key), fine at dim-table scale; at extreme grid
sizes swap in an H3/S2-bucketed self-join producing the same pairs schema.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_neighbor_pairs(
    spark: SparkSession,
    targets,                 # list[(key, x, y)] or numpy arrays
    sources,                 # list[(key, x, y)]
    k: int = 4,
    max_dist: float = float("inf"),
) -> DataFrame:
    """Exact k-NN pairs (target_key, source_key, dist, rank), rank 1..k.

    Euclidean distance; ties broken by source_key so the relation is a
    deterministic function of the grids (reference takes kd-tree order,
    resample.py:125-129 — column 0 = nearest)."""
    t = np.asarray([(r[1], r[2]) for r in targets], dtype=np.float64)
    tk = [r[0] for r in targets]
    s = np.asarray([(r[1], r[2]) for r in sources], dtype=np.float64)
    sk = np.asarray([r[0] for r in sources])
    rows = []
    for i in range(len(t)):
        dx = s[:, 0] - t[i, 0]
        dy = s[:, 1] - t[i, 1]
        d = np.sqrt(dx * dx + dy * dy)
        ok = np.flatnonzero(d <= max_dist)
        order = ok[np.lexsort((sk[ok], d[ok]))][:k]
        for r, j in enumerate(order):
            rows.append((tk[i], sk[j].item(), float(d[j]), r + 1))
    return spark.createDataFrame(
        rows, "target_key long, source_key long, dist double, rank int"
    )


def build_neighbor_pairs_distributed(
    targets: DataFrame,
    sources: DataFrame,
    k: int = 4,
    max_dist: float = 1.0,
) -> DataFrame:
    """Fully distributed k-NN pairs — the scale path for grids too large
    to brute-force on the driver.

    Classic grid-bucket range join: bucket side length = ``max_dist``, so
    every source within range of a target lies in the target's 3×3 bucket
    neighborhood.  Targets publish 9 bucket keys (explode), sources one;
    the equi-join on bucket is a plain shuffled/broadcast hash join with
    O(1) fan-out per row, then rank-per-target with a window.  Each
    (target, source) pair matches exactly once (a source has one bucket).

    Input schemas: (key long/int, x double, y double).  Output is
    identical to :func:`build_neighbor_pairs` (same tie-break) —
    equality is test-enforced."""
    bx = F.floor(F.col("x") / max_dist)
    by = F.floor(F.col("y") / max_dist)
    s = sources.select(
        F.col("key").alias("source_key"),
        F.col("x").alias("sx"),
        F.col("y").alias("sy"),
        F.struct(bx.alias("bx"), by.alias("by")).alias("__b"),
    )
    neigh = F.array(
        *[
            F.struct((bx + dx).alias("bx"), (by + dy).alias("by"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    t = targets.select(
        F.col("key").alias("target_key"),
        F.col("x").alias("tx"),
        F.col("y").alias("ty"),
        F.explode(neigh).alias("__b"),
    )
    dx = F.col("sx") - F.col("tx")
    dy = F.col("sy") - F.col("ty")
    d = F.sqrt(dx * dx + dy * dy)
    from pyspark.sql import Window

    w = Window.partitionBy("target_key").orderBy("dist", "source_key")
    return (
        t.join(s, "__b")
        .withColumn("dist", d)
        .where(F.col("dist") <= max_dist)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("target_key", "source_key", "dist", "rank")
    )


def hamming_weight(dist_col, radius: float):
    """Hamming-window distance weight (resample.py:249-268):
    w(d) = 0.54 + 0.46*cos(pi * d / radius)."""
    return F.lit(0.54) + F.lit(0.46) * F.cos(
        F.lit(math.pi) * dist_col / F.lit(radius)
    )


def resample_weighted(
    src: DataFrame,
    pairs: DataFrame,
    value_cols: list,
    key_col: str = "key",
    extra_group_cols: list = (),
    weight=None,
    min_neighbours: int = 1,
) -> DataFrame:
    """Weighted k-NN aggregate join (J2 + A2): per target (and any extra
    group keys, e.g. ts), sum(w*v)/sum(w) over its neighbour set.

    ``pairs`` is broadcast (dim-scale); the fact table joins map-side.
    min_neighbours reproduces the reference's gate (resample.py:84-97)."""
    w = weight if weight is not None else F.lit(1.0)
    j = src.join(
        F.broadcast(pairs), src[key_col] == pairs["source_key"], "inner"
    ).withColumn("__w", w)
    aggs = [F.count("*").alias("n_neighbours")] + [
        (F.sum(F.col("__w") * F.col(v)) / F.sum("__w")).alias(v)
        for v in value_cols
    ]
    out = j.groupBy("target_key", *extra_group_cols).agg(*aggs)
    if min_neighbours > 1:
        out = out.where(F.col("n_neighbours") >= min_neighbours)
    return out


def resample_nn(
    src: DataFrame,
    pairs: DataFrame,
    value_cols: list,
    key_col: str = "key",
    extra_group_cols: list = (),
    max_dist: float | None = None,
) -> DataFrame:
    """Nearest-neighbour resample (J1): rank-1 pair only, optional
    distance gate (P5, ts2img.py:210-212)."""
    nn = pairs.where(F.col("rank") == 1)
    if max_dist is not None:
        nn = nn.where(F.col("dist") <= max_dist)
    j = src.join(F.broadcast(nn), src[key_col] == nn["source_key"], "inner")
    return j.select(
        "target_key", *extra_group_cols, "dist",
        *[F.col(v) for v in value_cols],
    )
