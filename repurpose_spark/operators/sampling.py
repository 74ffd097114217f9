"""Deterministic per-group bottom-k sampling.

A training-data pipeline constantly needs "a fixed, reproducible sample
of k docs per source/shard/language" — for eval holdouts, human review
queues, or cheap profiling — and it needs the SAME sample on every run,
on every cluster size, regardless of partitioning.  Random sampling
can't promise that; hash-ranked sampling can: rank every row by
``md5(id || seed)`` and keep each group's k smallest.  The hash is a
pure function of row identity, so the sample is content-stable (the
same property split_assign in packing.py uses for train/val/test).

The naive plan — ``row_number() OVER (PARTITION BY group ORDER BY
hash)`` on the corpus — shuffles and sorts EVERY row to rank the
handful that survive.  This operator never shuffles the corpus at all:

1. map-side: project (group, id, hash) — hash computed JVM-side.
2. per-partition bottom-k per group via one ``mapInPandas`` pass
   (a dict of ≤k-row frames per group seen in that partition — the
   classic top-k superset property makes local pruning exact).
3. global rank on the survivors: ≤ k × n_input_partitions rows per
   group — ledger-sized, one tiny exchange.
4. winners broadcast back as a left-semi join: the corpus is read
   once, map-side only, and the payload columns ride the original
   rows (never the sample machinery).

Reference analog: repurpose subsets grids by deterministic cell lists
(grid.py subset handling); this is the content-addressed equivalent for
unordered document corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_hash_expr(id_col: str, seed: str) -> "F.Column":
    """The rank hash: md5 of id + unit-separator + seed (lowercase hex
    in both Spark and DuckDB, so oracles compare the same strings)."""
    return F.md5(F.concat_ws("\x1f", F.col(id_col), F.lit(str(seed))))


def sample_bottom_k(
    df: DataFrame,
    key_cols: list,
    k: int,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Deterministic k-row sample per group: the k rows whose
    ``md5(id || seed)`` rank smallest within their group (ties broken
    by id; ids assumed unique within a group).  Returns the original
    rows, all columns, unshuffled."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    key_cols = list(key_cols)
    tag = df.select(
        *key_cols, F.col(id_col), sample_hash_expr(id_col, seed).alias("_h")
    )
    return _rank_bottom_k(df, tag, key_cols, k, id_col)


def _rank_bottom_k(
    df: DataFrame, tag: DataFrame, key_cols: list, k: int, id_col: str
) -> DataFrame:
    """Shared never-shuffle-the-corpus bottom-k core: ``tag`` holds
    (keys…, id, _h); keep each group's k rows with the smallest
    (_h, id) and semi-join the winners back onto ``df``.  Local
    per-partition heaps (mapInPandas, exact by the top-k superset
    property) → survivors-only global rank → broadcast semi-join."""
    schema = tag.schema
    gcols, hcol, icol = key_cols, "_h", id_col

    def _local_bottom_k(batches):
        import pandas as pd

        best: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            if gcols:
                groups = pdf.groupby(gcols, dropna=False, sort=False)
            else:
                groups = [((), pdf)]
            for g, sub in groups:
                cand = pd.concat([best[g], sub]) if g in best else sub
                best[g] = cand.sort_values([hcol, icol]).head(k)
        if best:
            yield pd.concat(best.values(), ignore_index=True)

    local = tag.mapInPandas(_local_bottom_k, schema)

    from pyspark.sql import Window

    w = Window.partitionBy(*gcols).orderBy(hcol, icol)
    winners = (
        local.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(*gcols, icol)
    )
    # the equi-join lists its key columns first; restore the caller's order
    return df.join(
        F.broadcast(winners), on=gcols + [icol], how="left_semi"
    ).select(*df.columns)

def systematic_sample(
    seqs: DataFrame,
    stride: int,
    by: str = "source",
    id_col: str = "doc_id",
    weight_col: str = "n_tok",
    offset: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Weighted systematic sample per stratum: lay every stratum's
    documents end-to-end on their cumulative weight axis (ordered by
    ``id_col``) and select each document containing a grid point
    ``k·stride + offset`` — the classic probability-proportional-to-
    size design (a 5k-token doc is 5× likelier in than a 1k one;
    expected draw Σw/stride per stratum, at most one grid point
    apart).  The PPS counterpart of :func:`sample_bottom_k`'s uniform
    hash sample — "sample training docs by token mass, not by count".

    Rides :func:`operators.packing.pack_sequences`' two-phase
    distributed prefix sum (budget = stride), so the global offsets
    need NO driver-side scan and inherit packing's partition-count-
    independence guarantee; selection is then one integer predicate —
    the first grid point ≥ start falls before start + len.  Every
    quantity is int64, so the selected id set is EXACT and any SQL
    engine replaying the same cumsum certifies it byte-for-byte.

    Returns (by, id_col, weight_col, start, grid_k) for selected docs —
    ``grid_k`` the index of the first grid point the doc contains
    (consecutive across a stratum's draw, a free systematic-sample
    self-check).  Zero-weight docs are never selected (they contain
    no axis point)."""
    from repurpose_spark.operators.packing import pack_sequences

    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    if not 0 <= offset < stride:
        raise ValueError("offset must be in [0, stride)")
    packs = pack_sequences(
        seqs,
        budget=stride,
        by=by,
        id_col=id_col,
        len_col=weight_col,
        num_partitions=num_partitions,
    )
    start = F.col("pack_id") * F.lit(stride) + F.col("pack_offset")
    # first grid index k with k·stride + offset ≥ start: integer ceil
    # division — NOT float floor(a/b), which drops exactness past 2^53
    # on a 100-TB token axis.  The dividend is ≥ 0 (offset < stride),
    # so `div` truncation IS floor.
    with_start = packs.withColumn("_start", start.cast("long"))
    k = F.expr(
        f"(_start - {int(offset)} + {int(stride)} - 1) div {int(stride)}"
    ).cast("long")
    sel = (k * F.lit(stride) + F.lit(offset)) < (
        F.col("_start") + F.col(weight_col)
    )
    return with_start.where(sel).select(
        by,
        id_col,
        F.col(weight_col).cast("long").alias(weight_col),
        F.col("_start").alias("start"),
        k.alias("grid_k"),
    )


def priority_key_expr(
    id_col: str, weight_col: str, seed: str
) -> "F.Column":
    """The weighted rank key: u / w ascending, with u a 20-bit integer
    in [1, 2²⁰] parsed from the first 5 hex chars of ``md5(id ⟂
    seed)``.  Ascending u/w is the same total order as descending
    priority w/u (Duffield–Lund–Thorup priority sampling) — ONE
    correctly-rounded IEEE division of exact int64s per row, so any
    SQL engine hashing the same ids ranks identically byte-for-byte."""
    u = (
        F.conv(
            F.substring(sample_hash_expr(id_col, seed), 1, 5), 16, 10
        ).cast("long")
        + 1
    )
    return u.cast("double") / F.col(weight_col).cast("double")


def weighted_priority_sample(
    df: DataFrame,
    key_cols: list,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    seed: str = "",
) -> DataFrame:
    """Deterministic weight-proportional k-row sample per group —
    priority sampling (Duffield/Lund/Thorup, JACM 2007): rank each row
    by u/w with u a content-derived uniform from md5(id‖seed) and keep
    the k smallest per group.  Inclusion probability rises with weight
    (a 5k-token doc outranks a 1k one at the same u), the selection is
    content-stable across runs/partitionings like
    :func:`sample_bottom_k`, and WITHOUT-replacement semantics come
    free (each id appears once).  The weighted counterpart of
    bottom-k's uniform sample and the unordered counterpart of
    ``systematic_sample``'s PPS grid — "sample a review queue by token
    mass, reproducibly".

    Rows with NULL or non-positive weight are excluded by definition.
    Same plan as bottom-k: the corpus is never shuffled — map-side
    (key, id, u/w) projection, per-partition bottom-k heaps, a
    survivors-only global rank, winners broadcast back as a semi-join.
    Ties (identical u/w) break by id.  Returns original rows, all
    columns.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    key_cols = list(key_cols)
    eligible = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    )
    tag = eligible.select(
        *key_cols,
        F.col(id_col),
        priority_key_expr(id_col, weight_col, seed).alias("_h"),
    )
    return _rank_bottom_k(df, tag, key_cols, k, id_col)
