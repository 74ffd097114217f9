"""Similarity search over embedding columns (array<float>).

* ``cosine_scores`` / ``brute_force_topk`` — exact baseline: JVM
  zip_with/aggregate dot products against a broadcast query vector.
* ``lsh_topk`` — scale path: random-hyperplane LSH buckets (signed dot
  products against deterministic seed planes) so candidates come from an
  equi-join on the bucket signature instead of a full scan; exact cosine
  re-rank inside buckets.

All arithmetic is double-precision, accumulated in index order, so the
DuckDB oracle (list_dot_product over DOUBLE[]) reproduces scores exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_scores(
    emb: DataFrame,
    query_vec: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact cosine of every row against a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    return emb.select(
        F.col(id_col), F.round(sim, round_to).alias("cosine")
    )


def brute_force_topk(
    emb: DataFrame, query_vec: list, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: scores then a global ordered limit (Spark plans this
    as per-partition TakeOrdered + final merge — no full sort)."""
    return (
        cosine_scores(emb, query_vec, id_col, vec_col)
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_signature(vec_col: str, dim: int, n_planes: int = 16, seed: int = 7):
    """Random-hyperplane signature as a long (bit b = sign of dot with
    plane b) — deterministic planes, JVM-evaluated."""
    planes = _hyperplanes(dim, n_planes, seed)
    sig = F.lit(0).cast("long")
    for b in range(n_planes):
        pl = F.array(*[F.lit(float(x)) for x in planes[b]])
        bit = F.when(_dot(F.col(vec_col), pl) >= 0, F.lit(1)).otherwise(F.lit(0))
        sig = sig.bitwiseOR(F.shiftleft(bit.cast("long"), b))
    return sig


def lsh_topk(
    emb: DataFrame,
    query_vec: list,
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """ANN top-k: scan only rows whose LSH bucket matches the query's.

    At cluster scale the signature is precomputed and the table is
    partitioned by it, turning the query into a partition-pruned scan;
    here the bucket filter is applied inline."""
    dim = dim or len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qsig = 0
    for b in range(n_planes):
        if float(planes[b] @ qv) >= 0:
            qsig |= 1 << b
    bucketed = emb.withColumn(
        "__sig", lsh_signature(vec_col, dim, n_planes, seed)
    ).where(F.col("__sig") == qsig)
    return brute_force_topk(bucketed.drop("__sig"), query_vec, k, id_col, vec_col)
