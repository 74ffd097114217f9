"""Deterministic synthetic ``sequences`` table.

Closed-form generation (FIXTURES.md §1), mirroring the reference's
formula-data test technique (/root/reference/tests/test_img2ts.py:62-67):

    doc_id = f"doc{i:08d}"
    n_tok  = 64 + (i % 193)
    tokens = [(i*31 + j*7) % 50257 for j in range(n_tok)]
    source = ["web","books","code","wiki"][i % 4]

Generated **distributedly** with ``spark.range`` + built-in array functions
(transform over sequence) — no driver-side materialization, no Python UDF —
so the same code generates 10^3 or 10^12 rows; only ``n`` changes.

``skew`` mode makes every 101st doc *giant* (n_tok += 16384, ~100x the
median).  Under hash bucketing (cell_id = xxhash64(doc_id) % n_cells) a
hot cell arises exactly this way — one enormous series, not many small
ones — and a doc_id-level salt cannot split it; the salting path must use
a within-series fine column (``pos``), which is what
operators/skew.py::salt_for(fine_col='pos') exercises (SURVEY.md §7.1
step 6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = 50257


def synth_sequences(
    spark: SparkSession,
    n: int,
    skew: bool = False,
    numPartitions: int | None = None,
) -> DataFrame:
    """Distributed closed-form sequences table (doc_id, tokens, n_tok, source)."""
    df = spark.range(0, n, 1, numPartitions=numPartitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    n_tok = (F.lit(64) + (i % 193)).cast("int")
    if skew:
        # every 101st doc is giant → a few hot cells via single huge series
        n_tok = F.when(i % 101 == 0, n_tok + 16384).otherwise(n_tok).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda j: ((i * 31 + j.cast("long") * 7) % VOCAB).cast("int"),
    )
    source = F.element_at(
        F.array(F.lit("web"), F.lit("books"), F.lit("code"), F.lit("wiki")),
        (i % 4).cast("int") + 1,
    )
    doc_id = F.format_string("doc%08d", i)
    return df.select(
        doc_id.alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        source.alias("source"),
    )


def synth_sequences_pandas(n: int) -> pd.DataFrame:
    """Single-process twin of :func:`synth_sequences` for the numpy oracle."""
    i = np.arange(n, dtype=np.int64)
    n_tok = (64 + (i % 193)).astype(np.int32)
    rows = []
    for ii, nt in zip(i, n_tok):
        j = np.arange(nt, dtype=np.int64)
        rows.append(((ii * 31 + j * 7) % VOCAB).astype(np.int32))
    return pd.DataFrame(
        {
            "doc_id": [f"doc{ii:08d}" for ii in i],
            "tokens": rows,
            "n_tok": n_tok,
            "source": [["web", "books", "code", "wiki"][ii % 4] for ii in i],
        }
    )
