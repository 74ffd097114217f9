"""Per-series preprocess hooks — the F1 UDF surface (SURVEY.md §2.11).

The reference lets users register ``preprocess`` functions applied to
each series' DataFrame before conversion (ts2img.py:284-303, applied
:44-53): fn(pd.DataFrame, **kwargs) -> pd.DataFrame, shape-preserving
or resampling.  The Spark form is a grouped-map ``applyInPandas``: one
pandas frame per series key, Arrow-batched, executed where the series
already lives (the groupBy shuffles on the same keys the tier tables
are partitioned by, so for cell-partitioned input the exchange is
one-sided).

``apply_per_series`` chains hooks exactly like the reference's list
(``preprocess=[f1, f2]``), validating like ts2img.py:45-51 that each
hook is callable.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame


def apply_per_series(
    df: DataFrame,
    hooks: list,
    schema: str,
    key_cols: list = ("doc_id",),
    sort_within: str | None = None,
) -> DataFrame:
    """Run ``hooks`` (list of fn(pdf) -> pdf) per series via applyInPandas.

    ``sort_within``: optional column to sort each series frame by before
    the hooks run (the reference hands hooks a time-sorted frame)."""
    key_cols = list(key_cols)
    for h in hooks:
        if not isinstance(h, Callable):
            raise TypeError(f"preprocess hook {h!r} is not callable")

    def runner(pdf: pd.DataFrame) -> pd.DataFrame:
        if sort_within:
            pdf = pdf.sort_values(sort_within)
        for h in hooks:
            pdf = h(pdf)
        return pdf

    return df.groupBy(*key_cols).applyInPandas(runner, schema)


def apply_batch_hooks(df: DataFrame, hooks: list | None) -> DataFrame:
    """F2 postprocess surface (ts2img.py:304-320: ``postprocess`` funcs
    applied to the finished image batch after conversion).

    Unlike the per-series F1 hooks, these operate on the whole finished
    product: each hook is fn(DataFrame) -> DataFrame, chained — so hooks
    written with pyspark.sql expressions stay plan-level (Catalyst sees
    through them; no Python in the hot path).  Hooks needing pandas can
    still call apply_per_series themselves."""
    out = df
    for h in hooks or []:
        if not isinstance(h, Callable):
            raise TypeError(f"postprocess hook {h!r} is not callable")
        res = h(out)
        if not isinstance(res, DataFrame):
            raise TypeError(
                f"postprocess hook {h!r} must return a DataFrame"
            )
        out = res
    return out
