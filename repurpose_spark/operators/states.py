"""State-sequence analytics: run-length islands and Markov transitions.

A tokenized-event stream (event types per user, status codes per cell,
quantized sensor levels per series) carries structure in its ORDER that
the bucketed rollup tiers cannot see.  Two classic order-aware views:

* :func:`state_runs` — gaps-and-islands run-length encoding: collapse
  each key's ordered stream into maximal runs of an unchanged state
  with start/end timestamps and length.  The monitoring question it
  answers: "how long do sessions stay in state X, and when did each
  stint start" — and it IS the run-length compression tier for
  low-cardinality state streams (the categorical sibling of the
  Gorilla/delta numeric codecs in ``functions/gorilla.py``).
* :func:`transition_matrix` — the first-order Markov view: counts and
  row-normalized probabilities of ``state → next state`` transitions.
  Training-data relevance: behavioral fingerprinting of event streams,
  template/bot detection (a scripted agent's transition rows are
  near-degenerate), and sequence-model sanity baselines (a first-order
  model's perplexity bound before training anything).

Reference analog: repurpose reorients point streams into per-cell
ordered series precisely so downstream code can reason about
consecutive observations (``src/repurpose/img2ts.py`` orthogonal
time-series layout); these operators are consumers of that ordering
contract over the events/tokens domain.

Determinism contract: run ids, counts, and transition counts are exact
int64 under the caller's (ts, tie) total order; probabilities are ONE
correctly-rounded IEEE division of exact int64s — byte-stable across
engines and partitionings, certified EXACT.

Scale shape: one hash exchange on the sequence key feeds the lag/sum
windows (one sort); the run/transition aggregates reuse that
partitioning (Spark's subset-clustering rule plans no second exchange
for ``groupBy(key, run_id)``), and the transition matrix's global
aggregate exchanges only |states|²-sized partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def state_runs(
    df: DataFrame,
    key_cols: list,
    ts_col: str = "ts",
    state_col: str = "state",
    tie_cols: list | tuple = (),
) -> DataFrame:
    """Maximal runs of an unchanged state per key (gaps-and-islands).

    Under the (ts, ties) total order within each key, a new run opens
    at the first row and wherever the state differs from its
    predecessor; ``run_id`` numbers runs from 1 in time order.
    Returns (keys…, run_id, state, n, start_ts, end_ts) — one row per
    island, exact int64 counts, timestamps straight from the input.

    NULL states: a NULL row always opens a new run (SQL inequality
    with NULL is not-true in both engines — documented, and the
    driver's event streams carry no NULL states).
    """
    key_cols = list(key_cols)
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *tie_cols)
    prev = F.lag(state_col).over(w)
    change = F.when(
        prev.isNull() | ~(prev == F.col(state_col)), F.lit(1)
    ).otherwise(F.lit(0))
    run = (
        df.select(*key_cols, ts_col, state_col, *tie_cols)
        .withColumn("_chg", change)
        .withColumn(
            "run_id",
            F.sum("_chg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return run.groupBy(*key_cols, "run_id", state_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
    )


def transition_matrix(
    df: DataFrame,
    seq_cols: list,
    ts_col: str = "ts",
    state_col: str = "state",
    tie_cols: list | tuple = (),
    by: list | tuple = (),
) -> DataFrame:
    """First-order transition counts and probabilities.

    Sequences are ordered within ``seq_cols`` by (ts, ties); each
    consecutive pair contributes one (from_state, to_state) transition.
    ``by`` optionally stratifies the matrix (e.g. per source); it must
    be constant within a sequence (taken from the LATER row of the
    pair).  Returns (by…, from_state, to_state, n, p) with
    ``p = n / Σ n over (by…, from_state)`` — the row-normalized Markov
    kernel.  Counts int64, ``p`` one IEEE division — EXACT.
    """
    seq_cols = list(seq_cols)
    by = list(by)
    w = Window.partitionBy(*seq_cols).orderBy(ts_col, *tie_cols)
    pairs = (
        df.select(*seq_cols, ts_col, state_col, *tie_cols, *by)
        .withColumn("from_state", F.lag(state_col).over(w))
        .where(F.col("from_state").isNotNull())
        .select(*by, "from_state", F.col(state_col).alias("to_state"))
    )
    counts = pairs.groupBy(*by, "from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_row = Window.partitionBy(*by, "from_state")
    return counts.select(
        *by,
        "from_state",
        "to_state",
        "n",
        (
            F.col("n").cast("double") / F.sum("n").over(w_row).cast("double")
        ).alias("p"),
    )


def availability(
    dense: DataFrame,
    key_cols: list,
    ts_col: str = "tick",
    up_col: str = "up",
) -> DataFrame:
    """Availability / SLA rollup per key over a DENSE regular grid —
    the composition showcase: ``gap_fill`` densifies the tier,
    ``up_col`` (boolean) marks live ticks, :func:`state_runs` finds the
    outage islands, and one aggregate per key answers the four
    questions an SLA report asks: how many ticks were up, what share,
    how many distinct outages, and how long (and when) was the worst
    one.

    Everything is exact: tick counts and run lengths int64,
    availability ONE IEEE division, and the worst outage's start is
    the MIN start among down-runs of maximal length (earliest-wins tie
    rule — an arg-max by a total order, not a float compare).  Plan:
    state_runs' one corpus exchange + sort; the SLA aggregate and the
    worst-outage semi-aggregate ride the run frame (runs ≤ ticks, and
    outage runs are far fewer).

    Returns (keys…, n_ticks, n_up, n_down, availability, n_outages,
    longest_down, longest_down_start); keys that never go down report
    0 / NULL for the outage columns.
    """
    key_cols = list(key_cols)
    runs = state_runs(
        dense, key_cols, ts_col=ts_col, state_col=up_col
    )
    down = F.when(~F.col(up_col), F.col("n"))
    agg = runs.groupBy(*key_cols).agg(
        F.sum("n").alias("n_ticks"),
        F.coalesce(F.sum(F.when(F.col(up_col), F.col("n"))), F.lit(0)).alias(
            "n_up"
        ),
        F.coalesce(F.sum(down), F.lit(0)).alias("n_down"),
        F.coalesce(
            F.sum(F.when(~F.col(up_col), F.lit(1))), F.lit(0)
        ).alias("n_outages"),
        F.max(down).alias("longest_down"),
    )
    worst_start = (
        runs.where(~F.col(up_col))
        .groupBy(*key_cols, "n")
        .agg(F.min("start_ts").alias("_ws"))
        .withColumnRenamed("n", "_wn")
    )
    # join on keys AND longest_down = run length of the worst run
    out = agg.alias("a").join(
        F.broadcast(worst_start).alias("w"),
        on=[F.col(f"a.{k}") == F.col(f"w.{k}") for k in key_cols]
        + [F.col("a.longest_down") == F.col("w._wn")],
        how="left",
    ).select(
        *[F.col(f"a.{k}") for k in key_cols],
        "a.n_ticks",
        "a.n_up",
        "a.n_down",
        (
            F.col("a.n_up").cast("double") / F.col("a.n_ticks").cast("double")
        ).alias("availability"),
        "a.n_outages",
        "a.longest_down",
        F.col("w._ws").alias("longest_down_start"),
    )
    return out
