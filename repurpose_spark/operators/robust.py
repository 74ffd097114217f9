"""Robust per-series statistics and seasonality over regular tier grids.

Reference analog: repurpose hands each cell's time-sorted series to a
user preprocess/postprocess hook (img2ts.py:652-668, resample step) and
users run exactly this family — rolling smoothers, outlier masks,
seasonal baselines, series-vs-series correlation — in single-node
pandas there.  Here each is a declarative Spark plan over the dense
gap-filled tier grid (1000× smaller than raw by construction), so the
same diagnostics run cluster-wide with one hash exchange per series
key.

Exactness contract (shared with downsample.autocorr / rolling_zscore):
inputs are int64 tier counts/cents, so

* exact interpolated percentiles of int64 are dyadic rationals
  (n.0 / n.5 for the median, quarters for the MAD) — exactly
  representable, engine-independent;
* Pearson moments are exact int64 sums and the final value is ≤3
  correctly-rounded IEEE ops on double-exact integers;
* seasonal means are ONE IEEE division of two exact int64s and the
  residual ONE subtraction of identical doubles.

Every float these operators emit is therefore byte-identical across
engines and partition layouts — certified by the DuckDB oracles in
``__spark_entry__.extra_oracle_sql`` and the pytest suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "rolling_median",
    "mad_flags",
    "cross_corr",
    "seasonal_profile",
    "seasonal_residual",
    "hampel",
    "rolling_corr",
    "seasonal_decompose",
    "theil_sen",
    "trimmed_agg",
    "spearman_corr",
    "max_drawdown",
]


def rolling_median(
    df: DataFrame,
    key_cols: list,
    ts_col: str = "ts",
    value_col: str = "v",
    before: int = 2,
    after: int = 2,
) -> DataFrame:
    """Exact rolling median over a centered row frame — the robust
    twin of the moving average (``ev_moving_avg``): one wild spike
    moves a 5-slot mean by spike/5 but leaves the median untouched.

    Input must be a REGULAR grid (gap-filled tier): a row frame of
    ``before`` preceding / ``after`` following rows IS the time
    window, with no gap aliasing.

    Plan shape: ``percentile`` is an ordinary aggregate, so the frame
    spec rides ONE Window operator — one hash exchange on the series
    keys + one in-partition sort, identical to the moving-average
    plan.  Frame buffering is O(before+after+1) rows per position.
    Edge rows keep their shrunken frame (same as DuckDB's window
    semantics) so the output has no warm-up NULLs.
    """
    key_cols = list(key_cols)
    frame = "rows between {} preceding and {} following".format(
        int(before), int(after)
    )
    med = F.expr(
        "percentile({}, 0.5) over (partition by {} order by {} {})".format(
            value_col, ", ".join(key_cols), ts_col, frame
        )
    )
    return df.select(*key_cols, ts_col, value_col, med.alias("med"))


def mad_flags(
    df: DataFrame,
    key_cols: list,
    ts_col: str = "ts",
    value_col: str = "v",
    k: int = 3,
) -> DataFrame:
    """Median-absolute-deviation outlier mask per series: flag rows
    with ``|x − median| > k · MAD`` — the robust z-score (a z-score
    threshold breaks when the outliers themselves inflate the stddev;
    the breakdown point of the MAD is 50 %).

    Two exact percentile aggregations over the tier grid (per-series
    median, then per-series median of |x − median|), each a ~one-row-
    per-series result broadcast back to the grid — the grid itself
    never shuffles.  ``k`` must be a small integer so ``k · MAD``
    stays a dyadic rational and the flag compare is exact (see module
    docstring).  At raw (non-tier) scale use the KLL sketch tier
    family instead — exact percentiles buffer per-group values.

    Zero-MAD series (≥50 % of slots at the median, common for sparse
    counts) would flag every off-median point; those rows emit
    ``is_outlier = NULL`` to keep the mask honest.
    """
    key_cols = list(key_cols)
    x = F.col(value_col).cast("long")
    med = df.groupBy(*key_cols).agg(
        F.percentile(x, F.lit(0.5)).alias("med")
    )
    dev = df.join(F.broadcast(med), key_cols).select(
        *key_cols,
        ts_col,
        value_col,
        "med",
        F.abs(x - F.col("med")).alias("dev"),
    )
    mad = dev.groupBy(*key_cols).agg(
        F.percentile(F.col("dev"), F.lit(0.5)).alias("mad")
    )
    out = dev.join(F.broadcast(mad), key_cols)
    flag = F.when(
        F.col("mad") > 0, F.col("dev") > F.lit(int(k)) * F.col("mad")
    )
    return out.select(
        *key_cols, ts_col, value_col, "med", "dev", "mad",
        flag.alias("is_outlier"),
    )


def cross_corr(
    df: DataFrame,
    key_cols: list,
    series_col: str,
    a: str,
    b: str,
    ts_col: str = "ts",
    value_col: str = "v",
    lags: tuple = (0, 1, 24),
) -> DataFrame:
    """Lagged cross-correlation between two named series sharing a
    regular grid: ``corr(x_t, y_{t−k})`` for series ``a`` = x and
    ``b`` = y at each lag — "do errors follow clicks, and by how many
    hours?".  The cross-series sibling of ``downsample.autocorr`` (one
    series against its own past); lag 0 is plain Pearson correlation.

    Input must be a REGULAR dense grid (both series gap-filled onto
    the same axis) so ``lag(y, k)`` over (keys, ORDER BY ts) is the
    observation k slots earlier and the (keys, ts) equi-join aligns
    the pair exactly.

    Plan shape: all lag columns ride ONE Window over the b-side
    (single hash exchange + sort), ONE equi-join on (keys, ts) —
    co-partitioned at scale, both sides tier-sized — then ``stack``
    unpivots JVM-side and one partial+final HashAggregate reduces to
    integer moments (O(series × lags) rows).  Exactness: identical to
    autocorr (module docstring) — int64 moments, 3 IEEE ops.
    """
    key_cols = list(key_cols)
    xa = df.where(F.col(series_col) == a).select(
        *key_cols, ts_col, F.col(value_col).cast("long").alias("_x")
    )
    yb = df.where(F.col(series_col) == b).select(
        *key_cols, ts_col, F.col(value_col).cast("long").alias("_y0")
    )
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    lagged = yb.select(
        *key_cols,
        ts_col,
        *[
            F.lag("_y0", int(kk)).over(w).alias(f"_y{kk}")
            for kk in lags
        ],
    )
    joined = xa.join(lagged, key_cols + [ts_col])
    stack_expr = "stack({}, {}) as (lag, _y)".format(
        len(lags), ", ".join(f"{int(kk)}, _y{int(kk)}" for kk in lags)
    )
    pairs = joined.select(*key_cols, "_x", F.expr(stack_expr)).where(
        F.col("_y").isNotNull()
    )
    agg = pairs.groupBy(*key_cols, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    n = F.col("n_pairs")
    num = (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("double")
    va = (n * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
    vb = (n * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast("double")
    xcf = F.when((va > 0) & (vb > 0), num / (F.sqrt(va) * F.sqrt(vb)))
    return agg.select(*key_cols, "lag", "n_pairs", xcf.alias("xcf"))


def seasonal_profile(
    df: DataFrame,
    key_cols: list,
    ts_col: str = "ts",
    value_col: str = "v",
) -> DataFrame:
    """Day-of-week × hour-of-day seasonal baseline per series: the
    mean of every slot sharing the same (weekday, hour) — the
    "seasonal naive" profile every monitoring stack compares against
    before alarming on an absolute level.

    ``dow`` is ISO-Monday=0..Sunday=6 (``F.weekday`` ↔ DuckDB
    ``isodow − 1``).  One partial+final HashAggregate over the tier
    grid; output is O(series × 168) rows.  ``mean_v`` is ONE IEEE
    division of exact int64s — byte-stable.
    """
    key_cols = list(key_cols)
    return (
        df.groupBy(
            *key_cols,
            F.weekday(ts_col).alias("dow"),
            F.hour(ts_col).alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_slots"),
            F.sum(F.col(value_col).cast("long")).alias("sum_v"),
        )
        .select(
            *key_cols,
            "dow",
            "hod",
            "n_slots",
            "sum_v",
            (F.col("sum_v").cast("double") / F.col("n_slots"))
            .alias("mean_v"),
        )
    )


def seasonal_residual(
    df: DataFrame,
    key_cols: list,
    ts_col: str = "ts",
    value_col: str = "v",
) -> DataFrame:
    """Deviation from the seasonal baseline: each grid slot minus its
    series' (weekday, hour) profile mean — the series with weekly and
    daily cycles removed, i.e. what a level-shift or outlier detector
    should actually look at.

    The profile (O(series × 168) rows) broadcasts back onto the grid —
    the grid never shuffles.  ``resid`` is one subtraction of a
    double-exact int from the profile's correctly-rounded mean:
    identical operands → identical result in both engines.
    """
    key_cols = list(key_cols)
    prof = seasonal_profile(df, key_cols, ts_col, value_col)
    grid = df.select(
        *key_cols,
        ts_col,
        F.col(value_col).cast("long").alias(value_col),
        F.weekday(ts_col).alias("dow"),
        F.hour(ts_col).alias("hod"),
    )
    out = grid.join(F.broadcast(prof), key_cols + ["dow", "hod"])
    return out.select(
        *key_cols,
        ts_col,
        value_col,
        "dow",
        "hod",
        "mean_v",
        (F.col(value_col).cast("double") - F.col("mean_v")).alias("resid"),
    )


def hampel(
    df: DataFrame,
    key_cols: list,
    ts_col: str = "ts",
    value_col: str = "v",
    half_width: int = 3,
    k: int = 3,
) -> DataFrame:
    """Hampel despike filter: flag (and repair) grid slots whose
    deviation from the WINDOW median exceeds k times the WINDOW MAD —
    the standard sensor-despiking pass, and the windowed refinement of
    ``mad_flags`` (a global MAD misses spikes riding a trend; the
    Hampel window tracks the local level).

    Pure JVM per row: the frame's values ride ONE ``collect_list``
    over the same window spec as the frame median, deviations are an
    in-row ``transform`` + ``array_sort``, and the array median is an
    index pick — no Python, no second shuffle; the whole operator is
    one hash exchange + one in-partition sort.  O(width) state per
    position, width a small constant by construction.

    Exactness: the frame median of int64 is n.0/n.5, deviations are
    halves, the deviation-array median quarters — all dyadic
    rationals, picked (not estimated) identically by both engines.
    Zero-MAD frames (≥half the window at the median) emit
    ``is_spike = NULL`` and pass through unrepaired — the honest
    shape, matching ``mad_flags``.
    """
    key_cols = list(key_cols)
    part = ", ".join(key_cols)
    frame = "rows between {w} preceding and {w} following".format(
        w=int(half_width)
    )
    over = f"over (partition by {part} order by {ts_col} {frame})"
    x = F.col(value_col).cast("long")
    base = df.select(
        *key_cols,
        ts_col,
        value_col,
        F.expr(f"percentile({value_col}, 0.5) {over}").alias("med"),
        F.expr(f"collect_list({value_col}) {over}").alias("_arr"),
    )
    s = F.array_sort(
        F.transform(
            F.col("_arr"), lambda e: F.abs(e.cast("double") - F.col("med"))
        )
    )
    n = F.size(s)
    odd_pick = F.element_at(s, ((n + F.lit(1)) / 2).cast("int"))
    even_pick = (
        F.element_at(s, (n / 2).cast("int"))
        + F.element_at(s, (n / 2).cast("int") + 1)
    ) / 2
    mad = F.when(n % 2 == 1, odd_pick).otherwise(even_pick)
    staged = base.select(
        *key_cols, ts_col, value_col, "med", mad.alias("mad")
    )
    dev = F.abs(x - F.col("med"))
    flag = F.when(F.col("mad") > 0, dev > F.lit(int(k)) * F.col("mad"))
    return staged.select(
        *key_cols,
        ts_col,
        value_col,
        "med",
        "mad",
        flag.alias("is_spike"),
        F.when(flag, F.col("med"))
        .otherwise(x.cast("double"))
        .alias("repaired"),
    )


def rolling_corr(
    df: DataFrame,
    key_cols: list,
    ts_col: str = "ts",
    x_col: str = "x",
    y_col: str = "y",
    n: int = 48,
) -> DataFrame:
    """Trailing-window Pearson correlation between two columns of the
    same dense grid — the time-local version of ``cross_corr`` at lag
    0 ("rolling beta"): how the click↔error coupling itself drifts.
    Slots whose trailing window is not yet full emit NULL (a shrunken
    window would make early values incomparable across series).

    All five moment sums ride ONE window spec (single exchange +
    in-partition sort); each is an exact int64 over the frame, and
    the per-row correlation is 3 correctly-rounded IEEE ops — the
    autocorr certification applied per frame.  Precondition as there:
    n·Σx² within 2^53.
    """
    key_cols = list(key_cols)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col)
        .rowsBetween(-(int(n) - 1), 0)
    )
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    m = df.select(
        *key_cols,
        ts_col,
        x_col,
        y_col,
        F.count(F.lit(1)).over(w).alias("n_w"),
        F.sum(x).over(w).alias("_sx"),
        F.sum(y).over(w).alias("_sy"),
        F.sum(x * y).over(w).alias("_sxy"),
        F.sum(x * x).over(w).alias("_sxx"),
        F.sum(y * y).over(w).alias("_syy"),
    )
    cnt = F.col("n_w")
    num = (cnt * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("double")
    va = (cnt * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
    vb = (cnt * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast("double")
    r = F.when(
        (cnt == int(n)) & (va > 0) & (vb > 0),
        num / (F.sqrt(va) * F.sqrt(vb)),
    )
    return m.select(
        *key_cols, ts_col, x_col, y_col, "n_w", r.alias("rcorr")
    )


def seasonal_decompose(
    df: DataFrame,
    key_cols: list,
    ts_col: str = "ts",
    value_col: str = "v",
    half_width: int = 12,
) -> DataFrame:
    """Additive STL-lite decomposition of a dense hourly grid:
    ``value = trend + seasonal + resid`` with

    * trend    — centered rolling MEDIAN (±half_width slots): robust
      to the very spikes the residual should expose (classical STL
      uses loess; the median keeps the whole pass exact and JVM-side);
    * seasonal — per-series (ISO-weekday × hour-of-day) mean of the
      detrended series;
    * resid    — what's left; the input to changepoint/outlier passes.

    Exactness via the int-scale trick (rates.py::time_weighted_avg
    family): the trend is a dyadic half, so 2·(value − trend) is an
    EXACT int64; the seasonal mean is sum(detrend2)/(2·count) — int64
    sums are shuffle-order-free, then ONE IEEE division; the residual
    is one subtraction of identical doubles.  Every emitted float is
    byte-stable across engines and partitionings.

    Plan shape: one window exchange (trend) + one O(series × 168)
    profile aggregate broadcast back — the grid shuffles once.
    """
    key_cols = list(key_cols)
    trended = rolling_median(
        df, key_cols, ts_col, value_col,
        before=int(half_width), after=int(half_width),
    ).withColumnRenamed("med", "trend")
    v = F.col(value_col).cast("long")
    g = trended.select(
        *key_cols,
        ts_col,
        value_col,
        "trend",
        (F.lit(2) * (v.cast("double") - F.col("trend")))
        .cast("long")
        .alias("_d2"),
        F.weekday(ts_col).alias("dow"),
        F.hour(ts_col).alias("hod"),
    )
    prof = g.groupBy(*key_cols, "dow", "hod").agg(
        F.sum("_d2").alias("_s2"), F.count(F.lit(1)).alias("_n")
    )
    seasonal = (
        F.col("_s2").cast("double") / (F.lit(2) * F.col("_n"))
    ).alias("seasonal")
    out = g.join(
        F.broadcast(prof.select(*key_cols, "dow", "hod", seasonal)),
        key_cols + ["dow", "hod"],
    )
    detrend = F.col("_d2").cast("double") / 2
    return out.select(
        *key_cols,
        ts_col,
        value_col,
        "trend",
        "seasonal",
        (detrend - F.col("seasonal")).alias("resid"),
    )


def theil_sen(
    df: DataFrame,
    key_cols: list,
    ts_col: str = "t",
    value_col: str = "v",
    max_points: int = 4096,
) -> DataFrame:
    """Theil–Sen robust trend (Sen 1968): per series, the slope is the
    LOWER MEDIAN (exact order statistic, index ⌊(m−1)/2⌋ of the sorted
    multiset — no interpolation) of all pairwise slopes
    (v_j − v_i)/(t_j − t_i) over i<j with t_i ≠ t_j, and the intercept
    is the lower median of the residuals v_i − slope·t_i.  Breakdown
    point ~29 %: a third of the points can be arbitrarily wrong before
    the trend moves — the robust twin of the OLS trend, paired with
    ``hampel``/``mad_flags`` for tier-drift monitoring.

    EXACT certification: ``ts_col`` and ``value_col`` must be exact
    integers (day index / tier cents).  Every slope is ONE IEEE
    division of exact-int doubles; each residual is one multiply + one
    subtract in that order; lower medians pick elements, never average
    — so slope and intercept are byte-identical across engines
    (DuckDB twin: a rank self-join + ``quantile_disc(…, 0.5)``, which
    this module's pytest probes to be exactly the lower median).

    Scale shape: pairwise O(n²) per series is intentional and BOUNDED —
    run on a rollup tier (daily: n ≈ 365 → 66k pairs in one numpy
    outer-difference), never raw points; series longer than
    ``max_points`` raise rather than silently quadratic-blow-up.  One
    hash exchange on the series keys; one Arrow batch per series.
    """
    import numpy as np
    import pandas as pd

    key_cols = list(key_cols)
    sel = df.select(*key_cols, ts_col, value_col)
    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.select(*key_cols).schema.fields
    )
    schema = (
        key_fields
        + ", slope double, icpt double, n_pts bigint, n_pairs bigint"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > max_points:
            raise ValueError(
                "theil_sen: series of {} points exceeds max_points={} — "
                "run on a rollup tier, not raw points".format(n, max_points)
            )
        t = pdf[ts_col].to_numpy(dtype=np.int64)
        v = pdf[value_col].to_numpy(dtype=np.int64)
        order = np.argsort(t, kind="stable")
        t, v = t[order], v[order]
        i, jdx = np.triu_indices(n, 1)
        dt = t[jdx] - t[i]
        keep = dt != 0
        dt = dt[keep].astype(np.float64)
        dv = (v[jdx] - v[i])[keep].astype(np.float64)
        m = dt.size
        row = {k: pdf[k].iloc[0] for k in key_cols}
        if m == 0:
            row.update(slope=None, icpt=None, n_pts=n, n_pairs=0)
            return pd.DataFrame([row])
        slopes = np.sort(dv / dt)
        slope = slopes[(m - 1) // 2]
        resid = np.sort(v.astype(np.float64) - slope * t.astype(np.float64))
        icpt = resid[(n - 1) // 2]
        row.update(slope=slope, icpt=icpt, n_pts=n, n_pairs=m)
        return pd.DataFrame([row])

    return sel.groupBy(*key_cols).applyInPandas(fn, schema=schema)

def trimmed_agg(
    df: DataFrame,
    *,
    by: list | tuple,
    value_col: str,
    tie_cols: list | tuple = (),
    trim_frac: float = 0.1,
) -> DataFrame:
    """Rank-trimmed per-group aggregate: drop the ``⌊n·trim_frac⌋``
    lowest AND highest rows of each group (counted by rank, ties
    broken deterministically by ``tie_cols``) and aggregate what
    survives — the heavy-tail-proof rollup tier (a sensor stuck at
    MAX_INT or a bot burst moves a plain mean arbitrarily; it cannot
    move a 10 %-trimmed one).  Reference analog: the same robust-hook
    family as :func:`hampel` (img2ts.py resample preprocess hooks);
    trimming-by-count rather than by percentile VALUE keeps the
    semantics integer-exact — no interpolation, no float thresholds.

    Returns (by…, n_total, n_kept, sum_kept, min_kept, max_kept) —
    all int64-exact when ``value_col`` is integral, so the oracle is
    EXACT.  Groups with n ≤ 2·k keep nothing and report n_kept = 0
    with NULL aggregates (the window frame is empty, not absent).

    Plan: ONE shuffle on ``by``; ascending row_number + per-group
    count over the same window partition (a single sort — Catalyst
    collapses same-partition windows), filter k < rn ≤ n − k, one
    partial+final hash aggregate.  The descending rank is derived as
    n − rn + 1 instead of a second window sort."""
    by = list(by)
    tie = list(tie_cols)
    if not 0 <= trim_frac < 0.5:
        raise ValueError("trim_frac must be in [0, 0.5)")
    w = Window.partitionBy(*by).orderBy(F.col(value_col).asc(), *tie)
    w_all = Window.partitionBy(*by)
    k = F.floor(F.col("_n") * F.lit(float(trim_frac))).cast("long")
    ranked = df.select(
        *by,
        F.col(value_col),
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(w_all).alias("_n"),
    )
    kept = F.when(
        (F.col("_rn") > k) & (F.col("_rn") <= F.col("_n") - k), F.col(value_col)
    )
    return ranked.groupBy(*by).agg(
        F.max("_n").alias("n_total"),
        F.count(kept).alias("n_kept"),
        F.sum(kept).alias("sum_kept"),
        F.min(kept).alias("min_kept"),
        F.max(kept).alias("max_kept"),
    )

def spearman_corr(
    df: DataFrame,
    *,
    by: list | tuple,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Spearman rank correlation per group — Pearson's outlier-proof
    sibling: one stuck-counter spike saturates a Pearson coefficient
    on heavy-tailed tier counts; ranks cap its leverage at 1/n (the
    same robustness family as :func:`hampel` / :func:`theil_sen`).

    Exactness discipline: the average rank of a tied value is
    ``rank_min + (ties − 1)/2`` — a half-integer — so both engines
    compute DOUBLED ranks ``2·rank_min + ties − 1`` (exact int64),
    push them through the identical five-moment sums as
    :func:`cross_corr`, and finish with the same ≤4 correctly-rounded
    IEEE ops (two sqrt, one multiply, one divide) on double-exact
    integers: byte-identical across engines and partition layouts,
    certified EXACT.  Doubling cancels in the correlation (it scales
    x and y linearly).

    Plan: two rank windows + two tie-count windows (tier-sized
    frames), one partial+final moment aggregate.  Groups where either
    side is constant (zero rank variance) yield NULL."""
    by = list(by)
    out_cols = [*by]

    def _r2(col):
        w_rank = Window.partitionBy(*by).orderBy(F.col(col).asc())
        w_tie = Window.partitionBy(*by, col)
        return (
            F.lit(2) * F.rank().over(w_rank)
            + F.count(F.lit(1)).over(w_tie)
            - F.lit(1)
        ).cast("long")

    ranked = df.select(*by, _r2(x_col).alias("_x"), _r2(y_col).alias("_y"))
    agg = ranked.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    n = F.col("n_pairs")
    num = (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("double")
    va = (n * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
    vb = (n * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast("double")
    rho = F.when((va > 0) & (vb > 0), num / (F.sqrt(va) * F.sqrt(vb)))
    return agg.select(*out_cols, "n_pairs", rho.alias("spearman_rho"))


def max_drawdown(
    df: DataFrame,
    *,
    by: list | tuple,
    ts_col: str = "ts",
    value_col: str = "v",
    tie_cols: list | tuple = (),
) -> DataFrame:
    """Peak-to-trough drawdown of each group's CUMULATIVE series —
    "how far below its high-water mark did this counter/balance/token
    budget fall, at worst" (net-flow monitoring: ingest minus
    eviction, quota credit minus burn).  The ordered-scan sibling of
    :func:`counter_increase`-style rate analysis.

    One shuffle on ``by``, ONE window sort by (ts, ties): running sum,
    running max of the running sum, their difference, then a single
    partial+final aggregate.  Every quantity is int64 end to end —
    EXACT.  Returns (by…, n_points, final_v, peak_v, max_drawdown)."""
    by = list(by)
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_col, *tie_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col(value_col).cast("long")).over(w)
    scanned = df.select(
        *by,
        F.col(value_col).cast("long").alias("_v"),
        cum.alias("_cum"),
        F.max(cum).over(w).alias("_peak"),
    )
    return scanned.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("_v").alias("final_v"),
        F.max("_cum").alias("peak_v"),
        F.max(F.col("_peak") - F.col("_cum")).alias("max_drawdown"),
    )


def mann_kendall(
    df: DataFrame,
    key_cols: list,
    ts_col: str = "t",
    value_col: str = "v",
    max_points: int = 4096,
) -> DataFrame:
    """Mann–Kendall trend test (Mann 1945 / Kendall 1975) — the
    non-parametric IS-there-a-trend significance companion of
    :func:`theil_sen`'s HOW-steep estimate (the pair hydrology and
    climate monitoring always run together): S = Σ_{i<j} sgn(v_j − v_i)
    over the time-ordered series, variance with the tie correction
    Var·18 = n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5), and the
    continuity-corrected normal score z = (S ∓ 1)/√Var.

    EXACT certification: inputs must be exact integers (tier cents /
    counts), so S and Var·18 are exact int64; z is division → sqrt →
    division, all correctly-rounded IEEE ops on identical inputs —
    byte-stable (sqrt IS correctly rounded, unlike ln/exp).  The
    DuckDB twin replays the O(n²) sign sum as a self-join and the same
    three float ops.

    Scale shape: same bounded-series contract as theil_sen — O(n²)
    pairs per series on a ROLLUP tier (daily: n ≈ 365 → 66k sign pairs
    in one numpy outer-difference), never raw points; > ``max_points``
    raises.  One hash exchange on the series keys, one Arrow batch per
    series.  Returns (keys…, n_pts, s, var18, z): z NULL when Var = 0
    (n < 2 or all values tied), 0.0 when S = 0.
    """
    import numpy as np
    import pandas as pd

    key_cols = list(key_cols)
    sel = df.select(*key_cols, ts_col, value_col)
    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.select(*key_cols).schema.fields
    )
    schema = key_fields + ", n_pts bigint, s bigint, var18 bigint, z double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > max_points:
            raise ValueError(
                "mann_kendall: series of {} points exceeds max_points={} — "
                "run on a rollup tier, not raw points".format(n, max_points)
            )
        order = np.argsort(pdf[ts_col].to_numpy(dtype=np.int64), kind="stable")
        v = pdf[value_col].to_numpy(dtype=np.int64)[order]
        i, j = np.triu_indices(n, 1)
        s = int(np.sign(v[j] - v[i]).sum())
        _, tie = np.unique(v, return_counts=True)
        t = tie.astype(np.int64)
        var18 = int(n * (n - 1) * (2 * n + 5) - (t * (t - 1) * (2 * t + 5)).sum())
        row = {k: pdf[k].iloc[0] for k in key_cols}
        if var18 <= 0:
            z = None
        elif s == 0:
            z = 0.0
        else:
            # identical op order to the SQL twin: /18 → sqrt → divide
            z = float((s - 1 if s > 0 else s + 1) / np.sqrt(var18 / 18.0))
        row.update(n_pts=n, s=s, var18=var18, z=z)
        return pd.DataFrame([row])

    return sel.groupBy(*key_cols).applyInPandas(fn, schema=schema)
