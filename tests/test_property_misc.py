"""Property fuzzes for chunking and gap-fill against pure-python
references (same strategy that caught the packing offset-0 edge)."""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from repurpose_spark.operators.gapfill import gap_fill
from repurpose_spark.operators.packing import chunk_documents

texts = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FA),
        max_size=120,
    ),
    min_size=1,
    max_size=12,
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=texts, size=st.sampled_from([1, 5, 32]),
       stride=st.sampled_from([None, 1, 4, 40]))
def test_chunk_documents_fuzz(spark, docs, size, stride):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (
            r["chunk_start"], r["chunk_len"], r["chunk"]
        )
        for r in chunk_documents(df, size, stride=stride).collect()
    }
    step = stride or size
    expect = {}
    for i, t in enumerate(docs):
        starts = list(range(0, max(len(t), 1), step))
        for k, s in enumerate(starts):
            c = t[s:s + size]
            expect[(i, k)] = (s, len(c), c)
    assert got == expect


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # key
            st.integers(min_value=0, max_value=40),  # hour offset
        ),
        min_size=1,
        max_size=25,
        unique=True,
    ),
    bounds=st.sampled_from([(None, None), (-3, None), (None, 45), (-3, 45)]),
)
def test_gap_fill_fuzz(spark, obs, bounds):
    base = dt.datetime(2021, 6, 1)
    rows = [
        (f"k{k}", base + dt.timedelta(hours=h), (k + 1) * 100 + h)
        for k, h in obs
    ]
    df = spark.createDataFrame(rows, "key string, tick timestamp, v long")
    s, e = bounds
    start = base + dt.timedelta(hours=s) if s is not None else None
    end = base + dt.timedelta(hours=e) if e is not None else None
    dense = gap_fill(
        df, "hour", key_cols=["key"], start=start, end=end,
        fill_values={"v": -1},
    )
    got = {
        (r["key"], r["tick"]): r["v"] for r in dense.collect()
    }
    lo = start if start is not None else min(r[1] for r in rows)
    hi = end if end is not None else max(r[1] for r in rows)
    keys = {f"k{k}" for k, _ in obs}
    vals = {(k, t): v for k, t, v in rows}
    expect = {}
    t = lo
    while t <= hi:
        for k in keys:
            expect[(k, t)] = vals.get((k, t), -1)
        t += dt.timedelta(hours=1)
    assert got == expect


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),     # key
            st.integers(min_value=0, max_value=7200),  # obs offset sec
            st.integers(min_value=0, max_value=99),    # value
        ),
        min_size=1,
        max_size=30,
    ),
    ticks=st.one_of(
        st.just(list(range(0, 7201, 600))),            # regular
        st.lists(
            st.integers(min_value=0, max_value=7200),
            min_size=2, max_size=12, unique=True,
        ).map(sorted),                                  # irregular
    ),
    tol=st.sampled_from([None, 60, 450, 3600]),
    strategy=st.sampled_from(["auto", "array", "binned"]),
)
def test_collocate_fuzz_all_strategies(spark, obs, ticks, tol, strategy):
    """As-of collocation fuzz: every strategy must match the pure-python
    reference on random irregular axes, observations, and tolerances.

    Pinned reference semantics (collocate.py docstring; pandas reindex
    bfill oracle in test_collocate.py): each obs generates up to TWO
    candidates — the tick it sits exactly on (delta 0, an exact match
    does not consume the fill limit) and the greatest strictly-earlier
    tick when within tolerance; earliest obs wins a slot."""
    from repurpose_spark.operators.collocate import (
        collocate,
        max_gap_seconds,
    )

    base = dt.datetime(2021, 6, 1)
    rows = [
        (f"k{k}", base + dt.timedelta(seconds=s), v) for k, s, v in obs
    ]
    df = spark.createDataFrame(rows, "doc_id string, obs_ts timestamp, v long")
    axis = [base + dt.timedelta(seconds=t) for t in ticks]
    got = {
        (r["doc_id"], r["tick"]): (
            r["timedelta_seconds"], r["obs_ts"], r["v"]
        )
        for r in collocate(
            df, axis, ts_col="obs_ts", tolerance_seconds=tol,
            strategy=strategy,
        ).collect()
    }
    eff_tol = tol if tol is not None else max_gap_seconds(ticks)
    best = {}
    tick_set = set(ticks)
    for k, s, v in obs:
        cands = []
        if s in tick_set:
            cands.append((s, 0))  # exact hit: does not consume the limit
        prev = [t for t in ticks if t < s]
        if prev and s - max(prev) <= eff_tol:
            cands.append((max(prev), s - max(prev)))
        for t, d in cands:
            key = (f"k{k}", t)
            entry = (s, d, v)  # earliest obs wins, then delta, then value
            if key not in best or entry < best[key]:
                best[key] = entry
    expect = {
        (k, base + dt.timedelta(seconds=t)): (
            float(e[1]), base + dt.timedelta(seconds=e[0]), e[2]
        )
        for (k, t), e in best.items()
    }
    assert got == expect


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),
            st.lists(
                st.integers(min_value=0, max_value=50256),
                min_size=1,
                max_size=40,
            ),
            st.sampled_from(["web", "code"]),
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t[0],
    ),
    parts=st.sampled_from([1, 5]),
)
def test_reorient_roundtrip_fuzz(spark, docs, parts):
    """North-rule invariant under fuzz: per-row token-array equality
    after reorientation there and back, under any repartitioning
    (duplicate token values, singleton docs, ragged lengths)."""
    from repurpose_spark.config import EngineConfig
    from repurpose_spark.operators.reorient import (
        points_to_sequences,
        sequences_to_points,
    )

    cfg = EngineConfig(n_cells=4)
    rows = [
        (f"d{i:04d}", toks, len(toks), src) for i, toks, src in docs
    ]
    seqs = spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    pts = sequences_to_points(seqs, cfg).repartition(parts)
    back = points_to_sequences(pts, cfg)
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
        for r in back.collect()
    }
    expect = {d: (t, n, s) for d, t, n, s in rows}
    assert got == expect


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),        # key
            st.integers(min_value=0, max_value=60 * 60 * 72),  # sec offset
            st.integers(min_value=-50, max_value=50256),  # value
        ),
        min_size=1,
        max_size=40,
    ),
)
def test_rollup_partials_fuzz(spark, pts):
    """Core continuous-aggregate invariant under fuzz: re-aggregating
    hourly partials into daily equals rolling raw points up to daily
    directly (counts, sums, mins, maxes), for random sparse timestamps
    spanning day boundaries and negative values."""
    from repurpose_spark.operators.rollup import (
        rollup,
        rollup_from_partials,
    )

    base = dt.datetime(2022, 3, 1)
    rows = [
        (0, f"k{k}", base + dt.timedelta(seconds=s), v) for k, s, v in pts
    ]
    df = spark.createDataFrame(
        rows, "cell_id int, doc_id string, ts timestamp, token int"
    )
    cols = ["cell_id", "doc_id", "tick", "n_points", "sum_v", "min_v", "max_v"]

    def key(d):
        return sorted(tuple(r) for r in d.select(*cols).collect())

    hourly = rollup(df, "hour")
    assert key(rollup_from_partials(hourly, "day")) == key(rollup(df, "day"))


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    series=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # doc
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=10000),  # tick hour
                    st.integers(min_value=-(2**40), max_value=2**40),  # iv
                    st.floats(
                        min_value=-1e12,
                        max_value=1e12,
                        allow_nan=False,
                        allow_infinity=False,
                    ),  # fv
                ),
                min_size=1,
                max_size=20,
                unique_by=lambda t: t[0],
            ),
        ),
        min_size=1,
        max_size=4,
        unique_by=lambda t: t[0],
    ),
)
def test_encode_decode_roundtrip_fuzz(spark, series):
    """S9 cube export under fuzz: Gorilla DoD (ints) + XOR (floats)
    streams round-trip bit-exactly for random irregular tick axes, huge
    ints, and arbitrary doubles."""
    from repurpose_spark.operators.encode import (
        decode_series,
        encode_series,
    )

    base = dt.datetime(2020, 1, 1)
    rows = [
        (1, f"d{doc}", base + dt.timedelta(hours=h), iv, fv)
        for doc, pts in series
        for h, iv, fv in pts
    ]
    df = spark.createDataFrame(
        rows,
        "cell_id int, doc_id string, tick timestamp, iv long, fv double",
    )
    packed = encode_series(df, int_cols=["iv"], float_cols=["fv"])
    back = decode_series(packed, int_cols=["iv"], float_cols=["fv"])
    got = sorted(tuple(r) for r in back.select(*df.columns).collect())
    expect = sorted(rows)
    assert got == expect
