"""Driver-contract registry invariants (no Spark session needed):
queries() must hold EXACTLY 50 entries (the driver certifies the first
50 in dict order — r2 shipped 61 and positions 51-61 went ungraded),
every entry must have an oracle, and the extras registry must be
disjoint with its own oracles."""

import __spark_entry__ as entry


def test_queries_window_is_exactly_50():
    assert len(entry.queries()) == 50


def test_every_query_has_an_oracle():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) == set(q)


# extras deliberately certified rows-only: sketch estimates are
# error-bounded, not byte-stable (rollup.py determinism caveat), so a
# value-hash oracle is impossible by design — pytest carries the
# correctness burden instead (test_rollup.py)
ROWS_ONLY_EXTRAS = {"ev_daily_uniques_sketch"}


def test_extras_disjoint_and_oracled():
    q = set(entry.queries())
    x = entry.extra_queries()
    assert not (set(x) & q)
    assert set(entry.extra_oracle_sql()) == set(x) - ROWS_ONLY_EXTRAS


def test_bench_headline_names_resolve():
    import bench

    combined = {**entry.queries(), **entry.extra_queries()}
    assert set(bench.HEADLINE) <= set(combined)
