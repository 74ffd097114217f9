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


def test_extras_disjoint_and_oracled():
    q = set(entry.queries())
    x = entry.extra_queries()
    assert not (set(x) & q)
    # every extra is certified by exactly one oracle kind: an exact
    # value-hash SQL oracle, or an error-bound oracle (estimates that
    # are bounded-but-not-byte-stable by design: the HLL sketch tier
    # and lossy JPEG stats — VERDICT r4 #2's check_entry mode)
    sql_oracled = set(entry.extra_oracle_sql())
    bounded = set(entry.error_bound_oracles())
    assert not (sql_oracled & bounded)
    assert sql_oracled | bounded == set(x)


def test_bench_headline_names_resolve():
    import bench

    combined = {**entry.queries(), **entry.extra_queries()}
    assert set(bench.HEADLINE) <= set(combined)
