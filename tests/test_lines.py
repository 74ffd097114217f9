"""Cross-corpus duplicate-line removal (operators/lines.py) vs a plain
Python replay of the C4-style rule."""

import pytest

from repurpose_spark.operators.lines import (
    boilerplate_lines,
    remove_boilerplate_lines,
)


def _replay(rows, min_docs=2):
    """Reference implementation: dict replay of the exact semantics."""
    from collections import defaultdict

    key_docs = defaultdict(set)
    for doc_id, text in rows:
        for line in text.split("\n"):
            k = line.strip().lower()
            if k:
                key_docs[k].add(doc_id)
    hot = {k for k, d in key_docs.items() if len(d) >= min_docs}
    out = {}
    for doc_id, text in rows:
        lines = text.split("\n")
        kept = [l for l in lines if l.strip().lower() not in hot]
        out[doc_id] = (
            "\n".join(kept),
            len(lines),
            len(lines) - len(kept),
        )
    return out


ROWS = [
    (1, "Cookie Banner\nunique body one\nCopyright ACME"),
    (2, "cookie banner  \nunique body two\ncopyright acme"),
    (3, "unique body three\nsolo line\n\n  \nsolo line"),
    (4, "Cookie Banner\nCookie Banner\nunique body four"),
    (5, ""),
    (6, "cookie banner"),
]


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text_clean"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate_lines(df, **kw).collect()
    }
    return got


def test_matches_replay(spark):
    got = _run(spark, ROWS)
    assert got == _replay(ROWS)


def test_semantics_pinned(spark):
    got = _run(spark, ROWS)
    # case/whitespace-insensitive matching removes both banner variants
    assert got[1] == ("unique body one", 3, 2)
    assert got[2] == ("unique body two", 3, 2)
    # within-doc repetition alone is NOT boilerplate ('solo line' only
    # appears in doc 3); blank lines never count as hot and are kept
    assert got[3] == ("unique body three\nsolo line\n\n  \nsolo line", 5, 0)
    # every occurrence of a hot line drops, including within-doc repeats
    assert got[4] == ("unique body four", 3, 2)
    # empty text = one blank line, untouched
    assert got[5] == ("", 1, 0)
    # a document losing every line survives with empty text_clean
    assert got[6] == ("", 1, 1)


def test_min_docs_threshold(spark):
    got = _run(spark, ROWS, min_docs=4)
    # banner occurs in docs {1,2,4,6} = 4 distinct docs -> still hot;
    # copyright occurs in {1,2} -> no longer hot
    assert got[1] == ("unique body one\nCopyright ACME", 3, 1)
    assert got == _replay(ROWS, min_docs=4)
    with pytest.raises(ValueError):
        _run(spark, ROWS, min_docs=1)


def test_partition_invariance(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    a = sorted(
        remove_boilerplate_lines(df.repartition(1)).collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        remove_boilerplate_lines(df.repartition(16)).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_hash_keys_parity(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    a = sorted(map(tuple, remove_boilerplate_lines(df).collect()))
    b = sorted(
        map(
            tuple,
            remove_boilerplate_lines(df, hash_keys=False).collect(),
        )
    )
    assert a == b


def test_no_broadcast_variant_identical(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    a = sorted(
        map(tuple, remove_boilerplate_lines(df).collect())
    )
    b = sorted(
        map(
            tuple,
            remove_boilerplate_lines(df, broadcast_hot=False).collect(),
        )
    )
    assert a == b


def test_hot_table_contents(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    hot = {
        r["line_key"]: r["n_docs"]
        for r in boilerplate_lines(df, hash_keys=False).collect()
    }
    assert hot == {"cookie banner": 4, "copyright acme": 2}
    # hashed variant: same cardinalities, keys are the xxhash64 of them
    hashed = {
        r["line_key"]: r["n_docs"]
        for r in boilerplate_lines(df).collect()
    }
    assert sorted(hashed.values()) == sorted(hot.values())
    assert all(isinstance(k, int) for k in hashed)


def test_plan_shape(spark):
    """Hot side broadcasts; the rebuild is one exchange on the doc id."""
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    plan = (
        remove_boilerplate_lines(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_paragraph_granularity(spark):
    rows = [
        (1, "Shared intro para.\n\nbody one\nstill body one\n\nTail A"),
        (2, "shared intro para.\n\nbody two\n\nTail B"),
        (3, "unrelated\n\nTail C"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text_clean"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate_lines(df, sep="\n\n").collect()
    }
    # the shared intro paragraph drops (case-insensitive); single '\n'
    # inside a paragraph is NOT a split point at this granularity
    assert got[1] == ("body one\nstill body one\n\nTail A", 3, 1)
    assert got[2] == ("body two\n\nTail B", 3, 1)
    assert got[3] == ("unrelated\n\nTail C", 2, 0)


def test_sep_is_literal_not_regex(spark):
    rows = [(1, "a|b||c"), (2, "x||c")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text_clean"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate_lines(df, sep="||").collect()
    }
    # '||' splits literally: doc1 = ['a|b', 'c'], doc2 = ['x', 'c'];
    # 'c' is shared and drops
    assert got[1] == ("a|b", 2, 1)
    assert got[2] == ("x", 2, 1)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        remove_boilerplate_lines(df, sep="")


def test_null_text_doc_survives(spark):
    rows = [(1, None), (2, "cookie banner\nbody"), (3, "cookie banner\nother")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_clean"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate_lines(df).collect()
    }
    # one row per INPUT document: NULL text coalesces to '' (one blank
    # line, kept) rather than vanishing in the explode
    assert got[1] == ("", 1, 0)
    assert set(got) == {1, 2, 3}
