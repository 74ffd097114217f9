"""Connected components: min-label propagation over near-dup pair sets."""

from repurpose_spark.operators.graph import connected_components


def _comps(spark, edges, verts=None):
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    vdf = (
        spark.createDataFrame([(v,) for v in verts], "doc_id long")
        if verts is not None
        else None
    )
    out = connected_components(pairs, vertices=vdf)
    return {r["doc_id"]: r["component"] for r in out.collect()}


def test_components_basic(spark):
    got = _comps(spark, [(1, 2), (2, 3), (5, 6)], verts=range(1, 9))
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8}


def test_components_chain_needs_iterations(spark):
    # a length-5 chain: labels need several propagation rounds
    got = _comps(spark, [(14, 13), (13, 12), (12, 11), (11, 10)])
    assert got == {i: 10 for i in range(10, 15)}


def test_components_no_edges(spark):
    got = _comps(spark, [], verts=[1, 2, 3])
    assert got == {1: 1, 2: 2, 3: 3}


def test_components_merges_two_clusters_via_bridge(spark):
    got = _comps(spark, [(1, 2), (3, 4), (2, 3)])
    assert set(got.values()) == {1}
