"""Hop-bounded Bellman-Ford pins: hand graph, hop-bound semantics,
multi-source min, corpus reachability."""

from mapnik_vector_tile_spark.operators.graph import bellman_ford


def _bf(spark, edges, sources, rounds):
    e = spark.createDataFrame(edges, "u long, v long, w long")
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    return {r["node"]: r["d"] for r in bellman_ford(e, s, rounds).collect()}


def test_chain_with_shortcut(spark):
    # 0-1-2-3 chain (w=1 each) plus direct 0->3 w=10: shortest 0->3 is 3
    edges = [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 10)]
    d = _bf(spark, edges, [0], 12)
    assert d == {0: 0, 1: 1, 2: 2, 3: 3}


def test_hop_bound_semantics(spark):
    # with rounds=1 only the direct edge is usable: d(3) = 10, d(2) = 1-hop
    edges = [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 10)]
    d = _bf(spark, edges, [0], 1)
    assert d == {0: 0, 1: 1, 3: 10}
    d2 = _bf(spark, edges, [0], 2)
    assert d2 == {0: 0, 1: 1, 2: 2, 3: 10}


def test_multi_source_min(spark):
    edges = [(0, 5, 4), (9, 5, 1)]
    d = _bf(spark, edges, [0, 9], 3)
    assert d[5] == 1


def test_unreachable_absent(spark):
    d = _bf(spark, [(0, 1, 1), (7, 8, 1)], [0], 5)
    assert 7 not in d and 8 not in d


def test_corpus_giant_component(spark):
    from mapnik_vector_tile_spark.plans.oracle_pairs import q_bellman_ford

    d = q_bellman_ford(spark, "/root/testdata/sf0.01").collect()
    # 15k king-move edges on a 64x64 lattice: the 12-hop field from the
    # west edge covers a substantial node set (894 at sf0.01 — the
    # 12-hop horizon, not the component, is the binding constraint)
    assert len(d) > 500
    assert any(r["d"] > 0 for r in d)
    assert all(r["d"] >= 0 for r in d)
