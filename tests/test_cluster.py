"""T4: large-star/small-star CC vs a pure-Python union-find oracle
(property-style over random edge sets)."""

import numpy as np

from fastlink_spark.operators.cluster import connected_components


def _uf_oracle(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical label = min of component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(mem) for r, mem in comp.items() for n in mem}


def _check(spark, edges, nodes):
    e = spark.createDataFrame(list(edges) or [(0, 0)], "u long, v long")
    nd = spark.createDataFrame([(n,) for n in nodes], "id long")
    got = {r["id"]: r["cluster_id"] for r in connected_components(e, nd).collect()}
    exp = _uf_oracle(edges, nodes)
    assert got == exp


def test_simple_chain(spark):
    _check(spark, [(1, 2), (2, 3), (3, 4), (10, 11)], list(range(1, 13)))


def test_random_graphs(spark):
    rng = np.random.default_rng(17)
    for trial in range(3):
        n = int(rng.integers(30, 120))
        m = int(rng.integers(10, 200))
        edges = {tuple(sorted((int(a), int(b)))) for a, b in rng.integers(0, n, (m, 2)) if a != b}
        _check(spark, sorted(edges), list(range(n)))


def test_adversarial_long_chain(spark):
    # path graph: worst case for naive propagation; large/small-star
    # must converge in O(log n) rounds
    n = 256
    edges = [(i, i + 1) for i in range(n - 1)]
    e = spark.createDataFrame(edges, "u long, v long")
    labels = connected_components(e, max_iter=25).collect()
    assert {r["cluster_id"] for r in labels} == {0}
    assert len(labels) == n


def test_duplicate_and_reversed_edges(spark):
    _check(spark, [(2, 1), (1, 2), (2, 3), (3, 2), (5, 5)], [1, 2, 3, 5, 9])
