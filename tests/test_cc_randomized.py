"""Randomized (seeded) connected-components check against union-find.

Spark-per-example hypothesis is too slow for an iterative operator, so
this draws a few adversarial random graphs with fixed seeds — sparse,
dense, and long-chain-heavy — and compares against a reference
union-find. Complements tests/test_connected_components.py's
hand-picked shapes.
"""

import numpy as np

from binance_data_ingestor_spark.operators.dedup import connected_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, then label every touched node by its component min
    comp = {}
    for a, b in edges:
        for v in (a, b):
            comp.setdefault(v, find(v))
    # find() with min-parent union yields the min id as root
    return comp


def _check(spark, edges, n_nodes):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in connected_components(df).collect()
    }
    want = _union_find(n_nodes, edges)
    assert got == want


def test_sparse_random_graph(spark):
    rng = np.random.RandomState(7)
    edges = [tuple(sorted(e)) for e in rng.randint(0, 200, size=(80, 2)) if e[0] != e[1]]
    _check(spark, edges, 200)


def test_dense_random_graph(spark):
    rng = np.random.RandomState(42)
    edges = [tuple(sorted(e)) for e in rng.randint(0, 40, size=(150, 2)) if e[0] != e[1]]
    _check(spark, edges, 40)


def test_chains_with_random_ids(spark):
    # several long paths over shuffled ids: worst diameter, labels must
    # flow many hops in both directions
    rng = np.random.RandomState(3)
    ids = rng.permutation(120)
    edges = []
    for c in range(4):
        chain = ids[c * 30 : (c + 1) * 30]
        edges += [tuple(sorted((int(chain[i]), int(chain[i + 1])))) for i in range(29)]
    _check(spark, edges, 120)
