"""Equivalence of the two connected-components strategies.

`connected_components` (min-label propagation, rounds = diameter) and
`connected_components_star` (large-star/small-star, rounds = O(log n))
must produce identical (id, comp) labelings on any graph. The star
variant's reason to exist is the long-chain case — label propagation
needs ~n rounds there, the star method a handful.
"""

from __future__ import annotations

import random

import pytest

from psx_data_pipeline_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)


def _labels(df):
    return {(r.id, r.comp) for r in df.collect()}


def _both(spark, edge_list, n_nodes, max_iter_lp=60):
    edges = spark.createDataFrame(edge_list, "id_a long, id_b long")
    nodes = spark.range(n_nodes).withColumnRenamed("id", "id")
    lp = connected_components(edges, nodes, max_iter=max_iter_lp)
    star = connected_components_star(edges, nodes)
    return _labels(lp), _labels(star)


def _brute(edge_list, n_nodes):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, then label by component min
    roots = {}
    for i in range(n_nodes):
        r = find(i)
        roots.setdefault(r, min(r, i))
    return {(i, min(j for j in range(n_nodes) if find(j) == find(i)))
            for i in range(n_nodes)}


def test_chain_graph_matches(spark):
    """A 40-node chain: diameter 39 — the label-propagation worst
    case; both methods must still agree (and with the union-find
    ground truth)."""
    edge_list = [(i, i + 1) for i in range(39)]
    lp, star = _both(spark, edge_list, 40)
    want = _brute(edge_list, 40)
    assert lp == want
    assert star == want


def test_random_graphs_match(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        m = rng.randrange(20, 80)
        edge_list = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        # adversarial extras: self-loops and duplicates
        edge_list += [(5, 5), (0, 1), (0, 1)]
        lp, star = _both(spark, edge_list, n)
        want = _brute(edge_list, n)
        assert lp == want, f"trial {trial}: label propagation wrong"
        assert star == want, f"trial {trial}: star method wrong"


def test_star_handles_isolated_nodes(spark):
    lp, star = _both(spark, [(1, 2)], 5)
    assert star == {(0, 0), (1, 1), (2, 1), (3, 3), (4, 4)}
    assert lp == star
