"""connected_components vs a pure-Python union-find on adversarial graphs."""

import pytest

from proj_spark.graph import connected_components


def _uf_components(n_ids, edge_list):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


@pytest.fixture(scope="module")
def spark():
    from proj_spark.session import get_spark
    s = get_spark("test_graph", cpus=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


CASES = {
    # long chain: worst case for plain label propagation (diameter = n)
    "chain": (list(range(30)), [(i, i + 1) for i in range(29)]),
    # star with the hub NOT the minimum
    "star": ([5, 10, 11, 12, 13, 1], [(10, 5), (11, 5), (12, 5), (13, 5), (1, 5)]),
    # two cliques + isolated nodes
    "cliques": (list(range(12)),
                [(a, b) for a in range(4) for b in range(4) if a < b]
                + [(a, b) for a in range(5, 9) for b in range(5, 9) if a < b]),
    # self-loops and duplicate/reversed edges
    "messy": ([1, 2, 3, 4], [(1, 1), (2, 1), (1, 2), (3, 4), (4, 3), (3, 3)]),
    "empty": ([7, 8, 9], []),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_components_match_union_find(spark, name):
    ids, edge_list = CASES[name]
    nodes = spark.createDataFrame([(i,) for i in ids], "id long")
    edges = spark.createDataFrame(edge_list or [(0, 0)], "u long, v long")
    if not edge_list:
        edges = edges.filter("u < 0")
    got = {r["id"]: r["component"]
           for r in connected_components(nodes, edges).collect()}
    assert got == _uf_components(ids, edge_list)
