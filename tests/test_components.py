"""Connected components (large-star/small-star) vs a union-find oracle."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_documentos_spark.operators.components import (
    connected_components,
    dedup_components,
)


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
            parent[ra] = rb
    # canonical = min id in component
    comp = {}
    for i in range(n_nodes):
        comp.setdefault(find(i), []).append(i)
    out = {}
    for members in comp.values():
        m = min(members)
        for i in members:
            out[i] = m
    return out


def _ids(i):
    return f"D{i:05d}"


def _check(spark, n_nodes, edges):
    pairs = spark.createDataFrame(
        [( _ids(a), _ids(b)) for a, b in edges], "id_a string, id_b string"
    )
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(pairs).collect()
    }
    want = _union_find(n_nodes, edges)
    touched = {x for e in edges for x in e}
    for i in touched:
        assert got[_ids(i)] == _ids(want[i]), (i, got[_ids(i)], want[i])
    assert set(got) == {_ids(i) for i in touched}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(4):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(10, 80))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, n, edges)


def test_long_chain_converges(spark):
    # a path graph is the worst diameter case for label propagation;
    # large-star/small-star must still converge in O(log n) rounds
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    _check(spark, n, edges)


def test_hot_star_hub(spark):
    # one hub connected to everything (the template-document case):
    # no collect_list of the neighborhood, min-agg handles the hot node
    n = 200
    edges = [(0, i) for i in range(1, n)]
    _check(spark, n, edges)


def test_dedup_components_singletons_and_sizes(spark):
    df = spark.createDataFrame(
        [(f"D{i}",) for i in range(6)], "doc_id string"
    )
    pairs = spark.createDataFrame(
        [("D1", "D3"), ("D3", "D5")], "id_a string, id_b string"
    )
    rows = {r["doc_id"]: r for r in dedup_components(df, pairs).collect()}
    assert rows["D1"]["component_id"] == "D1"
    assert rows["D3"]["component_id"] == "D1"
    assert rows["D5"]["component_id"] == "D1"
    assert rows["D5"]["n_members"] == 3 and not rows["D5"]["is_canonical"]
    assert rows["D1"]["is_canonical"]
    for s in ("D0", "D2", "D4"):
        assert rows[s]["component_id"] == s
        assert rows[s]["n_members"] == 1 and rows[s]["is_canonical"]


def test_no_driver_collect_in_plan(spark):
    # the component labels join must not force a driver-side materialize:
    # result is a plain DataFrame whose plan contains joins/aggregates only
    df = spark.createDataFrame([("A",), ("B",)], "doc_id string")
    pairs = spark.createDataFrame([("A", "B")], "id_a string, id_b string")
    out = dedup_components(df, pairs)
    assert out.columns == ["doc_id", "component_id", "is_canonical", "n_members"]
    assert out.count() == 2
