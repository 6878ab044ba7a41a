"""Graph query layer tests (mirror of reference test_graph/_workflow)."""

import pytest
from pyspark.sql import functions as F

from biocypher_spark.graph import SparkGraph


@pytest.fixture(scope="module")
def g(spark):
    nodes = spark.createDataFrame(
        [("a", "protein"), ("b", "protein"), ("c", "gene"), ("d", "gene"), ("iso", "protein")],
        ["node_id", "node_label"],
    )
    edges = spark.createDataFrame(
        [("a", "b", "INTERACTS"), ("b", "c", "REGULATES"), ("c", "d", "REGULATES"), ("a", "c", "INTERACTS")],
        ["source_id", "target_id", "relationship_label"],
    )
    return SparkGraph(nodes, edges)


def test_has_get_node(g):
    assert g.has_node("a")
    assert not g.has_node("zz")
    assert g.get_node("a")["node_label"] == "protein"


def test_edges_between(g):
    assert g.get_edges_between("a", "b").count() == 1
    assert g.get_edges_between("b", "a").count() == 0


def test_neighbors(g):
    out = {r["neighbor"] for r in g.get_neighbors("a", "out").collect()}
    assert out == {"b", "c"}
    inc = {r["neighbor"] for r in g.get_neighbors("c", "in").collect()}
    assert inc == {"b", "a"}
    both = {r["neighbor"] for r in g.get_neighbors("b", "both").collect()}
    assert both == {"a", "c"}


def test_find_paths(g):
    paths = g.find_paths("a", max_length=3).collect()
    tuples = {(tuple(p["path"]), p["hops"]) for p in paths}
    assert (("a", "b"), 1) in tuples
    assert (("a", "b", "c"), 2) in tuples
    assert (("a", "b", "c", "d"), 3) in tuples
    assert (("a", "c", "d"), 2) in tuples
    to_d = g.find_paths("a", dst="d", max_length=3).count()
    assert to_d == 2


def test_statistics(g):
    stats = g.statistics()
    assert stats["num_nodes"] == 5
    assert stats["num_edges"] == 4
    assert stats["node_types"] == {"protein": 3, "gene": 2}
    assert stats["edge_types"] == {"INTERACTS": 2, "REGULATES": 2}
    assert stats["isolated_nodes"] == 1


def test_components(g):
    comp = {r["node"]: r["comp"] for r in g.connected_components().collect()}
    assert comp["a"] == comp["b"] == comp["c"] == comp["d"]
    assert comp["iso"] == "iso"


def test_topk(g):
    top = g.top_k_types(1).collect()
    assert top[0]["label"] == "protein" and top[0]["cnt"] == 3
