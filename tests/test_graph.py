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


# -- hyperedges / removal / subgraph / seeded components (reference _graph.py
# hyperedge + remove + subgraph API, _workflow.py find_connected_components) --


@pytest.fixture(scope="module")
def hg(spark, g):
    hyper = spark.createDataFrame(
        [
            ("h1", "complex", ["a", "b", "c"], {}),
            ("h2", "complex", ["c", "d"], {"src": "curated"}),
            ("h3", "pathway", ["a", "d"], {}),
        ],
        "hyperedge_id string, hyperedge_type string, node_ids array<string>, props map<string,string>",
    )
    return g.add_hyperedges(hyper, validate_nodes=True)


def test_hyperedge_crud(hg):
    assert hg.has_hyperedge("h1") and not hg.has_hyperedge("zz")
    assert set(hg.get_hyperedge("h2")["node_ids"]) == {"c", "d"}
    assert hg.get_hyperedges("complex").count() == 2
    assert hg.get_hyperedges().count() == 3
    members = {(r["hyperedge_id"], r["node_id"]) for r in hg.hyperedge_membership().collect()}
    assert ("h1", "a") in members and ("h3", "d") in members and len(members) == 7


def test_hyperedge_validation(spark, g):
    one_node = spark.createDataFrame(
        [("bad", "t", ["a"], {})],
        "hyperedge_id string, hyperedge_type string, node_ids array<string>, props map<string,string>",
    )
    with pytest.raises(ValueError, match="at least 2"):
        g.add_hyperedges(one_node)
    ghost = spark.createDataFrame(
        [("bad", "t", ["a", "ghost"], {})],
        "hyperedge_id string, hyperedge_type string, node_ids array<string>, props map<string,string>",
    )
    with pytest.raises(ValueError, match="does not exist"):
        g.add_hyperedges(ghost, validate_nodes=True)


def test_statistics_with_hyperedges(hg):
    stats = hg.statistics()
    assert stats["num_hyperedges"] == 3
    assert stats["hyperedge_types"] == {"complex": 2, "pathway": 1}
    ref = hg.get_statistics()  # reference-shaped dict (_graph.py:587-629)
    assert set(ref) == {"basic", "node_types", "edge_types", "hyperedge_types", "connectivity"}
    assert ref["basic"] == {
        "nodes": 5, "edges": 4, "hyperedges": 3,
        "node_types": 2, "edge_types": 2, "hyperedge_types": 2,
    }
    assert ref["connectivity"] == {"isolated_nodes": 1, "connected_nodes": 4}


def test_remove_node(g):
    g2 = g.remove_node("c")
    assert not g2.has_node("c") and g2.nodes.count() == 4
    # edges b->c, c->d, a->c all gone; a->b stays
    remaining = {(r["source_id"], r["target_id"]) for r in g2.edges.collect()}
    assert remaining == {("a", "b")}
    assert g2.edges.columns == g.edges.columns


def test_remove_edges_between(g):
    g2 = g.remove_edges_between("a", "b")
    assert g2.get_edges_between("a", "b").count() == 0
    assert g2.edges.count() == 3
    assert g2.nodes.count() == 5


def test_get_subgraph(g):
    sub = g.get_subgraph({"a", "b", "c"})
    assert sub.nodes.count() == 3
    got = {(r["source_id"], r["target_id"]) for r in sub.edges.collect()}
    assert got == {("a", "b"), ("b", "c"), ("a", "c")}
    no_edges = g.get_subgraph({"a", "b"}, include_edges=False)
    assert no_edges.edges.count() == 0 and no_edges.nodes.count() == 2


def test_find_connected_components_seeded(g):
    out = g.find_connected_components("a", max_depth=1)
    ids = {n["node_id"] for n in out["nodes"]}
    assert ids == {"a", "b", "c"}  # 1 hop from a (undirected)
    out2 = g.find_connected_components("a", max_depth=3)
    ids2 = {n["node_id"] for n in out2["nodes"]}
    assert ids2 == {"a", "b", "c", "d"}  # iso unreachable
    assert out2["hyperedges"] == []
    assert out2["statistics"]["basic"]["nodes"] == 4
    # unknown seed -> reference empty shape
    assert g.find_connected_components("zz") == {"nodes": [], "edges": [], "hyperedges": []}


def test_json_roundtrip_with_hyperedges(hg, spark, tmp_path):
    path = str(tmp_path / "graph_json")
    hg.to_json(path)
    back = type(hg).from_json(spark, path)
    assert back.nodes.count() == 5 and back.edges.count() == 4
    assert back.hyperedges.count() == 3


def test_remove_edge_keeps_null_id_edges(spark, g):
    """Null-safe removal: edges without a relationship_id (legal — the RDF
    writer emits them as direct triples) must survive removing another edge
    by id."""
    from pyspark.sql import functions as F

    edges = g.edges.withColumn(
        "relationship_id",
        F.when(F.col("source_id") == "a", F.lit(None).cast("string")).otherwise(
            F.concat_ws("-", "source_id", "target_id")
        ),
    )
    g2 = SparkGraph(g.nodes, edges, g.hyperedges).remove_edge("b-c")
    remaining = {(r["source_id"], r["target_id"]) for r in g2.edges.collect()}
    assert ("b", "c") not in remaining
    # null-id edges from 'a' survive
    assert {("a", "b"), ("a", "c")} <= remaining


def test_edge_less_graph_round_trips_json(spark, tmp_path):
    """A graph with zero edges must survive to_json/from_json: the empty
    JSON dir reads back schemaless and is substituted with the canonical
    empty frame."""
    from biocypher_spark.graph import SparkGraph
    from biocypher_spark.model import EDGE_SCHEMA

    nodes = spark.createDataFrame(
        [("n1", "Protein", "id", {}, 0)],
        "node_id string, node_label string, preferred_id string, props map<string,string>, _seq long",
    )
    g = SparkGraph(nodes, spark.createDataFrame([], EDGE_SCHEMA))
    p = str(tmp_path / "g")
    g.to_json(p)
    back = SparkGraph.from_json(spark, p)
    stats = back.statistics()
    assert back.edges.count() == 0 and back.nodes.count() == 1
    assert back.get_neighbors("n1").count() == 0
    assert stats is not None


def test_validate_reports_null_label(spark):
    from biocypher_spark.graph import SparkGraph
    from biocypher_spark.model import EDGE_SCHEMA

    nodes = spark.createDataFrame(
        [("n1", None, "id", {}, 0)],
        "node_id string, node_label string, preferred_id string, props map<string,string>, _seq long",
    )
    g = SparkGraph(nodes, spark.createDataFrame([], EDGE_SCHEMA))
    assert g.validate({"protein"}, mode="warn") == ["<null>"]


def test_find_paths_zero_max_length(spark):
    from biocypher_spark.graph import SparkGraph
    from biocypher_spark.model import EDGE_SCHEMA, NODE_SCHEMA

    nodes = spark.createDataFrame([("a", "T", "id", {}, 0), ("b", "T", "id", {}, 1)], NODE_SCHEMA)
    edges = spark.createDataFrame([("e1", "a", "b", "R", {}, 0)], EDGE_SCHEMA)
    g = SparkGraph(nodes, edges)
    assert g.find_paths("a", max_length=0).count() == 0
    assert g.find_paths("a", max_length=1).count() == 1
