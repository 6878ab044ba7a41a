"""SparkWorkflow facade tests — mirror of the reference test_workflow.py
cases (creation, CRUD, traversal, components, statistics, serialization)
plus the to_spark_graph scale bridge."""

import pytest

from biocypher_spark.workflow import SparkWorkflow, create_workflow


@pytest.fixture()
def wf():
    w = create_workflow("test_workflow")
    w.add_node("p1", "protein", name="TP53")
    w.add_node("p2", "protein", name="BRCA1")
    w.add_node("d1", "disease", name="cancer")
    w.add_node("iso", "gene")
    w.add_edge("e1", "interaction", "p1", "p2", confidence=0.8)
    w.add_edge("e2", "association", "p1", "d1")
    return w


def test_creation_and_repr(wf):
    assert wf.name == "test_workflow" and len(wf) == 4 and "p1" in wf
    assert "nodes=4" in str(wf) and "edges=2" in str(wf)


def test_node_crud(wf):
    assert not wf.add_node("p1", "protein")  # duplicate -> False
    assert wf.get_node("p1")["properties"]["name"] == "TP53"
    assert wf.get_node("zz") is None
    assert {n["id"] for n in wf.get_nodes("protein")} == {"p1", "p2"}
    assert len(wf.get_nodes()) == 4
    assert wf.remove_node("p2") and not wf.has_node("p2")
    assert not wf.remove_node("zz")
    # connected edge e1 removed with p2
    assert wf.get_edge("e1") is None and wf.get_edge("e2") is not None


def test_edge_crud(wf):
    assert not wf.add_edge("e1", "interaction", "p1", "p2")  # duplicate
    assert wf.get_edge("e1")["properties"]["confidence"] == 0.8
    assert [e["id"] for e in wf.get_edges("association")] == ["e2"]
    assert [e["id"] for e in wf.get_edges_between("p1", "p2")] == ["e1"]
    assert wf.get_edges_between("p1", "p2", "association") == []
    assert wf.remove_edge("e1") and not wf.has_edge("e1")


def test_hyperedge_crud(wf):
    assert wf.add_hyperedge("h1", "complex", {"p1", "p2", "d1"}, source="curated")
    assert not wf.add_hyperedge("h1", "complex", {"p1", "p2"})  # duplicate
    with pytest.raises(ValueError, match="does not exist"):
        wf.add_hyperedge("h2", "complex", {"p1", "ghost"})
    with pytest.raises(ValueError, match="at least 2"):
        wf.add_hyperedge("h3", "complex", {"p1"})
    assert wf.get_hyperedge("h1")["properties"]["source"] == "curated"
    assert len(wf.get_hyperedges("complex")) == 1 and wf.has_hyperedge("h1")


def test_traversal(wf):
    assert wf.get_neighbors("p1") == {"p2", "d1"}
    assert wf.get_neighbors("p1", "out") == {"p2", "d1"}
    assert wf.get_neighbors("p2", "in") == {"p1"}
    assert {e["id"] for e in wf.get_connected_edges("p1")} == {"e1", "e2"}
    wf.add_edge("e3", "association", "p2", "d1")
    paths = wf.find_paths("p1", "d1", max_length=3)
    assert sorted(len(p) for p in paths) == [1, 2]  # direct + via p2
    assert wf.find_paths("p1", "d1", max_length=1) == [[wf.get_edge("e2")]]
    assert wf.find_paths("d1", "p1") == []


def test_find_connected_components(wf):
    out = wf.find_connected_components("p1", max_depth=1)
    assert {n["id"] for n in out["nodes"]} == {"p1", "p2", "d1"}
    # found path carries the component's own statistics (reference
    # _workflow.py:475-482)
    assert out["statistics"]["basic"]["nodes"] == 3
    assert wf.find_connected_components("zz") == {"nodes": [], "edges": [], "hyperedges": []}


def test_statistics_and_summary(wf):
    wf.add_hyperedge("h1", "complex", {"p1", "p2"})
    stats = wf.get_statistics()
    assert stats["basic"] == {
        "nodes": 4, "edges": 2, "hyperedges": 1,
        "node_types": 3, "edge_types": 2, "hyperedge_types": 1,
    }
    assert stats["connectivity"] == {"isolated_nodes": 1, "connected_nodes": 3}
    summary = wf.get_summary()
    assert summary["total_nodes"] == 4 and summary["top_node_types"][0] == ("protein", 2)


def test_dedup_and_validation_modes():
    w = SparkWorkflow(deduplication=True, validation_mode="strict")
    assert w.add_node("a", "t")
    with pytest.raises(ValueError, match="Duplicate"):
        w.add_node("a", "t")
    schema = {"protein": {"properties": {"name": "str", "score": "float"}}}
    w2 = SparkWorkflow(schema=schema, validation_mode="strict")
    with pytest.raises(ValueError, match="failed schema validation"):
        w2.add_node("p1", "protein", name="x")  # missing score
    with pytest.raises(ValueError, match="failed schema validation"):
        w2.add_node("p1", "protein", name="x", score="high")  # wrong type
    assert w2.add_node("p1", "protein", name="x", score=1.0)
    w3 = SparkWorkflow(schema=schema, validation_mode="warn")
    with pytest.warns(UserWarning):
        assert w3.add_node("p1", "protein", name="x")  # warns but adds


def test_json_roundtrip_and_copy(wf, tmp_path):
    wf.add_hyperedge("h1", "complex", {"p1", "p2"})
    blob = wf.to_json()
    w2 = SparkWorkflow()
    w2.from_json(blob)
    assert len(w2) == 4 and w2.has_edge("e1") and w2.get_hyperedge("h1")["nodes"] == {"p1", "p2"}
    path = str(tmp_path / "g.json")
    wf.save(path)
    w3 = SparkWorkflow()
    w3.load(path)
    assert w3.get_statistics() == wf.get_statistics()
    w4 = wf.copy()
    w4.add_node("new", "protein")
    assert len(w4) == 5 and len(wf) == 4
    wf2 = wf.copy()
    wf2.clear()
    assert len(wf2) == 0


def test_exports(wf):
    g = wf.to_networkx()
    assert g.number_of_nodes() == 4 and g.number_of_edges() == 2
    assert g.nodes["p1"]["name"] == "TP53"
    dfs = wf.to_pandas()
    assert len(dfs["nodes"]) == 4 and len(dfs["edges"]) == 2


def test_to_spark_graph_bridge(wf, spark):
    wf.add_hyperedge("h1", "complex", {"p1", "p2"})
    g = wf.to_spark_graph(spark)
    assert g.nodes.count() == 4 and g.edges.count() == 2 and g.hyperedges.count() == 1
    assert g.get_statistics()["basic"] == wf.get_statistics()["basic"]
    comp = {r["node"]: r["comp"] for r in g.connected_components().collect()}
    assert comp["p1"] == comp["p2"] == comp["d1"]
    assert comp["iso"] == "iso"


def test_add_edge_requires_existing_endpoints():
    """Reference Graph.add_edge raises ValueError on dangling endpoints
    (_graph.py:306-309); a silently-accepted dangling edge would crash
    find_connected_components' node lookup."""
    import pytest as _pytest

    from biocypher_spark.workflow import SparkWorkflow

    wf = SparkWorkflow()
    wf.add_node("a", "t")
    with _pytest.raises(ValueError, match="does not exist"):
        wf.add_edge("e1", "rel", "a", "b")
    wf.add_node("b", "t")
    assert wf.add_edge("e1", "rel", "a", "b") is True


def test_edge_dedup_keyed_on_id_and_type():
    """Reference keys _seen_edges on (edge_id, edge_type): re-using an id
    under a NEW type is a silent False (storage is id-keyed), not a
    strict-mode duplicate error."""
    from biocypher_spark.workflow import SparkWorkflow

    wf = SparkWorkflow(deduplication=True, validation_mode="strict")
    for n in ("a", "b"):
        wf.add_node(n, "t")
    assert wf.add_edge("e1", "typeA", "a", "b") is True
    # same id, different type: NOT a dup per the (id, type) key; the
    # id-keyed storage then rejects it silently
    assert wf.add_edge("e1", "typeB", "a", "b") is False
    # same (id, type): strict mode raises
    import pytest as _pytest

    with _pytest.raises(ValueError, match="Duplicate edge ID"):
        wf.add_edge("e1", "typeA", "a", "b")
