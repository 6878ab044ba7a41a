"""Translator stage tests (mirror of reference test_translate.py semantics)."""

import json

import pytest

from biocypher_spark.mapping import SchemaMapping
from biocypher_spark.model import edges_from_tuples, nodes_from_tuples
from biocypher_spark.ontology import NullOntology
from biocypher_spark.translate import SparkTranslator
from fixtures.data_generator import (
    mirna_nodes,
    mutated_edges,
    perturbed_edges,
    protein_nodes,
    rel_as_node_edges,
)


@pytest.fixture(scope="module")
def translator(spark, schema_path):
    return SparkTranslator(spark, NullOntology(SchemaMapping(schema_path)))


def _props(row):
    return {k: json.loads(v) if v is not None else None for k, v in row["props"].items()}


def test_translate_nodes(spark, translator):
    tuples = protein_nodes(2) + mirna_nodes(2) + [("x1", "unknown_label", {})]
    out = translator.translate_nodes(nodes_from_tuples(spark, tuples))
    rows = {r["node_id"]: r for r in out.nodes.collect()}
    assert set(rows) == {"p1", "p2", "m1", "m2"}
    p1 = rows["p1"]
    assert p1["node_label"] == "protein"
    assert p1["preferred_id"] == "uniprot"
    props = _props(p1)
    # whitelist keys + injected id/preferred_id (order is imposed by the
    # writer from the declared schema, not by the map)
    assert set(p1["props"].keys()) == {"name", "score", "taxon", "genes", "id", "preferred_id"}
    assert props["score"] == 4.0
    assert props["genes"] == ["gene1", "gene2"]
    assert props["id"] == "p1"
    assert props["preferred_id"] == "uniprot"
    m1 = rows["m1"]
    assert m1["node_label"] == "microRNA"
    assert m1["preferred_id"] == "mirbase.mature"
    # missing-type metrics
    missing = {r["input_label"]: r["count"] for r in out.missing.collect()}
    assert missing == {"unknown_label": 1}


def test_translate_nodes_missing_whitelist_prop_filled(spark, translator):
    # protein whitelist includes genes; omit it -> present as null
    out = translator.translate_nodes(
        nodes_from_tuples(spark, [("p9", "protein", {"name": "n", "score": 1.0, "taxon": 1})])
    )
    row = out.nodes.collect()[0]
    assert row["props"]["genes"] is None
    assert "genes" in row["props"]


def test_translate_nodes_exclude(spark, translator):
    out = translator.translate_nodes(
        nodes_from_tuples(spark, [("g1", "hgnc", {"name": "A", "accession": "acc", "taxon": 9606})])
    )
    row = out.nodes.collect()[0]
    assert "accession" not in row["props"]
    assert _props(row)["name"] == "A"
    assert row["node_label"] == "gene"


def test_translate_nodes_virtual_leaf(spark, translator):
    out = translator.translate_nodes(nodes_from_tuples(spark, [("r1", "reactome", {})]))
    row = out.nodes.collect()[0]
    assert row["node_label"] == "reactome.pathway"
    assert row["preferred_id"] == "reactome"


def test_translate_edges_plain(spark, translator):
    tuples = perturbed_edges(3)[1:] + mutated_edges(2)[1:]
    out = translator.translate_edges(edges_from_tuples(spark, tuples))
    rows = {r["relationship_id"]: r for r in out.edges.collect()}
    assert set(rows) == {"prel1", "prel2", "mrel1"}
    e = rows["prel1"]
    assert e["relationship_label"] == "PERTURBED_IN_DISEASE"
    assert e["source_id"] == "p1"
    assert e["target_id"] == "p2"
    assert _props(e) == {"residue": "T253", "level": 4}
    assert rows["mrel1"]["relationship_label"] == "Is_Mutated_In"
    assert out.ran_nodes.count() == 0


def test_translate_edges_rel_as_node(spark, translator):
    out = translator.translate_edges(edges_from_tuples(spark, rel_as_node_edges(2)))
    nodes = {r["node_id"]: r for r in out.ran_nodes.collect()}
    assert set(nodes) == {"i1", "i2"}
    n = nodes["i1"]
    assert n["node_label"] == "post translational interaction"
    assert n["preferred_id"] == "id"
    assert _props(n)["directed"] is True
    assert _props(n)["effect"] == -1
    assert _props(n)["id"] == "i1"
    edges = out.ran_edges.collect()
    assert len(edges) == 4
    by_label = {}
    for e in edges:
        by_label.setdefault(e["relationship_label"], []).append(e)
    assert {(e["source_id"], e["target_id"]) for e in by_label["IS_SOURCE_OF"]} == {("p1", "i1"), ("p2", "i2")}
    assert {(e["source_id"], e["target_id"]) for e in by_label["IS_TARGET_OF"]} == {("p2", "i1"), ("p3", "i2")}


def test_rel_as_node_id_synthesis(spark, translator):
    # 4-tuple (no id): node_id = src_tgt_joined-property-values in Python str form
    out = translator.translate_edges(
        edges_from_tuples(spark, [("p1", "p2", "post_translational", {"directed": True, "effect": -1})])
    )
    row = out.ran_nodes.collect()[0]
    assert row["node_id"] == "p1_p2_True_-1"


def test_rel_as_node_undirected_part_of(spark, translator):
    out = translator.translate_edges(
        edges_from_tuples(spark, [("i9", "p1", "p2", "post_translational", {"directed": False})])
    )
    labels = sorted(e["relationship_label"] for e in out.ran_edges.collect())
    assert labels == ["IS_PART_OF", "IS_PART_OF"]


def test_rel_as_node_roles(spark, translator):
    out = translator.translate_edges(
        edges_from_tuples(
            spark,
            [("i9", "p1", "p2", "post_translational", {"src_role": "binds", "tar_role": "bound_by"})],
        )
    )
    labels = {e["relationship_label"] for e in out.ran_edges.collect()}
    assert labels == {"binds", "bound_by"}


def test_strict_mode_raises(spark, schema_path):
    t = SparkTranslator(spark, NullOntology(SchemaMapping(schema_path)), strict_mode=True)
    with pytest.raises(ValueError, match="strict"):
        t.translate_nodes(nodes_from_tuples(spark, [("p1", "protein", {"name": "x"})]))


def test_strict_mode_ok_and_license_rename(spark, schema_path):
    t = SparkTranslator(spark, NullOntology(SchemaMapping(schema_path)), strict_mode=True)
    out = t.translate_nodes(
        nodes_from_tuples(
            spark,
            [("p1", "protein", {"name": "x", "source": "s", "license": "L", "version": "1"})],
        )
    )
    row = out.nodes.collect()[0]
    props = _props(row)
    # whitelist extended with strict props; licence renamed from license
    assert props["licence"] == "L"
    assert props["source"] == "s"
    assert props["version"] == "1"


def test_query_translation(translator):
    assert translator.translate_term("protein_disease") == "PERTURBED_IN_DISEASE"
    assert translator.translate_term("mirna") == "MicroRNA"
    assert (
        translator.translate("MATCH (n:protein) RETURN n")
        == "MATCH (n:Protein) RETURN n"
    )
    assert (
        translator.reverse_translate("MATCH (n:Protein) RETURN n")
        == "MATCH (n:protein) RETURN n"
    )
    with pytest.raises(NotImplementedError):
        translator.reverse_translate("MATCH (n:PERTURBED_IN_DISEASE) RETURN n")


def test_edge_without_represented_as_counted_missing(spark):
    """A schema entry admitted without represented_as cannot be routed; its
    edges must surface in the missing metrics, not vanish (the reference
    raises KeyError — _translate.py:270; fail-soft-with-metrics here)."""
    from biocypher_spark.mapping import SchemaMapping
    from biocypher_spark.model import edges_from_tuples
    from biocypher_spark.ontology import NullOntology
    from biocypher_spark.translate import SparkTranslator

    schema = {
        "broken association": {"input_label": "broken"},  # no represented_as
        "perturbed in disease": {
            "represented_as": "edge",
            "input_label": "ok",
            "label_as_edge": "PERTURBED_IN_DISEASE",
        },
    }
    tr = SparkTranslator(spark, NullOntology(SchemaMapping(schema=schema)))
    edges = edges_from_tuples(
        spark,
        [(None, "a", "b", "broken", {}), (None, "a", "b", "ok", {})],
    )
    out = tr.translate_edges(edges)
    assert out.edges.count() == 1  # the routable edge survives
    missing = {r["input_label"]: r["count"] for r in out.missing.collect()}
    assert missing == {"broken": 1}
