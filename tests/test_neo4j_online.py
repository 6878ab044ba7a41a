"""Online connector tests with a file-recording fake Bolt session (the
sandbox has no Neo4j; production injects a real driver session factory)."""

import json
import os

from biocypher_spark.mapping import SchemaMapping
from biocypher_spark.model import edges_from_tuples, nodes_from_tuples
from biocypher_spark.ontology import NullOntology
from biocypher_spark.translate import SparkTranslator
from biocypher_spark.writer.neo4j_online import (
    EDGE_MERGE_CYPHER,
    EDGE_STUB_CYPHER,
    NODE_MERGE_CYPHER,
    Neo4jOnlineWriter,
)
from fixtures.data_generator import perturbed_edges, protein_nodes


class RecordingSession:
    def __init__(self, path):
        self.path = path

    def run(self, query, **params):
        with open(self.path, "a") as fh:
            fh.write(json.dumps({"query": query, "params": params}) + "\n")

    def close(self):
        pass


def _factory(path):
    return lambda: RecordingSession(path)


def _read_calls(path):
    with open(path) as fh:
        return [json.loads(line) for line in fh]


def test_online_nodes(spark, schema_path, tmp_path):
    log = str(tmp_path / "calls.jsonl")
    t = SparkTranslator(spark, NullOntology(SchemaMapping(schema_path)))
    nodes = t.translate_nodes(nodes_from_tuples(spark, protein_nodes(3))).nodes
    Neo4jOnlineWriter(_factory(log)).write_nodes(nodes)
    calls = _read_calls(log)
    assert all(c["query"] == NODE_MERGE_CYPHER for c in calls)
    ents = [e for c in calls for e in c["params"]["entities"]]
    assert {e["node_id"] for e in ents} == {"p1", "p2", "p3"}
    p1 = next(e for e in ents if e["node_id"] == "p1")
    assert p1["node_label"] == "protein"
    assert p1["properties"]["score"] == 4.0
    assert p1["properties"]["genes"] == ["gene1", "gene2"]


def test_online_edges_two_phase(spark, schema_path, tmp_path):
    log = str(tmp_path / "calls.jsonl")
    t = SparkTranslator(spark, NullOntology(SchemaMapping(schema_path)))
    edges = t.translate_edges(edges_from_tuples(spark, perturbed_edges(3)[1:])).edges
    Neo4jOnlineWriter(_factory(log)).write_edges(edges)
    calls = _read_calls(log)
    queries = [c["query"] for c in calls]
    assert EDGE_STUB_CYPHER in queries and EDGE_MERGE_CYPHER in queries
    # Eager-workaround ordering per partition: stubs before relationships
    seen_merge = set()
    for c in calls:
        rel_ids = {(r["source_id"], r["target_id"]) for r in c["params"]["rels"]}
        if c["query"] == EDGE_MERGE_CYPHER:
            seen_merge |= rel_ids
        else:
            assert not (rel_ids & seen_merge), "stub phase must precede merges"
    rels = [r for c in calls if c["query"] == EDGE_MERGE_CYPHER for r in c["params"]["rels"]]
    assert {r["relationship_label"] for r in rels} == {"PERTURBED_IN_DISEASE"}
    assert all(r["properties"]["residue"] == "T253" for r in rels)
