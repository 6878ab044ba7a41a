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


def test_transient_retry(spark, schema_path, tmp_path):
    """TransientError (deadlock) is retried with backoff; others re-raise."""
    log = str(tmp_path / "retry.jsonl")

    class TransientError(Exception):
        code = "Neo.TransientError.Transaction.DeadlockDetected"

    class FlakySession(RecordingSession):
        fail_path = str(tmp_path / "fails")

        def run(self, query, **params):
            # fail the first two calls ever, then behave
            import os
            n = int(open(self.fail_path).read()) if os.path.exists(self.fail_path) else 0
            if n < 2:
                open(self.fail_path, "w").write(str(n + 1))
                raise TransientError("deadlock")
            super().run(query, **params)

    t = SparkTranslator(spark, NullOntology(SchemaMapping(schema_path)))
    nodes = t.translate_nodes(nodes_from_tuples(spark, protein_nodes(2))).nodes
    Neo4jOnlineWriter(lambda: FlakySession(log), max_retries=3).write_nodes(nodes)
    ents = [e for c in _read_calls(log) for e in c["params"]["entities"]]
    assert {e["node_id"] for e in ents} == {"p1", "p2"}


def test_nontransient_raises(spark, schema_path, tmp_path):
    class FatalSession:
        def run(self, query, **params):
            raise ValueError("boom")

        def close(self):
            pass

    import pytest
    from py4j.protocol import Py4JJavaError

    t = SparkTranslator(spark, NullOntology(SchemaMapping(schema_path)))
    nodes = t.translate_nodes(nodes_from_tuples(spark, protein_nodes(1))).nodes
    with pytest.raises(Exception) as exc:
        Neo4jOnlineWriter(lambda: FatalSession()).write_nodes(nodes)
    assert "boom" in str(exc.value)


def test_merge_facade_online(spark, schema_path, tmp_path):
    """BioCypherSpark.merge_nodes/merge_edges delegate to the Bolt connector
    in online mode (reference _core.py:517-549)."""
    from biocypher_spark.core import BioCypherSpark
    from fixtures.data_generator import perturbed_edges

    log = str(tmp_path / "facade.jsonl")
    bc = BioCypherSpark(
        spark,
        offline=False,
        schema_config_path=schema_path,
        output_directory=str(tmp_path / "out"),
        session_factory=_factory(log),
    )
    assert bc.merge_nodes(protein_nodes(2))
    assert bc.merge_edges(perturbed_edges(3)[1:])
    calls = _read_calls(log)
    queries = [c["query"] for c in calls]
    assert NODE_MERGE_CYPHER in queries and EDGE_MERGE_CYPHER in queries and EDGE_STUB_CYPHER in queries


def test_merge_facade_offline_writes_batch_layout(spark, schema_path, tmp_path):
    """Offline merge_* write the batch layout (reference: merge_* are
    _add_* aliases and _add_nodes routes to the writer when offline,
    _core.py:375-413) — they do NOT accumulate in the in-memory KG."""
    import os

    from biocypher_spark.core import BioCypherSpark

    bc = BioCypherSpark(spark, schema_config_path=schema_path, output_directory=str(tmp_path / "out"))
    assert bc.merge_nodes(protein_nodes(2))
    assert os.path.isfile(tmp_path / "out" / "Protein-part000.csv")
