"""Online Neo4j connector (S14): idempotent Bolt upserts from DataFrames.

Reference: ``_Neo4jDriver`` (/root/reference/biocypher/output/connect/
_neo4j_driver.py:233-412). Semantics preserved:

  * nodes merge on id only via ``apoc.merge.node``, same properties set on
    match and create (idempotent upsert);
  * edges are written in TWO Cypher phases — first ``MERGE`` source/target
    stub nodes, then ``MATCH`` + ``apoc.merge.relationship`` — because a
    single combined statement triggers Neo4j's Eager operator and
    materializes the whole stream (reference rationale
    test/profile_performance.py:253-273).

Spark-first shape: instead of the reference's driver-side batch, each
partition streams its rows through ``foreachPartition`` into a session
produced by an injectable ``session_factory`` (the sandbox has no Neo4j /
neo4j python driver, so tests inject a recording fake; production passes
``lambda: GraphDatabase.driver(...).session()``)."""

from __future__ import annotations

import json
from typing import Callable, Iterable, Optional

from pyspark.sql import DataFrame

NODE_MERGE_CYPHER = (
    "UNWIND $entities AS ent "
    "CALL apoc.merge.node([ent.node_label], "
    "{id: ent.node_id}, ent.properties, ent.properties) "
    "YIELD node "
    "RETURN count(node)"
)

EDGE_STUB_CYPHER = (
    "UNWIND $rels AS r MERGE (src {id: r.source_id}) MERGE (tar {id: r.target_id})"
)

EDGE_MERGE_CYPHER = (
    "UNWIND $rels AS r "
    "MATCH (src {id: r.source_id}) "
    "MATCH (tar {id: r.target_id}) "
    "WITH src, tar, r "
    "CALL apoc.merge.relationship"
    "(src, r.relationship_label, NULL, r.properties, tar, r.properties) "
    "YIELD rel "
    "RETURN count(rel)"
)


def _decode_props(props: Optional[dict]) -> dict:
    return {k: json.loads(v) if v is not None else None for k, v in (props or {}).items()}


def _is_transient(exc: Exception) -> bool:
    """Duck-typed Neo4j TransientError detection (lock deadlocks, leader
    switches): the neo4j driver is not importable here, so match on the
    exception class name / status code instead of the type."""
    name = type(exc).__name__
    code = getattr(exc, "code", "") or ""
    return "Transient" in name or "TransientError" in str(code) or "DeadlockDetected" in str(code)


def _run_batched(
    session, query: str, key: str, items: list, batch_size: int, max_retries: int = 3
) -> None:
    import time

    for i in range(0, len(items), batch_size):
        batch = {key: items[i : i + batch_size]}
        for attempt in range(max_retries + 1):
            try:
                session.run(query, **batch)
                break
            except Exception as exc:  # noqa: BLE001 - rethrown unless transient
                if attempt >= max_retries or not _is_transient(exc):
                    raise
                time.sleep(0.2 * 2**attempt)


class Neo4jOnlineWriter:
    """Stream node/edge DataFrames into a live Neo4j via Bolt sessions.

    Concurrency contract: label-less ``MERGE (n {id: ...})`` is racy under
    concurrent writers (two partitions can each create the same stub node,
    and cross-partition merges can deadlock), and Neo4j uniqueness
    constraints are per-label so they cannot fully protect the stub phase.
    Therefore ``parallelism`` defaults to 1 (the whole stream goes through
    one session, matching the reference's serial driver,
    _neo4j_driver.py:233-412). Raise it only when every merged label has a
    uniqueness constraint on ``id`` (``CREATE CONSTRAINT ... REQUIRE n.id IS
    UNIQUE``); transient errors (deadlocks) are retried ``max_retries``
    times with exponential backoff either way."""

    def __init__(
        self,
        session_factory: Callable,
        batch_size: int = 10_000,
        parallelism: int = 1,
        max_retries: int = 3,
    ):
        self.session_factory = session_factory
        self.batch_size = batch_size
        self.parallelism = parallelism
        self.max_retries = max_retries

    def _repartition(self, df: DataFrame) -> DataFrame:
        # repartition (a shuffle boundary), NOT coalesce: coalesce(1) would
        # propagate up the narrow chain and run the whole upstream
        # translate/extract DAG on one core — the shuffle serializes only
        # the Bolt write itself
        return df.repartition(self.parallelism) if self.parallelism else df

    def write_nodes(self, nodes: DataFrame) -> None:
        factory, query, batch_size = self.session_factory, NODE_MERGE_CYPHER, self.batch_size
        max_retries = self.max_retries
        nodes = self._repartition(nodes)

        def handle(rows: Iterable) -> None:
            entities = [
                {
                    "node_id": r["node_id"],
                    "node_label": r["node_label"],
                    "properties": _decode_props(r["props"] if "props" in r.__fields__ else None),
                }
                for r in rows
            ]
            if not entities:
                return
            session = factory()
            try:
                _run_batched(session, query, "entities", entities, batch_size, max_retries)
            finally:
                close = getattr(session, "close", None)
                if close:
                    close()

        nodes.foreachPartition(handle)

    def write_edges(self, edges: DataFrame) -> None:
        factory, batch_size = self.session_factory, self.batch_size
        max_retries = self.max_retries
        edges = self._repartition(edges)

        def handle(rows: Iterable) -> None:
            rels = [
                {
                    "source_id": r["source_id"],
                    "target_id": r["target_id"],
                    "relationship_label": r["relationship_label"],
                    "properties": _decode_props(r["props"] if "props" in r.__fields__ else None),
                }
                for r in rows
            ]
            if not rels:
                return
            session = factory()
            try:
                # phase 1: stub nodes; phase 2: relationships (Eager
                # avoidance; see module docstring)
                _run_batched(session, EDGE_STUB_CYPHER, "rels", rels, batch_size, max_retries)
                _run_batched(session, EDGE_MERGE_CYPHER, "rels", rels, batch_size, max_retries)
            finally:
                close = getattr(session, "close", None)
                if close:
                    close()

        edges.foreachPartition(handle)
