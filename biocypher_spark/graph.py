"""Graph query layer over node/edge DataFrames (G1-G7, D7, D8).

Reference: the in-memory ``Graph`` API (/root/reference/biocypher/_graph.py:
141-655) and ``BioCypherWorkflow`` (/root/reference/biocypher/_workflow.py).
The reference keeps Python dict indexes and adjacency sets; here every
operation is a DataFrame expression so it distributes: neighbor lookups are
key joins, path search is an iterative bounded self-join, components use the
shared iterative operator, statistics are aggregations.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.components import connected_components


class SparkGraph:
    """nodes: (node_id, node_label, ...); edges: (source_id, target_id,
    relationship_label, ...)."""

    def __init__(self, nodes: DataFrame, edges: DataFrame):
        self.nodes = nodes
        self.edges = edges

    # -- CRUD-ish (G1) -------------------------------------------------------

    def add_nodes(self, more: DataFrame) -> "SparkGraph":
        return SparkGraph(self.nodes.unionByName(more, allowMissingColumns=True), self.edges)

    def add_edges(self, more: DataFrame) -> "SparkGraph":
        return SparkGraph(self.nodes, self.edges.unionByName(more, allowMissingColumns=True))

    def has_node(self, node_id: str) -> bool:
        return self.nodes.filter(F.col("node_id") == node_id).limit(1).count() > 0

    def get_node(self, node_id: str):
        rows = self.nodes.filter(F.col("node_id") == node_id).limit(1).collect()
        return rows[0] if rows else None

    def get_edges_between(self, src: str, dst: str) -> DataFrame:
        return self.edges.filter((F.col("source_id") == src) & (F.col("target_id") == dst))

    # -- neighbors (G2) --------------------------------------------------------

    def get_neighbors(self, node_id: str, direction: str = "both") -> DataFrame:
        """Distinct neighbor ids of ``node_id`` (in / out / both)."""
        out = self.edges.filter(F.col("source_id") == node_id).select(
            F.col("target_id").alias("neighbor")
        )
        inc = self.edges.filter(F.col("target_id") == node_id).select(
            F.col("source_id").alias("neighbor")
        )
        if direction == "out":
            res = out
        elif direction == "in":
            res = inc
        else:
            res = out.unionByName(inc)
        return res.distinct()

    # -- paths (G3) ---------------------------------------------------------------

    def find_paths(self, src: str, dst: Optional[str] = None, max_length: int = 3) -> DataFrame:
        """All simple paths from ``src`` up to ``max_length`` hops.

        Iterative self-join; each frontier carries the visited path as an
        array so cycles are pruned (the reference BFS keeps a per-path
        visited list too, _graph.py:542-581). Returns (path array<string>,
        dst, hops).
        """
        e = self.edges.select(F.col("source_id").alias("_s"), F.col("target_id").alias("_t")).distinct()
        frontier = (
            e.filter(F.col("_s") == src)
            .select(F.array(F.col("_s"), F.col("_t")).alias("path"), F.col("_t").alias("dst"))
            .withColumn("hops", F.lit(1))
        )
        results = [frontier]
        for depth in range(2, max_length + 1):
            frontier = (
                frontier.join(e, frontier["dst"] == e["_s"])
                .filter(~F.array_contains(F.col("path"), F.col("_t")))
                .select(
                    F.concat(F.col("path"), F.array(F.col("_t"))).alias("path"),
                    F.col("_t").alias("dst"),
                    F.lit(depth).alias("hops"),
                )
            )
            results.append(frontier)
        paths = reduce(lambda a, b: a.unionByName(b), results)
        if dst is not None:
            paths = paths.filter(F.col("dst") == dst)
        return paths

    # -- components (G4) -------------------------------------------------------------

    def connected_components(self, max_iter: int = 25) -> DataFrame:
        loops = self.nodes.select(
            F.col("node_id").alias("src"), F.col("node_id").alias("dst")
        )
        edges = self.edges.select("source_id", "target_id").toDF("src", "dst").unionByName(loops)
        return connected_components(edges, max_iter=max_iter)

    # -- statistics (D7) -----------------------------------------------------------------

    def statistics(self) -> dict:
        """Counts + per-type distributions + isolated nodes
        (reference ``Graph.get_statistics``, _graph.py:587-629)."""
        node_types = {r["node_label"]: r["count"] for r in self.nodes.groupBy("node_label").count().collect()}
        edge_types = {
            r["relationship_label"]: r["count"]
            for r in self.edges.groupBy("relationship_label").count().collect()
        }
        endpoints = (
            self.edges.select(F.col("source_id").alias("node_id"))
            .unionByName(self.edges.select(F.col("target_id").alias("node_id")))
            .distinct()
        )
        isolated = self.nodes.join(endpoints, "node_id", "left_anti").count()
        return {
            "num_nodes": sum(node_types.values()),
            "num_edges": sum(edge_types.values()),
            "node_types": node_types,
            "edge_types": edge_types,
            "isolated_nodes": isolated,
        }

    def node_type_counts(self) -> DataFrame:
        return self.nodes.groupBy(F.col("node_label").alias("label")).agg(F.count(F.lit(1)).alias("cnt"))

    def top_k_types(self, k: int = 5) -> DataFrame:
        """Top-k node types by count (D8; reference ``get_summary``,
        _workflow.py:494-518); deterministic tie-break on label."""
        return self.node_type_counts().orderBy(F.desc("cnt"), F.asc("label")).limit(k)

    # -- validation (G5) -----------------------------------------------------------------

    def validate(self, schema_labels: set[str], mode: str = "warn") -> list[str]:
        """Schema validation modes none/warn/strict on node labels
        (reference ``BioCypherWorkflow`` validation,
        /root/reference/biocypher/_workflow.py:124-164): unknown labels are
        ignored / reported / fatal."""
        if mode == "none":
            return []
        unknown = [
            r["node_label"]
            for r in self.nodes.select("node_label").distinct().collect()
            if r["node_label"] not in schema_labels
        ]
        if unknown and mode == "strict":
            raise ValueError(f"Unknown node labels not in schema: {sorted(unknown)}")
        return sorted(unknown)

    # -- (de)serialization (G6) ------------------------------------------------------------

    def to_json(self, path: str) -> None:
        """Persist nodes/edges as JSON-lines directories (reference
        serializes the whole graph to one JSON dict, _graph.py:661-783; at
        scale that must be a distributed write)."""
        self.nodes.write.mode("overwrite").json(f"{path}/nodes")
        self.edges.write.mode("overwrite").json(f"{path}/edges")

    @classmethod
    def from_json(cls, spark, path: str) -> "SparkGraph":
        return cls(spark.read.json(f"{path}/nodes"), spark.read.json(f"{path}/edges"))

    # -- export (G6/G7) ------------------------------------------------------------------

    def to_pandas(self) -> dict:
        return {"nodes": self.nodes.toPandas(), "edges": self.edges.toPandas()}

    def to_networkx(self):
        import networkx as nx

        g = nx.DiGraph()
        for r in self.nodes.collect():
            g.add_node(r["node_id"], **{k: r[k] for k in r.asDict() if k != "node_id"})
        for r in self.edges.collect():
            g.add_edge(r["source_id"], r["target_id"], **{
                k: r[k] for k in r.asDict() if k not in ("source_id", "target_id")
            })
        return g
