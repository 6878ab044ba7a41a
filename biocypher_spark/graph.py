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

from .materialize import materialize
from .operators.components import connected_components


class SparkGraph:
    """nodes: (node_id, node_label, ...); edges: (source_id, target_id,
    relationship_label, ...); hyperedges: (hyperedge_id, hyperedge_type,
    node_ids array<string>, props map<string,string>).

    All mutators are functional (return a new SparkGraph over derived
    DataFrames) — removal is an anti-join, never a driver-side loop, so it
    distributes at any scale.
    """

    def __init__(self, nodes: DataFrame, edges: DataFrame, hyperedges: DataFrame | None = None):
        self.nodes = nodes
        self.edges = edges
        if hyperedges is None:
            hyperedges = nodes.limit(0).select(
                F.col("node_id").cast("string").alias("hyperedge_id"),
                F.col("node_id").cast("string").alias("hyperedge_type"),
                F.array(F.col("node_id").cast("string")).alias("node_ids"),
                F.create_map().cast("map<string,string>").alias("props"),
            )
        self.hyperedges = hyperedges

    # -- CRUD-ish (G1) -------------------------------------------------------

    def add_nodes(self, more: DataFrame) -> "SparkGraph":
        return SparkGraph(
            self.nodes.unionByName(more, allowMissingColumns=True), self.edges, self.hyperedges
        )

    def add_edges(self, more: DataFrame) -> "SparkGraph":
        return SparkGraph(
            self.nodes, self.edges.unionByName(more, allowMissingColumns=True), self.hyperedges
        )

    def has_node(self, node_id: str) -> bool:
        return self.nodes.filter(F.col("node_id") == node_id).limit(1).count() > 0

    def get_node(self, node_id: str):
        rows = self.nodes.filter(F.col("node_id") == node_id).limit(1).collect()
        return rows[0] if rows else None

    def get_edges_between(self, src: str, dst: str) -> DataFrame:
        return self.edges.filter((F.col("source_id") == src) & (F.col("target_id") == dst))

    def remove_node(self, node_ids: str | list[str]) -> "SparkGraph":
        """Remove node(s) and every edge touching them (reference
        ``Graph.remove_node``, /root/reference/biocypher/_graph.py:215-255 —
        there a dict delete + adjacency scan, here two anti-joins).
        Hyperedges are not modified, mirroring the reference."""
        if isinstance(node_ids, str):
            node_ids = [node_ids]
        doomed = self.nodes.sparkSession.createDataFrame([(n,) for n in node_ids], "node_id string")
        nodes = self.nodes.join(F.broadcast(doomed), "node_id", "left_anti")
        edges = self.edges.join(
            F.broadcast(doomed.withColumnRenamed("node_id", "source_id")), "source_id", "left_anti"
        ).join(F.broadcast(doomed.withColumnRenamed("node_id", "target_id")), "target_id", "left_anti")
        return SparkGraph(nodes, edges.select(self.edges.columns), self.hyperedges)

    def remove_edge(self, edge_id: str, id_col: str = "relationship_id") -> "SparkGraph":
        """Remove an edge by id (reference ``Graph.remove_edge``,
        _graph.py:347-376). Requires an edge-id column."""
        if id_col not in self.edges.columns:
            raise ValueError(f"edges have no '{id_col}' column; use remove_edges_between")
        # null-SAFE inequality: `!= id` evaluates to NULL for id-less rows
        # (legal in mixed frames — a null relationship_id means a direct
        # triple in the RDF writer) and a plain filter would drop them all
        keep = ~F.col(id_col).eqNullSafe(edge_id)
        return SparkGraph(self.nodes, self.edges.filter(keep), self.hyperedges)

    def remove_edges_between(self, src: str, dst: str) -> "SparkGraph":
        """Remove every edge from ``src`` to ``dst`` (id-less edge frames)."""
        return SparkGraph(
            self.nodes,
            self.edges.filter(~((F.col("source_id") == src) & (F.col("target_id") == dst))),
            self.hyperedges,
        )

    def get_subgraph(self, node_ids, include_edges: bool = True) -> "SparkGraph":
        """Subgraph induced by ``node_ids`` (reference ``Graph.get_subgraph``,
        _graph.py:631-655): the named nodes plus, optionally, edges whose BOTH
        endpoints are in the set. Hyperedges are not copied (reference
        behavior). ``node_ids`` may be a Python set/list (broadcast) or a
        single-column DataFrame for large keep-sets."""
        if isinstance(node_ids, DataFrame):
            # the DataFrame path exists FOR large keep-sets — no broadcast
            # hint, let AQE pick the join strategy (a forced broadcast of a
            # 10^8-id keep table is a driver/executor OOM)
            keep = node_ids.toDF("node_id")
            hint = lambda df: df  # noqa: E731
        else:
            keep = self.nodes.sparkSession.createDataFrame(
                [(n,) for n in sorted(node_ids)], "node_id string"
            )
            hint = F.broadcast
        nodes = self.nodes.join(hint(keep), "node_id", "left_semi")
        if include_edges:
            edges = self.edges.join(
                hint(keep.withColumnRenamed("node_id", "source_id")), "source_id", "left_semi"
            ).join(hint(keep.withColumnRenamed("node_id", "target_id")), "target_id", "left_semi")
            edges = edges.select(self.edges.columns)
        else:
            edges = self.edges.limit(0)
        return SparkGraph(nodes, edges)

    # -- hyperedges (G1; reference _graph.py:99-124, 415-491) -----------------

    def add_hyperedges(self, more: DataFrame, validate_nodes: bool = False) -> "SparkGraph":
        """Append hyperedge rows (hyperedge_id, hyperedge_type, node_ids,
        props). With ``validate_nodes`` every member id must exist in
        ``nodes`` (reference raises ValueError on unknown members,
        _graph.py:430-436); arity >= 2 is always enforced."""
        # coalesce(size, -1): a NULL node_ids array makes the size (and the
        # filter predicate) NULL, which would slip past the arity gate
        bad_arity = (
            more.filter(F.coalesce(F.size(F.array_distinct("node_ids")), F.lit(-1)) < 2)
            .limit(1)
            .count()
        )
        if bad_arity:
            raise ValueError("Hyperedge must connect at least 2 nodes")
        if validate_nodes:
            members = more.select(F.explode("node_ids").alias("node_id")).distinct()
            unknown = members.join(self.nodes.select("node_id"), "node_id", "left_anti").limit(1).collect()
            if unknown:
                raise ValueError(f"Node '{unknown[0]['node_id']}' does not exist")
        return SparkGraph(
            self.nodes, self.edges, self.hyperedges.unionByName(more, allowMissingColumns=True)
        )

    def has_hyperedge(self, hyperedge_id: str) -> bool:
        return self.hyperedges.filter(F.col("hyperedge_id") == hyperedge_id).limit(1).count() > 0

    def get_hyperedge(self, hyperedge_id: str):
        rows = self.hyperedges.filter(F.col("hyperedge_id") == hyperedge_id).limit(1).collect()
        return rows[0] if rows else None

    def get_hyperedges(self, hyperedge_type: str | None = None) -> DataFrame:
        if hyperedge_type is None:
            return self.hyperedges
        return self.hyperedges.filter(F.col("hyperedge_type") == hyperedge_type)

    def hyperedge_membership(self) -> DataFrame:
        """Expanded (hyperedge_id, hyperedge_type, node_id) membership table —
        the relational form joins/aggregations want at scale."""
        return self.hyperedges.select(
            "hyperedge_id", "hyperedge_type", F.explode("node_ids").alias("node_id")
        )

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
        if max_length < 1:
            # no hops allowed -> no paths (matches SparkWorkflow.find_paths)
            frontier = frontier.limit(0)
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

    def find_connected_components(self, node_id: str, max_depth: int = 2) -> dict:
        """Component around a seed node, depth-limited (reference
        ``Workflow.find_connected_components``,
        /root/reference/biocypher/_workflow.py:446-482). Frontier expansion
        by undirected join, one round per depth level, early exit when the
        frontier empties. Returns the reference dict shape:
        {nodes, edges, hyperedges, statistics} (hyperedges empty — the
        reference subgraph does not copy them)."""
        if not self.has_node(node_id):
            return {"nodes": [], "edges": [], "hyperedges": []}
        spark = self.nodes.sparkSession
        sym = (
            self.edges.select(F.col("source_id").alias("a"), F.col("target_id").alias("b"))
            .unionByName(self.edges.select(F.col("target_id").alias("a"), F.col("source_id").alias("b")))
            .distinct()
        )
        seen = spark.createDataFrame([(node_id,)], "node_id string")
        frontier = seen
        for _ in range(max_depth):
            nxt = materialize(
                sym.join(frontier.withColumnRenamed("node_id", "a"), "a", "left_semi")
                .select(F.col("b").alias("node_id"))
                .distinct()
                .join(seen, "node_id", "left_anti")
            )
            if nxt.limit(1).count() == 0:
                break
            seen = materialize(seen.unionByName(nxt))
            frontier = nxt
        sub = self.get_subgraph(seen)
        return {
            "nodes": [r.asDict() for r in sub.nodes.collect()],
            "edges": [r.asDict() for r in sub.edges.collect()],
            "hyperedges": [],
            "statistics": sub.get_statistics(),
        }

    # -- statistics (D7) -----------------------------------------------------------------

    def statistics(self) -> dict:
        """Counts + per-type distributions + isolated nodes
        (reference ``Graph.get_statistics``, _graph.py:587-629)."""
        node_types = {r["node_label"]: r["count"] for r in self.nodes.groupBy("node_label").count().collect()}
        edge_types = {
            r["relationship_label"]: r["count"]
            for r in self.edges.groupBy("relationship_label").count().collect()
        }
        hyperedge_types = {
            r["hyperedge_type"]: r["count"]
            for r in self.hyperedges.groupBy("hyperedge_type").count().collect()
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
            "num_hyperedges": sum(hyperedge_types.values()),
            "node_types": node_types,
            "edge_types": edge_types,
            "hyperedge_types": hyperedge_types,
            "isolated_nodes": isolated,
        }

    def get_statistics(self) -> dict:
        """Reference-shaped statistics dict (``Graph.get_statistics``,
        /root/reference/biocypher/_graph.py:587-629): basic counts,
        per-type distributions (hyperedges included), connectivity."""
        flat = self.statistics()
        return {
            "basic": {
                "nodes": flat["num_nodes"],
                "edges": flat["num_edges"],
                "hyperedges": flat["num_hyperedges"],
                "node_types": len(flat["node_types"]),
                "edge_types": len(flat["edge_types"]),
                "hyperedge_types": len(flat["hyperedge_types"]),
            },
            "node_types": flat["node_types"],
            "edge_types": flat["edge_types"],
            "hyperedge_types": flat["hyperedge_types"],
            "connectivity": {
                "isolated_nodes": flat["isolated_nodes"],
                "connected_nodes": flat["num_nodes"] - flat["isolated_nodes"],
            },
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
        # a NULL label (e.g. from allowMissingColumns unions) is reported as
        # the string '<null>' — sorted() cannot order None next to str
        unknown = sorted("<null>" if u is None else u for u in unknown)
        if unknown and mode == "strict":
            raise ValueError(f"Unknown node labels not in schema: {unknown}")
        return unknown

    # -- (de)serialization (G6) ------------------------------------------------------------

    def to_json(self, path: str) -> None:
        """Persist nodes/edges as JSON-lines directories (reference
        serializes the whole graph to one JSON dict, _graph.py:661-783; at
        scale that must be a distributed write)."""
        self.nodes.write.mode("overwrite").json(f"{path}/nodes")
        self.edges.write.mode("overwrite").json(f"{path}/edges")
        self.hyperedges.write.mode("overwrite").json(f"{path}/hyperedges")

    @classmethod
    def from_json(cls, spark, path: str) -> "SparkGraph":
        from .model import EDGE_SCHEMA, NODE_SCHEMA

        # an all-empty JSON dir reads back with NO schema (zero columns);
        # substitute the canonical empty frame so a zero-edge (or zero-node)
        # graph round-trips — otherwise every downstream groupBy/anti-join
        # fails with an unresolved-column AnalysisException
        nodes = spark.read.json(f"{path}/nodes")
        if not nodes.columns:
            nodes = spark.createDataFrame([], NODE_SCHEMA)
        edges = spark.read.json(f"{path}/edges")
        if not edges.columns:
            edges = spark.createDataFrame([], EDGE_SCHEMA)
        try:
            hyper = spark.read.json(f"{path}/hyperedges")
            if not hyper.columns:  # all-empty JSON dir -> no schema
                hyper = None
        except Exception:
            hyper = None
        return cls(nodes, edges, hyper)

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
