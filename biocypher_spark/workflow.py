"""Agentic workflow facade: the reference's 4th entry point
(``create_workflow()`` -> ``BioCypherWorkflow``,
/root/reference/biocypher/_workflow.py:61-798), re-expressed with a Spark
bridge.

The reference API is per-item CRUD on a driver-resident graph — appropriate
for agentic construction of small-to-medium graphs. This facade mirrors that
surface (same method names, same return/raise semantics: dedup modes,
none/warn/strict schema validation, JSON round-trip shape) over plain dicts,
and adds ``to_spark_graph()`` as the scale bridge: the accumulated graph
materializes into :class:`biocypher_spark.graph.SparkGraph` DataFrames, so
every distributed operator (components, statistics at scale, removal
anti-joins, path joins) applies once the graph outgrows one machine.
"""

from __future__ import annotations

import json
import warnings
from typing import Optional



class SparkWorkflow:
    """Driver-side KG construction with reference-parity semantics."""

    def __init__(
        self,
        name: str = "workflow_graph",
        directed: bool = True,
        schema: Optional[dict] = None,
        schema_file: Optional[str] = None,
        validation_mode: str = "none",
        deduplication: bool = False,
    ):
        self.name = name
        self.directed = directed
        self.validation_mode = validation_mode
        self.deduplication = deduplication
        self._nodes: dict[str, dict] = {}
        self._edges: dict[str, dict] = {}
        # dedup tracking is keyed (edge_id, edge_type) like the reference's
        # _seen_edges (_workflow.py:231-238) — storage stays id-keyed, so a
        # re-used id under a NEW type is a silent False, not a dup error
        self._seen_edge_keys: set[tuple] = set()
        self._hyperedges: dict[str, dict] = {}
        if schema_file:
            import yaml

            with open(schema_file) as fh:
                schema = yaml.safe_load(fh)
        self.schema = schema

    # -- validation (reference _workflow.py:543-601) --------------------------

    _TYPE_MAP = {"str": str, "int": int, "float": float, "bool": bool, "list": list, "dict": dict}

    def validate_against_schema(self, node_type: str, properties: dict) -> bool:
        if not self.schema or node_type not in self.schema:
            return True
        required = (self.schema[node_type] or {}).get("properties")
        if not required:
            return True
        for prop, ptype in required.items():
            if prop not in properties:
                return False
            expected = self._TYPE_MAP.get(ptype)
            if expected is not None and not isinstance(properties[prop], expected):
                return False
        return True

    def _check(self, kind: str, key: str, entity_type: str, properties: dict, seen: bool) -> bool:
        """Shared dedup + validation gate; returns False when the add must be
        skipped, raises in strict mode (reference add_node/add_edge)."""
        if self.deduplication and seen:
            if self.validation_mode == "strict":
                raise ValueError(f"Duplicate {kind} ID '{key}' not allowed in strict mode")
            if self.validation_mode == "warn":
                warnings.warn(f"Duplicate {kind} ID '{key}' detected", stacklevel=3)
            return False
        if self.validation_mode in ("warn", "strict") and not self.validate_against_schema(
            entity_type, properties
        ):
            if self.validation_mode == "strict":
                raise ValueError(f"{kind} '{key}' of type '{entity_type}' failed schema validation")
            warnings.warn(f"{kind} '{key}' of type '{entity_type}' failed schema validation", stacklevel=3)
        return True

    # -- node ops --------------------------------------------------------------

    def add_node(self, node_id: str, node_type: str, **properties) -> bool:
        if not self._check("node", node_id, node_type, properties, node_id in self._nodes):
            return False
        if node_id in self._nodes:
            return False
        self._nodes[node_id] = {"id": node_id, "type": node_type, "properties": properties}
        return True

    def get_node(self, node_id: str):
        return self._nodes.get(node_id)

    def get_nodes(self, node_type: Optional[str] = None) -> list[dict]:
        return [n for n in self._nodes.values() if node_type is None or n["type"] == node_type]

    def has_node(self, node_id: str) -> bool:
        return node_id in self._nodes

    def remove_node(self, node_id: str) -> bool:
        if node_id not in self._nodes:
            return False
        del self._nodes[node_id]
        doomed = [k for k, e in self._edges.items() if e["source"] == node_id or e["target"] == node_id]
        for k in doomed:
            del self._edges[k]
        return True

    # -- edge ops ----------------------------------------------------------------

    def add_edge(self, edge_id: str, edge_type: str, source: str, target: str, **properties) -> bool:
        if not self._check(
            "edge", edge_id, edge_type, properties, (edge_id, edge_type) in self._seen_edge_keys
        ):
            return False
        if edge_id in self._edges:
            return False
        # reference Graph.add_edge raises on dangling endpoints
        # (_graph.py:306-309); a silently-accepted dangling edge would later
        # crash find_connected_components' node lookup
        if source not in self._nodes:
            raise ValueError(f"Source node '{source}' does not exist")
        if target not in self._nodes:
            raise ValueError(f"Target node '{target}' does not exist")
        self._edges[edge_id] = {
            "id": edge_id, "type": edge_type, "source": source, "target": target, "properties": properties,
        }
        self._seen_edge_keys.add((edge_id, edge_type))
        return True

    def get_edge(self, edge_id: str):
        return self._edges.get(edge_id)

    def get_edges(self, edge_type: Optional[str] = None) -> list[dict]:
        return [e for e in self._edges.values() if edge_type is None or e["type"] == edge_type]

    def get_edges_between(self, source: str, target: str, edge_type: Optional[str] = None) -> list[dict]:
        return [
            e
            for e in self._edges.values()
            if e["source"] == source and e["target"] == target and (edge_type is None or e["type"] == edge_type)
        ]

    def has_edge(self, edge_id: str) -> bool:
        return edge_id in self._edges

    def remove_edge(self, edge_id: str) -> bool:
        return self._edges.pop(edge_id, None) is not None

    # -- hyperedge ops (reference _graph.py:99-124, 415-491) -----------------------

    def add_hyperedge(self, hyperedge_id: str, hyperedge_type: str, nodes: set, **properties) -> bool:
        if hyperedge_id in self._hyperedges:
            return False
        for node_id in nodes:
            if node_id not in self._nodes:
                raise ValueError(f"Node '{node_id}' does not exist")
        if len(nodes) < 2:
            raise ValueError("Hyperedge must connect at least 2 nodes")
        self._hyperedges[hyperedge_id] = {
            "id": hyperedge_id, "type": hyperedge_type, "nodes": set(nodes), "properties": properties,
        }
        return True

    def get_hyperedge(self, hyperedge_id: str):
        return self._hyperedges.get(hyperedge_id)

    def get_hyperedges(self, hyperedge_type: Optional[str] = None) -> list[dict]:
        return [h for h in self._hyperedges.values() if hyperedge_type is None or h["type"] == hyperedge_type]

    def has_hyperedge(self, hyperedge_id: str) -> bool:
        return hyperedge_id in self._hyperedges

    # -- traversal ------------------------------------------------------------------

    def get_neighbors(self, node_id: str, direction: str = "both") -> set:
        out = {e["target"] for e in self._edges.values() if e["source"] == node_id}
        inc = {e["source"] for e in self._edges.values() if e["target"] == node_id}
        return out if direction == "out" else inc if direction == "in" else out | inc

    def get_connected_edges(self, node_id: str, direction: str = "both") -> list[dict]:
        return [
            e
            for e in self._edges.values()
            if (direction in ("out", "both") and e["source"] == node_id)
            or (direction in ("in", "both") and e["target"] == node_id)
        ]

    def find_paths(self, source: str, target: str, max_length: int = 3) -> list[list[dict]]:
        """All edge-paths from source to target up to max_length hops."""
        paths: list[list[dict]] = []

        def walk(node: str, path: list[dict], visited: set):
            if len(path) >= max_length:
                return
            for e in self._edges.values():
                if e["source"] != node or e["target"] in visited:
                    continue
                nxt = path + [e]
                if e["target"] == target:
                    paths.append(nxt)
                else:
                    walk(e["target"], nxt, visited | {e["target"]})

        walk(source, [], {source})
        return paths

    def find_connected_components(self, node_id: str, max_depth: int = 2) -> dict:
        if node_id not in self._nodes:
            return {"nodes": [], "edges": [], "hyperedges": []}
        # adjacency built ONCE (get_neighbors per frontier node is a full
        # edge scan per node — quadratic on dense components)
        adj: dict[str, set] = {}
        for e in self._edges.values():
            adj.setdefault(e["source"], set()).add(e["target"])
            adj.setdefault(e["target"], set()).add(e["source"])
        seen = {node_id}
        frontier = {node_id}
        for _ in range(max_depth):
            nxt = set()
            for n in frontier:
                nxt |= adj.get(n, set())
            frontier = nxt - seen
            seen |= frontier
            if not frontier:
                break
        # component subgraph, returned with its OWN statistics
        # (reference _workflow.py:475-482 returns subgraph.get_statistics())
        sub = SparkWorkflow(name=self.name, directed=self.directed, schema=self.schema)
        sub._nodes = {n: self._nodes[n] for n in seen}
        sub._edges = {
            k: e for k, e in self._edges.items() if e["source"] in seen and e["target"] in seen
        }
        sub._hyperedges = {
            k: h for k, h in self._hyperedges.items() if set(h["nodes"]) <= seen
        }
        return {
            "nodes": [sub._nodes[n] for n in sorted(sub._nodes)],
            "edges": list(sub._edges.values()),
            "hyperedges": list(sub._hyperedges.values()),
            "statistics": sub.get_statistics(),
        }

    # -- queries (dict views) -----------------------------------------------------------

    def query_nodes(self, node_type: Optional[str] = None) -> list[dict]:
        return self.get_nodes(node_type)

    def query_edges(self, edge_type: Optional[str] = None) -> list[dict]:
        return self.get_edges(edge_type)

    def query_hyperedges(self, hyperedge_type: Optional[str] = None) -> list[dict]:
        return [dict(h, nodes=sorted(h["nodes"])) for h in self.get_hyperedges(hyperedge_type)]

    # -- statistics ----------------------------------------------------------------------

    def get_statistics(self) -> dict:
        def dist(items):
            out: dict[str, int] = {}
            for it in items:
                out[it["type"]] = out.get(it["type"], 0) + 1
            return out

        node_types = dist(self._nodes.values())
        edge_types = dist(self._edges.values())
        hyper_types = dist(self._hyperedges.values())
        # one O(E) endpoint sweep, not get_neighbors per node (O(N*E) —
        # repr()/copy()/to_dict() all route through here); identical
        # semantics incl. self-loops counting as connected
        touched: set = set()
        for e in self._edges.values():
            touched.add(e["source"])
            touched.add(e["target"])
        isolated = sum(1 for n in self._nodes if n not in touched)
        return {
            "basic": {
                "nodes": len(self._nodes),
                "edges": len(self._edges),
                "hyperedges": len(self._hyperedges),
                "node_types": len(node_types),
                "edge_types": len(edge_types),
                "hyperedge_types": len(hyper_types),
            },
            "node_types": node_types,
            "edge_types": edge_types,
            "hyperedge_types": hyper_types,
            "connectivity": {"isolated_nodes": isolated, "connected_nodes": len(self._nodes) - isolated},
        }

    def get_summary(self) -> dict:
        stats = self.get_statistics()
        top = lambda d: sorted(d.items(), key=lambda kv: kv[1], reverse=True)[:5]  # noqa: E731
        return {
            "name": self.name,
            "total_nodes": stats["basic"]["nodes"],
            "total_edges": stats["basic"]["edges"],
            "total_hyperedges": stats["basic"]["hyperedges"],
            "top_node_types": top(stats["node_types"]),
            "top_edge_types": top(stats["edge_types"]),
            "connectivity": stats["connectivity"],
        }

    # -- schema ---------------------------------------------------------------------------

    def get_schema(self) -> Optional[dict]:
        return self.schema

    def export_schema(self, filepath: str) -> None:
        if self.schema:
            import yaml

            with open(filepath, "w") as fh:
                yaml.dump(self.schema, fh, default_flow_style=False)

    # -- serialization (reference Graph.to_dict shape, _graph.py:535-548) -------------------

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "directed": self.directed,
            "nodes": list(self._nodes.values()),
            "edges": list(self._edges.values()),
            "hyperedges": [dict(h, nodes=sorted(h["nodes"])) for h in self._hyperedges.values()],
            "statistics": self.get_statistics(),
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict())

    def from_json(self, json_data: str) -> None:
        data = json.loads(json_data)
        self.name = data.get("name", self.name)
        self.directed = data.get("directed", True)
        self._nodes = {n["id"]: n for n in data.get("nodes", [])}
        self._edges = {e["id"]: e for e in data.get("edges", [])}
        self._hyperedges = {h["id"]: dict(h, nodes=set(h["nodes"])) for h in data.get("hyperedges", [])}

    def save(self, filepath: str) -> None:
        with open(filepath, "w") as fh:
            fh.write(self.to_json())

    def load(self, filepath: str) -> None:
        with open(filepath) as fh:
            self.from_json(fh.read())

    # -- utilities -------------------------------------------------------------------------

    def clear(self) -> None:
        self._nodes, self._edges, self._hyperedges = {}, {}, {}

    def copy(self) -> "SparkWorkflow":
        # reference-faithful: the reference copy() likewise forwards only
        # name/directed/schema and silently drops validation_mode and
        # deduplication (_workflow.py:651-661); mirrored for API parity
        new = SparkWorkflow(name=self.name, directed=self.directed, schema=self.schema)
        new.from_json(self.to_json())
        return new

    def __len__(self) -> int:
        return len(self._nodes)

    def __contains__(self, node_id: str) -> bool:
        return node_id in self._nodes

    def __str__(self) -> str:
        basic = self.get_statistics()["basic"]
        return (
            f"SparkWorkflow(name='{self.name}', nodes={basic['nodes']}, "
            f"edges={basic['edges']}, hyperedges={basic['hyperedges']})"
        )

    __repr__ = __str__

    # -- exports ----------------------------------------------------------------------------

    def to_networkx(self):
        import networkx as nx

        g = nx.DiGraph() if self.directed else nx.Graph()
        for n in self._nodes.values():
            g.add_node(n["id"], type=n["type"], **n["properties"])
        for e in self._edges.values():
            g.add_edge(e["source"], e["target"], id=e["id"], type=e["type"], **e["properties"])
        return g

    def to_pandas(self):
        import pandas as pd

        return {
            "nodes": pd.DataFrame(self._nodes.values()),
            "edges": pd.DataFrame(self._edges.values()),
        }

    def to_spark_graph(self, spark):
        """Materialize into SparkGraph DataFrames — the scale bridge: every
        distributed graph operator (components, statistics, anti-join
        removal, path joins) applies from here on."""
        from .graph import SparkGraph

        node_rows = [
            (n["id"], n["type"], {k: json.dumps(v) for k, v in n["properties"].items()})
            for n in self._nodes.values()
        ]
        edge_rows = [
            (e["id"], e["source"], e["target"], e["type"], {k: json.dumps(v) for k, v in e["properties"].items()})
            for e in self._edges.values()
        ]
        hyper_rows = [
            (h["id"], h["type"], sorted(h["nodes"]), {k: json.dumps(v) for k, v in h["properties"].items()})
            for h in self._hyperedges.values()
        ]
        nodes = spark.createDataFrame(
            node_rows, "node_id string, node_label string, props map<string,string>"
        )
        edges = spark.createDataFrame(
            edge_rows,
            "relationship_id string, source_id string, target_id string, "
            "relationship_label string, props map<string,string>",
        )
        g = SparkGraph(nodes, edges)
        if hyper_rows:
            hyper = spark.createDataFrame(
                hyper_rows,
                "hyperedge_id string, hyperedge_type string, node_ids array<string>, props map<string,string>",
            )
            g = g.add_hyperedges(hyper)
        return g


def create_workflow(name: str = "workflow_graph", **kwargs) -> SparkWorkflow:
    """Factory mirroring the reference ``create_workflow``
    (/root/reference/biocypher/_workflow.py:767-798)."""
    return SparkWorkflow(name=name, **kwargs)
