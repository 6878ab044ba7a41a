"""AIRR (Adaptive Immune Receptor Repertoire) in-memory KG (S13).

Spark-first re-expression of the reference ``AirrKG``
(``biocypher/output/in_memory/_airr.py:21-499``): receptor-chain nodes are
paired via chain-pairing edges and matched to epitope (metadata) nodes via
binding edges, producing one "AIRR cell" row per (cell, epitope).

Where the reference walks Python dict/set adjacency lists per edge, this
implementation is pure DataFrame algebra — the pairing strategies are joins:

- ``indirect_pairings=True``: a paired cell is created when EITHER chain of a
  pairing edge binds an epitope (union of the two chains' epitope sets; the
  pairing-edge side is exploded and joined to the binding edges).
- ``indirect_pairings=False``: shared epitopes (both sides) yield the paired
  cell; side-exclusive epitopes yield per-chain unpaired cells
  (reference ``_process_paired_chains``, ``_airr.py:188-298``).
- Chains that bind epitopes but appear in no pairing edge become unpaired
  cells (reference ``_process_unpaired_chains``, ``_airr.py:300-343``).

A cell with k epitopes becomes k rows: the first keeps the base cell id, the
rest get ``_meta{i}`` suffixes (reference ``add_metadata``,
``_airr.py:460-499``). Deviation: the reference enumerates epitopes in
set-iteration order (nondeterministic); here epitopes are ordered
lexicographically so cell ids are deterministic.

The scirpy ``AirrCell`` dependency is not installed (and a distributed result
should not round-trip through driver-side cell objects anyway): a cell is a
row ``(cell_id, is_paired, data_source, chains array<map>, metadata map)``
where each chain map carries the node's properties plus the AIRR fields
``locus`` / ``consensus_count`` / ``productive`` / ``validated_epitope``
(reference ``_generate_airr_cell``, ``_airr.py:419-458``). Chain/metadata
property values are strings (Spark maps are homogeneously typed).
"""

from __future__ import annotations

from typing import Iterable, Optional, Union

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_INTERNAL_PROPERTIES = ("node_id", "node_label", "id", "preferred_id")

_NODE_SCHEMA = "node_id string, node_label string, props map<string,string>"
_EDGE_SCHEMA = (
    "source_id string, target_id string, relationship_id string, "
    "relationship_label string, props map<string,string>"
)


class AirrKG:
    """Chain-pairing + epitope-binding KG -> AIRR cell DataFrame."""

    def __init__(self, spark: SparkSession, metadata_entity_type: str = "epitope"):
        self.spark = spark
        self.metadata_entity_type = metadata_entity_type
        self._nodes: Optional[DataFrame] = None
        self._edges: Optional[DataFrame] = None

    # -- ingestion ------------------------------------------------------------

    def _coerce_nodes(self, nodes: Union[DataFrame, Iterable]) -> DataFrame:
        if isinstance(nodes, DataFrame):
            return nodes.select("node_id", "node_label", "props")
        rows = [(i, lab, {k: str(v) for k, v in (props or {}).items()}) for i, lab, props in nodes]
        return self.spark.createDataFrame(rows, _NODE_SCHEMA)

    def _coerce_edges(self, edges: Union[DataFrame, Iterable]) -> DataFrame:
        if isinstance(edges, DataFrame):
            cols = edges.columns
            out = edges
            if "relationship_id" not in cols:
                out = out.withColumn(
                    "relationship_id", F.concat_ws("-", "source_id", "target_id")
                )
            if "props" not in cols:
                out = out.withColumn("props", F.lit(None).cast("map<string,string>"))
            return out.select(
                "source_id", "target_id", "relationship_id", "relationship_label", "props"
            )
        rows = [
            (src, tgt, rid, lab, {k: str(v) for k, v in (props or {}).items()})
            for src, tgt, rid, lab, props in edges
        ]
        return self.spark.createDataFrame(rows, _EDGE_SCHEMA)

    def add_nodes(self, nodes: Union[DataFrame, Iterable]) -> None:
        df = self._coerce_nodes(nodes)
        self._nodes = df if self._nodes is None else self._nodes.unionByName(df)

    def add_edges(self, edges: Union[DataFrame, Iterable]) -> None:
        df = self._coerce_edges(edges)
        self._edges = df if self._edges is None else self._edges.unionByName(df)

    # -- conversion ------------------------------------------------------------

    def get_kg(self, indirect_pairings: bool = True) -> DataFrame:
        """AIRR cell DataFrame; raises if nothing was added
        (reference ``_to_airr_cells``, ``_airr.py:362-365``)."""
        if self._nodes is None and self._edges is None:
            raise ValueError("No entities provided for conversion.")
        meta = self.metadata_entity_type
        nodes = self._nodes if self._nodes is not None else self.spark.createDataFrame([], _NODE_SCHEMA)
        edges = self._edges if self._edges is not None else self.spark.createDataFrame([], _EDGE_SCHEMA)

        epitope_nodes = nodes.filter(F.col("node_label") == meta)
        seq_nodes = nodes.filter(F.col("node_label") != meta)
        # binding edges mention the metadata type in the relationship label;
        # every other edge type is a chain-pairing edge (_airr.py:159-165)
        is_binding = F.lower(F.col("relationship_label")).contains(meta.lower())
        bind = edges.filter(is_binding).select(
            F.col("source_id").alias("chain_id"), F.col("target_id").alias("epitope_id")
        ).distinct()
        pair = edges.filter(~is_binding).select(
            F.col("relationship_id").alias("edge_id"),
            F.col("source_id").alias("src"),
            F.col("target_id").alias("tgt"),
        )

        binds_any = bind.select("chain_id").distinct().withColumn("validated", F.lit(True))
        clean_props = F.map_filter("props", lambda k, _v: ~k.isin(*_INTERNAL_PROPERTIES))
        chain_maps = (
            seq_nodes.join(binds_any, seq_nodes.node_id == binds_any.chain_id, "left")
            .select(
                F.col("node_id").alias("chain_id"),
                F.map_concat(
                    F.coalesce(clean_props, F.create_map().cast("map<string,string>")),
                    F.create_map(
                        F.lit("locus"),
                        F.upper(F.replace("node_label", F.lit(" sequence"), F.lit(""))),
                        F.lit("consensus_count"), F.lit("0"),
                        F.lit("productive"), F.lit("true"),
                        F.lit("validated_epitope"),
                        F.when(F.col("validated"), F.lit("true")).otherwise(F.lit("false")),
                    ),
                ).alias("chain"),
            )
        )

        # (edge_id, side, epitope_id): each pairing edge exploded to its two
        # chains, joined to the binding edges
        sides = pair.select(
            "edge_id", "src", "tgt",
            F.explode(
                F.array(
                    F.struct(F.lit("src").alias("side"), F.col("src").alias("chain_id")),
                    F.struct(F.lit("tgt").alias("side"), F.col("tgt").alias("chain_id")),
                )
            ).alias("s"),
        ).select("edge_id", "src", "tgt", "s.side", "s.chain_id")
        cand = sides.join(bind, "chain_id").select("edge_id", "src", "tgt", "side", "epitope_id")

        if indirect_pairings:
            paired = (
                cand.groupBy("edge_id", "src", "tgt", "epitope_id")
                .agg(F.count(F.lit(1)))
                .select(
                    F.col("edge_id").alias("base_id"),
                    F.col("src").alias("chain_a"),
                    F.col("tgt").alias("chain_b"),
                    "epitope_id",
                    F.lit(True).alias("is_paired"),
                )
            )
        else:
            by_sides = cand.groupBy("edge_id", "src", "tgt", "epitope_id").agg(
                F.collect_set("side").alias("sides")
            )
            both = F.size("sides") == 2
            shared = by_sides.filter(both).select(
                F.col("edge_id").alias("base_id"),
                F.col("src").alias("chain_a"),
                F.col("tgt").alias("chain_b"),
                "epitope_id",
                F.lit(True).alias("is_paired"),
            )
            solo_chain = F.when(F.col("sides")[0] == "src", F.col("src")).otherwise(F.col("tgt"))
            exclusive = by_sides.filter(~both).select(
                F.concat(F.lit("unpaired_"), solo_chain).alias("base_id"),
                solo_chain.alias("chain_a"),
                F.lit(None).cast("string").alias("chain_b"),
                "epitope_id",
                F.lit(False).alias("is_paired"),
            ).distinct()
            paired = shared.unionByName(exclusive)

        # chains never mentioned by a pairing edge -> unpaired cells
        paired_chain_ids = sides.select("chain_id").distinct()
        unpaired = (
            bind.join(paired_chain_ids, "chain_id", "left_anti")
            .select(
                F.concat(F.lit("unpaired_"), "chain_id").alias("base_id"),
                F.col("chain_id").alias("chain_a"),
                F.lit(None).cast("string").alias("chain_b"),
                "epitope_id",
                F.lit(False).alias("is_paired"),
            )
        )
        cells = paired.unionByName(unpaired)

        # attach epitope metadata (inner join: a cell only exists when its
        # epitope node is present — _airr.py:229-230) and number multi-epitope
        # cells deterministically
        ep_props = epitope_nodes.select(
            F.col("node_id").alias("epitope_id"), clean_props.alias("metadata")
        )
        cells = cells.join(ep_props, "epitope_id")
        rn = F.row_number().over(Window.partitionBy("base_id").orderBy("epitope_id"))
        cells = cells.withColumn("rn", rn).withColumn(
            "cell_id",
            F.when(F.col("rn") == 1, F.col("base_id")).otherwise(
                F.concat("base_id", F.lit("_meta"), F.col("rn").cast("string"))
            ),
        )

        a = chain_maps.select(F.col("chain_id").alias("chain_a"), F.col("chain").alias("_ca"))
        b = chain_maps.select(F.col("chain_id").alias("chain_b"), F.col("chain").alias("_cb"))
        out = (
            cells.join(a, "chain_a", "left")
            .join(b, "chain_b", "left")
            .select(
                "cell_id",
                F.filter(F.array("_ca", "_cb"), lambda c: c.isNotNull()).alias("chains"),
                "metadata",
                F.lit("BioCypher").alias("data_source"),
                "is_paired",
            )
        )
        return out

    def to_cells(self, indirect_pairings: bool = True) -> list:
        """Collected list of dicts with epitope metadata merged at top level
        (the reference ``AirrCell`` access pattern, for small graphs/tests)."""
        rows = self.get_kg(indirect_pairings).collect()
        cells = []
        for r in sorted(rows, key=lambda r: r["cell_id"]):
            d = {
                "cell_id": r["cell_id"],
                "chains": [dict(c) for c in r["chains"]],
                "data_source": r["data_source"],
                "is_paired": r["is_paired"],
            }
            d.update(dict(r["metadata"] or {}))
            cells.append(d)
        return cells
