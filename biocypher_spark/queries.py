"""Operator harness: every implemented operator exposed as a (spark, sf_dir)
query with a DuckDB oracle (driver contract, /root/repo/__spark_entry__.py).

Each query exercises real engine modules (translator, dedup, writer label
closure, graph layer, linking, components, text/similarity operators) over
the driver-generated TPC-H-ish tables so DuckDB can verify row-for-row.
Float outputs are rounded to 6 decimals on both sides; money sums are done
in DECIMAL on both sides so the resulting doubles are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .extract import extract_mentions, normalize_surface
from .graph import SparkGraph
from .mapping import SchemaMapping
from .model import SEQ
from .ontology import NullOntology, Ontology
from .operators.components import connected_components
from .translate import SparkTranslator

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# KG-construction operators over relational testdata
# ---------------------------------------------------------------------------

_PART_SCHEMA = {
    "economy part": {
        "represented_as": "node",
        "preferred_id": "part",
        "input_label": "ECONOMY",
        "properties": {"name": "str", "retail": "float"},
    },
    "standard part": {
        "represented_as": "node",
        "preferred_id": "part",
        "input_label": "STANDARD",
    },
    "order event": {
        "represented_as": "node",
        "preferred_id": "id",
        "input_label": "ordered",
    },
}

_GAZETTEER = r"\b(?:spark|scan|join|merge|sort|window|hash|stream|batch|dup)\b"


def _part_translator(spark) -> SparkTranslator:
    return SparkTranslator(spark, NullOntology(SchemaMapping(schema=dict(_PART_SCHEMA))))


def _staged_part_nodes(spark, sf_dir) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        F.concat(F.lit("p"), F.col("p_partkey").cast("string")).alias("id"),
        F.col("p_type").alias("input_label"),
        F.map_from_arrays(
            F.array(F.lit("name"), F.lit("retail")),
            F.array(
                F.to_json(F.array("p_name")).substr(F.lit(2), F.length(F.to_json(F.array("p_name"))) - F.lit(2)),
                F.col("p_retailprice").cast("string"),
            ),
        ).alias("props"),
        F.col("p_partkey").cast("long").alias(SEQ),
    )


@register(
    "kg_translate_nodes",
    """
    SELECT 'p' || p_partkey AS node_id,
           CASE p_type WHEN 'ECONOMY' THEN 'economy part' ELSE 'standard part' END AS node_label,
           'part' AS preferred_id
    FROM part WHERE p_type IN ('ECONOMY', 'STANDARD')
    """,
)
def kg_translate_nodes(spark, sf_dir):
    """T1: broadcast-join label mapping with preferred-id attachment."""
    out = _part_translator(spark).translate_nodes(_staged_part_nodes(spark, sf_dir))
    return out.nodes.select("node_id", "node_label", "preferred_id")


@register(
    "kg_missing_types",
    """
    SELECT p_type AS input_label, count(*) AS count
    FROM part WHERE p_type NOT IN ('ECONOMY', 'STANDARD')
    GROUP BY p_type
    """,
)
def kg_missing_types(spark, sf_dir):
    """T5: unmapped input labels -> metrics table."""
    out = _part_translator(spark).translate_nodes(_staged_part_nodes(spark, sf_dir))
    return out.missing


@register(
    "kg_dedup_nodes",
    """
    SELECT 'p' || l_partkey AS node_id,
           min(l_orderkey * 10 + l_linenumber) AS first_seq
    FROM lineitem GROUP BY l_partkey
    """,
)
def kg_dedup_nodes(spark, sf_dir):
    """D1: global first-wins node dedup keyed on node_id."""
    from .dedup import dedup_nodes

    li = _t(spark, sf_dir, "lineitem")
    staged = li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("node_id"),
        F.lit("part").alias("node_label"),
        F.lit("part").alias("preferred_id"),
        F.create_map().cast("map<string,string>").alias("props"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long").alias(SEQ),
    )
    res = dedup_nodes(staged)
    return res.kept.select("node_id", F.col(SEQ).alias("first_seq"))


@register(
    "kg_dup_metrics",
    """
    SELECT 'p' || l_partkey AS dup_id, count(*) - 1 AS extra
    FROM lineitem GROUP BY l_partkey HAVING count(*) > 1
    """,
)
def kg_dup_metrics(spark, sf_dir):
    """D4: duplicate-occurrence metrics."""
    li = _t(spark, sf_dir, "lineitem")
    node_id = F.concat(F.lit("p"), F.col("l_partkey").cast("string"))
    return (
        li.groupBy(node_id.alias("dup_id"))
        .agg((F.count(F.lit(1)) - 1).alias("extra"))
        .filter(F.col("extra") > 0)
    )


@register(
    "kg_rel_as_node",
    """
    SELECT 'c' || o_custkey AS source_id, 'c' || o_custkey || '_o' || o_orderkey || '_True' AS target_id,
           'IS_SOURCE_OF' AS relationship_label
    FROM orders
    UNION ALL
    SELECT 'o' || o_orderkey, 'c' || o_custkey || '_o' || o_orderkey || '_True', 'IS_TARGET_OF'
    FROM orders
    """,
)
def kg_rel_as_node(spark, sf_dir):
    """T2: rel-as-node 1->3 explode with synthesized node ids."""
    orders = _t(spark, sf_dir, "orders")
    staged = orders.select(
        F.lit(None).cast("string").alias("id"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("tgt"),
        F.lit("ordered").alias("input_label"),
        F.map_from_arrays(F.array(F.lit("directed")), F.array(F.lit("true"))).alias("props"),
        F.col("o_orderkey").cast("long").alias(SEQ),
    )
    out = _part_translator(spark).translate_edges(staged)
    return out.ran_edges.select("source_id", "target_id", "relationship_label")


@register(
    "kg_statistics",
    """
    SELECT 'part' AS label, count(*) AS cnt FROM part
    UNION ALL SELECT 'customer', count(*) FROM customer
    UNION ALL SELECT 'supplier', count(*) FROM supplier
    """,
)
def kg_statistics(spark, sf_dir):
    """D7: per-type node counts through the graph layer."""
    nodes = (
        _t(spark, sf_dir, "part")
        .select(F.concat(F.lit("p"), "p_partkey").alias("node_id"), F.lit("part").alias("node_label"))
        .unionByName(
            _t(spark, sf_dir, "customer").select(
                F.concat(F.lit("c"), "c_custkey").alias("node_id"), F.lit("customer").alias("node_label")
            )
        )
        .unionByName(
            _t(spark, sf_dir, "supplier").select(
                F.concat(F.lit("s"), "s_suppkey").alias("node_id"), F.lit("supplier").alias("node_label")
            )
        )
    )
    g = SparkGraph(nodes, nodes.limit(0).select(
        F.col("node_id").alias("source_id"), F.col("node_id").alias("target_id"), F.lit("x").alias("relationship_label")
    ))
    return g.node_type_counts()


@register(
    "kg_topk_types",
    """
    SELECT l_returnflag || l_linestatus AS label, count(*) AS cnt
    FROM lineitem GROUP BY 1 ORDER BY cnt DESC, label ASC LIMIT 5
    """,
)
def kg_topk_types(spark, sf_dir):
    """D8: top-k type summary with deterministic tie-break."""
    li = _t(spark, sf_dir, "lineitem")
    nodes = li.select(
        F.concat("l_orderkey", F.lit("_"), "l_linenumber").alias("node_id"),
        F.concat("l_returnflag", "l_linestatus").alias("node_label"),
    )
    g = SparkGraph(nodes, nodes.limit(0).select(
        F.col("node_id").alias("source_id"), F.col("node_id").alias("target_id"), F.lit("x").alias("relationship_label")
    ))
    return g.top_k_types(5)


@register(
    "kg_graph_neighbors",
    """
    SELECT 'c' || c_custkey AS neighbor FROM customer WHERE c_nationkey = 5
    """,
)
def kg_graph_neighbors(spark, sf_dir):
    """G2: neighbor lookup via edge join."""
    cust = _t(spark, sf_dir, "customer")
    edges = cust.select(
        F.concat(F.lit("c"), "c_custkey").alias("source_id"),
        F.concat(F.lit("n"), "c_nationkey").alias("target_id"),
        F.lit("IN_NATION").alias("relationship_label"),
    )
    g = SparkGraph(edges.select(F.col("source_id").alias("node_id"), F.lit("customer").alias("node_label")), edges)
    return g.get_neighbors("n5", direction="in").select(F.col("neighbor"))


@register(
    "kg_graph_paths",
    """
    SELECT 'n' || n_nationkey AS dst, 1 AS hops FROM nation WHERE n_regionkey = 0
    UNION ALL
    SELECT 'c' || c_custkey, 2
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_regionkey = 0
    """,
)
def kg_graph_paths(spark, sf_dir):
    """G3: bounded path enumeration from 'r0' (region->nation->customer)."""
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    edges = nation.select(
        F.concat(F.lit("r"), "n_regionkey").alias("source_id"),
        F.concat(F.lit("n"), "n_nationkey").alias("target_id"),
        F.lit("HAS_NATION").alias("relationship_label"),
    ).unionByName(
        cust.select(
            F.concat(F.lit("n"), "c_nationkey").alias("source_id"),
            F.concat(F.lit("c"), "c_custkey").alias("target_id"),
            F.lit("HAS_CUSTOMER").alias("relationship_label"),
        )
    )
    g = SparkGraph(edges.select(F.col("source_id").alias("node_id"), F.lit("x").alias("node_label")), edges)
    return g.find_paths("r0", max_length=2).select("dst", "hops")


@register(
    "kg_connected_components",
    """
    WITH nodes AS (
      SELECT 'r' || r_regionkey AS node, r_regionkey AS rk FROM region
      UNION ALL SELECT 'n' || n_nationkey, n_regionkey FROM nation
      UNION ALL SELECT 'c' || c_custkey, n.n_regionkey
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT node, min(node) OVER (PARTITION BY rk) AS comp FROM nodes
    """,
)
def kg_connected_components(spark, sf_dir):
    """G4: iterative-join connected components on the geo forest."""
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    edges = nation.select(
        F.concat(F.lit("n"), "n_nationkey").alias("src"), F.concat(F.lit("r"), "n_regionkey").alias("dst")
    ).unionByName(
        cust.select(F.concat(F.lit("c"), "c_custkey").alias("src"), F.concat(F.lit("n"), "c_nationkey").alias("dst"))
    )
    return connected_components(edges).select("node", "comp")


@register(
    "kg_label_closure",
    """
    SELECT DISTINCT p_type AS input_label,
      CASE p_type
        WHEN 'ECONOMY' THEN '''EconomyPart|Part|NamedThing'''
        WHEN 'STANDARD' THEN '''StandardPart|Part|NamedThing'''
      END AS label_string
    FROM part WHERE p_type IN ('ECONOMY', 'STANDARD')
    """,
)
def kg_label_closure(spark, sf_dir):
    """O1/O2: ancestor :LABEL strings precomputed driver-side, broadcast."""
    mapping = SchemaMapping(schema={k: dict(v) for k, v in _PART_SCHEMA.items() if k != "order event"})
    onto = Ontology(mapping, parent_map={"economy part": "part", "standard part": "part", "part": "named thing"})
    from .writer.neo4j import Neo4jBatchWriter  # label-string logic

    translator = SparkTranslator(spark, onto)
    import tempfile

    bw = Neo4jBatchWriter(spark, translator, tempfile.mkdtemp(prefix="labels_"))
    amap = {
        "ECONOMY": bw._all_labels("economy part", "Ascending"),
        "STANDARD": bw._all_labels("standard part", "Ascending"),
    }
    part = _t(spark, sf_dir, "part").filter(F.col("p_type").isin(*amap)).select("p_type").distinct()
    expr = F.when(F.col("p_type") == "ECONOMY", F.lit(amap["ECONOMY"])).otherwise(F.lit(amap["STANDARD"]))
    return part.select(F.col("p_type").alias("input_label"), expr.alias("label_string"))


@register(
    "kg_canonicalize_blocking",
    """
    SELECT p_partkey,
           min('p' || p_partkey) OVER (
             PARTITION BY regexp_replace(lower(p_name), '[^a-z0-9]', '', 'g')
           ) AS canonical_id
    FROM part
    """,
)
def kg_canonicalize_blocking(spark, sf_dir):
    """Linking stage 1: normalized-key blocking -> canonical representative."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy(normalize_surface(F.col("p_name")))
    return part.select(
        "p_partkey",
        F.min(F.concat(F.lit("p"), F.col("p_partkey").cast("string"))).over(w).alias("canonical_id"),
    )


@register(
    "kg_extract_mentions",
    f"""
    SELECT doc_id, unnest(regexp_extract_all(text, '{_GAZETTEER}')) AS surface
    FROM documents
    """,
)
def kg_extract_mentions(spark, sf_dir):
    """Flagship extraction (mapInPandas) over documents-as-transcripts."""
    docs = _t(spark, sf_dir, "documents")
    transcripts = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.col("text"),
    )
    mentions = extract_mentions(transcripts, patterns={"op": _GAZETTEER})
    return mentions.select(F.col("conv_id").cast("bigint").alias("doc_id"), "surface")


@register(
    "kg_cooccurrence_triples",
    f"""
    WITH m AS (
      SELECT DISTINCT doc_id, unnest(regexp_extract_all(text, '{_GAZETTEER}')) AS w
      FROM documents
    )
    SELECT DISTINCT a.w AS subj, 'CO_OCCURS_WITH' AS pred, b.w AS obj
    FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.w < b.w
    """,
)
def kg_cooccurrence_triples(spark, sf_dir):
    """Flagship triple construction: extraction -> per-doc co-occurrence ->
    dedup -> (subj, pred, obj)."""
    mentions = kg_extract_mentions(spark, sf_dir).select("doc_id", F.col("surface").alias("w")).distinct()
    a = mentions.alias("a")
    b = mentions.alias("b")
    return (
        a.join(b, "doc_id")
        .filter(F.col("a.w") < F.col("b.w"))
        .select(F.col("a.w").alias("subj"), F.lit("CO_OCCURS_WITH").alias("pred"), F.col("b.w").alias("obj"))
        .distinct()
    )
