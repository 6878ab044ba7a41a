"""End-to-end KG-construction pipeline: the north-rule DAG.

read transcripts -> mention detection (mapInPandas) -> entity linking +
canonicalization (blocked similarity join + connected components) ->
triple construction -> schema translate (broadcast join) -> dedup (shuffle)
-> Neo4j-admin-import batch layout, with per-partition lineage and metrics
tables and checkpoint-resume per stage.

Checkpoint model: each stage materializes to ``{run_dir}/{stage}`` parquet;
on resume, stages whose output has a ``_SUCCESS`` marker are *read back*
instead of recomputed. Lineage rows are keyed by conv_id hash-bucket ranges
so a re-run can both verify coverage and re-process only missing buckets.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import extract_mentions, extract_mentions_expr
from .linking import link_mentions
from .mapping import SchemaMapping
from .model import SEQ
from .ontology import NullOntology
from .translate import SparkTranslator, _json_str
from .writer.neo4j import Neo4jBatchWriter

DEFAULT_SCHEMA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "config", "transcripts_schema.yaml")

# embedded fallback for spark-submit --py-files deployments where the repo's
# config/ directory is not on the local filesystem (zip import)
DEFAULT_SCHEMA_DICT: dict = {
    "protein": {
        "represented_as": "node",
        "preferred_id": "canon",
        "input_label": "protein",
        "properties": {"name": "str"},
    },
    "disease": {
        "represented_as": "node",
        "preferred_id": "canon",
        "input_label": "disease",
        "properties": {"name": "str"},
    },
    "protein protein interaction": {
        "represented_as": "edge",
        "label_as_edge": "INTERACTS_WITH",
        "input_label": "protein_protein",
        "properties": {"turns": "int"},
    },
    "protein disease association": {
        "represented_as": "edge",
        "label_as_edge": "LINKED_TO",
        "input_label": "protein_disease",
        "properties": {"turns": "int"},
    },
}

_LINEAGE_BUCKETS = 16


def load_default_schema_mapping() -> SchemaMapping:
    """The default transcripts schema, resolved across deployment modes:

    1. the repo checkout's ``config/transcripts_schema.yaml``;
    2. a ``--py-files biocypher_spark.zip`` deployment, where the yaml
       travels INSIDE the zip (``os.path.exists`` is False for zip members,
       so it is read through ``zipfile``) — local and cluster runs share one
       schema file instead of silently diverging;
    3. the embedded ``DEFAULT_SCHEMA_DICT`` as the last resort.
    """
    if os.path.exists(DEFAULT_SCHEMA):
        return SchemaMapping(DEFAULT_SCHEMA)
    if ".zip" in DEFAULT_SCHEMA:
        zpath, _, member = DEFAULT_SCHEMA.partition(".zip")
        try:
            import zipfile

            import yaml

            with zipfile.ZipFile(zpath + ".zip") as zf:
                data = yaml.safe_load(zf.read(member.lstrip("/\\").replace(os.sep, "/")))
            if data:
                return SchemaMapping(schema=data)
        except (OSError, KeyError, zipfile.BadZipFile):
            # BadZipFile is a direct Exception subclass (not OSError): a
            # truncated py-files artifact must still fall through to the
            # embedded schema instead of crashing pipeline construction
            pass
    return SchemaMapping(schema={k: dict(v) for k, v in DEFAULT_SCHEMA_DICT.items()})


@dataclass
class PipelineResult:
    nodes: DataFrame
    edges: DataFrame
    mentions: DataFrame
    missing_types: DataFrame
    duplicate_nodes: Optional[DataFrame]
    duplicate_edges: Optional[DataFrame]
    lineage_path: str
    counts: dict = field(default_factory=dict)
    metrics_path: str = ""

    def triples(self) -> DataFrame:
        """(subj, pred, obj) view of the constructed graph."""
        return self.edges.select(
            F.col("source_id").alias("subj"),
            F.col("relationship_label").alias("pred"),
            F.col("target_id").alias("obj"),
        )


class KGPipeline:
    """Checkpoint-resumable transcripts -> knowledge-graph pipeline."""

    def __init__(
        self,
        spark: SparkSession,
        output_directory: str,
        schema_config_path: str = DEFAULT_SCHEMA,
        run_dir: Optional[str] = None,
        strict_mode: bool = False,
        link_threshold: float = 0.35,
        use_pandas_extraction: bool = True,
    ):
        from .writer.base import require_local_dir

        # the CSV batch layout, resume markers, and stale-part wipe all go
        # through the LOCAL filesystem (os.path/glob), mirroring the
        # reference: neo4j-admin import itself consumes a local directory.
        self.spark = spark
        self.outdir = require_local_dir(output_directory, "pipeline batch")
        self.run_dir = run_dir or os.path.join(output_directory, "_run")
        os.makedirs(self.run_dir, exist_ok=True)
        if schema_config_path == DEFAULT_SCHEMA:
            self.mapping = load_default_schema_mapping()
        else:
            self.mapping = SchemaMapping(schema_config_path)
        self.translator = SparkTranslator(spark, NullOntology(self.mapping), strict_mode=strict_mode)
        self.link_threshold = link_threshold
        self.use_pandas_extraction = use_pandas_extraction
        self._lineage_rows: list[tuple] = []

    # -- checkpoint helpers -------------------------------------------------

    def _stage_path(self, stage: str) -> str:
        return os.path.join(self.run_dir, stage)

    def _is_done(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._stage_path(stage), "_SUCCESS"))

    def _checkpoint(self, stage: str, df: DataFrame, resume: bool) -> DataFrame:
        """Materialize a stage (or read it back when resuming)."""
        path = self._stage_path(stage)
        if resume and self._is_done(stage):
            return self.spark.read.parquet(path)
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    def _wipe_stale_parts(self) -> None:
        """Remove {Label}-part*.csv left by a partially-completed previous run
        (the pipeline owns its output directory)."""
        import glob

        for f in glob.glob(os.path.join(self.outdir, "*-part*.csv")):
            os.remove(f)

    def _record_lineage(self, stage: str, df: DataFrame, key_col: str = "conv_id") -> None:
        """Per-partition lineage: rows per conv_id hash bucket."""
        if key_col not in df.columns:
            self._lineage_rows.append((stage, "all", "done", df.count(), int(time.time())))
            return
        rows = (
            df.groupBy(F.pmod(F.xxhash64(key_col), F.lit(_LINEAGE_BUCKETS)).alias("bucket"))
            .count()
            .collect()
        )
        for r in rows:
            self._lineage_rows.append((stage, f"bucket={r['bucket']}", "done", r["count"], int(time.time())))

    def _flush_metrics(self, counts: dict, stage_secs: dict) -> str:
        """Metrics table (north rule: lineage + metrics tables): one row per
        (metric, value) — row counts per stage plus wall seconds per stage."""
        rows = [(f"rows_{k}", float(v)) for k, v in counts.items()]
        rows += [(f"sec_{k}", round(float(v), 3)) for k, v in stage_secs.items()]
        path = os.path.join(self.run_dir, "metrics")
        df = self.spark.createDataFrame(rows, "metric string, value double")
        df.withColumn("ts", F.current_timestamp()).coalesce(1).write.mode("overwrite").parquet(path)
        return path

    def _flush_lineage(self) -> str:
        path = os.path.join(self.run_dir, "lineage")
        df = self.spark.createDataFrame(
            self._lineage_rows, "stage string, partition_key string, status string, rows long, ts long"
        )
        df.withColumn("ts", F.timestamp_seconds("ts")).write.mode("overwrite").parquet(path)
        return path

    # -- triple construction --------------------------------------------------

    def _build_tuples(self, linked: DataFrame) -> tuple[DataFrame, DataFrame]:
        return build_triple_tuples(linked, edge_labels=edge_input_labels(self.mapping))

    # -- run --------------------------------------------------------------------

    def run(self, transcripts: DataFrame, resume: bool = False, patterns: Optional[dict] = None) -> PipelineResult:
        # fresh lineage per run(): a retry on the same object must not carry
        # the failed attempt's rows (per-bucket counts would double and the
        # coverage check could no longer tell once-processed from twice)
        self._lineage_rows = []
        stage_secs: dict[str, float] = {}
        t0 = time.time()
        # resume handling lives entirely inside _checkpoint (read-back when
        # the stage's _SUCCESS exists); building the stage DataFrame first
        # is free — DAG construction is lazy, no job runs on the skip path
        fn = extract_mentions if self.use_pandas_extraction else extract_mentions_expr
        mentions = self._checkpoint("mentions", fn(transcripts, patterns), resume)
        self._record_lineage("mentions", mentions)
        stage_secs["mentions"] = time.time() - t0

        t0 = time.time()
        linked = self._checkpoint("linked", link_mentions(mentions, self.link_threshold), resume)
        self._record_lineage("linked", linked)
        stage_secs["linked"] = time.time() - t0

        t0 = time.time()
        node_tuples, edge_tuples = self._build_tuples(linked)
        # pin the tuple frames (distinct entities / aggregated pairs — tiny
        # next to the corpus): the writer emission, the parquet checkpoints,
        # and the missing-type frame each run their own action, and without
        # the pin every one re-executes the corpus-scale co-occurrence
        # shuffle from the linked checkpoint (the translate DAG ran 2-3x per
        # run; same fix stream_kg applies per micro-batch)
        from .materialize import materialize

        node_tuples = materialize(node_tuples)
        edge_tuples = materialize(edge_tuples)

        tn = self.translator.translate_nodes(node_tuples)
        te = self.translator.translate_edges(edge_tuples)
        missing = tn.missing.unionByName(te.missing)

        writer = Neo4jBatchWriter(
            self.spark,
            self.translator,
            self.outdir,
            strict_mode=False,
            validate_props=False,
            # scale path: content-identical part files without the per-label
            # global-rank shuffle; inputs are unique by construction so the
            # cross-call seen-id bookkeeping is skipped too
            ordered_parts=False,
            track_seen=False,
        )
        # a resumed run whose node/edge stages are already checkpointed must
        # not re-emit part files: part numbering continues across runs, so a
        # second emission would append duplicate {Label}-partNNN.csv files
        already_written = resume and self._is_done("nodes") and self._is_done("edges")
        if not already_written:
            # a previous run may have crashed AFTER emitting part files but
            # BEFORE the nodes/edges checkpoints landed (checkpointing happens
            # after the writes) — or this may be a plain re-run into the same
            # outdir. Stale parts would survive alongside the new emission and
            # the import-call glob {Label}-part.* would feed duplicated rows
            # to neo4j-admin import, so wipe them first.
            self._wipe_stale_parts()
            writer.write_nodes(tn.nodes)
            writer.write_edges(te)
            writer.write_import_call()

        # checkpoints must agree with the emitted CSVs, including for
        # rel-as-node schemas: mirror the writer's first-wins dedup of
        # reified nodes + helper-edge rebuild (dedup_rel_as_nodes is the
        # same D3 logic write_edges applies), so PipelineResult.nodes
        # carries the reified nodes and .edges carries only the SURVIVING
        # helper edges rather than the translator's pre-dedup frame
        nodes_out, edges_out = tn.nodes, te.edges
        if te.ran_nodes is not None and schema_has_rel_as_node(self.mapping):
            # gate on the SCHEMA, not the frame: translate_edges always
            # returns a (possibly empty) ran_nodes DataFrame, and without
            # rel-as-node classes the dedup window + two unions would run
            # on provably-empty frames every run
            from .dedup import dedup_rel_as_nodes

            ran_nodes_kept, ran_edges_kept, _ = dedup_rel_as_nodes(te.ran_nodes, te.ran_edges)
            nodes_out = nodes_out.unionByName(ran_nodes_kept)
            edges_out = edges_out.unionByName(ran_edges_kept)
        nodes = self._checkpoint("nodes", nodes_out, resume)
        edges = self._checkpoint("edges", edges_out, resume)
        self._record_lineage("nodes", nodes, key_col="node_id")
        self._record_lineage("edges", edges, key_col="source_id")
        lineage_path = self._flush_lineage()
        stage_secs["write"] = time.time() - t0

        # totals from the lineage rows _record_lineage already collected —
        # identical sums, three fewer full checkpoint scans
        counts = {
            stage: sum(r[3] for r in self._lineage_rows if r[0] == stage)
            for stage in ("mentions", "nodes", "edges")
        }
        metrics_path = self._flush_metrics(counts, stage_secs)
        return PipelineResult(
            nodes=nodes,
            edges=edges,
            mentions=mentions,
            missing_types=missing,
            duplicate_nodes=writer.get_duplicate_nodes(),
            duplicate_edges=writer.get_duplicate_edges(),
            lineage_path=lineage_path,
            counts=counts,
            metrics_path=metrics_path,
        )


def schema_has_rel_as_node(mapping: SchemaMapping) -> bool:
    """True when any edge class is reified (``represented_as: node`` with
    source/target) — the only case the rel-as-node dedup can act on."""
    return any(
        conf.get("represented_as") == "node" and "source" in conf and "target" in conf
        for conf in mapping.extended_schema.values()
    )


def edge_input_labels(mapping: SchemaMapping) -> set:
    """Every input_label the schema can route as an edge class (plain
    ``represented_as: edge``, ``label_as_edge``, or rel-as-node classes
    carrying source/target)."""
    out: set = set()
    for conf in mapping.extended_schema.values():
        is_edge = (
            conf.get("represented_as") == "edge"
            or conf.get("label_as_edge") is not None
            or ("source" in conf and "target" in conf)
        )
        if not is_edge:
            continue
        il = conf.get("input_label")
        for lab in il if isinstance(il, list) else [il]:
            if lab:
                out.add(lab)
    return out


def build_triple_tuples(linked: DataFrame, edge_labels: "set | None" = None) -> tuple[DataFrame, DataFrame]:
    """Linked mentions -> staged node/edge tuple frames.

    Node id = canonical id NAMESPACED by input label ("label:canon"):
    canonicalize() merges surfaces label-agnostically, so without the
    namespace one canonical id appearing under two labels would yield two
    node rows with identical id AND identical content-hash SEQ — the
    writer's first-wins window would then pick an arbitrary label. The
    namespace makes ids collision-free and keeps inputs unique by
    construction (the premise behind track_seen=False). Name =
    lexicographically-first surface form of the cluster. Edges =
    within-turn co-occurrence, aggregated with an evidence count
    (`turns`), ids synthesized as src->tgt so edge dedup (D2) is a
    no-op by construction.
    """
    ns_id = F.concat_ws(":", F.col("input_label"), F.col("canonical_id"))
    nodes = (
        linked.groupBy("canonical_id", "input_label")
        .agg(F.min("surface").alias("name"))
        .select(
            ns_id.alias("id"),
            "input_label",
            F.map_from_arrays(F.array(F.lit("name")), F.array(_json_str(F.col("name")))).alias("props"),
            F.xxhash64(ns_id).alias(SEQ),
        )
    )

    from .linking import cooccurrence_pairs

    # edge class + orientation are SCHEMA-DRIVEN, not hardcoded to the
    # default protein/disease gazetteer: a cross-label pair orients toward
    # whichever "{la}_{lb}" direction the schema declares as an edge
    # input_label (protein_disease in the default schema), falling back to
    # deterministic label-alphabetical order for undeclared pairs — those
    # then surface in the translator's missing-type metrics instead of
    # silently vanishing or being mislabeled. Same-label pairs are always
    # emitted as "{la}_{la}" (declared or not) for the same reason.
    if edge_labels is None:
        edge_labels = edge_input_labels(load_default_schema_mapping())
    known = F.array(*[F.lit(l) for l in sorted(edge_labels)]) if edge_labels else F.array().cast("array<string>")

    pairs = cooccurrence_pairs(linked)
    ns_a = F.concat_ws(":", F.col("la"), F.col("ca"))
    ns_b = F.concat_ws(":", F.col("lb"), F.col("cb"))
    lab_ab = F.concat_ws("_", F.col("la"), F.col("lb"))
    lab_ba = F.concat_ws("_", F.col("lb"), F.col("la"))
    ab_known = F.array_contains(known, lab_ab)
    ba_known = F.array_contains(known, lab_ba)
    use_ab = ab_known | (~ba_known & (F.col("la") <= F.col("lb")))
    oriented = (
        pairs.select(
            F.when(use_ab, ns_a).otherwise(ns_b).alias("src"),
            F.when(use_ab, ns_b).otherwise(ns_a).alias("tgt"),
            F.when(use_ab, lab_ab).otherwise(lab_ba).alias("input_label"),
        )
        .groupBy("src", "tgt", "input_label")
        .agg(F.count(F.lit(1)).alias("turns"))
    )
    edges = oriented.select(
        F.concat("src", F.lit("_"), "tgt").alias("id"),
        "src",
        "tgt",
        "input_label",
        F.map_from_arrays(F.array(F.lit("turns")), F.array(F.col("turns").cast("string"))).alias("props"),
        F.xxhash64("src", "tgt", "input_label").alias(SEQ),
    )
    return nodes, edges
