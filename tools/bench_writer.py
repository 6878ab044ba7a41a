"""Head-to-head node-path throughput: the ACTUAL reference batch writer
(loaded from /root/reference via tests/reference_loader) vs this engine's
staged translate -> dedup -> part-file write, on identically-shaped protein
node inputs (the reference's own fixture schema: 4 props incl. an array).

Reference path = generator of (id, label, props) tuples -> BioCypherNode
dataclasses -> ``_Neo4jBatchWriter.write_nodes`` (single process, the only
mode it has). Engine path = Spark-native staged frame (same logical rows)
-> broadcast translate -> dedup -> partitioned text write, golden-order
mode by default (byte-compatible part layout) or ``--scale`` mode
(``ordered_parts=False``: content-identical lines, arbitrary file
assignment — neo4j-admin import has no ordering requirement).

Usage: python tools/bench_writer.py [n_rows] [--scale] [--cpus N]
Prints one JSON line; run twice and keep the second (warm-JVM) figure when
comparing engines.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

REF_SCHEMA = "/root/reference/biocypher/_config/test_schema_config.yaml"


def ref_node_gen(ref, n: int):
    # `ref` is passed in: loading the reference twice would re-execute its
    # modules and create DIFFERENT dataclass objects, failing the writer's
    # isinstance check
    for i in range(n):
        yield ref.create.BioCypherNode(
            node_id=f"p{i + 1}",
            node_label="protein",
            preferred_id="uniprot",
            properties={
                "score": 4 / (i + 1),
                "name": "StringProperty1",
                "taxon": 9606,
                "genes": ["gene1", "gene2"],
            },
        )


def run_reference(n: int) -> dict:
    from reference_loader import FakeRefTranslator, load_reference

    ref = load_reference()
    outdir = tempfile.mkdtemp(prefix="ref_writer_bench_")
    writer = ref.neo4j._Neo4jBatchWriter(
        translator=FakeRefTranslator(ref.mapping.OntologyMapping(REF_SCHEMA)),
        deduplicator=ref.dedup.Deduplicator(),
        delimiter=";",
        array_delimiter="|",
        quote="'",
        output_directory=outdir,
        db_name="neo4j",
        wipe=True,
        import_call_bin_prefix="bin/",
        labels_order="Ascending",
    )
    t0 = time.time()
    ok = writer.write_nodes(ref_node_gen(ref, n))
    sec = time.time() - t0
    files = [f for f in os.listdir(outdir) if f.endswith(".csv")]
    shutil.rmtree(outdir, ignore_errors=True)
    return {"ok": bool(ok), "sec": round(sec, 2), "nodes_per_sec": round(n / sec, 1), "files": len(files)}


def engine_nodes_frame(spark, n: int):
    """The same logical rows, built Spark-native (no driver materialization
    — the engine's contract is reading staged tables, not Python lists)."""
    from pyspark.sql import functions as F

    score = (F.lit(4.0) / (F.col("id") + 1)).cast("string")
    return spark.range(n).select(
        F.concat(F.lit("p"), (F.col("id") + 1).cast("string")).alias("id"),
        F.lit("protein").alias("input_label"),
        F.map_from_arrays(
            F.array(F.lit("score"), F.lit("name"), F.lit("taxon"), F.lit("genes")),
            F.array(
                score,
                F.lit('"StringProperty1"'),
                F.lit("9606"),
                F.lit('["gene1", "gene2"]'),
            ),
        ).alias("props"),
        F.col("id").alias("_seq"),
    )


def run_engine(n: int, cpus: int, ordered_parts: bool) -> dict:
    from bench import build_spark
    from biocypher_spark.mapping import SchemaMapping
    from biocypher_spark.ontology import NullOntology
    from biocypher_spark.translate import SparkTranslator
    from biocypher_spark.writer.neo4j import Neo4jBatchWriter

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    outdir = tempfile.mkdtemp(prefix="spark_writer_bench_")
    translator = SparkTranslator(spark, NullOntology(SchemaMapping(REF_SCHEMA)))
    writer = Neo4jBatchWriter(spark, translator, outdir, ordered_parts=ordered_parts)
    staged = engine_nodes_frame(spark, n)
    # warm run at 1/20 size: JVM codegen + scheduler warm-up, same treatment
    # the reference gets from its warm Python process
    writer_warm = Neo4jBatchWriter(
        spark, translator, tempfile.mkdtemp(prefix="spark_writer_warm_"), ordered_parts=ordered_parts
    )
    writer_warm.write_nodes(
        translator.translate_nodes(engine_nodes_frame(spark, max(n // 20, 1))).nodes
    )
    t0 = time.time()
    ok = writer.write_nodes(translator.translate_nodes(staged).nodes)
    sec = time.time() - t0
    files = [f for f in os.listdir(outdir) if f.endswith(".csv")]
    shutil.rmtree(outdir, ignore_errors=True)
    spark.stop()
    return {"ok": bool(ok), "sec": round(sec, 2), "nodes_per_sec": round(n / sec, 1), "files": len(files)}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 2_000_000
    cpus = int(sys.argv[sys.argv.index("--cpus") + 1]) if "--cpus" in sys.argv else 32
    ordered = "--scale" not in sys.argv
    ref_stats = run_reference(n)
    eng_stats = run_engine(n, cpus, ordered)
    print(
        json.dumps(
            {
                "n": n,
                "reference": ref_stats,
                "engine": eng_stats,
                "engine_mode": "golden-order" if ordered else "scale (ordered_parts=False)",
                "speedup": round(eng_stats["nodes_per_sec"] / ref_stats["nodes_per_sec"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
