"""spark-submit entry point: documents table -> corpus-hygiene audit.

Runs the composed training-data hygiene pipeline (textops.clean_corpus:
exact dedup -> banded-minhash near-dup connected components -> optional
SemDeDup semantic dedup -> decontamination -> quality floor) over a
documents table and writes

    {output}/flags/      per-doc (doc_id, keep, drop_reason) audit parquet
    {output}/clean/      surviving documents (all input columns) parquet
    {output}/report.json per-stage outcome counts + run config

Usage:
    spark-submit --py-files biocypher_spark.zip jobs/run_hygiene.py \
        --input /path/to/documents (parquet dir with doc_id + text columns) \
        --output /path/to/audit-out \
        [--near-threshold 0.9] [--near-mode star] [--quality-min 0.05] \
        [--probes /path/to/probes.parquet]  # column 'probe'; omit to skip
        [--embeddings /path/to/embeddings.parquet]  # (vec_id=doc_id,
        #  embedding array<double>); omit to skip the semantic stage
        [--semantic-threshold 0.95]

Build the zip with:  python tools/make_pyfiles.py
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--near-threshold", type=float, default=0.9)
    ap.add_argument("--near-mode", default="star", choices=["star", "pairs"])
    ap.add_argument("--no-near", action="store_true", help="skip the near-dup stage")
    ap.add_argument("--quality-min", type=float, default=None)
    ap.add_argument("--probes", default=None, help="parquet with a 'probe' column")
    ap.add_argument(
        "--embeddings",
        default=None,
        help="parquet with (vec_id, embedding) keyed by doc_id; enables SemDeDup stage",
    )
    ap.add_argument("--semantic-threshold", type=float, default=0.95)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("biocypher-spark-hygiene")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from biocypher_spark.textops import clean_corpus, hygiene_report

    docs = spark.read.parquet(args.input)
    probes = spark.read.parquet(args.probes) if args.probes else None
    embeddings = spark.read.parquet(args.embeddings) if args.embeddings else None
    t0 = time.time()
    flags = clean_corpus(
        docs,
        text_col=args.text_col,
        near_threshold=None if args.no_near else args.near_threshold,
        probes=probes,
        quality_min=args.quality_min,
        near_mode=args.near_mode,
        embeddings=embeddings,
        semantic_threshold=args.semantic_threshold,
    )
    flags.write.mode("overwrite").parquet(os.path.join(args.output, "flags"))
    flags_back = spark.read.parquet(os.path.join(args.output, "flags"))
    docs.join(flags_back.filter("keep").select("doc_id"), "doc_id", "left_semi").write.mode(
        "overwrite"
    ).parquet(os.path.join(args.output, "clean"))
    outcomes = {r["outcome"]: r["n"] for r in hygiene_report(flags_back).collect()}
    stats = {
        "outcomes": outcomes,
        "docs": sum(outcomes.values()),
        "kept": outcomes.get("kept", 0),
        "sec": round(time.time() - t0, 2),
        "config": {
            "near_threshold": None if args.no_near else args.near_threshold,
            "near_mode": args.near_mode,
            "quality_min": args.quality_min,
            "probes": args.probes,
            "embeddings": args.embeddings,
            "semantic_threshold": args.semantic_threshold if args.embeddings else None,
        },
    }
    _write_text(spark, os.path.join(args.output, "report.json"), json.dumps(stats))
    print(json.dumps(stats))


def _write_text(spark, path: str, content: str) -> None:
    """Write a small text file next to the job's parquet outputs.

    The parquet writes accept any Hadoop URI, so the report must too — a
    builtin open() would succeed locally and then fail the whole job on
    hdfs://... / s3a://... AFTER all the expensive pipeline work ran."""
    if "://" not in path or path.startswith("file://"):
        with open(path.removeprefix("file://"), "w") as fh:
            fh.write(content)
        return
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


if __name__ == "__main__":
    main()
