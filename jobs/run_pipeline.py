"""spark-submit entry point: transcripts table -> KG batch layout.

Usage:
    spark-submit --py-files biocypher_spark.zip jobs/run_pipeline.py \
        --input /path/to/transcripts (parquet or Iceberg table path) \
        --output /path/to/kg-out [--resume] [--schema config/x.yaml] \
        [--generate N]   # synthesize N turns instead of reading input

Build the zip with:  python tools/make_pyfiles.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--schema", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--generate", type=int, default=None, help="synthesize N turns")
    ap.add_argument("--link-threshold", type=float, default=0.35)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("biocypher-spark-pipeline")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from biocypher_spark.pipeline import DEFAULT_SCHEMA, KGPipeline
    from biocypher_spark.transcripts import generate_transcripts, read_transcripts

    if args.generate:
        transcripts = generate_transcripts(spark, args.generate)
    elif args.input:
        transcripts = read_transcripts(spark, args.input)
    else:
        ap.error("one of --input / --generate is required")

    pipe = KGPipeline(
        spark,
        args.output,
        schema_config_path=args.schema or DEFAULT_SCHEMA,
        link_threshold=args.link_threshold,
    )
    # resume guard: checkpoints are keyed only by stage _SUCCESS markers, so
    # resuming with different input/config would silently serve the OLD
    # run's data under the new flags — refuse instead
    cfg = {
        "input": args.input,
        "generate": args.generate,
        "schema": args.schema,
        "link_threshold": args.link_threshold,
    }
    cfg_path = os.path.join(pipe.run_dir, "job_config.json")
    if args.resume and os.path.exists(cfg_path):
        with open(cfg_path) as fh:
            prev = json.load(fh)
        if prev != cfg:
            sys.exit(
                f"--resume refused: checkpoints in {pipe.run_dir} were produced with "
                f"{prev}, current flags are {cfg}; clear the output directory or match the flags"
            )
    with open(cfg_path, "w") as fh:
        json.dump(cfg, fh)
    t0 = time.time()
    res = pipe.run(transcripts, resume=args.resume)
    stats = {**res.counts, "sec": round(time.time() - t0, 2), "lineage": res.lineage_path}
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
