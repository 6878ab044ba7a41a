"""Extra benchmarks for optimization work (bench.py is FROZEN for driver
measurement; everything exploratory lives here — guide §1).

Modes:
  python bench_extra.py time [sf_dir] [name ...]      noop-sink min-of-N per query
  python bench_extra.py plans <outdir> [sf_dir] [name ...]   explain("formatted") dump
  python bench_extra.py jobs [sf_dir] [name ...]      job/stage counts per query

All timings use the same session shape as bench.py (local[$SPARK_GRAFT_CPUS],
same confs) and the noop sink so the computation is what is measured, not
the sink. Jobs are labelled via setJobDescription (guide §1.5).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR_DEFAULT = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_EXTRA_REPEATS", "3"))


def build_spark():
    from bench import build_spark as bs

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = bs(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


def _gc(spark):
    gc.collect()
    spark.sparkContext._jvm.System.gc()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    rest = sys.argv[2:]
    outdir = None
    if mode == "plans":
        outdir = rest[0]
        rest = rest[1:]
    sf_dir = rest[0] if rest and os.path.isdir(rest[0]) else SF_DIR_DEFAULT
    names = [r for r in rest if not os.path.isdir(r)]

    import __spark_entry__ as entry

    queries = entry.queries()
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    spark = build_spark()
    # warm-up identical to bench.py discipline
    spark.sparkContext.setJobDescription("warmup")
    _noop(queries["q1_pricing_summary"](spark, sf_dir))
    _noop(queries["kg_translate_nodes"](spark, sf_dir))
    _noop(queries["kg_extract_mentions"](spark, sf_dir))

    if mode == "plans":
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
                f.write(plan)
            print(f"wrote {outdir}/{name}.txt ({len(plan)} chars)")
        spark.stop()
        return

    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in names:
        fn = queries[name]
        best = None
        samples = []
        jobs_before = len(tracker.getJobIdsForGroup(None) or [])
        for i in range(REPEATS):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.time()
            _noop(fn(spark, sf_dir))
            dt = round(time.time() - t0, 3)
            samples.append(dt)
            best = dt if best is None else min(best, dt)
        _gc(spark)
        out[name] = {"min": best, "samples": samples}
        print(f"{name:28s} min={best:7.3f}  samples={samples}", file=sys.stderr)
    print(json.dumps({n: v["min"] for n, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
