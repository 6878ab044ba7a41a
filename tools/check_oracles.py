"""Local mimic of the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet, compare row
count, column names, and order-insensitive values. Usage:
    python tools/check_oracles.py [sf_dir] [name ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            v = 0.0  # -0.0 == 0.0 numerically; don't render the sign
        return f"{v:.6f}"
    if v is None:
        # distinct sentinel: NULL must NOT compare equal to "" (a Spark NULL
        # vs DuckDB empty string is a real disagreement)
        return "\x00NULL"
    return str(v)


def dtype_class(t) -> str:
    """Canonical class of an Arrow type so the local gate is dtype-sensitive
    like the driver's typed-value hash (VERDICT r01: DuckDB HUGEINT ->
    decimal128 vs Spark bigint tripped the driver while str-normalized values
    matched). Plain int widths / float widths / string flavors are collapsed;
    decimal stays distinct from int, which is the observed failure mode."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{dtype_class(t.value_type)}>"
    return str(t)


def arrow_dtypes(tbl) -> dict:
    return {f.name: dtype_class(f.type) for f in tbl.schema}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    # a typo'd filter name must not yield a green "0 failures / N checked"
    # summary without running anything
    unknown = only - set(queries)
    if unknown:
        print(f"ERROR unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    failures = 0
    checked = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        checked += 1
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            stypes = arrow_dtypes(sdf.limit(0).toArrow())
        except Exception as exc:
            print(f"FAIL  {name}: spark error {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?   {name}: rows={len(srows)} (no oracle, rows-only)")
            continue
        try:
            dtbl = con.execute(oracles[name]).fetch_arrow_table()
            dcols = dtbl.column_names
            dtypes = arrow_dtypes(dtbl)
            drows = [tuple(col[i].as_py() for col in dtbl.columns) for i in range(dtbl.num_rows)]
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error {str(exc).splitlines()[0]}")
            failures += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns spark={scols} duck={dcols}")
            failures += 1
            continue
        badtypes = {c: (stypes[c], dtypes[c]) for c in scols if stypes[c] != dtypes[c]}
        if badtypes:
            print(f"FAIL  {name}: dtype mismatch (spark, duck) {badtypes}")
            failures += 1
            continue
        sset = sorted(tuple(norm(r[c]) for c in sorted(scols)) for r in srows)
        dmap = {c: i for i, c in enumerate(dcols)}
        dset = sorted(tuple(norm(r[dmap[c]]) for c in sorted(dcols)) for r in drows)
        if len(sset) != len(dset):
            print(f"FAIL  {name}: rowcount spark={len(sset)} duck={len(dset)}")
            failures += 1
        elif sset != dset:
            diff = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
            print(f"FAIL  {name}: values differ, first diffs={diff}")
            failures += 1
        else:
            print(f"OK    {name}: rows={len(sset)}")
    print(f"\n{failures} failures / {checked} checked")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
