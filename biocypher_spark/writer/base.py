"""Shared batch-writer machinery: typed CSV serialization + part files.

Reference: the abstract ``_BatchWriter``
(/root/reference/biocypher/output/write/_batch_writer.py). The reference
streams entities through Python closures with per-label in-memory bins
(:592-741, :872-1028); here serialization is a single Spark column
expression per label (whole-stage codegen, no Python on the hot path) and
part files come from one partitioned ``write.text`` job followed by a
driver-side rename into the reference's ``{Label}-partNNN.csv`` layout
(:1154-1204), continuing numbering across runs.

Scale notes:
  * one shuffle per write call (range partition by (label, seq)) regardless
    of label count; ``maxRecordsPerFile`` enforces the reference's
    ``batch_size`` file chunking without driver memory.
  * all value formatting (quoting, bool lowering, array joins, newline
    scrub) is built-ins only; Python appears solely in driver-side header
    bookkeeping over the tiny label domain.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..materialize import materialize
from ..model import SEQ, json_pystr, scrub_newlines
from ..naming import parse_label, sentence_to_pascal

LONG_TYPES = {"int", "integer", "long"}
DOUBLE_TYPES = {"float", "double", "dbl"}
BOOL_TYPES = {"bool", "boolean"}
LONG_ARRAY = {"int[]", "integer[]", "long[]"}
DOUBLE_ARRAY = {"float[]", "double[]"}
BOOL_ARRAY = {"bool[]", "boolean[]"}
STR_ARRAY = {"str[]", "string[]"}


_URI_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")


def require_local_dir(path: str, layout: str) -> str:
    """Validate an output directory for writers whose layout passes through
    driver-side ``os.path``/``glob`` (part-file renames, header writes,
    resume markers — and, for the admin-import layout, ``neo4j-admin``
    itself reads a local directory).

    Any URI scheme is refused, **including** ``file://``: Spark resolves
    URIs through Hadoop filesystems while the driver-side code treats the
    string literally (``os.makedirs('file:///x')`` creates ``./file:/x``
    and ``glob`` over the URI matches nothing), so the job would write one
    place and the rename/resume pass would read another — an empty or
    duplicated layout with no error. For ``file://`` URIs pass the plain
    POSIX path; for object stores, write to a mounted shared filesystem
    (or locally) and sync afterwards.
    """
    if _URI_SCHEME.match(path):
        raise ValueError(
            f"{layout} output_directory {path!r} is not a plain local/shared-POSIX "
            "path: the layout is written through driver-side os.path/glob "
            "(part renames, headers, resume markers), which treats a URI as a "
            "literal file name while Spark resolves it through Hadoop — writes "
            "and reads would land in different places. Pass the plain path "
            "(strip file://); for object stores, write to a mounted shared "
            "filesystem and sync."
        )
    return path


def quote_expr(col: Column, quote: str, mode: str = "double") -> Column:
    """Quote a string column.

    ``double`` doubles embedded quote chars (Neo4j,
    /root/reference/biocypher/output/write/graph/_neo4j.py:66-68);
    ``plain`` wraps without escaping (PostgreSQL writer,
    /root/reference/biocypher/output/write/relational/_postgresql.py:60-62).
    """
    if mode == "plain":
        return F.concat(F.lit(quote), col, F.lit(quote))
    return F.concat(F.lit(quote), F.replace(col, F.lit(quote), F.lit(quote * 2)), F.lit(quote))


def _python_bool_elems(arr: Column) -> Column:
    """JSON 'true'/'false' array elements -> Python str(True)/str(False)."""
    return F.transform(
        arr,
        lambda x: F.when(x == "true", F.lit("True")).when(x == "false", F.lit("False")).otherwise(x),
    )


def serialize_prop(
    raw: Column,
    declared: Optional[str],
    quote: str,
    adelim: str,
    scrub: bool,
    quote_mode: str = "double",
    array_mode: str = "delim",
) -> Column:
    """One property value (JSON-encoded) -> its CSV field string.

    Branch structure matches ``_write_single_node_list_to_file``
    (/root/reference/biocypher/output/write/_batch_writer.py:799-827):
    None -> empty field; declared bool -> lowercase; declared numerics
    -> bare string; lists -> array-delimited + quoted; everything else ->
    quoted string (with the reference's str() semantics for stray
    non-strings). ``scrub`` applies the CR/LF -> space replacement the
    reference performs at node construction (nodes only;
    /root/reference/biocypher/_create.py:73-94).
    """
    is_null = raw.isNull() | (raw == "null")
    decoded_arr = F.from_json(raw, "array<string>")

    def maybe_scrub(c: Column) -> Column:
        return scrub_newlines(c) if scrub else c

    elems = _python_bool_elems(F.transform(decoded_arr, maybe_scrub))
    if array_mode == "pg":
        # PostgreSQL COPY array literal: "{a,b}" (reference
        # _postgresql.py:64-82)
        array_field = F.concat(F.lit('"{'), F.concat_ws(",", elems), F.lit('}"'))
    else:
        array_field = quote_expr(F.concat_ws(adelim, elems), quote, quote_mode)
    if declared in BOOL_TYPES:
        value = F.lower(json_pystr(raw))
    elif declared in LONG_TYPES or declared in DOUBLE_TYPES:
        value = json_pystr(raw)
    else:
        string_field = quote_expr(maybe_scrub(json_pystr(raw)), quote, quote_mode)
        value = F.when(raw.startswith("["), array_field).otherwise(string_field)
        return F.when(is_null, F.lit("")).otherwise(value)
    # declared scalar types can still receive list values -> array branch
    value = F.when(raw.startswith("["), array_field).otherwise(value)
    return F.when(is_null, F.lit("")).otherwise(value)


def node_line_expr(
    prop_dict: dict,
    label_string: str,
    delim: str,
    adelim: str,
    quote: str,
    quote_mode: str = "double",
    array_mode: str = "delim",
    include_labels: bool = True,
) -> Column:
    """Build the full CSV line for one node label:
    ``id ; props... ; :LABEL-string``."""
    pieces: list[Column] = [F.col("node_id")]
    for key, declared in prop_dict.items():
        raw = F.element_at(F.col("props"), key)
        pieces.append(
            F.coalesce(
                serialize_prop(raw, declared, quote, adelim, True, quote_mode, array_mode), F.lit("")
            )
        )
    if include_labels:
        pieces.append(F.lit(label_string))
    return F.concat_ws(delim, *pieces)


def edge_line_expr(
    prop_dict: dict,
    label_string: str,
    delim: str,
    adelim: str,
    quote: str,
    skip_id: bool,
    quote_mode: str = "double",
    array_mode: str = "delim",
    include_labels: bool = True,
) -> Column:
    """CSV line for one edge label:
    ``:START_ID ; [id] ; props... ; :END_ID ; :TYPE``."""
    pieces: list[Column] = [F.col("source_id")]
    if not skip_id:
        pieces.append(F.coalesce(F.col("relationship_id"), F.lit("")))
    for key, declared in prop_dict.items():
        raw = F.element_at(F.col("props"), key)
        pieces.append(
            F.coalesce(
                serialize_prop(raw, declared, quote, adelim, False, quote_mode, array_mode), F.lit("")
            )
        )
    pieces.append(F.col("target_id"))
    if include_labels:
        pieces.append(F.lit(label_string))
    return F.concat_ws(delim, *pieces)


def infer_prop_types(props: dict[str, Optional[str]]) -> dict[str, str]:
    """First-entity type inference, Python type names like the reference
    (/root/reference/biocypher/output/write/_batch_writer.py:672-689)."""
    out = {}
    for k, raw in props.items():
        if raw is None:
            out[k] = None
            continue
        v = json.loads(raw)
        if v is None:
            out[k] = None
        elif isinstance(v, bool):
            out[k] = "bool"
        elif isinstance(v, int):
            out[k] = "int"
        elif isinstance(v, float):
            out[k] = "float"
        elif isinstance(v, list):
            elem = type(v[0]).__name__ if v else "str"
            out[k] = f"{elem}[]"
        else:
            out[k] = "str"
    return out


def pascal_file_label(label: str) -> str:
    """File-name-safe Pascal form of a label. Never empty: a label whose
    characters all sanitize away (e.g. a fully non-ASCII class name) falls
    back to 'Unlabeled' — an empty partition value would be written as
    Spark's __HIVE_DEFAULT_PARTITION__ directory while the header/import
    call reference the empty-prefix names, silently importing zero rows
    for that label."""
    return sentence_to_pascal(parse_label(label)) or "Unlabeled"


def ordered_file_assignment(lines_df: DataFrame, batch_size: int) -> DataFrame:
    """Exact reference batching, DISTRIBUTED: per-label arrival-order rank
    -> file index every ``batch_size`` rows, via the classic two-pass
    scheme (parallel range-sort -> per-chunk counts -> driver prefix-sum
    of chunk offsets -> per-chunk local ranks). A plain per-label
    row_number window funnels each label through ONE reducer task
    (measured 46.8s vs 6.1s unordered at 2M single-label rows locally; a
    hard wall at 10^9-row labels). The driver only ever sees the
    (chunk, label) count table — n_partitions x n_labels rows.
    """
    spark = lines_df.sparkSession
    n = max(spark.sparkContext.defaultParallelism, 1)
    # materialize() pins BOTH the (sampled, hence nondeterministic)
    # range partitioning and the frozen _pid values across the two
    # passes; range partitioning on the unique (_plabel, SEQ) key
    # guarantees every row of chunk p precedes every row of chunk p+1
    # within a label, so chunk offsets are exact.
    # DURABILITY: in the default 'local' mode blocks live unreplicated on
    # executors — an executor loss between the counts pass and the write
    # fails the ordered write (no lineage to recompute). For
    # fault-tolerant ordered writes at cluster scale set
    # spark.biocypher.materialize=reliable (+ setCheckpointDir): same pin,
    # HDFS/S3-backed (see materialize.py).
    ranged = materialize(
        lines_df.repartitionByRange(n, "_plabel", SEQ)
        .sortWithinPartitions("_plabel", SEQ)
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = ranged.groupBy("_pid", "_plabel").count().collect()
    running: dict[str, int] = {}
    offsets = []
    for row in sorted(counts, key=lambda r: (r["_plabel"], r["_pid"])):
        offsets.append((row["_pid"], row["_plabel"], running.get(row["_plabel"], 0)))
        running[row["_plabel"]] = running.get(row["_plabel"], 0) + row["count"]
    off_df = spark.createDataFrame(offsets, "_pid int, _plabel string, _off long")
    # the local-rank window shuffles by (chunk, label) — parallel
    # across all chunks, never one task per label
    w = Window.partitionBy("_pid", "_plabel").orderBy(SEQ)
    df = ranged.join(F.broadcast(off_df), ["_pid", "_plabel"]).withColumn(
        "_file",
        F.floor((F.row_number().over(w) - 1 + F.col("_off")) / F.lit(int(batch_size))),
    )
    return df.repartitionByRange(F.col("_plabel"), F.col("_file")).sortWithinPartitions(
        "_plabel", "_file", SEQ
    )



def write_part_files(
    lines_df: DataFrame,
    outdir: str,
    batch_size: int,
    ordered: bool = True,
) -> dict[str, list[str]]:
    """Write line strings into ``{Label}-partNNN.csv`` files.

    ``lines_df`` must have columns (``_plabel``, ``line``, SEQ). One Spark
    job: range-partition + sort by (label, seq) so file order is the stable
    arrival order, write text partitioned by label with ``batch_size`` rows
    per file, then rename driver-side, continuing each label's existing
    part numbering (reference ``_write_next_part``,
    /root/reference/biocypher/output/write/_batch_writer.py:1154-1204).
    """
    tmp = os.path.join(outdir, "_tmp_parts")
    shutil.rmtree(tmp, ignore_errors=True)
    if ordered:
        df = ordered_file_assignment(lines_df, batch_size)
    else:
        # scale path: no global per-label order (neo4j-admin import does not
        # require one); write from the existing partitioning — zero shuffle,
        # maxRecordsPerFile still bounds rows per part
        df = lines_df
    (
        df.select("line", "_plabel")
        .write.option("maxRecordsPerFile", int(batch_size))
        .partitionBy("_plabel")
        .mode("overwrite")
        .text(tmp)
    )
    written: dict[str, list[str]] = {}
    for label_dir in sorted(glob.glob(os.path.join(tmp, "_plabel=*"))):
        plabel = label_dir.rsplit("=", 1)[-1]
        existing = glob.glob(os.path.join(outdir, f"{plabel}-part*.csv"))
        next_part = (
            max(int(f.rsplit("-part", 1)[-1].split(".")[0]) for f in existing) + 1 if existing else 0
        )
        for src in sorted(glob.glob(os.path.join(label_dir, "part-*"))):
            if os.path.getsize(src) == 0:
                continue
            name = f"{plabel}-part{str(next_part).zfill(3)}.csv"
            shutil.move(src, os.path.join(outdir, name))
            written.setdefault(plabel, []).append(name)
            next_part += 1
    shutil.rmtree(tmp, ignore_errors=True)
    return written
