"""BioPathNet sink (S10): entity_types / entity_names / background-graph /
skg TSV files.

Reference: ``_BioPathNetWriter``
(/root/reference/biocypher/output/write/graph/_biopathnet.py:12-284). Layout:
``entity_types.txt`` (entity_id \\t type), ``entity_names.txt`` (n \\t n),
``brg.txt`` (property triples entity \\t prop \\t prop_value plus the used
ontology sub-hierarchy), ``skg.txt`` (edge triples). The reference appends
across calls (learning/validation/test splits) — so do we. Lines are built
as Spark expressions and streamed into the target files driver-side
(file-append concat, no row collection)."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import json_pystr


def _append_lines(df: DataFrame, outdir: str, filename: str) -> None:
    tmp = os.path.join(outdir, "_tmp_bpn")
    df.write.mode("overwrite").text(tmp)
    target = os.path.join(outdir, filename)
    with open(target, "ab") as out:
        for part in sorted(glob.glob(os.path.join(tmp, "part-*"))):
            with open(part, "rb") as fh:
                shutil.copyfileobj(fh, out)
    shutil.rmtree(tmp, ignore_errors=True)


class BioPathNetWriter:
    def __init__(self, spark, translator, output_directory: str):
        from .base import require_local_dir

        self.spark = spark
        self.translator = translator
        self.outdir = require_local_dir(output_directory, "BioPathNet")
        os.makedirs(self.outdir, exist_ok=True)

    def write_nodes(self, nodes: DataFrame) -> bool:
        # entity_types: id \t semantic type
        types = nodes.select(
            F.concat_ws("\t", "node_id", "node_label").alias("value")
        )
        _append_lines(types, self.outdir, "entity_types.txt")

        # property triples into the background graph; values prefixed with
        # the property name, spaces stripped (reference :90-101)
        entries = nodes.select("node_id", F.explode(F.map_entries("props")).alias("e"))
        pv = F.regexp_replace(json_pystr(F.col("e.value")), " ", "")
        prop_rows = entries.filter(F.col("e.value").isNotNull() & (F.col("e.value") != "null")).select(
            F.concat_ws("\t", "node_id", F.col("e.key"), F.concat(F.col("e.key"), F.lit("_"), pv)).alias("brg"),
            F.concat_ws("\t", F.concat(F.col("e.key"), F.lit("_"), pv), F.lit("property_value")).alias("types"),
            F.concat_ws("\t", F.concat(F.col("e.key"), F.lit("_"), pv), pv).alias("names"),
        )
        _append_lines(prop_rows.select(F.col("brg").alias("value")), self.outdir, "brg.txt")
        _append_lines(prop_rows.select(F.col("types").alias("value")), self.outdir, "entity_types.txt")
        _append_lines(prop_rows.select(F.col("names").alias("value")), self.outdir, "entity_names.txt")

        # used ontology sub-hierarchy (driver-side, tiny domain): child
        # is_a parent edges for every label's ancestor chain
        labels = [r[0] for r in nodes.select("node_label").distinct().collect()]
        hier, tlines, nlines = [], [], []
        seen = set()
        for label in labels:
            try:
                chain = self.translator.ontology.get_ancestors(label)
            except KeyError:
                chain = [label]
            for child, parent in zip(chain, chain[1:]):
                if (child, parent) not in seen:
                    seen.add((child, parent))
                    hier.append(f"{child}\tsubclass_of\t{parent}")
                    tlines.append(f"{child}\t{parent}")
                    nlines.append(f"{child}\t{child}")
            root = chain[-1]
            if (root, "THING") not in seen:
                seen.add((root, "THING"))
                tlines.append(f"{root}\tTHING")
                nlines.append(f"{root}\t{root}")
        for filename, lines in (("brg.txt", hier), ("entity_types.txt", tlines), ("entity_names.txt", nlines)):
            with open(os.path.join(self.outdir, filename), "a", encoding="utf-8") as fh:
                for ln in lines:
                    fh.write(ln + "\n")
        return True

    def write_edges(self, edges: DataFrame) -> bool:
        lines = edges.select(
            F.concat_ws(
                "\t",
                "source_id",
                F.coalesce(
                    F.col("relationship_label"),
                    F.concat("source_id", F.lit("_"), "target_id"),
                ),
                "target_id",
            ).alias("value")
        )
        _append_lines(lines, self.outdir, "skg.txt")
        return True
