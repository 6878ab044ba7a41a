"""Neo4j admin-import batch writer — the flagship sink (S3).

Produces the exact reference layout: per-label ``{PascalLabel}-partNNN.csv``
data files, ``{PascalLabel}-header.csv`` header files, and a
``neo4j-admin-import-call.sh`` script (reference
``_Neo4jBatchWriter``, /root/reference/biocypher/output/write/graph/_neo4j.py
and ``_BatchWriter``, .../_batch_writer.py). Serialization rules
(``;`` delimiter, ``|`` array delimiter, ``'`` quote with doubling escape,
lowercase booleans, empty field for null) match the reference's golden tests
(/root/reference/test/output/write/graph/test_neo4j.py:107,298,321,1006).

Spark-first execution: dedup is a keyed shuffle (not driver sets), label
ancestor strings are precomputed driver-side and inlined as literals, and
every write call is one partitioned text job per entity kind. Cross-call
dedup state is an accumulated, persisted id DataFrame, replacing the
reference's unbounded in-memory sets (/root/reference/biocypher/
_deduplicate.py:20-29) which cannot exist at 10^12 scale.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..dedup import edge_dedup_key
from ..materialize import materialize
from ..model import SEQ
from ..naming import sentence_to_pascal
from ..translate import SparkTranslator, TranslatedEdges
from .base import (
    BOOL_ARRAY,
    BOOL_TYPES,
    DOUBLE_ARRAY,
    DOUBLE_TYPES,
    LONG_ARRAY,
    LONG_TYPES,
    STR_ARRAY,
    edge_line_expr,
    infer_prop_types,
    node_line_expr,
    pascal_file_label,
    require_local_dir,
    write_part_files,
)

_LABELS_ORDERS = ("Ascending", "Descending", "Alphabetical", "Leaves")
_RAN_EDGE_LABELS = ("IS_SOURCE_OF", "IS_TARGET_OF", "IS_PART_OF")


def _header_type_suffix(key: str, declared: Optional[str]) -> str:
    """Property header column with Neo4j type suffix
    (/root/reference/biocypher/output/write/graph/_neo4j.py:125-141)."""
    if declared in LONG_TYPES:
        return f"{key}:long"
    if declared in LONG_ARRAY:
        return f"{key}:long[]"
    if declared in DOUBLE_TYPES:
        return f"{key}:double"
    if declared in DOUBLE_ARRAY:
        return f"{key}:double[]"
    if declared in BOOL_TYPES:
        return f"{key}:boolean"
    if declared in BOOL_ARRAY:
        return f"{key}:boolean[]"
    if declared in STR_ARRAY:
        return f"{key}:string[]"
    return key


class Neo4jBatchWriter:
    """Write node/edge DataFrames in Neo4j admin-import layout.

    Subclasses override the dialect knobs (``quote_mode``, ``array_mode``),
    header/DDL emission, and the import-call script to cover the other batch
    targets (PostgreSQL/SQLite/ArangoDB), mirroring the reference's
    ``_BatchWriter`` hierarchy."""

    quote_mode = "double"
    array_mode = "delim"
    forced_edge_labels_order = "Leaves"  # Neo4j: single edge label (_neo4j.py:44-52)
    node_line_includes_labels = True
    edge_line_includes_labels = True

    def __init__(
        self,
        spark,
        translator: SparkTranslator,
        output_directory: str,
        delimiter: str = ";",
        array_delimiter: str = "|",
        quote: str = "'",
        db_name: str = "neo4j",
        wipe: bool = True,
        strict_mode: bool = False,
        skip_bad_relationships: bool = False,
        skip_duplicate_nodes: bool = False,
        import_call_bin_prefix: Optional[str] = None,
        import_call_file_prefix: Optional[str] = None,
        labels_order: str = "Ascending",
        node_labels_order: Optional[str] = None,
        edge_labels_order: Optional[str] = None,
        batch_size: int = int(1e6),
        validate_props: bool = True,
        ordered_parts: bool = True,
        track_seen: bool = True,
        lazy_seen_pins: bool = False,
    ):
        self.spark = spark
        self.translator = translator
        self.outdir = require_local_dir(output_directory, "admin-import")
        os.makedirs(self.outdir, exist_ok=True)
        self.delim = delimiter
        self.adelim = array_delimiter
        self.quote = quote
        self.db_name = db_name
        self.wipe = wipe
        self.strict_mode = strict_mode
        self.skip_bad_relationships = skip_bad_relationships
        self.skip_duplicate_nodes = skip_duplicate_nodes
        self.import_call_bin_prefix = import_call_bin_prefix or "bin/"
        self.import_call_file_prefix = import_call_file_prefix or output_directory
        self.node_labels_order = node_labels_order or labels_order
        self.edge_labels_order = self.forced_edge_labels_order or (edge_labels_order or labels_order)
        if self.node_labels_order not in _LABELS_ORDERS:
            raise ValueError(f"Invalid labels_order: {self.node_labels_order}")
        if self.edge_labels_order not in _LABELS_ORDERS:
            # same loud contract as the reference's match-default — a typo
            # would otherwise silently fall through to Ascending in
            # _all_labels' if/elif chain
            raise ValueError(f"Invalid labels_order: {self.edge_labels_order}")
        self.batch_size = int(batch_size)
        self.validate_props = validate_props
        # ordered_parts=True reproduces the reference's arrival-order part
        # files (needs a per-label global rank — golden-parity mode);
        # False is the scale path: content-identical lines, arbitrary
        # file assignment, zero extra shuffle.
        self.ordered_parts = ordered_parts
        # track_seen=False skips the cross-call seen-id bookkeeping for
        # single-shot pipelines whose inputs are already unique
        self.track_seen = track_seen
        # lazy_seen_pins=True defers seen-key evaluation into the first
        # consuming job (stream_kg's per-batch generation write) instead of
        # scheduling an eager count per write call — the micro-batch fast
        # path. Callers opting in MUST release_seen_state_pins() regularly
        # (the shared batch_first pin holds full post-dedup rows, not just
        # keys) and feed deterministic (pinned) inputs. The eager default
        # fixes the seen keys immediately, which is the safe contract for
        # ad-hoc batch writers over possibly-nondeterministic inputs.
        self.lazy_seen_pins = lazy_seen_pins

        self.node_property_dict: "OrderedDict[str, dict]" = OrderedDict()
        self.edge_property_dict: "OrderedDict[str, dict]" = OrderedDict()
        self.import_call_nodes: set = set()
        self.import_call_edges: set = set()
        self.parts: dict[str, list[str]] = {}
        self._seen_nodes: Optional[DataFrame] = None  # accumulated node_id frame
        self._seen_edges: Optional[DataFrame] = None  # accumulated (label, key) frame
        self._seen_ran: Optional[DataFrame] = None  # accumulated (label, node_id) frame
        self.duplicate_nodes: Optional[DataFrame] = None
        self.duplicate_edges: Optional[DataFrame] = None
        self._dup_chain_len: dict[str, int] = {}  # union layers since last collapse
        # every persist() issued for seen-state bookkeeping, so a caller
        # that repoints the seen frames at durable storage can release the
        # superseded cache entries (Spark's CacheManager never frees them
        # on GC; a long stream would otherwise leak O(batches x total-ids))
        self._seen_pins: list[DataFrame] = []
        # per-call STATE DELTAS since the last take_state_deltas(): the new
        # seen keys each _dedup_against_seen call admitted and the
        # duplicate-metrics rows each _note_dups call appended. stream_kg
        # persists THESE per micro-batch (O(batch) durable write) instead of
        # re-snapshotting the cumulative state (O(corpus) per batch — at
        # 10^12-turn stream scale the snapshot design writes the whole seen
        # universe once per micro-batch, a quadratic total). Batch callers
        # that never consume deltas hold only lazy plan objects here; they
        # are cleared alongside the pins in release_seen_state_pins().
        self._seen_deltas: dict[str, DataFrame] = {}
        self._dup_deltas: dict[str, DataFrame] = {}

    # -- label strings ------------------------------------------------------

    def _escaped(self, s: str) -> str:
        return s.replace("\\", "\\\\")

    def _array_string(self, items: list[str]) -> str:
        joined = self.adelim.join(str(x) for x in items)
        return f"{self.quote}{joined.replace(self.quote, self.quote * 2)}{self.quote}"

    def _all_labels(self, label: str, order: str, force: bool = False) -> str:
        """Ancestor `:LABEL` string (O1/O2; reference ``_get_all_labels``,
        /root/reference/biocypher/output/write/_batch_writer.py:512-555)."""
        if force:
            return sentence_to_pascal(label)
        try:
            ancestors = self.translator.ontology.get_ancestors(label)
        except KeyError:
            ancestors = [label]
        labels = list(OrderedDict.fromkeys(sentence_to_pascal(a) for a in ancestors))
        if order == "Alphabetical":
            labels.sort()
        elif order == "Descending":
            labels.reverse()
        elif order == "Leaves":
            labels = labels[:1]
        return self._array_string(labels)

    # -- property dict resolution -------------------------------------------

    def _schema_props(self, label: str) -> Optional[dict]:
        schema = self.translator.ontology.mapping.extended_schema
        if label in schema:
            return schema[label].get("properties")
        for conf in schema.values():
            if isinstance(conf, dict) and conf.get("label_as_edge") == label:
                return conf.get("properties")
        return None

    def _resolve_prop_dict(self, label: str, first_props: dict, kind: str) -> dict:
        """Declared schema properties win; else first-entity inference
        (/root/reference/biocypher/output/write/_batch_writer.py:645-689)."""
        cprops = self._schema_props(label)
        if cprops:
            d = dict(cprops)
            if kind == "node":
                d["id"] = "str"
                d["preferred_id"] = "str"
            if self.strict_mode:
                d["source"] = "str"
                d["version"] = "str"
                d["licence"] = "str"
        else:
            d = infer_prop_types(first_props)
        return d

    def _first_rows_per_label(self, df: DataFrame, label_col: str) -> dict[str, dict]:
        # min_by aggregation: map-side partial combine, no single-partition
        # per-label window. Keys/values collected as arrays because the
        # Python dict conversion of a collected map column does not
        # preserve the JVM map order.
        first = F.min_by(
            F.struct(F.map_keys("props").alias("_k"), F.map_values("props").alias("_v")),
            F.col(SEQ),
        )
        rows = df.groupBy(label_col).agg(first.alias("_f")).collect()
        return {r[label_col]: dict(zip(r["_f"]["_k"] or [], r["_f"]["_v"] or [])) for r in rows}

    def _validate_consistent_props(self, df: DataFrame, label_col: str, prop_dicts: dict) -> None:
        """Reference hard-errors when entities of one label diverge in
        property-key sets (order-invariant;
        /root/reference/biocypher/output/write/_batch_writer.py:785-797)."""
        if not self.validate_props:
            return
        # a null props map counts as the EMPTY key set (NODE_INPUT_SCHEMA
        # allows null props) — without the coalesce the collected _keys row
        # is None and tuple(None) raises TypeError instead of the intended
        # consistency ValueError (or a spurious one for all-null labels)
        keys = F.sort_array(F.map_keys(F.coalesce(F.col("props"), F.create_map())))
        sets = (
            df.select(label_col, keys.alias("_keys"))
            .groupBy(label_col, "_keys")
            .count()
            .collect()
        )
        per_label: dict[str, set] = {}
        for r in sets:
            per_label.setdefault(r[label_col], set()).add(tuple(r["_keys"]))
        for label, keysets in per_label.items():
            ref = set(prop_dicts.get(label, {}).keys())
            for ks in keysets:
                if set(ks) != ref:
                    raise ValueError(
                        f"At least one entity of class {label} has more or fewer properties "
                        f"than another. Reference properties: {sorted(ref)}, "
                        f"found: {sorted(ks)}."
                    )

    # -- dedup bookkeeping ---------------------------------------------------

    # collapse cadence for the duplicate-metrics union chains: every
    # _DUP_COLLAPSE appended layers the frame is distinct-ed and pinned.
    # Without this a long-running stream (thousands of micro-batch writer
    # calls) accumulates an ever-deeper lazy union plan whose eventual
    # evaluation would pay one shuffle per appended distinct layer — and
    # whose references keep every old batch's pinned frames alive
    _DUP_COLLAPSE = 16

    def _note_dups(self, attr: str, dups: DataFrame) -> None:
        """Append a (kind, label, dup_id) batch to a duplicate-metrics frame.

        Plain union per call (set semantics are applied lazily by the
        ``get_duplicate_*`` accessors and eagerly at each collapse) — a
        distinct per call would add a shuffle layer per writer call to the
        eventual evaluation plan."""
        prev = getattr(self, attr)
        merged = dups if prev is None else prev.unionByName(dups)
        prev_delta = self._dup_deltas.get(attr)
        self._dup_deltas[attr] = dups if prev_delta is None else prev_delta.unionByName(dups)
        self._dup_chain_len[attr] = self._dup_chain_len.get(attr, 0) + 1
        if self._dup_chain_len[attr] >= self._DUP_COLLAPSE:
            merged = materialize(merged.distinct())
            self._dup_chain_len[attr] = 0
        setattr(self, attr, merged)

    # NOTE for callers that DELETE the storage behind superseded seen
    # state: the lazy chains built by _note_dups reference the seen frames
    # live at append time, so persist the chains and repoint the
    # duplicate_* frames BEFORE deleting (stream_kg writes them into its
    # combined per-batch state generation) — otherwise the next chain
    # evaluation (a collapse, or get_duplicate_*) scans deleted files.

    def _dedup_against_seen(self, df: DataFrame, key_cols: list, seen_attr: str, kind: str, label_col: str) -> DataFrame:
        """First-wins within the batch + anti-join vs ids from earlier calls;
        replaces the reference's cross-call in-memory seen-sets. Duplicate
        occurrences are accumulated into metrics frames (D4)."""
        w = Window.partitionBy(*key_cols).orderBy(SEQ)
        if self.lazy_seen_pins and self.track_seen:
            return self._dedup_lazy(df, key_cols, seen_attr, kind, label_col, w)
        ranked = df.withColumn("_rn", F.row_number().over(w))
        # NOTE (negative result): pinning `ranked` pre-filter here (so the
        # stream's duplicate-metrics delta avoids re-running the window at
        # state-write time) saved ~0.6s/micro-batch at 32 cores but OOMs
        # the spark-submit default 1g driver heap at local[8] — the extra
        # full-row cache (on top of the mentions/edge_tuples/batch_first
        # pins) doesn't fit; serialized storage didn't fit either. The
        # window re-run reads the upstream pins, so it's bounded per-batch
        # work, not a scale hazard.
        #
        # The duplicate-metrics side gets its OWN window over a NARROW
        # (label, key, seq) projection instead of sharing `ranked`: the
        # dups plan is an independent subtree (only post-filter batch_first
        # is cached), so every evaluation — notably the stream's per-batch
        # state-delta write — re-runs the window, and sorting full-width
        # rows (props maps dominate the row size) cost ~2.5s/micro-batch at
        # 250k turns where the 3-column sort is ~0.4s. Tie order under
        # equal SEQ may differ between the two windows, but the metrics
        # record only the distinct (label, dup_id) pairs of non-first rows,
        # which is tie-invariant whenever SEQ is unique per row (both tuple
        # sources stamp a per-row monotonic _seq).
        narrow_cols = list(dict.fromkeys([label_col, *key_cols, SEQ]))
        ranked_narrow = df.select(*narrow_cols).withColumn("_rn", F.row_number().over(w))
        dups = (
            ranked_narrow.filter(F.col("_rn") > 1)
            .select(F.lit(kind).alias("kind"), F.col(label_col).alias("label"), F.col(key_cols[-1]).alias("dup_id"))
            .distinct()
        )
        attr = "duplicate_nodes" if kind == "node" else "duplicate_edges"
        self._note_dups(attr, dups)
        batch_first = ranked.filter(F.col("_rn") == 1).drop("_rn")
        if not self.track_seen:
            return batch_first
        seen = getattr(self, seen_attr)
        if seen is not None:
            cross_dups = (
                batch_first.join(seen, key_cols, "left_semi")
                .select(F.lit(kind).alias("kind"), F.col(label_col).alias("label"), F.col(key_cols[-1]).alias("dup_id"))
                .distinct()
            )
            self._note_dups(attr, cross_dups)
            batch_first = batch_first.join(seen, key_cols, "left_anti")
        # eager pin: evaluate the seen keys NOW so they are fixed even
        # when the writer's input plan is nondeterministic (ad-hoc
        # batch callers), at the cost of one scheduled job per call
        new_keys = batch_first.select(*key_cols).persist()
        new_keys.count()
        # the union needs NO distinct: new_keys is key-unique (row_number==1
        # keeps one row per key) and disjoint from seen (the anti-join
        # above), and seen is distinct by this same induction — a distinct
        # here would re-shuffle the ENTIRE cumulative seen state on every
        # call, O(all ids ever written) per micro-batch at stream scale
        merged = new_keys if seen is None else seen.unionByName(new_keys).persist()
        self._seen_pins.append(new_keys)
        if merged is not new_keys:
            self._seen_pins.append(merged)
        setattr(self, seen_attr, merged)
        prev_delta = self._seen_deltas.get(seen_attr)
        self._seen_deltas[seen_attr] = (
            new_keys if prev_delta is None else prev_delta.unionByName(new_keys)
        )
        return batch_first

    def _dedup_lazy(self, df: DataFrame, key_cols: list, seen_attr: str, kind: str, label_col: str, w) -> DataFrame:
        """Stream fast path (``lazy_seen_pins``): one window evaluation per
        call, duplicate metrics derived from the CACHED first-rows frame.

        The eager path's duplicate-metrics frames are independent plan
        subtrees (only post-dedup ``batch_first`` is cached), so the
        stream's per-batch state-delta write re-ran the whole upstream —
        mention pins -> triple aggregation -> translate -> window — once
        per metrics frame (profiled ~2s of a ~8s micro-batch at 250k turns
        for frames that are usually EMPTY). Here the window additionally
        folds each key group's duplicate evidence into the surviving first
        row as ``_dup_labels`` — ``collect_set(when(_rn > 1, label))``,
        bounded by the LABEL VOCABULARY, never group size, so a hot key
        with millions of occurrences stays O(labels) in state (NULL labels
        on duplicate rows are not representable in the set and are
        dropped; translated frames always carry labels) — and every
        metrics frame becomes a projection of tiny cached frames:

        - within-batch dups: explode ``_dup_labels`` off the firsts cache
          (key-unique, per-key label set => no distinct needed);
        - cross-batch dups: firsts ANTI batch_first keys — the complement
          of the seen anti-join, read from the two caches with NO extra
          scan of the cumulative seen generations;
        - the post-anti-join ``batch_first`` is cached SEPARATELY so the
          writer's downstream consumers (firsts-collect, part write, seen
          keys, next call's anti-join, the stream's generation write)
          share one anti-join evaluation.

        No eager count anywhere: the first consumer's job evaluates each
        cache. All pins are released by release_seen_state_pins() once the
        stream repoints the frames at durable generation files."""
        attr = "duplicate_nodes" if kind == "node" else "duplicate_edges"
        w_all = Window.partitionBy(*key_cols).orderBy(SEQ).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        ranked = df.withColumn("_rn", F.row_number().over(w))
        ranked = ranked.withColumn(
            "_dup_labels",
            F.collect_set(F.when(F.col("_rn") > 1, F.col(label_col))).over(w_all),
        )
        firsts = ranked.filter(F.col("_rn") == 1).drop("_rn").persist()
        self._seen_pins.append(firsts)
        dups = firsts.filter(F.size("_dup_labels") > 0).select(
            F.lit(kind).alias("kind"),
            F.explode("_dup_labels").alias("label"),
            F.col(key_cols[-1]).alias("dup_id"),
        )
        self._note_dups(attr, dups)
        seen = getattr(self, seen_attr)
        if seen is not None:
            batch_first = firsts.join(seen, key_cols, "left_anti").drop("_dup_labels").persist()
            self._seen_pins.append(batch_first)
            cross_dups = firsts.join(
                batch_first.select(*key_cols), key_cols, "left_anti"
            ).select(
                F.lit(kind).alias("kind"),
                F.col(label_col).alias("label"),
                F.col(key_cols[-1]).alias("dup_id"),
            )
            self._note_dups(attr, cross_dups)
        else:
            batch_first = firsts.drop("_dup_labels")
        new_keys = batch_first.select(*key_cols).persist()
        merged = new_keys if seen is None else seen.unionByName(new_keys).persist()
        self._seen_pins.append(new_keys)
        if merged is not new_keys:
            self._seen_pins.append(merged)
        setattr(self, seen_attr, merged)
        prev_delta = self._seen_deltas.get(seen_attr)
        self._seen_deltas[seen_attr] = (
            new_keys if prev_delta is None else prev_delta.unionByName(new_keys)
        )
        return batch_first

    def release_seen_state_pins(self) -> None:
        """Unpersist superseded seen-state cache entries.

        Call ONLY after the seen frames were repointed at durable storage
        (stream_kg does, after each committed generation write) — until
        then the pins back the live lazy unions, and unpersisting them
        would force a deep lineage recompute on the next anti-join."""
        for df in self._seen_pins:
            df.unpersist()
        self._seen_pins.clear()
        self._seen_deltas.clear()
        self._dup_deltas.clear()

    def take_state_deltas(self) -> tuple[dict[str, DataFrame], dict[str, DataFrame]]:
        """Hand over (and clear) the seen-key / duplicate-metrics deltas
        accumulated since the last call — the frames a streaming caller
        persists per micro-batch. MUST be consumed (written out) before
        release_seen_state_pins(): the delta frames reference the batch
        pins, and after release their lineage points at a foreachBatch
        input that no longer exists."""
        seen, dups = self._seen_deltas, self._dup_deltas
        self._seen_deltas, self._dup_deltas = {}, {}
        return seen, dups

    # -- nodes ----------------------------------------------------------------

    def write_nodes(self, nodes: DataFrame, force: bool = False) -> bool:
        """NODE_SCHEMA DataFrame -> part files + headers. Returns True."""
        nodes = nodes.filter(F.col("node_id").isNotNull())
        nodes = self._dedup_against_seen(
            nodes.withColumn("_key", F.col("node_id")), ["_key"], "_seen_nodes", "node", "node_label"
        ).drop("_key")
        nodes = nodes.persist()
        firsts = self._first_rows_per_label(nodes, "node_label")
        if not firsts:
            nodes.unpersist()
            return True

        prop_dicts = {}
        label_strings = {}
        for label, first_props in firsts.items():
            prop_dicts[label] = self.node_property_dict.get(label) or self._resolve_prop_dict(
                label, first_props, "node"
            )
            self.node_property_dict[label] = prop_dicts[label]
            label_strings[label] = self._all_labels(label, self.node_labels_order, force)
        self._validate_consistent_props(nodes, "node_label", prop_dicts)

        line, plabel = None, None
        for label in firsts:
            expr = node_line_expr(
                prop_dicts[label],
                label_strings[label],
                self.delim,
                self.adelim,
                self.quote,
                self.quote_mode,
                self.array_mode,
                self.node_line_includes_labels,
            )
            e = F.lit(pascal_file_label(label))
            if line is None:
                line, plabel = expr, e
            else:
                line = F.when(F.col("node_label") == label, expr).otherwise(line)
                plabel = F.when(F.col("node_label") == label, e).otherwise(plabel)

        lines_df = nodes.select(plabel.alias("_plabel"), line.alias("line"), F.col(SEQ))
        written = write_part_files(lines_df, self.outdir, self.batch_size, ordered=self.ordered_parts)
        for plab, names in written.items():
            self.parts.setdefault(plab, []).extend(names)
        nodes.unpersist()
        self._write_node_headers()
        return True

    def _write_node_headers(self) -> None:
        for label, props in self.node_property_dict.items():
            plabel = pascal_file_label(label)
            cols = [":ID"] + [_header_type_suffix(k, v) for k, v in props.items()] + [":LABEL"]
            with open(os.path.join(self.outdir, f"{plabel}-header.csv"), "w", encoding="utf-8") as fh:
                fh.write(self.delim.join(cols))
            self.import_call_nodes.add(
                (
                    os.path.join(self.import_call_file_prefix, f"{plabel}-header.csv"),
                    os.path.join(self.import_call_file_prefix, f"{plabel}-part.*"),
                )
            )

    # -- edges ----------------------------------------------------------------

    def _edge_schema_label(self, label: str) -> Optional[str]:
        """Resolve an edge label back to its schema class (handles
        label_as_edge); None for rel-as-node helper labels."""
        if label in _RAN_EDGE_LABELS:
            return None
        schema = self.translator.ontology.mapping.extended_schema
        if schema.get(label):
            return label
        for k, v in schema.items():
            if isinstance(v, dict) and v.get("label_as_edge") == label:
                return k
        return None

    def _edge_skip_id(self, label: str) -> bool:
        if label in _RAN_EDGE_LABELS:
            return True
        schema_label = self._edge_schema_label(label)
        if schema_label:
            conf = self.translator.ontology.mapping.extended_schema.get(schema_label, {})
            if conf.get("use_id") is False:
                return True
        return False

    def write_edges(self, edges) -> bool:
        """EDGE_SCHEMA DataFrame or TranslatedEdges -> part files + headers.

        A TranslatedEdges carries the rel-as-node split: reified nodes are
        deduped in the relationship namespace first (D3), then written
        through the node path, and their helper edges written alongside
        (reference ``write_edges``,
        /root/reference/biocypher/output/write/_batch_writer.py:437-510).
        """
        if isinstance(edges, TranslatedEdges):
            ran_nodes, ran_edges = edges.ran_nodes, edges.ran_edges
            plain = edges.edges
        else:
            ran_nodes, ran_edges, plain = None, None, edges

        all_edges = plain
        if ran_nodes is not None:
            from ..translate import RAN_HIDDEN_COLS, ran_helper_edges

            ran_nodes = self._dedup_against_seen(
                ran_nodes.withColumn("_key", F.col("node_id")).withColumn("_klabel", F.col("node_label")),
                ["_klabel", "_key"],
                "_seen_ran",
                "edge",
                "node_label",
            ).drop("_key", "_klabel")
            if all(c in ran_nodes.columns for c in RAN_HIDDEN_COLS):
                # rebuild helper edges from the SURVIVING node rows (narrow
                # explode) — deterministic even when SEQ ties across duplicate
                # triplets, unlike a (target_id, SEQ) semi-join
                ran_edges = ran_helper_edges(ran_nodes.select("node_id", *RAN_HIDDEN_COLS, SEQ))
                ran_nodes = ran_nodes.drop(*RAN_HIDDEN_COLS)
            else:
                surviving = ran_nodes.select(F.col("node_id").alias("target_id"), SEQ)
                ran_edges = ran_edges.join(surviving, ["target_id", SEQ], "left_semi")
            if ran_nodes.limit(1).count() > 0:
                self.write_nodes(ran_nodes)
            all_edges = plain.unionByName(ran_edges) if plain is not None else ran_edges

        all_edges = all_edges.filter(F.col("source_id").isNotNull() & F.col("target_id").isNotNull())
        all_edges = self._dedup_against_seen(
            all_edges.withColumn("_key", edge_dedup_key()).withColumn("_klabel", F.col("relationship_label")),
            ["_klabel", "_key"],
            "_seen_edges",
            "edge",
            "relationship_label",
        ).drop("_key", "_klabel")
        all_edges = all_edges.persist()

        firsts = self._first_rows_per_label(all_edges, "relationship_label")
        if not firsts:
            all_edges.unpersist()
            return True
        prop_dicts = {}
        for label, first_props in firsts.items():
            prop_dicts[label] = self.edge_property_dict.get(label) or self._resolve_prop_dict(
                label, first_props, "edge"
            )
            self.edge_property_dict[label] = prop_dicts[label]
        self._validate_consistent_props(all_edges, "relationship_label", prop_dicts)

        line = None
        plabel = None
        for label in firsts:
            label_string = self._all_labels(label, self.edge_labels_order)
            expr = edge_line_expr(
                prop_dicts[label],
                label_string,
                self.delim,
                self.adelim,
                self.quote,
                self._edge_skip_id(label),
                self.quote_mode,
                self.array_mode,
                self.edge_line_includes_labels,
            )
            e = F.lit(pascal_file_label(label))
            if line is None:
                line, plabel = expr, e
            else:
                line = F.when(F.col("relationship_label") == label, expr).otherwise(line)
                plabel = F.when(F.col("relationship_label") == label, e).otherwise(plabel)

        lines_df = all_edges.select(plabel.alias("_plabel"), line.alias("line"), F.col(SEQ))
        written = write_part_files(lines_df, self.outdir, self.batch_size, ordered=self.ordered_parts)
        for plab, names in written.items():
            self.parts.setdefault(plab, []).extend(names)
        all_edges.unpersist()
        self._write_edge_headers()
        return True

    def _write_edge_headers(self) -> None:
        for label, props in self.edge_property_dict.items():
            plabel = pascal_file_label(label)
            cols = [":START_ID"]
            if not self._edge_skip_id(label):
                cols.append("id")
            cols += [_header_type_suffix(k, v) for k, v in props.items()]
            cols += [":END_ID", ":TYPE"]
            with open(os.path.join(self.outdir, f"{plabel}-header.csv"), "w", encoding="utf-8") as fh:
                fh.write(self.delim.join(cols))
            self.import_call_edges.add(
                (
                    os.path.join(self.import_call_file_prefix, f"{plabel}-header.csv"),
                    os.path.join(self.import_call_file_prefix, f"{plabel}-part.*"),
                )
            )

    # -- import call -----------------------------------------------------------

    def _import_call(self, import_cmd: str, database_cmd: str, wipe_cmd: str) -> str:
        call = f"{self.import_call_bin_prefix}neo4j-admin {import_cmd} "
        call += f"{database_cmd}{self.db_name} "
        call += f'--delimiter="{self._escaped(self.delim)}" '
        call += f'--array-delimiter="{self._escaped(self.adelim)}" '
        if self.quote == "'":
            call += f'--quote="{self.quote}" '
        else:
            call += f"--quote='{self.quote}' "
        if self.wipe:
            call += f"{wipe_cmd}true "
        if self.skip_bad_relationships:
            call += "--skip-bad-relationships=true "
        if self.skip_duplicate_nodes:
            call += "--skip-duplicate-nodes=true "
        for header, parts in sorted(self.import_call_nodes):
            call += f'--nodes="{header},{parts}" '
        for header, parts in sorted(self.import_call_edges):
            call += f'--relationships="{header},{parts}" '
        return call

    def get_import_call(self) -> str:
        v4 = self._import_call("import", "--database=", "--force=")
        v5 = self._import_call("database import full", "", "--overwrite-destination=")
        shell = os.environ.get("SHELL", "/bin/bash")
        check = f"version=$({self.import_call_bin_prefix}neo4j-admin --version | cut -d '.' -f 1)"
        return (
            f"#!{shell}\n"
            f"{check}\n"
            'echo "Neo4j detected version: $version" >&2\n'
            "if [[ $version -lt 5 ]] ; then\n"
            f"    {v4}\n"
            "else\n"
            f"    {v5}\n"
            "fi\n"
        )

    def _import_script_name(self) -> str:
        return "neo4j-admin-import-call.sh"

    def write_import_call(self) -> str:
        path = os.path.join(self.outdir, self._import_script_name())
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(self.get_import_call())
        return path

    # -- duplicate reporting ----------------------------------------------------

    def get_duplicate_nodes(self):
        # set semantics: per-call appends are plain unions (see _note_dups)
        return None if self.duplicate_nodes is None else self.duplicate_nodes.distinct()

    def get_duplicate_edges(self):
        return None if self.duplicate_edges is None else self.duplicate_edges.distinct()
