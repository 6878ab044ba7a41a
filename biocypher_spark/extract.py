"""Mention detection over transcript text (NEW stage; north_rule).

Two implementations with identical output contracts for NON-OVERLAPPING
pattern sets (the default gazetteer is one; the equivalence is asserted in
tests). When two patterns can match overlapping spans of the same text, the
``mapInPandas`` path's single combined alternation resolves the overlap by
leftmost-then-pattern-order precedence (each character is consumed once),
while the per-pattern ``regexp_extract_all`` path scans the full text once
PER label and reports every label's own matches — pick the variant whose
semantics fit such gazetteers deliberately:

  * ``extract_mentions`` — Arrow-vectorized ``mapInPandas``: pandas
    batches scanned by one compiled alternation regex over salted,
    size-balanced partitions. This is the flagship path required by the
    north rule ("batched mention detection ... inside vectorized
    pandas/Arrow UDFs, no per-row Python").
  * ``extract_mentions_expr`` — pure built-in ``regexp_extract_all`` +
    ``explode``; stays in whole-stage codegen and is trivially expressible
    as the DuckDB oracle SQL, so it anchors the correctness harness.

Output: one row per mention with lineage back to (conv_id, turn_idx); the
raw ``text`` column is never mutated (per-turn text-equality invariant).

The reference has no extraction stage — it delegates to user "adapters"
that yield tuples (/root/reference/biocypher/_core.py:455-478); this module
is the Spark-native adapter for transcript corpora.
"""

from __future__ import annotations

import re
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# default gazetteer patterns for the synthetic corpus; callers pass their own
DEFAULT_PATTERNS: dict[str, str] = {
    "protein": r"(?:PROT|prot-|Protein )\d+",
    "disease": r"DIS\d+",
}

MENTION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("input_label", T.StringType()),
        T.StructField("surface", T.StringType()),
        T.StructField("m_pos", T.IntegerType()),
    ]
)


def salt_partitions(df: DataFrame, num_partitions: Optional[int] = None) -> DataFrame:
    """Size-balance by (conv_id, turn_idx) hash: hot conversations are
    split across partitions instead of hammering one executor.

    Partitions on the RAW 64-bit xxhash64 — not a pre-bucketed
    ``pmod(hash, n)`` value: repartition re-hashes its key with murmur3, and
    murmur3 over only n distinct bucket ids is a balls-in-bins draw (~1/e of
    partitions empty, 3-4x max skew). The full-domain hash spreads evenly.
    ``num_partitions``: callers at scale should size this to the input
    (an explicit repartition count is outside AQE's reach); the default
    2x parallelism is the local/balanced-shard setting."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism * 2
    return df.repartition(n, F.xxhash64("conv_id", "turn_idx"))


def _compile_gazetteer(patterns: dict[str, str]):
    """One combined alternation regex + per-label group bookkeeping.

    Returns (labels, combined, gidx, simple): ``gidx[j]`` is the group
    number of label j's named wrapper group ``g{j}``; ``simple`` is True
    when no user pattern adds inner capturing groups, in which case
    ``match.lastindex - 1`` IS the label index (fast path — no per-match
    group scan).

    Rejects patterns the alternation cannot represent faithfully: wrapping
    shifts group numbers, so a numeric backreference (``\\1``) or named
    backreference (``(?P=x)``) inside a user pattern would silently bind to
    the WRONG group and drop mentions; a user group named ``g<digit+>``
    would collide with the wrapper names. Loud error > silent corruption —
    such patterns work with :func:`extract_mentions_expr` (compiled
    per-label, no renumbering)."""
    labels = list(patterns)
    for label, p in patterns.items():
        # Only an UNESCAPED \1 / (?P= is a real backreference: an even run
        # of preceding backslashes means the token is literal text (e.g.
        # r"\\1" = literal backslash + '1') and renumbering is harmless.
        if re.search(r"(?<!\\)(?:\\\\)*(?:\\[1-9]|\(\?P=)", p):
            raise ValueError(
                f"pattern for {label!r} uses a regex backreference, which the "
                "combined gazetteer alternation cannot renumber — use "
                "extract_mentions_expr for this pattern set"
            )
        if re.search(r"\(\?P<g\d+>", p):
            raise ValueError(
                f"pattern for {label!r} defines a group named 'g<digits>', "
                "which collides with the gazetteer's wrapper groups — rename it"
            )
    combined = re.compile("|".join(f"(?P<g{j}>{p})" for j, p in enumerate(patterns.values())))
    gidx = [combined.groupindex[f"g{j}"] for j in range(len(labels))]
    return labels, combined, gidx, combined.groups == len(labels)


def extract_mentions(
    transcripts: DataFrame,
    patterns: Optional[dict[str, str]] = None,
    balance: bool = True,
) -> DataFrame:
    """mapInPandas extraction: one Arrow batch in, mention rows out."""
    patterns = patterns or DEFAULT_PATTERNS
    labels, combined, gidx, simple = _compile_gazetteer(patterns)
    n_labels = len(labels)

    # finditer over the batch beats pandas str.extractall + melt ~3x here:
    # extractall builds a MultiIndex match frame that the melt/merge/sort
    # then reshapes twice; the comprehension emits final columns directly
    # (A/B: 108 ms vs 38 ms per 10k-row synthetic batch, identical output)
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            conv = pdf["conv_id"].values
            turn = pdf["turn_idx"].values
            o_conv: list = []
            o_turn: list = []
            o_label: list = []
            o_surface: list = []
            o_pos: list = []
            for r, t in enumerate(pdf["text"].values):
                if not isinstance(t, str) or not t:
                    continue
                counts = [0] * n_labels
                for m in combined.finditer(t):
                    g = (
                        m.lastindex - 1
                        if simple
                        else next(j for j, gi in enumerate(gidx) if m.group(gi) is not None)
                    )
                    o_conv.append(conv[r])
                    o_turn.append(turn[r])
                    o_label.append(labels[g])
                    o_surface.append(m.group())
                    # m_pos = occurrence index per (turn, label), matching
                    # the posexplode semantics of the expression variant
                    o_pos.append(counts[g])
                    counts[g] += 1
            if not o_label:
                continue
            yield pd.DataFrame(
                {
                    "conv_id": o_conv,
                    # nullable Int32: a NULL turn_idx arrives as NaN in a
                    # float64 column; plain int32 would raise on it
                    "turn_idx": pd.array(o_turn, dtype="Int32"),
                    "input_label": o_label,
                    "surface": o_surface,
                    "m_pos": pd.array(o_pos, dtype="int32"),
                }
            )

    # project before the Python stage: only (conv_id, turn_idx, text) cross
    # the Arrow boundary — role/tool/ts would roughly double IPC volume,
    # which is the scaling bottleneck on syscall-expensive hosts
    src = transcripts.select("conv_id", "turn_idx", "text")
    if balance:
        src = salt_partitions(src, None)
    return src.mapInPandas(run, MENTION_SCHEMA)


GROUPED_MENTION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField(
            "ms",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("input_label", T.StringType()),
                        T.StructField("surface", T.StringType()),
                        T.StructField("m_pos", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def extract_mentions_grouped(
    transcripts: DataFrame,
    patterns: Optional[dict[str, str]] = None,
    balance: bool = False,
) -> DataFrame:
    """Per-turn grouped extraction: one output row per turn carrying the
    mention array.

    This shape keeps downstream co-occurrence pair generation **turn-local**
    — pairs expand from the array with JVM expressions, so the hot path has
    zero shuffles (mentions = explode; pairs = array expansion; entity ids =
    broadcast joins). At 10^12 turns that removes the only O(corpus)
    shuffle of the evidence DAG.
    """
    patterns = patterns or DEFAULT_PATTERNS
    labels, combined, gidx, simple = _compile_gazetteer(patterns)
    n_labels = len(labels)

    # same finditer kernel as extract_mentions (see the A/B note there);
    # mentions accumulate into the per-row array instead of flat columns
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out_ms: list = []
            for t in pdf["text"].values:
                ms: list = []
                if isinstance(t, str) and t:
                    counts = [0] * n_labels
                    for m in combined.finditer(t):
                        g = (
                            m.lastindex - 1
                            if simple
                            else next(j for j, gi in enumerate(gidx) if m.group(gi) is not None)
                        )
                        ms.append((labels[g], m.group(), counts[g]))
                        counts[g] += 1
                out_ms.append(ms)
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].values,
                    # nullable Int32 (not .astype("int32")): a NULL turn_idx
                    # makes Arrow deliver the column as float64-with-NaN,
                    # and the non-nullable cast raises on the whole batch
                    "turn_idx": pd.array(pdf["turn_idx"], dtype="Int32"),
                    "ms": out_ms,
                }
            )

    src = transcripts.select("conv_id", "turn_idx", "text")
    if balance:
        src = salt_partitions(src, None)
    return src.mapInPandas(run, GROUPED_MENTION_SCHEMA)


def extract_mentions_expr(
    transcripts: DataFrame,
    patterns: Optional[dict[str, str]] = None,
) -> DataFrame:
    """Built-in extraction: regexp_extract_all per label + posexplode."""
    patterns = patterns or DEFAULT_PATTERNS
    per_label = []
    for label, pat in patterns.items():
        hits = F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))
        per_label.append(
            transcripts.select(
                "conv_id",
                "turn_idx",
                F.lit(label).alias("input_label"),
                F.posexplode(hits).alias("m_pos", "surface"),
            ).select("conv_id", "turn_idx", "input_label", "surface", "m_pos")
        )
    out = per_label[0]
    for other in per_label[1:]:
        out = out.unionByName(other)
    return out


def normalize_surface(col) -> F.Column:
    """Blocking key: lowercase, strip non-alphanumerics.

    ``PROT7`` / ``prot-7`` / ``Protein 7`` -> ``prot7`` / ``prot7`` /
    ``protein7`` — variants collapse either directly or via the similarity
    join in linking.py.
    """
    return F.regexp_replace(F.lower(col), "[^a-z0-9]", "")
