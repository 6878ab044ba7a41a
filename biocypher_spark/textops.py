"""Training-data text operators: dedup family, language ID, quality scoring,
token counting, fingerprinting (large-scale pipeline extensions; task brief).

All operators are built-in column expressions (whole-stage codegen). Hash
flavored operators use md5, which is identical in Spark and DuckDB, so every
operator here is oracle-checkable. Floats are rounded to 6 decimals.

Scale notes: exact dedup and minhash grouping are single hash shuffles on
the signature; the pairwise n-gram Jaccard is *blocked* (lang, length
bucket) to stay sub-quadratic; simhash is a linear scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MINHASH_SEEDS = 4
SIMHASH_BITS = 16

_STOPWORDS = ["the", "and", "of", "a", "in", "to", "is"]
_LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "und", "das", "die"],
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "de", "que"],
    "fr": ["le", "et", "les", "des"],
}
_PUNCT = "[.,;:!?']"


def tokens(col: Column) -> Column:
    return F.split(col, " ")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish subword counting."""
    toks = tokens(F.col(text_col))
    # BPE-ish proxy: alphanumeric runs + punctuation marks counted separately
    subword = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)))
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        subword.alias("n_subwords"),
        F.length(text_col).alias("n_chars_check"),
    )


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: representative = min doc_id per text."""
    return df.groupBy(text_col).agg(
        F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("n")
    ).select("rep_id", "n")


def minhash_signature(col: Column, seeds: int = MINHASH_SEEDS) -> list[Column]:
    """Token-set minhash: per seed, min md5(seed || token).

    Lexicographic min over md5 hex strings is a valid uniform min-hash and is
    engine-portable (identical md5 in Spark and DuckDB).
    """
    toks = tokens(col)

    def hasher(seed: int):
        # single-param lambda: a 2-param lambda would receive the array
        # index as its second argument from Spark's higher-order functions
        return lambda t: F.md5(F.concat(F.lit(str(seed)), t))

    return [F.array_min(F.transform(toks, hasher(b))).alias(f"sig{b}") for b in range(seeds)]


def minhash_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Near-dup groups = identical full minhash signature; returns
    (doc_id, rep_id)."""
    from pyspark.sql import Window

    sigs = df.select("doc_id", *minhash_signature(F.col(text_col)))
    w = Window.partitionBy(*[f"sig{b}" for b in range(MINHASH_SEEDS)])
    return sigs.select("doc_id", F.min("doc_id").over(w).alias("rep_id"))


def simhash(df: DataFrame, text_col: str = "text", bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash over the token multiset: bit i set when the sum of ±1 votes
    from md5-derived token bits is >= 0. Returns (doc_id, simhash)."""
    toks = tokens(F.col(text_col))
    total = F.lit(0)
    for i in range(bits):
        pos = i // 4 + 1
        shift = 3 - i % 4
        def vote(t, pos=pos, shift=shift):
            digit = F.instr(F.lit("0123456789abcdef"), F.substring(F.md5(t), pos, 1)) - 1
            bit = F.shiftright(digit, shift).bitwiseAND(F.lit(1))
            return bit * 2 - 1
        s = F.aggregate(toks, F.lit(0), lambda acc, t: acc + vote(t))
        total = total + F.when(s >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.select("doc_id", total.alias("simhash"))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", threshold: float = 0.5) -> DataFrame:
    """Blocked pairwise token-set Jaccard: candidates share (lang,
    n_chars) block; emits (doc_a, doc_b, jac) above threshold."""
    toks = F.array_distinct(F.array_sort(tokens(F.col(text_col))))
    base = df.select("doc_id", "lang", "n_chars", toks.alias("toks"))
    a = base.select(
        F.col("doc_id").alias("doc_a"), F.col("lang"), F.col("n_chars"), F.col("toks").alias("ta")
    )
    b = base.select(
        F.col("doc_id").alias("doc_b"), F.col("lang"), F.col("n_chars"), F.col("toks").alias("tb")
    )
    pairs = a.join(b, ["lang", "n_chars"]).filter(F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size(F.array_union("ta", "tb"))
    jac = F.round(inter / union, 6)
    return pairs.select("doc_a", "doc_b", jac.alias("jac")).filter(F.col("jac") >= threshold)


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax marker count, alphabetical tie-break,
    'und' (undetermined) when no marker hits."""
    toks = tokens(F.col(text_col))

    def in_set(values: list[str]):
        return lambda t: t.isin(*values)

    counts = {
        lang: F.size(F.filter(toks, in_set(markers))) for lang, markers in _LANG_MARKERS.items()
    }
    best = F.greatest(*counts.values())
    pred = F.lit("und")
    for lang in sorted(_LANG_MARKERS, reverse=True):
        pred = F.when((best > 0) & (counts[lang] == best), F.lit(lang)).otherwise(pred)
    return df.select("doc_id", pred.alias("lang_pred"))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: token count, stopword ratio, punctuation
    density -> score in [0, 1]."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS))) / n
    punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(_PUNCT), F.lit(0)))
    punct_ratio = punct / F.length(text_col)
    score = F.least(F.lit(1.0), n / F.lit(100.0)) * (1 - punct_ratio) * (1 - stop_ratio / 2)
    return df.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("score"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: 64-bit prefix of md5 (content-addressed id)."""
    return df.select("doc_id", F.substring(F.md5(text_col), 1, 16).alias("fp"))
