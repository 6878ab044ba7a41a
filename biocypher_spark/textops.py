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
    """Exact duplicate groups: representative = min doc_id per text.

    Groups on ``md5(text)`` rather than the raw text so the shuffle moves a
    32-byte key instead of full document bodies — at 100 TB that is the
    difference between shuffling ~3 TB of keys and shuffling the corpus.
    """
    return df.groupBy(F.md5(text_col)).agg(
        F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("n")
    ).select("rep_id", "n")


def minhash_signature(col: Column, seeds: int = MINHASH_SEEDS, elements: Column | None = None) -> list[Column]:
    """Set minhash: per seed, min md5(seed || element).

    Lexicographic min over md5 hex strings is a valid uniform min-hash and is
    engine-portable (identical md5 in Spark and DuckDB). ``elements`` defaults
    to the whitespace token array of ``col``; pass a shingle array for
    character-level hashing.
    """
    toks = tokens(col) if elements is None else elements

    def hasher(seed: int):
        # single-param lambda: a 2-param lambda would receive the array
        # index as its second argument from Spark's higher-order functions
        return lambda t: F.md5(F.concat(F.lit(str(seed)), t))

    return [F.array_min(F.transform(toks, hasher(b))).alias(f"sig{b}") for b in range(seeds)]


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct character n-grams (shingles) of a string column, built-ins
    only: index sequence -> substring slices, exact-length filter."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.filter(F.transform(idx, lambda i: F.substr(col, i, F.lit(n))), lambda s: F.length(s) == n)
    )


def minhash_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Near-dup groups = identical full minhash signature; returns
    (doc_id, rep_id). AND-only (catches near-identical docs); for graded
    similarity use :func:`minhash_banded_pairs` (OR across bands)."""
    from pyspark.sql import Window

    sigs = df.select("doc_id", *minhash_signature(F.col(text_col)))
    w = Window.partitionBy(*[f"sig{b}" for b in range(MINHASH_SEEDS)])
    return sigs.select("doc_id", F.min("doc_id").over(w).alias("rep_id"))


def minhash_band_candidates(
    df: DataFrame,
    text_col: str = "text",
    bands: int = 4,
    rows_per_band: int = 3,
    elements: Column | None = None,
) -> DataFrame:
    """Banded-LSH candidate pairs: ``bands`` × ``rows_per_band`` minhash
    signature; a pair is a candidate when ANY band (the concat of its
    ``rows_per_band`` sig values) matches — the classic b×r OR-of-ANDs.

    Scale: each band key is a 3×32-hex concat, so the per-band self-join is
    a hash join on a short string with bucket sizes bounded by true
    similarity structure; candidates are deduped across bands before the
    (more expensive) exact verification.
    """
    seeds = bands * rows_per_band
    sigs = df.select("doc_id", *minhash_signature(F.col(text_col), seeds=seeds, elements=elements))
    frames = []
    for b in range(bands):
        key = F.concat_ws("|", *[F.col(f"sig{b * rows_per_band + r}") for r in range(rows_per_band)])
        frames.append(sigs.select("doc_id", F.lit(b).alias("band"), key.alias("bkey")))
    assigned = frames[0]
    for fr in frames[1:]:
        assigned = assigned.unionByName(fr)
    a = assigned.select("band", "bkey", F.col("doc_id").alias("doc_a"))
    c = assigned.select("band", "bkey", F.col("doc_id").alias("doc_b"))
    return (
        a.join(c, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_banded_pairs(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    bands: int = 4,
    rows_per_band: int = 3,
) -> DataFrame:
    """Token-set near-dup pairs: banded-minhash candidates, exact Jaccard
    re-verification >= threshold. Returns (doc_a, doc_b, jac)."""
    cand = minhash_band_candidates(df, text_col, bands, rows_per_band)
    toks = F.array_distinct(F.array_sort(tokens(F.col(text_col))))
    base = df.select("doc_id", toks.alias("toks"))
    ta = base.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    tb = base.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size(F.array_union("ta", "tb"))
    jac = F.round(inter / union, 6)
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jac"))
        .filter(F.col("jac") >= threshold)
    )


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


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    bands: int = 4,
    rows_per_band: int = 3,
) -> DataFrame:
    """Character n-gram (shingle) Jaccard near-dup pairs.

    Candidates come from banded minhash over the shingle sets (OR across
    bands) — bounded by similarity structure, never by an unbounded exact
    block key like (lang, length) whose hot blocks degenerate to all-pairs.
    Survivors are exactly re-scored on the full shingle sets.
    """
    sh = shingles(F.col(text_col), n)
    cand = minhash_band_candidates(df, text_col, bands, rows_per_band, elements=sh)
    base = df.select("doc_id", sh.alias("sh")).filter(F.size("sh") > 0)
    sa = base.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa"))
    sb = base.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size(F.array_union("sa", "sb"))
    jac = F.round(inter / union, 6)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jac"))
        .filter(F.col("jac") >= threshold)
    )


_HEX = "0123456789abcdef"
_POPCOUNT4 = "0112122312232334"  # popcount lookup for a 4-bit value


def _simhash_vote(t: Column, pos: int, shift: int) -> Column:
    """±1 vote for one simhash bit from one token: bit ``shift`` of md5 hex
    digit ``pos``."""
    digit = F.instr(F.lit(_HEX), F.substring(F.md5(t), pos, 1)) - 1
    bit = F.shiftright(digit, shift).bitwiseAND(F.lit(1))
    return bit * 2 - 1


def simhash64(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over the token multiset, emitted as a 16-char hex
    string (hex avoids the signed-bigint overflow of bit 63 and is
    engine-portable). Bit i (nibble k = i//4, bit j = i%4 within the nibble)
    is set when the ±1 votes from md5 hex digit k+1 sum >= 0."""
    toks = tokens(F.col(text_col))

    def voter(pos: int, shift: int):
        return lambda acc, t: acc + _simhash_vote(t, pos, shift)

    nibbles = []
    for k in range(16):
        val = F.lit(0)
        for j in range(4):
            i = k * 4 + j
            s = F.aggregate(toks, F.lit(0), voter(i // 4 + 1, 3 - i % 4))
            val = val + F.when(s >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        nibbles.append(F.substr(F.lit(_HEX), val + 1, F.lit(1)))
    return df.select("doc_id", F.concat(*nibbles).alias("simhash64"))


def simhash_near_dup(df: DataFrame, text_col: str = "text", max_hamming: int = 3, bands: int = 4) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit hash into ``bands`` chunks;
    pairs sharing ANY chunk are candidates (pigeonhole: any pair within
    Hamming distance < bands shares a chunk, so recall is exact for
    ``max_hamming`` <= bands - 1); verify exact Hamming <= max_hamming.

    Hamming distance is computed nibble-wise with a popcount lookup string —
    identical expression in Spark and DuckDB, no bit_count dependency.
    Returns (doc_a, doc_b, hamming).
    """
    sh = simhash64(df, text_col)
    width = 16 // bands  # hex chars per band
    frames = [
        sh.select("doc_id", F.lit(b).alias("band"), F.substring("simhash64", b * width + 1, width).alias("bkey"))
        for b in range(bands)
    ]
    assigned = frames[0]
    for fr in frames[1:]:
        assigned = assigned.unionByName(fr)
    a = assigned.select("band", "bkey", F.col("doc_id").alias("doc_a"))
    c = assigned.select("band", "bkey", F.col("doc_id").alias("doc_b"))
    cand = (
        a.join(c, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ha = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash64").alias("_ha"))
    hb = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash64").alias("_hb"))
    hamming = F.lit(0)
    for k in range(16):
        na = F.instr(F.lit(_HEX), F.substring("_ha", k + 1, 1)) - 1
        nb = F.instr(F.lit(_HEX), F.substring("_hb", k + 1, 1)) - 1
        x = na.bitwiseXOR(nb)
        hamming = hamming + F.substr(F.lit(_POPCOUNT4), x + 1, F.lit(1)).cast("int")
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


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
