"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting (driver north-star surface, SURVEY.md §2.8).

All expression-only (whole-stage codegen; no Python in the data path).

Hashing comes in two flavors:
- ``xxhash64`` (Spark built-in) — the production default: fastest, 64-bit,
  but engine-specific.
- ``portable_char_hash`` — md5's top 60 bits mod a prime, computed with
  each engine's NATIVE md5. Bit-identical across Spark and DuckDB, which
  lets dedup/fingerprint/minhash queries carry full value oracles, and
  codegen-fast on the Spark side (no interpreted fold). xxhash64 remains
  available via ``hash_mode`` where cross-engine checkability isn't needed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD = 1_000_000_007

# Fixed per-permutation multipliers/offsets for MinHash (small primes keep
# a*h + b < 2^63 with h < MOD).
MINHASH_PARAMS: list[tuple[int, int]] = [
    (2, 1), (3, 7), (5, 11), (7, 19), (11, 23), (13, 31), (17, 43), (19, 59),
    (23, 61), (29, 67), (31, 71), (37, 73), (41, 79), (43, 83), (47, 89), (53, 97),
]


def portable_char_hash(col: Column | str) -> Column:
    """Cross-engine portable string hash: the top 60 bits of ``md5``,
    reduced mod a prime — identical VALUES in Spark and DuckDB.

    md5 is NATIVE in both engines (Spark: codegen'd JVM expression;
    DuckDB: C++), so this stays on the whole-stage-codegen fast path.
    The previous formulation — a per-character polynomial fold via
    ``F.aggregate`` — produced the same cross-engine portability but ran
    interpreted (higher-order functions are CodegenFallback), costing
    ~10× on hash-heavy operators (SimHash measured 2.7s → this form
    ~0.6s at sf0.1). The ``% MOD`` reduction keeps values < 2^30 so
    MinHash's ``(a*h + b) % MOD`` universal-hash params cannot overflow
    a 64-bit long.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long") % MOD
    )


def portable_char_hash_sql(expr: str) -> str:
    """DuckDB SQL equivalent of ``portable_char_hash`` (same md5 bits,
    same mod reduction; DuckDB parses the '0x…' hex prefix natively)."""
    return (
        f"(CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT) % {MOD})"
    )


def portable_char_hash_py(s: str) -> int:
    """Driver-side Python twin of ``portable_char_hash`` — same md5 top
    60 bits, same mod reduction, so a value hashed in-plan (e.g. into a
    per-file Bloom set) can be probed from the driver without a Spark
    job. Equality with the Column form is pinned by a test."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % MOD


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (empty strings filtered)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda x: x != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def chunk_documents(
    df: "DataFrame",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> "DataFrame":
    """Split documents into overlapping token windows — the context-window
    chunking step of a training/RAG corpus pipeline.

    Output: (id, chunk_index, chunk_start, chunk_text, chunk_tokens), one
    row per window; starts are 1, 1+stride, … while ≤ n_tokens (the last
    chunk may be short); empty docs yield no chunks.

    Plan shape (the scale-relevant part): the Generate explodes only the
    cheap START-position sequence; the chunk text (slice + join over the
    token array, per OUTPUT row by construction) is computed AFTER the
    explode from the carried token array. Exploding a pre-built
    chunk-text array instead would hand Generate a CodegenFallback
    higher-order child, which it re-evaluates per output row. Zero shuffle
    either way: chunking is a pure row-local projection.
    """
    toks = tokens(F.col(text_col))
    with_toks = df.select(
        F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__n")
    )
    starts = F.when(
        F.col("__n") > 0, F.sequence(F.lit(1), F.col("__n"), F.lit(stride))
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    exploded = with_toks.select(
        id_col,
        "__toks",
        "__n",
        F.posexplode(starts).alias("chunk_index", "chunk_start"),
    )
    piece = F.slice(F.col("__toks"), F.col("chunk_start"), window)
    return exploded.select(
        id_col,
        "chunk_index",
        "chunk_start",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.least(F.lit(window), F.col("__n") - F.col("chunk_start") + 1)
        .cast("long")
        .alias("chunk_tokens"),
    )


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("long")


def type_token_ratio(col: Column | str) -> Column:
    """Lexical diversity: distinct tokens / tokens (0 for empty docs)."""
    n = token_count(col)
    return F.when(n > 0, distinct_token_count(col) / n).otherwise(F.lit(0.0))


# Explicit codepoint ranges (not engine regex script classes) so the SAME
# pattern strings run in Spark (Java regex) and DuckDB (RE2) with identical
# semantics — script classes are spelled differently across engines.
SCRIPT_RANGES: dict[str, str] = {
    "latin": "a-zA-Z",
    "cyrillic": "Ѐ-ӿ",
    "han": "一-鿿",
    "arabic": "؀-ۿ",
}


def script_counts(col: Column | str) -> dict[str, Column]:
    """Per-script character counts (length after deleting non-script chars)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.length(F.regexp_replace(c, f"[^{rng}]", "")).cast("long")
        for name, rng in SCRIPT_RANGES.items()
    }


def dominant_script(col: Column | str) -> Column:
    """Argmax script by character count; fixed precedence order breaks ties
    (latin > cyrillic > han > arabic); 'und' when no script chars at all."""
    counts = script_counts(col)
    names = list(SCRIPT_RANGES)
    best = counts[names[0]]
    expr = F.lit(names[0])
    for name in names[1:]:
        expr = F.when(counts[name] > best, F.lit(name)).otherwise(expr)
        best = F.greatest(best, counts[name])
    return F.when(best > 0, expr).otherwise(F.lit("und"))


URL_PATTERN = r"https?://[^\s]+"
DOMAIN_PATTERN = r"https?://([^/\s]+)"


def extract_urls(col: Column | str) -> Column:
    """array<string> of URLs in the text (same regex runs in DuckDB)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(URL_PATTERN), 0)


def url_domain(url_col: Column | str) -> Column:
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.regexp_extract(c, DOMAIN_PATTERN, 1)


STOPWORDS_BY_LANG: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "de", "y", "que", "un"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "zh": ("的", "是", "了", "在", "和", "有"),
}


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS_BY_LANG["en"]) -> Column:
    """Fraction of tokens that are stopwords (0 for empty docs)."""
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda x: x.isin(*stopwords))).cast("long")
    n = F.size(toks).cast("long")
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[A-Za-z0-9\s]", "")
    return F.when(
        F.length(c) > 0, F.length(stripped) / F.length(c)
    ).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: length band + lexical diversity
    + low punctuation. Weights are arbitrary but fixed; the oracle replicates
    the exact formula."""
    c = F.col(col) if isinstance(col, str) else col
    n = token_count(c)
    length_ok = F.when((n >= 10) & (n <= 1000), F.lit(1.0)).otherwise(F.lit(0.0))
    ttr = type_token_ratio(c)
    low_punct = 1.0 - punct_ratio(c)
    return F.round(0.4 * length_ok + 0.3 * ttr + 0.3 * low_punct, 6)


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword hit counts (the n-gram-free lang-ID heuristic)."""
    toks = tokens(col)
    return {
        lang: F.size(F.filter(toks, lambda x: x.isin(*words))).cast("long")
        for lang, words in STOPWORDS_BY_LANG.items()
    }


def lang_id(col: Column | str) -> Column:
    """argmax language by stopword hits; 'und' (undetermined) when all zero.

    Tie-break: first language in fixed (de, en, es, fr, zh) alphabetical
    order wins — deterministic and replicated in the oracle SQL.
    """
    scores = lang_scores(col)
    ordered = sorted(scores)  # alphabetical, deterministic
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("long")
    # Scan from last to first; '>=' lets an earlier language displace a tied
    # later one, so the alphabetically-first language wins ties.
    for lang in reversed(ordered):
        s = scores[lang]
        best_lang = F.when(s >= best_score, F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, s)
    return F.when(best_score > 0, best_lang).otherwise(F.lit("und"))


NGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    # Characteristic character n-grams per language (tiny fixed profiles —
    # the n-gram flavor of language ID, complementing the stopword lang_id).
    "de": ("der", "sch", "ein", "ich", "und", "die"),
    "en": ("the", "ing", "ion", "and", " of", " to"),
    "es": ("ión", "los", " el", "que", " la", "ado"),
    "fr": (" le", "les", "ait", " un", "des", "eur"),
    "zh": ("的", "是", "了", "在", "和", "有"),
}


def lang_id_ngram(col: Column | str) -> Column:
    """argmax language by distinct profile-n-gram presence; 'und' when no
    profile n-gram occurs. Tie-break: alphabetically-first language.

    Presence (not frequency) keeps the formula cheap — one contains() per
    profile gram, all inside codegen — and bit-identical to the SQL oracle.
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    scores = {
        lang: F.size(
            F.filter(
                F.array(*[F.lit(g) for g in grams]), lambda g: F.contains(c, g)
            )
        )
        for lang, grams in NGRAM_PROFILES.items()
    }
    ordered = sorted(scores)
    max_s = F.greatest(*scores.values())
    out = F.lit("und")
    # Build when-chain in REVERSE alphabetical order so the alphabetically
    # first language ends up outermost and wins ties.
    for lang in reversed(ordered):
        out = F.when(scores[lang] == max_s, F.lit(lang)).otherwise(out)
    return F.when(max_s > 0, out).otherwise(F.lit("und"))


def fingerprint(col: Column | str, normalize: bool = True) -> Column:
    """Document fingerprint: portable rolling hash of the normalized text
    (lowercased, whitespace collapsed) — stable under formatting noise."""
    c = F.col(col) if isinstance(col, str) else col
    if normalize:
        c = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return portable_char_hash(c)


PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    # (name, regex, replacement) — applied in order; SSN before phone so the
    # 3-2-4 digit shape is not half-eaten by a phone pattern.
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("email", r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", "[EMAIL]"),
    ("phone", r"\b(?:\+?1[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
    ("mrn", r"\bMRN-\d+\b", "[MRN]"),
)


def redact_pii(col: Column | str) -> Column:
    """Chained regexp_replace redaction of SSN / email / phone / MRN tokens.

    The healthcare-flavored cousin of the PHI-strip projection: where
    strip_phi_fields removes STRUCTURED fields, this scrubs identifiers
    embedded in free text before it feeds a training corpus. Pure
    regexp_replace chain — whole-stage codegen, no Python.
    """
    c = F.col(col) if isinstance(col, str) else col
    for _name, pattern, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, repl)
    return c


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-category PII hit counts (for audit/reporting side-outputs)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pattern), 0)).cast("long")
        for name, pattern, _repl in PII_PATTERNS
    }


def contamination_flags(
    text_col: Column | str, probe_ngrams: list[str]
) -> Column:
    """Benchmark-decontamination check: which probe n-grams occur verbatim
    in the (normalized) document. Returns array<string> of matched probes.

    The probe set is a literal array (broadcast with the plan); matching is
    substring containment on whitespace-normalized lowered text — the
    standard first-pass filter before expensive fuzzy matching.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.regexp_replace(F.lower(c), r"\s+", " ")
    probes = F.array(*[F.lit(p.lower()) for p in probe_ngrams])
    return F.filter(probes, lambda p: F.contains(norm, p))


def annotate_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-statistics annotation used by the quality pipeline."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(c),
            "n_distinct_tokens": distinct_token_count(c),
            "ttr": F.round(type_token_ratio(c), 6),
            "stopword_ratio": F.round(stopword_ratio(c), 6),
            "punct_ratio": F.round(punct_ratio(c), 6),
            "quality": quality_score(c),
        }
    )


def unicode_normalize_col(col: Column, form: str = "NFC") -> Column:
    """Unicode normalization of a string column (NFC by default): canonical
    composition so byte-different, render-identical strings ("e" + U+0301
    vs precomposed U+00E9) compare, hash, and dedup as equals — the
    normalization every multilingual corpus pipeline applies before
    fingerprinting/dedup, since crawled text mixes composed and decomposed
    forms freely.

    Spark has no normalization expression, so this is an Arrow-batched
    pandas UDF over Python's unicodedata (the canonical composition tables
    are frozen by the Unicode stability policy, so results agree with any
    conformant implementation — e.g. DuckDB's utf8proc-backed
    nfc_normalize, which the oracle uses). Map-only: no shuffle, applied
    per batch wherever the column flows.
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda v: v if v is None else unicodedata.normalize(form, v)
        )

    return _norm(col)


def positional_index(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Positional inverted-index postings: one row per token occurrence
    with its 1-based position — the index structure phrase and proximity
    queries run on (document-level presence is `inverted_index_docs`;
    this keeps WHERE in the document, not just WHETHER).

    Map-only (posexplode of the split), so at scale it materializes as a
    partitioned postings table written once and range/bucket-laid-out by
    term; here it is built inline and immediately filtered by the query
    terms, which pushes each term's selectivity below the join.

    Output: id_col, w (token), p (1-based position).
    """
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("p0", "w"),
    ).select(id_col, "w", (F.col("p0") + 1).alias("p"))


def phrase_match(
    index: DataFrame, id_col: str, phrase: list[str]
) -> DataFrame:
    """Exact-phrase query over positional postings: the i-th word's
    postings shift to their candidate phrase-START position (p - i) and
    the n lists intersect by an equi-join on (doc, start) — the standard
    positional-index phrase algorithm. Each term's postings are filtered
    to that term BEFORE the join, so the join input is the phrase terms'
    selectivity, never the corpus; joins are plain equi-joins Catalyst
    can broadcast when a term is rare.

    Output: id_col, n_occurrences, first_pos (start position of the
    earliest occurrence), one row per document containing the phrase.
    """
    if not phrase:
        raise ValueError("empty phrase")
    acc = None
    for i, w in enumerate(phrase):
        posting = index.filter(F.col("w") == w).select(
            id_col, (F.col("p") - i).alias("start")
        )
        acc = posting if acc is None else acc.join(posting, [id_col, "start"])
    return acc.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("start").alias("first_pos"),
    )
