"""Text analysis for training-data pipelines — all JVM-side expressions
(whole-stage codegen; no Python in the hot path).

Token counting, quality scoring, language-ID heuristic, and document
fingerprinting over a ``documents(doc_id, text, ...)`` table. Each has
an exact DuckDB oracle (same regex/arithmetic) in oracle/duckdb_sql.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"\s+"

# stopword markers per language for the n-gram/marker heuristic —
# counts of ' w ' occurrences scored per language, argmax wins.
LANG_MARKERS = {
    "en": ["the", "and", "of", "a"],
    "fr": ["le", "la", "et", "les"],
    "de": ["der", "die", "und", "das"],
    "es": ["el", "los", "que", "y"],
    "zh": ["的", "是", "了", "在"],
}

EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def tokens(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), TOKEN_RE)


def token_count(col: str | Column = "text") -> Column:
    """Whitespace token count; 0 for empty/blank text (split('') yields
    [''], so guard on trimmed length)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(F.size(tokens(c))).cast("long")


BPE_TOKEN_RE = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(col: str | Column = "text") -> Column:
    """BPE-ish token count: the GPT-2 pre-tokenizer's segment classes
    (optionally space-prefixed letter runs / digit runs / punctuation
    runs, plus whitespace runs), without its lookahead branches so the
    pattern stays RE2-compatible — DuckDB counts the identical
    segments with ``len(regexp_extract_all(text, ...))`` (engine-parity
    tested). Approximates subword token counts far better than
    whitespace splitting on code, URLs, and punctuation-dense text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE)).cast("long")


def _count_occurrences(c: Column, needle: str) -> Column:
    """Occurrences of ``needle`` via the length-difference trick —
    identical semantics in any SQL engine."""
    return (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit("")))) / len(needle)


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    n_tok = token_count(c)
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_tokens_bpe", bpe_token_count(c))
        .withColumn("n_chars_measured", F.length(c).cast("long"))
        .withColumn(
            "avg_token_len",
            F.round(
                F.when(
                    n_tok > 0,
                    F.length(F.regexp_replace(F.trim(c), TOKEN_RE, "")) / n_tok,
                ),
                6,
            ),
        )
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: punctuation/digit/upper ratios + stopword
    ratio → composite score in [0,1]. The reference's analogue is the
    SNR/RUWE quality gating (SURVEY §2.2 F11/F12)."""
    c = F.col(text_col)
    length = F.greatest(F.length(c), F.lit(1)).cast("double")
    punct = (F.length(c) - F.length(F.regexp_replace(c, r"[\.,;:!\?]", ""))) / length
    digit = (F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))) / length
    upper = (F.length(c) - F.length(F.regexp_replace(c, r"[A-Z]", ""))) / length
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    sw_hits = None
    for w in EN_STOPWORDS:
        h = _count_occurrences(padded, f" {w} ")
        sw_hits = h if sw_hits is None else sw_hits + h
    n_tok = token_count(c)
    sw_ratio = F.when(n_tok > 0, sw_hits / n_tok).otherwise(F.lit(0.0))
    score = F.least(
        F.lit(1.0)
        - F.least(punct * 4, F.lit(0.25))
        - F.least(digit * 4, F.lit(0.25))
        + F.least(sw_ratio, F.lit(0.25)),
        F.lit(1.0),
    )
    return (
        df.withColumn("punct_ratio", F.round(punct, 6))
        .withColumn("digit_ratio", F.round(digit, 6))
        .withColumn("upper_ratio", F.round(upper, 6))
        .withColumn("stopword_ratio", F.round(sw_ratio, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: count per-language stopword hits,
    argmax with deterministic tie-break on language code order."""
    c = F.col(text_col)
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    scores = []
    for lang in sorted(LANG_MARKERS):
        s = None
        for w in LANG_MARKERS[lang]:
            h = _count_occurrences(padded, f" {w} ")
            s = h if s is None else s + h
        scores.append(F.struct(s.cast("double").alias("score"), F.lit(lang).alias("lang")))
    # argmax: greatest score, ties → lexicographically LAST lang wins
    # under struct comparison; invert lang for deterministic first-wins?
    # keep struct-max semantics (score, lang) — documented, oracle matches.
    best = F.greatest(*scores)
    return df.withColumn("pred_lang", best.getField("lang")).withColumn(
        "lang_score", F.round(best.getField("score"), 6)
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of lowercased, whitespace-collapsed,
    trimmed text — the exact-dedup key (SURVEY §2.8 C10 analog)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn("fingerprint", F.md5(norm))
