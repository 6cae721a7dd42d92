"""Text-analysis operators for training-data pipelines (driver mandate):
language-ID (stopword n-gram heuristic), quality scoring, token counting,
document fingerprinting.

All pure native-expression implementations (JVM-side, codegen) — no Python
UDFs. Every function has an exact DuckDB mirror built from the same regexes
(see queries.py) so results are oracle-gated.

Portability contract with DuckDB:
- normalization = lower(trim(regexp_replace(text, '\\s+', ' ')))  (DuckDB
  needs the 'g' flag on regexp_replace);
- tokenization = split on single space after normalization;
- regex token counts via regexp_extract_all → size/len;
- fingerprints via md5 hex strings (identical across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: BPE-ish token regex: letter runs, digit runs, single non-space symbols
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[.,;:!?'\"()\[\]{}-]"
UPPER_RE = r"[A-Z]"
DIGIT_RE = r"[0-9]"

#: tiny per-language stopword inventories for the n-gram heuristic
#: ASCII-only on purpose: `\b` is an ASCII word boundary in both RE2 (DuckDB)
#: and Java (Spark rlike) default modes, so accented entries would split at
#: the accent and break cross-engine parity. Overlaps across languages (fr/es
#: `la`, `un`) are fine — lang_guess is an argmax over total hits.
STOPWORDS = {
    "en": [
        "the", "and", "is", "of", "to", "in", "that", "it", "was", "for",
        "on", "are", "with", "as", "they", "at", "be", "this", "have",
        "from", "or", "had", "by", "but", "not", "what", "all", "were",
    ],
    "de": [
        "der", "die", "und", "das", "ist", "nicht", "ein", "zu", "den",
        "dem", "mit", "sich", "auf", "im", "als", "auch", "es", "werden",
        "aus", "er", "hat", "dass", "sie", "nach", "wird", "bei", "um",
        "sind",
    ],
    "fr": [
        "le", "la", "et", "les", "des", "est", "un", "une", "dans", "que",
        "qui", "pour", "sur", "pas", "plus", "par", "avec", "au", "il",
        "ne", "se", "ce", "son", "mais", "comme", "ou", "si", "leur",
    ],
    "es": [
        "el", "la", "los", "que", "es", "un", "una", "para", "de", "no",
        "se", "con", "por", "las", "su", "al", "lo", "como", "mas", "pero",
        "sus", "le", "ya", "este", "si", "porque", "muy", "sin",
    ],
}


def normalize(c: Column) -> Column:
    """Whitespace-collapse + trim + lowercase — the shared normal form."""
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def word_count(c: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    n = normalize(c)
    return F.when(F.length(n) == 0, F.lit(0)).otherwise(
        F.size(F.split(n, " "))
    )


def token_count(c: Column) -> Column:
    """BPE-ish regex token count (letters / digits / single symbols)."""
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), 0))


def char_class_ratio(c: Column, pattern: str) -> Column:
    """Fraction of characters matching a single-char class regex."""
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        F.size(F.regexp_extract_all(c, F.lit(pattern), 0)) / F.length(c)
    )


def stopword_hits(c: Column, lang: str) -> Column:
    """Count of language-stopword word occurrences in normalized text."""
    pat = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(normalize(c), F.lit(pat), 0))


def lang_guess(c: Column, langs=("en", "de", "fr", "es")) -> Column:
    """Argmax language by stopword hits; 'und' (undetermined) when all zero.

    Deterministic tie-break: first language in `langs` wins (mirrors the SQL
    CASE chain with >= comparisons in the oracle).
    """
    hits = {l: stopword_hits(c, l) for l in langs}
    best = F.lit("und")
    best_n = F.lit(0)
    # build reversed so earlier langs win ties
    for l in reversed(langs):
        cond = hits[l] > F.lit(0)
        better = hits[l] >= best_n
        best = F.when(cond & better, F.lit(l)).otherwise(best)
        best_n = F.when(cond & better, hits[l]).otherwise(best_n)
    return best


def quality_features(df: DataFrame, col: str = "text") -> DataFrame:
    """Per-row quality features: word/token counts, char-class ratios, and a
    composite score in [0,1] (simple monotone combination, documented here so
    the oracle reproduces it exactly)."""
    c = F.col(col)
    wc = word_count(c).alias("word_count")
    tc = token_count(c).alias("token_count")
    pr = char_class_ratio(c, PUNCT_RE).alias("punct_ratio")
    ur = char_class_ratio(c, UPPER_RE).alias("upper_ratio")
    dr = char_class_ratio(c, DIGIT_RE).alias("digit_ratio")
    # english-stopword fraction of words — the classic quality signal
    sr = F.when(word_count(c) == 0, F.lit(0.0)).otherwise(
        stopword_hits(c, "en") / word_count(c)
    ).alias("stopword_ratio")
    out = df.select("*", wc, tc, pr, ur, dr, sr)
    score = (
        F.least(F.col("word_count") / F.lit(20.0), F.lit(1.0)) * 0.5
        + (1.0 - F.least(F.col("punct_ratio") * 4.0, F.lit(1.0))) * 0.25
        + (1.0 - F.least(F.col("digit_ratio") * 4.0, F.lit(1.0))) * 0.25
    )
    return out.withColumn("quality_score", F.round(score, 6))


def fingerprint(c: Column) -> Column:
    """Deterministic content fingerprint: md5 of the normal form (identical
    hex string in Spark and DuckDB — the cross-engine dedup key)."""
    return F.md5(normalize(c))
